"""E9: byte -> str decoding with the reference's 12-encoding fallback chain.

Semantics replicated from /root/reference/app/extractors.py:645-735:

* fixed encoding order (:660-675),
* accept the first decode whose U+FFFD share is <= 10% (:692-697),
* extra plausibility gate for ``mac-cyrillic`` (:699-735): reject when the
  decoded text starts with a "suspicious" quote character, or when Cyrillic
  letters are present but make up < 70% of all letters,
* final fallback: ``utf-8`` with replacement (:654-658).

The chain is intentionally reproduced *bug-for-bug*: e.g. cp1251 input whose
mac-cyrillic decode is all-Cyrillic and starts with a non-suspicious char
comes back as mac-cyrillic mojibake, exactly as the reference returns it.

Byte transport convention: the span table stores raw payload bytes as
latin-1-decoded strings (a lossless bytes<->str bijection), so parquet can
carry arbitrary binaries in a string column; callers re-encode with
``s.encode("latin-1")`` before entering this module.
"""

from __future__ import annotations

ENCODING_CHAIN = [
    "utf-8",
    "mac-cyrillic",
    "cp1251",
    "windows-1251",
    "koi8-r",
    "cp866",
    "iso-8859-5",
    "utf-16",
    "utf-16le",
    "utf-16be",
    "latin-1",
    "ascii",
]

# app/extractors.py:709-723 — the literal list contains plain/smart quotes
# plus an unreachable two-char string; membership is tested on text[0].
_SUSPICIOUS_START = {'"', "'", "`", "«", "»", "“", "”"}


def _quality_ok(text: str) -> bool:
    """<=10% U+FFFD replacement characters (app/extractors.py:692-697)."""
    if "�" in text:
        return text.count("�") / len(text) <= 0.1
    return True


def _mac_cyrillic_ok(text: str, encoding: str) -> bool:
    """Plausibility gate applied only to mac-cyrillic (app/extractors.py:699-735)."""
    if encoding != "mac-cyrillic" or not text:
        return True
    if len(text) > 1 and text[0] in _SUSPICIOUS_START:
        return False
    cyr = sum(1 for c in text if "Ѐ" <= c <= "ӿ")
    lat = sum(1 for c in text if "a" <= c.lower() <= "z")
    total = cyr + lat
    if total == 0:
        return True
    return not (cyr / total < 0.7 and cyr > 0)


def decode_text_content(content: bytes) -> str:
    """Decode with auto-detection per the reference chain (app/extractors.py:645-658)."""
    for encoding in ENCODING_CHAIN:
        try:
            text = content.decode(encoding)
        except UnicodeError:
            continue
        if not _quality_ok(text):
            continue
        if not _mac_cyrillic_ok(text, encoding):
            continue
        return text
    return content.decode("utf-8", errors="replace")


def bytes_from_payload(payload: str) -> bytes:
    """Inverse of the latin-1 transport convention."""
    return payload.encode("latin-1")
