"""E20/E21: EML and MSG extraction kernels.

EML (app/extractors.py:1169-1291): decode bytes utf-8 -> cp1251 -> latin-1
(first strict success), parse with the stdlib ``email`` module; emit
``From/To/Subject/Date`` headers (RFC2047-decoded), a literal ``---``
separator, then body parts: for multipart, every ``text/plain`` /
``text/html`` part in walk order (HTML soup-stripped — here via the
from-scratch get_text, i.e. the BeautifulSoup-get_text equivalent with *no*
tag dropping and *no* cleanup, matching ``soup.get_text()`` at :1281-1282);
for simple messages the decoded payload. Join "\\n"; fallback literal
"Could not extract readable text from EML file".

MSG (app/extractors.py:1293-1384): deterministic two-pass heuristic —
pass 1 utf-16le ignore-errors decode, strip control chars, keep lines with
len>3 / letters / not starting "_"/NUL, then dedupe keeping len>5; pass 2
ascii ignore-errors decode, keep stripped lines len>10 with letters not
already emitted. Join "\\n"; same style of fallback literal.
"""

from __future__ import annotations

import email
from email.header import decode_header

from .html import get_text

EML_FALLBACK = "Could not extract readable text from EML file"
MSG_FALLBACK = "Could not extract readable text from MSG file"


def _decode_eml_content(content: bytes) -> str:
    for encoding in ["utf-8", "cp1251", "latin-1"]:
        try:
            return content.decode(encoding)
        except UnicodeDecodeError:
            continue
    return content.decode("utf-8", errors="replace")


def _decode_eml_header(value: str) -> str:
    decoded_value = ""
    for part, encoding in decode_header(value):
        if isinstance(part, bytes):
            decoded_value += part.decode(encoding or "utf-8", errors="replace" if not encoding else "strict")
        else:
            decoded_value += part
    return decoded_value


def _decode_payload(payload: bytes, charset: str) -> str:
    try:
        return payload.decode(charset)
    except (UnicodeDecodeError, LookupError):
        return payload.decode("utf-8", errors="replace")


def extract_eml(content: bytes) -> str:
    msg = email.message_from_string(_decode_eml_content(content))
    text_parts: list[str] = []
    for header in ["From", "To", "Subject", "Date"]:
        value = msg.get(header)
        if value:
            text_parts.append(f"{header}: {_decode_eml_header(value)}")
    text_parts.append("---")
    if msg.is_multipart():
        for part in msg.walk():
            content_type = part.get_content_type()
            if content_type in ("text/plain", "text/html"):
                payload = part.get_payload(decode=True)
                if not payload:
                    continue
                body_text = _decode_payload(
                    payload, part.get_content_charset() or "utf-8"
                )
                if content_type == "text/html":
                    body_text = get_text(body_text, frozenset())
                if body_text and body_text.strip():
                    text_parts.append(body_text)
    else:
        payload = msg.get_payload(decode=True)
        if payload:
            body_text = _decode_payload(
                payload, msg.get_content_charset() or "utf-8"
            )
            if body_text.strip():
                text_parts.append(body_text)
    return "\n".join(text_parts) if text_parts else EML_FALLBACK


def _is_valid_msg_line(line: str) -> bool:
    return (
        len(line) > 3
        and not line.startswith(("_", "\x00"))
        and any(c.isalpha() for c in line)
    )


def extract_msg(content: bytes) -> str:
    text_parts: list[str] = []
    # Pass 1: utf-16le
    text = content.decode("utf-16le", errors="ignore")
    clean_lines = []
    for line in text.split("\n"):
        clean_line = "".join(
            char for char in line if ord(char) >= 32 or char in "\t\n\r"
        ).strip()
        if _is_valid_msg_line(clean_line):
            clean_lines.append(clean_line)
    seen: set[str] = set()
    for line in clean_lines:
        if line not in seen and len(line) > 5:
            text_parts.append(line)
            seen.add(line)
    # Pass 2: ascii. NB the reference checks membership against the *pass-1*
    # list only (app/extractors.py:1361-1376), so pass-2 duplicates repeat —
    # replicated faithfully.
    pass1 = list(text_parts)
    ascii_text = content.decode("ascii", errors="ignore")
    for line in ascii_text.split("\n"):
        clean_line = line.strip()
        if (
            len(clean_line) > 10
            and any(c.isalpha() for c in clean_line)
            and clean_line not in pass1
        ):
            text_parts.append(clean_line)
    return "\n".join(text_parts) if text_parts else MSG_FALLBACK
