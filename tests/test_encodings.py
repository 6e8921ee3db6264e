"""E9 encoding-chain semantics, mirroring the reference's own assertions
(/root/reference/tests/test_extractors.py:29-77) plus chain edge cases from
app/extractors.py:645-735. Expected values are hardcoded — computed from the
reference's documented algorithm, not from this engine."""

from extract_text_spark.extractors.encodings import decode_text_content
from extract_text_spark.extractors.plain import extract_plain


def test_utf8_roundtrip():
    # tests/test_extractors.py:60-67
    s = "Простой текст\nВторая строка"
    assert extract_plain(s.encode("utf-8")) == s


def test_cp1251_fallback():
    # tests/test_extractors.py:69-77 — 'Т' (0xD2) decodes to a smart quote
    # under mac-cyrillic, tripping the suspicious-start gate, so cp1251 wins.
    s = "Тестовый текст"
    assert decode_text_content(s.encode("cp1251")) == s


def test_mac_cyrillic_wins_when_plausible():
    # Bug-for-bug parity: cp1251 bytes whose mac-cyrillic decode is fully
    # Cyrillic and starts with a non-suspicious char come back as mojibake
    # (the reference's chain ordering, app/extractors.py:660-675).
    b = "Привет мир, как дела сегодня".encode("cp1251")
    assert decode_text_content(b) == b.decode("mac-cyrillic")


def test_utf16_swallowed_by_cp1251():
    # Bug-for-bug parity: utf-16 bytes never reach the utf-16 codecs in the
    # reference chain — cp1251 decodes any byte string without U+FFFD (full
    # byte map, app/extractors.py:660-675 ordering), so mixed-script utf-16
    # input surfaces as cp1251 mojibake, exactly as the reference emits it.
    b = "Пример текста в utf-16".encode("utf-16")
    assert decode_text_content(b) == b.decode("cp1251")


def test_pure_ascii_is_utf8():
    assert decode_text_content(b"plain ascii text") == "plain ascii text"


def test_empty_bytes():
    assert decode_text_content(b"") == ""


def test_replacement_ratio_gate():
    # >10% replacement chars rejects the decode (app/extractors.py:692-697):
    # invalid-utf8 bytes fall through utf-8 to the next accepting codec.
    b = b"\xff\xfe\xff\xfe\xff\xfe"
    out = decode_text_content(b)
    assert "�" not in out or out.count("�") / len(out) <= 0.1
