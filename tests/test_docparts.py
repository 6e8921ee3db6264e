"""E1/E3/E7/E18/E19/E20/E21 part-assembly semantics (hardcoded expecteds
from the reference code paths cited per test)."""

import json

from extract_text_spark.extractors.docparts import (
    extract_docx,
    extract_odt,
    extract_pptx,
)
from extract_text_spark.extractors.email_msg import (
    MSG_FALLBACK,
    extract_eml,
    extract_msg,
)
from extract_text_spark.extractors.epub import (
    epub_members_budget,
    extract_epub_member,
)
from extract_text_spark.extractors.pdf_layout import extract_pdf_page, xy_cut


# -- E3 DOCX (app/extractors.py:288-390) --------------------------------------

def test_docx_full_assembly():
    payload = json.dumps({
        "paragraphs": ["Para one", "  ", "Para two"],
        "tables": [[["a", " b "], ["c", "d"]]],
        "sections": [{"header": ["H1", ""], "footer": ["F1"]}],
        "footnotes": ["note1", "note2"],
        "comments": ["c1"],
    })
    assert extract_docx(payload) == (
        "Para one\n\nPara two\n\n"
        "a\tb\nc\td\n\n"                      # cells stripped, tab/newline grid
        "[Header]\nH1\n\n[Footer]\nF1\n\n"
        "[Footnotes]\nnote1 note2\n\n"
        "[Comments]\nc1"
    )


def test_docx_empty_sections_skipped():
    payload = json.dumps({"paragraphs": ["x"], "tables": [],
                          "sections": [{"header": [], "footer": []}],
                          "footnotes": [], "comments": []})
    assert extract_docx(payload) == "x"


# -- E7 PPTX (app/extractors.py:507-552) ---------------------------------------

def test_pptx_markers_notes_and_empty_slide_drop():
    # NB the reference's len(slide_text) > 1 check (:545) counts the
    # "[Slide n]" marker itself, so a slide with *any* non-blank shape text
    # (even just a title) is kept; only textless slides are dropped.
    payload = json.dumps({"slides": [
        {"shapes": ["Title A", "Body text"], "notes": ["Notes", "real note"]},
        {"shapes": ["", "  "], "notes": []},              # dropped (:545)
        {"shapes": ["Head", "More"], "notes": ["Заметки"]},
    ]})
    assert extract_pptx(payload) == (
        "[Slide 1]\nTitle A\nBody text\n[Speaker Notes]\nreal note"
        "\n\n"
        "[Slide 3]\nHead\nMore"
    )


# -- E18 ODT (app/extractors.py:1072-1105) --------------------------------------

def test_odt_paragraphs():
    assert extract_odt(json.dumps({"paragraphs": ["a", " ", "b"]})) == "a\nb"


# -- E1 PDF layout (app/extractors.py:223-276) -----------------------------------

def test_xy_cut_single_column_top_down():
    blocks = [
        {"bbox": [0, 100, 100, 120], "text": "second"},
        {"bbox": [0, 10, 100, 30], "text": "first"},
    ]
    assert [b["text"] for b in xy_cut(blocks)] == ["first", "second"]


def test_xy_cut_two_columns_left_then_right():
    blocks = [
        {"bbox": [300, 10, 400, 200], "text": "right col"},
        {"bbox": [0, 10, 100, 90], "text": "left top"},
        {"bbox": [0, 110, 100, 200], "text": "left bottom"},
    ]
    assert [b["text"] for b in xy_cut(blocks)] == [
        "left top", "left bottom", "right col"
    ]


def test_pdf_page_marker_and_join():
    payload = json.dumps({"page_no": 2, "blocks": [
        {"bbox": [0, 50, 10, 60], "text": "B"},
        {"bbox": [0, 10, 10, 20], "text": "A"},
    ]})
    page_no, text = extract_pdf_page(payload)
    assert (page_no, text) == (2, "A\nB")


# -- E19 EPUB (app/extractors.py:1107-1167) ---------------------------------------

def test_epub_member_filter_and_strip():
    html = json.dumps({"name": "c1.xhtml",
                       "content": "<p>hello <b>world</b></p>", "size": 10})
    css = json.dumps({"name": "s.css", "content": "p{}", "size": 3})
    assert extract_epub_member(html) == "hello world"
    assert extract_epub_member(css) is None


def test_epub_budget_stops_before_overflow():
    cap = 100 * 1024 * 1024
    assert epub_members_budget([cap - 10, 5, 100]) == 2
    assert epub_members_budget([cap + 1]) == 0


# -- E20 EML (app/extractors.py:1169-1291) ------------------------------------------

def test_eml_headers_separator_body():
    raw = (
        "From: a@x.com\nTo: b@y.com\nSubject: =?utf-8?B?0KLQtdC80LA=?=\n"
        "Date: Mon, 1 Jan 2024 10:00:00 +0000\n"
        "Content-Type: text/plain; charset=utf-8\n\nbody line\n"
    ).encode("utf-8")
    out = extract_eml(raw)
    assert out.startswith(
        "From: a@x.com\nTo: b@y.com\nSubject: Тема\n"
        "Date: Mon, 1 Jan 2024 10:00:00 +0000\n---\n"
    )
    assert "body line" in out


def test_eml_multipart_html_part_stripped():
    raw = (
        "From: a@x.com\nSubject: s\nMIME-Version: 1.0\n"
        'Content-Type: multipart/alternative; boundary="B"\n\n'
        "--B\nContent-Type: text/plain; charset=utf-8\n\nplain part\n"
        "--B\nContent-Type: text/html; charset=utf-8\n\n<p>html part</p>\n"
        "--B--\n"
    ).encode("utf-8")
    out = extract_eml(raw)
    assert "plain part" in out
    assert "html part" in out
    assert "<p>" not in out


# -- E21 MSG (app/extractors.py:1293-1384) --------------------------------------------

def test_msg_two_pass_heuristic():
    utf16 = "Subject line one\nshort\nSubject line one\n".encode("utf-16le")
    tail = b"_ignored\x00\x01\nplain ascii tail line\n"
    out = extract_msg(utf16 + tail)
    lines = out.split("\n")
    assert lines.count("Subject line one") == 1      # deduped (len>5)
    assert "short" not in lines                       # len<=5 dropped
    assert "plain ascii tail line" in lines           # ascii pass (len>10)


def test_msg_fallback_literal():
    assert extract_msg(b"\x00\x01\x02") == MSG_FALLBACK
