"""Legacy DOC/PPT binary parsing (E4/E8) — piece table, record stream,
and span parity with the modern-format paths.

The reference converts doc->docx / ppt->pptx via LibreOffice and reuses
its python-docx/python-pptx extractors (app/extractors.py:392-473,
554-635); these tests pin the from-scratch [MS-DOC]/[MS-PPT] parsers to
the same downstream span sequences for the same content.
"""

import json

import pytest

from extract_text_spark.bytecorpus import (
    make_doc, make_docx, make_ole, make_ppt, make_pptx,
)
from extract_text_spark.extractors.oledoc import (
    doc_payload_from_bytes, doc_text_from_bytes, ppt_payload_from_bytes,
)
from extract_text_spark.extractors.olexls import _Cfb, cfb_directory_names
from extract_text_spark.ingest import sniff_content_mime, spans_from_bytes


# -- multi-stream CFB writer --------------------------------------------------

def test_make_ole_multi_stream_mini_and_big():
    big = bytes(range(256)) * 40                    # 10240 B -> FAT chain
    ole = make_ole({"small": b"hello" * 10, "big": big, "empty": b""})
    cfb = _Cfb(ole)
    assert cfb.stream("small") == b"hello" * 10
    assert cfb.stream("big") == big
    assert cfb.stream("empty") == b""
    assert cfb_directory_names(ole) == ["Root Entry", "small", "big", "empty"]


# -- DOC ----------------------------------------------------------------------

def test_doc_piece_table_mixed_encodings_round_trip():
    paras = ["Hello world", "Zürich — naïve café", "", "The end"]
    got = json.loads(doc_payload_from_bytes(make_doc(paras)))
    assert got["paragraphs"] == paras
    assert got["tables"] == [] and got["footnotes"] == []


def test_doc_ccptext_bounds_main_document():
    # extra_text sits past ccpText (footnote cp range) — never extracted
    doc = make_doc(["body text"], extra_text="FOOTNOTE-MUST-NOT-APPEAR")
    assert "FOOTNOTE" not in doc_text_from_bytes(doc)


def test_doc_which_table_stream_flag():
    for which in (0, 1):
        doc = make_doc(["para via table %d" % which], which_table=which)
        names = cfb_directory_names(doc)
        assert ("1Table" if which else "0Table") in names
        assert json.loads(doc_payload_from_bytes(doc))["paragraphs"] == [
            "para via table %d" % which]


def test_doc_control_chars_model():
    # \x0b line break -> \n (like <w:br/>); \x13..\x14 field code dropped,
    # \x14..\x15 field result kept; \x07 cell mark splits paragraphs.
    raw = "line1\x0bline2\rsee \x13PAGEREF _x\x14page 3\x15 ok\rcellA\x07cellB"
    doc = make_doc([raw.replace("\r", "\r")])       # single "paragraph" input
    got = json.loads(doc_payload_from_bytes(doc))["paragraphs"]
    assert got == ["line1\nline2", "see page 3 ok", "cellA", "cellB"]


def test_doc_encrypted_fails_closed():
    with pytest.raises(ValueError, match="encrypted"):
        doc_payload_from_bytes(make_doc(["x"], encrypted=True))


def test_doc_not_word_magic():
    with pytest.raises(ValueError, match="FIB magic"):
        doc_payload_from_bytes(make_ole({"WordDocument": b"\x00" * 1024}))


def test_doc_spans_equal_docx_spans():
    paras = ["Intro paragraph", "Zürich — naïve café", "", "The end"]
    st_doc, sp_doc = spans_from_bytes(make_doc(paras), "legacy.doc")
    st_docx, sp_docx = spans_from_bytes(make_docx(paras), "modern.docx")
    assert st_doc is None and st_docx is None
    assert sp_doc == sp_docx


# -- PPT ----------------------------------------------------------------------

def test_ppt_record_stream_round_trip():
    slides = [
        {"shapes": ["Title A", "Body line1\nline2"], "notes": ["note α"]},
        {"shapes": [], "notes": []},
        {"shapes": ["Final"], "notes": []},
    ]
    got = json.loads(ppt_payload_from_bytes(make_ppt(slides)))
    assert got["slides"] == [
        {"shapes": ["Title A", "Body line1\nline2"], "notes": ["note α"]},
        {"shapes": [], "notes": []},
        {"shapes": ["Final"], "notes": []},
    ]


def test_ppt_spans_equal_pptx_spans():
    slides = [
        {"shapes": ["Deck title", "Bullet one\nBullet two"],
         "notes": ["presenter notes"]},
        {"shapes": [], "notes": []},                # empty slide dropped
        {"shapes": ["Wrap-up"], "notes": []},
    ]
    st_ppt, sp_ppt = spans_from_bytes(make_ppt(slides), "legacy.ppt")
    st_pptx, sp_pptx = spans_from_bytes(make_pptx(slides), "modern.pptx")
    assert st_ppt is None and st_pptx is None
    assert sp_ppt == sp_pptx


def test_ppt_no_text_records_is_error():
    ole = make_ole({"PowerPoint Document": b""})
    with pytest.raises(ValueError, match="no slide text"):
        ppt_payload_from_bytes(ole)


def test_ppt_missing_stream_is_error():
    with pytest.raises(ValueError, match="PowerPoint Document"):
        ppt_payload_from_bytes(make_ole({"Other": b"x" * 16}))


def test_doc_ppt_as_archive_members():
    """Legacy binaries nested in archives ride the member model (A1/A6)."""
    from extract_text_spark.bytecorpus import make_zip
    from extract_text_spark.ingest import spans_from_bytes
    z = make_zip({
        "word/legacy.doc": make_doc(["Zipped doc para"]),
        "decks/old.ppt": make_ppt([{"shapes": ["Zipped slide"],
                                    "notes": []}]),
    })
    st, spans = spans_from_bytes(z, "bundle.zip")
    assert st is None
    members = {m["path"]: m for m in
               (json.loads(s["text"]) for s in spans)}
    assert members["word/legacy.doc"]["kind"] == "docx_part"
    assert json.loads(members["word/legacy.doc"]["text"])["paragraphs"] == [
        "Zipped doc para"]
    assert members["decks/old.ppt"]["kind"] == "pptx_part"


# -- S6/S7 integration --------------------------------------------------------

def test_ole_mime_classification_doc_ppt():
    assert sniff_content_mime(make_doc(["x"])) == "application/msword"
    assert (sniff_content_mime(make_ppt([{"shapes": ["x"], "notes": []}]))
            == "application/vnd.ms-powerpoint")


def test_doc_header_footer_stories_extracted():
    """ccpHdd range via PlcfHdd: the odd (default) header/footer stories
    surface as the section header/footer, exactly as the reference's
    LibreOffice doc->docx conversion exposes them to python-docx
    (/root/reference/app/extractors.py:341-349 via :392-473); text past
    the declared subdocuments still must not leak."""
    doc = make_doc(["body"], header="Page Head", footer="Page Foot",
                   extra_text="must-not-leak")
    got = json.loads(doc_payload_from_bytes(doc))
    assert got["sections"] == [
        {"header": ["Page Head"], "footer": ["Page Foot"]}]
    text = doc_text_from_bytes(doc)
    assert "must-not-leak" not in text and "Page Head" not in text


def test_doc_with_header_spans_equal_docx_spans():
    paras = ["Intro paragraph", "The end"]
    st_doc, sp_doc = spans_from_bytes(
        make_doc(paras, header="Shared Hdr"), "legacy.doc")
    st_docx, sp_docx = spans_from_bytes(
        make_docx(paras, header="Shared Hdr"), "modern.docx")
    assert st_doc is None and st_docx is None
    assert sp_doc == sp_docx


def test_doc_field_instruction_spanning_paragraph_mark():
    # the 0x13..0x14 instruction range crosses a paragraph mark: the whole
    # instruction (marks included) disappears; only the result renders
    raw = "see \x13PAGEREF\rdeep _x\x14page 9\x15 done"
    got = json.loads(doc_payload_from_bytes(make_doc([raw])))["paragraphs"]
    assert got == ["see page 9 done"]


def test_ppt_escher_textboxes_append_after_placeholders():
    """Drawing-layer (OfficeArtClientTextbox) text that never appears in
    SlideListWithText must still extract — and a placeholder's
    ClientTextbox (OutlineTextRefAtom) must NOT double-count its outline
    text. Parity: the converted-pptx equivalent has the textboxes as
    ordinary shapes after the placeholders."""
    slides = [
        {"shapes": ["Title A"], "notes": ["n1"],
         "textboxes": ["Floating box", "Box β"]},
        {"shapes": ["Title B"], "notes": []},
    ]
    got = json.loads(ppt_payload_from_bytes(make_ppt(slides)))
    assert got["slides"][0]["shapes"] == ["Title A", "Floating box", "Box β"]
    assert got["slides"][1]["shapes"] == ["Title B"]
    st_ppt, sp_ppt = spans_from_bytes(make_ppt(slides), "a.ppt")
    st_pptx, sp_pptx = spans_from_bytes(make_pptx([
        {"shapes": ["Title A", "Floating box", "Box β"], "notes": ["n1"]},
        {"shapes": ["Title B"], "notes": []},
    ]), "a.pptx")
    assert st_ppt is None and st_pptx is None and sp_ppt == sp_pptx


def test_doc_footnotes_extracted_with_docx_parity():
    """ccpFtn range via PlcffndTxt ([MS-DOC] 2.8.24): footnote stories
    (auto-number ref marks stripped, guard story dropped) surface as the
    payload footnotes — the [Footnotes] block a converted docx yields."""
    doc = make_doc(["body"], footnotes=["First note text", "Second note"],
                   extra_text="must-not-leak")
    got = json.loads(doc_payload_from_bytes(doc))
    assert got["footnotes"] == ["First note text", "Second note"]
    assert "must-not-leak" not in doc_text_from_bytes(doc)
    st_doc, sp_doc = spans_from_bytes(
        make_doc(["b1"], footnotes=["note x"]), "a.doc")
    st_docx, sp_docx = spans_from_bytes(
        make_docx(["b1"], footnote="note x"), "a.docx")
    assert st_doc is None and st_docx is None and sp_doc == sp_docx


def test_doc_comments_extracted_with_docx_parity():
    """ccpAtn range via PlcfandTxt ([MS-DOC] 2.8.15): annotation stories
    (ref marks stripped, guard dropped) surface as payload comments —
    the [Comments] block a converted docx yields."""
    doc = make_doc(["body"], comments=["reviewer note", "second comment"])
    got = json.loads(doc_payload_from_bytes(doc))
    assert got["comments"] == ["reviewer note", "second comment"]
    st_doc, sp_doc = spans_from_bytes(
        make_doc(["b"], comments=["c x"]), "a.doc")
    st_docx, sp_docx = spans_from_bytes(
        make_docx(["b"], comment="c x"), "a.docx")
    assert st_doc is None and st_docx is None and sp_doc == sp_docx


def test_ppt_notes_container_textboxes():
    """Notes containers' drawing-layer textboxes append to that slide's
    speaker notes, with placeholder OutlineTextRefAtoms still skipped."""
    slides = [
        {"shapes": ["T1"], "notes": ["n1"], "textboxes": ["box A"],
         "notes_textboxes": ["note box"]},
        {"shapes": ["T2"], "notes": []},
    ]
    got = json.loads(ppt_payload_from_bytes(make_ppt(slides)))
    assert got["slides"][0]["shapes"] == ["T1", "box A"]
    assert got["slides"][0]["notes"] == ["n1", "note box"]
    assert got["slides"][1] == {"shapes": ["T2"], "notes": []}


def test_doc_binary_tables_via_papx():
    """Real [MS-DOC] table model: PlcfbtePapx -> FKP -> sprmPFInTable /
    sprmPFTtp classify the 0x07 marks into cell vs row boundaries, so
    tables extract as docx-parity rows instead of flattened paragraphs;
    interior \\r marks make multi-paragraph cells. Docs without a
    paragraph bin table keep the flat model."""
    doc = make_doc(["Intro para", "Second"],
                   table=[["a", "b"], ["c", "d"]], header="Hd")
    got = json.loads(doc_payload_from_bytes(doc))
    assert got["tables"] == [[["a", "b"], ["c", "d"]]]
    assert got["paragraphs"] == ["Intro para", "Second"]
    st_doc, sp_doc = spans_from_bytes(
        make_doc(["Intro"], table=[["a", "b"], ["c", "d"]]), "t.doc")
    st_docx, sp_docx = spans_from_bytes(
        make_docx(["Intro"], table=[["a", "b"], ["c", "d"]]), "t.docx")
    assert st_doc is None and st_docx is None and sp_doc == sp_docx
    # multi-paragraph cell
    multi = json.loads(doc_payload_from_bytes(
        make_doc(["P"], table=[["line1\rline2", "b"]])))
    assert multi["tables"] == [[["line1\nline2", "b"]]]
    # no PAPX -> flat paragraphs (pinned pre-table model)
    flat = json.loads(doc_payload_from_bytes(make_doc(["cellA\x07cellB"])))
    assert flat["paragraphs"] == ["cellA", "cellB"] and flat["tables"] == []


def test_doc_table_model_field_spanning_mark_parity():
    """A field instruction spanning a paragraph mark must render only the
    field result in the TABLE model too (the cross-segment strip), not
    leak instruction text or split the paragraph."""
    raw = "see \x13PAGEREF\rdeep _x\x14page 9\x15 done"
    got = json.loads(doc_payload_from_bytes(
        make_doc([raw], table=[["Ta", "Tb"]])))
    assert got["paragraphs"] == ["see page 9 done"]
    assert got["tables"] == [[["Ta", "Tb"]]]


def test_doc_table_model_tail_instruction_strips():
    """An 0x13..0x14 field instruction that starts AND ends inside the
    tail (main text past the final mark — malformed, Word always
    mark-terminates) must strip in the table model exactly as the flat
    model's _FIELD_CODE regex strips it."""
    tail = "end \x13PAGEREF _x\x14page 3\x15 fin"
    got = json.loads(doc_payload_from_bytes(
        make_doc(["Intro"], table=[["Ta", "Tb"]], tail=tail)))
    assert got["paragraphs"] == ["Intro", "end page 3 fin"]
    assert got["tables"] == [[["Ta", "Tb"]]]
    flat = json.loads(doc_payload_from_bytes(make_doc(["Intro"], tail=tail)))
    assert flat["paragraphs"] == ["Intro", "end page 3 fin"]
