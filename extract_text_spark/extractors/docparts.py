"""E3/E7/E18: DOCX / PPTX / ODT tokenizer branches.

Binary OOXML/ODF parsing is out of scope (the reference itself shells out to
python-docx / python-pptx / odfpy); parts arrive pre-parsed as JSON payloads
and this module applies the reference's *assembly* semantics exactly.

DOCX payload (app/extractors.py:288-390):
    {"paragraphs": [str], "tables": [[[cell]]],
     "sections": [{"header": [str], "footer": [str]}],
     "footnotes": [str], "comments": [str]}
  -> non-blank paragraphs, per-table tab/newline grid, per-section
     "[Header]\\n"+" ".join / "[Footer]\\n"+..., "[Footnotes]", "[Comments]";
     all parts joined "\\n\\n".

PPTX payload (app/extractors.py:507-552):
    {"slides": [{"shapes": [str], "notes": [str]}]}
  -> per slide "[Slide {n}]" + non-blank shape texts + optional
     "[Speaker Notes]\\n"+" ".join(non-header notes); slides with nothing
     beyond the marker are dropped; intra-slide join "\\n", slides "\\n\\n".
     The literal note headers "Заметки"/"Notes" are filtered (:533).

ODT payload (app/extractors.py:1072-1105):
    {"paragraphs": [str]} -> non-blank paragraphs joined "\\n".
"""

from __future__ import annotations

import json


def extract_docx(payload: str) -> str:
    doc = json.loads(payload)
    text_parts: list[str] = []
    for paragraph in doc.get("paragraphs", []):
        if paragraph.strip():
            text_parts.append(paragraph)
    for table in doc.get("tables", []):
        table_text = ["\t".join(cell.strip() for cell in row) for row in table]
        if table_text:
            text_parts.append("\n".join(table_text))
    for section in doc.get("sections", []):
        header = [p for p in section.get("header", []) if p.strip()]
        if header:
            text_parts.append(f"[Header]\n{' '.join(header)}")
        footer = [p for p in section.get("footer", []) if p.strip()]
        if footer:
            text_parts.append(f"[Footer]\n{' '.join(footer)}")
    footnotes = [p for p in doc.get("footnotes", []) if p.strip()]
    if footnotes:
        text_parts.append(f"[Footnotes]\n{' '.join(footnotes)}")
    comments = [p for p in doc.get("comments", []) if p.strip()]
    if comments:
        text_parts.append(f"[Comments]\n{' '.join(comments)}")
    return "\n\n".join(text_parts)


_NOTE_HEADERS = {"Заметки", "Notes"}  # app/extractors.py:533


def extract_pptx(payload: str) -> str:
    prs = json.loads(payload)
    text_parts: list[str] = []
    for slide_num, slide in enumerate(prs.get("slides", []), 1):
        slide_text = [f"[Slide {slide_num}]"]
        for shape in slide.get("shapes", []):
            if shape.strip():
                slide_text.append(shape)
        notes = [
            s.strip()
            for s in slide.get("notes", [])
            if s.strip() and s.strip() not in _NOTE_HEADERS
        ]
        if notes:
            slide_text.append(f"[Speaker Notes]\n{' '.join(notes)}")
        if len(slide_text) > 1:  # more than just the marker (:545)
            text_parts.append("\n".join(slide_text))
    return "\n\n".join(text_parts)


def extract_odt(payload: str) -> str:
    doc = json.loads(payload)
    return "\n".join(p for p in doc.get("paragraphs", []) if p.strip())
