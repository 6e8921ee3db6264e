"""E1: from-scratch PDF page-layout parser with reading-order sort.

The reference extracts per-page text via pdfplumber and emits, per page,
``[Page {n}]\\n{page_text}`` followed by one ``[Image {k}]`` block per
OCR-able embedded image (app/extractors.py:223-276). Binary PDF parsing is
out of scope (SURVEY.md §2 E1): pages arrive pre-parsed as JSON payloads

    {"page_no": int, "blocks": [{"bbox": [x0, y0, x1, y1], "text": str}]}

and this module supplies the *layout* semantics: block segmentation into a
reading order via recursive X-Y cut (Nagy & Seth 1984's top-down page
decomposition — split on the widest horizontal whitespace valley first,
then vertical, recurse), falling back to (top, left) ordering inside
indivisible groups. Coordinates: origin top-left, y grows downward.

Embedded images are *media spans* in the document table; the pipeline
interleaves them page-text-first, images-after, per the reference's
normative ordering (app/extractors.py:249-262).
"""

from __future__ import annotations

import json

MIN_GAP = 1.0  # minimum whitespace valley width to accept a cut


def _gaps(intervals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Maximal gaps between sorted, merged [start, end) intervals."""
    ivs = sorted(intervals)
    merged = [list(ivs[0])]
    for s, e in ivs[1:]:
        if s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [
        (merged[i][1], merged[i + 1][0]) for i in range(len(merged) - 1)
    ]


def xy_cut(blocks: list[dict]) -> list[dict]:
    """Recursive X-Y cut reading order over block bboxes."""
    if len(blocks) <= 1:
        return list(blocks)

    # Horizontal cut (split top/bottom on a y-gap) takes priority: standard
    # single-column flow reads top-to-bottom before left-to-right.
    y_gaps = _gaps([(b["bbox"][1], b["bbox"][3]) for b in blocks])
    y_gaps = [g for g in y_gaps if g[1] - g[0] >= MIN_GAP]
    if y_gaps:
        cut = max(y_gaps, key=lambda g: g[1] - g[0])
        mid = (cut[0] + cut[1]) / 2
        top = [b for b in blocks if b["bbox"][3] <= mid]
        bottom = [b for b in blocks if b["bbox"][3] > mid]
        if top and bottom:
            return xy_cut(top) + xy_cut(bottom)

    x_gaps = _gaps([(b["bbox"][0], b["bbox"][2]) for b in blocks])
    x_gaps = [g for g in x_gaps if g[1] - g[0] >= MIN_GAP]
    if x_gaps:
        cut = max(x_gaps, key=lambda g: g[1] - g[0])
        mid = (cut[0] + cut[1]) / 2
        left = [b for b in blocks if b["bbox"][2] <= mid]
        right = [b for b in blocks if b["bbox"][2] > mid]
        if left and right:
            return xy_cut(left) + xy_cut(right)

    return sorted(blocks, key=lambda b: (b["bbox"][1], b["bbox"][0]))


def extract_pdf_page(payload: str) -> tuple[int, str]:
    """Parse one pre-parsed page payload -> (page_no, page_text).

    page_text is the X-Y-cut-ordered block texts joined with "\\n" (the
    line-flow join pdfplumber's extract_text produces between blocks).
    """
    page = json.loads(payload)
    ordered = xy_cut([b for b in page.get("blocks", []) if b.get("text")])
    return int(page["page_no"]), "\n".join(b["text"] for b in ordered)


def page_marker(page_no: int, page_text: str) -> str:
    """``[Page {n}]\\n{text}`` (app/extractors.py:256)."""
    return f"[Page {page_no}]\n{page_text}"
