"""Real OOXML/ODF/EPUB byte parsing (stdlib zipfile + ElementTree).

The reference parses these formats from raw bytes via python-docx /
python-pptx / pandas+openpyxl / BeautifulSoup (app/extractors.py:288-390,
475-492, 507-552, 1072-1105, 1107-1167). Those libraries are themselves
zip+XML readers; this module re-implements the subset of their object model
that the reference's extraction actually touches, producing the *same part
payload JSON* the pinned assembly kernels (docparts.py, structured.py)
consume — so byte-in and payload-in inputs share one extraction path.

Scope (documented): text runs, tables, default headers/footers, footnotes,
comments, shared/inline strings, slide shape/notes text, ODT paragraphs.
Embedded media, charts, SmartArt and revision marks are not text sources in
the reference either (it reads ``paragraph.text`` / ``shape.text`` only).
"""

from __future__ import annotations

import io
import json
import posixpath
import re
import xml.etree.ElementTree as ET
import zipfile

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_ODT_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_OD_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_OD_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"


def _rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """Relationship id -> resolved member path for one package part."""
    base = posixpath.dirname(part)
    rel_name = posixpath.join(base, "_rels", posixpath.basename(part) + ".rels")
    if rel_name not in zf.namelist():
        return {}
    root = ET.fromstring(zf.read(rel_name))
    out = {}
    for rel in root.findall(_REL + "Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target[1:]
        else:
            resolved = posixpath.normpath(posixpath.join(base, target))
        out[rel.get("Id", "")] = resolved
    return out


def _w_para_text(p) -> str:
    """python-docx ``paragraph.text``: concatenated run texts, tabs as-is."""
    parts = []
    for node in p.iter():
        if node.tag == _W + "t":
            parts.append(node.text or "")
        elif node.tag == _W + "tab":
            parts.append("\t")
        elif node.tag == _W + "br":
            parts.append("\n")
    return "".join(parts)


def _w_paras(elem) -> list[str]:
    return [_w_para_text(p) for p in elem.findall(_W + "p")]


def docx_payload_from_bytes(content: bytes) -> str:
    """DOCX bytes -> the docx_part payload JSON (docparts.extract_docx).

    Mirrors what the reference reads through python-docx
    (app/extractors.py:288-390): body paragraphs, body tables (cell text =
    newline-joined cell paragraphs), per-section default header/footer,
    non-separator footnotes, comments.
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        body = ET.fromstring(zf.read("word/document.xml")).find(_W + "body")
        if body is None:
            raise ValueError("no document body")
        rels = _rels(zf, "word/document.xml")

        paragraphs = _w_paras(body)
        tables = []
        for tbl in body.findall(_W + "tbl"):
            rows = []
            for tr in tbl.findall(_W + "tr"):
                rows.append(
                    ["\n".join(_w_paras(tc)) for tc in tr.findall(_W + "tc")]
                )
            tables.append(rows)

        def _hf_paras(refs) -> list[str]:
            for ref in refs:
                if ref.get(_W + "type", "default") == "default":
                    target = rels.get(ref.get(_R + "id", ""))
                    if target and target in zf.namelist():
                        return _w_paras(ET.fromstring(zf.read(target)))
            return []

        sections = []
        for sect_pr in body.iter(_W + "sectPr"):
            sections.append({
                "header": _hf_paras(sect_pr.findall(_W + "headerReference")),
                "footer": _hf_paras(sect_pr.findall(_W + "footerReference")),
            })

        footnotes: list[str] = []
        if "word/footnotes.xml" in zf.namelist():
            for fn in ET.fromstring(zf.read("word/footnotes.xml")).findall(_W + "footnote"):
                if fn.get(_W + "type") in ("separator", "continuationSeparator"):
                    continue
                footnotes.extend(_w_paras(fn))

        comments: list[str] = []
        if "word/comments.xml" in zf.namelist():
            for cm in ET.fromstring(zf.read("word/comments.xml")).findall(_W + "comment"):
                comments.extend(_w_paras(cm))

    return json.dumps({
        "paragraphs": paragraphs, "tables": tables, "sections": sections,
        "footnotes": footnotes, "comments": comments,
    })


_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_S + "is")
        return "".join(n.text or "" for n in is_el.iter(_S + "t")) if is_el is not None else ""
    v = c.find(_S + "v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return bool(int(v.text))
    num = float(v.text)
    return int(num) if num.is_integer() else num


def xlsx_payload_from_bytes(content: bytes) -> str:
    """XLSX bytes -> the sheet_part payload JSON (structured.extract_sheets).

    Mirrors ``pd.read_excel(sheet_name=None)`` for the subset the reference
    dumps (app/extractors.py:475-492): per-sheet grid, first row as header.
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(_S + "t"))
                for si in root.findall(_S + "si")
            ]
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = _rels(zf, "xl/workbook.xml")
        sheets = []
        sheets_el = wb.find(_S + "sheets")
        for sheet in (sheets_el if sheets_el is not None else []):
            name = sheet.get("name", "Sheet")
            target = rels.get(sheet.get(_R + "id", ""))
            if not target or target not in zf.namelist():
                continue
            ws = ET.fromstring(zf.read(target))
            grid: list[list] = []
            data = ws.find(_S + "sheetData")
            for row in (data.findall(_S + "row") if data is not None else []):
                cells: dict[int, object] = {}
                for pos, c in enumerate(row.findall(_S + "c")):
                    ref = c.get("r")
                    cells[_col_index(ref) if ref else pos] = _cell_value(c, shared)
                width = max(cells) + 1 if cells else 0
                grid.append([cells.get(i) for i in range(width)])
            width = max((len(r) for r in grid), default=0)
            grid = [r + [None] * (width - len(r)) for r in grid]
            columns = ["" if v is None else str(v) for v in grid[0]] if grid else []
            sheets.append({"name": name, "columns": columns, "rows": grid[1:]})
    return json.dumps({"sheets": sheets})


def _ods_cell_value(cell):
    """One ODF cell -> python value, mirroring what pandas' odf reader
    feeds ``pd.read_excel`` (pandas.io.excel._odfreader._get_cell_value):
    typed attribute for float/percentage/currency/boolean, the date/time
    attribute string for date/time, newline-joined ``text:p`` paragraphs
    for strings. Integral floats collapse to int exactly like the xlsx
    kernel (_cell_value above), so both spreadsheet paths csv-dump alike.
    """
    vt = cell.get(_OD_OFFICE + "value-type")
    if vt in ("float", "percentage", "currency"):
        num = float(cell.get(_OD_OFFICE + "value", "0"))
        return int(num) if num.is_integer() else num
    if vt == "boolean":
        return cell.get(_OD_OFFICE + "boolean-value") == "true"
    if vt == "date":
        return cell.get(_OD_OFFICE + "date-value")
    if vt == "time":
        return cell.get(_OD_OFFICE + "time-value")
    paras = ["".join(p.itertext()) for p in cell.findall(_ODT_TEXT + "p")]
    text = "\n".join(paras)
    return text if text else None


def ods_payload_from_bytes(content: bytes) -> str:
    """ODS bytes -> the sheet_part payload JSON (structured.extract_sheets).

    The reference routes ods through the same Excel path as xlsx
    (app/config.py:129 puts "ods" in spreadsheets;
    app/extractors.py:475-492 = ``pd.read_excel(sheet_name=None)`` +
    per-sheet ``[Sheet: name]`` + ``df.to_csv(index=False)``). This parses
    content.xml table:table elements directly: number-columns-repeated /
    number-rows-repeated expanded, covered cells hold a position, trailing
    empty cells and rows trimmed (repeated trailing empties carry huge
    repeat counts — 2^14 columns — that pandas also discards), first row
    as header. Same payload as xlsx, so ODS rides E5's pinned kernel.
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    sheets = []
    for table in root.iter(_OD_TABLE + "table"):
        name = table.get(_OD_TABLE + "name", "Sheet")
        grid: list[list] = []
        for tr in table.iter(_OD_TABLE + "table-row"):
            row: list = []
            for cell in tr:
                if cell.tag not in (_OD_TABLE + "table-cell",
                                    _OD_TABLE + "covered-table-cell"):
                    continue
                value = (None if cell.tag.endswith("covered-table-cell")
                         else _ods_cell_value(cell))
                repeat = int(cell.get(_OD_TABLE + "number-columns-repeated", 1))
                if value is None:
                    # defer trailing-empty runs: only materialized if a
                    # non-empty cell follows (repeat counts reach 16384)
                    row.append(("__rep__", repeat))
                else:
                    row = _expand_reps(row)
                    row.extend([value] * repeat)
            row = [v for v in row if not isinstance(v, tuple)]
            rep_rows = int(tr.get(_OD_TABLE + "number-rows-repeated", 1))
            if row:
                grid.extend([list(row)] * min(rep_rows, 1048576))
            else:
                grid.append(("__emptyrep__", rep_rows))  # type: ignore[arg-type]
        # materialize repeated empty rows only when later rows exist
        out_rows: list[list] = []
        pending_empty = 0
        width = 0
        for row in grid:
            if isinstance(row, tuple):
                pending_empty += row[1]
                continue
            out_rows.extend([[]] * pending_empty)
            pending_empty = 0
            out_rows.append(row)
            width = max(width, len(row))
        out_rows = [r + [None] * (width - len(r)) for r in out_rows]
        columns = (["" if v is None else str(v) for v in out_rows[0]]
                   if out_rows else [])
        sheets.append({"name": name, "columns": columns,
                       "rows": out_rows[1:]})
    return json.dumps({"sheets": sheets})


def _expand_reps(row: list) -> list:
    """Materialize deferred empty-cell runs that precede a real cell."""
    out: list = []
    for v in row:
        if isinstance(v, tuple):
            out.extend([None] * v[1])
        else:
            out.append(v)
    return out


def _pptx_shape_texts(tree) -> list[str]:
    """python-pptx ``shape.text`` per text-bearing shape: paragraphs joined
    by newline, runs concatenated."""
    out = []
    for sp in tree.iter(_P + "sp"):
        tx = sp.find(_P + "txBody")
        if tx is None:
            continue
        paras = [
            "".join(t.text or "" for t in p.iter(_A + "t"))
            for p in tx.findall(_A + "p")
        ]
        out.append("\n".join(paras))
    return out


def pptx_payload_from_bytes(content: bytes) -> str:
    """PPTX bytes -> the pptx_part payload JSON (docparts.extract_pptx).

    Slide order follows p:sldIdLst (presentation order, not member-name
    order); notes come from each slide's notesSlide relationship —
    mirroring python-pptx as the reference uses it
    (app/extractors.py:507-552).
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        rels = _rels(zf, "ppt/presentation.xml")
        slide_parts = []
        sld_lst = pres.find(_P + "sldIdLst")
        for sld in (sld_lst if sld_lst is not None else []):
            target = rels.get(sld.get(_R + "id", ""))
            if target and target in zf.namelist():
                slide_parts.append(target)
        slides = []
        for part in slide_parts:
            tree = ET.fromstring(zf.read(part))
            shapes = _pptx_shape_texts(tree)
            notes: list[str] = []
            for target in _rels(zf, part).values():
                if "notesSlide" in target and target in zf.namelist():
                    notes.extend(_pptx_shape_texts(ET.fromstring(zf.read(target))))
            slides.append({"shapes": shapes, "notes": notes})
    return json.dumps({"slides": slides})


def odt_payload_from_bytes(content: bytes) -> str:
    """ODT bytes -> the odt_part payload JSON (docparts.extract_odt):
    text:p paragraphs of content.xml in document order
    (app/extractors.py:1072-1105 via odfpy's teletype)."""
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    paragraphs = ["".join(p.itertext()) for p in root.iter(_ODT_TEXT + "p")]
    return json.dumps({"paragraphs": paragraphs})


def epub_payload_from_bytes(content: bytes) -> str:
    """EPUB bytes -> whole-book payload for extractors.epub.extract_epub_doc.

    One entry per zip member *in archive order* — the reference's budget
    check runs against every member (html or not) while only html members
    contribute content and size (app/extractors.py:1107-1167); the kernel
    reproduces that control flow, so non-html members must be present with
    their true sizes. Their content is dropped here (never read by the
    kernel) to keep the payload small.
    """
    members = []
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            is_html = info.filename.endswith((".html", ".xhtml", ".htm"))
            members.append({
                "name": info.filename,
                "content": (
                    zf.read(info).decode("utf-8", errors="replace")
                    if is_html else ""
                ),
                "size": info.file_size,
            })
    return json.dumps({"members": members})
