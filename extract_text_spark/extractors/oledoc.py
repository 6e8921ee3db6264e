"""Legacy Word (.doc) and PowerPoint (.ppt) binary parsing — E4 / E8.

The reference cannot parse these natively: it shells out to LibreOffice to
convert doc->docx (/root/reference/app/extractors.py:392-473) and
ppt->pptx (:554-635), then reuses its python-docx / python-pptx paths. We
parse the OLE2 binaries from scratch (no LibreOffice in scope) and emit
the SAME payload JSON the docx/pptx kernels consume (docparts.extract_docx
/ extract_pptx), so legacy files ride the pinned assembly semantics:
converted-then-extracted documents and natively-parsed ones produce the
same span sequences for the same content.

Modeled scope (documented, not hidden):

* DOC — the [MS-DOC] FIB + piece-table text model: main document text
  range (``ccpText``) reassembled from the Clx/PlcPcd piece table in the
  1Table/0Table stream, with per-piece ``fCompressed`` handling (cp1252
  single-byte vs UTF-16LE).  Paragraph marks (0x0D), cell/row marks
  (0x07) and page breaks (0x0C) split paragraphs; line breaks (0x0B)
  become "\\n" exactly like <w:br/> in ooxml._w_para_text; field
  instructions (0x13..0x14) are dropped and field results (0x14..0x15)
  kept — what LibreOffice's conversion renders.  Every subdocument text
  range is modeled: section headers/footers from PlcfHdd over ``ccpHdd``
  ([MS-DOC] 2.8.25, odd = default story per section), footnotes from
  PlcffndTxt over ``ccpFtn`` (2.8.24), comments from PlcfandTxt over
  ``ccpAtn`` (2.8.15) — the ``[Header]``/``[Footer]``/``[Footnotes]``/
  ``[Comments]`` blocks the converted docx path emits.  Binary table
  structure is modeled too: PlcfbtePapx -> FKP paragraph properties
  classify 0x07 marks into cell vs row (sprmPFInTable/sprmPFTtp), so
  tables extract as docx-parity rows; files without a paragraph bin
  table keep the flat paragraph model.
* PPT — the [MS-PPT] record stream: DocumentContainer ->
  SlideListWithText (instance 0 = slides, 2 = notes), text grouped per
  SlidePersistAtom, one shape per TextCharsAtom (UTF-16LE) /
  TextBytesAtom (low-byte) run — plus the drawing layer: Slide/Notes
  containers' PPDrawing OfficeArtClientTextbox runs append to that
  slide's shapes/notes, with placeholder textboxes (OutlineTextRefAtom)
  skipped so outline text never double-counts.

Encrypted files fail closed like the reference's conversion path does
(``fEncrypted`` FIB bit / no parsable piece table -> ValueError).
"""

from __future__ import annotations

import re
import struct

from .olexls import _Cfb

# -- DOC ([MS-DOC] 2.5.1 Fib; 2.9.38 Clx; 2.9.177 PlcPcd) ------------------

_FC_COMPRESSED = 0x40000000
_FIB_MAGIC = 0xA5EC
# Fib offsets: base(32) + csw(2) + fibRgW(28) + cslw(2) = 0x40 -> fibRgLw97;
# ccpText is its 4th dword (cbMac, reserved1, reserved2, ccpText), then
# ccpFtn and ccpHdd follow ([MS-DOC] 2.5.7 FibRgLw97).
_CCP_TEXT_OFF = 0x4C
_CCP_FTN_OFF = 0x50
_CCP_HDD_OFF = 0x54
# base(32)+csw(2)+fibRgW(28)+cslw(2)+fibRgLw(88)+cbRgFcLcb(2) = 0x9A, then
# fcClx/lcbClx is the 34th (fc,lcb) pair: 0x9A + 33*8 = 0x1A2,
# fcPlcfhdd/lcbPlcfhdd the 12th: 0x9A + 11*8 = 0xF2, and
# fcPlcffndTxt/lcb the 4th: 0x9A + 3*8 = 0xB2 ([MS-DOC] 2.5.5).
_FC_CLX_OFF = 0x1A2
_FC_PLCFHDD_OFF = 0xF2
_FC_PLCFFNDTXT_OFF = 0xB2
# fcPlcfbtePapx/lcb is the 14th (fc,lcb) pair: 0x9A + 13*8 = 0x102
# ([MS-DOC] 2.5.5) — paragraph-property bin table for the table model.
_FC_PLCFBTEPAPX_OFF = 0x102
_SPRM_PF_IN_TABLE = 0x2416
_SPRM_PF_TTP = 0x2417
# fcPlcfandTxt/lcb is the 6th (fc,lcb) pair: 0x9A + 5*8 = 0xC2, and the
# annotation (comment) cp range sits after ccpText+ccpFtn+ccpHdd+ccpMcr
# ([MS-DOC] 2.5.7 ccpAtn at fibRgLw97 offset 0x5C).
_FC_PLCFANDTXT_OFF = 0xC2
_CCP_MCR_OFF = 0x58
_CCP_ATN_OFF = 0x5C

# field instruction text: begin(0x13) .. separator(0x14); the result
# (0x14..end 0x15) is what a conversion renders.
_FIELD_CODE = re.compile("\x13[^\x14\x15]*\x14?")
_PARA_MARKS = re.compile("[\r\x07\x0c]")


def _clean_fragment(text: str) -> str:
    text = _FIELD_CODE.sub("", text)
    return (text.replace("\x15", "").replace("\x13", "")
                .replace("\x14", "")
                .replace("\x02", "")            # auto-number note ref mark
                .replace("\x05", "")            # annotation ref mark
                .replace("\x0b", "\n")          # line break == <w:br/>
                .replace("\x1e", "-")           # non-breaking hyphen
                .replace("\x1f", ""))           # optional hyphen


def _cp_slice(full: str, start_units: int, end_units: int) -> str:
    """Slice by [MS-DOC] CP range — UTF-16 CODE UNITS, not code points."""
    if len(full.encode("utf-16-le")) // 2 == len(full):   # BMP-only fast path
        return full[start_units:end_units]
    out, units = [], 0
    for ch in full:
        w = 2 if ord(ch) > 0xFFFF else 1
        if units >= end_units:
            break
        if units >= start_units and units + w <= end_units:
            out.append(ch)
        units += w
    return "".join(out)


def _grpprl_table_flags(grp: bytes) -> tuple[bool, bool]:
    """Walk a GrpPrlAndIstd for sprmPFInTable / sprmPFTtp ([MS-DOC]
    2.6.2); operand sizes derive from the sprm's spra bits."""
    fin = fttp = False
    pos = 2                                     # istd
    while pos + 2 <= len(grp):
        (opcode,) = struct.unpack_from("<H", grp, pos)
        pos += 2
        if opcode == _SPRM_PF_IN_TABLE and pos < len(grp):
            fin = bool(grp[pos])
        elif opcode == _SPRM_PF_TTP and pos < len(grp):
            fttp = bool(grp[pos])
        spra = opcode >> 13
        if spra in (0, 1):
            pos += 1
        elif spra in (2, 4, 5):
            pos += 2
        elif spra == 3:
            pos += 4
        elif spra == 7:
            pos += 3
        elif opcode in (0xD608, 0xD606):
            # sprmTDefTable(10): [MS-DOC] 2.6.3 exception — a 2-byte cb
            # counting the remaining operand bytes plus one
            if pos + 2 > len(grp):
                break
            (cb,) = struct.unpack_from("<H", grp, pos)
            pos += 2 + max(cb - 1, 0)
        elif opcode == 0xC615 and pos < len(grp) and grp[pos] == 255:
            # sprmPChgTabs with cb == 255: operand size derives from its
            # internal deletion/addition arrays — out of modeled scope,
            # stop the walk rather than desync into garbage opcodes
            break
        else:                                   # spra 6: size byte + payload
            pos += 1 + (grp[pos] if pos < len(grp) else 0)
    return fin, fttp


def _make_flags_for_cp(wd: bytes, table: bytes, piece_map):
    """PlcfbtePapx/FKP lookup: CP of a paragraph mark -> (fInTable, fTtp).

    Returns None when the file carries no paragraph bin table (our
    pre-table fixtures, badly truncated files) — callers fall back to the
    flat paragraph model.
    """
    if len(wd) < _FC_PLCFBTEPAPX_OFF + 8:
        return None
    fc_plc, lcb_plc = struct.unpack_from("<II", wd, _FC_PLCFBTEPAPX_OFF)
    if lcb_plc < 12 or fc_plc + lcb_plc > len(table):
        return None
    n = (lcb_plc - 4) // 8                      # aFC: n+1 u32, aPnBte: n u32
    if n <= 0:
        return None
    afc = struct.unpack_from(f"<{n + 1}I", table, fc_plc)
    apn = struct.unpack_from(f"<{n}I", table, fc_plc + 4 * (n + 1))

    def cp_to_fc(cp: int) -> int | None:
        for cp0, cp1, fc, width in piece_map:
            if cp0 <= cp < cp1:
                return fc + width * (cp - cp0)
        return None

    def flags_for_cp(cp: int) -> tuple[bool, bool]:
        fc = cp_to_fc(cp)
        if fc is None:
            return (False, False)
        for i in range(n):
            if afc[i] <= fc < afc[i + 1]:
                pn = apn[i] & 0x3FFFFF
                page = wd[pn * 512:(pn + 1) * 512]
                if len(page) < 512:
                    return (False, False)
                crun = page[511]
                if 4 * (crun + 1) + 13 * crun > 511:
                    return (False, False)
                rgfc = struct.unpack_from(f"<{crun + 1}I", page, 0)
                for j in range(crun):
                    if rgfc[j] <= fc < rgfc[j + 1]:
                        bx = page[4 * (crun + 1) + 13 * j]
                        if bx == 0:             # default PAPX: no props
                            return (False, False)
                        off = bx * 2
                        cb = page[off]
                        if cb == 0:
                            grp = page[off + 2:off + 2 + 2 * page[off + 1]]
                        else:
                            grp = page[off + 1:off + 1 + 2 * cb - 1]
                        return _grpprl_table_flags(grp)
                return (False, False)
        return (False, False)

    return flags_for_cp


def doc_text_from_bytes(content: bytes) -> str:
    """Raw main-document text (control chars intact) from DOC bytes."""
    return _doc_subdocs(content)[0]


def _doc_subdocs(
    content: bytes,
) -> tuple[str, list[str], list[str], list[str], object]:
    """DOC bytes -> (main text, Hdd header/footer stories, footnote
    stories, annotation stories, paragraph-flags lookup or None),
    control chars intact.

    Header/footer stories come from PlcfHdd over the cp range past
    ccpText+ccpFtn ([MS-DOC] 2.8.25): the first six are note separators,
    then six per section — even header, odd header, even footer, odd
    footer, first-page header, first-page footer. Footnote stories come
    from PlcffndTxt over [ccpText, ccpText+ccpFtn) ([MS-DOC] 2.8.24),
    annotation (comment) stories from PlcfandTxt over the ccpAtn range
    past ccpText+ccpFtn+ccpHdd+ccpMcr ([MS-DOC] 2.8.15); trailing guard
    intervals clean to empty and drop downstream.
    """
    cfb = _Cfb(content)
    wd = cfb.stream("WordDocument")
    if wd is None:
        raise ValueError("no WordDocument stream in OLE container")
    if len(wd) < _FC_CLX_OFF + 8:
        raise ValueError("WordDocument stream truncated before FIB tables")
    (ident,) = struct.unpack_from("<H", wd, 0)
    if ident != _FIB_MAGIC:
        raise ValueError("not a Word binary file (bad FIB magic)")
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    if flags & 0x0100:                          # fEncrypted
        raise ValueError("encrypted document not supported")
    table = cfb.stream("1Table" if flags & 0x0200 else "0Table")
    if table is None:                           # tolerant: either stream
        table = cfb.stream("0Table") or cfb.stream("1Table")
    if table is None:
        raise ValueError("no Table stream in OLE container")
    (ccp_text,) = struct.unpack_from("<i", wd, _CCP_TEXT_OFF)
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, _FC_CLX_OFF)
    clx = table[fc_clx:fc_clx + lcb_clx]

    # Clx = RgPrc (clxt=0x01 prefixed property chunks) then Pcdt (0x02).
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        (cb,) = struct.unpack_from("<h", clx, pos + 1)
        pos += 3 + max(0, cb)
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("no piece table in Clx")
    (lcb_plc,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5:pos + 5 + lcb_plc]
    n = (lcb_plc - 4) // 12                     # n+1 CPs (4B) + n PCDs (8B)
    if n <= 0 or len(plc) < 4 * (n + 1) + 8 * n:
        raise ValueError("piece table truncated")
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)

    pieces = []
    piece_map = []                  # (cp_start, cp_end, byte_fc, bytes/unit)
    for i in range(n):
        count = cps[i + 1] - cps[i]
        (fc_raw,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        fc = fc_raw & 0x3FFFFFFF
        if fc_raw & _FC_COMPRESSED:
            raw = wd[fc // 2:fc // 2 + count]
            pieces.append(raw.decode("cp1252", errors="replace"))
            piece_map.append((cps[i], cps[i + 1], fc // 2, 1))
        else:
            raw = wd[fc:fc + 2 * count]
            pieces.append(raw.decode("utf-16-le", errors="replace"))
            piece_map.append((cps[i], cps[i + 1], fc, 2))
    full = "".join(pieces)
    # The piece table covers every text range (main, footnotes, headers,
    # annotations...); ccpText bounds the main document — measured in
    # UTF-16 CODE UNITS ([MS-DOC] CPs), not code points, so supplementary-
    # plane chars count 2.
    total_units = len(full.encode("utf-16-le")) // 2
    if not 0 <= ccp_text <= total_units:
        return full, [], [], [], None
    main = _cp_slice(full, 0, ccp_text)
    flags_for_cp = _make_flags_for_cp(wd, table, piece_map)

    stories: list[str] = []
    footnotes: list[str] = []
    (ccp_ftn,) = struct.unpack_from("<i", wd, _CCP_FTN_OFF)
    (ccp_hdd,) = struct.unpack_from("<i", wd, _CCP_HDD_OFF)
    if ccp_ftn > 0 and len(wd) >= _FC_PLCFFNDTXT_OFF + 8:
        fc_fnd, lcb_fnd = struct.unpack_from("<II", wd, _FC_PLCFFNDTXT_OFF)
        if (lcb_fnd >= 8 and ccp_text + ccp_ftn <= total_units
                and fc_fnd + lcb_fnd <= len(table)):
            n_cps = lcb_fnd // 4
            cps_f = struct.unpack_from(f"<{n_cps}I", table, fc_fnd)
            for i in range(n_cps - 1):
                footnotes.append(_cp_slice(
                    full, ccp_text + cps_f[i],
                    ccp_text + min(cps_f[i + 1], ccp_ftn)))
    if ccp_hdd > 0 and len(wd) >= _FC_PLCFHDD_OFF + 8:
        fc_hdd, lcb_hdd = struct.unpack_from("<II", wd, _FC_PLCFHDD_OFF)
        hdd_base = ccp_text + max(ccp_ftn, 0)
        if (lcb_hdd >= 8 and hdd_base + ccp_hdd <= total_units
                and fc_hdd + lcb_hdd <= len(table)):
            n_cps = lcb_hdd // 4
            cps_h = struct.unpack_from(f"<{n_cps}I",
                                       table, fc_hdd)
            for i in range(n_cps - 1):
                stories.append(_cp_slice(full, hdd_base + cps_h[i],
                                         hdd_base + min(cps_h[i + 1],
                                                        ccp_hdd)))

    comments: list[str] = []
    (ccp_mcr,) = struct.unpack_from("<i", wd, _CCP_MCR_OFF)
    (ccp_atn,) = struct.unpack_from("<i", wd, _CCP_ATN_OFF)
    if ccp_atn > 0 and len(wd) >= _FC_PLCFANDTXT_OFF + 8:
        fc_and, lcb_and = struct.unpack_from("<II", wd, _FC_PLCFANDTXT_OFF)
        atn_base = (ccp_text + max(ccp_ftn, 0) + max(ccp_hdd, 0)
                    + max(ccp_mcr, 0))
        if (lcb_and >= 8 and atn_base + ccp_atn <= total_units
                and fc_and + lcb_and <= len(table)):
            n_cps = lcb_and // 4
            cps_a = struct.unpack_from(f"<{n_cps}I", table, fc_and)
            for i in range(n_cps - 1):
                comments.append(_cp_slice(full, atn_base + cps_a[i],
                                          atn_base + min(cps_a[i + 1],
                                                         ccp_atn)))
    return main, stories, footnotes, comments, flags_for_cp


def _segment_main(
    main: str, flags_for_cp,
) -> tuple[list[str], list[list[list[str]]]]:
    """Main text -> (paragraph texts, tables).

    With a paragraph bin table (PlcfbtePapx), marks flagged sprmPFInTable
    group into cells (``\\x07`` ends a cell, an interior ``\\r`` makes a
    multi-paragraph cell) and sprmPFTtp marks end rows — the real
    [MS-DOC] table model, matching what the conversion renders as docx
    tables. Without PAPX (or with no table flags anywhere) every mark is
    a flat paragraph break and field instructions strip across marks
    (the spanning-instruction rule)."""
    flags = None
    if flags_for_cp is not None:
        segs = re.split("([\r\x07\x0c])", main)
        raw_items: list[tuple[str, str]] = []
        cp = 0
        raw_flags = []
        for i in range(0, len(segs) - 1, 2):
            t, mark = segs[i], segs[i + 1]
            cp += len(t.encode("utf-16-le")) // 2
            raw_items.append((t, mark))
            raw_flags.append(flags_for_cp(cp))
            cp += 1
        tail = segs[-1]
        if not any(f[0] or f[1] for f in raw_flags):
            flags = None                        # no tables: flat model
        else:
            # Field instructions strip ACROSS segments before assembly: a
            # 0x13..0x14 range may span a paragraph mark, and the marks
            # inside the instruction disappear with it (same rule as the
            # flat model's full-text regex pass).
            items, flags = [], []
            carry = ""
            in_instr = False
            for (t, mark), fl in zip(raw_items, raw_flags):
                kept = []
                for ch in t:
                    if in_instr:
                        if ch in "\x14\x15":
                            in_instr = False
                            if ch == "\x15":    # no separator: keep the
                                kept.append(ch)  # end mark for _clean
                    elif ch == "\x13":
                        in_instr = True
                    else:
                        kept.append(ch)
                if in_instr:                    # mark inside instruction:
                    carry += "".join(kept)      # merge into next segment
                    continue
                items.append((carry + "".join(kept), mark))
                flags.append(fl)
                carry = ""
            # The tail (text after the final paragraph mark) always runs
            # through the same instruction-stripping loop — an 0x13..0x14
            # range starting and ending entirely inside the tail must
            # strip exactly as the flat model's full-text regex pass does.
            tail_kept = []
            for ch in tail:
                if in_instr:
                    if ch in "\x14\x15":
                        in_instr = False
                        if ch == "\x15":
                            tail_kept.append(ch)
                elif ch == "\x13":
                    in_instr = True
                else:
                    tail_kept.append(ch)
            tail = carry + "".join(tail_kept)

    if flags is None:
        text = _FIELD_CODE.sub("", main)
        parts = _PARA_MARKS.split(text)
        if parts and parts[-1] == "":           # final paragraph mark
            parts.pop()
        return parts, []

    paras: list[str] = []
    tables: list[list[list[str]]] = []
    tbl: list[list[str]] = []
    row: list[str] = []
    cell_parts: list[str] = []

    def flush_table() -> None:
        nonlocal tbl, row, cell_parts
        if cell_parts:                          # unterminated cell
            row.append(_clean_fragment("\n".join(cell_parts)))
            cell_parts = []
        if row:
            tbl.append(row)
            row = []
        if tbl:
            tables.append(tbl)
            tbl = []

    for (t, mark), (fin, fttp) in zip(items, flags):
        if fttp:                                # row-end mark
            if t:
                cell_parts.append(t)
            if cell_parts:
                row.append(_clean_fragment("\n".join(cell_parts)))
                cell_parts = []
            if row:
                tbl.append(row)
                row = []
        elif fin:
            cell_parts.append(t)
            if mark == "\x07":                  # cell mark
                row.append(_clean_fragment("\n".join(cell_parts)))
                cell_parts = []
        else:
            flush_table()
            paras.append(t)
    flush_table()
    if tail:
        paras.append(tail)
    return paras, tables


def doc_payload_from_bytes(content: bytes) -> str:
    """DOC bytes -> the docx_part payload JSON (docparts.extract_docx),
    mirroring what LibreOffice conversion + the reference's python-docx
    read (app/extractors.py:392-473 -> :288-390) yields for body text."""
    import json
    text, stories, ftn_stories, atn_stories, flags_for_cp = \
        _doc_subdocs(content)
    parts, tables = _segment_main(text, flags_for_cp)

    def split_story(raw: str) -> list[str]:
        ps = _PARA_MARKS.split(_FIELD_CODE.sub("", raw))
        if ps and ps[-1] == "":
            ps.pop()
        return [_clean_fragment(p) for p in ps]

    def story_paras(idx: int) -> list[str]:
        return split_story(stories[idx]) if idx < len(stories) else []

    # PlcfHdd stories 0-5 are note separators; per section the layout is
    # [evenH, oddH, evenF, oddF, firstH, firstF] — the odd (default)
    # header/footer is what a LibreOffice conversion surfaces into the
    # docx section python-docx reads (app/extractors.py:341-349).
    sections = []
    n_sections = max(0, (len(stories) - 6) // 6)
    for s in range(n_sections):
        base = 6 + 6 * s
        sections.append({"header": story_paras(base + 1),
                         "footer": story_paras(base + 3)})
    footnotes: list[str] = []
    for raw in ftn_stories:
        footnotes.extend(p for p in split_story(raw) if p.strip())
    comments: list[str] = []
    for raw in atn_stories:
        comments.extend(p for p in split_story(raw) if p.strip())
    return json.dumps({
        "paragraphs": [_clean_fragment(p) for p in parts],
        "tables": tables, "sections": sections, "footnotes": footnotes,
        "comments": comments,
    })


# -- PPT ([MS-PPT] 2.3 Document Stream) -------------------------------------

_RT_DOCUMENT = 0x03E8
_RT_SLIDE = 0x03EE
_RT_NOTES = 0x03F0
_RT_PPDRAWING = 0x040C
_RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
_RT_SLIDE_PERSIST_ATOM = 0x03F3
_RT_OUTLINE_TEXT_REF = 0x0F9E
_RT_TEXT_CHARS = 0x0FA0
_RT_TEXT_BYTES = 0x0FA8
_RT_CRYPT_SESSION = 0x2F14                      # CryptSession10Container
_ESCHER_CLIENT_TEXTBOX = 0xF00D                 # OfficeArtClientTextbox


def _pt_records(data: bytes, start: int, end: int):
    """Yield (ver_inst, rec_type, body_start, body_end) for the record run
    in data[start:end] ([MS-PPT] 2.3.1 RecordHeader)."""
    pos = start
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        body = pos + 8
        yield ver_inst, rtype, body, min(body + rlen, end)
        pos = body + rlen


def _ppt_shape_text(raw: str) -> str:
    """One text run -> python-pptx-style shape text: \\r paragraph marks
    join with \\n (shape.text joins paragraphs with newline)."""
    return raw.replace("\r", "\n").replace("\x0b", "\n").rstrip("\x00")


def ppt_payload_from_bytes(content: bytes) -> str:
    """PPT bytes -> the pptx_part payload JSON (docparts.extract_pptx).

    Slide text comes from SlideListWithText (instance 0), notes from
    instance 2, both grouped by SlidePersistAtom in persist order — the
    converted-pptx slide order LibreOffice emits
    (app/extractors.py:554-635 -> :507-552).
    """
    import json
    cfb = _Cfb(content)
    st = cfb.stream("PowerPoint Document")
    if st is None:
        raise ValueError("no PowerPoint Document stream in OLE container")

    slides: list[list[str]] = []
    notes: list[list[str]] = []
    slide_textboxes: list[list[str]] = []       # per Slide container, in order
    notes_textboxes: list[list[str]] = []       # per Notes container, in order

    def _decode_chars(b0: int, b1: int) -> str:
        return _ppt_shape_text(
            st[b0:b1 - (b1 - b0) % 2].decode("utf-16-le", errors="replace"))

    def _escher_textboxes(start: int, end: int, out: list[str],
                          depth: int) -> None:
        """Collect OfficeArtClientTextbox text runs inside a drawing layer.
        A ClientTextbox holding an OutlineTextRefAtom is a placeholder
        whose text lives in SlideListWithText — skipped, never
        double-counted."""
        for vi, rt, b0, b1 in _pt_records(st, start, end):
            if rt == _ESCHER_CLIENT_TEXTBOX:
                texts: list[str] = []
                has_ref = False
                for _v2, rt2, c0, c1 in _pt_records(st, b0, b1):
                    if rt2 == _RT_OUTLINE_TEXT_REF:
                        has_ref = True
                    elif rt2 == _RT_TEXT_CHARS:
                        texts.append(_decode_chars(c0, c1))
                    elif rt2 == _RT_TEXT_BYTES:
                        texts.append(_ppt_shape_text(
                            st[c0:c1].decode("latin-1")))
                if not has_ref:
                    out.extend(texts)
            elif (vi & 0xF) == 0xF and depth < 16:
                _escher_textboxes(b0, b1, out, depth + 1)

    def _walk_slw(body_start: int, body_end: int, sink: list[list[str]]):
        current: list[str] | None = None
        for vi, rt, b0, b1 in _pt_records(st, body_start, body_end):
            if rt == _RT_SLIDE_PERSIST_ATOM:
                current = []
                sink.append(current)
            elif rt == _RT_TEXT_CHARS:
                if current is None:
                    current = []
                    sink.append(current)
                current.append(_ppt_shape_text(
                    st[b0:b1 - (b1 - b0) % 2].decode("utf-16-le",
                                                     errors="replace")))
            elif rt == _RT_TEXT_BYTES:
                if current is None:
                    current = []
                    sink.append(current)
                # each byte is the low byte of a UTF-16 code unit
                current.append(_ppt_shape_text(
                    st[b0:b1].decode("latin-1")))

    def _walk(start: int, end: int, depth: int):
        for vi, rt, b0, b1 in _pt_records(st, start, end):
            if rt == _RT_CRYPT_SESSION:
                raise ValueError("encrypted presentation not supported")
            if rt == _RT_SLIDE_LIST_WITH_TEXT:
                inst = (vi >> 4) & 0xFFF
                if inst == 0:
                    _walk_slw(b0, b1, slides)
                elif inst == 2:
                    _walk_slw(b0, b1, notes)
            elif rt in (_RT_SLIDE, _RT_NOTES):
                # Nth Slide/Notes container <-> Nth SlidePersistAtom bucket
                # (the modeled persist order); its PPDrawing may carry
                # non-placeholder Escher textboxes the outline never sees.
                tbs: list[str] = []
                _escher_textboxes(b0, b1, tbs, 0)
                (slide_textboxes if rt == _RT_SLIDE
                 else notes_textboxes).append(tbs)
            elif (vi & 0xF) == 0xF and depth < 8:
                _walk(b0, b1, depth + 1)

    _walk(0, len(st), 0)
    for i, tbs in enumerate(slide_textboxes):
        while len(slides) <= i and tbs:
            slides.append([])
        if tbs:
            slides[i].extend(tbs)
    for i, tbs in enumerate(notes_textboxes):
        while len(notes) <= i and tbs:
            notes.append([])
        if tbs:
            notes[i].extend(tbs)
    if not slides:
        raise ValueError("no slide text records in PowerPoint Document")
    return json.dumps({
        "slides": [
            {"shapes": shapes,
             "notes": notes[i] if i < len(notes) else []}
            for i, shapes in enumerate(slides)
        ],
    })
