"""Legacy XLS (OLE2/CFB container + BIFF8 workbook) parsing, stdlib-only.

The reference reads .xls through ``pd.read_excel`` (xlrd engine,
app/extractors.py:475-492, formats list app/config.py:129); round 1-2
declared OLE parsing out of scope and returned an error. This module closes
the common subset from scratch:

* **CFB** (MS-CFB): v3 512-byte sectors, header DIFAT + DIFAT chain, FAT
  chain walk, directory scan, miniFAT/ministream for streams under the
  4096-byte cutoff — enough to pull the ``Workbook``/``Book`` stream out of
  any ordinary .xls.
* **BIFF8** (MS-XLS): BOUNDSHEET-ordered worksheet substreams; SST with
  CONTINUE spill (fresh options byte per spill, rich/ext runs skipped),
  LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR cells; compressed and
  UTF-16 strings.

Out of subset (raises ValueError like the reference's per-file error):
BIFF5 and earlier, encrypted workbooks (FILEPASS), formula result caching.
The payload produced is the same sheet_part JSON as xlsx/ods, so legacy
workbooks ride E5's pinned ``[Sheet: name]`` + csv-dump kernel.

``cfb_directory_names`` is also used by the ingest MIME sniffer: libmagic
distinguishes ms-excel / msword / ms-powerpoint by the storage names inside
the OLE container, not by the (shared) D0CF11E0 magic.
"""

from __future__ import annotations

import io
import json
import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack_from(f"<{len(data) // 4}I", data))


class _Cfb:
    """Minimal MS-CFB reader: FAT/miniFAT chains + directory."""

    def __init__(self, content: bytes):
        if len(content) < 512 or not content.startswith(_CFB_SIG):
            raise ValueError("not an OLE2 compound file")
        (self.sector_shift,) = struct.unpack_from("<H", content, 30)
        if self.sector_shift not in (9, 12):
            raise ValueError("unsupported CFB sector size")
        self.ssz = 1 << self.sector_shift
        (self.mini_shift,) = struct.unpack_from("<H", content, 32)
        (n_fat,) = struct.unpack_from("<I", content, 44)
        (self.first_dir,) = struct.unpack_from("<I", content, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", content, 56)
        (self.first_minifat,) = struct.unpack_from("<I", content, 60)
        (n_minifat,) = struct.unpack_from("<I", content, 64)
        (first_difat,) = struct.unpack_from("<I", content, 68)
        (n_difat,) = struct.unpack_from("<I", content, 72)
        self.content = content

        # DIFAT: 109 header entries, then a chain of DIFAT sectors whose
        # last u32 points at the next DIFAT sector.
        fat_sectors = [s for s in _u32s(content[76:512]) if s != _FREESECT]
        sid = first_difat
        for _ in range(n_difat):
            if sid in (_ENDOFCHAIN, _FREESECT):
                break
            sect = self._sector(sid)
            entries = _u32s(sect)
            fat_sectors.extend(s for s in entries[:-1] if s != _FREESECT)
            sid = entries[-1]
        self.fat: list[int] = []
        for s in fat_sectors[:n_fat] if n_fat else fat_sectors:
            self.fat.extend(_u32s(self._sector(s)))

        self.minifat: list[int] = []
        sid = self.first_minifat
        for _ in range(n_minifat):
            if sid in (_ENDOFCHAIN, _FREESECT):
                break
            self.minifat.extend(_u32s(self._sector(sid)))
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN

        self.entries = self._directory()
        root = next((e for e in self.entries if e["type"] == 5), None)
        self._ministream = (
            self._chain(root["start"], root["size"]) if root else b"")

    def _sector(self, sid: int) -> bytes:
        off = 512 + sid * self.ssz
        return self.content[off:off + self.ssz]

    def _chain(self, start: int, size: int) -> bytes:
        out, sid, guard = bytearray(), start, 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and guard <= len(self.fat):
            out += self._sector(sid)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
        return bytes(out[:size])

    def _mini_chain(self, start: int, size: int) -> bytes:
        msz = 1 << self.mini_shift
        out, sid, guard = bytearray(), start, 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and guard <= len(self.minifat):
            out += self._ministream[sid * msz:(sid + 1) * msz]
            sid = (self.minifat[sid] if sid < len(self.minifat)
                   else _ENDOFCHAIN)
            guard += 1
        return bytes(out[:size])

    def _directory(self) -> list[dict]:
        raw, entries = self._dir_raw(), []
        for off in range(0, len(raw) - 127, 128):
            name_len, etype = raw[off + 64] | (raw[off + 65] << 8), raw[off + 66]
            if etype == 0:
                continue
            name = raw[off:off + max(0, name_len - 2)].decode(
                "utf-16-le", errors="replace")
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<I", raw, off + 120)
            entries.append({"name": name, "type": etype,
                            "start": start, "size": size})
        return entries

    def _dir_raw(self) -> bytes:
        out, sid, guard = bytearray(), self.first_dir, 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and guard <= len(self.fat):
            out += self._sector(sid)
            sid = self.fat[sid] if sid < len(self.fat) else _ENDOFCHAIN
            guard += 1
        return bytes(out)

    def stream(self, name: str) -> bytes | None:
        for e in self.entries:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < self.mini_cutoff:
                    return self._mini_chain(e["start"], e["size"])
                return self._chain(e["start"], e["size"])
        return None


def cfb_directory_names(content: bytes) -> list[str]:
    """Storage/stream names of an OLE2 container ('' list if not CFB) —
    what libmagic keys ms-excel vs msword vs ms-powerpoint on."""
    try:
        return [e["name"] for e in _Cfb(content).entries]
    except ValueError:
        return []


# ---------------------------------------------------------------------------
# BIFF8
# ---------------------------------------------------------------------------

def _records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        opcode, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, opcode, stream[pos + 4:pos + 4 + ln]
        pos += 4 + ln


class _SstReader:
    """XLUnicodeRichExtendedString reader across CONTINUE spills: each
    spill restarts with a fresh options byte (MS-XLS 2.5.293)."""

    def __init__(self, payloads: list[bytes]):
        self.payloads, self.idx, self.pos = payloads, 0, 0

    def _ensure(self):
        while self.pos >= len(self.payloads[self.idx]):
            self.idx += 1
            self.pos = 0

    def take(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._ensure()
            chunk = self.payloads[self.idx][self.pos:self.pos + n]
            out += chunk
            self.pos += len(chunk)
            n -= len(chunk)
        return bytes(out)

    def chars(self, n_chars: int, wide: bool) -> str:
        """Read n_chars, re-reading the options byte at each spill
        boundary (the wide flag can change mid-string, MS-XLS 2.5.293) —
        only character data restarts with a grbit; counts and rich/ext
        runs continue raw (hence plain ``take`` for those)."""
        out = []
        while n_chars:
            avail = len(self.payloads[self.idx]) - self.pos
            if avail < (2 if wide else 1):  # spill: fresh grbit byte
                self.idx += 1
                self.pos = 1
                wide = bool(self.payloads[self.idx][0] & 1)
                continue
            step = min(n_chars, avail // 2 if wide else avail)
            raw = self.payloads[self.idx][self.pos:
                                          self.pos + (step * 2 if wide
                                                      else step)]
            self.pos += len(raw)
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
            n_chars -= step
        return "".join(out)


def _parse_sst(payloads: list[bytes]) -> list[str]:
    r = _SstReader(payloads)
    r.take(8)  # total count, unique count
    (n_unique,) = struct.unpack("<I", payloads[0][4:8])
    out = []
    for _ in range(n_unique):
        (n_chars,) = struct.unpack("<H", r.take(2))
        grbit = r.take(1)[0]
        n_runs = struct.unpack("<H", r.take(2))[0] if grbit & 8 else 0
        ext = struct.unpack("<I", r.take(4))[0] if grbit & 4 else 0
        out.append(r.chars(n_chars, bool(grbit & 1)))
        r.take(n_runs * 4 + ext)
    return out


def _rk_value(rk: int):
    cents = rk & 1
    if rk & 2:  # 30-bit signed integer
        val = rk >> 2
        if val >= (1 << 29):
            val -= 1 << 30
        num = float(val)
    else:       # high 30 bits of an IEEE double
        (num,) = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))
    num = num / 100.0 if cents else num
    return int(num) if float(num).is_integer() else num


def _inline_string(data: bytes, off: int) -> str:
    (n_chars,) = struct.unpack_from("<H", data, off)
    grbit = data[off + 2]
    p = off + 3
    if grbit & 8:
        p += 2
    if grbit & 4:
        p += 4
    if grbit & 1:
        return data[p:p + 2 * n_chars].decode("utf-16-le")
    return data[p:p + n_chars].decode("latin-1")


def _num(v: float):
    return int(v) if float(v).is_integer() else v


def xls_payload_from_bytes(content: bytes) -> str:
    """XLS bytes -> the sheet_part payload JSON (structured.extract_sheets),
    mirroring ``pd.read_excel(sheet_name=None)`` via xlrd for the cell
    types ordinary writers emit (app/extractors.py:475-492)."""
    cfb = _Cfb(content)
    wb = cfb.stream("Workbook") or cfb.stream("Book")
    if wb is None:
        raise ValueError("no Workbook stream in OLE container")

    sst: list[str] = []
    bounds: list[tuple[int, str]] = []
    pending_sst: list[bytes] | None = None
    for pos, opcode, data in _records(wb):
        if opcode == 0x00FC:                       # SST
            pending_sst = [data]
        elif opcode == 0x003C and pending_sst is not None:  # CONTINUE
            pending_sst.append(data)
        elif pending_sst is not None:
            sst = _parse_sst(pending_sst)
            pending_sst = None
        if opcode == 0x002F:                       # FILEPASS
            raise ValueError("encrypted workbook not supported")
        if opcode == 0x0085:                       # BOUNDSHEET
            (sheet_off,) = struct.unpack_from("<I", data, 0)
            n = data[6]
            grbit = data[7]
            name = (data[8:8 + 2 * n].decode("utf-16-le") if grbit & 1
                    else data[8:8 + n].decode("latin-1"))
            bounds.append((sheet_off, name))
        if opcode == 0x000A and not bounds:        # EOF before any sheet
            break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)

    sheets = []
    for sheet_off, name in bounds:
        cells: dict[tuple[int, int], object] = {}
        pending_formula: tuple[int, int] | None = None
        for pos, opcode, data in _records(wb[sheet_off:]):
            if opcode == 0x000A:                   # EOF: end of substream
                break
            if opcode == 0x0006:                   # FORMULA (cached result)
                row, col = struct.unpack_from("<HH", data, 0)
                if data[12:14] == b"\xff\xff":     # non-numeric result
                    rtype = data[6]
                    if rtype == 0:                 # string: next STRING rec
                        pending_formula = (row, col)
                    elif rtype == 1:               # boolean
                        cells[(row, col)] = bool(data[8])
                    elif rtype == 3:               # empty string
                        cells[(row, col)] = ""
                    # rtype 2 (error) stays unset, like xlrd -> NaN
                else:
                    (num,) = struct.unpack_from("<d", data, 6)
                    cells[(row, col)] = _num(num)
            elif opcode == 0x0207 and pending_formula is not None:  # STRING
                cells[pending_formula] = _inline_string(data, 0)
                pending_formula = None
            elif opcode not in (0x04BC, 0x0221, 0x0236):
                # only SHRFMLA/ARRAY/TABLE may sit between a string-result
                # FORMULA and its STRING ([MS-XLS] 2.4.87); anything else
                # clears the pending cell so a later unrelated STRING can
                # never land at stale coordinates
                pending_formula = None
            if opcode == 0x00FD:                   # LABELSST
                row, col = struct.unpack_from("<HH", data, 0)
                (isst,) = struct.unpack_from("<I", data, 6)
                cells[(row, col)] = sst[isst] if isst < len(sst) else ""
            elif opcode == 0x0203:                 # NUMBER
                row, col = struct.unpack_from("<HH", data, 0)
                (num,) = struct.unpack_from("<d", data, 6)
                cells[(row, col)] = _num(num)
            elif opcode == 0x027E:                 # RK
                row, col = struct.unpack_from("<HH", data, 0)
                (rk,) = struct.unpack_from("<I", data, 6)
                cells[(row, col)] = _rk_value(rk)
            elif opcode == 0x00BD:                 # MULRK
                row, col0 = struct.unpack_from("<HH", data, 0)
                n = (len(data) - 6) // 6
                for i in range(n):
                    (rk,) = struct.unpack_from("<I", data, 4 + 6 * i + 2)
                    cells[(row, col0 + i)] = _rk_value(rk)
            elif opcode == 0x0205:                 # BOOLERR
                row, col = struct.unpack_from("<HH", data, 0)
                if data[7] == 0:                   # bool, not error
                    cells[(row, col)] = bool(data[6])
            elif opcode == 0x0204:                 # LABEL (inline string)
                row, col = struct.unpack_from("<HH", data, 0)
                cells[(row, col)] = _inline_string(data, 6)
        if cells:
            n_rows = max(r for r, _ in cells) + 1
            n_cols = max(c for _, c in cells) + 1
            grid = [[cells.get((r, c)) for c in range(n_cols)]
                    for r in range(n_rows)]
        else:
            grid = []
        columns = (["" if v is None else str(v) for v in grid[0]]
                   if grid else [])
        sheets.append({"name": name, "columns": columns, "rows": grid[1:]})
    return json.dumps({"sheets": sheets})
