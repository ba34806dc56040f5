"""Pure-stdlib legacy Excel (.xls, BIFF8) reader + minimal writer.

Closes the reference's xlrd-backed .xls leg (reference convert_xls.py:105-209
sniffs and converts both .xls and .xlsx via pandas/xlrd) without any
third-party package: the image has neither xlrd nor openpyxl, so both the
OLE2/CFB container and the BIFF8 record stream are parsed with ``struct``.

Scope (the subset a data pipeline meets):
- CFB v3: 512-byte sectors, FAT + DIFAT chains, directory, miniFAT/ministream
  for streams under the 4096-byte cutoff.
- Workbook globals: BOUNDSHEET, SST (with CONTINUE spans and per-span
  compression flags — the classic BIFF8 trap), FORMAT, XF, DATEMODE.
- Sheet cells: LABELSST, LABEL, RSTRING, NUMBER, RK, MULRK, BOOLERR,
  FORMULA (+ STRING cached results), BLANK/MULBLANK (skipped).
- Dates: XF format index → builtin/custom date formats → datetime via the
  1900/1904 serial systems (matching xlrd's conversion).

The writer emits a spec-shaped single-workbook CFB (ministream when the
Workbook stream is under the cutoff, regular FAT otherwise) — enough to
round-trip through this reader and through Excel-compatible consumers; it
exists so the test fixtures are real .xls bytes, not monkeypatched parses.
"""

from __future__ import annotations

import datetime as _dt
import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

# ---------------------------------------------------------------------------
# CFB (OLE2 compound file) reader
# ---------------------------------------------------------------------------


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def _chain(fat: list[int], start: int) -> list[int]:
    out, s, seen = [], start, set()
    while s != _ENDOFCHAIN and s != _FREE:
        if s in seen or s >= len(fat):
            raise ValueError("corrupt CFB: FAT chain loop/overrun")
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse a compound file → {stream name: bytes} (storages flattened)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic) — not .xls?")
    ssz = 1 << _u16(data, 30)
    msz = 1 << _u16(data, 32)
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    minifat_start = _u32(data, 60)
    difat_start = _u32(data, 68)
    n_difat = _u32(data, 72)

    def sector(n: int) -> bytes:
        o = 512 + n * ssz
        return data[o : o + ssz]

    # DIFAT: 109 entries in the header, then a sector chain
    difat = [_u32(data, 76 + 4 * i) for i in range(109)]
    s = difat_start
    for _ in range(n_difat):
        sec = sector(s)
        difat += [_u32(sec, 4 * i) for i in range(ssz // 4 - 1)]
        s = _u32(sec, ssz - 4)
    fat_secs = [x for x in difat[:n_fat] if x not in (_FREE, _ENDOFCHAIN)]
    fat: list[int] = []
    for fs in fat_secs:
        sec = sector(fs)
        fat += [_u32(sec, 4 * i) for i in range(ssz // 4)]

    def read_chain(start: int, size: int | None = None) -> bytes:
        buf = b"".join(sector(s) for s in _chain(fat, start))
        return buf if size is None else buf[:size]

    dirdata = read_chain(dir_start)
    entries = []
    for o in range(0, len(dirdata) - 127, 128):
        e = dirdata[o : o + 128]
        nlen = _u16(e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "replace")
        typ = e[66]
        start = _u32(e, 116)
        size = _u32(e, 120)
        entries.append((name, typ, start, size))
    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise ValueError("corrupt CFB: no root entry")
    ministream = read_chain(root[2], root[3]) if root[3] else b""
    minifat: list[int] = []
    if minifat_start not in (_FREE, _ENDOFCHAIN):
        mf = read_chain(minifat_start)
        minifat = [_u32(mf, 4 * i) for i in range(len(mf) // 4)]

    def read_mini(start: int, size: int) -> bytes:
        s, out, seen = start, [], set()
        while s != _ENDOFCHAIN and s != _FREE:
            if s in seen or s >= len(minifat):
                raise ValueError("corrupt CFB: miniFAT chain loop/overrun")
            seen.add(s)
            out.append(ministream[s * msz : (s + 1) * msz])
            s = minifat[s]
        return b"".join(out)[:size]

    streams: dict[str, bytes] = {}
    for name, typ, start, size in entries:
        if typ != 2:  # stream
            continue
        if size < mini_cutoff:
            streams[name] = read_mini(start, size)
        else:
            streams[name] = read_chain(start, size)
    return streams


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_RSTRING = 0x00D6
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FORMAT = 0x041E
_XF = 0x00E0
_DATEMODE = 0x0022

# builtin number-format ids that render as dates/times (ECMA-376 §18.8.30,
# same table xlrd uses)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(27, 37)) | {45, 46, 47} | set(
    range(50, 59)
)


def _records(stream: bytes, pos: int = 0):
    """Yield (opcode, payload, next_pos); CONTINUE records are NOT merged here
    (SST needs the span boundaries to re-read compression flags)."""
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos + 4 + ln
        pos += 4 + ln


class _SpanReader:
    """Reads BIFF8 unicode strings across a record + its CONTINUE records.

    At every span boundary mid-string, a fresh grbit byte precedes the
    remaining chars (MS-XLS 2.5.293) — the part naive parsers get wrong.
    """

    def __init__(self, spans: list[bytes]):
        self.spans = spans
        self.i = 0
        self.o = 0

    def _avail(self) -> int:
        return len(self.spans[self.i]) - self.o

    def _advance(self):
        while self.i < len(self.spans) - 1 and self._avail() == 0:
            self.i += 1
            self.o = 0

    def raw(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._advance()
            take = min(n, self._avail())
            if take == 0:
                raise ValueError("corrupt SST: ran out of CONTINUE data")
            out += self.spans[self.i][self.o : self.o + take]
            self.o += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.raw(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.raw(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.raw(4))[0]

    def unistr(self) -> str:
        cch = self.u16()
        return self._unistr_body(cch)

    def _unistr_body(self, cch: int) -> str:
        grbit = self.u8()
        rich = grbit & 0x08
        ext = grbit & 0x04
        nrich = self.u16() if rich else 0
        next_ = self.u32() if ext else 0
        chars: list[str] = []
        remaining = cch
        high = bool(grbit & 0x01)
        while remaining:
            self._advance()
            avail = self._avail()
            width = 2 if high else 1
            take_ch = min(remaining, avail // width)
            if take_ch == 0:
                # span boundary: a new grbit byte restates the compression
                high = bool(self.u8() & 0x01)
                continue
            raw = self.raw(take_ch * width)
            chars.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= take_ch
        self.raw(4 * nrich)
        self.raw(next_)
        return "".join(chars)


def _short_unistr(b: bytes, o: int) -> tuple[str, int]:
    """8-bit-length unicode string (sheet names)."""
    cch = b[o]
    grbit = b[o + 1]
    if grbit & 0x01:
        return b[o + 2 : o + 2 + 2 * cch].decode("utf-16-le"), o + 2 + 2 * cch
    return b[o + 2 : o + 2 + cch].decode("latin-1"), o + 2 + cch


def _inline_unistr(b: bytes) -> str:
    return _SpanReader([b]).unistr()


def _rk_value(rk: int) -> float:
    cents = rk & 0x01
    if rk & 0x02:  # 30-bit signed int
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # the RK float is the HIGH 4 bytes of an IEEE double (LE)
        val = struct.unpack("<d", b"\0\0\0\0" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if cents else val


def _is_date_fmt(fmt: str) -> bool:
    """Heuristic xlrd/pandas use: any date/time token outside quotes."""
    in_quote = False
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == '"':
            in_quote = not in_quote
        elif c == "\\":
            i += 1
        elif not in_quote:
            if c == "[":  # skip [h] [Red] etc. — but [h][m][s] ARE times
                j = fmt.find("]", i)
                seg = fmt[i + 1 : j if j != -1 else len(fmt)]
                if seg.lower().rstrip("m").rstrip("h").rstrip("s") == "" and seg:
                    return True
                i = j if j != -1 else len(fmt)
            elif c.lower() in "ymdhs":
                return True
        i += 1
    return False


def _serial_to_datetime(serial: float, date1904: bool) -> _dt.datetime:
    if date1904:
        epoch = _dt.datetime(1904, 1, 1)
        days = serial
    else:
        epoch = _dt.datetime(1899, 12, 31)
        days = serial
        if serial >= 60:  # Excel's phantom 1900-02-29
            days = serial - 1
    whole = int(days)
    frac = days - whole
    return (
        epoch
        + _dt.timedelta(days=whole)
        + _dt.timedelta(microseconds=round(frac * 86400 * 1e6))
    )


class XlsWorkbook:
    """Parsed .xls: sheet names, cells, date conversion."""

    def __init__(self, path_or_bytes):
        data = (
            path_or_bytes
            if isinstance(path_or_bytes, (bytes, bytearray))
            else open(path_or_bytes, "rb").read()
        )
        streams = cfb_streams(bytes(data))
        wb = streams.get("Workbook") or streams.get("Book")
        if wb is None:
            raise ValueError(f".xls has no Workbook stream (found {list(streams)})")
        self._wb = wb
        self.sheets: list[tuple[str, int]] = []  # (name, stream offset)
        self.sst: list[str] = []
        self.date1904 = False
        self._formats: dict[int, str] = {}
        self._xf_fmt: list[int] = []
        self._parse_globals()

    def _parse_globals(self):
        it = _records(self._wb)
        sst_spans: list[bytes] | None = None
        for op, payload, nxt in it:
            if op == _BOUNDSHEET:
                pos = _u32(payload, 0)
                name, _ = _short_unistr(payload, 6)
                self.sheets.append((name, pos))
            elif op == _SST:
                sst_spans = [payload]
            elif op == _CONTINUE and sst_spans is not None:
                sst_spans.append(payload)
            elif op == _DATEMODE:
                self.date1904 = bool(_u16(payload, 0))
            elif op == _FORMAT:
                fid = _u16(payload, 0)
                self._formats[fid] = _SpanReader([payload[2:]]).unistr()
            elif op == _XF:
                self._xf_fmt.append(_u16(payload, 2))
            elif op == _EOF:
                break
        if sst_spans:
            r = _SpanReader(sst_spans)
            r.u32()  # total refs
            nuniq = r.u32()
            self.sst = [r.unistr() for _ in range(nuniq)]

    def _xf_is_date(self, xf: int) -> bool:
        if xf >= len(self._xf_fmt):
            return False
        fid = self._xf_fmt[xf]
        if fid in self._BUILTIN_DATE:
            return True
        if fid in self._formats:
            return _is_date_fmt(self._formats[fid])
        return False

    _BUILTIN_DATE = _BUILTIN_DATE_FMTS

    def sheet_names(self) -> list[str]:
        return [n for n, _ in self.sheets]

    def _num(self, v: float, xf: int):
        return _serial_to_datetime(v, self.date1904) if self._xf_is_date(xf) else v

    def read_cells(self, sheet: str | int = 0) -> list[list]:
        """Dense list-of-rows (None-padded), same contract as the xlsx
        parser's read_sheet_cells."""
        if isinstance(sheet, int):
            name, pos = self.sheets[sheet]
        else:
            match = [s for s in self.sheets if s[0] == sheet]
            if not match:
                raise KeyError(f"sheet {sheet!r} not in {self.sheet_names()}")
            name, pos = match[0]
        cells: dict[int, dict[int, object]] = {}
        max_col = -1

        def put(r: int, c: int, v: object):
            nonlocal max_col
            cells.setdefault(r, {})[c] = v
            max_col = max(max_col, c)

        started = False
        pending_string: tuple[int, int] | None = None
        for op, b, nxt in _records(self._wb, pos):
            if op == _BOF:
                if started:
                    break
                started = True
            elif op == _EOF:
                break
            elif op == _LABELSST:
                r, c, _xf = struct.unpack_from("<HHH", b, 0)
                put(r, c, self.sst[_u32(b, 6)])
            elif op in (_LABEL, _RSTRING):
                r, c, _xf = struct.unpack_from("<HHH", b, 0)
                put(r, c, _inline_unistr(b[6:]))
            elif op == _NUMBER:
                r, c, xf = struct.unpack_from("<HHH", b, 0)
                put(r, c, self._num(struct.unpack_from("<d", b, 6)[0], xf))
            elif op == _RK:
                r, c, xf = struct.unpack_from("<HHH", b, 0)
                put(r, c, self._num(_rk_value(_u32(b, 6)), xf))
            elif op == _MULRK:
                r, c0 = struct.unpack_from("<HH", b, 0)
                n = (len(b) - 6) // 6
                for i in range(n):
                    xf = _u16(b, 4 + 6 * i)
                    put(r, c0 + i, self._num(_rk_value(_u32(b, 6 + 6 * i)), xf))
            elif op == _BOOLERR:
                r, c, _xf, v, is_err = struct.unpack_from("<HHHBB", b, 0)
                put(r, c, None if is_err else bool(v))
            elif op == _FORMULA:
                r, c, xf = struct.unpack_from("<HHH", b, 0)
                res = b[6:14]
                if res[6:8] == b"\xff\xff":
                    kind = res[0]
                    if kind == 0:  # string result in a following STRING record
                        pending_string = (r, c)
                    elif kind == 1:
                        put(r, c, bool(res[2]))
                    elif kind == 2:
                        put(r, c, None)  # error
                    # kind 3 = empty string/blank
                    elif kind == 3:
                        put(r, c, "")
                else:
                    put(r, c, self._num(struct.unpack("<d", res)[0], xf))
            elif op == _STRING and pending_string is not None:
                r, c = pending_string
                pending_string = None
                put(r, c, _inline_unistr(b))
        if not cells:
            return []
        n_rows = max(cells) + 1
        return [
            [cells.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)
        ]


def sheet_names_xls(path: str) -> list[str]:
    return XlsWorkbook(path).sheet_names()


def read_xls_cells(path: str, sheet: str | int = 0) -> list[list]:
    return XlsWorkbook(path).read_cells(sheet)


# ---------------------------------------------------------------------------
# minimal BIFF8 writer (test fixtures + .xlsx-less environments)
# ---------------------------------------------------------------------------


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _w_unistr(s: str) -> bytes:
    """16-bit-length BIFF8 unicode string, uncompressed (utf-16-le)."""
    enc = s.encode("utf-16-le")
    return struct.pack("<HB", len(s), 0x01) + enc


def _sst_records(strings: list[str], split_every: int | None = None) -> bytes:
    """SST (+ CONTINUE when ``split_every`` caps strings per record — used by
    tests to exercise span-crossing reads)."""
    chunks: list[bytes] = []
    body = struct.pack("<II", len(strings), len(strings))
    for i, s in enumerate(strings):
        if split_every and i and i % split_every == 0:
            chunks.append(body)
            body = b""
        body += _w_unistr(s)
    chunks.append(body)
    out = _rec(_SST, chunks[0])
    for c in chunks[1:]:
        out += _rec(_CONTINUE, c)
    return out


def _build_workbook_stream(
    sheets: dict[str, list[list]], sst_split_every: int | None = None
) -> bytes:
    sst: list[str] = []
    sst_idx: dict[str, int] = {}
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in sst_idx:
                    sst_idx[v] = len(sst)
                    sst.append(v)

    def _bof(dt: int) -> bytes:
        return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))

    sheet_blobs: list[bytes] = []
    for rows in sheets.values():
        body = _bof(0x0010)
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    body += _rec(
                        _LABELSST, struct.pack("<HHHI", r, c, 0, sst_idx[v])
                    )
                elif isinstance(v, bool):
                    body += _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                elif isinstance(v, (_dt.datetime, _dt.date)):
                    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
                        v = _dt.datetime(v.year, v.month, v.day)
                    delta = v - _dt.datetime(1899, 12, 31)
                    serial = delta.days + delta.seconds / 86400.0
                    if serial >= 60:
                        serial += 1
                    body += _rec(_NUMBER, struct.pack("<HHHd", r, c, 1, serial))
                else:
                    body += _rec(_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))
        body += _rec(_EOF, b"")
        sheet_blobs.append(body)

    # globals substream — BOUNDSHEET stream positions need the final layout,
    # so build with placeholders first, then patch
    def globals_blob(positions: list[int]) -> bytes:
        g = _bof(0x0005)
        g += _rec(_DATEMODE, struct.pack("<H", 0))
        # format id 164: explicit date format; XF 0 = general, XF 1 = date
        g += _rec(_FORMAT, struct.pack("<H", 164) + _w_unistr("yyyy-mm-dd hh:mm:ss"))
        g += _rec(_XF, struct.pack("<HH", 0, 0) + b"\0" * 16)
        g += _rec(_XF, struct.pack("<HH", 0, 164) + b"\0" * 16)
        for pos, name in zip(positions, sheets):
            enc = name.encode("utf-16-le")
            g += _rec(
                _BOUNDSHEET,
                struct.pack("<IHBB", pos, 0, len(name), 0x01) + enc,
            )
        g += _sst_records(sst, sst_split_every)
        g += _rec(_EOF, b"")
        return g

    size_guess = len(globals_blob([0] * len(sheets)))
    while True:
        positions = []
        off = size_guess
        for blob in sheet_blobs:
            positions.append(off)
            off += len(blob)
        g = globals_blob(positions)
        if len(g) == size_guess:
            return g + b"".join(sheet_blobs)
        size_guess = len(g)


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-level CFB v3 container: 512-byte sectors, 64-byte mini sectors,
    streams under 4096 bytes go to the ministream (spec behavior)."""
    SS, MS, CUT = 512, 64, 4096

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\0" * (-len(b) % unit)

    sectors: list[bytes] = []
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        if not data:
            return _ENDOFCHAIN
        data = pad(data, SS)
        first = len(sectors)
        n = len(data) // SS
        for i in range(n):
            sectors.append(data[i * SS : (i + 1) * SS])
            fat.append(first + i + 1 if i < n - 1 else _ENDOFCHAIN)
        return first

    # --- ministream + miniFAT
    mini_data = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, data in streams.items():
        if len(data) < CUT:
            start = len(minifat)
            data_p = pad(data, MS)
            n = len(data_p) // MS
            for i in range(n):
                minifat.append(start + i + 1 if i < n - 1 else _ENDOFCHAIN)
            mini_data += data_p
            mini_starts[name] = start

    big_starts: dict[str, int] = {
        name: add_chain(data) for name, data in streams.items() if len(data) >= CUT
    }
    mini_start_sect = add_chain(bytes(mini_data))
    minifat_sect = (
        add_chain(pad(b"".join(struct.pack("<I", x) for x in minifat), SS))
        if minifat
        else _ENDOFCHAIN
    )
    n_minifat_sectors = (
        (4 * len(minifat) + SS - 1) // SS if minifat else 0
    )

    # --- directory
    def dirent(
        name: str, typ: int, start: int, size: int, child: int = _FREE
    ) -> bytes:
        enc = name.encode("utf-16-le") + b"\0\0"
        e = bytearray(128)
        e[: len(enc)] = enc
        struct.pack_into("<H", e, 64, len(enc))
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREE, _FREE, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    names = list(streams)
    entries = [
        dirent(
            "Root Entry",
            5,
            mini_start_sect if mini_data else _ENDOFCHAIN,
            len(mini_data),
            child=1 if names else _FREE,
        )
    ]
    # degenerate right-spine tree: root's child is entry 1, each entry's
    # right sibling is the next (valid, and linear scanners see all entries)
    for i, name in enumerate(names):
        data = streams[name]
        start = mini_starts.get(name, big_starts.get(name, _ENDOFCHAIN))
        e = bytearray(dirent(name, 2, start, len(data)))
        if i + 1 < len(names):
            struct.pack_into("<I", e, 72, i + 2)  # right sibling entry id
        entries.append(bytes(e))
    dir_sect = add_chain(pad(b"".join(entries), SS))

    # --- FAT sectors themselves: need n_fat sectors such that the FAT also
    # covers its own sectors; solve the fixed point, then append at the tail
    n_data = len(sectors)
    n_fat_sectors = 1
    while (4 * (n_data + n_fat_sectors) + SS - 1) // SS > n_fat_sectors:
        n_fat_sectors += 1
    fat_sector_ids = list(range(n_data, n_data + n_fat_sectors))
    fat_full = fat + [_FATSECT] * n_fat_sectors
    fat_full += [_FREE] * (n_fat_sectors * (SS // 4) - len(fat_full))
    fat_blob = b"".join(struct.pack("<I", x) for x in fat_full)
    for i in range(n_fat_sectors):
        sectors.append(fat_blob[i * SS : (i + 1) * SS])

    header = bytearray(512)
    header[:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini
    struct.pack_into("<I", header, 44, n_fat_sectors)
    struct.pack_into("<I", header, 48, dir_sect)
    struct.pack_into("<I", header, 56, CUT)
    struct.pack_into("<I", header, 60, minifat_sect)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            fat_sector_ids[i] if i < len(fat_sector_ids) else _FREE,
        )
    return bytes(header) + b"".join(pad(s, SS) for s in sectors)


def write_xls_minimal(
    path: str, sheets: dict[str, list[list]], sst_split_every: int | None = None
) -> str:
    """Write a minimal BIFF8 .xls. Cell types: str, bool, int/float,
    datetime/date (stored as 1900-system serials with a date XF), None.

    ``sst_split_every`` forces SST CONTINUE splits every N strings (fixture
    knob for the span-crossing reader path)."""
    wb = _build_workbook_stream(sheets, sst_split_every)
    blob = _build_cfb({"Workbook": wb})
    with open(path, "wb") as f:
        f.write(blob)
    return path
