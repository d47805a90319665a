"""Minimal legacy ``.xls`` (BIFF8) reader — stdlib only, no xlrd.

Closes the S3 gate (`dig_tabular_import.py:107-110` reads legacy Excel via
pyexcel; this container has no Excel engine). Scope: the cell types real
tabular imports contain — shared strings (LABELSST + SST with CONTINUE
splits), inline labels, NUMBER/RK/MULRK numerics, BLANK/BOOLERR, numeric
FORMULA results — returned as the same all-string grid shape as the
stdlib OOXML reader (`sources/xlsx.py:read_xlsx_grid`), so
``read_excel`` windows both formats identically.

Format references (public specs): MS-CFB (the OLE2 compound file) and
MS-XLS / OpenOffice's "Microsoft Compound Document & Excel File Format"
documentation. Driver-side by design, like the xlsx reader — the
reference's sheets are human-sized.
"""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


class XlsFormatError(ValueError):
    pass


# --- MS-CFB container ---------------------------------------------------------


def _read_chain(data: bytes, fat: list[int], start: int,
                sector_size: int) -> bytes:
    out = []
    sec = start
    seen = 0
    while sec not in (_ENDOFCHAIN, _FREESECT):
        # MS-CFB: sector N starts at (N+1) * sector_size — identical to
        # 512 + N*512 for v3, but NOT for v4's 4096-byte sectors
        off = (sec + 1) * sector_size
        out.append(data[off:off + sector_size])
        if sec >= len(fat):
            raise XlsFormatError(f"FAT chain points past FAT: {sec}")
        sec = fat[sec]
        seen += 1
        if seen > len(fat) + 1:
            raise XlsFormatError("FAT chain cycle")
    return b"".join(out)


def _cfb_stream(data: bytes, name: bytes) -> bytes:
    """Extract a named stream from an OLE2 compound file."""
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise XlsFormatError("not an OLE2 compound file")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sector_size, mini_size = 1 << sector_shift, 1 << mini_shift
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    # FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    sec = first_difat
    for _ in range(n_difat):
        off = (sec + 1) * sector_size
        ents = struct.unpack_from(f"<{sector_size // 4}I", data, off)
        difat.extend(ents[:-1])
        sec = ents[-1]
    fat: list[int] = []
    for fs in difat:
        if fs in (_ENDOFCHAIN, _FREESECT):
            continue
        fat.extend(struct.unpack_from(f"<{sector_size // 4}I", data,
                                      (fs + 1) * sector_size))

    directory = _read_chain(data, fat, first_dir, sector_size)
    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        obj_type = directory[off + 66]
        ename = directory[off:off + max(0, name_len - 2)]
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<Q", directory, off + 120)[0]
        if obj_type == 5:                      # root: the mini container
            root_start, root_size = start, size
        elif obj_type == 2 and ename == name:
            target_start, target_size = start, size
    if target_start is None:
        raise XlsFormatError(f"stream {name!r} not found")

    if target_size >= mini_cutoff:
        return _read_chain(data, fat, target_start,
                           sector_size)[:target_size]
    # mini-stream: the root entry's FAT chain is the container; the
    # miniFAT chains mini-sectors inside it
    container = _read_chain(data, fat, root_start,
                            sector_size)[:root_size]
    minifat: list[int] = []
    sec = first_minifat
    for _ in range(n_minifat):
        minifat.extend(struct.unpack_from(
            f"<{sector_size // 4}I", data, (sec + 1) * sector_size))
        sec = fat[sec]
    out = []
    sec = target_start
    seen = 0
    while sec not in (_ENDOFCHAIN, _FREESECT):
        out.append(container[sec * mini_size:(sec + 1) * mini_size])
        if sec >= len(minifat):
            raise XlsFormatError("miniFAT chain points past miniFAT")
        sec = minifat[sec]
        seen += 1
        if seen > len(minifat) + 1:
            raise XlsFormatError("miniFAT chain cycle")
    return b"".join(out)[:target_size]


# --- BIFF8 records ------------------------------------------------------------


def _records(stream: bytes, start: int = 0):
    off = start
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        if rid == 0 and ln == 0:
            return                              # zero padding tail
        yield rid, stream[off + 4:off + 4 + ln], off
        off += 4 + ln


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared string table, honoring CONTINUE splits. A split may land
    between strings or mid-string; a mid-string continuation re-states
    the encoding flags byte."""
    parts = [payload] + continues
    strings: list[str] = []
    n_unique = struct.unpack_from("<I", parts[0], 4)[0]
    pi, off = 0, 8

    def _avail() -> int:
        return len(parts[pi]) - off

    def _next_part() -> None:
        nonlocal pi, off
        if pi + 1 >= len(parts):
            raise XlsFormatError("corrupt SST: ran out of CONTINUE data")
        pi += 1
        off = 0

    def _read(n: int) -> bytes:
        nonlocal off
        b = parts[pi][off:off + n]
        off += n
        return b

    while len(strings) < n_unique:
        if _avail() == 0:
            _next_part()
        cch = struct.unpack("<H", _read(2))[0]
        flags = _read(1)[0]
        rich = flags & 0x08
        ext = flags & 0x04
        n_runs = struct.unpack("<H", _read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", _read(4))[0] if ext else 0
        chars: list[str] = []
        wide = bool(flags & 0x01)
        remaining = cch
        while remaining:
            if _avail() == 0:
                _next_part()
                wide = bool(_read(1)[0] & 0x01)   # fresh grbit
            unit = 2 if wide else 1
            take = min(remaining, _avail() // unit)
            if take == 0:
                # a wide string leaving a single dangling byte in the
                # record — corrupt input; never spin
                raise XlsFormatError("corrupt SST: truncated character")
            raw = _read(take * unit)
            chars.append(raw.decode("utf-16-le" if wide else "latin-1"))
            remaining -= take
        strings.append("".join(chars))
        skip = 4 * n_runs + cb_ext
        while skip:
            if _avail() == 0:
                _next_part()
            step = min(skip, _avail())
            _read(step)
            skip -= step
    return strings


def _rk_value(rk: int) -> float:
    val: float
    if rk & 0x02:                               # integer payload
        val = float(struct.unpack("<i", struct.pack("<I", rk))[0] >> 2)
    else:                                       # high 30 bits of a double
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def read_xls_grid(path: str, sheet_number: int = 1) -> list[list[str]]:
    """Read one worksheet of a legacy ``.xls`` as a dense all-string
    grid (same contract as ``read_xlsx_grid``). 1-based sheet index."""
    with open(path, "rb") as fh:
        data = fh.read()
    try:
        return _read_grid(data, sheet_number)
    except (struct.error, IndexError) as exc:
        # truncated/corrupt payloads surface as struct underflows or
        # bad SST indexes deep in record parsing — one clear error
        raise XlsFormatError(f"corrupt .xls file: {exc}") from exc


def _read_grid(data: bytes, sheet_number: int) -> list[list[str]]:
    try:
        wb = _cfb_stream(data, "Workbook".encode("utf-16-le"))
    except XlsFormatError:
        if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
            raise
        wb = _cfb_stream(data, "Book".encode("utf-16-le"))

    # the globals substream must open with a BIFF8 BOF ([MS-XLS] 2.4.21:
    # record 0x0809, vers 0x0600). The "Book" stream name above also
    # matches BIFF5/7 workbooks, whose record layouts differ (no SST;
    # LABEL is a flag-less byte string) — parsing them with the BIFF8
    # reader below would silently decode cell text as mojibake, so
    # reject anything pre-BIFF8 up front instead of misparsing.
    rid, ln = struct.unpack_from("<HH", wb, 0)
    if rid != 0x809 or ln < 4:
        raise XlsFormatError("workbook stream does not start with BOF")
    vers = struct.unpack_from("<H", wb, 4)[0]
    if vers != 0x0600:
        raise XlsFormatError(
            f"unsupported BIFF version 0x{vers:04x} (pre-BIFF8 .xls — "
            "only BIFF8, Excel 97+, is supported)")

    # workbook globals: SST (+ its CONTINUEs) and sheet offsets. The
    # globals substream ends at its own EOF record, BEFORE the first
    # sheet substream — stop there instead of scanning every sheet's
    # cell records in the whole stream.
    sst: list[str] = []
    sheet_offsets: list[int] = []
    pending_sst: bytes | None = None
    pending_cont: list[bytes] = []
    for rid, payload, _off in _records(wb):
        if rid == 0xFC:
            pending_sst, pending_cont = payload, []
        elif rid == 0x3C and pending_sst is not None:
            pending_cont.append(payload)
        elif rid == 0x85:                       # BOUNDSHEET
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif rid == 0x0A:
            break                               # end of globals
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, pending_cont)
    if not 1 <= sheet_number <= len(sheet_offsets):
        raise XlsFormatError(
            f"sheet {sheet_number} of {len(sheet_offsets)} not present")

    cells: dict[tuple[int, int], str] = {}
    max_r = max_c = -1

    def put(r: int, c: int, v: str) -> None:
        nonlocal max_r, max_c
        cells[(r, c)] = v
        max_r, max_c = max(max_r, r), max(max_c, c)

    for rid, payload, _off in _records(wb, sheet_offsets[sheet_number - 1]):
        if rid == 0x0A:                         # EOF of this substream
            break
        if rid == 0xFD:                         # LABELSST
            r, c, _x, i = struct.unpack_from("<HHHI", payload)
            put(r, c, sst[i])
        elif rid == 0x203:                      # NUMBER
            r, c, _x = struct.unpack_from("<HHH", payload)
            put(r, c, _fmt_num(struct.unpack_from("<d", payload, 6)[0]))
        elif rid == 0x27E:                      # RK
            r, c, _x, rk = struct.unpack_from("<HHHI", payload)
            put(r, c, _fmt_num(_rk_value(rk)))
        elif rid == 0xBD:                       # MULRK
            r, c0 = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for j in range(n):
                rk = struct.unpack_from("<I", payload, 4 + 6 * j + 2)[0]
                put(r, c0 + j, _fmt_num(_rk_value(rk)))
        elif rid == 0x201:                      # BLANK
            r, c, _x = struct.unpack_from("<HHH", payload)
            put(r, c, "")
        elif rid == 0x205:                      # BOOLERR
            r, c, _x, v, is_err = struct.unpack_from("<HHHBB", payload)
            put(r, c, "" if is_err else ("TRUE" if v else "FALSE"))
        elif rid == 0x06:                       # FORMULA (numeric result)
            r, c, _x = struct.unpack_from("<HHH", payload)
            res = payload[6:14]
            if res[6:8] != b"\xff\xff":         # IEEE double result
                put(r, c, _fmt_num(struct.unpack("<d", res)[0]))
        elif rid == 0x204:                      # LABEL (inline string)
            r, c, _x, cch = struct.unpack_from("<HHHH", payload)
            flags = payload[8]
            pos = 9
            if flags & 0x08:                    # rich runs: skip cRun
                pos += 2
            if flags & 0x04:                    # ext: skip cbExtRst
                pos += 4
            wide = flags & 0x01
            raw = payload[pos:pos + cch * (2 if wide else 1)]
            put(r, c, raw.decode("utf-16-le" if wide else "latin-1"))

    if max_r < 0:
        return []
    return [[cells.get((r, c), "") for c in range(max_c + 1)]
            for r in range(max_r + 1)]
