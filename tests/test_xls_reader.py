"""Legacy .xls (BIFF8) reader — fixtures are crafted byte-by-byte from
the PUBLIC specs (MS-CFB container, BIFF8 records), independently of the
reader's code paths, so the test is spec-vs-implementation rather than
reader-vs-its-own-writer.
"""

from __future__ import annotations

import struct

import pytest

from dig_etl_engine_spark.sources.xls import XlsFormatError, read_xls_grid

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def _sst(strings: list[str], split_at: int | None = None) -> bytes:
    """SST record; with split_at, the LAST string's bytes split into a
    CONTINUE record mid-string (fresh grbit byte), per spec."""
    head = struct.pack("<II", len(strings), len(strings))
    body = b""
    for s in strings[:-1] if split_at is not None else strings:
        body += struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    if split_at is None:
        return _rec(0xFC, head + body)
    last = strings[-1]
    body += struct.pack("<HB", len(last), 0) \
        + last[:split_at].encode("latin-1")
    cont = bytes([0]) + last[split_at:].encode("latin-1")
    return _rec(0xFC, head + body) + _rec(0x3C, cont)


def _rk_from_double(v: float) -> int:
    return (struct.unpack("<Q", struct.pack("<d", v))[0] >> 32) & 0xFFFFFFFC


def _workbook_stream(sst_split: int | None = None) -> bytes:
    strings = ["name", "value", "alpha", "continued"]
    cells = (
        _rec(0xFD, struct.pack("<HHHI", 0, 0, 0, 0))        # A1 "name"
        + _rec(0xFD, struct.pack("<HHHI", 0, 1, 0, 1))      # B1 "value"
        + _rec(0xFD, struct.pack("<HHHI", 1, 0, 0, 2))      # A2 "alpha"
        + _rec(0x203, struct.pack("<HHH", 1, 1, 0)
               + struct.pack("<d", 12.5))                   # B2 12.5
        + _rec(0x27E, struct.pack("<HHHI", 2, 0, 0,
                                  (7 << 2) | 2))            # A3 int RK 7
        + _rec(0x27E, struct.pack("<HHHI", 2, 1, 0,
                                  _rk_from_double(1.5)))    # B3 1.5
        + _rec(0xBD, struct.pack("<HH", 3, 0)
               + struct.pack("<HI", 0, (100 << 2) | 2 | 1)  # A4 100/100=1
               + struct.pack("<HI", 0, (9 << 2) | 2)        # B4 9
               + struct.pack("<H", 1))
        + _rec(0x201, struct.pack("<HHH", 4, 0, 0))         # A5 blank
        + _rec(0xFD, struct.pack("<HHHI", 4, 1, 0, 3))      # B5 "continued"
        + _rec(0x204, struct.pack("<HHHH", 5, 0, 0, 3)
               + bytes([0]) + b"raw")                       # A6 inline
        + _rec(0x205, struct.pack("<HHHBB", 5, 1, 0, 1, 0)) # B6 TRUE
    )
    sheet = _bof(0x0010) + cells + _rec(0x0A, b"")
    # globals: BOF, SST, BOUNDSHEET (lbPlyPos patched after sizing), EOF
    name = b"Sheet1"
    bsheet_payload = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    globals_ = (_bof(0x0005) + _sst(strings, sst_split)
                + _rec(0x85, bsheet_payload) + _rec(0x0A, b""))
    lbply = len(globals_)
    globals_ = globals_.replace(struct.pack("<IHBB", 0, 0, len(name), 0),
                                struct.pack("<IHBB", lbply, 0,
                                            len(name), 0))
    return globals_ + sheet


def _cfb(stream: bytes, sect: int = 512) -> bytes:
    """Wrap one 'Workbook' stream in a minimal OLE2 container:
    sector 0 = FAT, sector 1 = directory, 2.. = the stream (padded past
    the 4096-byte mini cutoff so the regular FAT path is exercised).
    ``sect=4096`` builds a version-4 container, whose sector offsets are
    (sector+1)*size — NOT header_size + sector*size."""
    padded = stream + b"\x00" * ((-len(stream)) % sect)
    n_stream = max(len(padded) // sect, 8)
    padded += b"\x00" * (n_stream * sect - len(padded))

    fat = [FATSECT, END]                        # FAT itself, directory
    for i in range(n_stream):
        fat.append(2 + i + 1 if i < n_stream - 1 else END)
    fat += [FREE] * (sect // 4 - len(fat))
    fat_sector = struct.pack(f"<{sect // 4}I", *fat)

    def entry(name: str, obj: int, start: int, size: int,
              child: int = FREE) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw + b"\x00" * (64 - len(raw))
        e += struct.pack("<HBB", len(raw), obj, 1)
        e += struct.pack("<III", FREE, FREE, child)
        e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16
        e += struct.pack("<IQ", start, size)
        return e

    directory = (entry("Root Entry", 5, END, 0, child=1)
                 + entry("Workbook", 2, 2, n_stream * sect)
                 + b"\x00" * 128 * 2)
    shift = sect.bit_length() - 1
    major = 0x4 if sect == 4096 else 0x3
    header = (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
              + struct.pack("<HHHHH", 0x3E, major, 0xFFFE, shift, 6)
              + b"\x00" * 6
              + struct.pack("<IIIII", 1 if major == 4 else 0, 1, 1, 0, 4096)
              + struct.pack("<IIII", END, 0, END, 0)
              + struct.pack("<I", 0)            # DIFAT[0] → FAT sector 0
              + struct.pack("<108I", *([FREE] * 108)))
    assert len(header) == 512
    # v4: the header occupies a full 4096-byte sector, zero-padded
    header += b"\x00" * (sect - 512)
    # directory must fill its sector
    directory += b"\x00" * (sect - len(directory))
    return header + fat_sector + directory + padded


EXPECT = [
    ["name", "value"],
    ["alpha", "12.5"],
    ["7", "1.5"],
    ["1", "9"],
    ["", "continued"],
    ["raw", "TRUE"],
]


def _write(tmp_path, stream: bytes) -> str:
    p = tmp_path / "fixture.xls"
    p.write_bytes(_cfb(stream))
    return str(p)


def test_cell_types_grid(spark, tmp_path):
    path = _write(tmp_path, _workbook_stream())
    assert read_xls_grid(path) == EXPECT


def test_sst_continue_split_mid_string(spark, tmp_path):
    path = _write(tmp_path, _workbook_stream(sst_split=4))
    assert read_xls_grid(path) == EXPECT


def test_windowed_read_through_source(spark, tmp_path):
    from dig_etl_engine_spark.sources.tabular import TabularSpec, read_excel
    path = _write(tmp_path, _workbook_stream())
    df = read_excel(spark, path,
                    TabularSpec(heading_row=1, content_start_row=2))
    rows = [tuple(r) for r in df.collect()]
    assert ("alpha", "12.5") in rows
    assert df.columns == ["name", "value"]


def test_v4_container_4096_byte_sectors(spark, tmp_path):
    """Version-4 compound files place sector N at (N+1)*4096 — a reader
    hardcoding the v3 512-byte header offset reads garbage."""
    p = tmp_path / "v4.xls"
    p.write_bytes(_cfb(_workbook_stream(), sect=4096))
    assert read_xls_grid(str(p)) == EXPECT


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "junk.xls"
    p.write_bytes(b"not an ole2 file at all" * 30)
    with pytest.raises(ValueError):
        read_xls_grid(str(p))


def test_pre_biff8_version_rejected(tmp_path):
    """A BIFF5 workbook (BOF vers 0x0500) has incompatible record layouts
    (no SST, flag-less LABEL strings); the reader must refuse it with a
    clear error instead of decoding cell text as mojibake."""
    stream = bytearray(_workbook_stream())
    assert struct.unpack_from("<H", stream, 4)[0] == 0x0600
    struct.pack_into("<H", stream, 4, 0x0500)
    path = _write(tmp_path, bytes(stream))
    with pytest.raises(XlsFormatError, match="BIFF"):
        read_xls_grid(path)
