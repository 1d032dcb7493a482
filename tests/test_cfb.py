"""OLE2/CFB container (sources/cfb.py): header/FAT/miniFAT walk,
SummaryInformation property set, hand-derived byte vectors, hostile
shapes, office_info integration."""

from __future__ import annotations

import struct

import pytest

from rawdata_client_provider_gcs_spark.sources import cfb as C
from rawdata_client_provider_gcs_spark.sources import office as O


def test_roundtrip_big_and_mini_streams():
    big = b"\xec\xa5word stream " * 500   # > 4096: FAT chain
    small = b"BIFF" * 10                  # < 4096: mini chain
    blob = C.build_cfb(
        [("WordDocument", big), ("Extra", small)],
        title="T1", author="A1", app_name="Word",
    )
    parsed = C.parse_cfb(blob)
    by_name = {e["name"]: e for e in parsed["entries"]}
    assert by_name["WordDocument"]["payload"] == big
    assert by_name["Extra"]["payload"] == small
    assert parsed["version"] == 3
    si = C.parse_summary_info(by_name["\x05SummaryInformation"]["payload"])
    assert si == {"title": "T1", "subject": "", "author": "A1",
                  "app_name": "Word"}


def test_classification():
    assert C.classify_cfb([{"name": "WordDocument"}]) == "doc"
    assert C.classify_cfb([{"name": "Workbook"}]) == "xls"
    assert C.classify_cfb([{"name": "Book"}]) == "xls"
    assert C.classify_cfb([{"name": "PowerPoint Document"}]) == "ppt"
    assert C.classify_cfb([{"name": "Other"}]) == "cfb"


def test_header_layout_hand_derived():
    """Byte-level pins independent of the parser: MS-CFB fixed header
    offsets (major version at 26, byte order 28, sector shift 30,
    first directory sector at 48, mini cutoff at 56)."""
    blob = C.build_cfb([("WordDocument", b"x" * 5000)], title="t")
    assert blob[:8] == bytes.fromhex("d0cf11e0a1b11ae1")
    assert struct.unpack_from("<H", blob, 26)[0] == 3       # v3
    assert struct.unpack_from("<H", blob, 28)[0] == 0xFFFE  # byte order
    assert struct.unpack_from("<H", blob, 30)[0] == 9       # 512 B sectors
    assert struct.unpack_from("<H", blob, 32)[0] == 6       # 64 B minis
    assert struct.unpack_from("<I", blob, 56)[0] == 4096    # cutoff
    # DIFAT[0] points at the FAT sector; sector 0 marks itself FATSECT
    assert struct.unpack_from("<I", blob, 76)[0] == 0
    assert struct.unpack_from("<I", blob, 512)[0] == 0xFFFFFFFD
    # directory entry 0 is "Root Entry", type 5, at the declared sector
    dir_start = struct.unpack_from("<I", blob, 48)[0]
    off = 512 + dir_start * 512
    name_len = struct.unpack_from("<H", blob, off + 64)[0]
    assert blob[off : off + name_len - 2].decode("utf-16-le") == "Root Entry"
    assert blob[off + 66] == 5


def test_oleps_wide_strings_and_codepage():
    """VT_LPWSTR values and a UTF-8 codepage both decode."""
    # hand-pack: codepage 65001 + VT_LPWSTR title
    title = "Tïtle"
    wide = title.encode("utf-16-le") + b"\x00\x00"
    vals = [
        (1, struct.pack("<Ih2x", 0x02, -1535)),  # 65001 as signed i2
        (2, struct.pack("<II", 0x1F, len(title) + 1) + wide),
    ]
    head = 8 + 8 * len(vals)
    offs, pos = [], head
    for _, b in vals:
        offs.append(pos)
        pos += len(b)
    sec = struct.pack("<II", pos, len(vals))
    for (pid, _), o in zip(vals, offs):
        sec += struct.pack("<II", pid, o)
    for _, b in vals:
        sec += b
    stream = (
        struct.pack("<HHI", 0xFFFE, 0, 0) + b"\x00" * 16
        + struct.pack("<I", 1) + C._SUMMARY_FMTID + struct.pack("<I", 48)
        + sec
    )
    si = C.parse_summary_info(stream)
    assert si["title"] == title


def test_hostile_shapes():
    good = C.build_cfb([("WordDocument", b"y" * 5000)])
    with pytest.raises(ValueError, match="magic"):
        C.parse_cfb(b"not a cfb file at all" + b"\x00" * 600)
    with pytest.raises(ValueError, match="header"):
        C.parse_cfb(C.CFB_MAGIC + b"\x00" * 10)
    # wrong byte-order mark
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 0xFEFF)
    with pytest.raises(ValueError, match="byte-order"):
        C.parse_cfb(bytes(bad))
    # FAT loop: point the directory chain at itself
    bad = bytearray(good)
    dir_start = struct.unpack_from("<I", bad, 48)[0]
    struct.pack_into("<I", bad, 512 + 4 * dir_start, dir_start)
    with pytest.raises(ValueError, match="loop"):
        C.parse_cfb(bytes(bad))
    # stream chain out of range
    bad = bytearray(good)
    struct.pack_into("<I", bad, 48, 0x000FFFFF)
    with pytest.raises(ValueError, match="out of range"):
        C.parse_cfb(bytes(bad))
    # truncated summary stream
    with pytest.raises(ValueError, match="too short"):
        C.parse_summary_info(b"\xfe\xff\x00\x00")


def test_office_info_reads_cfb():
    doc = C.build_cfb(
        [("WordDocument", b"z" * 5000)], title="Memo", author="Bea",
    )
    info = O.office_info_of(doc)
    assert info == {"doc_format": "doc", "title": "Memo",
                    "creator": "Bea", "language": "", "n_parts": 2}
    xls = C.build_cfb([("Workbook", b"\x09\x08rec")], title="Q3")
    assert O.office_info_of(xls)["doc_format"] == "xls"
    # absence is data
    plain = C.build_cfb([("PowerPoint Document", b"slides")])
    info = O.office_info_of(plain)
    assert (info["doc_format"], info["title"], info["creator"]) == (
        "ppt", "", "",
    )


def test_office_parts_cfb_requires_valid_fib():
    """A CFB whose WordDocument stream is not a real FIB lands as a
    per-row error (the old metadata-only raise became a real decode)."""
    doc = C.build_cfb([("WordDocument", b"w" * 5000)], title="x")
    with pytest.raises(ValueError, match="FIB wIdent"):
        O.office_parts_of(doc)


def test_office_info_spark_mixed_formats(spark):
    """office_info over a mixed batch: OPC, CFB, and poison rows."""
    rows = [
        (0, O.build_docx(["p"], title="D", creator="c")),
        (1, C.build_cfb([("WordDocument", b"d" * 5000)],
                        title="L", author="a")),
        (2, b"\xd0\xcf\x11\xe0 corrupt cfb"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in O.office_info(df).collect()}
    assert (got[0].doc_format, got[0].title) == ("docx", "D")
    assert (got[1].doc_format, got[1].title, got[1].creator,
            got[1].n_parts) == ("doc", "L", "a", 2)
    assert got[2].error and got[2].doc_format is None
    assert got[3].error == "ValueError: null office payload"


def test_v4_container_4096_sectors():
    """Version-4 CFB (4096-byte sectors, header padded to a full
    first region): both the FAT and mini-stream paths."""
    big = b"\xec\xa5v4 word stream " * 600   # > 4096
    blob = C.build_cfb(
        [("WordDocument", big), ("Small", b"tiny-v4")],
        title="V4", author="Au", version=4,
    )
    assert struct.unpack_from("<H", blob, 26)[0] == 4
    assert struct.unpack_from("<H", blob, 30)[0] == 12
    parsed = C.parse_cfb(blob)
    assert parsed["version"] == 4
    by = {e["name"]: e for e in parsed["entries"]}
    assert by["WordDocument"]["payload"] == big
    assert by["Small"]["payload"] == b"tiny-v4"
    si = C.parse_summary_info(by["\x05SummaryInformation"]["payload"])
    assert (si["title"], si["author"]) == ("V4", "Au")
    info = O.office_info_of(blob)
    assert (info["doc_format"], info["n_parts"]) == ("doc", 3)
