"""RAR 4.x / RAR5 census + stored extraction (sources/rar.py):
roundtrips, bsdtar interop, the census-only compressed boundary, and
hostile shapes."""

from __future__ import annotations

import binascii
import shutil
import struct
import subprocess

import pytest

from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)
from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import rar as RR

MEMBERS = [
    ("doc/a.txt", b"alpha rar text"),
    ("sub/dir/b.bin", bytes(range(256)) * 2),
    ("empty", b""),
]


@pytest.mark.parametrize("flavor", ["rar4", "rar5"])
def test_roundtrip_and_census_fields(flavor):
    build = RR.build_rar4 if flavor == "rar4" else RR.build_rar5
    parse = RR.parse_rar4 if flavor == "rar4" else RR.parse_rar5
    blob = build(MEMBERS)
    assert RR.sniff_rar(blob) == flavor
    ms = parse(blob)
    assert [(m["path"], m["payload"]) for m in ms] == MEMBERS
    for m in ms:
        assert m["method"] == "store"
        assert m["crc32"] == binascii.crc32(m["payload"]) & 0xFFFFFFFF
        assert m["size"] == len(m["payload"])
        assert not m["is_dir"]
    fmt, flat = RR.parse_rar_members(blob)
    assert fmt == flavor
    assert [(m["path"], m["payload"]) for m in flat] == MEMBERS


@pytest.mark.parametrize("flavor", ["rar4", "rar5"])
def test_archive_members_and_classify_route(flavor):
    build = RR.build_rar4 if flavor == "rar4" else RR.build_rar5
    blob = build(MEMBERS)
    fmt, ms = A.parse_archive(blob)
    assert fmt == flavor
    assert [(m["path"], m["payload"]) for m in ms] == MEMBERS
    from rawdata_client_provider_gcs_spark.sources.classify import (
        classify_payload,
    )
    got = classify_payload(blob)
    assert (got["format"], got["category"]) == (flavor, "archive")


@pytest.mark.skipif(shutil.which("bsdtar") is None, reason="no bsdtar")
@pytest.mark.parametrize("flavor", ["rar4", "rar5"])
def test_bsdtar_reads_our_archives(flavor, tmp_path):
    """libarchive's independent RAR readers extract our fixtures
    byte-exact — the writers cannot mirror a reader bug."""
    build = RR.build_rar4 if flavor == "rar4" else RR.build_rar5
    src = tmp_path / "t.rar"
    src.write_bytes(build(MEMBERS))
    out = tmp_path / "x"
    out.mkdir()
    r = subprocess.run(
        ["bsdtar", "-xf", str(src), "-C", str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    for p, d in MEMBERS:
        assert (out / p).read_bytes() == d, (flavor, p)


def test_compressed_member_is_census_only():
    # flip the rar5 compression-info vint (0 = v0/store) to method 3
    blob = bytearray(RR.build_rar5([("x.txt", b"body bytes")]))
    # the file block: find the name, walk back — easier to rebuild via
    # the writer's layout: fields end ...comp, host, nlen, name.  Flip
    # by patching the comp vint byte (0x00 -> 0x03 << 7 needs 2 bytes),
    # so rebuild the archive with a hand-patched block instead.
    fields = (
        RR._vint_w(0x04) + RR._vint_w(10) + RR._vint_w(0)
        + struct.pack("<I", binascii.crc32(b"body bytes"))
        + RR._vint_w(3 << 7)  # method 3 (normal)
        + RR._vint_w(1) + RR._vint_w(5) + b"x.txt"
    )
    blob = (
        RR.RAR5_SIG
        + RR._rar5_block(1, RR._vint_w(0))
        + RR._rar5_block(2, fields, b"\x00" * 10)
        + RR._rar5_block(5, RR._vint_w(0))
    )
    ms = RR.parse_rar5(blob)
    assert ms[0]["method"] == "normal" and ms[0]["payload"] is None
    assert ms[0]["size"] == 10  # census still speaks
    with pytest.raises(UnsupportedCodecError, match="only stored"):
        RR.parse_rar_members(blob)
    # rar4: method byte 0x33
    blob4 = bytearray(RR.build_rar4([("x.txt", b"body bytes")]))
    i = bytes(blob4).find(b"x.txt") - 7  # METHOD byte offset from name
    assert blob4[i] == 0x30
    blob4[i] = 0x33
    # fix the head CRC16 (head starts 7+25+... walk: find block start)
    start = bytes(blob4).find(b"x.txt") - 32  # name at 7+25 in header
    hsize = struct.unpack("<H", blob4[start + 5 : start + 7])[0]
    crc = binascii.crc32(bytes(blob4[start + 2 : start + hsize])) & 0xFFFF
    blob4[start : start + 2] = struct.pack("<H", crc)
    ms = RR.parse_rar4(bytes(blob4))
    assert ms[0]["method"] == "method-3" and ms[0]["payload"] is None
    with pytest.raises(UnsupportedCodecError, match="only stored"):
        RR.parse_rar_members(bytes(blob4))


def test_hostile_shapes():
    good5 = RR.build_rar5(MEMBERS)
    good4 = RR.build_rar4(MEMBERS)
    # header CRC corruption
    bad = bytearray(good5)
    bad[12] ^= 0xFF
    with pytest.raises(ValueError, match="rar5.*CRC|CRC.*rar5|CRC32"):
        RR.parse_rar5(bytes(bad))
    bad = bytearray(good4)
    bad[9] ^= 0xFF
    with pytest.raises(ValueError, match="CRC16"):
        RR.parse_rar4(bytes(bad))
    # payload corruption fails the member CRC-32
    bad = bytearray(good5)
    bad[good5.find(b"alpha rar text")] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32"):
        RR.parse_rar5(bytes(bad))
    bad = bytearray(good4)
    bad[good4.find(b"alpha rar text")] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32"):
        RR.parse_rar4(bytes(bad))
    # truncation: cut before the end header
    with pytest.raises(ValueError, match="rar5"):
        RR.parse_rar5(good5[:-10])
    with pytest.raises(ValueError, match="rar4"):
        RR.parse_rar4(good4[:-10])
    # wrong signature
    with pytest.raises(ValueError, match="signature"):
        RR.parse_rar5(b"Rar!\x1a\x07\x00" + good5[8:])
    with pytest.raises(ValueError, match="rar"):
        RR.parse_rar(b"not a rar at all")
    # vint bomb: 10 continuation bytes
    with pytest.raises(ValueError, match="vint"):
        RR._vint(b"\xff" * 11, 0)
    # declared size over the cap
    with pytest.raises(ValueError, match="guard"):
        RR.parse_rar5(RR.build_rar5([("x", b"12345")]), cap=3)


def test_rar4_unicode_name_keeps_ascii_half():
    """A 0x200-flagged name carries 8-bit name NUL unicode-blob; the
    documented subset keeps the 8-bit half."""
    blob = bytearray(RR.build_rar4([("abc.txt\x00\x01\x02", b"x")]))
    start = bytes(blob).find(b"abc.txt") - 32
    flags = struct.unpack("<H", blob[start + 3 : start + 5])[0]
    blob[start + 3 : start + 5] = struct.pack("<H", flags | 0x0200)
    hsize = struct.unpack("<H", blob[start + 5 : start + 7])[0]
    crc = binascii.crc32(bytes(blob[start + 2 : start + hsize])) & 0xFFFF
    blob[start : start + 2] = struct.pack("<H", crc)
    ms = RR.parse_rar4(bytes(blob))
    assert ms[0]["path"] == "abc.txt"
