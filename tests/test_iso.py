"""ISO 9660 images (sources/iso9660.py): PVD walk, Rock Ridge names,
two-direction bsdtar interop, hostile shapes."""

from __future__ import annotations

import shutil
import subprocess

import pytest

from rawdata_client_provider_gcs_spark.sources import archive as A
from rawdata_client_provider_gcs_spark.sources import iso9660 as I

BSDTAR = shutil.which("bsdtar")


def test_fixture_roundtrip_and_archive_walk():
    blob = I.build_iso([("a.txt", b"alpha"), ("b.dat", bytes(range(64)))])
    ms = I.parse_iso(blob)
    assert [(m["path"], m["payload"]) for m in ms] == [
        ("A.TXT", b"alpha"), ("B.DAT", bytes(range(64)))
    ]
    fmt, walked = A.parse_archive(blob)
    assert fmt == "iso" and len(walked) == 2
    import gzip

    fmt, _ = A.parse_archive(gzip.compress(blob))
    assert fmt == "iso.gz"


@pytest.mark.skipif(BSDTAR is None, reason="no system bsdtar")
def test_bsdtar_interop_both_directions(tmp_path):
    # direction 1: we read a real libarchive image (Rock Ridge names,
    # nested directory)
    src = tmp_path / "in"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"iso member alpha")
    (src / "sub" / "longer-file-name.dat").write_bytes(b"nested content")
    img = tmp_path / "t.iso"
    r = subprocess.run(
        [BSDTAR, "-cf", str(img), "--format", "iso9660",
         "a.txt", "sub/longer-file-name.dat"],
        cwd=src, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    ms = {m["path"]: m["payload"] for m in I.parse_iso(img.read_bytes())}
    assert ms["a.txt"] == b"iso member alpha"          # Rock Ridge name
    assert ms["sub/longer-file-name.dat"] == b"nested content"
    # direction 2: bsdtar extracts our fixture byte-exact
    mine = tmp_path / "mine.iso"
    mine.write_bytes(I.build_iso([("x.txt", b"from the fixture")]))
    out = tmp_path / "x"
    out.mkdir()
    r = subprocess.run(
        [BSDTAR, "-xf", str(mine), "-C", str(out)], capture_output=True
    )
    assert r.returncode == 0, r.stderr
    assert (out / "X.TXT").read_bytes() == b"from the fixture"


def test_hostile_shapes():
    good = I.build_iso([("a.txt", b"alpha")])
    with pytest.raises(ValueError, match="volume descriptor"):
        I.parse_iso(b"\x00" * 1000)
    # no PVD: only a terminator
    blob = bytearray(good)
    blob[16 * 2048] = 255
    with pytest.raises(ValueError, match="primary volume"):
        I.parse_iso(bytes(blob))
    # both-endian mismatch in the root record
    blob = bytearray(good)
    blob[16 * 2048 + 156 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="both-endian"):
        I.parse_iso(bytes(blob))
    # member extent past end of image
    blob = bytearray(good)
    # root dir sector: file record extent — lie it far away (both halves)
    root_at = 19 * 2048
    rec2 = root_at + blob[root_at] + blob[root_at + blob[root_at]]
    blob[rec2 + 2 : rec2 + 6] = (99999).to_bytes(4, "little")
    blob[rec2 + 6 : rec2 + 10] = (99999).to_bytes(4, "big")
    with pytest.raises(ValueError, match="past end"):
        I.parse_iso(bytes(blob))
    # member over the cap
    with pytest.raises(ValueError, match="guard"):
        I.parse_iso(I.build_iso([("big", b"x" * 5000)]), cap=100)


def test_rock_ridge_nm_continue():
    """NM entries with the CONTINUE flag concatenate."""
    su = (
        b"NM" + bytes([9, 1, 0x01]) + b"long"
        + b"NM" + bytes([10, 1, 0x00]) + b"-name"
    )
    assert I._rock_ridge_name(su) == "long-name"
    assert I._rock_ridge_name(b"PX" + bytes([36, 1]) + bytes(32)) is None
    assert I._rock_ridge_name(b"") is None
