"""Font-file metadata tier (operators/rawfont.py)."""

import struct
import zlib

import pytest

from rawdata_client_provider_gcs_spark.operators import rawfont as FT
from rawdata_client_provider_gcs_spark.operators.rawavi import (
    UnsupportedCodecError,
)


def test_hand_built_sfnt_independent_layout():
    """A hand-packed sfnt with table records in a DIFFERENT order than
    the fixture writer (name first, Macintosh + Windows records, the
    Windows one must win)."""
    # name table: Mac record says 'MacName', Windows says 'WinName'
    mac = b"MacName"
    win = "WinName".encode("utf-16-be")
    recs = struct.pack(">6H", 1, 0, 0, 1, len(mac), 0)
    recs += struct.pack(">6H", 3, 1, 0x0409, 1, len(win), len(mac))
    name = struct.pack(">HHH", 0, 2, 6 + len(recs)) + recs + mac + win
    head = b"\x00" * 18 + struct.pack(">H", 1024) + b"\x00" * 34
    maxp = b"\x00\x00\x50\x00" + struct.pack(">H", 7) + b"\x00" * 26
    tables = [(b"name", name), (b"head", head), (b"maxp", maxp)]
    off = 12 + 16 * 3
    recs2 = b""
    body = b""
    for tag, blob in tables:
        recs2 += tag + struct.pack(">III", 0, off + len(body), len(blob))
        body += blob
    data = b"\x00\x01\x00\x00" + struct.pack(">HHHH", 3, 0, 0, 0) + recs2 + body
    m = FT.parse_font(data)
    face = m["faces"][0]
    assert face["family"] == "WinName"  # Windows outranks Macintosh
    assert face["units_per_em"] == 1024 and face["n_glyphs"] == 7


def test_woff_zlib_tables_and_ttc_faces():
    s = FT.build_sfnt(family="Wrapped", n_glyphs=12)
    w = FT.build_woff(s)
    face = FT.parse_font(w)["faces"][0]
    assert (face["family"], face["n_glyphs"]) == ("Wrapped", 12)
    t = FT.build_ttc([FT.build_sfnt(family="A"),
                      FT.build_sfnt(family="B", flavor=b"OTTO")])
    m = FT.parse_font(t)
    assert m["container"] == "ttc"
    assert [f["family"] for f in m["faces"]] == ["A", "B"]
    assert [f["flavor"] for f in m["faces"]] == ["ttf", "otf"]


def test_woff2_roundtrip_and_directory():
    """WOFF2 (r13): whole-stream Brotli block + directory walk —
    metadata tables extract byte-exact through the in-repo decoder."""
    sfnt = FT.build_sfnt(family="Inter", subfamily="Bold",
                         version="Version 2.1", ps_name="Inter-Bold",
                         units_per_em=2048, n_glyphs=901)
    w2 = FT.build_woff2(sfnt)
    out = FT.parse_font(w2)
    assert out["container"] == "woff2"
    f = out["faces"][0]
    assert (f["family"], f["subfamily"], f["n_glyphs"],
            f["units_per_em"]) == ("Inter", "Bold", 901, 2048)
    assert sorted(t["tag"] for t in f["tables"]) == \
        ["head", "maxp", "name"]
    assert not any(t["transformed"] for t in f["tables"])
    # the system reference Brotli reads our data block back: find the
    # stream after the directory using the header's compressed size
    import struct as _s

    total_comp = _s.unpack(">I", w2[20:24])[0]
    comp = w2[len(w2) - total_comp :]
    try:
        import pyarrow as pa

        orig = sum(
            _s.unpack(">II", sfnt[20 + 16 * i : 28 + 16 * i])[1]
            for i in range(_s.unpack(">H", sfnt[4:6])[0])
        )
        assert len(bytes(pa.Codec("brotli").decompress(comp, orig))) \
            == orig
    except ImportError:
        pass


def test_woff2_hostiles():
    # truncated Brotli block
    sfnt = FT.build_sfnt()
    w2 = bytearray(FT.build_woff2(sfnt))
    with pytest.raises(ValueError):
        FT.parse_font(bytes(w2[:-4]))
    # collections stay loud
    bad = bytearray(FT.build_woff2(sfnt))
    bad[4:8] = b"ttcf"
    with pytest.raises(ValueError, match="ttcf"):
        FT.parse_font(bytes(bad))
    # UIntBase128 with a leading zero byte
    from rawdata_client_provider_gcs_spark.operators.rawfont import (
        _uintbase128,
    )
    with pytest.raises(ValueError, match="leading zero"):
        _uintbase128(b"\x80\x01", 0)
    with pytest.raises(ValueError, match="32 bits"):
        _uintbase128(b"\xff\xff\xff\xff\xff\xff", 0)
    with pytest.raises(ValueError, match="5 bytes"):
        _uintbase128(b"\x81\x80\x80\x80\x80\x00", 0)


def test_hostiles():
    with pytest.raises(ValueError, match="no sfnt"):
        FT.parse_font(b"not a font")
    # table past end of file
    s = bytearray(FT.build_sfnt())
    struct.pack_into(">I", s, 12 + 12, 1 << 30)  # head table length
    with pytest.raises(ValueError, match="past end"):
        FT.parse_font(bytes(s))
    # corrupt WOFF zlib body
    w = bytearray(FT.build_woff(FT.build_sfnt()))
    w[-6] ^= 0xFF
    with pytest.raises(ValueError):
        FT.parse_font(bytes(w))
    # WOFF table inflating to the wrong size
    s2 = FT.build_sfnt()
    w2 = bytearray(FT.build_woff(s2))
    # find the name entry and lie about origLength
    for i in range(3):
        rec = 44 + 20 * i
        if bytes(w2[rec : rec + 4]) == b"name":
            struct.pack_into(">I", w2, rec + 12,
                             struct.unpack_from(">I", w2, rec + 12)[0] + 5)
    with pytest.raises(ValueError, match="inflates to"):
        FT.parse_font(bytes(w2))
    # TTC face-count bomb
    bomb = b"ttcf\x00\x01\x00\x00" + struct.pack(">I", 1 << 20)
    with pytest.raises(ValueError, match="faces out of range"):
        FT.parse_font(bomb + b"\x00" * 64)
    # name-table probe: 'true' prose is not a font
    assert FT.probe_font(b"true enough, prose") is None
    assert FT.probe_font(FT.build_sfnt()) == "ttf"
