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


# ---------------------------------------------------------------------------
# WOFF2 glyf/loca triplet transform (r14)
# ---------------------------------------------------------------------------

SQUARE = [[(30, 0, True), (730, 0, True), (730, 700, True),
           (30, 700, False)]]
COMPOSITE = struct.pack(">HHhh", 0x0003, 1, 10, 20)  # words, no more
GLYPHS = [
    None,
    {"contours": SQUARE, "instructions": b"\x01\x02"},
    {"composite": COMPOSITE, "bbox": (40, 20, 740, 720)},
]


def test_255uint16_hand_vectors():
    for blob, want in ((b"\xfc", 252), (b"\xfd\x01\x00", 256),
                       (b"\xfe\x07", 513), (b"\xff\x07", 260),
                       (b"\x00", 0)):
        v, pos = FT._read_255uint16(blob, 0)
        assert (v, pos) == (want, len(blob)), blob
        assert FT._write_255uint16(want) == blob or want in (256,)
    # writer picks the shortest form; 256 is the word-code boundary
    assert FT._read_255uint16(FT._write_255uint16(256), 0)[0] == 256
    for v in (0, 1, 252, 253, 505, 506, 761, 762, 65535):
        blob = FT._write_255uint16(v)
        assert FT._read_255uint16(blob, 0) == (v, len(blob)), v


def test_triplet_hand_vectors_per_spec_arithmetic():
    """Every byte-count class of the §5.2 triplet table, decoded from
    hand-computed byte patterns (encoder-independent)."""
    cases = [
        (0, b"\x05", 0, -5),          # y-only, base 0, negative
        (9, b"\xff", 0, 1279),        # y-only, base 1024, positive
        (11, b"\x07", 7, 0),          # x-only, base 0, positive
        (18, b"\x01", -1025, 0),      # x-only, base 1024, negative
        (21, b"\x00", 1, -1),         # 1-byte xy, x+ y-
        (23, b"\x00", 1, 1),          # 1-byte xy, both positive
        (83, b"\xff", 64, 64),        # top of the 1-byte xy class
        (80, b"\xff", -64, -64),      # same magnitudes, both negative
        (84, b"\x01\x02", -2, -3),    # 2-byte xy, both negative
        (119, b"\xff\xff", 768, 768),  # top of the 2-byte class
        (120, b"\x12\x34\x56", -291, -1110),  # 3-byte class
        (127, b"\x00\x10\x00\x20", 16, 32),   # 4-byte class
    ]
    for flag, blob, dx, dy in cases:
        got = FT._triplet_decode(flag, blob, 0)
        assert got == (dx, dy, len(blob)), (flag, got)
    # encoder inverts the decoder across magnitudes straddling every
    # class boundary
    for dx in (0, 1, -1, 64, 65, -256, 256, 768, 769, 4095, 4096, -30000):
        for dy in (0, 3, -64, 700, -769, 4000, 20000):
            if dx == 0 and dy == 0:
                continue
            fb, body = FT._triplet_encode(dx, dy, True)
            assert FT._triplet_decode(fb & 0x7F, body, 0) == (
                dx, dy, len(body)
            ), (dx, dy)
    fb, _ = FT._triplet_encode(5, 0, False)
    assert fb & 0x80  # off-curve sets the top flag bit


@pytest.mark.parametrize("fmt", [0, 1], ids=["loca-short", "loca-long"])
def test_glyf_transform_roundtrip_byte_exact(fmt):
    glyf, loca, transformed = FT.encode_glyf_transform(GLYPHS, fmt)
    g2, l2, stats = FT.reconstruct_glyf(transformed, len(glyf), len(loca))
    assert g2 == glyf and l2 == loca
    assert stats == {"n_glyphs": 3, "n_contours": 1, "n_points": 4,
                     "n_composites": 1, "xmin": 30, "ymin": 0,
                     "xmax": 740, "ymax": 720, "xmins": [0, 30, 40]}
    # native glyf spot checks: simple glyph header + computed bbox
    assert struct.unpack(">h4h", glyf[:10]) == (1, 30, 0, 730, 700)
    # composite record copied verbatim with its explicit bbox
    comp_off = struct.unpack(">H", loca[4:6])[0] * (2 if fmt == 0 else 1)
    if fmt == 1:
        comp_off = struct.unpack(">I", loca[8:12])[0]
    assert struct.unpack(">h4h", glyf[comp_off : comp_off + 10]) == (
        -1, 40, 20, 740, 720
    )


def test_glyf_transform_overlap_and_explicit_bbox():
    glyphs = [{"contours": SQUARE, "overlap": True,
               "bbox": (0, 0, 800, 800)}]
    g, l, t = FT.encode_glyf_transform(glyphs, 1)
    g2, l2, _ = FT.reconstruct_glyf(t, len(g), len(l))
    assert g2 == g and l2 == l
    assert struct.unpack(">4h", g2[2:10]) == (0, 0, 800, 800)
    # first flag byte carries OVERLAP_SIMPLE (0x40)
    n_instr = struct.unpack(">H", g2[12:14])[0]
    assert g2[14 + n_instr] & 0x40


def test_woff2_transformed_glyf_end_to_end():
    sfnt = FT.build_sfnt(glyphs=GLYPHS, index_format=0, n_glyphs=3)
    _, _, transformed = FT.encode_glyf_transform(GLYPHS, 0)
    m = FT.parse_font(FT.build_woff2(sfnt, transformed_glyf=transformed))
    face = m["faces"][0]
    assert face["glyf"]["n_points"] == 4
    assert face["glyf"]["xmax"] == 740 and face["glyf"]["ymax"] == 720
    tags = {c["tag"]: c for c in face["tables"]}
    assert tags["glyf"].get("reconstructed") and tags["loca"].get(
        "reconstructed"
    )
    assert not tags["glyf"]["transformed"]
    # the null-transform writer still reports no glyf stats
    assert FT.parse_font(FT.build_woff2(sfnt))["faces"][0]["glyf"] is None


def test_glyf_transform_hostiles():
    glyf, loca, t = FT.encode_glyf_transform(GLYPHS, 0)
    with pytest.raises(ValueError, match="declares"):
        FT.reconstruct_glyf(t, len(glyf) + 2, len(loca))
    with pytest.raises(ValueError, match="declares"):
        FT.reconstruct_glyf(t, len(glyf), len(loca) + 4)
    # truncated streams
    for cut in (10, 20, len(t) - 1):
        with pytest.raises(ValueError):
            FT.reconstruct_glyf(t[:cut], len(glyf), len(loca))
    # composite without explicit bbox
    bad = [{"composite": COMPOSITE, "bbox": (0, 0, 1, 1)}]
    _, _, tb = FT.encode_glyf_transform(bad, 0)
    # clear the bbox bitmap bit (first byte of bboxStream)
    hdr = 36
    sizes = struct.unpack(">7I", tb[8:36])
    bb_off = hdr + sum(sizes[:5])
    tb2 = tb[:bb_off] + b"\x00" + tb[bb_off + 1 :]
    with pytest.raises(ValueError, match="composite glyph without"):
        FT.reconstruct_glyf(tb2, 0, 0)
    # transformed loca with a nonzero stream is rejected at the
    # container level
    sfnt = FT.build_sfnt(glyphs=GLYPHS, index_format=0, n_glyphs=3)
    w2 = FT.build_woff2(sfnt, transformed_glyf=t)
    # the loca directory entry's transformLength 0 sits right before
    # the glyf entry's stream bytes; patching it to 2 must be loud
    with pytest.raises(ValueError, match="zero-length|declares"):
        # rebuild with a corrupted directory: find the loca entry
        # (tag index 11, flags byte 0x0B with tversion 0) and bump its
        # final UIntBase128 (the 0x00 transformLength) to 2 — either
        # the total-stream length cross-check or the per-entry
        # zero-length rule fires, both loud
        i = w2.index(b"\x0b", 48)
        FT.parse_font(w2[: i + 2] + b"\x02" + w2[i + 3 :])


def test_woff2_hmtx_transform():
    """§5.4 transformed hmtx: omitted lsb arrays reconstruct from the
    glyf xMins; explicit arrays pass through; reserved flags, short
    streams, trailing bytes, and hmtx-without-glyf are loud."""
    glyf, loca, tglyf = FT.encode_glyf_transform(GLYPHS, 0)
    _g, _l, stats = FT.reconstruct_glyf(tglyf, len(glyf), len(loca))
    assert stats["xmins"] == [0, 30, 40]
    advances = [500, 620]
    native, thmtx = FT.encode_hmtx_transform(advances, stats["xmins"], 3)
    assert FT.reconstruct_hmtx(thmtx, 3, 2, stats["xmins"]) == native
    # native layout: (aw, lsb) * numOfHMetrics + lsb tail
    assert native == struct.pack(">HhHhh", 500, 0, 620, 30, 40)
    # explicit-lsb variant (flags 0)
    body0 = (bytes([0]) + struct.pack(">HH", 500, 620)
             + struct.pack(">hh", 1, 2) + struct.pack(">h", 9))
    assert FT.reconstruct_hmtx(body0, 3, 2, stats["xmins"]) == \
        struct.pack(">HhHhh", 500, 1, 620, 2, 9)
    # end-to-end through the WOFF2 container
    sfnt = FT.build_sfnt(glyphs=GLYPHS, index_format=0, n_glyphs=3,
                         hmetrics=advances)
    face = FT.parse_font(
        FT.build_woff2(sfnt, transformed_glyf=tglyf,
                       transformed_hmtx=thmtx)
    )["faces"][0]
    assert face["hmtx"] == {"n_metrics": 2, "advance_max": 620}
    tags = {c["tag"]: c for c in face["tables"]}
    assert tags["hmtx"].get("reconstructed")
    # hostiles
    for bad, msg in [(b"", "empty"),
                     (bytes([4]) + b"\x00" * 8, "reserved"),
                     (bytes([3]) + b"\x00\x01", "past end"),
                     (bytes([3]) + b"\x00\x01\x00\x02\xff", "trailing")]:
        with pytest.raises(ValueError, match=msg):
            FT.reconstruct_hmtx(bad, 3, 2, stats["xmins"])
    # transformed hmtx without a transformed glyf is rejected at the
    # container level
    sfnt_plain = FT.build_sfnt(glyphs=GLYPHS, n_glyphs=3,
                               hmetrics=advances)
    with pytest.raises(ValueError, match="without a transformed glyf"):
        FT.parse_font(FT.build_woff2(sfnt_plain, transformed_hmtx=thmtx))
