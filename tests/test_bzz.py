"""BZZ (ZP-coder + BWT) and the DjVu hidden-text layer — r15.

The ZP decoder is the conformance surface; the encoder is its exact
mathematical dual, so round-trips pin the coder arithmetic, the MTF
rotation, the BWT inverse, and the block framing decoder-independently
(byte expectations are the plaintext, not coder output).  The state
TABLE's real-world conformance tiers are documented in the module
docstring; these tests exercise every tier's machinery.
"""

from __future__ import annotations

import random

import pytest

from rawdata_client_provider_gcs_spark.operators import rawdjvu as D
from rawdata_client_provider_gcs_spark.sources import bzz as B


# ---------------------------------------------------------------------------
# ZP coder
# ---------------------------------------------------------------------------


def test_ztable_structure():
    """251 states; transitions in range; the steady-state ramp keeps
    its doubled-pair lattice (pairs share p/m; up advances 2, dn
    retreats 2); state LSB tracks the MPS polarity along the ramp."""
    t = B._ZTABLE
    assert len(t) == 251
    for i, (p, m, up, dn) in enumerate(t):
        assert 0 <= up <= 250 and 0 <= dn <= 250, i
        assert 1 <= p <= 0x8000, i
    for k in range(3, 81, 2):
        assert t[k][:2] == t[k + 1][:2], k
        assert t[k][2] == k + 2 and t[k + 1][2] == k + 3, k
        assert t[k][3] == k - 2 and t[k + 1][3] == k - 1, k
    # ramp probabilities decrease monotonically toward certainty
    ps = [t[k][0] for k in range(3, 82, 2)]
    assert ps == sorted(ps, reverse=True)


def test_zp_raw_roundtrip_and_handcheck():
    """Pass-through decisions are table-independent: a decoder fed
    all-0xFF input (code=0xFFFF) must produce MPS (bit 0) first, and a
    single LPS must flip the leading stream bit — hand-derivable from
    the spec arithmetic (z = 0x8000 + a/2, MPS iff code >= z)."""
    d = B.ZPDecoder(b"\xff\xff\xff\xff\xff\xff")
    assert [d.decode_raw() for _ in range(8)] == [0] * 8
    e = B.ZPEncoder()
    e.encode_raw(1)
    blob = e.flush()
    assert blob[0] < 0x80  # leading raw bit 0 <=> code < 0x8000 <=> LPS
    assert B.ZPDecoder(blob).decode_raw() == 1
    rnd = random.Random(11)
    for _ in range(20):
        bits = [rnd.randint(0, 1) for _ in range(rnd.randint(1, 400))]
        enc = B.ZPEncoder()
        for b in bits:
            enc.encode_raw(b)
        dec = B.ZPDecoder(enc.flush())
        assert [dec.decode_raw() for _ in bits] == bits


def test_zp_contexted_roundtrip_adaptation_sync():
    rnd = random.Random(23)
    for _ in range(25):
        nslots = rnd.randint(1, 6)
        seq = [(rnd.randint(0, 1), rnd.randrange(nslots))
               for _ in range(rnd.randint(1, 500))]
        e = B.ZPEncoder()
        ectx = [0] * nslots
        for b, i in seq:
            e.encode(b, ectx, i)
        d = B.ZPDecoder(e.flush())
        dctx = [0] * nslots
        assert [d.decode(dctx, i) for _, i in seq] == [b for b, _ in seq]
        assert ectx == dctx  # adaptation walks the same table path


def test_zp_skewed_sources_compress():
    """A skewed bit source adapts deep into the table, beats 1
    bit/decision by a wide margin, and still round-trips exactly."""
    rnd = random.Random(5)
    n = 4000
    skew = [1 if rnd.random() < 0.02 else 0 for _ in range(n)]
    e = B.ZPEncoder()
    ctx = [0]
    for b in skew:
        e.encode(b, ctx, 0)
    blob = e.flush()
    assert len(blob) * 8 < n * 0.35
    d = B.ZPDecoder(blob)
    dctx = [0]
    assert [d.decode(dctx, 0) for _ in skew] == skew


def test_zp_truncated_stream_is_loud():
    e = B.ZPEncoder()
    ctx = [0]
    rnd = random.Random(3)
    for _ in range(4000):
        e.encode(rnd.randint(0, 1), ctx, 0)
    blob = e.flush()[:20]
    d = B.ZPDecoder(blob)
    dctx = [0]
    with pytest.raises(ValueError, match="exhausted"):
        for _ in range(4000):
            d.decode(dctx, 0)


# ---------------------------------------------------------------------------
# BZZ framing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("blocksize", [16, 300, 64 * 1024])
def test_bzz_roundtrip_blocksizes(blocksize):
    texts = [b"", b"a", b"ab" * 700,
             b"the quick brown fox jumps over the lazy dog. " * 120,
             bytes(range(256)) * 5]
    for t in texts:
        assert B.bzz_decode(B.bzz_encode(t, blocksize=blocksize)) == t


@pytest.mark.parametrize("fshift", [0, 1, 2])
def test_bzz_fshift_variants(fshift):
    t = b"estimation speed variants share the MTF state machine " * 40
    assert B.bzz_decode(B.bzz_encode(t, fshift=fshift)) == t


def test_bzz_compresses_text():
    t = (b"Pride and Prejudice and the scanned archive corpus. " * 400)
    blob = B.bzz_encode(t)
    assert len(blob) < len(t) // 10  # BWT+MTF+ZP really compresses


def test_bzz_binary_roundtrip_fuzz():
    rnd = random.Random(99)
    for _ in range(15):
        n = rnd.randint(0, 5000)
        t = bytes(rnd.randrange(256) for _ in range(n))
        assert B.bzz_decode(B.bzz_encode(t, blocksize=1024)) == t


def test_bzz_hostile_inputs_are_valueerror():
    # empty input IS the empty stream (EOF fabrication reads the
    # zero-size terminator), matching the encoder of b""
    assert B.bzz_decode(b"") == b"" == B.bzz_decode(B.bzz_encode(b""))
    # random garbage must never escape ValueError
    rnd = random.Random(7)
    for _ in range(200):
        blob = bytes(rnd.randrange(256)
                     for _ in range(rnd.randint(1, 200)))
        try:
            B.bzz_decode(blob, max_bytes=1 << 16)
        except ValueError:
            pass


def test_bzz_bomb_guard():
    big = B.bzz_encode(b"\x00" * 300_000)
    with pytest.raises(ValueError, match="cap"):
        B.bzz_decode(big, max_bytes=100_000)


# ---------------------------------------------------------------------------
# DjVu hidden-text layer
# ---------------------------------------------------------------------------


def test_txt_zone_tree_roundtrip():
    for text in ["hello world", "line one\nline two three\n\nfour",
                 "", "unicode æøå ß tokens"]:
        got = D.parse_txt(D.build_txt(text))
        assert got["text"] == text
        assert got["words"] == [w for ln in text.split("\n")
                                for w in ln.split(" ") if w]


def test_txt_zone_geometry_is_absolute_and_nested():
    got = D.parse_txt(D.build_txt("aa bb\ncc", width=1000, height=800))
    page = got["zones"][0]
    assert page["type"] == "page"
    assert (page["xmin"], page["ymin"], page["xmax"], page["ymax"]) == \
        (0, 0, 1000, 800)
    for z in got["zones"][1:]:
        assert 0 <= z["xmin"] <= z["xmax"] <= 1000
        assert 0 <= z["ymin"] <= z["ymax"] <= 800
    lines = [z for z in got["zones"] if z["type"] == "line"]
    assert len(lines) == 2
    assert lines[0]["ymin"] > lines[1]["ymin"]  # reading order top-down


def test_extract_djvu_text_single_and_bundled():
    text = "scanned page body text\nwith two lines"
    single = D.build_djvu([{"width": 2550, "height": 3300, "text": text}])
    out = D.extract_djvu_text(single)
    assert out["text"] == text and out["n_text_pages"] == 1
    multi = D.build_djvu([
        {"width": 2550, "height": 3300, "text": "first page"},
        {"width": 2550, "height": 3300},  # no text layer
        {"width": 640, "height": 480, "text": "third page"},
    ])
    out = D.extract_djvu_text(multi)
    assert out["n_pages"] == 3 and out["n_text_pages"] == 2
    assert out["text"] == "first page\nthird page"
    assert out["words"] == ["first", "page", "third", "page"]
    assert out["pages"][1] is None


def test_extract_djvu_text_txta_uncompressed_route():
    body = D._info(100, 100) + D._chunk(b"TXTa", D.build_txt("plain txt"))
    blob = b"AT&T" + D._chunk(b"FORM", b"DJVU" + body)
    assert D.extract_djvu_text(blob)["text"] == "plain txt"


def test_djvu_text_hostiles_are_valueerror():
    # corrupt BZZ payload inside TXTz
    body = D._info(100, 100) + D._chunk(b"TXTz", b"\x12\x34\x56\x78")
    blob = b"AT&T" + D._chunk(b"FORM", b"DJVU" + body)
    with pytest.raises(ValueError):
        D.extract_djvu_text(blob)
    # well-compressed but malformed TXT payload: zone span past text
    from rawdata_client_provider_gcs_spark.sources.bzz import bzz_encode

    raw = bytearray(D.build_txt("ab cd"))
    raw[-5] = 0xFF  # blow up a word's text length
    body = D._info(100, 100) + D._chunk(b"TXTz", bzz_encode(bytes(raw)))
    blob = b"AT&T" + D._chunk(b"FORM", b"DJVU" + body)
    with pytest.raises(ValueError):
        D.extract_djvu_text(blob)
    # bad version byte
    raw = bytearray(D.build_txt("x"))
    raw[3 + 1] = 9
    with pytest.raises(ValueError, match="version"):
        D.parse_txt(bytes(raw))


def test_djvu_meta_census_sees_real_txtz():
    blob = D.build_djvu([{"width": 64, "height": 64, "text": "t"}])
    m = D.parse_djvu(blob)
    assert m["has_text"] and "TXTz" in m["chunks"]
