"""DjVu image layers — JB2 bitonal masks and IW44 gray backgrounds
(r16 verdict ask #6).

Both codecs are fixture-dual value-exact: JB2's record stream over the
ZP coder reproduces mark placements bit-for-bit, and IW44's integer
interpolating-wavelet lifting is bijective, so full-slice streams
reproduce arbitrary gray images exactly.  Provenance tiers (which
pieces are spec structure vs synthetic subset) are documented in the
modules.
"""

from __future__ import annotations

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import (
    rawdjvu,
    rawiw44,
    rawjb2,
)


# ------------------------------------------------------------------- JB2


def test_jb2_roundtrip_marks_and_library():
    rs = np.random.RandomState(4)
    g1 = (rs.rand(9, 6) > 0.6).astype(np.uint8)
    g2 = (rs.rand(5, 4) > 0.4).astype(np.uint8)
    marks = [(g1, 2, 3), (g2, 20, 1), (0, 12, 10), (1, 0, 0)]
    page = rawjb2.decode_jb2(rawjb2.encode_jb2(30, 20, marks))
    exp = np.zeros((20, 30), np.uint8)
    for bm, x, y in [(g1, 2, 3), (g2, 20, 1), (g1, 12, 10), (g2, 0, 0)]:
        sh, sw = bm.shape
        exp[y : y + sh, x : x + sw] |= bm[: 20 - y, : 30 - x]
    assert np.array_equal(page, exp)


def test_jb2_overhanging_symbol_clips():
    blob = rawjb2.encode_jb2(10, 8, [(np.ones((6, 6), np.uint8), 7, 5)])
    page = rawjb2.decode_jb2(blob)
    assert page[:5].sum() == 0
    assert page[5:, 7:].sum() == 9  # 3x3 survives the clip


def test_jb2_direct_context_carries_structure():
    """A structured glyph (checkerboard) codes smaller than noise at
    the same size — the 10-pixel context is actually adaptive."""
    rs = np.random.RandomState(8)
    board = np.indices((24, 24)).sum(axis=0) % 2
    noise = (rs.rand(24, 24) > 0.5).astype(np.uint8)
    b_board = rawjb2.encode_jb2(24, 24, [(board.astype(np.uint8), 0, 0)])
    b_noise = rawjb2.encode_jb2(24, 24, [(noise, 0, 0)])
    assert len(b_board) < len(b_noise)


def test_jb2_subset_gates_are_loud():
    with pytest.raises(ValueError, match="start-of-data"):
        rawjb2.decode_jb2(b"\x00JB2-opaque\x01")
    with pytest.raises(ValueError, match="matched index"):
        rawjb2.encode_jb2(10, 10, [(0, 0, 0)])
    with pytest.raises(ValueError, match="size outside bounds"):
        rawjb2.encode_jb2(0, 10, [])


# ------------------------------------------------------------------ IW44


@pytest.mark.parametrize("shape", [(32, 32), (48, 80), (33, 65),
                                   (10, 200), (1, 7)])
def test_iw44_roundtrip_exact(shape):
    rs = np.random.RandomState(sum(shape))
    g = rs.randint(0, 256, shape).astype(np.uint8)
    out = rawiw44.decode_iw44(rawiw44.encode_iw44(g))
    assert np.array_equal(out, g)


def test_iw44_lifting_is_bijective_and_dc_preserving():
    rs = np.random.RandomState(3)
    img = rs.randint(-128, 128, (64, 96)).astype(np.int64)
    work = img.copy()
    rawiw44._transform(work, inverse=False)
    rawiw44._transform(work, inverse=True)
    assert np.array_equal(work, img)
    flat = np.full((32, 32), 55, np.int64)
    rawiw44._transform(flat, inverse=False)
    # predict step kills flat highs exactly; lows stay at the value
    assert int(flat[0, 0]) == 55
    coords = rawiw44._BUCKETS[4][0] + rawiw44._BUCKETS[7][0]
    assert all(flat[y, x] == 0 for y, x in coords)


def test_iw44_bucket_geometry_partitions_the_block():
    seen = set()
    for band in rawiw44._BUCKETS:
        for bucket in band:
            assert len(bucket) == 16
            seen.update(bucket)
    assert len(seen) == 32 * 32
    assert sum(len(b) for b in rawiw44._BUCKETS) == 64


def test_iw44_smooth_content_compresses():
    rs = np.random.RandomState(12)
    r = np.arange(64)[:, None]
    c = np.arange(96)[None, :]
    smooth = ((r + c) // 2).astype(np.uint8)
    noise = rs.randint(0, 256, (64, 96)).astype(np.uint8)
    assert len(rawiw44.encode_iw44(smooth)) \
        < len(rawiw44.encode_iw44(noise)) // 3


def test_iw44_subset_gates_are_loud():
    g = np.zeros((16, 16), np.uint8)
    blob = bytearray(rawiw44.encode_iw44(g))
    blob[0] = 1  # continuation serial
    with pytest.raises(ValueError, match="continuation"):
        rawiw44.decode_iw44(bytes(blob))
    blob = bytearray(rawiw44.encode_iw44(g))
    blob[2] &= 0x7F  # clear the NO-chroma flag: now a color chunk
    with pytest.raises(ValueError, match="color"):
        rawiw44.decode_iw44(bytes(blob))
    cblob = rawiw44.encode_iw44_color(g, g, g)
    with pytest.raises(ValueError, match="gray"):
        rawiw44.decode_iw44_color(rawiw44.encode_iw44(g))
    with pytest.raises(ValueError, match="color"):
        rawiw44.decode_iw44(cblob)
    with pytest.raises(ValueError, match="shorter"):
        rawiw44.decode_iw44(b"\x00\x01")


@pytest.mark.parametrize("delay", [0, 2, 5])
def test_iw44_color_roundtrip_exact(delay):
    """Three-plane color with crcbdelay: chroma starts late but codes
    fully, so the round trip stays value-exact at every delay."""
    rs = np.random.RandomState(40 + delay)
    y, cb, cr = (rs.randint(0, 256, (40, 56)).astype(np.uint8)
                 for _ in range(3))
    blob = rawiw44.encode_iw44_color(y, cb, cr, delay=delay)
    oy, ocb, ocr = rawiw44.decode_iw44_color(blob)
    assert np.array_equal(oy, y)
    assert np.array_equal(ocb, cb)
    assert np.array_equal(ocr, cr)
    assert not rawiw44.iw44_is_gray(blob)


def test_djvu_color_background_layers():
    y = np.full((32, 48), 90, np.uint8)
    cb = np.full((32, 48), 140, np.uint8)
    cr = np.full((32, 48), 120, np.uint8)
    blob = rawdjvu.build_djvu([{
        "width": 48, "height": 32, "background": (y, cb, cr),
    }])
    out = rawdjvu.extract_djvu_images(blob)
    page = out["pages"][0]
    assert page["bg_color"] and page["bg_sum"] == 90 * 32 * 48
    rgbpage = rawdjvu.render_djvu_page(blob)
    exp = rawiw44.ycbcr_to_rgb(y, cb, cr)
    assert np.array_equal(rgbpage, exp)


# ------------------------------------------------- container integration


def test_djvu_page_carries_real_layers():
    g = (np.arange(48 * 64).reshape(48, 64) % 251 // 2).astype(np.uint8)
    glyph = np.ones((6, 4), np.uint8)
    blob = rawdjvu.build_djvu([{
        "width": 64, "height": 48, "text": True,
        "mask": [(glyph, 2, 3), (0, 30, 10)],
        "background": g,
    }])
    out = rawdjvu.extract_djvu_images(blob)
    assert out["n_pages"] == 1
    page = out["pages"][0]
    assert (page["mask_w"], page["mask_h"]) == (64, 48)
    assert page["mask_ink"] == 2 * 6 * 4
    assert (page["bg_w"], page["bg_h"]) == (64, 48)
    assert page["bg_sum"] == int(g.sum())
    # the census still sees the same chunks
    census = rawdjvu.parse_djvu(blob)
    assert census["has_mask"] and census["has_bg"]


def test_djvu_multipage_image_walk():
    g = np.full((32, 32), 77, np.uint8)
    blob = rawdjvu.build_djvu([
        {"width": 32, "height": 32,
         "mask": [(np.ones((3, 3), np.uint8), 1, 1)]},
        {"width": 32, "height": 32, "background": g},
    ])
    out = rawdjvu.extract_djvu_images(blob)
    assert out["n_pages"] == 2
    assert out["pages"][0]["mask_ink"] == 9
    assert out["pages"][0]["bg_w"] == 0
    assert out["pages"][1]["bg_sum"] == 77 * 32 * 32
    assert out["pages"][1]["mask_w"] == 0


def test_djvu_opaque_standins_raise_per_row():
    blob = rawdjvu.build_djvu([{"width": 64, "height": 48}])
    with pytest.raises(ValueError):
        rawdjvu.extract_djvu_images(blob)


# ------------------------------------------------- FGbz + composite (r16)


def test_fgbz_roundtrip_and_gates():
    f = rawdjvu.build_fgbz([(1, 2, 3), (250, 99, 0)], [1, 0, 1])
    out = rawdjvu.parse_fgbz(f)
    assert out["palette"] == [(1, 2, 3), (250, 99, 0)]
    assert out["indices"] == [1, 0, 1]
    # palette-only chunk (no index stream)
    out = rawdjvu.parse_fgbz(rawdjvu.build_fgbz([(9, 9, 9)]))
    assert out["indices"] is None
    with pytest.raises(ValueError, match="palette index"):
        rawdjvu.build_fgbz([(1, 1, 1)], [2])
    with pytest.raises(ValueError, match="shorter"):
        rawdjvu.parse_fgbz(b"\x00")


def test_composite_render_colors_blits_over_background():
    g1 = np.ones((4, 5), np.uint8)
    g2 = np.ones((3, 2), np.uint8)
    bg = np.full((32, 48), 200, np.uint8)
    blob = rawdjvu.build_djvu([{
        "width": 48, "height": 32,
        "mask": [(g1, 1, 1), (g2, 20, 10), (0, 30, 20)],
        "background": bg,
        "fg_palette": [(250, 10, 20), (5, 99, 200)],
        "fg_indices": [0, 1, 1],
    }])
    page = rawdjvu.render_djvu_page(blob)
    assert page.shape == (32, 48, 3)
    assert tuple(page[2, 2]) == (250, 10, 20)
    assert tuple(page[11, 21]) == (5, 99, 200)
    # the matched-copy blit (g1 at 30,20) takes the THIRD index
    assert tuple(page[22, 32]) == (5, 99, 200)
    assert tuple(page[0, 0]) == (200, 200, 200)
    covered = 20 + 6 + 20
    exp = 200 * 3 * (32 * 48 - covered) \
        + (250 + 10 + 20) * 20 + (5 + 99 + 200) * (6 + 20)
    assert int(page.sum(dtype="int64")) == exp


def test_composite_render_defaults():
    """No FGbz: ink paints black; no BG44: page starts white."""
    blob = rawdjvu.build_djvu([{
        "width": 16, "height": 16,
        "mask": [(np.ones((3, 2), np.uint8), 0, 0)],
    }])
    page = rawdjvu.render_djvu_page(blob)
    assert tuple(page[0, 0]) == (0, 0, 0)
    assert tuple(page[15, 15]) == (255, 255, 255)


def test_render_fgbz_blit_count_mismatch_is_loud():
    blob = rawdjvu.build_djvu([{
        "width": 16, "height": 16,
        "mask": [(np.ones((2, 2), np.uint8), 0, 0)],
        "fg_palette": [(1, 1, 1)],
        "fg_indices": [0, 0],   # two indices, one blit
    }])
    with pytest.raises(ValueError, match="blit count"):
        rawdjvu.render_djvu_page(blob)


def test_jb2_blit_order_is_record_order():
    g1 = np.ones((2, 3), np.uint8)
    g2 = np.ones((1, 1), np.uint8)
    blob = rawjb2.encode_jb2(20, 20, [(g1, 0, 0), (g2, 5, 5), (0, 9, 9)])
    blits = rawjb2.decode_jb2_blits(blob)
    assert [(b[1], b[2]) for b in blits] == [(0, 0), (5, 5), (9, 9)]
    assert blits[2][0].shape == (2, 3)  # matched copy resolves to g1


# ------------------------------------------------ JB2 refinement (r16)


def test_jb2_refinement_roundtrip_and_library_growth():
    rs = np.random.RandomState(5)
    base = (rs.rand(8, 6) > 0.5).astype(np.uint8)
    refined = base.copy()
    refined[0, :] ^= 1
    bigger = np.ones((10, 8), np.uint8)  # refinement with size change
    marks = [(base, 0, 0), ("refine", 0, refined, 10, 0),
             ("refine", 0, bigger, 20, 5), (1, 30, 10)]
    blits = rawjb2.decode_jb2_blits(rawjb2.encode_jb2(40, 20, marks))
    assert np.array_equal(blits[0][0], base)
    assert np.array_equal(blits[1][0], refined)
    assert np.array_equal(blits[2][0], bigger)
    # the matched copy indexes the REFINED entry (library position 1)
    assert np.array_equal(blits[3][0], refined)


def test_jb2_refinement_exploits_the_reference():
    """A near-identical refinement codes smaller through the
    reference-keyed context than as a fresh direct-coded mark."""
    rs = np.random.RandomState(5)
    base = (rs.rand(24, 24) > 0.5).astype(np.uint8)
    refined = base.copy()
    refined[3, 7] ^= 1
    a = rawjb2.encode_jb2(60, 30, [(base, 0, 0),
                                   ("refine", 0, refined, 30, 0)])
    b = rawjb2.encode_jb2(60, 30, [(base, 0, 0), (refined, 30, 0)])
    assert len(a) < len(b)


def test_jb2_refinement_gates():
    with pytest.raises(ValueError, match="refined index"):
        rawjb2.encode_jb2(10, 10, [("refine", 0,
                                    np.ones((2, 2), np.uint8), 0, 0)])


def test_hostile_cpu_budgets_are_loud():
    """Crafted streams demanding huge decode work raise instead of
    burning minutes of coder calls."""
    import struct

    # IW44 header claiming a big image x many slices
    hdr = struct.pack(">BBBBHHB", 0, 60, 0x81, 2, 1024, 1024, 0)
    with pytest.raises(ValueError, match="bomb|bounds"):
        rawiw44.decode_iw44(hdr + b"\x00" * 64)
    # JB2 symbol budget: the encoder itself refuses giant symbols
    with pytest.raises(ValueError, match="too large"):
        rawjb2.encode_jb2(
            1000, 1000,
            [(np.ones((1100, 1000), np.uint8), 0, 0)])


def test_fg44_pixel_map_foreground():
    """FG44 (the pixel-map alternative to FGbz): ink takes the
    foreground layer's per-pixel colors; the palette, when present,
    wins (encoder preference order)."""
    fg = (np.full((16, 24), 30, np.uint8),
          np.full((16, 24), 200, np.uint8),
          np.full((16, 24), 80, np.uint8))
    bg = np.full((16, 24), 220, np.uint8)
    blob = rawdjvu.build_djvu([{
        "width": 24, "height": 16,
        "mask": [(np.ones((4, 4), np.uint8), 2, 2)],
        "background": bg, "foreground": fg,
    }])
    page = rawdjvu.render_djvu_page(blob)
    exp = rawiw44.ycbcr_to_rgb(*[p[:1, :1] for p in fg])[0, 0]
    assert tuple(page[3, 3]) == tuple(exp)
    assert tuple(page[0, 0]) == (220, 220, 220)
    out = rawdjvu.extract_djvu_images(blob)
    assert out["pages"][0]["fg_sum"] == 30 * 16 * 24
    # palette beats the pixel map when both are present
    blob2 = rawdjvu.build_djvu([{
        "width": 24, "height": 16,
        "mask": [(np.ones((4, 4), np.uint8), 2, 2)],
        "foreground": np.full((16, 24), 7, np.uint8),
        "fg_palette": [(9, 8, 7)], "fg_indices": [0],
    }])
    page2 = rawdjvu.render_djvu_page(blob2)
    assert tuple(page2[3, 3]) == (9, 8, 7)


# ----------------------------------------------- hypothesis properties

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_prop_numcoder_roundtrip(seed):
    """The adaptive number coder round-trips arbitrary (low, high,
    value) sequences, including reused distributions and degenerate
    one-value ranges."""
    from rawdata_client_provider_gcs_spark.sources.bzz import (
        ZPDecoder,
        ZPEncoder,
    )

    rng = np.random.RandomState(seed)
    triples = []
    for _ in range(rng.randint(1, 30)):
        low = int(rng.randint(-1000, 1000))
        high = low + int(rng.randint(0, 5000))
        triples.append((low, high, int(rng.randint(low, high + 1))))
    enc = ZPEncoder()
    ncs = [rawjb2._NumCoder() for _ in range(3)]
    for i, (lo, hi, v) in enumerate(triples):
        ncs[i % 3].encode(enc, v, lo, hi)
    blob = enc.flush()
    dec = ZPDecoder(blob)
    ncs2 = [rawjb2._NumCoder() for _ in range(3)]
    for i, (lo, hi, v) in enumerate(triples):
        assert ncs2[i % 3].decode(dec, lo, hi) == v


@settings(max_examples=100, deadline=None)
@given(n=st.integers(1, 70), seed=st.integers(0, 2**32 - 1))
def test_prop_iw44_lift_is_bijective(n, seed):
    rng = np.random.RandomState(seed)
    v = rng.randint(-4000, 4000, n).astype(np.int64)
    w = v.copy()
    rawiw44._lift1d(w, inverse=False)
    rawiw44._lift1d(w, inverse=True)
    assert np.array_equal(w, v)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_prop_jb2_random_marks_roundtrip(seed):
    rng = np.random.RandomState(seed)
    w, h = int(rng.randint(8, 48)), int(rng.randint(8, 32))
    marks = []
    n_lib = 0
    for _ in range(rng.randint(1, 6)):
        kind = rng.randint(0, 3)
        x, y = int(rng.randint(0, w)), int(rng.randint(0, h))
        if kind == 0 or n_lib == 0:
            bm = (rng.rand(rng.randint(1, 9), rng.randint(1, 9))
                  > 0.5).astype(np.uint8)
            marks.append((bm, x, y))
            n_lib += 1
        elif kind == 1:
            marks.append((int(rng.randint(0, n_lib)), x, y))
        else:
            bm = (rng.rand(rng.randint(1, 9), rng.randint(1, 9))
                  > 0.5).astype(np.uint8)
            marks.append(("refine", int(rng.randint(0, n_lib)),
                          bm, x, y))
            n_lib += 1
    blob = rawjb2.encode_jb2(w, h, marks)
    ww, hh, blits = rawjb2._decode_stream(blob)
    assert (ww, hh) == (w, h)
    assert len(blits) == len(marks)
