"""VP8 key-frame intra decoder (rawvp8) — RFC 6386.

Pins every mechanism offline: bool-coder roundtrips + golden bytes,
transforms against an INDEPENDENT float DCT basis and hand-derived
shift identities, per-mode intra predictors on hand-computed vectors,
loop-filter edge math derived by hand from §15, encode→decode
roundtrips across modes/partitions/probability-updates, container
dispatch, and hostile-input fuzz.  The empirical probability tables
are pinned against third-party streams only by the Pillow-gated parity
test at the bottom (PIL is absent in this container; the test lights
up wherever it exists).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawvp8 as V
from rawdata_client_provider_gcs_spark.operators import rawwebp as W


def _planes(y_fill=128, w=32, h=32, u_fill=128, v_fill=128):
    return (
        np.full((h, w), y_fill, np.uint8),
        np.full((h // 2, w // 2), u_fill, np.uint8),
        np.full((h // 2, w // 2), v_fill, np.uint8),
    )


# ------------------------------------------------------------- bool coder


def test_bool_coder_roundtrip_random():
    rng = random.Random(7)
    seq = [(rng.randint(0, 1), rng.randint(1, 254)) for _ in range(20000)]
    e = V.BoolEncoder()
    for bit, p in seq:
        e.encode(bit, p)
    d = V.BoolDecoder(e.getvalue())
    assert all(d.decode(p) == bit for bit, p in seq)


def test_bool_coder_carry_chain():
    # long runs of 1s at skewed probabilities force 0xFF carry chains
    e = V.BoolEncoder()
    for _ in range(4000):
        e.encode(1, 3)
    d = V.BoolDecoder(e.getvalue())
    assert all(d.decode(3) == 1 for _ in range(4000))


def test_bool_coder_golden_bytes():
    """Regression pin: encoder+decoder drifting TOGETHER would keep
    roundtrips green while silently breaking interop."""
    e = V.BoolEncoder()
    for i in range(32):
        e.encode(i & 1, 10 + 7 * i)
    assert e.getvalue().hex() == "00d2a17eb78400"


def test_literals_trees_roundtrip():
    e = V.BoolEncoder()
    e.literal(93, 7)
    e.flagged_delta(-13, 4)
    e.flagged_delta(0, 6)
    e.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, V.B_PRED)
    e.tree(V.BMODE_TREE, V.KF_BMODE_PROBS[3][8], V.B_HU_PRED)
    e.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS, V.TM_PRED)
    d = V.BoolDecoder(e.getvalue())
    assert d.literal(7) == 93
    assert d.flagged_delta(4) == -13
    assert d.flagged_delta(6) == 0
    assert d.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS) == V.B_PRED
    assert d.tree(V.BMODE_TREE, V.KF_BMODE_PROBS[3][8]) == V.B_HU_PRED
    assert d.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS) == V.TM_PRED


# ------------------------------------------------------------- transforms


def test_idct_dc_only_is_shift():
    blk = np.zeros(16, np.int32)
    for dc, want in ((20, 3), (-20, -2), (4, 1), (0, 0), (-4, 0)):
        blk[0] = dc
        assert (V.inverse_dct4x4(blk) == want).all()


def test_iwht_dc_only_is_shift():
    blk = np.zeros(16, np.int32)
    for dc, want in ((40, 5), (8, 1), (-8, 0 if (-8 + 3) >> 3 == 0 else -1),):
        blk[0] = dc
        assert (V.inverse_wht4x4(blk) == (dc + 3) >> 3).all()


def test_idct_matches_independent_float_basis():
    """The integer IDCT must track the true scaled DCT-III basis — an
    independent reference, not a mirror: a transposed pass or a wrong
    Q16 constant blows past the tolerance immediately."""
    B = np.zeros((4, 4))
    for n in range(4):
        for k in range(4):
            B[n, k] = (1.0 if k == 0 else np.sqrt(2)) * np.cos(
                (2 * n + 1) * k * np.pi / 8
            )
    rng = np.random.default_rng(3)
    for _ in range(300):
        X = rng.integers(-512, 512, 16)
        ref = B @ X.reshape(4, 4).astype(float) @ B.T / 8.0
        assert np.abs(V.inverse_dct4x4(X) - ref).max() < 2.0


def test_iwht_inverts_sums():
    """WHT semantics without mirroring the butterfly: the 16 outputs'
    total equals in[0]*2 + rounding (DC carries the mean), and a pure
    second-coefficient input must split the outputs antisymmetrically."""
    blk = np.zeros(16, np.int32)
    blk[0] = 80
    out = V.inverse_wht4x4(blk)
    assert out.sum() == 16 * ((80 + 3) >> 3)
    blk = np.zeros(16, np.int32)
    blk[1] = 64  # horizontal frequency: columns must mirror-negate
    out = V.inverse_wht4x4(blk)
    assert (out[:, 0] == -out[:, 3] + (out[:, 0] + out[:, 3])).all()
    assert out[0, 0] > 0 > out[0, 3]


# ------------------------------------------------------------- predictors


def test_predict_16x16_dc_borders():
    plane = np.zeros((40, 50), np.uint8)
    plane[0, :] = 127
    plane[1:, 0] = 129
    # no above, no left -> 128
    assert V._predict_block_dc(plane, 1, 1, 16, False, False) == 128
    # left only: rounded average of the left column
    plane[1:17, 0] = 100
    assert V._predict_block_dc(plane, 1, 1, 16, False, True) == 100
    plane[1:17, 0] = [100] * 8 + [101] * 8  # (1608+8)>>4 = 101
    assert V._predict_block_dc(plane, 1, 1, 16, False, True) == 101
    # both: 16 above (=80) + 16 left (=120) -> (3200+16)>>5 = 100
    plane[0, 1:17] = 80
    plane[1:17, 0] = 120
    assert V._predict_block_dc(plane, 1, 1, 16, True, True) == 100


def test_predict_v_h_tm_hand_values():
    plane = np.zeros((20, 20), np.uint8)
    plane[0, 1:17] = np.arange(16) + 10
    plane[1:17, 0] = np.arange(16) + 50
    plane[0, 0] = 30
    v = V.predict_mb(plane, 1, 1, 16, V.V_PRED, True, True)
    assert (v[5] == np.arange(16) + 10).all()
    h = V.predict_mb(plane, 1, 1, 16, V.H_PRED, True, True)
    assert (h[:, 7] == np.arange(16) + 50).all()
    tm = V.predict_mb(plane, 1, 1, 16, V.TM_PRED, True, True)
    # clip(L + A - P): row 2, col 3 -> 52 + 13 - 30 = 35
    assert tm[2, 3] == 35
    assert tm[0, 0] == 50 + 10 - 30


def test_predict_b_modes_hand_values():
    A = [10, 20, 30, 40]
    AR = [50, 60, 70, 80]
    L = [100, 110, 120, 130]
    P = 90
    dc = V.predict_b(V.B_DC_PRED, A, AR, L, P)
    assert (dc == (10 + 20 + 30 + 40 + 100 + 110 + 120 + 130 + 4) >> 3).all()
    tm = V.predict_b(V.B_TM_PRED, A, AR, L, P)
    assert tm[1, 2] == min(255, max(0, 110 + 30 - 90))
    ve = V.predict_b(V.B_VE_PRED, A, AR, L, P)
    # col 0: (P + 2*A0 + A1 + 2) >> 2 = (90+20+20+2)>>2 = 33
    assert (ve[:, 0] == 33).all()
    # col 3: (A2 + 2*A3 + AR0 + 2) >> 2 = (30+80+50+2)>>2 = 40
    assert (ve[:, 3] == 40).all()
    he = V.predict_b(V.B_HE_PRED, A, AR, L, P)
    # row 3: (L2 + 3*L3 + 2) >> 2 = (120+390+2)>>2 = 128
    assert (he[3] == 128).all()
    ld = V.predict_b(V.B_LD_PRED, A, AR, L, P)
    # out[0,0] = (A0 + 2A1 + A2 + 2)>>2 = (10+40+30+2)>>2 = 20
    assert ld[0, 0] == 20
    # out[3,3] = (a6 + 3*a7 + 2)>>2 = (70+240+2)>>2 = 78
    assert ld[3, 3] == 78
    hu = V.predict_b(V.B_HU_PRED, A, AR, L, P)
    assert hu[0, 0] == (100 + 110 + 1) >> 1
    assert (hu[3] == 130).all()
    rd = V.predict_b(V.B_RD_PRED, A, AR, L, P)
    # out[3,0] = avg3(L3, L2, L1) = (130 + 240 + 110 + 2)>>2 = 120
    assert rd[3, 0] == 120
    # main diagonal = avg3(L0, P, A0) = (100+180+10+2)>>2 = 73
    assert rd[0, 0] == rd[1, 1] == rd[2, 2] == rd[3, 3] == 73


# ------------------------------------------------------------- loop filter


def test_normal_mb_edge_filter_hand_derived():
    """§15.3 on a flat 100|116 step, fl=20 (E=64, I=20, hev_t=1):
    w = clamp(-16 + 3*16) = 32; hev false; adjust 27w/18w/9w ->
    7,4,2 -> p2..q2 = 102,104,107,109,112,114 (derived by hand)."""
    n = 8
    cols = [np.full(n, 100, np.int32)] * 4 + [np.full(n, 116, np.int32)] * 4
    out = V._normal_filter_edge(cols, E=64, I=20, hev_t=1, mb_edge=True)
    got = [int(c[0]) for c in out]
    assert got == [100, 102, 104, 107, 109, 112, 114, 116]


def test_subblock_filter_hand_derived():
    """§15.2 inner filter, same step, hev false:
    a = clamp(0 + 3*16)=48 -> F1=(48+4)>>3=6, F2=(48+3)>>3=6,
    q0 -= 6, p0 += 6; a2=(6+1)>>1=3 applied to p1/q1."""
    n = 4
    cols = [np.full(n, 100, np.int32)] * 4 + [np.full(n, 116, np.int32)] * 4
    out = V._normal_filter_edge(cols, E=64, I=20, hev_t=1, mb_edge=False)
    got = [int(c[0]) for c in out]
    assert got == [100, 100, 103, 106, 110, 113, 116, 116]


def test_filter_mask_blocks_strong_edges():
    # |p0-q0|*2 = 160 > E: a real feature edge must NOT be smoothed
    n = 4
    cols = [np.full(n, 40, np.int32)] * 4 + [np.full(n, 120, np.int32)] * 4
    out = V._normal_filter_edge(cols, E=64, I=20, hev_t=1, mb_edge=True)
    assert [int(c[0]) for c in out] == [40, 40, 40, 40, 120, 120, 120, 120]


def test_loop_filter_flat_frame_is_noop():
    y, u, v = _planes(77)
    dy, du, dv = V.decode_vp8(V.encode_vp8_keyframe(y, u, v, filter_level=32))
    assert (dy == 77).all() and (du == 128).all() and (dv == 128).all()


def test_loop_filter_step_edge_golden():
    y, u, v = _planes()
    y[:, :16] = 100
    y[:, 16:] = 116
    dy, _, _ = V.decode_vp8(V.encode_vp8_keyframe(y, u, v, filter_level=20))
    # MB edge smooths to the hand-derived ramp; inner edges then
    # propagate — pin the full decoded profile as regression
    assert list(dy[0, 13:19]) == [102, 104, 107, 109, 112, 114]
    dy2, _, _ = V.decode_vp8(
        V.encode_vp8_keyframe(y, u, v, filter_level=20, filter_type=1)
    )
    # simple profile touches only p0/q0
    assert list(dy2[0, 13:19]) == [100, 100, 104, 112, 116, 116]
    assert (dy2[:, :13] == 100).all() and (dy2[:, 19:] == 116).all()


# ------------------------------------------------------------- roundtrips


def test_roundtrip_constant_values_exact():
    for val in (0, 17, 60, 128, 200, 255):
        y, u, v = _planes(val, u_fill=90, v_fill=170)
        dy, du, dv = V.decode_vp8(V.encode_vp8_keyframe(y, u, v))
        assert (dy == val).all() and (du == 90).all() and (dv == 170).all()


def test_roundtrip_per_mb_values_exact():
    y, u, v = _planes()
    vals = [[40, 90], [150, 220]]
    for r in range(2):
        for c in range(2):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = vals[r][c]
    dy, _, _ = V.decode_vp8(V.encode_vp8_keyframe(y, u, v))
    assert (dy == y).all()


def test_roundtrip_all_16x16_modes_partitions_updates():
    y, u, v = _planes()
    for r in range(2):
        for c in range(2):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = [[40, 90], [150, 220]][r][c]
    ymodes = [[V.DC_PRED, V.V_PRED], [V.H_PRED, V.TM_PRED]]
    for n_parts in (1, 2, 4, 8):
        dy, _, _ = V.decode_vp8(
            V.encode_vp8_keyframe(
                y, u, v,
                ymodes=ymodes,
                n_parts=n_parts,
                prob_updates={(1, 0, 0, 0): 77, (3, 2, 1, 4): 200,
                              (0, 1, 2, 3): 11},
            )
        )
        assert (dy == y).all(), f"n_parts={n_parts}"


def test_roundtrip_b_pred_all_submodes():
    y, u, v = _planes()
    for r in range(2):
        for c in range(2):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = [[40, 90], [150, 220]][r][c]
    ymodes = [[V.B_PRED, V.B_PRED], [V.B_PRED, V.B_PRED]]
    # constant-per-MB content survives every submode's prediction path
    for sub in range(10):
        dy, _, _ = V.decode_vp8(
            V.encode_vp8_keyframe(y, u, v, ymodes=ymodes, bmodes=[sub] * 16)
        )
        assert dy.shape == y.shape
        # B_DC on constant MBs must be exact; others are deterministic
        if sub == V.B_DC_PRED:
            assert (dy == y).all()


def test_roundtrip_nonuniform_content_is_mirror_exact():
    """Gradients are coded lossily (DC-only), but decode must equal the
    encoder's own mirrored reconstruction — the encoder returns streams
    it reconstructed with the decoder's arithmetic."""
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    frame = V.encode_vp8_keyframe(y, u, v, q_index=40)
    dy, du, dv = V.decode_vp8(frame)
    # decoding twice is byte-identical (determinism)
    dy2, du2, dv2 = V.decode_vp8(frame)
    assert (dy == dy2).all() and (du == du2).all() and (dv == dv2).all()
    # and the frame is small but content-bearing
    assert 100 < len(frame) < 48 * 48 * 3


def test_quantizer_index_range():
    for qi in (0, 17, 63, 127):
        y, u, v = _planes(60)
        dy, _, _ = V.decode_vp8(V.encode_vp8_keyframe(y, u, v, q_index=qi))
        # constant-gray via DC-only: reconstruction error bounded by
        # half the Y2 DC step mapped through the >>3 chains
        step = max(1, (V.DC_QLOOKUP[qi] * 2) // 8)
        assert abs(int(dy[0, 0]) - 60) <= step
        assert (dy == dy[0, 0]).all()


# ------------------------------------------------------------- container


def test_webp_container_lossy_gray_exact():
    y, u, v = _planes()
    for r in range(2):
        for c in range(2):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = [[40, 90], [150, 220]][r][c]
    blob = V.encode_webp_lossy(y, u, v)
    rgb = W.decode_webp(blob)
    exp = np.clip((298 * (y.astype(np.int32) - 16) + 128) >> 8, 0, 255)
    assert (rgb == exp[..., None]).all()
    frames = W.decode_webp_frames(blob)
    assert len(frames) == 1 and frames[0][1].shape == (32, 32, 3)


def test_webp_lossy_chroma_conversion():
    y, u, v = _planes(128, u_fill=64, v_fill=192)
    rgb = W.decode_webp(V.encode_webp_lossy(y, u, v))
    c, d, e = 128 - 16, 64 - 128, 192 - 128
    exp_r = min(255, max(0, (298 * c + 409 * e + 128) >> 8))
    exp_g = min(255, max(0, (298 * c - 100 * d - 208 * e + 128) >> 8))
    exp_b = min(255, max(0, (298 * c + 516 * d + 128) >> 8))
    assert (rgb[..., 0] == exp_r).all()
    assert (rgb[..., 1] == exp_g).all()
    assert (rgb[..., 2] == exp_b).all()


def test_inter_frame_raises_unsupported():
    y, u, v = _planes()
    frame = bytearray(V.encode_vp8_keyframe(y, u, v))
    frame[0] |= 1  # frame_type = inter
    with pytest.raises(V.UnsupportedCodecError):
        V.decode_vp8(bytes(frame))


def test_hostile_fuzz_lands_on_value_error():
    rng = random.Random(42)
    y, u, v = _planes(99)
    good = V.encode_vp8_keyframe(y, u, v, filter_level=12)
    for _ in range(200):
        blob = bytearray(good)
        k = rng.randrange(4)
        if k == 0:
            for _ in range(rng.randrange(1, 6)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        elif k == 1:
            blob = blob[: rng.randrange(len(blob))]
        elif k == 2:
            blob = bytearray(rng.randbytes(rng.randrange(0, 200)))
        else:
            blob[6:10] = rng.randbytes(4)
        try:
            V.decode_vp8(bytes(blob))
        except (ValueError, NotImplementedError):
            pass  # includes UnsupportedCodecError


def test_dimension_bomb_guard():
    y, u, v = _planes()
    frame = bytearray(V.encode_vp8_keyframe(y, u, v))
    frame[6:8] = (8000).to_bytes(2, "little")
    frame[8:10] = (8000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="bomb|pixel cap"):
        V.decode_vp8(bytes(frame))


# ----------------------------------------------------- third-party parity


def test_pillow_parity_lossy_webp():
    """Real-interop gate for the empirical probability tables: decode a
    libwebp-ENCODED stream (via Pillow) and compare against Pillow's own
    decode.  Tolerance covers the documented chroma-upsampler and
    YUV-matrix deltas; a probability-table transcription slip produces
    garbage, not a few-LSB offset.  Skips where PIL is absent."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(5)
    # smooth content (flat-ish chroma) keeps the upsampler delta small
    base = np.linspace(40, 200, 64, dtype=np.uint8)
    img = np.stack([np.tile(base, (64, 1))] * 3, axis=-1)
    img[20:40, 20:40] += 30
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="WEBP", lossless=False, quality=80)
    payload = buf.getvalue()
    theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGB"), np.int32)
    ours = W.decode_webp(payload).astype(np.int32)
    assert ours.shape == theirs.shape
    diff = np.abs(ours - theirs)
    assert diff.mean() < 2.0 and diff.max() <= 16, (
        f"mean={diff.mean():.2f} max={diff.max()}"
    )


def test_implied_b_mode_mapping():
    """RFC 6386 §11.3: a whole-block-predicted neighbor presents the
    B-mode implied by its 16×16 mode to a B_PRED MB's sub-mode context
    (DC→B_DC, V→B_VE, H→B_HE, TM→B_TM) — using B_DC for everything
    desynchronizes the entropy decode of real third-party files."""
    assert V.IMPLIED_B_MODE == {
        V.DC_PRED: V.B_DC_PRED,
        V.V_PRED: V.B_VE_PRED,
        V.H_PRED: V.B_HE_PRED,
        V.TM_PRED: V.B_TM_PRED,
    }
    # roundtrip with B_PRED MBs bordered by every 16x16 mode
    y = np.zeros((48, 48), np.uint8)
    vals = [[40, 90, 200], [150, 220, 60], [10, 120, 240]]
    for r in range(3):
        for c in range(3):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = vals[r][c]
    u = np.full((24, 24), 128, np.uint8)
    ymodes = [
        [V.V_PRED, V.B_PRED, V.H_PRED],
        [V.B_PRED, V.TM_PRED, V.B_PRED],
        [V.DC_PRED, V.B_PRED, V.V_PRED],
    ]
    dy, _, _ = V.decode_vp8(V.encode_vp8_keyframe(y, u, u.copy(), ymodes=ymodes))
    assert (dy == y).all()


# ------------------------------------------------------------- ALPH alpha


def test_alph_roundtrip_all_compressions_and_filters():
    rng = np.random.default_rng(4)
    alpha = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    for comp in (0, 1):
        for filt in range(4):
            body = W.encode_alph(alpha, compression=comp, filter_method=filt)
            assert (W.decode_alph(body, 32, 32) == alpha).all(), (comp, filt)


def test_alph_filters_hand_derived():
    """Filter semantics pinned directly: residuals for a known plane.
    Plane [[10, 12], [13, 17]]; horizontal residuals are (0,0)=10,
    row0: left (12-10=2), col0: above (13-10=3), rest: left (17-13=4);
    gradient (1,1): clip(13+12-10)=15 -> 17-15=2."""
    plane = np.array([[10, 12], [13, 17]], np.uint8)
    assert W._alpha_filter(plane, 1).tolist() == [[10, 2], [3, 4]]
    assert W._alpha_filter(plane, 2).tolist() == [[10, 2], [3, 5]]
    assert W._alpha_filter(plane, 3).tolist() == [[10, 2], [3, 2]]
    for m in (1, 2, 3):
        assert (W._alpha_unfilter(W._alpha_filter(plane, m), m) == plane).all()


def test_webp_lossy_with_alpha_container():
    rng = np.random.default_rng(9)
    y = np.full((32, 32), 100, np.uint8)
    u = np.full((16, 16), 128, np.uint8)
    alpha = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    for comp, filt in ((0, 0), (1, 1), (1, 3)):
        blob = V.encode_webp_lossy(
            y, u, u.copy(), alpha=alpha,
            alpha_compression=comp, alpha_filter=filt,
        )
        rgba = W.decode_webp_rgba(blob)
        assert (rgba[:, :, 3] == alpha).all()
        assert (rgba[:, :, 0] == (298 * (100 - 16) + 128) >> 8).all()
    # VP8X must not read as animated
    assert not W.is_animated_webp(blob)


def test_animated_webp_with_lossy_frames():
    """ANMF sub-frames carrying VP8 (lossy) bodies decode through the
    GIF-parity frames API since round 9 (hand-built VP8X/ANIM/ANMF)."""
    chunks = bytearray()
    vp8x = bytearray(10)
    vp8x[0] = 0x02  # animation flag
    vp8x[4:7] = (31).to_bytes(3, "little")
    vp8x[7:10] = (31).to_bytes(3, "little")
    chunks += b"VP8X" + (10).to_bytes(4, "little") + vp8x
    anim = bytes([255, 255, 255, 255]) + (0).to_bytes(2, "little")
    chunks += b"ANIM" + len(anim).to_bytes(4, "little") + anim
    for dur, fill in ((100, 60), (150, 200)):
        y, u, v = _planes(fill, w=32, h=32)
        sub = V.encode_webp_lossy(y, u, v)[12:]  # chunks after RIFF hdr
        body = (
            (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
            + (31).to_bytes(3, "little") + (31).to_bytes(3, "little")
            + dur.to_bytes(3, "little") + bytes([0x02])  # blend none
            + sub
        )
        chunks += b"ANMF" + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            chunks += b"\x00"
    blob = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WEBP" + bytes(chunks)
    out = W.decode_webp_frames(blob)
    assert [d for d, _ in out] == [100, 150]
    g1 = (298 * (60 - 16) + 128) >> 8
    g2 = (298 * (200 - 16) + 128) >> 8
    assert (out[0][1][:, :, 0] == g1).all()
    assert (out[1][1][:, :, 0] == g2).all()


def test_segmentation_per_segment_quantizers_exact():
    """§9.3 end-to-end: segment map decoded via the segment tree, each
    segment dequantizing with its own q_index.  qi ∈ {0,4,13} give
    Y2-DC steps {8,16,32}, all dividing 32(2d-1), so constant-per-MB
    content stays EXACT through three different quantizers."""
    y = np.zeros((32, 48), np.uint8)
    vals = [[40, 90, 200], [150, 220, 60]]
    for r in range(2):
        for c in range(3):
            y[16 * r : 16 * r + 16, 16 * c : 16 * c + 16] = vals[r][c]
    u = np.full((16, 24), 128, np.uint8)
    segmap = [[0, 1, 2], [2, 0, 1]]
    dy, du, dv = V.decode_vp8(
        V.encode_vp8_keyframe(
            y, u, u.copy(), segment_map=segmap, segment_quants=[0, 4, 13, 0]
        )
    )
    assert (dy == y).all() and (du == 128).all()
    # delta mode: base qi 4, per-segment deltas land on the same values
    dy2, _, _ = V.decode_vp8(
        V.encode_vp8_keyframe(
            y, u, u.copy(), q_index=4, segment_map=segmap,
            segment_quants=[-4, 0, 9, 0], segment_abs=False,
        )
    )
    assert (dy2 == y).all()


def test_lf_delta_header_roundtrip():
    y, u, v = _planes(77)
    dy, _, _ = V.decode_vp8(
        V.encode_vp8_keyframe(
            y, u, v, filter_level=10,
            lf_deltas=([5, 0, 0, 0], [3, 0, 0, 0]),
        )
    )
    assert (dy == 77).all()  # flat frame: adjusted levels still no-op
