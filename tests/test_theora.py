"""Theora intra-frame decoder (operators/theoradec.py): setup-header
grammar, quant matrices, token semantics, DC prediction, exact iDCT,
flat-frame end-to-end, hostile shapes."""

from __future__ import annotations

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import theoradec as T


def _flat_expected(dc: int, qmat0: int) -> int:
    return max(0, min(255, 128 + T.idct_flat_dc(dc * qmat0)))


def test_setup_header_roundtrip():
    setup = T.parse_setup(T.build_setup_packet(dcscale=16, acscale=16,
                                               lflim=4))
    assert setup["lflims"] == [4] * 64
    assert setup["acscale"] == [16] * 64
    assert setup["dcscale"] == [16] * 64
    assert len(setup["bms"]) == 1 and setup["bms"][0] == [100] * 64
    assert len(setup["hts"]) == 80
    # perfect 32-leaf tree: codeword == token
    r = T._Br(bytes([0b10101000]))  # 10101 = 21 MSB-first
    assert T._tree_decode(r, setup["hts"][0]) == 21


def test_computed_qmat_interpolation_and_clamps():
    # two base matrices across one 0..63 range: linear interpolation
    setup = {
        "bms": [[40] * 64, [200] * 64],
        "qrsizes": [[[63]] * 3, [[63]] * 3],
        "qrbmis": [[[0, 1]] * 3, [[0, 1]] * 3],
        "acscale": [100] * 64,
        "dcscale": [100] * 64,
    }
    q0 = T.compute_qmat(setup, 0, 0, 0)
    q63 = T.compute_qmat(setup, 0, 0, 63)
    assert q0[1] == 40 * 4 and q63[1] == 200 * 4
    qmid = T.compute_qmat(setup, 0, 0, 31)
    # BM = (2*32*40 + 2*31*200 + 63) // 126 = 119
    assert qmid[1] == 119 * 4
    # QMIN floors: intra DC 16, AC 8
    setup["dcscale"] = [1] * 64
    setup["acscale"] = [1] * 64
    qlow = T.compute_qmat(setup, 0, 0, 0)
    assert qlow[0] == 16 and qlow[1] == 8
    # 4096 cap
    setup["dcscale"] = [30000] * 64
    qhigh = T.compute_qmat(setup, 0, 0, 0)
    assert qhigh[0] == 4096


def test_hilbert_order_and_partial_superblocks():
    # full superblock: all 16 cells once, spec traversal shape
    assert sorted(T.HILBERT) == [(x, y) for x in range(4)
                                 for y in range(4)]
    assert T.HILBERT[0] == (0, 0) and T.HILBERT[15] == (3, 0)
    full = T.coded_order(4, 4)
    assert len(full) == 16 and len(set(full)) == 16
    # partial plane (6x3 blocks → 2x1 superblocks): every block once
    part = T.coded_order(6, 3)
    assert sorted(part) == [(x, y) for x in range(6) for y in range(3)]
    # order within a superblock follows HILBERT filtered to the plane
    sb0 = [xy for xy in part if xy[0] < 4]
    assert sb0 == [(dx, dy) for dx, dy in T.HILBERT if dy < 3]


def test_token_extras_all_32():
    """Every token's extra-bit layout: encode via the fixture writer,
    decode via _token_extra (self-consistent by construction — no
    independent Theora decoder ships in this environment; flagged in
    the module docstring)."""
    # EOB runs
    for tok, run in ((0, 1), (1, 2), (2, 3)):
        assert T._token_extra(T._Br(b""), tok) == (run, -1, 0)
    r = T._Br(bytes([0b11000000]))  # 2 bits: 3 → run 7
    assert T._token_extra(r, 3) == (7, -1, 0)
    r = T._Br(bytes([0b10100000]))  # 3 bits: 5 → run 13
    assert T._token_extra(r, 4) == (13, -1, 0)
    r = T._Br(bytes([0b10010000]))  # 4 bits: 9 → run 25
    assert T._token_extra(r, 5) == (25, -1, 0)
    r = T._Br(bytes([0x01, 0x00]))  # 12 bits: 16
    assert T._token_extra(r, 6) == (16, -1, 0)
    r = T._Br(bytes([0x00, 0x00]))  # 12 bits: 0 → all-remaining
    assert T._token_extra(r, 6) == (-1, -1, 0)
    # zero runs
    r = T._Br(bytes([0b01100000]))  # 3 bits: 3 → run 4
    assert T._token_extra(r, 7) == (-1, 4, 0)
    r = T._Br(bytes([0b10100000]))  # 6 bits: 40 → run 41
    assert T._token_extra(r, 8) == (-1, 41, 0)
    # fixed values
    for tok, v in ((9, 1), (10, -1), (11, 2), (12, -2)):
        assert T._token_extra(T._Br(b""), tok) == (-1, 0, v)
    # sign-only categories 3..6
    for tok, m in ((13, 3), (14, 4), (15, 5), (16, 6)):
        assert T._token_extra(T._Br(b"\x00"), tok) == (-1, 0, m)
        assert T._token_extra(T._Br(b"\x80"), tok) == (-1, 0, -m)
    # value categories with offsets: sign bit first, then offset
    r = T._Br(bytes([0b01000000]))  # sign 0, offset 1 → 8
    assert T._token_extra(r, 17) == (-1, 0, 8)
    r = T._Br(bytes([0b11100000]))  # sign 1, offset 3 → -12
    assert T._token_extra(r, 18) == (-1, 0, -12)
    r = T._Br(bytes([0b01110000]))  # sign 0, offset 7 → 20
    assert T._token_extra(r, 19) == (-1, 0, 20)
    r = T._Br(bytes([0b10001000]))  # sign 1, offset 1 → -22
    assert T._token_extra(r, 20) == (-1, 0, -22)
    r = T._Br(bytes([0b00000100]))  # sign 0, offset 1 → 38
    assert T._token_extra(r, 21) == (-1, 0, 38)
    r = T._Br(bytes([0b00000000, 0b01000000]))  # sign 0, offset 1 → 70
    assert T._token_extra(r, 22) == (-1, 0, 70)
    # run/value combos
    for tok, run in ((23, 1), (24, 2), (25, 3), (26, 4), (27, 5)):
        assert T._token_extra(T._Br(b"\x00"), tok) == (-1, run, 1)
        assert T._token_extra(T._Br(b"\x80"), tok) == (-1, run, -1)
    r = T._Br(bytes([0b10100000]))  # sign 1, run offset 1 → run 7, -1
    assert T._token_extra(r, 28) == (-1, 7, -1)
    r = T._Br(bytes([0b00110000]))  # sign 0, run offset 3 → run 13, 1
    assert T._token_extra(r, 29) == (-1, 13, 1)
    r = T._Br(bytes([0b01000000]))  # sign 0, val offset 1 → run 1, 3
    assert T._token_extra(r, 30) == (-1, 1, 3)
    r = T._Br(bytes([0b10100000]))  # sign 1, val 2→3? no: val bit 0,
    # run bit 1 → run 3, value -2
    assert T._token_extra(r, 31) == (-1, 3, -2)
    with pytest.raises(ValueError, match="token"):
        T._token_extra(T._Br(b""), 32)


def test_value_token_encoder_inverts_decoder():
    """The fixture's value-token writer and _token_extra agree on
    every encodable magnitude."""
    for v in list(range(-580, 0)) + list(range(1, 581)):
        w = T._Bw()
        T._value_token(w, v)
        r = T._Br(w.bytes())
        tok = r.read(5)
        assert T._token_extra(r, tok) == (-1, 0, v), v


def test_dc_predictor_table():
    l, ul, u, ur = 100, 40, 60, 20
    assert T.dc_predict(0, l, ul, u, ur, 77) == 77  # last DC
    assert T.dc_predict(1, l, ul, u, ur, 0) == 100
    assert T.dc_predict(2, l, ul, u, ur, 0) == 40
    assert T.dc_predict(3, l, ul, u, ur, 0) == 100
    assert T.dc_predict(4, l, ul, u, ur, 0) == 60
    assert T.dc_predict(5, l, ul, u, ur, 0) == 80  # (L+U)/2
    assert T.dc_predict(7, l, ul, u, ur, 0) == \
        (29 * 100 - 26 * 40 + 29 * 60) // 32
    assert T.dc_predict(9, l, ul, u, ur, 0) == \
        (75 * 100 + 53 * 20) // 128
    assert T.dc_predict(10, l, ul, u, ur, 0) == 30  # (UL+UR)/2
    # every mask with equal neighbors predicts that value exactly
    # (weights sum to the divisor) — the property the flat-frame
    # oracle leans on
    for mask in range(1, 16):
        assert T.dc_predict(mask, 55, 55, 55, 55, 0) == 55, mask
    # outlier fallback: |pred - U| > 128 → U
    assert T.dc_predict(7, 500, -500, 10, 0, 0) == 10


def test_idct_dc_only_matches_closed_form():
    for dc in (-2048, -577, -64, -1, 1, 9, 64, 577, 2040):
        flat = T.idct_flat_dc(dc)
        px = T.idct_8x8([dc] + [0] * 63)
        assert all(v == flat for row in px for v in row), dc


def test_idct_tracks_float_dct():
    """The integer iDCT approximates the real-valued inverse DCT
    within fixed-point rounding (±3) for moderate coefficients — a
    gross-error detector for the butterfly structure.  Scale: each
    1-D pass carries gain 2 over the orthonormal basis and the final
    (v+8)>>4 divides by 16, so the 2-D result is orthonormal/4 (the
    VP3 forward transform carries the matching 4x)."""
    rng = np.random.default_rng(5)
    basis = np.zeros((8, 8))
    for i in range(8):
        for k in range(8):
            c = np.sqrt(0.5) if k == 0 else 1.0
            basis[i, k] = 0.5 * c * np.cos((2 * i + 1) * k * np.pi / 16)
    # 1-D: every basis vector within rounding of 2x orthonormal
    for k in range(8):
        x = [0] * 8
        x[k] = 1000
        exp = 2 * basis[:, k] * 1000
        assert np.max(np.abs(np.array(T.idct_1d(x)) - exp)) <= 3, k
    for _ in range(20):
        coeffs = rng.integers(-256, 256, size=(8, 8))
        exact = (basis @ coeffs.astype(float) @ basis.T) / 4
        got = np.array(T.idct_8x8(list(coeffs.flatten())))
        assert np.max(np.abs(got - exact)) <= 3


def test_flat_frames_value_exact_both_eob_forms():
    setup = T.parse_setup(T.build_setup_packet())
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    for sentinel in (False, True):
        pkt = T.encode_flat_frame(64, 48, (9, 5, 13), qi=40,
                                  eob_sentinel=sentinel)
        y, cb, cr = T.decode_frame(pkt, setup, 64, 48)
        for plane, dc in ((y, 9), (cb, 5), (cr, 13)):
            assert plane.min() == plane.max() == _flat_expected(dc, qm0)
    # negative DC deltas across planes (Cb below Y exercises the
    # signed token path and negative quantized-domain prediction)
    pkt = T.encode_flat_frame(32, 32, (-7, 3, -2), qi=40)
    y, cb, cr = T.decode_frame(pkt, setup, 32, 32)
    for plane, dc in ((y, -7), (cb, 3), (cr, -2)):
        assert plane.min() == plane.max() == _flat_expected(dc, qm0)


def test_ogg_carriage_and_metadata_coexist():
    frames = [(9, 5, 13), (20, -4, 7)]
    ogg = T.build_theora_ogg(64, 48, frames)
    out = T.decode_ogg_theora(ogg)
    setup = T.parse_setup(T.build_setup_packet())
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    assert (out["width"], out["height"]) == (64, 48)
    assert len(out["frames"]) == 2
    for i, dcs in enumerate(frames):
        for plane, dc in zip(out["frames"][i], dcs):
            assert plane.min() == plane.max() == _flat_expected(dc, qm0)
    # the metadata tier still reads the same bytes
    from rawdata_client_provider_gcs_spark.operators import rawogg

    m = rawogg.parse_ogg(ogg)
    assert (m["codec"], m["n_frames"]) == ("theora", 2)


def test_hostile_shapes():
    setup = T.parse_setup(T.build_setup_packet())
    good = T.encode_flat_frame(32, 32, (5, 2, 8))
    # inter frame
    w = T._Bw()
    w.write(0, 1)
    w.write(1, 1)
    with pytest.raises(ValueError, match="inter frame"):
        T.decode_frame(w.bytes() + b"\x00" * 4, setup, 32, 32)
    # header-typed packet in the frame position
    with pytest.raises(ValueError, match="not a frame"):
        T.decode_frame(b"\x80theora", setup, 32, 32)
    # truncated mid-token
    with pytest.raises(ValueError, match="past end"):
        T.decode_frame(good[:6], setup, 32, 32)
    # nonzero reserved bits
    bad = bytearray(good)
    bad[1] ^= 0b00010000  # bit 11 of the packet = reserved area
    with pytest.raises(ValueError):
        T.decode_frame(bytes(bad), setup, 32, 32)
    # setup-header hostiles: bad magic, deep tree, overrun quant range
    with pytest.raises(ValueError, match="magic"):
        T.parse_setup(b"\x81theora" + b"\x00" * 32)
    deep = b"\x82theora" + bytes([0]) * 200  # all-zero bits: infinite
    with pytest.raises(ValueError, match="deeper|past end"):
        T.parse_setup(deep)
    # frame over the pixel cap
    with pytest.raises(ValueError, match="pixel cap"):
        T.decode_frame(good, setup, 1 << 14, 1 << 13)
    # ogg stream without setup
    from rawdata_client_provider_gcs_spark.operators.rawogg import _page

    lone = _page(5, 0, 0, [b"\x80theora" + bytes(35)], 2)
    with pytest.raises(ValueError, match="lacks ident or setup"):
        T.decode_ogg_theora(lone)


def test_batch_idct_matches_scalar():
    """The vectorized iDCT is the performance path; the scalar one is
    the reference — bit-identical on random coefficient blocks."""
    rng = np.random.default_rng(11)
    blocks = rng.integers(-4096, 4096, size=(40, 64)).astype(np.int64)
    batch = T.idct_8x8_batch(blocks.reshape(-1, 8, 8))
    for i in range(len(blocks)):
        scalar = np.array(T.idct_8x8(list(blocks[i])))
        assert np.array_equal(batch[i], scalar), i


def test_long_run_codec_boundaries():
    """§7.3.2 long-run lengths across every prefix-class boundary."""
    for n in (1, 2, 3, 4, 5, 6, 9, 10, 17, 18, 33, 34, 100, 4129):
        w = T._Bw()
        T._write_long_run(w, n)
        assert T._long_run(T._Br(w.bytes())) == n, n
    with pytest.raises(ValueError, match="run"):
        T._write_long_run(T._Bw(), 4130)


def test_bit_run_vector_roundtrip_and_4129_rule():
    import random

    rng = random.Random(3)
    for trial in range(20):
        n = rng.randrange(1, 300)
        bits = []
        b = rng.randrange(2)
        while len(bits) < n:
            bits.extend([b] * rng.randrange(1, 40))
            b ^= 1
        bits = bits[:n]
        w = T._Bw()
        T._encode_bit_runs(w, bits)
        assert T._decode_bit_runs(T._Br(w.bytes()), n) == bits, trial
    # a maximal 4129-run does NOT flip: the next bit is explicit —
    # including a same-valued continuation
    bits = [1] * 5000 + [0] * 3
    w = T._Bw()
    T._encode_bit_runs(w, bits)
    assert T._decode_bit_runs(T._Br(w.bytes()), len(bits)) == bits


def _zero_run_frame(zr_token: int, run: int, tail_value: int | None):
    """16x16 intra frame: Y(0,0) carries DC=5, a pure zero-run token
    at ti=1, then optionally a value token and an EOB; the other five
    blocks end through one EOB run of 5 at ti=0."""
    w = T._Bw()
    w.write(0, 1)  # frame packet
    w.write(0, 1)  # intra
    w.write(40, 6)
    w.write(0, 1)  # one qi
    w.write(0, 3)  # reserved
    w.write(0, 4)  # HTIL (ti=0)
    w.write(0, 4)  # HTIC
    T._value_token(w, 5)           # Y(0,0) DC
    T._write_token(w, 3, 5 - 4, 2)  # EOB run 5: remaining 5 blocks
    w.write(0, 4)  # HTIL (ti=1)
    w.write(0, 4)  # HTIC
    bits = 3 if zr_token == 7 else 6
    T._write_token(w, zr_token, run - 1, bits)
    if tail_value is not None:
        T._value_token(w, tail_value)  # lands at ti = 1 + run
        T._write_token(w, 0, 0, 0)     # EOB run 1 ends Y(0,0)
    return w.bytes()


def test_pure_zero_run_advances_exactly_run():
    """Tokens 7/8: a run of R zeros advances the coefficient index by
    exactly R — the value token after a run of 3 starting at ti=1
    lands at scan position 4 (natural index ZIGZAG[4] = 9).  lflim=0
    keeps the loop filter out of the coefficient-exact comparison."""
    setup = T.parse_setup(T.build_setup_packet(lflim=0))
    y, cb, cr = T.decode_frame(_zero_run_frame(7, 3, 2), setup, 16, 16)
    qm = np.array(T.compute_qmat(setup, 0, 0, 40), dtype=np.int64)
    coeffs = np.zeros(64, dtype=np.int64)
    coeffs[0] = 5 * qm[0]
    coeffs[T.ZIGZAG[4]] = 2 * qm[T.ZIGZAG[4]]
    res = T.idct_8x8_batch(coeffs.reshape(1, 8, 8))[0]
    exp = np.clip(128 + res, 0, 255).astype(np.uint8)
    assert np.array_equal(y[:8, :8], exp)
    # the flat remainder: DC propagates through prediction
    flat = _flat_expected(5, qm[0])
    assert y[8:, 8:].min() == y[8:, 8:].max() == flat
    assert cb.min() == cb.max() == flat
    # token 8 (6-bit run) takes the same path
    y2, _, _ = T.decode_frame(_zero_run_frame(8, 3, 2), setup, 16, 16)
    assert np.array_equal(y2[:8, :8], exp)


def test_zero_run_exactly_filling_block_is_legal():
    """ti + run == 64 ends the block exactly — the legal maximal
    run is accepted, not rejected by the >63 guard."""
    setup = T.parse_setup(T.build_setup_packet())
    y, cb, cr = T.decode_frame(_zero_run_frame(8, 63, None),
                               setup, 16, 16)
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    flat = _flat_expected(5, qm0)
    for plane in (y, cb, cr):
        assert plane.min() == plane.max() == flat
    # one past the end still raises
    with pytest.raises(ValueError, match="zero run"):
        T.decode_frame(_zero_run_frame(8, 64, None), setup, 16, 16)


def test_final_4129_run_reads_no_trailing_bit():
    """The explicit next-bit read after a maximal 4129 long run only
    applies when entries remain — two vectors back to back stay in
    sync when the first ends on a maximal run."""
    w = T._Bw()
    T._encode_bit_runs(w, [1] * 4129)
    T._encode_bit_runs(w, [0] * 5)
    r = T._Br(w.bytes())
    assert T._decode_bit_runs(r, 4129) == [1] * 4129
    assert T._decode_bit_runs(r, 5) == [0] * 5


def test_two_qi_frame_decodes_identically():
    """Per-block qi selects the AC quantizer only; on a flat frame
    the output is invariant, but the run vector sits between the
    frame header and the token stream, so a desync would corrupt
    every following token."""
    setup = T.parse_setup(T.build_setup_packet())
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    for stride in (1, 3, 7, 50):
        pkt = T.encode_flat_frame(64, 48, (9, 5, 13), qi=40,
                                  second_qi=20, qi_stride=stride)
        y, cb, cr = T.decode_frame(pkt, setup, 64, 48)
        for plane, dc in ((y, 9), (cb, 5), (cr, 13)):
            assert plane.min() == plane.max() == _flat_expected(dc, qm0)
    # three-qi second pass: hand-build header with NQIS=3 where all
    # flagged blocks resolve to index 2
    w = T._Bw()
    w.write(0, 1)
    w.write(0, 1)
    w.write(40, 6)
    w.write(1, 1)
    w.write(20, 6)
    w.write(1, 1)
    w.write(10, 6)
    w.write(0, 3)
    n = 48 + 12 + 12
    T._encode_bit_runs(w, [1] * n)   # pass 1: every block flagged
    T._encode_bit_runs(w, [1] * n)   # pass 2: all resolve to qi idx 2
    w.write(0, 4)
    w.write(0, 4)
    # token stream: same flat construction as the fixture writer
    for pli, delta in ((0, 9), (1, 5 - 9), (2, 13 - 5)):
        T._value_token(w, delta)
        run = (48, 12, 12)[pli] - 1
        T._write_token(w, 6, run, 12)
    w.write(0, 4)
    w.write(0, 4)
    T._write_token(w, 2, 0, 0)
    y, cb, cr = T.decode_frame(w.bytes(), setup, 64, 48)
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    for plane, dc in ((y, 9), (cb, 5), (cr, 13)):
        assert plane.min() == plane.max() == _flat_expected(dc, qm0)


def test_inter_frames_no_mv_subset():
    """r13 inter subset: carry-forward, full-coverage NO_MV (zero and
    DC residuals), golden references, partial superblock coverage,
    both mode schemes — value-exact against the composed closed
    form."""
    setup = T.parse_setup(T.build_setup_packet())
    q0 = T.compute_qmat(setup, 0, 0, 40)[0]
    qi1 = T.compute_qmat(setup, 1, 0, 40)[0]
    kf = T.decode_frame(T.encode_flat_frame(64, 48, (9, 5, 13)),
                        setup, 64, 48)
    kf2 = T.decode_frame(T.encode_flat_frame(64, 48, (20, 11, 3)),
                         setup, 64, 48)
    # carry-forward and zero-residual NO_MV reproduce the prior frame
    for spec in ({"coverage": "none"}, {"coverage": "all"},
                 {"coverage": "partial"},
                 {"coverage": "all", "mode_scheme": 7}):
        pkt = T.encode_inter_frame(64, 48, **spec)
        out = T.decode_frame(pkt, setup, 64, 48, refs=(kf, kf2))
        for a, b in zip(out, kf):
            assert np.array_equal(a, b), spec
    # golden reference
    pkt = T.encode_inter_frame(64, 48, mode=T.MODE_GOLDEN_NO_MV)
    out = T.decode_frame(pkt, setup, 64, 48, refs=(kf, kf2))
    for a, b in zip(out, kf2):
        assert np.array_equal(a, b)
    # DC residual shifts the flat value through the INTER quantizer
    pkt = T.encode_inter_frame(64, 48, dcs=(4, 2, 6))
    out = T.decode_frame(pkt, setup, 64, 48, refs=(kf, kf2))
    for plane, rp, d in zip(out, kf, (4, 2, 6)):
        exp = min(255, int(rp[0, 0]) + T.idct_flat_dc(d * qi1))
        assert plane.min() == plane.max() == exp
    del q0


def test_inter_gop_through_ogg_and_boundaries():
    ogg = T.build_theora_ogg(64, 48, [
        (9, 5, 13),
        {"dcs": (4, 2, 6)},
        {"coverage": "none"},
        {"mode": T.MODE_GOLDEN_NO_MV, "coverage": "all"},
    ])
    out = T.decode_ogg_theora(ogg)
    setup = T.parse_setup(T.build_setup_packet())
    y0 = 128 + T.idct_flat_dc(9 * T.compute_qmat(setup, 0, 0, 40)[0])
    y1 = y0 + T.idct_flat_dc(4 * T.compute_qmat(setup, 1, 0, 40)[0])
    assert [f[0][0, 0] for f in out["frames"]] == [y0, y1, y1, y0]
    # metadata granules agree with the GOP structure
    from rawdata_client_provider_gcs_spark.operators import rawogg

    assert rawogg.parse_ogg(ogg)["n_frames"] == 4
    # loud boundaries: a vectorless MV-mode fixture, missing refs
    with pytest.raises(ValueError, match="without a vector"):
        T.encode_inter_frame(64, 48, mode=2, mode_scheme=7)
    with pytest.raises(ValueError, match="without reference"):
        T.decode_frame(T.encode_inter_frame(64, 48), setup, 64, 48)


def test_short_run_codec_boundaries():
    for n in (1, 2, 3, 4, 5, 6, 7, 10, 11, 14, 15, 30):
        w = T._Bw()
        T._write_short_run(w, n)
        assert T._short_run(T._Br(w.bytes())) == n, n
    # the bit simply alternates between short runs — no re-read after
    # a maximal 30-run (§7.3; the longest legal run is 30 because a
    # same-flag run can span at most two partial superblocks)
    import random

    rng = random.Random(4)
    for _ in range(10):
        bits = []
        b = rng.randrange(2)
        while len(bits) < 200:
            bits.extend([b] * rng.randrange(1, 31))
            b ^= 1
        bits = bits[:200]
        w = T._Bw()
        T._encode_short_bit_runs(w, bits)
        assert T._decode_short_bit_runs(T._Br(w.bytes()), 200) == bits
    # a maximal 30-run followed by the SAME bit value is illegal — the
    # fixture encoder refuses rather than silently desyncing
    with pytest.raises(ValueError, match="short run"):
        T._encode_short_bit_runs(T._Bw(), [1] * 31 + [0])
    # decode side: after a 30-run the bit toggles with no explicit read
    w = T._Bw()
    w.write(1, 1)
    T._write_short_run(w, 30)
    T._write_short_run(w, 5)
    assert (T._decode_short_bit_runs(T._Br(w.bytes()), 35)
            == [1] * 30 + [0] * 5)


# ---------------------------------------------------------------------------
# MV-coded inter frames (r14)
# ---------------------------------------------------------------------------


def test_mv_component_codecs_hand_vectors():
    """§7.5.1 component codes from hand-built bit patterns: 3-bit
    selector, magnitude extension bits, trailing sign (1=negative)."""
    def dec(bits_str):
        w = T._Bw()
        for ch in bits_str:
            w.write(int(ch), 1)
        return T._mv_comp_vlc(T._Br(w.bytes()))

    assert dec("000") == 0
    assert dec("001") == 1
    assert dec("010") == -1
    assert dec("0110") == 2
    assert dec("0111") == -2
    assert dec("1000") == 3
    assert dec("1001") == -3
    assert dec("101" + "00" + "0") == 4
    assert dec("101" + "11" + "1") == -7
    assert dec("110" + "000" + "0") == 8
    assert dec("110" + "111" + "1") == -15
    assert dec("111" + "0000" + "0") == 16
    assert dec("111" + "1111" + "1") == -31
    # fixed 6-bit form: 5 magnitude bits then sign
    w = T._Bw()
    w.write(21, 5)
    w.write(1, 1)
    assert T._mv_comp_fixed(T._Br(w.bytes())) == -21
    # encoders invert decoders across the full legal range
    for v in range(-31, 32):
        w = T._Bw()
        T._write_mv_comp_vlc(w, v)
        assert T._mv_comp_vlc(T._Br(w.bytes())) == v, v
        w = T._Bw()
        T._write_mv_comp_fixed(w, v)
        assert T._mv_comp_fixed(T._Br(w.bytes())) == v, v


def _mc_reference(ref, bx, by, mvx, mvy, pli):
    """Independent scalar restatement of §7.9.1 motion compensation
    (edge-clamped positions, two-pixel no-rounding averages, the
    sign-dependent diagonal)."""
    if pli:
        mvx = (mvx >> 1) | (mvx & 1)
        mvy = (mvy >> 1) | (mvy & 1)
    h, w = ref.shape

    def px(y, x):
        return int(ref[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])

    out = np.empty((8, 8), np.int32)
    x0, y0 = bx * 8 + (mvx >> 1), by * 8 + (mvy >> 1)
    fx, fy = mvx & 1, mvy & 1
    for r in range(8):
        for c in range(8):
            y, x = y0 + r, x0 + c
            if not fx and not fy:
                out[r, c] = px(y, x)
            elif fx and not fy:
                out[r, c] = (px(y, x) + px(y, x + 1)) >> 1
            elif fy and not fx:
                out[r, c] = (px(y, x) + px(y + 1, x)) >> 1
            elif (mvx ^ mvy) >= 0:
                out[r, c] = (px(y, x) + px(y + 1, x + 1)) >> 1
            else:
                out[r, c] = (px(y, x + 1) + px(y + 1, x)) >> 1
    return out


def test_predict_block_vs_independent_scalar():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, (48, 64), np.uint8)
    padded = np.pad(ref, T._MC_PAD, mode="edge")
    for pli in (0, 1):
        for mvx, mvy in [(0, 0), (1, 0), (0, 1), (1, 1), (-1, -1),
                         (3, -3), (-5, 7), (16, 1), (-31, 31),
                         (31, -31), (2, -2), (30, 30), (-17, -1)]:
            for bx, by in [(0, 0), (3, 2), (7, 5), (1, 4)]:
                got = T._predict_block(padded, T._MC_PAD, bx, by,
                                       mvx, mvy, pli)
                want = _mc_reference(ref, bx, by, mvx, mvy, pli)
                assert np.array_equal(got, want), (pli, mvx, mvy, bx, by)


def _expected_mv_frame(P, G, script, frame_w=64, frame_h=48):
    """Independent restatement of the whole mode/MV semantics: apply
    the script per coded MB (full coverage) and compose the expected
    Y plane from the references."""
    order = T._mb_order(frame_w, frame_h)
    last = prior = (0, 0)
    out = {0: np.empty((frame_h, frame_w), np.uint8),
           1: np.empty((frame_h // 2, frame_w // 2), np.uint8),
           2: np.empty((frame_h // 2, frame_w // 2), np.uint8)}
    for i, (_mx, _my, blocks) in enumerate(order):
        m, mv = script[i % len(script)]
        if m == T.MODE_INTER_MV_FOUR:
            prior = last
            per = list(mv)
            last = per[-1]
            cx = (sum(v[0] for v in per) + 2) >> 2 if sum(
                v[0] for v in per) > 0 else (sum(v[0] for v in per) + 1) >> 2
            cy = (sum(v[1] for v in per) + 2) >> 2 if sum(
                v[1] for v in per) > 0 else (sum(v[1] for v in per) + 1) >> 2
            mvs = per + [(cx, cy), (cx, cy)]
        else:
            if m == T.MODE_INTER_MV:
                prior = last
                last = mv
            elif m == T.MODE_GOLDEN_MV:
                pass
            elif m == T.MODE_INTER_MV_LAST:
                mv = last
            elif m == T.MODE_INTER_MV_LAST2:
                mv = prior
                prior, last = last, mv
            else:
                mv = (0, 0)
            mvs = [mv] * 6
        for b, bmv in zip(blocks, mvs):
            pli, (x, y) = b
            sl = (slice(y * 8, y * 8 + 8), slice(x * 8, x * 8 + 8))
            if m == T.MODE_INTRA:
                out[pli][sl] = 128
                continue
            ref = G[pli] if m in (T.MODE_GOLDEN_NO_MV,
                                  T.MODE_GOLDEN_MV) else P[pli]
            blk = _mc_reference(ref, x, y, bmv[0], bmv[1], pli)
            out[pli][sl] = np.clip(blk, 0, 255).astype(np.uint8)
    return out[0], out[1], out[2]


@pytest.mark.parametrize("scheme", [0, 1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("fixed", [False, True], ids=["vlc", "fixed"])
def test_mv_modes_all_schemes_value_exact(scheme, fixed):
    """Every mode of every alphabet scheme, on GRADIENT references so
    any alphabet-rank, MV-VLC, chain, or interpolation error changes
    pixels: 12 macroblocks covering all 8 modes including the
    LAST/LAST2 chain, GOLDEN_MV (which must NOT touch the chain), and
    FOUR with per-block vectors — value-exact against an independent
    scalar restatement."""
    setup = T.parse_setup(T.build_setup_packet(lflim=0))
    rng = np.random.default_rng(11)
    P = tuple(rng.integers(0, 256, s, np.uint8)
              for s in ((48, 64), (24, 32), (24, 32)))
    G = tuple(rng.integers(0, 256, s, np.uint8)
              for s in ((48, 64), (24, 32), (24, 32)))
    script = [
        (T.MODE_INTER_MV, (3, -2)),       # sets last=(3,-2)
        (T.MODE_INTER_MV_LAST, None),     # = (3,-2)
        (T.MODE_GOLDEN_MV, (-7, 9)),      # chain untouched
        (T.MODE_INTER_MV, (16, 1)),       # prior=(3,-2), last=(16,1)
        (T.MODE_INTER_MV_LAST2, None),    # = (3,-2); swap
        (T.MODE_INTER_MV_LAST, None),     # = (3,-2) after swap
        (T.MODE_INTRA, None),
        (T.MODE_INTER_NO_MV, None),
        (T.MODE_GOLDEN_NO_MV, None),
        (T.MODE_INTER_MV_FOUR,
         [(1, 1), (-1, -1), (5, 0), (0, -5)]),  # last=(0,-5)
        (T.MODE_INTER_MV_LAST, None),     # = (0,-5)
        (T.MODE_INTER_MV, (-31, 31)),
    ]
    pkt = T.encode_inter_frame(64, 48, mb_script=script,
                               mode_scheme=scheme, mv_fixed=fixed)
    got = T.decode_frame(pkt, setup, 64, 48, refs=(P, G))
    want = _expected_mv_frame(P, G, script)
    for g, e in zip(got, want):
        assert np.array_equal(g, e)


def test_mv_gop_with_residuals_and_ogg():
    """MV modes compose with DC residuals and the Ogg carriage: a
    flat GOP where an MV-shifted flat reference stays closed-form."""
    ogg = T.build_theora_ogg(64, 48, [
        (9, 5, 13),
        {"mb_script": [(T.MODE_INTER_MV, (4, -6))]},
        {"mb_script": [(T.MODE_INTER_MV_LAST, None)], "mv_fixed": True},
        {"mb_script": [(T.MODE_GOLDEN_MV, (2, 2))]},
    ])
    out = T.decode_ogg_theora(ogg)
    setup = T.parse_setup(T.build_setup_packet())
    y0 = 128 + T.idct_flat_dc(9 * T.compute_qmat(setup, 0, 0, 40)[0])
    # flat planes are MV-invariant: every frame reproduces the keyframe
    assert [f[0][0, 0] for f in out["frames"]] == [y0] * 4
    for f in out["frames"]:
        assert f[0].min() == f[0].max() == y0


def test_mv_four_with_uncoded_luma_blocks():
    """INTER_MV_FOUR over PARTIAL coverage: uncoded luma blocks take
    zero vectors WITHOUT consuming bits, still contribute zeros to the
    chroma average, and uncoded blocks carry the prior frame — checked
    against an independent restatement that derives the coded set from
    the fixture's documented 7-run alternation."""
    setup = T.parse_setup(T.build_setup_packet(lflim=0))
    rng = np.random.default_rng(5)
    P = tuple(rng.integers(0, 256, s, np.uint8)
              for s in ((48, 64), (24, 32), (24, 32)))
    G = tuple(rng.integers(0, 256, s, np.uint8)
              for s in ((48, 64), (24, 32), (24, 32)))
    # the fixture's partial coverage: blocks alternate coded/uncoded in
    # 7-long runs over plane-major Hilbert coded order
    planes = [T.plane_dims(64, 48, pli) for pli in range(3)]
    flat = [(pli, xy) for pli in range(3)
            for xy in T.coded_order(*planes[pli])]
    coded = {b: (i // 7) % 2 == 1 for i, b in enumerate(flat)}
    order = T._mb_order(64, 48)
    # per coded MB: FOUR with one vector per CODED luma block
    script = []
    per_mb_mvs = []
    k = 0
    for _mx, _my, blocks in order:
        if not any(coded[b] for b in blocks):
            continue
        mvs = []
        for b in blocks[:4]:
            if coded[b]:
                k += 1
                mvs.append(((k % 13) - 6, ((3 * k) % 9) - 4))
        script.append((T.MODE_INTER_MV_FOUR, mvs))
        per_mb_mvs.append(mvs)
    pkt = T.encode_inter_frame(64, 48, coverage="partial",
                               mb_script=script)
    got = T.decode_frame(pkt, setup, 64, 48, refs=(P, G))
    # independent expectation
    exp = [P[pli].copy() for pli in range(3)]
    mvs_of = {}
    for (_mx, _my, blocks), mvs in zip(
        [o for o in order if any(coded[b] for b in o[2])], per_mb_mvs
    ):
        it = iter(mvs)
        per = []
        for b in blocks[:4]:
            v = next(it) if coded[b] else (0, 0)
            per.append(v)
            mvs_of[b] = v
        sx, sy = sum(v[0] for v in per), sum(v[1] for v in per)
        cx = (sx + 2) >> 2 if sx > 0 else (sx + 1) >> 2
        cy = (sy + 2) >> 2 if sy > 0 else (sy + 1) >> 2
        for b in blocks[4:]:
            mvs_of[b] = (cx, cy)
    for (pli, (x, y)), mv in mvs_of.items():
        if not coded[(pli, (x, y))]:
            continue
        blk = _mc_reference(P[pli], x, y, mv[0], mv[1], pli)
        exp[pli][y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = np.clip(
            blk, 0, 255
        ).astype(np.uint8)
    for g, e in zip(got, exp):
        assert np.array_equal(g, e)


def test_loop_filter_vs_scalar_restatement():
    """The §7.10 traversal on NON-flat content (every oracle frame is
    flat, where the filter is a no-op): per coded block in raster
    order — left edge, top edge, then right/bottom edges of uncoded
    neighbors — with per-edge clamping.  The vectorized implementation
    must match a plain scalar restatement on random planes and ragged
    coded sets."""
    rng = np.random.default_rng(9)

    def scalar_filter(plane, flimit, bw, bh, coded_set):
        p = plane.astype(np.int64)

        def edge(r0, c0, dr, dc, horiz):
            # filter the 8-pixel edge starting at (r0, c0) along
            # (dr, dc); horiz=True means a vertical edge at column c0
            for k in range(8):
                r, c = r0 + dr * k, c0 + dc * k
                if horiz:
                    s = [p[r, c - 2], p[r, c - 1], p[r, c], p[r, c + 1]]
                else:
                    s = [p[r - 2, c], p[r - 1, c], p[r, c], p[r + 1, c]]
                f = (s[0] - 3 * s[1] + 3 * s[2] - s[3] + 4) >> 3
                mag = abs(f)
                b = max(0, min(mag, 2 * flimit - mag))
                b = b if f >= 0 else -b
                if horiz:
                    p[r, c - 1] = min(255, max(0, s[1] + b))
                    p[r, c] = min(255, max(0, s[2] - b))
                else:
                    p[r - 1, c] = min(255, max(0, s[1] + b))
                    p[r, c] = min(255, max(0, s[2] - b))

        for y in range(bh):
            for x in range(bw):
                if (x, y) not in coded_set:
                    continue
                if x > 0:
                    edge(y * 8, x * 8, 1, 0, True)
                if y > 0:
                    edge(y * 8, x * 8, 0, 1, False)
                if x + 1 < bw and (x + 1, y) not in coded_set:
                    edge(y * 8, (x + 1) * 8, 1, 0, True)
                if y + 1 < bh and (x, y + 1) not in coded_set:
                    edge((y + 1) * 8, x * 8, 0, 1, False)
        return p.astype(np.uint8)

    for trial in range(4):
        bw, bh = 6, 4
        plane = rng.integers(0, 256, (bh * 8, bw * 8), np.uint8)
        if trial < 2:
            coded = {(x, y) for x in range(bw) for y in range(bh)}
            coded_arg = None  # intra frame: everything coded
        else:
            coded = {(x, y) for x in range(bw) for y in range(bh)
                     if rng.random() < 0.6}
            coded_arg = {(pli, (x, y)): ((x, y) in coded)
                         for pli in range(3)
                         for x in range(bw) for y in range(bh)}
        flimit = (4, 7, 4, 11)[trial]
        got = [plane.copy(), plane.copy(), plane.copy()]
        T._loop_filter(got, flimit, [(bw, bh)] * 3, coded=coded_arg)
        want = scalar_filter(plane, flimit, bw, bh, coded)
        for pli in range(3):
            assert np.array_equal(got[pli], want), (trial, pli)


def test_block_dc_keyframe_checkerboard():
    """Per-block-DC keyframes: targets land exactly (value tokens for
    nonzero deltas, EOB runs where the §7.9.2 prediction already
    supplies the target), chroma stays flat through the EOB path."""
    setup = T.parse_setup(T.build_setup_packet(lflim=0))
    qm0 = T.compute_qmat(setup, 0, 0, 40)[0]
    cqm = T.compute_qmat(setup, 0, 1, 40)[0]
    a, b = 6, 11
    pkt = T.encode_block_dc_frame(
        32, 16, lambda xy: (a, b)[(xy[0] + xy[1]) % 2], 3, 4
    )
    y, cb, cr = T.decode_frame(pkt, setup, 32, 16)
    A = _flat_expected(a, qm0)
    B = _flat_expected(b, qm0)
    for x in range(4):
        for yy in range(2):
            v = (A, B)[(x + yy) % 2]
            blk = y[yy * 8 : yy * 8 + 8, x * 8 : x * 8 + 8]
            assert blk.min() == blk.max() == v, (x, yy)
    assert cb.min() == cb.max() == max(0, min(255, 128 + T.idct_flat_dc(3 * cqm)))
    assert cr.min() == cr.max() == max(0, min(255, 128 + T.idct_flat_dc(4 * cqm)))
    # an all-flat target map goes entirely through EOB runs (only the
    # first block of the Y plane carries a token)
    pkt = T.encode_block_dc_frame(32, 16, lambda xy: 7, 7, 7)
    y2, cb2, cr2 = T.decode_frame(pkt, setup, 32, 16)
    V = _flat_expected(7, qm0)
    assert y2.min() == y2.max() == V


def test_inter_two_qi_frame():
    """Two-qi INTER frames: the §7.4 run vector sits between the
    motion vectors and the token stream — a flat DC residual decodes
    identically for every stride (the per-block qi only selects the AC
    quantizer), but any run desync corrupts the following tokens."""
    setup = T.parse_setup(T.build_setup_packet())
    kf = T.decode_frame(T.encode_flat_frame(64, 48, (9, 5, 13)),
                        setup, 64, 48)
    qi1 = T.compute_qmat(setup, 1, 0, 40)[0]
    base = None
    for stride in (1, 3, 7, 50):
        pkt = T.encode_inter_frame(
            64, 48, dcs=(4, 2, 6),
            mb_script=[(T.MODE_INTER_MV, (2, -2)),
                       (T.MODE_INTER_MV_LAST, None)],
            second_qi=20, qi_stride=stride,
        )
        out = T.decode_frame(pkt, setup, 64, 48, refs=(kf, kf))
        exp = min(255, int(kf[0][0, 0]) + T.idct_flat_dc(4 * qi1))
        assert out[0].min() == out[0].max() == exp, stride
        if base is None:
            base = [p.copy() for p in out]
        else:
            for a, b in zip(out, base):
                assert np.array_equal(a, b), stride
    with pytest.raises(ValueError, match="full coverage"):
        T.encode_inter_frame(64, 48, coverage="partial", second_qi=20)
