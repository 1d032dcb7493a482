"""Vorbis I PCM synthesis (operators/vorbisdec.py).

Every expectation here is computed through an INDEPENDENT path:
the spec's own §3.2.1 worked example for codeword assignment, the
spec's printed inverse-dB endpoints, hand-worked render_line /
render_point arithmetic, explicit O(n²) cosine loops for the IMDCT
and the lapped closed forms (the decoder uses a twiddled FFT), and
the Princen-Bradley w² ≡ 1 window invariant for the lapping
geometry.  The fixture encoder writes codewords MSB-first through a
separate writer class, so decoder and fixture share no bit-order
code."""

import math

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import vorbisdec as V
from rawdata_client_provider_gcs_spark.operators.rawvorbis import _Bits


def _w64(i: int) -> float:
    return math.sin(math.pi / 2 * math.sin(math.pi * (i + 0.5) / 64) ** 2)


def _cos64(k: int, j: int) -> float:
    return math.cos(math.pi / 128 * (2 * j + 1 + 32) * (2 * k + 1))


# ---------------------------------------------------------------------------
# codeword assignment + scalar decode
# ---------------------------------------------------------------------------


def test_codeword_assignment_spec_worked_example():
    """Vorbis I §3.2.1 prints this exact assignment."""
    words = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert words == {
        0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4), 3: (0b0110, 4),
        4: (0b0111, 4), 5: (0b10, 2), 6: (0b110, 3), 7: (0b111, 3),
    }


def test_codeword_assignment_sparse_and_single():
    # unused entries (length 0) are skipped, order preserved
    words = V.assign_codewords([0, 1, 0, 1])
    assert words == {1: (0, 1), 3: (1, 1)}
    # single used entry: one 1-bit codeword
    assert V.assign_codewords([0, 3, 0]) == {1: (0, 1)}


def test_codeword_assignment_rejects_malformed_trees():
    # overpopulated: more leaves than the depths can hold
    with pytest.raises(ValueError, match="overpopulated"):
        V.assign_codewords([1, 1, 1])
    # underpopulated (incomplete) trees are a setup-time error too
    # (§3.2.1) — an unassigned prefix must not be deferred to audio
    # decode (r12 ADVICE)
    with pytest.raises(ValueError, match="underpopulated"):
        V.assign_codewords([1, 2])  # prefix 11 decodes to nothing
    with pytest.raises(ValueError, match="underpopulated"):
        V.assign_codewords([2, 2, 2])  # one depth-2 leaf left free
    # exactly-full trees still pass
    assert len(V.assign_codewords([1, 2, 2])) == 3


def test_scalar_decode_msb_first():
    book = V._Book({
        "dims": 1, "entries": 4, "lengths": [1, 2, 3, 3],
        "lookup_type": 0,
    })
    # codewords: 0, 10, 110, 111 — stream "0 10 110 111 0" MSB-first
    w = V._BitWM()
    for code, ln in ((0, 1), (0b10, 2), (0b110, 3), (0b111, 3), (0, 1)):
        w.write_msb(code, ln)
    r = V._PktBits(w.bytes())
    assert [book.scalar(r) for _ in range(5)] == [0, 1, 2, 3, 0]


def test_scalar_decode_garbage_raises():
    book = V._Book({
        "dims": 1, "entries": 2, "lengths": [1, 0], "lookup_type": 0,
    })
    r = V._PktBits(b"\xff" * 8)
    with pytest.raises(ValueError, match="match no codeword"):
        book.scalar(r)


# ---------------------------------------------------------------------------
# VQ lookup expansion
# ---------------------------------------------------------------------------


def test_vq_lookup_type1_hand_vector():
    # entries=4, dims=2, lookup1_values(4,2)=2, mult=[3, 7], delta=.5,
    # min=1: entry e -> [mult[e%2], mult[(e//2)%2]]·.5+1
    book = V._Book({
        "dims": 2, "entries": 4, "lengths": [2, 2, 2, 2],
        "lookup_type": 1, "minimum": 1.0, "delta": 0.5,
        "sequence_p": 0, "multiplicands": [3, 7],
    })
    assert book.vq.tolist() == [
        [2.5, 2.5], [4.5, 2.5], [2.5, 4.5], [4.5, 4.5],
    ]


def test_vq_lookup_type2_and_sequence_p():
    book = V._Book({
        "dims": 2, "entries": 2, "lengths": [1, 1],
        "lookup_type": 2, "minimum": 0.0, "delta": 1.0,
        "sequence_p": 1, "multiplicands": [1, 2, 3, 4],
    })
    # type 2: rows [1,2],[3,4]; sequence_p accumulates along dims
    assert book.vq.tolist() == [[1.0, 3.0], [3.0, 7.0]]


# ---------------------------------------------------------------------------
# floor 1 pieces
# ---------------------------------------------------------------------------


def test_render_point_and_line_hand_vectors():
    assert V._render_point(0, 2, 4, 7, 2) == 4  # err=10, off=2
    assert V._render_point(0, 7, 4, 2, 2) == 5  # dy<0: 7-2
    v = np.zeros(8, dtype=np.int64)
    V.render_line(0, 2, 4, 7, v)
    assert v[:4].tolist() == [2, 3, 4, 5]  # base=1,sy=2,ady=1
    v = np.zeros(8, dtype=np.int64)
    V.render_line(0, 7, 4, 2, v)
    assert v[:4].tolist() == [7, 6, 5, 4]  # trunc-toward-zero base


def test_inverse_db_table_spec_endpoints():
    """The spec's printed table: first entry 1.0649863e-07, last 1.0."""
    assert V._INVERSE_DB[255] == 1.0
    assert abs(V._INVERSE_DB[0] - 1.0649863e-07) < 1e-13
    # monotone, 0.546875 dB per step
    ratio = V._INVERSE_DB[101] / V._INVERSE_DB[100]
    assert abs(20 * math.log10(ratio) - 0.546875) < 1e-9


def test_floor1_flat_synthesis():
    cfg = {
        "type": 1, "partitions": 1, "classes": [0], "class_dims": [1],
        "class_subclasses": [0], "masterbooks": [-1],
        "subclass_books": [[-1]], "multiplier": 1, "rangebits": 2,
        "x_list": [0, 4, 2],
    }
    fl = V._Floor1(cfg)
    curve = fl.synthesize([255, 255, 0], 16)
    assert np.allclose(curve, 1.0)


def test_floor1_step2_fold_and_slope():
    # posts (0, 255) with a middle post carrying a nonzero offset:
    # pred at x=2 is 127 (render_point 0,0 -> 4,255), room = 2*127=254
    # val=3 (odd) -> 127 - 2 = 125; val=4 (even) -> 127 + 2 = 129
    cfg = {
        "type": 1, "partitions": 1, "classes": [0], "class_dims": [1],
        "class_subclasses": [0], "masterbooks": [-1],
        "subclass_books": [[-1]], "multiplier": 1, "rangebits": 2,
        "x_list": [0, 4, 2],
    }
    fl = V._Floor1(cfg)
    c_odd = fl.synthesize([0, 255, 3], 8)
    c_even = fl.synthesize([0, 255, 4], 8)
    assert c_odd[2] == V._INVERSE_DB[125]
    assert c_even[2] == V._INVERSE_DB[129]
    # the flat extension past the last post holds the last Y
    assert c_odd[5] == c_odd[4] == V._INVERSE_DB[255]


# ---------------------------------------------------------------------------
# residue formats
# ---------------------------------------------------------------------------


def _residue_books():
    # book 0: classbook dims 1, 2 entries, 1-bit codewords (identity)
    # book 1: VQ dims 2, entries 2, values rows [1,2] / [3,4]
    return [
        V._Book({"dims": 1, "entries": 2, "lengths": [1, 1],
                 "lookup_type": 0}),
        V._Book({"dims": 2, "entries": 2, "lengths": [1, 1],
                 "lookup_type": 2, "minimum": 0.0, "delta": 1.0,
                 "sequence_p": 0, "multiplicands": [1, 2, 3, 4]}),
    ]


def test_residue_format1_sequential():
    books = _residue_books()
    cfg = {"type": 1, "begin": 0, "end": 4, "partition_size": 4,
           "classifications": 2, "classbook": 0,
           "cascades": [0, 1], "books": [[-1] * 8, [1] + [-1] * 7]}
    # one partition, class 1: two dim-2 vectors fill [0,4): entries 1,0
    w = V._BitWM()
    w.write_msb(1, 1)  # classbook word -> class 1
    w.write_msb(1, 1)  # entry 1 -> [3,4]
    w.write_msb(0, 1)  # entry 0 -> [1,2]
    out = V._decode_residue(V._PktBits(w.bytes()), cfg, books, 1, 4,
                            [False])
    assert out.tolist() == [[3.0, 4.0, 1.0, 2.0]]


def test_residue_format0_interleaved():
    books = _residue_books()
    cfg = {"type": 0, "begin": 0, "end": 4, "partition_size": 4,
           "classifications": 2, "classbook": 0,
           "cascades": [0, 1], "books": [[-1] * 8, [1] + [-1] * 7]}
    # format 0: step=2; vec k goes to offset+k, offset+k+step
    w = V._BitWM()
    w.write_msb(1, 1)
    w.write_msb(1, 1)  # [3,4] -> positions 0, 2
    w.write_msb(0, 1)  # [1,2] -> positions 1, 3
    out = V._decode_residue(V._PktBits(w.bytes()), cfg, books, 1, 4,
                            [False])
    assert out.tolist() == [[3.0, 1.0, 4.0, 2.0]]


def test_residue_multi_stage_accumulates():
    books = _residue_books()
    cfg = {"type": 1, "begin": 0, "end": 4, "partition_size": 4,
           "classifications": 2, "classbook": 0,
           "cascades": [0, 3], "books": [[-1] * 8, [1, 1] + [-1] * 6]}
    w = V._BitWM()
    w.write_msb(1, 1)  # class 1
    w.write_msb(1, 1)  # pass 0: [3,4]
    w.write_msb(0, 1)  #          [1,2]
    w.write_msb(0, 1)  # pass 1: [1,2]
    w.write_msb(1, 1)  #          [3,4]
    out = V._decode_residue(V._PktBits(w.bytes()), cfg, books, 1, 4,
                            [False])
    assert out.tolist() == [[4.0, 6.0, 4.0, 6.0]]


def test_residue_truncation_keeps_partial():
    # 4-entry 2-bit VQ book; two partitions; the single packet byte
    # ends after partition 0 plus ONE vector of partition 1 — §1.1.4
    # keeps the partial spectrum, zeros the rest
    books = [
        V._Book({"dims": 1, "entries": 2, "lengths": [1, 1],
                 "lookup_type": 0}),
        V._Book({"dims": 2, "entries": 4, "lengths": [2, 2, 2, 2],
                 "lookup_type": 2, "minimum": 0.0, "delta": 1.0,
                 "sequence_p": 0,
                 "multiplicands": [1, 2, 3, 4, 5, 6, 7, 8]}),
    ]
    cfg = {"type": 1, "begin": 0, "end": 8, "partition_size": 4,
           "classifications": 2, "classbook": 0,
           "cascades": [0, 1], "books": [[-1] * 8, [1] + [-1] * 7]}
    w = V._BitWM()
    w.write_msb(1, 1)   # partition 0: class 1
    w.write_msb(3, 2)   # entry 3 -> [7, 8]
    w.write_msb(0, 2)   # entry 0 -> [1, 2]
    w.write_msb(1, 1)   # partition 1: class 1
    w.write_msb(2, 2)   # entry 2 -> [5, 6]; next vector hits EOP
    assert len(w.bits) == 8  # exactly one byte: EOP mid-partition-1
    out = V._decode_residue(V._PktBits(w.bytes()), cfg, books, 1, 8,
                            [False])
    assert out.tolist() == [[7.0, 8.0, 1.0, 2.0, 5.0, 6.0, 0.0, 0.0]]


# ---------------------------------------------------------------------------
# coupling + IMDCT + window
# ---------------------------------------------------------------------------


def test_inverse_coupling_all_quadrants():
    # (M, A) -> (M', A') per §4.3.5
    cases = {
        (3.0, 1.0): (3.0, 2.0),    # M>0, A>0: A' = M - A
        (3.0, -1.0): (2.0, 3.0),   # M>0, A<=0: M' = M + A, A' = M
        (-3.0, 1.0): (-3.0, -2.0),  # M<=0, A>0: A' = M + A
        (-3.0, -1.0): (-2.0, -3.0),  # M<=0, A<=0: M' = M - A, A' = M
    }
    m = np.array([k[0] for k in cases])
    a = np.array([k[1] for k in cases])
    pos_a = a > 0
    new_m = np.where(m > 0, np.where(pos_a, m, m + a),
                     np.where(pos_a, m, m - a))
    new_a = np.where(m > 0, np.where(pos_a, m - a, m),
                     np.where(pos_a, m + a, m))
    for i, k in enumerate(cases):
        assert (new_m[i], new_a[i]) == cases[k]


def test_imdct_matches_naive_loop():
    rng = np.random.default_rng(7)
    for n2 in (8, 32):
        s = rng.normal(size=n2)
        got = V.imdct(s)
        n = 2 * n2
        naive = [
            sum(s[k] * math.cos(math.pi / (2 * n) * (2 * j + 1 + n2)
                                * (2 * k + 1)) for k in range(n2))
            for j in range(n)
        ]
        assert np.allclose(got, naive, atol=1e-12)


def test_imdct_fft_path_at_real_blocksizes():
    """The FFT decomposition must hold at Vorbis's real block sizes
    (up to 8192) where the old cosine matrix would cost 256 MB —
    spot-checked against the explicit O(n²) sum."""
    rng = np.random.default_rng(11)
    for n2 in (1024, 4096):
        s = rng.normal(size=n2)
        got = V.imdct(s)
        n = 2 * n2
        for j in rng.integers(0, n, 5):
            naive = sum(
                s[k] * math.cos(math.pi / (2 * n) * (2 * int(j) + 1 + n2)
                                * (2 * k + 1)) for k in range(n2)
            )
            assert abs(got[j] - naive) < 1e-9 * max(1.0, abs(naive))


def test_window_princen_bradley_mixed_sequence():
    """w² sums to exactly 1 across every lap of a mixed short/long
    sequence — the spec's lapping geometry has no other solution."""
    blocks = [(64, False, 1, 1), (128, True, 0, 1), (128, True, 1, 0),
              (64, False, 1, 1), (64, False, 1, 1)]
    centers = []
    c = blocks[0][0] // 2
    prev_n = blocks[0][0]
    centers.append(c)
    for nb, _l, _p, _n in blocks[1:]:
        c = c + prev_n // 4 + nb // 4
        centers.append(c)
        prev_n = nb
    total = centers[-1] + 128
    acc = np.zeros(total)
    for (nb, lb, pf, nf), cc in zip(blocks, centers):
        w = V.block_window(nb, 64, lb, pf, nf)
        acc[cc - nb // 2 : cc + nb // 2] += w**2
    lo, hi = centers[0], centers[-1]
    assert np.allclose(acc[lo:hi], 1.0, atol=1e-12)


# ---------------------------------------------------------------------------
# end-to-end streams (closed forms via explicit loops)
# ---------------------------------------------------------------------------


def test_e2e_mono_single_coefficient():
    blob = V.build_pcm_ogg([(5, 2), (5, 2)])
    pcm, rate = V.decode_ogg_vorbis(blob)
    assert rate == 8000 and pcm.shape == (32, 1)
    exp = [_cos64(5, 32 + t) * _w64(32 + t) + _cos64(5, t) * _w64(t)
           for t in range(32)]
    assert np.allclose(pcm[:, 0], exp, atol=1e-12)


def test_e2e_stereo_coupling():
    b = 3
    ident = V.build_pcm_ident(channels=2)
    setup = V.build_pcm_setup(channels=2, coupling=True)
    pkt = V.encode_pcm_packet([(2 * b, 2), (2 * b + 1, 1)], channels=2)
    pcm, _ = V.decode_packets(ident, setup, [pkt, pkt])
    assert pcm.shape == (32, 2)
    for ch, amp in ((0, 1.0), (1, 0.5)):  # M'=M, A'=M-A=0.5
        exp = [amp * (_cos64(b, 32 + t) * _w64(32 + t)
                      + _cos64(b, t) * _w64(t)) for t in range(32)]
        assert np.allclose(pcm[:, ch], exp, atol=1e-12)


def test_e2e_mixed_blocksizes():
    ident = V.build_pcm_ident(two_modes=True)
    setup = V.build_pcm_setup(two_modes=True)
    p_s = V.encode_pcm_packet((5, 2), two_modes=True)
    p_l = V.encode_pcm_packet((9, 3), two_modes=True, long_block=True,
                              prev_flag=0, next_flag=0)
    pcm, _ = V.decode_packets(ident, setup, [p_s, p_l, p_s])
    assert pcm.shape == (96, 1)

    def imdct_naive(s, nb):
        return [
            sum(s[k] * math.cos(math.pi / (2 * nb) * (2 * j + 1 + nb // 2)
                                * (2 * k + 1)) for k in range(nb // 2))
            for j in range(nb)
        ]

    def win(nb, lb, pf, nf):
        return V.block_window(nb, 64, lb, pf, nf)

    s1 = [0.0] * 32
    s1[5] = 1.0
    s2 = [0.0] * 64
    s2[9] = 1.5
    acc = [0.0] * 260
    for (nb, s, lb, pf, nf), c in zip(
        [(64, s1, False, 1, 1), (128, s2, True, 0, 0),
         (64, s1, False, 1, 1)], [32, 80, 128],
    ):
        xs = imdct_naive(s, nb)
        wv = win(nb, lb, pf, nf)
        for i in range(nb):
            acc[c - nb // 2 + i] += xs[i] * wv[i]
    assert np.allclose(pcm[:, 0], acc[32:128], atol=1e-12)


def test_e2e_zero_energy_and_truncated_frames():
    ident = V.build_pcm_ident()
    setup = V.build_pcm_setup()
    good = V.encode_pcm_packet((5, 2))
    # §4.3.2: a packet truncated inside the floor decode is a
    # zero-ENERGY frame — it emits silence but still advances the
    # overlap-add center, exactly like an explicit zero-residue packet
    short = good[:1]
    zero = V.encode_pcm_packet([])
    pcm, _ = V.decode_packets(ident, setup, [good, short, good])
    ref, _ = V.decode_packets(ident, setup, [good, zero, good])
    assert pcm.shape == (64, 1)
    assert np.allclose(pcm, ref)
    # §4.3.1: EOP in the packet HEADER (empty packet) is undecodable —
    # that frame is skipped without advancing time, so the two good
    # frames lap directly
    pcm0, _ = V.decode_packets(ident, setup, [good, b"", good])
    ref0, _ = V.decode_packets(ident, setup, [good, good])
    assert pcm0.shape == (32, 1)
    assert np.allclose(pcm0, ref0[: len(pcm0)])
    # truncation INSIDE residue keeps the partial frame: cut the last
    # byte so pass-1 stage codewords vanish mid-decode
    part = good[:-1]
    pcm2, _ = V.decode_packets(ident, setup, [good, part])
    assert pcm2.shape == (32, 1)


# ---------------------------------------------------------------------------
# hostiles
# ---------------------------------------------------------------------------


def test_hostile_headers():
    with pytest.raises(ValueError, match="bad identification"):
        V.parse_ident(b"\x01vorbiz" + b"\x00" * 23)
    bad_bs = bytearray(V.build_pcm_ident())
    bad_bs[28] = 0x11  # blocksizes 2/2
    with pytest.raises(ValueError, match="illegal blocksizes"):
        V.parse_ident(bytes(bad_bs))
    with pytest.raises(ValueError, match="unsupported version"):
        V.parse_ident(b"\x01vorbis\x01" + b"\x00" * 22)
    with pytest.raises(ValueError, match="lacks ident or setup"):
        V.decode_ogg_vorbis(b"OggS" + b"\x00" * 60)


def _floor0_setup() -> bytes:
    """Setup header with a floor-0 configuration: book 0 classbook,
    book 1 residue VQ (the build_pcm_setup books), book 2 the LSP
    coefficient book (dims 2, values 0.25 + m·0.5)."""
    from rawdata_client_provider_gcs_spark.operators.rawvorbis import _BitW

    w = _BitW()
    w.write(2, 8)             # three codebooks
    # book 0: classbook dims 2, 4 entries, all length 2
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(4, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(4):
        w.write(1, 5)
    w.write(0, 4)
    # book 1: residue VQ — dims 8, 32 entries, length 5, lookup 2
    w.write(0x564342, 24)
    w.write(8, 16)
    w.write(32, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(32):
        w.write(4, 5)
    w.write(2, 4)
    w.write(0x00000000, 32)   # minimum 0.0
    w.write((787 << 21) | 1, 32)  # delta 0.5
    w.write(1, 4)             # value_bits 2
    w.write(0, 1)
    for e in range(32):
        pos, amp = divmod(e, 4)
        for i in range(8):
            w.write(amp if i == pos else 0, 2)
    # book 2: floor0 LSP book — dims 2, 4 entries, length 2, lookup 2
    w.write(0x564342, 24)
    w.write(2, 16)
    w.write(4, 24)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(4):
        w.write(1, 5)
    w.write(2, 4)
    w.write((786 << 21) | 1, 32)  # minimum 0.25
    w.write((787 << 21) | 1, 32)  # delta 0.5
    w.write(1, 4)             # value_bits 2
    w.write(0, 1)
    for m in (0, 1, 2, 3, 1, 3, 2, 0):  # entry e -> [m[2e], m[2e+1]]
        w.write(m, 2)
    # time domain
    w.write(0, 6)
    w.write(0, 16)
    # one floor — TYPE 0: order 2, rate 8000, bark 64, amp 6/10
    w.write(0, 6)
    w.write(0, 16)
    w.write(2, 8)
    w.write(8000, 16)
    w.write(64, 16)
    w.write(6, 6)
    w.write(10, 8)
    w.write(0, 4)             # one book
    w.write(2, 8)             # book 2
    # one residue type 2, single-stage
    w.write(0, 6)
    w.write(2, 16)
    w.write(0, 24)
    w.write(32, 24)
    w.write(7, 24)
    w.write(1, 6)             # 2 classifications
    w.write(0, 8)             # classbook 0
    w.write(0, 3)
    w.write(0, 1)
    w.write(1, 3)             # class 1: stage 0 only
    w.write(0, 1)
    w.write(1, 8)             # stage-0 book 1
    # one mapping + one short mode
    w.write(0, 6)
    w.write(0, 16)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)
    w.write(0, 8)
    w.write(0, 8)
    w.write(0, 8)
    w.write(0, 6)
    w.write(0, 1)
    w.write(0, 16)
    w.write(0, 16)
    w.write(0, 8)
    w.write(1, 1)
    return b"\x05vorbis" + w.bytes()


def test_floor0_end_to_end_against_spec_loops():
    """Floor-0 decode: amplitude + LSP coefficients through the §6.2.3
    bark-warped curve, pinned against an explicit-loop restatement of
    the spec formula (independent code path, same published math)."""
    setup = _floor0_setup()
    ident = V.parse_ident(V.build_pcm_ident())
    dec = V.VorbisDecoder(ident, setup)

    # packet: amplitude 40 (6 bits LSB), book 0 (1 bit), LSP entry 3
    # (multiplicands (2, 0) -> coeffs 0.25+2*0.5, 0.25+0*0.5 =
    # [1.25, 0.25]), then the residue: slot 5, amp index 2 (value 1.0)
    w = V._BitWM()
    w.write(0, 1)
    w.write(40, 6)
    w.write(0, 1)
    w.write_msb(3, 2)
    part, entry = 0, 5 * 4 + 2
    classes = [1, 0, 0, 0]
    for half in range(2):
        w.write_msb(classes[2 * half] * 2 + classes[2 * half + 1], 2)
        for j in (2 * half, 2 * half + 1):
            if classes[j]:
                w.write_msb(entry, 5)
    pkt = w.bytes()
    pcm, _ = V.decode_packets(V.build_pcm_ident(), setup, [pkt, pkt])
    assert pcm.shape == (32, 1)

    # independent expectation
    def bark(x):
        return (13.1 * math.atan(0.00074 * x)
                + 2.24 * math.atan(1.85e-8 * x * x) + 1e-4 * x)

    lsp = [1.25, 0.25]
    curve = []
    for i in range(32):
        m = min(63, math.floor(bark(8000 * i / 64.0) * 64 / bark(4000)))
        om = math.pi * m / 64
        p = ((1 - math.cos(om)) / 2
             * 4 * (math.cos(lsp[1]) - math.cos(om)) ** 2)
        q = ((1 + math.cos(om)) / 2
             * 4 * (math.cos(lsp[0]) - math.cos(om)) ** 2)
        curve.append(math.exp(40 * 10 / (63 * math.sqrt(p + q)) - 10))
    spec = [0.0] * 32
    spec[5] = 1.0 * curve[5]
    n = 64
    exp = []
    for t in range(32):
        tot = 0.0
        for j, jj in ((32 + t, 32 + t), (t, t)):
            x = sum(spec[k] * math.cos(math.pi / (2 * n)
                                       * (2 * jj + 1 + 32) * (2 * k + 1))
                    for k in range(32))
            tot += x * _w64(jj)
        exp.append(tot)
    assert np.allclose(pcm[:, 0], exp, atol=1e-9)


def test_floor0_zero_amplitude_is_silence():
    setup = _floor0_setup()
    w = V._BitWM()
    w.write(0, 1)
    w.write(0, 6)  # amplitude 0: channel unset, frame all zero
    pkt = w.bytes()
    pcm, _ = V.decode_packets(V.build_pcm_ident(), setup, [pkt, pkt])
    assert pcm.shape == (32, 1)
    assert np.allclose(pcm, 0.0)


def test_decode_ogg_pcm_wired():
    from rawdata_client_provider_gcs_spark.operators.rawogg import (
        decode_ogg_pcm,
    )

    blob = V.build_pcm_ogg([(5, 2), (5, 2)])
    pcm, rate = decode_ogg_pcm(blob)
    assert pcm.shape == (32, 1) and rate == 8000


def test_granule_trims_decoder_padding():
    """A final granule below the lapped output length trims the PCM —
    the encoder's declared total wins over block padding."""
    from rawdata_client_provider_gcs_spark.operators.rawogg import _page

    ident = V.build_pcm_ident()
    comment = (b"\x03vorbis" + (7).to_bytes(4, "little") + b"fixture"
               + (0).to_bytes(4, "little") + b"\x01")
    setup = V.build_pcm_setup()
    audio = [V.encode_pcm_packet((5, 2)) for _ in range(3)]
    serial = 0x7002
    blob = (
        _page(serial, 0, 0, [ident], 2)
        + _page(serial, 1, 0, [comment, setup], 0)
        + _page(serial, 2, 50, audio, 4)  # granule 50 < 64 lapped
    )
    pcm, _ = V.decode_ogg_vorbis(blob)
    assert pcm.shape[0] == 50


def test_fuzz_audio_packets_never_crash():
    """Random audio packets either decode (possibly as silence) or are
    skipped/ValueError'd — never crash, hang, or leak an exception
    class outside the per-row contract."""
    import random

    rng = random.Random(42)
    ident = V.parse_ident(V.build_pcm_ident())
    setup = V.build_pcm_setup()
    for _ in range(300):
        pkts = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
                for _ in range(rng.randrange(1, 4))]
        dec = V.VorbisDecoder(ident, setup)
        try:
            for p in pkts:
                dec.feed(p)
            out = dec.finish()
            assert np.all(np.isfinite(out))
        except ValueError:
            pass  # the per-row capture class


def test_fuzz_whole_streams_never_crash():
    import random

    rng = random.Random(9)
    base = V.build_pcm_ogg([(5, 2), (9, 1)])
    for _ in range(200):
        blob = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            pcm, _ = V.decode_ogg_vorbis(bytes(blob))
            assert np.all(np.isfinite(pcm))
        except ValueError:
            pass


def test_chained_streams_concatenate():
    """Two logical streams back-to-back (the icecast dump shape)
    decode to concatenated PCM; mismatched chains raise."""
    a = V.build_pcm_ogg([(5, 2), (5, 2)])
    b = V.build_pcm_ogg([(9, 1), (9, 1)], rate=8000)
    # rewrite chain b's serial so the two streams are distinct
    bb = bytearray(b)
    i = 0
    while True:
        i = bb.find(b"OggS", i)
        if i < 0:
            break
        bb[i + 14 : i + 18] = (0x7002).to_bytes(4, "little")
        from rawdata_client_provider_gcs_spark.operators.rawogg import (
            ogg_crc,
        )
        # recompute the page CRC after the serial rewrite
        hlen = 27 + bb[i + 26]
        blen = sum(bb[i + 27 : i + 27 + bb[i + 26]])
        page = bytes(bb[i : i + hlen + blen])
        page = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        crc = ogg_crc(page)
        bb[i + 22 : i + 26] = crc.to_bytes(4, "little")
        i += 4
    pcm, rate = V.decode_ogg_vorbis(bytes(a) + bytes(bb))
    assert rate == 8000 and pcm.shape == (64, 1)
    one, _ = V.decode_ogg_vorbis(a)
    two, _ = V.decode_ogg_vorbis(bytes(bb))
    assert np.array_equal(pcm, np.vstack([one, two]))
    # mismatched channel count across chains raises
    stereo = V.build_pcm_ident(channels=2)
    st_setup = V.build_pcm_setup(channels=2)
    pkt = V.encode_pcm_packet([(6, 2)], channels=2)
    from rawdata_client_provider_gcs_spark.operators.rawogg import _page
    comment = (b"\x03vorbis" + (7).to_bytes(4, "little") + b"fixture"
               + (0).to_bytes(4, "little") + b"\x01")
    chain2 = (_page(0x7003, 0, 0, [stereo], 2)
              + _page(0x7003, 1, 0, [comment, st_setup], 0)
              + _page(0x7003, 2, 32, [pkt, pkt], 4))
    with pytest.raises(ValueError, match="chained streams disagree"):
        V.decode_ogg_vorbis(bytes(a) + chain2)


def test_webm_vorbis_track_decodes_all_lacings():
    """A_VORBIS in Matroska: Xiph-laced CodecPrivate headers + block
    frames across all four lacing modes and both block carriages
    (SimpleBlock / BlockGroup) decode to the same PCM as the bare
    packet sequence."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm as W

    ident = V.build_pcm_ident()
    comment = (b"\x03vorbis" + (7).to_bytes(4, "little") + b"fixture"
               + (0).to_bytes(4, "little") + b"\x01")
    setup = V.build_pcm_setup()

    def xiph_cp(pkts):
        out = bytes([len(pkts) - 1])
        for p in pkts[:-1]:
            q, r = divmod(len(p), 255)
            out += b"\xff" * q + bytes([r])
        return out + b"".join(pkts)

    cp = xiph_cp([ident, comment, setup])
    pk = [V.encode_pcm_packet((5, 2)), V.encode_pcm_packet((9, 1)),
          V.encode_pcm_packet((3, 3))]
    for lacing, blocks in (
        ("xiph", [[pk[0], pk[1]], [pk[2]], [pk[2]]]),
        ("fixed", [[pk[2], pk[2]], [pk[0]]]),
        ("ebml", [[pk[0], pk[1], pk[2]]]),
    ):
        blob = W.build_webm(video=None, audio=("A_VORBIS", 1, 8000),
                            audio_codec_private=cp, audio_blocks=blocks,
                            audio_lacing=lacing)
        pcm, rate = W.decode_webm_media(blob)
        flat = [p for b in blocks for p in b]
        ref, rr = V.decode_packets(ident, setup, flat)
        assert rate == rr == 8000
        assert np.array_equal(pcm, ref), lacing
    # incomplete CodecPrivate (ident only): stays the loud boundary
    from rawdata_client_provider_gcs_spark.operators.rawavi import (
        UnsupportedCodecError,
    )

    blob = W.build_webm(video=None, audio=("A_VORBIS", 1, 8000),
                        audio_codec_private=xiph_cp([ident]))
    with pytest.raises(UnsupportedCodecError):
        W.decode_webm_media(blob)


def test_floor0_zero_rate_is_valueerror_not_zerodivision():
    cfg = {"type": 0, "order": 2, "rate": 0, "bark_map_size": 64,
           "amplitude_bits": 6, "amplitude_offset": 10, "books": [0]}
    with pytest.raises(ValueError, match="zero rate/bark"):
        V._Floor0(cfg)
    cfg2 = dict(cfg, rate=8000, bark_map_size=0)
    with pytest.raises(ValueError, match="zero rate/bark"):
        V._Floor0(cfg2)


def test_webm_ebml_lacing_single_frame():
    """EBML lacing with a lace-count of one carries NO size fields —
    the single frame must come through intact (review, r12)."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm as W

    frame = b"\x07payload-bytes"
    body = b"\x81" + b"\x00\x00" + b"\x86" + b"\x00" + frame
    tn, frames = W._block_frames(body, 0, len(body))
    assert tn == 1 and frames == [frame]


def test_scalar_fast_table_and_long_codeword_fallback():
    """Codewords longer than the 8-bit fast table fall back to the
    accumulate walk with an identical result; short ones hit the
    table.  Kraft-complete lengths: 1, 2, ..., 9, 10, 10."""
    lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10]
    book = V._Book({"dims": 1, "entries": 11, "lengths": lengths,
                    "lookup_type": 0})
    words = V.assign_codewords(lengths)
    w = V._BitWM()
    order = [0, 10, 8, 9, 3, 7]  # mix short, 10-bit, 9-bit entries
    for e in order:
        code, ln = words[e]
        w.write_msb(code, ln)
    r = V._PktBits(w.bytes())
    assert [book.scalar(r) for _ in order] == order
    # near the packet end (fewer than 8 bits left) the per-bit walk
    # still decodes a short codeword
    w2 = V._BitWM()
    w2.write_msb(words[0][0], words[0][1])  # 1-bit codeword
    r2 = V._PktBits(w2.bytes()[:1])
    r2.pos = 7  # only one bit remains
    # craft: put the codeword in the last bit
    data = bytes([words[0][0] << 7])
    r3 = V._PktBits(data)
    r3.pos = 7
    assert book.scalar(r3) == 0
