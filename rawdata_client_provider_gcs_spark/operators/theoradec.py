"""Theora I intra-frame (keyframe) decoder — headers, quantizers,
DCT token decode, DC prediction, exact integer iDCT, reconstruction.

Same honesty argument that unlocked Vorbis (r12): every table a
keyframe needs ships in the stream's own setup header (loop-filter
limits, AC/DC scales, base matrices + quant ranges, all 80 DCT-token
Huffman trees), so decoding is spec mechanics, not licensed tables.
This module implements the INTRA subset of the public Theora I
specification (theora.org, "Theora I specification"):

- §6.4 setup header: loop filter table, scales, base matrices, quant
  ranges (with the copy/repeat grammar), Huffman trees (0=interior,
  1=leaf+5-bit token, depth-32 cap);
- §6.4.3 computed quantization matrices (linear interpolation inside
  a quant range, 100-scale, [QMIN, 4096] clamp);
- §7.1 frame header (FTYPE, up to 3 qi values, 3 reserved bits);
- §7.4 per-block qi selection: the long-run bit vector (two passes
  for three-qi frames) choosing each block's AC quantizer;
- §7.7 DCT token decode: coefficient-position-major loop over blocks
  in coded order (plane raster of superblocks, Hilbert order within
  a superblock), global EOB-run counter, all 32 tokens (EOB runs,
  zero runs, value categories, combined run/value categories);
- §7.9.2 DC prediction in the quantized domain (16-case weight
  table, 128-outlier fallback, last-DC tracking across planes);
- §7.9.3 dequantization and the exact 16-bit integer inverse DCT
  (C1..C7 constants, two passes, final (v+8)>>4);
- §7.10 loop filter (a no-op on flat frames, applied per spec).

INTER frames decode fully (r13 NO_MV subset + r14 MV-coded modes):
§7.3 coded-block flags (superblock partial/full long-run vectors,
short-run block flags that simply alternate), §7.4 macroblock modes
(scheme 0 custom alphabets, the six fixed alphabets of schemes 1-6,
scheme 7 fixed 3-bit), §7.5 motion vectors (per-frame VLC/fixed
component-code selection, the last/prior vector chain that only
INTER_MV and FOUR update and LAST2 swaps, GOLDEN_MV reading a vector
without touching the chain, FOUR's per-coded-luma-block vectors with
round-half-away chroma averaging), §7.9.1 motion compensation
(half-pel luma units, chroma halving via ``(v >> 1) | (v & 1)``,
two-pixel no-rounding averages with the sign-dependent diagonal,
edge-replicated reference padding), per-reference DC prediction and
last-DC tracking, inter-matrix dequant, and coded-edge loop
filtering; uncoded blocks copy the prior frame and keyframes become
the golden reference.  The §7.4 alphabet rows and §7.5.1 component
codes are offline transcriptions of the spec's printed tables (the
r13 discipline): pinned by fixtures exercising every rank of every
scheme and every component-code class on gradient references against
an independent scalar restatement of the MC arithmetic
(tests/test_theora.py).  Coverage honesty: the flat-color end-to-end
oracle (`q_multimodal_theora_keyframe`) exercises value tokens, EOB
runs (both 12-bit forms), DC prediction with all-equal neighbors,
dequant, iDCT and reconstruction value-exactly against closed-form
SQL — with every third stream a two-qi frame whose §7.4 run vector
must parse exactly for the following token stream to stay in sync;
the remaining token shapes (zero runs, run/value combos, the
three-qi second pass) are pinned by unit vectors in
``tests/test_theora.py`` that this module's own fixture writers
produce — self-consistent, flagged as such, since no independent
Theora implementation ships in this environment.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
decode is this repo's derived multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_FRAME_PIXELS = 1 << 26  # 64 Mpixel/frame bomb guard
MAX_PACKETS = 1 << 16


def ilog(v: int) -> int:
    """Position of the highest set bit (spec ilog): ilog(0)=0."""
    return v.bit_length()


# ---------------------------------------------------------------------------
# MSB-first bit I/O (Theora packs bits big-endian, unlike Vorbis)
# ---------------------------------------------------------------------------


class _Br:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("theora: bit read past end of packet")
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            out = (out << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out


class _Bw:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        k = 0
        for b in self.bits:
            acc = (acc << 1) | b
            k += 1
            if k == 8:
                out.append(acc)
                acc = k = 0
        if k:
            out.append(acc << (8 - k))
        return bytes(out)


# ---------------------------------------------------------------------------
# setup header (§6.4)
# ---------------------------------------------------------------------------


def parse_setup(pkt: bytes) -> dict:
    """``\\x82theora`` packet → loop-filter limits, scales, base
    matrices, quant ranges, and the 80 DCT-token Huffman trees."""
    if pkt[:7] != b"\x82theora":
        raise ValueError("theora: bad setup header magic")
    r = _Br(pkt[7:])
    nbits = r.read(3)
    lflims = [r.read(nbits) for _ in range(64)]
    nbits = r.read(4) + 1
    acscale = [r.read(nbits) for _ in range(64)]
    nbits = r.read(4) + 1
    dcscale = [r.read(nbits) for _ in range(64)]
    nbms = r.read(9) + 1
    if nbms > 384:
        raise ValueError("theora: over 384 base matrices")
    bms = [[r.read(8) for _ in range(64)] for _ in range(nbms)]
    nqrs: list[list[int]] = [[0] * 3 for _ in range(2)]
    qrsizes: list[list[list[int]]] = [[[] for _ in range(3)] for _ in range(2)]
    qrbmis: list[list[list[int]]] = [[[] for _ in range(3)] for _ in range(2)]
    for qti in range(2):
        for pli in range(3):
            newqr = 1 if (qti == 0 and pli == 0) else r.read(1)
            if newqr == 0:
                rpqr = r.read(1) if qti > 0 else 0
                if rpqr:
                    qtj, plj = qti - 1, pli
                else:
                    prev = qti * 3 + pli - 1
                    qtj, plj = prev // 3, prev % 3
                nqrs[qti][pli] = nqrs[qtj][plj]
                qrsizes[qti][pli] = list(qrsizes[qtj][plj])
                qrbmis[qti][pli] = list(qrbmis[qtj][plj])
                continue
            qi = 0
            qri = 0
            while True:
                bmi = r.read(ilog(nbms - 1))
                if bmi >= nbms:
                    raise ValueError("theora: quant-range bmi out of range")
                qrbmis[qti][pli].append(bmi)
                if qi >= 63:
                    break
                size = r.read(ilog(62 - qi)) + 1
                qrsizes[qti][pli].append(size)
                qi += size
                qri += 1
                if qi > 63:
                    raise ValueError("theora: quant ranges overrun qi=63")
            nqrs[qti][pli] = qri
    hts = [_read_tree(r, 0) for _ in range(80)]
    return {
        "lflims": lflims, "acscale": acscale, "dcscale": dcscale,
        "bms": bms, "nqrs": nqrs, "qrsizes": qrsizes, "qrbmis": qrbmis,
        "hts": hts,
    }


def _read_tree(r: _Br, depth: int):
    """One Huffman tree node: 0 = interior (two children), 1 = leaf
    carrying a 5-bit token (§6.4.4).  Nested (left, right) tuples /
    int leaves."""
    if depth > 32:
        raise ValueError("theora: huffman tree deeper than 32")
    if r.read(1) == 0:
        return (_read_tree(r, depth + 1), _read_tree(r, depth + 1))
    return r.read(5)


def _tree_decode(r: _Br, tree) -> int:
    node = tree
    while not isinstance(node, int):
        node = node[r.read(1)]
    return node


def _write_tree(w: _Bw, tree) -> None:
    if isinstance(tree, int):
        w.write(1, 1)
        w.write(tree, 5)
    else:
        w.write(0, 1)
        _write_tree(w, tree[0])
        _write_tree(w, tree[1])


def compute_qmat(setup: dict, qti: int, pli: int, qi: int) -> list[int]:
    """§6.4.3: interpolate base matrices inside the quant range
    containing qi, scale by AC/DC scale over 100, clamp to
    [QMIN, 4096] (QMIN: intra DC 16 / AC 8? — spec Table 6.18:
    qti=0: DC 16, AC 8; qti=1: DC 32, AC 16)."""
    sizes = setup["qrsizes"][qti][pli]
    bmis = setup["qrbmis"][qti][pli]
    qistart = 0
    qri = 0
    for qri, size in enumerate(sizes):
        if qistart + size >= qi:
            break
        qistart += size
    size = sizes[qri]
    bm0 = setup["bms"][bmis[qri]]
    bm1 = setup["bms"][bmis[qri + 1]]
    out = []
    for ci in range(64):
        bm = (2 * (qistart + size - qi) * bm0[ci]
              + 2 * (qi - qistart) * bm1[ci] + size) // (2 * size)
        qmin = (16 if ci == 0 else 8) if qti == 0 else \
            (32 if ci == 0 else 16)
        qscale = setup["dcscale"][qi] if ci == 0 else setup["acscale"][qi]
        out.append(max(qmin, min((qscale * bm // 100) * 4, 4096)))
    return out


# ---------------------------------------------------------------------------
# geometry: plane block grids, Hilbert coded order (§2.3)
# ---------------------------------------------------------------------------

#: block traversal inside a 4x4-block superblock, (x, y) offsets in
#: decode-raster coordinates (spec figure "superblock block ordering")
HILBERT = (
    (0, 0), (1, 0), (1, 1), (0, 1),
    (0, 2), (0, 3), (1, 3), (1, 2),
    (2, 2), (2, 3), (3, 3), (3, 2),
    (3, 1), (2, 1), (2, 0), (3, 0),
)


def plane_dims(frame_w: int, frame_h: int, pli: int) -> tuple[int, int]:
    """(blocks_w, blocks_h) for plane pli at 4:2:0."""
    if pli == 0:
        return frame_w // 8, frame_h // 8
    return frame_w // 16, frame_h // 16


def coded_order(bw: int, bh: int) -> list[tuple[int, int]]:
    """Blocks of one plane in coded order: superblocks in raster
    order, Hilbert traversal within each, edge superblocks skipping
    out-of-plane positions."""
    out = []
    for sby in range((bh + 3) // 4):
        for sbx in range((bw + 3) // 4):
            for dx, dy in HILBERT:
                x, y = sbx * 4 + dx, sby * 4 + dy
                if x < bw and y < bh:
                    out.append((x, y))
    return out


#: the coefficient scan order (Theora shares JPEG's zigzag; spec
#: Table "the zig-zag ordering"): natural index of scan position i
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


# ---------------------------------------------------------------------------
# DCT token semantics (§7.7.1)
# ---------------------------------------------------------------------------


def _token_extra(r: _Br, token: int) -> tuple[int, int, int]:
    """Decode a token's extra bits → (eob_run, zero_run, value).
    Exactly one of the three families applies: EOB runs return
    (run, -1, 0) with run == -1 meaning "all remaining blocks";
    zero/value tokens return (-1, run, value) where the block gains
    ``run`` zeros then ``value`` (value 0 for pure zero runs)."""
    if token == 0:
        return 1, -1, 0
    if token == 1:
        return 2, -1, 0
    if token == 2:
        return 3, -1, 0
    if token == 3:
        return r.read(2) + 4, -1, 0
    if token == 4:
        return r.read(3) + 8, -1, 0
    if token == 5:
        return r.read(4) + 16, -1, 0
    if token == 6:
        run = r.read(12)
        return (run if run else -1), -1, 0
    if token == 7:
        return -1, r.read(3) + 1, 0
    if token == 8:
        return -1, r.read(6) + 1, 0
    if token in (9, 10, 11, 12):
        return -1, 0, (1, -1, 2, -2)[token - 9]
    if token in (13, 14, 15, 16):
        sign = r.read(1)
        v = token - 10  # 3..6
        return -1, 0, -v if sign else v
    if 17 <= token <= 22:
        # value categories: sign bit then magnitude offset bits
        addbits = (1, 2, 3, 4, 5, 9)[token - 17]
        base = (7, 9, 13, 21, 37, 69)[token - 17]
        sign = r.read(1)
        v = base + r.read(addbits)
        return -1, 0, -v if sign else v
    if 23 <= token <= 27:
        sign = r.read(1)
        return -1, token - 22, -1 if sign else 1  # zero run 1..5, ±1
    if token == 28:
        sign = r.read(1)
        run = 6 + r.read(2)
        return -1, run, -1 if sign else 1
    if token == 29:
        sign = r.read(1)
        run = 10 + r.read(3)
        return -1, run, -1 if sign else 1
    if token == 30:
        sign = r.read(1)
        v = 2 + r.read(1)
        return -1, 1, -v if sign else v
    if token == 31:
        sign = r.read(1)
        v = 2 + r.read(1)
        run = 2 + r.read(1)
        return -1, run, -v if sign else v
    raise ValueError(f"theora: token {token} out of range")


#: long-run length code (§7.3.2): k leading 1-bits (max 6) select
#: (suffix bits, base): runs 1, 2-3, 4-5, 6-9, 10-17, 18-33, 34-4129
_RUN_BITS = (0, 1, 1, 2, 3, 4, 12)
_RUN_BASE = (1, 2, 4, 6, 10, 18, 34)


def _long_run(r: _Br) -> int:
    k = 0
    while k < 6 and r.read(1) == 1:
        k += 1
    bits = _RUN_BITS[k]
    return _RUN_BASE[k] + (r.read(bits) if bits else 0)


def _write_long_run(w: _Bw, n: int) -> None:
    if not 1 <= n <= 4129:
        raise ValueError("theora fixture: run outside 1..4129")
    for k in range(6, -1, -1):
        hi = _RUN_BASE[k] + (1 << _RUN_BITS[k]) - 1
        if n >= _RUN_BASE[k] and n <= hi:
            w.write((1 << k) - 1, k)  # k ones
            if k < 6:
                w.write(0, 1)  # terminating zero
            if _RUN_BITS[k]:
                w.write(n - _RUN_BASE[k], _RUN_BITS[k])
            return


def _decode_bit_runs(r: _Br, n: int) -> list[int]:
    """§7.4's run-length bit vector over n blocks: an initial bit,
    then long runs with the bit flipping between runs — except after
    a maximal 4129-run, where the next bit is read explicitly."""
    out: list[int] = []
    bit = r.read(1)
    while len(out) < n:
        run = _long_run(r)
        out.extend([bit] * min(run, n - len(out)))
        if len(out) > n:
            raise ValueError("theora: qi bit run overruns block count")
        if run == 4129:
            # the explicit next-bit read applies only when entries
            # remain to decode (a final maximal run reads nothing)
            if len(out) < n:
                bit = r.read(1)
        else:
            bit ^= 1
    return out


def _encode_bit_runs(w: _Bw, bits: list[int]) -> None:
    i = 0
    n = len(bits)
    w.write(bits[0], 1)
    expected = bits[0]
    while i < n:
        run = 1
        while i + run < n and bits[i + run] == bits[i] and run < 4129:
            run += 1
        if bits[i] != expected:
            raise ValueError("theora fixture: runs must alternate")
        _write_long_run(w, run)
        i += run
        if run == 4129:
            if i < n:
                w.write(bits[i], 1)
                expected = bits[i]
        else:
            expected ^= 1


#: huffman group of scan position ti: DC, AC 1-5, 6-14, 15-27, 28-63
def _hgroup(ti: int) -> int:
    if ti == 0:
        return 0
    if ti <= 5:
        return 1
    if ti <= 14:
        return 2
    if ti <= 27:
        return 3
    return 4


# ---------------------------------------------------------------------------
# DC prediction (§7.9.2)
# ---------------------------------------------------------------------------

#: weight table by availability mask (bit0 L, bit1 UL, bit2 U,
#: bit3 UR): ((wL, wUL, wU, wUR), divisor)
_PRED = {
    1: ((1, 0, 0, 0), 1),
    2: ((0, 1, 0, 0), 1),
    3: ((1, 0, 0, 0), 1),
    4: ((0, 0, 1, 0), 1),
    5: ((1, 0, 1, 0), 2),
    6: ((0, 0, 1, 0), 1),
    7: ((29, -26, 29, 0), 32),
    8: ((0, 0, 0, 1), 1),
    9: ((75, 0, 0, 53), 128),
    10: ((0, 1, 0, 1), 2),
    11: ((75, 0, 0, 53), 128),
    12: ((0, 0, 1, 0), 1),
    13: ((75, 0, 0, 53), 128),
    14: ((0, 0, 1, 0), 1),
    15: ((29, -26, 29, 0), 32),
}


def dc_predict(mask: int, l: int, ul: int, u: int, ur: int,
               last_dc: int) -> int:
    """Weighted predictor with the 128-outlier fallback (applies when
    L, UL and U are all available)."""
    if mask == 0:
        return last_dc
    (wl, wul, wu, wur), div = _PRED[mask]
    pred = (wl * l + wul * ul + wu * u + wur * ur) // div
    if mask & 1 and mask & 2 and mask & 4:
        if abs(pred - u) > 128:
            pred = u
        elif abs(pred - l) > 128:
            pred = l
        elif abs(pred - ul) > 128:
            pred = ul
    return pred


# ---------------------------------------------------------------------------
# exact integer iDCT (§7.9.3)
# ---------------------------------------------------------------------------

_C1, _C2, _C3, _C4 = 64277, 60547, 54491, 46341
_C5, _C6, _C7 = 36410, 25080, 12785


def _trunc16(v: int) -> int:
    """Truncate to signed 16 bits (spec: sums are 16-bit registers)."""
    v &= 0xFFFF
    return v - 0x10000 if v & 0x8000 else v


def idct_1d(x: list[int]) -> list[int]:
    """The spec's exact 1-D inverse DCT: four butterfly stages with
    ``*C >> 16`` multiplies on 16-bit-truncated sums, outputs
    truncated to 16 bits (§7.9.3.5)."""
    # stage 1
    t0 = _C4 * _trunc16(x[0] + x[4]) >> 16
    t1 = _C4 * _trunc16(x[0] - x[4]) >> 16
    t2 = (_C6 * x[2] >> 16) - (_C2 * x[6] >> 16)
    t3 = (_C2 * x[2] >> 16) + (_C6 * x[6] >> 16)
    t4 = (_C7 * x[1] >> 16) - (_C1 * x[7] >> 16)
    t5 = (_C3 * x[5] >> 16) - (_C5 * x[3] >> 16)
    t6 = (_C5 * x[5] >> 16) + (_C3 * x[3] >> 16)
    t7 = (_C1 * x[1] >> 16) + (_C7 * x[7] >> 16)
    # stage 2: rotate the odd pairs through C4
    r = t4 + t5
    t5 = _C4 * _trunc16(t4 - t5) >> 16
    t4 = r
    r = t7 + t6
    t6 = _C4 * _trunc16(t7 - t6) >> 16
    t7 = r
    # stage 3: even butterflies
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    # stage 4: recombine the two C4 products
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    return [
        _trunc16(t0 + t7), _trunc16(t1 + t6), _trunc16(t2 + t5),
        _trunc16(t3 + t4), _trunc16(t3 - t4), _trunc16(t2 - t5),
        _trunc16(t1 - t6), _trunc16(t0 - t7),
    ]


def idct_8x8(coeffs: list[int]) -> list[list[int]]:
    """Two-pass 2-D inverse DCT; final value (v + 8) >> 4 per spec."""
    rows = [idct_1d(coeffs[i * 8 : i * 8 + 8]) for i in range(8)]
    out = [[0] * 8 for _ in range(8)]
    for c in range(8):
        col = idct_1d([rows[rw][c] for rw in range(8)])
        for rw in range(8):
            out[rw][c] = (col[rw] + 8) >> 4
    return out


def _idct1d_batch(x: np.ndarray) -> np.ndarray:
    """Vectorized :func:`idct_1d` over the last axis of an int64
    array — identical stage structure, truncations and shifts, so
    ``tests/test_theora.py`` pins batch == scalar on random blocks."""

    def tr16(v):
        return (v & 0xFFFF ^ 0x8000) - 0x8000

    t0 = _C4 * tr16(x[..., 0] + x[..., 4]) >> 16
    t1 = _C4 * tr16(x[..., 0] - x[..., 4]) >> 16
    t2 = (_C6 * x[..., 2] >> 16) - (_C2 * x[..., 6] >> 16)
    t3 = (_C2 * x[..., 2] >> 16) + (_C6 * x[..., 6] >> 16)
    t4 = (_C7 * x[..., 1] >> 16) - (_C1 * x[..., 7] >> 16)
    t5 = (_C3 * x[..., 5] >> 16) - (_C5 * x[..., 3] >> 16)
    t6 = (_C5 * x[..., 5] >> 16) + (_C3 * x[..., 3] >> 16)
    t7 = (_C1 * x[..., 1] >> 16) + (_C7 * x[..., 7] >> 16)
    r = t4 + t5
    t5 = _C4 * tr16(t4 - t5) >> 16
    t4 = r
    r = t7 + t6
    t6 = _C4 * tr16(t7 - t6) >> 16
    t7 = r
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    return tr16(np.stack(
        [t0 + t7, t1 + t6, t2 + t5, t3 + t4,
         t3 - t4, t2 - t5, t1 - t6, t0 - t7], axis=-1,
    ))


def idct_8x8_batch(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) int64 dequantized coefficients → (n, 8, 8) residuals
    — rows pass, columns pass, final (v + 8) >> 4."""
    rows = _idct1d_batch(blocks)
    cols = _idct1d_batch(rows.swapaxes(-1, -2)).swapaxes(-1, -2)
    return (cols + 8) >> 4


def idct_flat_dc(dequant_dc: int) -> int:
    """Closed-form residual for a DC-only block — the value the SQL
    oracle restates: ((C4*((C4*dc)>>16))>>16 + 8) >> 4."""
    return ((_C4 * (_C4 * _trunc16(dequant_dc) >> 16)) >> 16) + 8 >> 4


# ---------------------------------------------------------------------------
# frame decode (intra only)
# ---------------------------------------------------------------------------


#: macroblock modes (§7.4): only INTRA and the NO_MV inter modes are
#: in the decodable subset — motion-vector-coded modes stay loud
#: pending verification against an independent implementation
MODE_INTER_NO_MV = 0
MODE_INTRA = 1
MODE_GOLDEN_NO_MV = 5
MODE_INTER_MV = 2
MODE_INTER_MV_LAST = 3
MODE_INTER_MV_LAST2 = 4
MODE_GOLDEN_MV = 6
MODE_INTER_MV_FOUR = 7

_MV_MODES = frozenset((2, 3, 4, 6, 7))

#: reference class of a mode: 0 intra, 1 prior frame, 2 golden frame
_MODE_REF = {
    MODE_INTRA: 0,
    MODE_INTER_NO_MV: 1, MODE_INTER_MV: 1, MODE_INTER_MV_LAST: 1,
    MODE_INTER_MV_LAST2: 1, MODE_INTER_MV_FOUR: 1,
    MODE_GOLDEN_NO_MV: 2, MODE_GOLDEN_MV: 2,
}

#: §7.4's six fixed mode-coding alphabets (schemes 1-6): rank → mode.
#: Transcribed from the public Theora I specification's mode-scheme
#: table (the same rows ship in every independent decoder); offline
#: transcription pinned by fixtures that exercise every alphabet
#: entry of every scheme (tests/test_theora.py), the r13 discipline
#: for spec-printed tables.  Scheme 1 ranks the last-MV modes first
#: ("last motion vector dominates"), scheme 5 ranks NO_MV first,
#: scheme 6 ranks the golden-frame copy second.
_MODE_ALPHABETS = (
    (3, 4, 2, 0, 1, 5, 6, 7),  # scheme 1
    (3, 4, 0, 2, 1, 5, 6, 7),  # scheme 2
    (3, 2, 4, 0, 1, 5, 6, 7),  # scheme 3
    (3, 2, 0, 4, 1, 5, 6, 7),  # scheme 4
    (0, 3, 4, 2, 1, 5, 6, 7),  # scheme 5
    (0, 5, 3, 4, 2, 1, 6, 7),  # scheme 6
)


def _short_run(r: _Br) -> int:
    """§7.3's SHORT run lengths for block-level coded flags: k leading
    1-bits (max 5) select (suffix bits, base): 1-2, 3-4, 5-6, 7-10,
    11-14, 15-30."""
    k = 0
    while k < 5 and r.read(1) == 1:
        k += 1
    bits = (1, 1, 1, 2, 2, 4)[k]
    base = (1, 3, 5, 7, 11, 15)[k]
    return base + r.read(bits)


def _write_short_run(w: _Bw, n: int) -> None:
    if not 1 <= n <= 30:
        raise ValueError("theora fixture: short run outside 1..30")
    for k in range(5, -1, -1):
        bits = (1, 1, 1, 2, 2, 4)[k]
        base = (1, 3, 5, 7, 11, 15)[k]
        if base <= n <= base + (1 << bits) - 1:
            w.write((1 << k) - 1, k)
            if k < 5:
                w.write(0, 1)
            w.write(n - base, bits)
            return


def _mode_vlc(r: _Br) -> int:
    """§7.4's unary rank code: 0, 10, 110, ..., 1111110, 1111111."""
    k = 0
    while k < 7 and r.read(1) == 1:
        k += 1
    return k


def _mv_comp_vlc(r: _Br) -> int:
    """§7.5.1 motion-vector component VLC: a 3-bit selector, then
    magnitude extension bits, then a sign bit (1 = negative) —
    covering 0, ±1 (selector only), ±2, ±3 (sign only), ±4..7 (2
    extension bits), ±8..15 (3), ±16..31 (4)."""
    k = r.read(3)
    if k == 0:
        return 0
    if k == 1:
        return 1
    if k == 2:
        return -1
    if k == 3:
        return -2 if r.read(1) else 2
    if k == 4:
        return -3 if r.read(1) else 3
    bits = k - 3  # 2, 3, 4 → magnitude bases 4, 8, 16
    v = (1 << bits) + r.read(bits)
    return -v if r.read(1) else v


def _write_mv_comp_vlc(w: _Bw, v: int) -> None:
    m = abs(v)
    if m > 31:
        raise ValueError("theora fixture: MV component over 31")
    if v == 0:
        w.write(0, 3)
    elif m == 1:
        w.write(1 if v > 0 else 2, 3)
    elif m == 2:
        w.write(3, 3)
        w.write(1 if v < 0 else 0, 1)
    elif m == 3:
        w.write(4, 3)
        w.write(1 if v < 0 else 0, 1)
    else:
        bits = m.bit_length() - 1  # 2 for 4..7, 3 for 8..15, 4 for 16..31
        w.write(bits + 3, 3)
        w.write(m - (1 << bits), bits)
        w.write(1 if v < 0 else 0, 1)


def _mv_comp_fixed(r: _Br) -> int:
    """§7.5.1 fixed MV component code: 5 magnitude bits then a sign
    bit (1 = negative)."""
    m = r.read(5)
    return -m if r.read(1) else m


def _write_mv_comp_fixed(w: _Bw, v: int) -> None:
    m = abs(v)
    if m > 31:
        raise ValueError("theora fixture: MV component over 31")
    w.write(m, 5)
    w.write(1 if v < 0 else 0, 1)


def _decode_mvs(
    r: _Br, coded: dict, modes: dict, mb_order: list,
) -> dict:
    """§7.5 macroblock motion vectors → per-block (mvx, mvy) in
    half-pel luma units.  One frame-level bit selects VLC vs fixed
    component coding; LAST/LAST2 reuse a two-deep vector chain that
    only INTER_MV (and FOUR's per-block vectors) update — GOLDEN_MV
    reads a vector without touching the chain; LAST2 swaps.  FOUR
    reads one vector per CODED luma block in raster order within the
    macroblock (uncoded get zero) and gives chroma the rounded
    average."""
    fixed = bool(r.read(1))
    read_comp = _mv_comp_fixed if fixed else _mv_comp_vlc
    last = (0, 0)
    prior = (0, 0)
    mvs: dict = {}

    def rshift2(a: int) -> int:
        # round half away from zero at /4 (reference decoders' RSHIFT)
        return (a + 2) >> 2 if a > 0 else (a + 1) >> 2

    for mx, my, mb_blocks in mb_order:
        mode = None
        for b in mb_blocks:
            if coded.get(b, False):
                mode = modes[b]
                break
        if mode is None:
            continue
        if mode == MODE_INTER_MV_FOUR:
            prior = last
            luma = mb_blocks[:4]  # raster order within the MB
            per = []
            for b in luma:
                if coded.get(b, False):
                    v = (read_comp(r), read_comp(r))
                    last = v
                else:
                    v = (0, 0)
                per.append(v)
                mvs[b] = v
            cx = rshift2(sum(v[0] for v in per))
            cy = rshift2(sum(v[1] for v in per))
            for b in mb_blocks[4:]:
                mvs[b] = (cx, cy)
            continue
        if mode in (MODE_INTER_MV, MODE_GOLDEN_MV):
            v = (read_comp(r), read_comp(r))
            if mode == MODE_INTER_MV:
                prior = last
                last = v
        elif mode == MODE_INTER_MV_LAST:
            v = last
        elif mode == MODE_INTER_MV_LAST2:
            v = prior
            prior = last
            last = v
        else:
            v = (0, 0)
        for b in mb_blocks:
            mvs[b] = v
    return mvs


def _predict_block(
    padded: np.ndarray, pad: int, bx: int, by: int,
    mvx: int, mvy: int, pli: int,
) -> np.ndarray:
    """§7.9.1 motion-compensated 8x8 predictor from an edge-padded
    reference plane.  MV components are half-pel luma units; chroma
    (4:2:0) halves them with ``(v >> 1) | (v & 1)`` preserving the
    half-pel flag.  Fractional positions average exactly TWO pixels
    without rounding ((a + b) >> 1); the diagonal case picks the two
    pixels along the vector's direction (sign-dependent)."""
    if pli:
        mvx = (mvx >> 1) | (mvx & 1)
        mvy = (mvy >> 1) | (mvy & 1)
    sx = pad + bx * 8 + (mvx >> 1)
    sy = pad + by * 8 + (mvy >> 1)
    fx, fy = mvx & 1, mvy & 1
    p0 = padded[sy : sy + 8, sx : sx + 8].astype(np.int32)
    if not fx and not fy:
        return p0
    if fx and not fy:
        return (p0 + padded[sy : sy + 8, sx + 1 : sx + 9]) >> 1
    if fy and not fx:
        return (p0 + padded[sy + 1 : sy + 9, sx : sx + 8]) >> 1
    if (mvx ^ mvy) >= 0:  # same signs: diagonal (0,0)+(1,1)
        return (p0 + padded[sy + 1 : sy + 9, sx + 1 : sx + 9]) >> 1
    return (  # opposite signs: diagonal (0,+1)+(+1,0)
        padded[sy : sy + 8, sx + 1 : sx + 9].astype(np.int32)
        + padded[sy + 1 : sy + 9, sx : sx + 8]
    ) >> 1


#: edge padding applied to reference planes before motion
#: compensation (max displacement is 15.5 luma pixels + 1 for the
#: half-pel tap)
_MC_PAD = 17


def decode_frame(
    pkt: bytes, setup: dict, frame_w: int, frame_h: int,
    refs: tuple | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One frame packet → (Y, Cb, Cr) uint8 planes (decode raster; a
    flat frame is orientation-free).

    Intra frames decode fully.  Inter frames (r13) decode the NO_MV
    subset: coded-block flags (§7.3 long+short runs), macroblock
    modes (scheme 0 custom alphabets and scheme 7 fixed 3-bit;
    schemes 1-6 and all motion-vector-coded modes raise — pending an
    independent implementation to verify their fixed tables against),
    per-reference DC prediction, inter-matrix dequant, and
    reconstruction from the prior/golden reference planes in ``refs``
    (uncoded blocks copy the prior frame).  Malformed packets raise
    ValueError (per-row capture)."""
    if frame_w * frame_h > MAX_FRAME_PIXELS:
        raise ValueError("theora: frame over the pixel cap")
    r = _Br(pkt)
    if r.read(1) != 0:
        raise ValueError("theora: not a frame packet")
    ftype = r.read(1)
    qis = [r.read(6)]
    if r.read(1):
        qis.append(r.read(6))
        if r.read(1):
            qis.append(r.read(6))
    if ftype == 0 and r.read(3) != 0:
        raise ValueError("theora: nonzero reserved frame-header bits")
    planes = [plane_dims(frame_w, frame_h, pli) for pli in range(3)]
    orders = [coded_order(bw, bh) for bw, bh in planes]
    nbl = [len(o) for o in orders]
    blocks_all = [(pli, xy) for pli in range(3) for xy in orders[pli]]
    if ftype == 0:
        # intra: every block coded, every mode INTRA
        coded = dict.fromkeys(blocks_all, True)
        modes = dict.fromkeys(blocks_all, MODE_INTRA)
        mvs: dict = {}
    else:
        if refs is None:
            raise ValueError(
                "theora: inter frame without reference planes"
            )
        coded = _decode_block_flags(r, planes, orders)
        order = _mb_order(frame_w, frame_h)
        modes = _decode_mb_modes(r, coded, order)
        mvs = _decode_mvs(r, coded, modes, order)
    blocks = [b for b in blocks_all if coded[b]]
    total = len(blocks)
    # §7.4 per-block qi indices (AC quantizer selection): two
    # run-length bit passes over the coded blocks; absent for NQIS=1
    qii_of: dict = dict.fromkeys(blocks, 0)
    if len(qis) >= 2 and total:
        flagged = _decode_bit_runs(r, total)
        if len(qis) == 3 and any(flagged):
            sub = _decode_bit_runs(r, sum(flagged))
            it = iter(sub)
            vals = [1 + next(it) if f else 0 for f in flagged]
        else:
            vals = flagged
        qii_of = dict(zip(blocks, vals))
    # coefficient storage: per plane, per (x, y) block → 64 ints
    coeffs = [
        {xy: [0] * 64 for xy in orders[pli]} for pli in range(3)
    ]
    tis = [dict.fromkeys(orders[pli], 0) for pli in range(3)]
    eobs = 0
    eob_all = False
    htil = htic = 0
    for ti in range(64):
        if ti == 0:
            htil = r.read(4)
            htic = r.read(4)
        elif ti == 1:
            htil = r.read(4)
            htic = r.read(4)
        group = _hgroup(ti)
        for pli, xy in blocks:
            if tis[pli][xy] != ti:
                continue
            if eob_all:
                tis[pli][xy] = 64
                continue
            if eobs > 0:
                tis[pli][xy] = 64
                eobs -= 1
                continue
            hti = group * 16 + (htil if pli == 0 else htic)
            token = _tree_decode(r, setup["hts"][hti])
            eob_run, zrun, value = _token_extra(r, token)
            if eob_run != 0 and zrun == -1:
                # EOB family: current block ends too
                tis[pli][xy] = 64
                if eob_run == -1:
                    eob_all = True
                else:
                    eobs = eob_run - 1
                continue
            if value != 0:
                pos = ti + zrun
                if pos > 63:
                    raise ValueError(
                        "theora: zero run past coefficient 63"
                    )
                coeffs[pli][xy][ZIGZAG[pos]] = value
                tis[pli][xy] = pos + 1
            else:
                # pure zero-run token (§7.7.1): a run of R zeros
                # advances exactly R positions; a run that exactly
                # fills the block (ti + R == 64) is legal and ends it
                if ti + zrun > 64:
                    raise ValueError(
                        "theora: zero run past coefficient 63"
                    )
                tis[pli][xy] = ti + zrun
    # DC prediction in the quantized domain, raster order per plane:
    # a neighbor is available only when CODED with the same reference
    # class, and the no-neighbor fallback tracks one last-DC per
    # reference class (§7.9.2)
    last_dc = [0, 0, 0]
    for pli in range(3):
        bw, bh = planes[pli]
        cs = coeffs[pli]
        for y in range(bh):
            for x in range(bw):
                if not coded[(pli, (x, y))]:
                    continue
                ref = _MODE_REF[modes[(pli, (x, y))]]
                mask = 0
                l = ul = u = ur = 0

                def avail(nx, ny):
                    return (coded[(pli, (nx, ny))]
                            and _MODE_REF[modes[(pli, (nx, ny))]] == ref)

                if x > 0 and avail(x - 1, y):
                    mask |= 1
                    l = cs[(x - 1, y)][0]
                if x > 0 and y > 0 and avail(x - 1, y - 1):
                    mask |= 2
                    ul = cs[(x - 1, y - 1)][0]
                if y > 0 and avail(x, y - 1):
                    mask |= 4
                    u = cs[(x, y - 1)][0]
                if x + 1 < bw and y > 0 and avail(x + 1, y - 1):
                    mask |= 8
                    ur = cs[(x + 1, y - 1)][0]
                cs[(x, y)][0] += dc_predict(mask, l, ul, u, ur,
                                            last_dc[ref])
                last_dc[ref] = cs[(x, y)][0]
    # dequant (intra or inter matrices by block mode, DC always from
    # QIS[0]'s matrix of the block's quant type) + iDCT +
    # reconstruction from the block's predictor: 128 for INTRA,
    # the prior/golden reference pixels for the NO_MV inter modes;
    # uncoded blocks copy the prior frame
    qi = qis[0]
    out_planes = []
    for pli in range(3):
        bw, bh = planes[pli]
        qmats = {}
        for qti in range(2):
            m = np.array(
                [compute_qmat(setup, qti, pli, q) for q in qis],
                dtype=np.int64,
            )
            m[:, 0] = m[0, 0]
            qmats[qti] = m
        plane = np.empty((bh * 8, bw * 8), dtype=np.uint8)
        coded_xy = [xy for xy in orders[pli] if coded[(pli, xy)]]
        if coded_xy:
            arr = np.array([coeffs[pli][xy] for xy in coded_xy],
                           dtype=np.int64)
            rows = np.stack([
                qmats[0 if modes[(pli, xy)] == MODE_INTRA else 1]
                [qii_of[(pli, xy)]]
                for xy in coded_xy
            ])
            dq = (arr * rows).reshape(-1, 8, 8)
            res = idct_8x8_batch(dq)
            res_idx = {xy: i for i, xy in enumerate(coded_xy)}
        # edge-padded references for motion compensation (lazy: only
        # built when an MV-coded block needs one)
        padded: list[np.ndarray | None] = [None, None]

        def ref_padded(ref_i: int) -> np.ndarray:
            if padded[ref_i] is None:
                padded[ref_i] = np.pad(
                    refs[ref_i][pli], _MC_PAD, mode="edge"
                )
            return padded[ref_i]

        for xy in orders[pli]:
            x, y = xy
            sl = (slice(y * 8, y * 8 + 8), slice(x * 8, x * 8 + 8))
            if not coded[(pli, xy)]:
                plane[sl] = refs[0][pli][sl]
                continue
            mode = modes[(pli, xy)]
            ref_cls = _MODE_REF[mode]
            if ref_cls == 0:
                base = np.full((8, 8), 128, dtype=np.int32)
            else:
                ref_i = ref_cls - 1  # 0 = prior, 1 = golden
                mvx, mvy = mvs.get((pli, xy), (0, 0))
                if mvx == 0 and mvy == 0:
                    base = refs[ref_i][pli][sl].astype(np.int32)
                else:
                    base = _predict_block(
                        ref_padded(ref_i), _MC_PAD, x, y, mvx, mvy, pli
                    )
            blk = base + res[res_idx[xy]]
            plane[sl] = np.clip(blk, 0, 255).astype(np.uint8)
        out_planes.append(plane)
    _loop_filter(out_planes, setup["lflims"][qi], planes,
                 coded=None if ftype == 0 else coded)
    return out_planes[0], out_planes[1], out_planes[2]


def _decode_short_bit_runs(r: _Br, n: int) -> list[int]:
    """Block-level flag vector: an initial bit, SHORT runs, the bit
    simply alternating between runs (§7.3 — unlike the superblock
    long-run vectors there is no explicit re-read after a maximal
    run; 30 is the longest run a legal stream can contain, because a
    same-valued flag run can span at most two PARTIAL superblocks of
    up to 15 same-flag blocks each — a full 16 would make the middle
    superblock non-partial)."""
    out: list[int] = []
    bit = r.read(1)
    while len(out) < n:
        run = _short_run(r)
        out.extend([bit] * min(run, n - len(out)))
        bit ^= 1
    return out


def _encode_short_bit_runs(w: _Bw, bits: list[int]) -> None:
    w.write(bits[0], 1)
    i = 0
    n = len(bits)
    while i < n:
        run = 1
        while i + run < n and bits[i + run] == bits[i]:
            run += 1
        _write_short_run(w, run)  # raises on run > 30: not encodable
        i += run


def _decode_block_flags(
    r: _Br, planes: list, orders: list
) -> dict:
    """§7.3 coded-block flags: superblock partial/full long-run
    vectors (planes Y, Cb, Cr concatenated, superblocks in raster
    order), then short-run block flags spanning the partial
    superblocks' blocks in coded order."""
    sb_shapes = [((bw + 3) // 4, (bh + 3) // 4) for bw, bh in planes]
    n_sbs = sum(w * h for w, h in sb_shapes)
    partial = _decode_bit_runs(r, n_sbs)
    n_nonpartial = n_sbs - sum(partial)
    full_bits = _decode_bit_runs(r, n_nonpartial) if n_nonpartial else []
    sb_status = []  # 2 = full, 1 = partial, 0 = uncoded
    it_full = iter(full_bits)
    for p in partial:
        sb_status.append(1 if p else (2 if next(it_full) else 0))
    # gather partial-superblock block positions in coded order, then
    # decode their flag vector in one pass
    partial_positions = []
    sb_of: dict = {}
    sbi = 0
    for pli in range(3):
        bw, bh = planes[pli]
        sbw, sbh = sb_shapes[pli]
        for sby in range(sbh):
            for sbx in range(sbw):
                status = sb_status[sbi]
                sbi += 1
                for dx, dy in HILBERT:
                    x, y = sbx * 4 + dx, sby * 4 + dy
                    if x >= bw or y >= bh:
                        continue
                    sb_of[(pli, (x, y))] = status
                    if status == 1:
                        partial_positions.append((pli, (x, y)))
    flag_bits = (_decode_short_bit_runs(r, len(partial_positions))
                 if partial_positions else [])
    it = iter(flag_bits)
    coded: dict = {}
    for pli in range(3):
        bw, bh = planes[pli]
        for y in range(bh):
            for x in range(bw):
                coded[(pli, (x, y))] = False
    for pos, status in sb_of.items():
        if status == 2:
            coded[pos] = True
    for pos in partial_positions:
        coded[pos] = bool(next(it))
    return coded


def _mb_order(frame_w: int, frame_h: int) -> list:
    """Macroblock traversal (§7.4/§7.5): superblock raster with the
    2x2 Hilbert sub-order → ``[(mx, my, mb_blocks)]`` where
    ``mb_blocks`` lists the MB's 4 luma blocks in raster order then
    its Cb and Cr blocks (4:2:0)."""
    mbw, mbh = frame_w // 16, frame_h // 16
    out = []
    for sby in range((mbh + 1) // 2):
        for sbx in range((mbw + 1) // 2):
            for dx, dy in ((0, 0), (1, 0), (1, 1), (0, 1)):
                mx, my = sbx * 2 + dx, sby * 2 + dy
                if mx >= mbw or my >= mbh:
                    continue
                mb_blocks = [
                    (0, (2 * mx, 2 * my)), (0, (2 * mx + 1, 2 * my)),
                    (0, (2 * mx, 2 * my + 1)),
                    (0, (2 * mx + 1, 2 * my + 1)),
                    (1, (mx, my)), (2, (mx, my)),
                ]
                out.append((mx, my, mb_blocks))
    return out


def _decode_mb_modes(r: _Br, coded: dict, mb_order: list) -> dict:
    """§7.4 macroblock modes for every coded block: scheme 0 (custom
    rank alphabet from the stream), schemes 1-6 (the fixed alphabets,
    unary rank code), and scheme 7 (fixed 3-bit).  A macroblock takes
    a mode when any of its blocks is coded."""
    scheme = r.read(3)
    if scheme == 0:
        alphabet = [0] * 8
        for mode in range(8):
            alphabet[r.read(3)] = mode
    elif scheme == 7:
        alphabet = None
    else:
        alphabet = _MODE_ALPHABETS[scheme - 1]
    modes: dict = {}
    for _mx, _my, mb_blocks in mb_order:
        if not any(coded.get(b, False) for b in mb_blocks):
            continue
        if alphabet is None:
            mode = r.read(3)
        else:
            mode = alphabet[_mode_vlc(r)]
        for b in mb_blocks:
            if coded.get(b, False):
                modes[b] = mode
    # any coded block without a mode (shouldn't happen) → INTRA
    for b, c in coded.items():
        if c and b not in modes:
            modes[b] = MODE_INTRA
    return modes


def _loop_filter(
    out_planes: list[np.ndarray], flimit: int,
    planes: list[tuple[int, int]], coded: dict | None = None,
) -> None:
    """§7.10 loop filter over CODED block edges (every edge on an
    intra frame, where ``coded`` is None), in the spec's traversal:
    for each coded block in raster order within each plane, filter
    its left edge, then its top edge, then the right/bottom edges
    whose neighbor exists but is NOT coded.  The traversal order
    matters — both passes of an edge-pair touch shared corner
    pixels, and each edge application clamps to 0..255 before the
    next reads it, matching reference decoders.  The filter response
    is zero when the second difference is zero, so flat frames pass
    through untouched."""
    if flimit == 0:
        return
    for pli in range(3):
        p = out_planes[pli].astype(np.int32)
        bw, bh = planes[pli]

        def is_coded(x, y):
            return coded is None or coded[(pli, (x, y))]

        for y in range(bh):
            rs = slice(y * 8, y * 8 + 8)
            for x in range(bw):
                if not is_coded(x, y):
                    continue
                cs = slice(x * 8, x * 8 + 8)
                if x > 0:
                    _filter_edge(p[rs], flimit, x * 8, axis=1)
                if y > 0:
                    _filter_edge(p[:, cs], flimit, y * 8, axis=0)
                if x + 1 < bw and not is_coded(x + 1, y):
                    _filter_edge(p[rs], flimit, (x + 1) * 8, axis=1)
                if y + 1 < bh and not is_coded(x, y + 1):
                    _filter_edge(p[:, cs], flimit, (y + 1) * 8, axis=0)
        out_planes[pli][:] = p.astype(np.uint8)


def _filter_edge(p: np.ndarray, flimit: int, c: int, axis: int) -> None:
    if axis == 1:
        s0, s1, s2, s3 = p[:, c - 2], p[:, c - 1], p[:, c], p[:, c + 1]
    else:
        s0, s1, s2, s3 = p[c - 2, :], p[c - 1, :], p[c, :], p[c + 1, :]
    f = (s0 - 3 * s1 + 3 * s2 - s3 + 4) >> 3
    mag = np.abs(f)
    # spec's piecewise ramp: full response under FLIMIT, tapering to
    # zero by 2*FLIMIT
    bounded = np.sign(f) * np.maximum(
        0, np.minimum(mag, 2 * flimit - mag)
    )
    # reference decoders store clamped bytes per edge application, so
    # later edges read the clamped values
    s1 += bounded
    s2 -= bounded
    np.clip(s1, 0, 255, out=s1)
    np.clip(s2, 0, 255, out=s2)


# ---------------------------------------------------------------------------
# Ogg carriage
# ---------------------------------------------------------------------------


def decode_ogg_theora(data: bytes) -> dict:
    """Ogg Theora stream → {width, height, frames: [(Y, Cb, Cr)]}.

    Keyframes decode fully and become the golden reference; inter
    frames decode through the NO_MV subset against the prior and
    golden frames (r13)."""
    from .rawogg import _packets

    packets, _info = _packets(data)
    if len(packets) > MAX_PACKETS:
        raise ValueError("theora: packet count over the cap")
    ident = setup = None
    frames = []
    w = h = 0
    prev = golden = None
    for _serial, pkt in packets:
        if pkt[:7] == b"\x80theora":
            w = int.from_bytes(pkt[10:12], "big") * 16
            h = int.from_bytes(pkt[12:14], "big") * 16
            ident = pkt
        elif pkt[:7] == b"\x82theora":
            setup = parse_setup(pkt)
        elif pkt[:7] == b"\x81theora" or not pkt:
            continue
        elif ident is not None and setup is not None:
            is_inter = bool(pkt[0] & 0x40)
            planes = decode_frame(
                pkt, setup, w, h,
                refs=(prev, golden) if is_inter else None,
            )
            frames.append(planes)
            prev = planes
            if not is_inter:
                golden = planes
    if ident is None or setup is None:
        raise ValueError("theora: stream lacks ident or setup header")
    return {"width": w, "height": h, "frames": frames}


# ---------------------------------------------------------------------------
# fixture writers
# ---------------------------------------------------------------------------


def _full_tree(depth: int = 5):
    """Perfect 32-leaf tree: token i at codeword i (5 bits)."""

    def build(prefix: int, d: int):
        if d == depth:
            return prefix
        return (build(prefix << 1, d + 1), build((prefix << 1) | 1, d + 1))

    return build(0, 0)


def build_setup_packet(
    *, dcscale: int = 16, acscale: int = 16, lflim: int = 4
) -> bytes:
    """A minimal valid setup header: one all-100 base matrix (so the
    computed quantizer is exactly ``4 * scale``), a single 0..63
    quant range, and 80 perfect 32-leaf Huffman trees (token i =
    codeword i)."""
    w = _Bw()
    w.write(3, 3)  # loop filter values are 3-bit
    for _ in range(64):
        w.write(lflim, 3)
    w.write(9 - 1, 4)  # AC scales in 9 bits
    for _ in range(64):
        w.write(acscale, 9)
    w.write(9 - 1, 4)
    for _ in range(64):
        w.write(dcscale, 9)
    w.write(0, 9)  # NBMS - 1 = 0
    for _ in range(64):
        w.write(100, 8)
    # quant ranges: qti 0 / pli 0 is implicit NEWQR=1
    first = True
    for _qti in range(2):
        for _pli in range(3):
            if not first:
                w.write(1, 1)  # NEWQR = 1 (define fresh)
            first = False
            # NBMS=1 → ilog(0)=0 bits for bmi reads; one range 0..63
            w.write(62, ilog(62))  # QRSIZES[0] - 1 = 62 → size 63
    tree = _full_tree()
    for _ in range(80):
        _write_tree(w, tree)
    return b"\x82theora" + w.bytes()


def _write_token(w: _Bw, token: int, extra: int, extra_bits: int) -> None:
    w.write(token, 5)  # perfect tree: codeword == token value
    if extra_bits:
        w.write(extra, extra_bits)


def _value_token(w: _Bw, v: int) -> None:
    """Emit the DCT value-token family for v != 0 (|v| <= 580)."""
    sign = 1 if v < 0 else 0
    m = abs(v)
    if m == 1:
        _write_token(w, 9 + sign, 0, 0)
    elif m == 2:
        _write_token(w, 11 + sign, 0, 0)
    elif m <= 6:
        _write_token(w, 10 + m, sign, 1)
    elif m <= 8:
        _write_token(w, 17, (sign << 1) | (m - 7), 2)
    elif m <= 12:
        _write_token(w, 18, (sign << 2) | (m - 9), 3)
    elif m <= 20:
        _write_token(w, 19, (sign << 3) | (m - 13), 4)
    elif m <= 36:
        _write_token(w, 20, (sign << 4) | (m - 21), 5)
    elif m <= 68:
        _write_token(w, 21, (sign << 5) | (m - 37), 6)
    elif m <= 580:
        _write_token(w, 22, (sign << 9) | (m - 69), 10)
    else:
        raise ValueError("theora fixture: |value| over 580")


def encode_flat_frame(
    frame_w: int, frame_h: int, dcs: tuple[int, int, int],
    *, qi: int = 40, eob_sentinel: bool = False,
    second_qi: int | None = None, qi_stride: int = 7,
) -> bytes:
    """One intra frame whose planes are flat: the first block of each
    plane carries a DC value token (differenced against the running
    last-DC predictor), every other block ends via EOB runs — the
    12-bit explicit run, or the run-0 "all remaining" sentinel for
    the final stretch when ``eob_sentinel``.

    ``second_qi`` makes it a two-qi frame: blocks alternate between
    the qi indices every ``qi_stride`` blocks of coded order (§7.4
    run-length bit vector).  On a flat frame the per-block qi only
    selects the AC quantizer, so the pixels are invariant — but any
    run-decode desync corrupts the following token stream, which is
    exactly what the value-level oracle pins."""
    w = _Bw()
    w.write(0, 1)  # frame packet
    w.write(0, 1)  # intra
    w.write(qi, 6)
    counts = [bw * bh for bw, bh in
              (plane_dims(frame_w, frame_h, pli) for pli in range(3))]
    if second_qi is not None:
        w.write(1, 1)
        w.write(second_qi, 6)
        w.write(0, 1)  # two qis
    else:
        w.write(0, 1)  # one qi
    w.write(0, 3)  # reserved
    if second_qi is not None:
        total = sum(counts)
        _encode_bit_runs(
            w, [(i // qi_stride) % 2 for i in range(total)]
        )
    w.write(0, 4)  # HTIL (DC)
    w.write(0, 4)  # HTIC (DC)
    deltas = (dcs[0], dcs[1] - dcs[0], dcs[2] - dcs[1])
    for pli in range(3):
        if deltas[pli] == 0:
            raise ValueError(
                "theora fixture: zero DC delta is not token-encodable"
            )
        _value_token(w, deltas[pli])
        run = counts[pli] - 1
        last_plane = pli == 2
        while run > 0:
            if last_plane and eob_sentinel:
                _write_token(w, 6, 0, 12)  # all-remaining sentinel
                run = 0
            elif run <= 3:
                _write_token(w, run - 1, 0, 0)
                run = 0
            else:
                chunk = min(run, 4095)
                _write_token(w, 6, chunk, 12)
                run -= chunk
    # ti = 1: AC table select (read unconditionally), then one EOB
    # run of 3 closing the three DC-carrying blocks (their TIS sits
    # at 1).  In sentinel mode the run-0 token already ended ALL
    # remaining blocks, so nothing follows the table ids.
    w.write(0, 4)
    w.write(0, 4)
    if not eob_sentinel:
        _write_token(w, 2, 0, 0)  # EOB run of 3
    return w.bytes()


def _write_mode_rank(w: _Bw, rank: int) -> None:
    """Unary rank code inverse of :func:`_mode_vlc`."""
    if rank < 7:
        w.write((1 << rank) - 1, rank)  # rank ones
        w.write(0, 1)
    else:
        w.write(0x7F, 7)


def encode_block_dc_frame(
    frame_w: int, frame_h: int, y_dcs, cb_dc: int, cr_dc: int,
    *, qi: int = 40,
) -> bytes:
    """Intra frame whose Y blocks hit PER-BLOCK quantized-DC targets
    (``y_dcs``: ``(x, y) → dc`` or a callable) while chroma stays
    flat — the non-flat reference the MC oracle needs.  The writer
    runs the §7.9.2 prediction forward over the target map to derive
    each block's delta token (the same arithmetic the decoder inverts;
    dc_predict itself is pinned by independent hand vectors)."""
    w = _Bw()
    w.write(0, 1)  # frame packet
    w.write(0, 1)  # intra
    w.write(qi, 6)
    w.write(0, 1)  # one qi
    w.write(0, 3)  # reserved
    planes = [plane_dims(frame_w, frame_h, pli) for pli in range(3)]
    targets: list[dict] = []
    for pli in range(3):
        bw, bh = planes[pli]
        t = {}
        for y in range(bh):
            for x in range(bw):
                if pli == 0:
                    t[(x, y)] = (y_dcs((x, y)) if callable(y_dcs)
                                 else y_dcs[(x, y)])
                else:
                    t[(x, y)] = cb_dc if pli == 1 else cr_dc
        targets.append(t)
    # forward §7.9.2 over the TARGETS (raster per plane, one last-DC
    # across planes — every block intra and coded)
    deltas: list[dict] = [{}, {}, {}]
    last_dc = 0
    for pli in range(3):
        bw, bh = planes[pli]
        t = targets[pli]
        for y in range(bh):
            for x in range(bw):
                mask = ((1 if x > 0 else 0)
                        | (2 if x > 0 and y > 0 else 0)
                        | (4 if y > 0 else 0)
                        | (8 if x + 1 < bw and y > 0 else 0))
                pred = dc_predict(
                    mask,
                    t.get((x - 1, y), 0), t.get((x - 1, y - 1), 0),
                    t.get((x, y - 1), 0), t.get((x + 1, y - 1), 0),
                    last_dc,
                )
                deltas[pli][(x, y)] = t[(x, y)] - pred
                last_dc = t[(x, y)]
    # ti = 0 in coded order: a value token where the delta is nonzero,
    # EOB runs over stretches whose prediction already hits the target
    # (their DC coefficient stays 0 and the predictor supplies it)
    w.write(0, 4)  # HTIL
    w.write(0, 4)  # HTIC
    seq = [deltas[pli][xy] for pli in range(3)
           for xy in coded_order(*planes[pli])]
    i = 0
    while i < len(seq):
        if seq[i] != 0:
            _value_token(w, seq[i])
            i += 1
            continue
        run = 1
        while i + run < len(seq) and seq[i + run] == 0:
            run += 1
        i += run
        while run > 0:
            if run <= 3:
                _write_token(w, run - 1, 0, 0)
                run = 0
            elif run <= 7:
                _write_token(w, 3, run - 4, 2)
                run = 0
            elif run <= 15:
                _write_token(w, 4, run - 8, 3)
                run = 0
            elif run <= 31:
                _write_token(w, 5, run - 16, 4)
                run = 0
            else:
                chunk = min(run, 4095)
                _write_token(w, 6, chunk, 12)
                run -= chunk
    # ti = 1: table ids (read unconditionally), then the all-remaining
    # EOB sentinel closes the value-token blocks — omitted when every
    # block already ended through a ti=0 EOB run
    w.write(0, 4)
    w.write(0, 4)
    if any(d != 0 for d in seq):
        _write_token(w, 6, 0, 12)
    return w.bytes()


def encode_inter_frame(
    frame_w: int, frame_h: int, *,
    mode: int = MODE_INTER_NO_MV,
    dcs: tuple[int, int, int] | None = None,
    coverage: str = "all", qi: int = 40, mode_scheme: int = 0,
    mb_script: list | None = None, mv_fixed: bool = False,
    second_qi: int | None = None, qi_stride: int = 7,
) -> bytes:
    """One inter frame.  ``coverage``: ``all`` (every block coded via
    fully-coded superblocks), ``none`` (pure carry-forward), or
    ``partial`` (every superblock partial, blocks alternating
    coded/uncoded per 7-block short runs).  ``dcs`` adds a flat DC
    residual per plane (requires ``all``); None leaves residuals
    zero.  ``mode`` applies to every coded macroblock via the chosen
    mode scheme (0 = custom alphabet, 1-6 = the fixed alphabets,
    7 = raw 3-bit) — or pass ``mb_script``, a list cycled over coded
    macroblocks in coded order: entries ``(mode, None)``,
    ``(mode, (mvx, mvy))`` for INTER_MV/GOLDEN_MV, or
    ``(MODE_INTER_MV_FOUR, [mv0..mv3])`` with one vector per coded
    luma block in raster order.  ``mv_fixed`` selects the 6-bit fixed
    MV component code instead of the VLC.  ``second_qi`` makes it a
    two-qi frame (full coverage only): the §7.4 per-block run vector
    sits between the motion vectors and the token stream, so a desync
    there corrupts everything after."""
    if dcs is not None and coverage != "all":
        raise ValueError("theora fixture: DC residuals need full coverage")
    if second_qi is not None and coverage != "all":
        raise ValueError(
            "theora fixture: two-qi inter frames need full coverage"
        )
    w = _Bw()
    w.write(0, 1)  # frame packet
    w.write(1, 1)  # inter
    w.write(qi, 6)
    if second_qi is not None:
        w.write(1, 1)
        w.write(second_qi, 6)
        w.write(0, 1)  # two qis (no reserved bits on inter frames)
    else:
        w.write(0, 1)  # one qi
    planes = [plane_dims(frame_w, frame_h, pli) for pli in range(3)]
    sb_shapes = [((bw + 3) // 4, (bh + 3) // 4) for bw, bh in planes]
    n_sbs = sum(sw * sh for sw, sh in sb_shapes)
    if coverage == "all":
        _encode_bit_runs(w, [0] * n_sbs)   # no partial superblocks
        _encode_bit_runs(w, [1] * n_sbs)   # every superblock full
    elif coverage == "none":
        _encode_bit_runs(w, [0] * n_sbs)
        _encode_bit_runs(w, [0] * n_sbs)
    else:
        _encode_bit_runs(w, [1] * n_sbs)   # every superblock partial
        # block flags alternate in 7-long runs over coded order
        n_blocks = sum(bw * bh for bw, bh in planes)
        _encode_short_bit_runs(
            w, [(i // 7) % 2 for i in range(n_blocks)]
        )
    # decoder's view of per-block coded flags (to find coded MBs)
    if coverage == "all":
        coded_flags = None
    elif coverage == "none":
        coded_flags = {}
    else:
        n_blocks = sum(bw * bh for bw, bh in planes)
        bits = [(i // 7) % 2 for i in range(n_blocks)]
        it = iter(bits)
        coded_flags = {}
        for pli in range(3):
            bw, bh = planes[pli]
            sbw, sbh = sb_shapes[pli]
            for sby in range(sbh):
                for sbx in range(sbw):
                    for dx, dy in HILBERT:
                        x, y = sbx * 4 + dx, sby * 4 + dy
                        if x < bw and y < bh:
                            coded_flags[(pli, (x, y))] = bool(next(it))

    def is_block_coded(b):
        return True if coded_flags is None else coded_flags.get(b, False)

    coded_mbs = []  # (mb_blocks, [coded luma flags])
    for _mx, _my, mb_blocks in _mb_order(frame_w, frame_h):
        if any(is_block_coded(b) for b in mb_blocks):
            coded_mbs.append(
                (mb_blocks, [is_block_coded(b) for b in mb_blocks[:4]])
            )
    script = mb_script or [(mode, None)]
    assigned = [script[i % len(script)] for i in range(len(coded_mbs))]
    # macroblock modes
    w.write(mode_scheme, 3)
    if mode_scheme == 0:
        ranks = [0] * 8
        # rank modes by first use in the script, everything else after
        used = []
        for m, _mv in assigned:
            if m not in used:
                used.append(m)
        for rank, m in enumerate(used + [m for m in range(8)
                                         if m not in used]):
            ranks[m] = rank
        for m in range(8):
            w.write(ranks[m], 3)
    for m, _mv in assigned:
        if mode_scheme == 7:
            w.write(m, 3)
        elif mode_scheme == 0:
            _write_mode_rank(w, ranks[m])
        else:
            _write_mode_rank(w, _MODE_ALPHABETS[mode_scheme - 1].index(m))
    # §7.5 motion vectors: the coding-mode bit is present on EVERY
    # inter frame; only INTER_MV/GOLDEN_MV/FOUR consume vector bits
    w.write(1 if mv_fixed else 0, 1)
    write_comp = _write_mv_comp_fixed if mv_fixed else _write_mv_comp_vlc
    for (m, mv), (_blocks, luma_coded) in zip(assigned, coded_mbs):
        if m in (MODE_INTER_MV, MODE_GOLDEN_MV):
            if mv is None:
                raise ValueError("theora fixture: MV mode without a vector")
            write_comp(w, mv[0])
            write_comp(w, mv[1])
        elif m == MODE_INTER_MV_FOUR:
            it_mv = iter(mv or [])
            for c in luma_coded:
                if c:
                    vx, vy = next(it_mv)
                    write_comp(w, vx)
                    write_comp(w, vy)
    # §7.4 per-block qi run vector (after the vectors, before tokens)
    if second_qi is not None:
        total_blocks = sum(bw * bh for bw, bh in planes)
        _encode_bit_runs(
            w, [(i // qi_stride) % 2 for i in range(total_blocks)]
        )
    # DCT tokens over coded blocks
    w.write(0, 4)  # HTIL (DC)
    w.write(0, 4)  # HTIC (DC)
    if coverage == "none":
        pass  # no coded blocks: no tokens at ti=0
    elif dcs is None:
        _write_token(w, 6, 0, 12)  # EOB-all: zero residual everywhere
    else:
        counts = [bw * bh for bw, bh in planes]
        deltas = (dcs[0], dcs[1] - dcs[0], dcs[2] - dcs[1])
        for pli in range(3):
            if deltas[pli] == 0:
                raise ValueError(
                    "theora fixture: zero DC delta is not encodable"
                )
            _value_token(w, deltas[pli])
            run = counts[pli] - 1
            while run > 0:
                chunk = min(run, 4095)
                _write_token(w, 6, chunk, 12)
                run -= chunk
    w.write(0, 4)  # AC table selects (read unconditionally)
    w.write(0, 4)
    if coverage == "all" and dcs is not None:
        _write_token(w, 2, 0, 0)  # close the three DC-carrying blocks
    return w.bytes()


def build_theora_ogg(
    frame_w: int, frame_h: int, frames: list[tuple[int, int, int]],
    *, qi: int = 40, eob_sentinel: bool = False,
    second_qi: int | None = None, lflim: int = 4,
) -> bytes:
    """Structurally valid Ogg: ident + comment + setup headers, then
    one frame per entry — a (dcY, dcCb, dcCr) tuple for a flat
    keyframe, a dict with ``block_dcs``/``cb_dc``/``cr_dc`` for a
    per-block-DC keyframe (:func:`encode_block_dc_frame`), or a dict
    of :func:`encode_inter_frame` kwargs for an inter frame.  Granule
    positions carry the keyframe-count / delta split.  ``lflim``
    sets the setup header's loop-filter limit (0 disables the filter
    — the MC oracle's closed forms need unfiltered edges)."""
    from .rawogg import _page

    serial = 0x7E04
    w_mb, h_mb = frame_w // 16, frame_h // 16
    packed = (48 << 10) | (6 << 5)
    ident = (
        b"\x80theora" + bytes([3, 2, 1])
        + w_mb.to_bytes(2, "big") + h_mb.to_bytes(2, "big")
        + frame_w.to_bytes(3, "big") + frame_h.to_bytes(3, "big")
        + bytes([0, 0])
        + (25).to_bytes(4, "big") + (1).to_bytes(4, "big")
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + bytes([0]) + (0).to_bytes(3, "big")
        + packed.to_bytes(2, "big")
    )
    vendor = b"rawdata-fixture"
    comment = (b"\x81theora" + len(vendor).to_bytes(4, "little") + vendor
               + (0).to_bytes(4, "little"))
    setup = build_setup_packet(lflim=lflim)
    out = bytearray()
    out += _page(serial, 0, 0, [ident], 0x02)
    out += _page(serial, 1, 0, [comment, setup], 0)
    kf_count = 0
    delta = 0
    for i, spec in enumerate(frames):
        if isinstance(spec, dict) and "block_dcs" in spec:
            pkt = encode_block_dc_frame(
                frame_w, frame_h, spec["block_dcs"],
                spec.get("cb_dc", 1), spec.get("cr_dc", 1), qi=qi,
            )
            kf_count = i + 1
            delta = 0
        elif isinstance(spec, dict):
            pkt = encode_inter_frame(frame_w, frame_h, qi=qi, **spec)
            delta += 1
        else:
            pkt = encode_flat_frame(frame_w, frame_h, spec, qi=qi,
                                    eob_sentinel=eob_sentinel,
                                    second_qi=second_qi)
            kf_count = i + 1
            delta = 0
        gran = (kf_count << 6) + delta
        flags = 0x04 if i == len(frames) - 1 else 0
        out += _page(serial, 2 + i, gran, [pkt], flags)
    return bytes(out)
