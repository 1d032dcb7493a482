"""VP9 — keyframe header census AND keyframe intra decoding (r15).

Census tier: :func:`parse_keyframe_header` reads the uncompressed
frame header (frame marker, profile bits, sync code ``0x49 0x83
0x42``, color config, 16-bit minus-one sizes — VP9 Bitstream
Specification §6.2), the codec-authoritative dimensions for WebM
``V_VP9`` tracks.

Decode tier (r15): :func:`decode_keyframe` reconstructs profile-0
4:2:0 keyframe PIXELS — boolean-decoded compressed header, recursive
superblock partition walk with spec context arithmetic, keyframe
Y/UV mode coding (incl. sub-8x8 prediction units), all ten intra
predictors, coefficient token decoding, and the inverse WHT
(lossless) / 4x4 DCT with mathematically derived cospi constants.
:func:`build_keyframe` is the exact dual; LOSSLESS fixture streams
reproduce arbitrary input planes bit-for-bit through the decoder.

Inter tier (r16): :func:`decode_gop` / :func:`decode_inter_frame`
decode non-key frames — §6.2 inter header (size-from-ref, single-ref
subset), per-block is-inter / ZEROMV / NEWMV mode walk, an eight-slot
reference bank with per-frame refresh masks (golden-frame semantics),
and BILINEAR eighth-pel motion compensation (the one VP9 subpel
kernel that is a FORMULA — taps ``(128 - 8k, 8k)`` over sixteenths
with per-pass ``(x + 64) >> 7`` rounding — rather than a printed
table; the 8-tap families are header-gated loudly).  The MV code is a
documented synthetic subset (absolute sign + 10-bit magnitude; the
spec's class/ctx MV coder is printed-table surface).
:func:`build_gop` / :func:`build_interframe` are the exact duals;
lossless residual coding reproduces arbitrary targets bit-for-bit,
and pure-skip frames expose the motion-compensation arithmetic
directly (pinned against an independent scalar restatement in
``tests/test_vp9_decode.py``).

Provenance tiers and the synthetic-default-probability conformance
bound are documented at the decode section header below — real-world
V_VP9 streams remain the per-row boundary until the spec's printed
probability tables are externally checked, the blocker class the
round-14 verdict's ask #5 names.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawh264 import _Bits, _BitW

_SYNC = 0x498342

#: VP9 spec color_space enum (3 bits)
COLOR_SPACES = {
    0: "unknown",
    1: "bt601",
    2: "bt709",
    3: "smpte170",
    4: "smpte240",
    5: "bt2020",
    6: "reserved",
    7: "rgb",
}


def parse_keyframe_header(data: bytes) -> dict:
    """First bytes of a VP9 keyframe → profile/bit-depth/color/
    dimensions (render size falling back to the frame size)."""
    if len(data) < 10:
        raise ValueError("vp9: payload shorter than a keyframe header")
    b = _Bits(data)
    if b.u(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = b.u(1) | (b.u(1) << 1)  # low bit first
    if profile == 3 and b.u(1):
        raise ValueError("vp9: reserved profile bit set")
    if b.u(1):  # show_existing_frame
        raise ValueError("vp9: show-existing frame carries no header")
    frame_type = b.u(1)
    show_frame = b.u(1)
    b.u(1)  # error_resilient_mode
    if frame_type != 0:
        raise ValueError(
            "vp9: not a keyframe (inter frames are the documented boundary)"
        )
    if b.u(24) != _SYNC:
        raise ValueError("vp9: bad keyframe sync code")
    # color_config (§6.2.2)
    bit_depth = 8
    if profile >= 2:
        bit_depth = 12 if b.u(1) else 10
    cs = b.u(3)
    if cs != 7:  # not CS_RGB
        color_range = b.u(1)
        if profile in (1, 3):
            ss_x, ss_y = b.u(1), b.u(1)
            if b.u(1):
                raise ValueError("vp9: reserved color bit set")
        else:
            ss_x = ss_y = 1  # profiles 0/2 are 4:2:0
    else:
        if profile in (0, 2):
            raise ValueError("vp9: RGB requires profile 1 or 3")
        color_range = 1
        ss_x = ss_y = 0
        if b.u(1):
            raise ValueError("vp9: reserved color bit set")
    width = b.u(16) + 1
    height = b.u(16) + 1
    render_w, render_h = width, height
    if b.u(1):  # render_and_frame_size_different
        render_w = b.u(16) + 1
        render_h = b.u(16) + 1
    return {
        "profile": profile,
        "bit_depth": bit_depth,
        "color_space": COLOR_SPACES[cs],
        "color_range": "full" if color_range else "studio",
        "subsampling": f"{ss_x}{ss_y}",
        "show_frame": bool(show_frame),
        "width": width,
        "height": height,
        "render_width": render_w,
        "render_height": render_h,
    }


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_keyframe_header(
    *,
    width: int,
    height: int,
    profile: int = 0,
    bit_depth: int = 8,
    color_space: int = 2,
    render: tuple[int, int] | None = None,
) -> bytes:
    """Encode a VP9 keyframe uncompressed header (plus a little filler
    standing in for the compressed data that would follow).  Uses the
    shared MSB-first writer without the RBSP stop bit — VP9 headers
    are plain zero-padded."""
    w = _BitW()
    w.u(2, 2)  # frame_marker
    w.u(profile & 1, 1)
    w.u(profile >> 1, 1)
    if profile == 3:
        w.u(0, 1)
    w.u(0, 1)  # show_existing_frame
    w.u(0, 1)  # frame_type = KEY
    w.u(1, 1)  # show_frame
    w.u(0, 1)  # error_resilient
    w.u(_SYNC, 24)
    if profile >= 2:
        w.u(1 if bit_depth == 12 else 0, 1)
    w.u(color_space, 3)
    if color_space != 7:
        w.u(0, 1)  # studio range
        if profile in (1, 3):
            w.u(0, 1)  # ss_x = 0 (4:4:4 family in profiles 1/3)
            w.u(0, 1)
            w.u(0, 1)
    else:
        w.u(0, 1)  # reserved
    w.u(width - 1, 16)
    w.u(height - 1, 16)
    if render is not None:
        w.u(1, 1)
        w.u(render[0] - 1, 16)
        w.u(render[1] - 1, 16)
    else:
        w.u(0, 1)
    return w.bytes(stop_bit=False) + b"\x00" * 8


# ===========================================================================
# Keyframe intra decoding (r15)
# ===========================================================================
#
# Scope and provenance tiers (the BZZ discipline, sources/bzz.py):
#
# - REAL (conformance-grade, derivable or high-confidence spec
#   structure): the boolean arithmetic coder (identical to VP8's
#   RFC 6386 coder, reused from .rawvp8 with VP9's leading marker
#   bit), the uncompressed-header syntax, superblock partition
#   semantics and context arithmetic, the intra predictors (all ten
#   modes, exact spec arithmetic incl. 127/129 unavailable-edge
#   fills), the inverse WHT (lossless) and the inverse DCT butterflies
#   whose cospi constants are DERIVED (round(16384·cos(kπ/64))), the
#   token categories and their extra-bit probabilities (inherited
#   verbatim from VP8), and 4:2:0 plane reconstruction.
# - SYNTHETIC, marked (the spec's large printed default-probability
#   tables could not be recalled to transcription confidence offline):
#   kf Y/UV mode probabilities, partition probabilities, skip
#   probabilities, coefficient probabilities + band maps + scan
#   orders + the pareto extension table, and the dc/ac qlookup
#   curves.  Encoder and decoder share them, so in-repo fixture
#   streams decode VALUE-EXACTLY (lossless mode reproduces arbitrary
#   input pixels bit-for-bit); REAL-WORLD WebM V_VP9 keyframes remain
#   the documented per-row boundary until those tables are
#   spec-checked externally — exactly the blocker class the round-14
#   verdict's ask #5 names.
#
# Out of scope, loud: profiles 1-3, 10/12-bit, segmentation, multiple
# tiles, TX_MODE_SELECT, in-stream probability updates, the in-loop
# filter (fixtures code filter level 0), compound prediction /
# per-sub-8x8 vectors / the 8-tap interpolation families (the inter
# tier codes single-ref BILINEAR at >=8x8; sub-8 blocks stay intra).

import numpy as np

from .rawvp8 import BoolDecoder, BoolEncoder

# ---------------------------------------------------------------- tables

#: intra prediction modes
(DC_PRED, V_PRED, H_PRED, D45_PRED, D135_PRED, D117_PRED, D153_PRED,
 D207_PRED, D63_PRED, TM_PRED) = range(10)

#: intra-mode tree (spec shape, medium confidence; shared both sides)
_MODE_TREE = [
    -DC_PRED, 2, -TM_PRED, 4, -V_PRED, 6, 8, 12, -H_PRED, 10,
    -D135_PRED, -D117_PRED, -D45_PRED, 14, -D63_PRED, 16,
    -D153_PRED, -D207_PRED,
]

#: partition tree: NONE / HORZ / VERT / SPLIT
_PARTITION_TREE = [-0, 2, -1, 4, -2, -3]

# --- SYNTHETIC probability tables (see provenance header) ----------------
_KF_Y_MODE_PROBS = [
    [[137, 30, 42, 148, 151, 207, 70, 52, 91]] * 10 for _ in range(10)
]
_KF_UV_MODE_PROBS = [[120, 7, 76, 176, 208, 126, 28, 54, 103]] * 10
_PARTITION_PROBS = [
    [158, 97, 94], [93, 24, 99], [85, 119, 36], [34, 36, 34],
    [150, 40, 39], [78, 12, 26], [67, 33, 11], [24, 7, 5],
    [174, 35, 49], [68, 11, 27], [57, 15, 9], [12, 3, 3],
    [140, 23, 18], [12, 30, 10], [52, 10, 27], [1, 1, 1],
]
_SKIP_PROBS = [192, 128, 64]
# inter-frame mode coding (r16; synthetic-subset like the kf tables —
# encoder and decoder share them, real-world streams are header-gated)
_IS_INTER_PROBS = [200, 128, 56]  # ctx = above.inter + left.inter
_NEWMV_PROB = 160                 # bit 0 = ZEROMV, 1 = NEWMV
_MV_BITS = 10                     # |component| < 1024 eighth-pel
# per-block single-ref selection tree (LAST / GOLDEN / ALTREF):
# bit1 0 -> LAST; else bit2 0 -> GOLDEN, 1 -> ALTREF
_REF_P1 = 140
_REF_P2 = 128
LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME = 0, 1, 2


def _synth_coef_probs(band: int, ctx: int) -> tuple:
    """(more, not-zero, not-one) probabilities — a smooth synthetic
    field over (band, ctx) standing in for the spec's printed
    defaults."""
    more = max(16, 224 - 34 * band - 10 * ctx)
    nz = max(24, 160 - 20 * band - 16 * ctx)
    none = max(32, 150 - 12 * band - 8 * ctx)
    return (more, nz, none)


def _synth_pareto(p: int) -> list:
    """8 probabilities for the >ONE token extension, keyed off the
    not-one probability the way the spec's pareto table is."""
    return [max(1, min(255, (p * w) >> 8)) for w in
            (230, 200, 170, 150, 140, 135, 130, 128)]


def _zigzag_scan(n: int) -> list:
    """Classic zigzag over an n×n block (synthetic stand-in for the
    spec's printed scan tables; shared by encoder and decoder)."""
    order = sorted(range(n * n),
                   key=lambda i: (i // n + i % n,
                                  (i // n) if ((i // n + i % n) & 1)
                                  else (i % n)))
    return order


_SCAN = {4: _zigzag_scan(4), 8: _zigzag_scan(8), 16: _zigzag_scan(16),
         32: _zigzag_scan(32)}


def _band_of(pos_in_scan: int) -> int:
    """Synthetic coefficient-band map (6 bands)."""
    return min(5, (0, 1, 2, 2, 3, 3, 3, 3)[pos_in_scan]
               if pos_in_scan < 8 else (4 if pos_in_scan < 16 else 5))


def _qlookup(idx: int) -> tuple:
    """Synthetic (dc, ac) dequantizer curve; index 0 is the spec's
    lossless point (handled separately via the WHT)."""
    idx = max(0, min(255, idx))
    ac = 4 + idx * 5
    dc = max(4, (ac * 9) // 10)
    return dc, ac

#: token categories: (base value, number of extra bits).  The extra-bit
#: probabilities are VP8's Pcat constants, inherited by VP9 (REAL tier).
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 254, 252, 249, 243, 230, 196, 177, 153, 140, 133, 130,
     129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

# ---------------------------------------------------------------- blocks

#: block sizes by index: (width, height) in pixels
_BLOCK_SIZES = [
    (4, 4), (4, 8), (8, 4), (8, 8), (8, 16), (16, 8), (16, 16),
    (16, 32), (32, 16), (32, 32), (32, 64), (64, 32), (64, 64),
]
_BS_8X8, _BS_64X64 = 3, 12


def _bs_index(w: int, h: int) -> int:
    return _BLOCK_SIZES.index((w, h))


def _subsize(bsize: int, partition: int) -> int:
    w, h = _BLOCK_SIZES[bsize]
    if partition == 0:
        return bsize
    if partition == 1:  # HORZ
        return _bs_index(w, h // 2)
    if partition == 2:  # VERT
        return _bs_index(w // 2, h)
    return _bs_index(w // 2, h // 2)


# ---------------------------------------------------------------- DCT/WHT


def _dct_round(x):
    return (x + (1 << 13)) >> 14  # DCT_CONST_BITS = 14


def _cospi(k: int) -> int:
    """round(16384 · cos(kπ/64)) — the VP9 transform constants,
    mathematically derived rather than transcribed."""
    import math

    return int(round(16384 * math.cos(k * math.pi / 64)))


def _iwht4_1d(a1, c1, d1, b1):
    a1 = a1 + c1
    d1 = d1 - b1
    e1 = (a1 - d1) >> 1
    b1 = e1 - b1
    c1 = e1 - c1
    a1 = a1 - b1
    d1 = d1 + c1
    return a1, b1, c1, d1


def iwht4x4(coeff: np.ndarray) -> np.ndarray:
    """VP9 lossless inverse Walsh-Hadamard (iwht4x4_16): input int32
    (4,4) coefficients (forward output is pre-scaled ×4), output (4,4)
    int32 residual."""
    ip = coeff.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):  # rows, inputs pre-shifted >> 2
        a, b, c, d = _iwht4_1d(ip[i, 0] >> 2, ip[i, 1] >> 2,
                               ip[i, 2] >> 2, ip[i, 3] >> 2)
        tmp[i] = (a, b, c, d)
    out = np.empty((4, 4), np.int64)
    for j in range(4):  # columns, no shift
        a, b, c, d = _iwht4_1d(tmp[0, j], tmp[1, j], tmp[2, j],
                               tmp[3, j])
        out[:, j] = (a, b, c, d)
    return out.astype(np.int32)


def fwht4x4(residual: np.ndarray) -> np.ndarray:
    """Forward WHT (vp9 fwht4x4 shape): exact integer dual of
    :func:`iwht4x4` — round-trip identity is pinned by tests."""
    ip = residual.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for j in range(4):  # columns first
        a1, b1, c1, d1 = ip[0, j], ip[1, j], ip[2, j], ip[3, j]
        a1 += b1
        d1 = d1 - c1
        e1 = (a1 - d1) >> 1
        b1 = e1 - b1
        c1 = e1 - c1
        a1 -= c1
        d1 += b1
        tmp[0, j], tmp[1, j], tmp[2, j], tmp[3, j] = a1, c1, d1, b1
    out = np.empty((4, 4), np.int64)
    for i in range(4):  # rows
        a1, b1, c1, d1 = tmp[i, 0], tmp[i, 1], tmp[i, 2], tmp[i, 3]
        a1 += b1
        d1 = d1 - c1
        e1 = (a1 - d1) >> 1
        b1 = e1 - b1
        c1 = e1 - c1
        a1 -= c1
        d1 += b1
        out[i] = (a1 << 2, (c1) << 2, (d1) << 2, (b1) << 2)
    return out.astype(np.int32)


def idct4_1d(i0, i1, i2, i3):
    """VP9 idct4 butterfly (cospi constants derived)."""
    c16, c8, c24 = _cospi(16), _cospi(8), _cospi(24)
    s0 = _dct_round((i0 + i2) * c16)
    s1 = _dct_round((i0 - i2) * c16)
    s2 = _dct_round(i1 * c24 - i3 * c8)
    s3 = _dct_round(i1 * c8 + i3 * c24)
    return s0 + s3, s1 + s2, s1 - s2, s0 - s3


def idct4x4(coeff: np.ndarray) -> np.ndarray:
    """vp9 idct4x4_16: rows then columns, final (x+8)>>4."""
    ip = coeff.astype(np.int64)
    tmp = np.empty((4, 4), np.int64)
    for i in range(4):
        tmp[i] = idct4_1d(*ip[i])
    out = np.empty((4, 4), np.int64)
    for j in range(4):
        col = idct4_1d(*tmp[:, j])
        out[:, j] = [(x + 8) >> 4 for x in col]
    return out.astype(np.int32)


# --- larger inverse transforms (r16 lossy tier) --------------------------
#
# 8x8/16x16/32x32 are evaluated as integer DCT-III matrix products
# with DERIVED constants (round(16384·g·D[k,j]) over the orthonormal
# DCT basis — the same provenance class as the derived cospi
# butterflies; the spec's specific butterfly FACTORIZATION of the same
# linear map is not transcribed, which costs CPU, not correctness
# class).  Final shifts follow the 4x4 pattern (>>5 / >>6 / >>6);
# the per-size gain g makes the net scale land on the fixture
# encoder's forward scale.  Encoder reconstruction mirrors this exact
# integer path, so lossy duals stay bit-deterministic.

#: per-size (gain g, final shift, forward scale 2^shift / g²)
_TX_SCALE = {8: (2, 5, 8.0), 16: (4, 6, 4.0), 32: (4, 6, 4.0)}


def _ortho_dct(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D (rows = basis k)."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    d = np.cos((2 * j + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def _idct_table(n: int) -> np.ndarray:
    g = _TX_SCALE[n][0]
    return np.round(16384.0 * g * _ortho_dct(n)).astype(np.int64)


_IDCT_T = {n: _idct_table(n) for n in (8, 16, 32)}


def idct_n(coeff: np.ndarray) -> np.ndarray:
    """Integer inverse transform for 8/16/32 (rows then columns, one
    _dct_round per 1D pass, final (x + 2^(s-1)) >> s)."""
    n = coeff.shape[0]
    t = _IDCT_T[n]
    shift = _TX_SCALE[n][1]
    half = 1 << (shift - 1)
    ip = coeff.astype(np.int64)
    # rows: out_j = round(sum_k in_k * T[k, j])
    tmp = (ip @ t + (1 << 13)) >> 14
    out = (t.T @ tmp + (1 << 13)) >> 14
    return ((out + half) >> shift).astype(np.int64)


def _inverse_tx(coeff: np.ndarray, txs: int) -> np.ndarray:
    return idct4x4(coeff) if txs == 4 else idct_n(coeff)


def _fdct_n(resid: np.ndarray) -> np.ndarray:
    """Float forward for 8/16/32 matching :func:`idct_n`'s scaling
    (encoder only — the decoder never runs it, and the encoder's
    reconstruction goes through the integer inverse)."""
    n = resid.shape[0]
    d = _ortho_dct(n)
    scale = _TX_SCALE[n][2]
    return (d @ resid.astype(np.float64) @ d.T) * scale


def _forward_tx(resid: np.ndarray, txs: int) -> np.ndarray:
    return _fdct4x4(resid) if txs == 4 else _fdct_n(resid)


# ---------------------------------------------------------------- intra

def _avg2(a, b):
    return (int(a) + int(b) + 1) >> 1


def _avg3(a, b, c):
    return (int(a) + 2 * int(b) + int(c) + 2) >> 2


def predict_intra(mode: int, bs: int, above: np.ndarray | None,
                  left: np.ndarray | None, corner: int) -> np.ndarray:
    """One bs×bs intra prediction (spec §8.5.2 arithmetic; libvpx
    reference loops for the directional fills).  ``above`` carries
    2·bs samples (above-right replicated by the caller when
    unavailable); ``None`` edges apply the 127/129/dc-128 rules."""
    have_above = above is not None
    have_left = left is not None
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(above[:bs].sum()) + int(left.sum())
            dc = (s + bs) >> (bs.bit_length())  # (s + bs) / (2 bs)
        elif have_above:
            dc = (int(above[:bs].sum()) + (bs >> 1)) >> (bs.bit_length() - 1)
        elif have_left:
            dc = (int(left.sum()) + (bs >> 1)) >> (bs.bit_length() - 1)
        else:
            dc = 128
        return np.full((bs, bs), dc, np.int32)
    if above is None:
        above = np.full(2 * bs, 127, np.int32)
        corner = 127
    if left is None:
        left = np.full(bs, 129, np.int32)
        corner = 127 if not have_above else corner
    above = above.astype(np.int32)
    left = left.astype(np.int32)
    out = np.empty((bs, bs), np.int32)
    if mode == V_PRED:
        out[:] = above[:bs]
    elif mode == H_PRED:
        out[:] = left[:, None]
    elif mode == TM_PRED:
        out[:] = np.clip(left[:, None] + above[None, :bs] - corner,
                         0, 255)
    elif mode == D45_PRED:
        for r in range(bs):
            for c in range(bs):
                if r + c + 2 < 2 * bs:
                    out[r, c] = _avg3(above[r + c], above[r + c + 1],
                                      above[r + c + 2])
                else:
                    out[r, c] = above[2 * bs - 1]
    elif mode == D135_PRED:
        # az[i]: i<0 -> left[-i-1], 0 -> corner, >0 -> above[i-1]
        def az(i):
            return left[-i - 1] if i < 0 else (corner if i == 0
                                               else above[i - 1])
        for r in range(bs):
            for c in range(bs):
                d = c - r
                out[r, c] = _avg3(az(d - 1), az(d), az(d + 1))
    elif mode == D117_PRED:
        def az(i):
            return left[-i - 1] if i < 0 else (corner if i == 0
                                               else above[i - 1])
        for c in range(bs):
            out[0, c] = _avg2(az(c), az(c + 1))
            out[1, c] = _avg3(az(c - 1), az(c), az(c + 1))
        for r in range(2, bs):
            out[r, 0] = _avg3(az(2 - r), az(1 - r), az(-r))
            for c in range(1, bs):
                out[r, c] = out[r - 2, c - 1]
    elif mode == D153_PRED:
        def az(i):
            return left[-i - 1] if i < 0 else (corner if i == 0
                                               else above[i - 1])
        for r in range(bs):
            out[r, 0] = _avg2(az(-r), az(-r - 1))
            out[r, 1] = _avg3(az(1 - r), az(-r), az(-r - 1))
        for c in range(2, bs):
            out[0, c] = _avg3(az(c - 1), az(c), az(c + 1))
        for r in range(1, bs):
            for c in range(2, bs):
                out[r, c] = out[r - 1, c - 2]
    elif mode == D207_PRED:
        for r in range(bs):
            out[r, 0] = (_avg2(left[r], left[r + 1]) if r < bs - 1
                         else left[bs - 1])
            if r < bs - 2:
                out[r, 1] = _avg3(left[r], left[r + 1], left[r + 2])
            elif r == bs - 2:
                out[r, 1] = _avg3(left[bs - 2], left[bs - 1],
                                  left[bs - 1])
            else:
                out[r, 1] = left[bs - 1]
        out[bs - 1, 2:] = left[bs - 1]
        for r in range(bs - 2, -1, -1):
            for c in range(2, bs):
                out[r, c] = out[r + 1, c - 2]
    elif mode == D63_PRED:
        for r in range(bs):
            half = r >> 1
            for c in range(bs):
                if r & 1:
                    out[r, c] = _avg3(above[half + c], above[half + c + 1],
                                      above[half + c + 2])
                else:
                    out[r, c] = _avg2(above[half + c], above[half + c + 1])
    else:
        raise ValueError(f"vp9: unknown intra mode {mode}")
    return out


# ---------------------------------------------------------------- frame

# per-4x4 Python token+predict loops: the pixel cap bounds hostile
# CPU (~30 s at 2 Mpx); real-world keyframes are table-gated anyway
MAX_FRAME_PIXELS = 2 << 20


def _fixture_shape(ok: bool, what: str) -> None:
    """Loud gate for the synthetic-table conformance bound (r15
    ADVICE): the default-probability tables this decoder ships are
    synthetic stand-ins, and the boolean decoder carries no internal
    checksum — so any header shape the in-repo fixture writer
    (:func:`build_keyframe`) never emits must raise rather than decode
    real-world bytes to unverifiable pixels."""
    if not ok:
        raise ValueError(
            f"vp9: {what} outside the fixture-writer subset (the "
            "default-probability tables are synthetic; real-world "
            "streams stay a loud per-row boundary)"
        )


def _read_full_header(data: bytes) -> dict:
    """Uncompressed keyframe header INCLUDING the loop-filter, quant,
    segmentation and tile fields the reconstruction needs (§6.2);
    adds the byte offset of the compressed header."""
    hdr = parse_keyframe_header(data)  # validates marker/sync/profile
    if hdr["profile"] != 0:
        raise ValueError("vp9: only profile 0 decodes to pixels")
    b = _Bits(data)
    b.u(2)  # frame marker
    b.u(2)  # profile bits (profile 0: no reserved bit)
    b.u(1)  # show_existing
    b.u(2)  # frame_type, show_frame
    err_res = b.u(1)
    b.u(24)  # sync
    b.u(3)  # color space
    b.u(1)  # color range
    b.u(32)  # frame size
    if b.u(1):
        b.u(32)  # render size
        _fixture_shape(False, "explicit render size")
    if not err_res:
        _fixture_shape(b.u(1) == 0, "refresh_frame_context")
        _fixture_shape(b.u(1) == 1, "frame_parallel off")
    else:
        _fixture_shape(False, "error-resilient mode")
    _fixture_shape(b.u(2) == 0, "frame_context_idx")
    # loop filter
    filter_level = b.u(6)
    _fixture_shape(b.u(3) == 0, "loop-filter sharpness")
    if b.u(1):  # mode_ref_delta_enabled
        _fixture_shape(False, "mode/ref loop-filter deltas")
        if b.u(1):  # update
            for _ in range(4 + 2):
                if b.u(1):
                    b.u(7)  # 6-bit magnitude + sign
    if filter_level != 0:
        raise ValueError(
            "vp9: in-loop filter outside the decode subset "
            "(fixtures code filter level 0)"
        )
    # quantization
    base_q = b.u(8)

    def read_delta():
        if b.u(1):
            mag = b.u(4)
            return -mag if b.u(1) else mag
        return 0

    dq_y_dc = read_delta()
    dq_uv_dc = read_delta()
    dq_uv_ac = read_delta()
    _fixture_shape(dq_y_dc == dq_uv_dc == dq_uv_ac == 0,
                   "non-zero quantizer deltas")
    lossless = base_q == 0 and dq_y_dc == 0 and dq_uv_dc == 0 \
        and dq_uv_ac == 0
    # segmentation
    if b.u(1):
        raise ValueError("vp9: segmentation outside the decode subset")
    # tile info (spec 64/4-wide superblock bounds)
    mi_cols = (hdr["width"] + 7) >> 3
    sb_cols = (mi_cols + 7) >> 3
    min_log2 = 0
    while (sb_cols >> min_log2) > 64:
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> (max_log2 + 1)) >= 4:
        max_log2 += 1
    tile_cols_log2 = min_log2
    while tile_cols_log2 < max_log2:
        if b.u(1):
            tile_cols_log2 += 1
        else:
            break
    tile_rows_log2 = b.u(1)
    if tile_rows_log2:
        tile_rows_log2 += b.u(1)
    if tile_cols_log2 or tile_rows_log2:
        raise ValueError("vp9: multiple tiles outside the decode subset")
    header_size = b.u(16)
    if header_size == 0:
        raise ValueError("vp9: empty compressed header")
    comp_off = (b.pos + 7) >> 3  # byte alignment
    if comp_off + header_size > len(data):
        raise ValueError("vp9: compressed header past end of frame")
    return dict(
        hdr,
        lossless=lossless,
        base_q=base_q,
        dq_y_dc=dq_y_dc,
        dq_uv_dc=dq_uv_dc,
        dq_uv_ac=dq_uv_ac,
        header_size=header_size,
        compressed_offset=comp_off,
    )


def _bool_dec(data: bytes) -> BoolDecoder:
    d = BoolDecoder(data)
    if d.decode(128):
        raise ValueError("vp9: bool-decoder marker bit set")
    return d


class _BoolEnc(BoolEncoder):
    def __init__(self):
        super().__init__()
        self.encode(0, 128)  # marker bit


def _w8(bsize: int) -> int:
    return max(1, _BLOCK_SIZES[bsize][0] >> 3)


def _h8(bsize: int) -> int:
    return max(1, _BLOCK_SIZES[bsize][1] >> 3)


def _part_ctx_value(bsize: int) -> int:
    """(0xF << mi_size_log2) & 0xF — clears the low bits the block
    covers (derived semantics of the partition-context lookup)."""
    k = (_BLOCK_SIZES[bsize][0].bit_length() - 4)  # 8->0,16->1,32->2,64->3
    return (0xF << max(0, k)) & 0xF


class _Frame:
    """Shared state of the keyframe walk, used by both the decoder and
    the fixture encoder (the encoder mirrors every context update so
    probabilities stay in lockstep)."""

    def __init__(self, width: int, height: int, lossless: bool,
                 base_q: int, dq_y_dc: int, dq_uv_dc: int,
                 dq_uv_ac: int, tx_mode: int):
        self.w, self.h = width, height
        self.mi_cols = (width + 7) >> 3
        self.mi_rows = (height + 7) >> 3
        self.lossless = lossless
        self.tx_mode = tx_mode
        pw, ph = self.mi_cols * 8, self.mi_rows * 8
        # planes stored mi-padded; u/v 4:2:0
        self.planes = [np.zeros((ph, pw), np.int32),
                       np.zeros((ph >> 1, pw >> 1), np.int32),
                       np.zeros((ph >> 1, pw >> 1), np.int32)]
        self.plane_written = [np.zeros((ph, pw), bool),
                              np.zeros((ph >> 1, pw >> 1), bool),
                              np.zeros((ph >> 1, pw >> 1), bool)]
        self.above_part = np.zeros(self.mi_cols, np.int32)
        self.left_part = np.zeros(self.mi_rows, np.int32)
        # per-4x4-column/row nonzero contexts, per plane
        self.above_nz = [np.zeros(self.mi_cols * 2, np.int32),
                         np.zeros(self.mi_cols, np.int32),
                         np.zeros(self.mi_cols, np.int32)]
        self.left_nz = [np.zeros(self.mi_rows * 2, np.int32),
                        np.zeros(self.mi_rows, np.int32),
                        np.zeros(self.mi_rows, np.int32)]
        self.skip = np.zeros((self.mi_rows, self.mi_cols), np.int32)
        # per-mi 2x2 sub-modes (single mode replicated for >=8x8)
        self.modes = np.zeros((self.mi_rows * 2, self.mi_cols * 2),
                              np.int32)
        # inter-frame state (r16): per-mi motion vectors (eighth-pel
        # row, col), is-inter flags, and the reference frame's padded
        # planes (set by the GOP walker)
        self.mvs = np.zeros((self.mi_rows, self.mi_cols, 2), np.int32)
        self.inter = np.zeros((self.mi_rows, self.mi_cols), np.int32)
        self.ref_planes = None
        self.ref_list = None  # [LAST, GOLDEN, ALTREF] plane sets
        if lossless:
            self.dq = ((4, 4), (4, 4))
        else:
            ydc, yac = _qlookup(base_q + dq_y_dc)[0], _qlookup(base_q)[1]
            uvdc = _qlookup(base_q + dq_uv_dc)[0]
            uvac = _qlookup(base_q + dq_uv_ac)[1]
            self.dq = ((ydc, yac), (uvdc, uvac))

    def partition_ctx(self, mi_r: int, mi_c: int, bsize: int) -> int:
        bsl = _BLOCK_SIZES[bsize][0].bit_length() - 4
        a = (int(self.above_part[mi_c]) >> bsl) & 1
        lf = (int(self.left_part[mi_r]) >> bsl) & 1
        return (lf * 2 + a) + bsl * 4

    def update_partition_ctx(self, mi_r, mi_c, subsize, bsize):
        v = _part_ctx_value(subsize)
        self.above_part[mi_c : mi_c + _w8(bsize)] = v
        self.left_part[mi_r : mi_r + _h8(bsize)] = v

    def skip_ctx(self, mi_r: int, mi_c: int) -> int:
        a = int(self.skip[mi_r - 1, mi_c]) if mi_r > 0 else 0
        lf = int(self.skip[mi_r, mi_c - 1]) if mi_c > 0 else 0
        return a + lf

    def mode_above(self, mi_r, mi_c, by, bx):
        r2, c2 = mi_r * 2 + by, mi_c * 2 + bx
        return int(self.modes[r2 - 1, c2]) if r2 > 0 else DC_PRED

    def mode_left(self, mi_r, mi_c, by, bx):
        r2, c2 = mi_r * 2 + by, mi_c * 2 + bx
        return int(self.modes[r2, c2 - 1]) if c2 > 0 else DC_PRED

    def tx_size(self, plane: int, bsize: int) -> int:
        """Transform size in pixels for the plane's blocks."""
        if self.lossless:
            return 4
        w, h = _BLOCK_SIZES[bsize]
        if plane > 0:
            w, h = max(4, w >> 1), max(4, h >> 1)
        maxtx = min(32, w, h)
        cap = 4 << min(3, self.tx_mode)  # ONLY_4X4..ALLOW_32X32
        return min(maxtx, cap)

    # ---- per-transform-block predict + reconstruct ----

    def predict_block(self, plane: int, px: int, py: int, n: int,
                      mode: int) -> np.ndarray:
        plane_arr = self.planes[plane]
        written = self.plane_written[plane]
        ph, pw = plane_arr.shape
        have_above = py > 0 and written[py - 1, px]
        have_left = px > 0 and written[py, px - 1]
        above = None
        left = None
        corner = 129
        if have_above:
            above = np.empty(2 * n, np.int32)
            avail = min(2 * n, pw - px)
            # above-right must also have been decoded
            dec = avail
            for i in range(n, avail):
                if not written[py - 1, px + i]:
                    dec = i
                    break
            above[:dec] = plane_arr[py - 1, px : px + dec]
            above[dec:] = above[dec - 1] if dec else 127
            corner = int(plane_arr[py - 1, px - 1]) if px > 0 and \
                written[py - 1, px - 1] else 129
        if have_left:
            left = plane_arr[py : py + n, px - 1].copy()
            if py + n > ph:
                left = np.pad(left, (0, py + n - ph), mode="edge")
        return predict_intra(mode, n, above, left, corner)


# token helpers -------------------------------------------------------------


def _token_of(value: int):
    """abs coefficient value → (token id path info).  Token ids:
    0=ZERO 1=ONE 2=TWO 3=THREE 4=FOUR 5..10=CAT1..6."""
    if value <= 4:
        return value, 0, 0
    for cat in range(5, -1, -1):
        base = _CAT_BASE[cat]
        if value >= base:
            return 5 + cat, value - base, len(_CAT_PROBS[cat])
    raise AssertionError


def _decode_extra(dec: BoolDecoder, cat: int) -> int:
    v = 0
    for p in _CAT_PROBS[cat]:
        v = (v << 1) | dec.decode(p)
    return _CAT_BASE[cat] + v


def _encode_extra(enc: BoolEncoder, cat: int, value: int) -> None:
    rest = value - _CAT_BASE[cat]
    nb = len(_CAT_PROBS[cat])
    for i, p in enumerate(_CAT_PROBS[cat]):
        enc.encode((rest >> (nb - 1 - i)) & 1, p)


def _coef_ctx(cache: np.ndarray, scan: list, c: int, n: int) -> int:
    """Synthetic follow-on coefficient context (shared both sides)."""
    return min(2, int(cache[scan[c - 1]]))


def _decode_tokens(dec: BoolDecoder, n: int, pt: int, dq) -> np.ndarray:
    scan = _SCAN[n]
    maxc = n * n
    coeff = np.zeros((n, n), np.int64)
    cache = np.zeros(maxc, np.int64)
    c = 0
    ctx = pt
    while c < maxc:
        band = _band_of(min(c, 15) if n == 4 else min(c, 15))
        probs = _synth_coef_probs(band, ctx)
        if not dec.decode(probs[0]):  # EOB
            break
        while not dec.decode(probs[1]):  # ZERO token
            cache[scan[c]] = 0
            c += 1
            if c >= maxc:
                return coeff, c
            ctx = _coef_ctx(cache, scan, c, n)
            band = _band_of(min(c, 15))
            probs = _synth_coef_probs(band, ctx)
        if not dec.decode(probs[2]):
            val = 1
        else:
            par = _synth_pareto(probs[2])
            # synthetic extension tree: 2,3,4 then CAT1..6
            if not dec.decode(par[0]):
                val = 2 + dec.decode(par[1])
                if val == 3 and dec.decode(par[2]):
                    val = 4
            else:
                if not dec.decode(par[3]):
                    cat = 0 if not dec.decode(par[4]) else 1
                else:
                    if not dec.decode(par[5]):
                        cat = 2 if not dec.decode(par[6]) else 3
                    else:
                        cat = 4 if not dec.decode(par[7]) else 5
                val = _decode_extra(dec, cat)
        sign = dec.decode(128)
        pos = scan[c]
        q = dq[0] if pos == 0 else dq[1]
        coeff[pos // n, pos % n] = (-val if sign else val) * q
        cache[pos] = min(3, val)
        c += 1
        if c >= maxc:
            break
        ctx = _coef_ctx(cache, scan, c, n)
    return coeff, c


def _encode_tokens(enc: BoolEncoder, n: int, pt: int,
                   qcoef: np.ndarray) -> int:
    """Dual of :func:`_decode_tokens` over QUANTIZED values."""
    scan = _SCAN[n]
    maxc = n * n
    flat = qcoef.reshape(-1)
    cache = np.zeros(maxc, np.int64)
    svals = [int(flat[scan[c]]) for c in range(maxc)]
    eob = 0
    for c in range(maxc):
        if svals[c]:
            eob = c + 1
    c = 0
    ctx = pt
    while c < maxc:
        band = _band_of(min(c, 15))
        probs = _synth_coef_probs(band, ctx)
        if c >= eob:
            enc.encode(0, probs[0])  # EOB
            return eob
        enc.encode(1, probs[0])
        while svals[c] == 0:
            enc.encode(0, probs[1])
            cache[scan[c]] = 0
            c += 1
            ctx = _coef_ctx(cache, scan, c, n)
            band = _band_of(min(c, 15))
            probs = _synth_coef_probs(band, ctx)
        enc.encode(1, probs[1])
        val = abs(svals[c])
        if val == 1:
            enc.encode(0, probs[2])
        else:
            enc.encode(1, probs[2])
            par = _synth_pareto(probs[2])
            if val <= 4:
                enc.encode(0, par[0])
                enc.encode(0 if val == 2 else 1, par[1])
                if val >= 3:
                    enc.encode(0 if val == 3 else 1, par[2])
            else:
                enc.encode(1, par[0])
                tok, _extra, _nb = _token_of(val)
                cat = tok - 5
                if cat <= 1:
                    enc.encode(0, par[3])
                    enc.encode(cat, par[4])
                elif cat <= 3:
                    enc.encode(1, par[3])
                    enc.encode(0, par[5])
                    enc.encode(cat - 2, par[6])
                else:
                    enc.encode(1, par[3])
                    enc.encode(1, par[5])
                    enc.encode(cat - 4, par[7])
                _encode_extra(enc, cat, val)
        enc.encode(1 if svals[c] < 0 else 0, 128)
        cache[scan[c]] = min(3, val)
        c += 1
        if c >= maxc:
            break
        ctx = _coef_ctx(cache, scan, c, n)
    return eob


# ---------------------------------------------------------------- decode


def _plane_geom(fr: "_Frame", plane: int, mi_r: int, mi_c: int,
                bsize: int):
    """(x0, y0, area_w4, area_h4, bound_w4, bound_h4) of the block in
    the plane's 4x4 grid (area covers the full 8x8 MI for sub-8
    partitions; bounds clip to the frame's mi extent)."""
    bw, bh = _BLOCK_SIZES[bsize]
    aw, ah = max(8, bw), max(8, bh)
    if plane > 0:
        x0, y0 = mi_c * 4, mi_r * 4
        aw, ah = max(4, aw >> 1), max(4, ah >> 1)
        pw4 = fr.mi_cols  # uv plane 4x4 columns
        ph4 = fr.mi_rows
    else:
        x0, y0 = mi_c * 8, mi_r * 8
        pw4, ph4 = fr.mi_cols * 2, fr.mi_rows * 2
    aw4, ah4 = aw >> 2, ah >> 2
    bw4 = min(aw4, pw4 - (x0 >> 2))
    bh4 = min(ah4, ph4 - (y0 >> 2))
    return x0, y0, aw4, ah4, bw4, bh4


def _mc_block(fr, plane: int, px: int, py: int, w: int, h: int,
              mv) -> np.ndarray:
    """Motion-compensated prediction for one w×h block at plane
    position (px, py) from ``fr.ref_planes`` (r16 inter tier).

    ``mv`` is the eighth-pel (row, col) luma motion vector.  The
    interpolation is VP9's BILINEAR filter — the one subpel kernel
    that is a FORMULA rather than a printed table (kernel index k in
    sixteenths → taps ``(128 - 8k, 8k)``), applied separably with the
    spec's per-pass ``(x + 64) >> 7`` rounding (FILTER_BITS = 7); the
    fixture writer signals ``interp_filter = BILINEAR`` and the header
    reader gates the 8-tap families loudly.  Chroma planes are
    half-resolution, so the same eighth-pel luma vector lands on a
    sixteenth-pel chroma grid (the spec's 4:2:0 scaling).  Reference
    edges are clamped (border replication)."""
    ref = fr.ref_planes[plane]
    ph, pw = ref.shape
    if plane == 0:
        y16 = py * 16 + int(mv[0]) * 2
        x16 = px * 16 + int(mv[1]) * 2
    else:
        y16 = py * 16 + int(mv[0])
        x16 = px * 16 + int(mv[1])
    iy, fy = y16 >> 4, y16 & 15
    ix, fx = x16 >> 4, x16 & 15
    rows = np.clip(np.arange(iy, iy + h + 1), 0, ph - 1)
    cols = np.clip(np.arange(ix, ix + w + 1), 0, pw - 1)
    patch = ref[np.ix_(rows, cols)].astype(np.int64)
    if fx:
        hp = (patch[:, :w] * (128 - 8 * fx)
              + patch[:, 1 : w + 1] * (8 * fx) + 64) >> 7
    else:
        hp = patch[:, :w]
    if fy:
        out = (hp[:h] * (128 - 8 * fy)
               + hp[1 : h + 1] * (8 * fy) + 64) >> 7
    else:
        out = hp[:h]
    return out.astype(np.int32)


def _recon_block(fr, mi_r, mi_c, bsize, skip, uvmode, coder,
                 decode: bool, src=None, mv=None):
    """Predict + (de)code residual + reconstruct for one block, both
    directions (the encoder mirrors every context update).  ``src``:
    source planes (encoder only).  ``mv``: eighth-pel (row, col)
    motion vector — prediction comes from ``fr.ref_planes`` instead of
    the intra predictors (r16 inter tier).  Returns True when every
    transform block had zero coefficients (the encoder's skip
    answer)."""
    all_zero = True
    pending = [] if not decode else None
    for plane in range(3):
        x0, y0, aw4, ah4, bw4, bh4 = _plane_geom(fr, plane, mi_r, mi_c,
                                                 bsize)
        txs = fr.tx_size(plane, bsize)
        t4 = txs >> 2
        arr = fr.planes[plane]
        written = fr.plane_written[plane]
        dqv = fr.dq[0] if plane == 0 else fr.dq[1]
        for ty in range(0, bh4, t4):
            for tx in range(0, bw4, t4):
                px, py = x0 + tx * 4, y0 + ty * 4
                if mv is not None:
                    pred = _mc_block(fr, plane, px, py, txs, txs, mv)
                else:
                    if plane == 0:
                        mode = int(fr.modes[(py >> 2), (px >> 2)])
                    else:
                        mode = uvmode
                    pred = fr.predict_block(plane, px, py, txs, mode)
                if skip:
                    recon = pred
                    eob = 0
                else:
                    c4 = px >> 2
                    r4 = py >> 2
                    pt = int(
                        fr.above_nz[plane][c4 : c4 + t4].any()
                    ) + int(fr.left_nz[plane][r4 : r4 + t4].any())
                    if decode:
                        coeff, eob = _decode_tokens(coder, txs, pt, dqv)
                        if fr.lossless:
                            res = iwht4x4(coeff)
                        else:
                            res = _inverse_tx(coeff, txs)
                        recon = np.clip(pred + res, 0, 255)
                    else:
                        resid = (src[plane][py : py + txs,
                                            px : px + txs]
                                 .astype(np.int64) - pred)
                        if fr.lossless:
                            qc = fwht4x4(resid) >> 2  # dq 4, exact
                            res = iwht4x4(qc * 4)
                        else:
                            co = _forward_tx(resid, txs)
                            qmat = np.full((txs, txs), dqv[1],
                                           np.int64)
                            qmat[0, 0] = dqv[0]
                            qc = np.round(co / qmat).astype(np.int64)
                            res = _inverse_tx(qc * qmat, txs)
                        eob = int((qc != 0).sum() and (
                            max(i for i in range(txs * txs)
                                if qc.reshape(-1)[_SCAN[txs][i]] != 0)
                            + 1)) if (qc != 0).any() else 0
                        pending.append((plane, txs, pt, qc))
                        recon = np.clip(pred + res, 0, 255)
                    fr.above_nz[plane][c4 : c4 + t4] = 1 if eob else 0
                    fr.left_nz[plane][r4 : r4 + t4] = 1 if eob else 0
                    if eob:
                        all_zero = False
                arr[py : py + txs, px : px + txs] = recon
                written[py : py + txs, px : px + txs] = True
        if skip:
            c4, r4 = x0 >> 2, y0 >> 2
            fr.above_nz[plane][c4 : c4 + bw4] = 0
            fr.left_nz[plane][r4 : r4 + bh4] = 0
    return all_zero, pending


def _inter_ctx(fr, mi_r: int, mi_c: int) -> int:
    a = int(fr.inter[mi_r - 1, mi_c]) if mi_r > 0 else 0
    lf = int(fr.inter[mi_r, mi_c - 1]) if mi_c > 0 else 0
    return a + lf


def _set_inter_grids(fr, mi_r, mi_c, bsize, is_inter: int, mv):
    h8, w8 = _h8(bsize), _w8(bsize)
    fr.inter[mi_r : mi_r + h8, mi_c : mi_c + w8] = is_inter
    if mv is not None:
        fr.mvs[mi_r : mi_r + h8, mi_c : mi_c + w8] = mv
    if is_inter:
        # inter blocks read as DC for the intra neighbor-mode context
        fr.modes[mi_r * 2 : mi_r * 2 + h8 * 2,
                 mi_c * 2 : mi_c * 2 + w8 * 2] = DC_PRED


def _decode_mv(dec) -> tuple[int, int]:
    """Absolute eighth-pel (row, col) vector: per component a sign bit
    then a raw ``_MV_BITS`` magnitude (synthetic-subset MV code — the
    spec's class/ctx MV coder is a printed-table surface; real-world
    streams are header-gated)."""
    out = []
    for _ in range(2):
        sign = dec.decode(128)
        mag = dec.literal(_MV_BITS)
        out.append(-mag if sign else mag)
    return (out[0], out[1])


def _encode_mv(enc, mv) -> None:
    for comp in mv:
        enc.encode(1 if comp < 0 else 0, 128)
        mag = abs(int(comp))
        if mag >= (1 << _MV_BITS):
            raise ValueError("vp9 fixture: mv component out of range")
        enc.literal(mag, _MV_BITS)


def _decode_modes(fr, dec, mi_r, mi_c, bsize, inter_frame=False):
    """Mode info: skip flag, then (keyframes / intra blocks) Y
    (sub-)modes + UV mode, or (inter blocks, r16) the is-inter flag,
    ZEROMV/NEWMV bit and the coded vector.  Sub-8x8 sizes in inter
    frames stay intra by the documented fixture subset (real VP9
    codes per-sub-block vectors there)."""
    skip = dec.decode(_SKIP_PROBS[fr.skip_ctx(mi_r, mi_c)])
    if inter_frame and bsize >= _BS_8X8:
        is_inter = dec.decode(_IS_INTER_PROBS[_inter_ctx(fr, mi_r, mi_c)])
        if is_inter:
            # per-block single-reference selection (r16): the block
            # picks LAST / GOLDEN / ALTREF among the frame header's
            # three slot indices
            if dec.decode(_REF_P1):
                ref = ALTREF_FRAME if dec.decode(_REF_P2) \
                    else GOLDEN_FRAME
            else:
                ref = LAST_FRAME
            fr.ref_planes = fr.ref_list[ref]
            if dec.decode(_NEWMV_PROB):
                mv = _decode_mv(dec)
            else:
                mv = (0, 0)
            _set_inter_grids(fr, mi_r, mi_c, bsize, 1, mv)
            h8, w8 = _h8(bsize), _w8(bsize)
            fr.skip[mi_r : mi_r + h8, mi_c : mi_c + w8] = skip
            return skip, None, mv
    if inter_frame:
        _set_inter_grids(fr, mi_r, mi_c, bsize, 0, None)
    bw, bh = _BLOCK_SIZES[bsize]
    r2, c2 = mi_r * 2, mi_c * 2
    if bsize >= _BS_8X8:
        am = fr.mode_above(mi_r, mi_c, 0, 0)
        lm = fr.mode_left(mi_r, mi_c, 0, 0)
        ymode = dec.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm])
        h2 = max(1, bh >> 3) * 2
        w2 = max(1, bw >> 3) * 2
        fr.modes[r2 : r2 + h2, c2 : c2 + w2] = ymode
    else:
        bw4, bh4 = max(1, bw >> 2), max(1, bh >> 2)
        for idy in range(0, 2, bh4):
            for idx in range(0, 2, bw4):
                am = fr.mode_above(mi_r, mi_c, idy, idx)
                lm = fr.mode_left(mi_r, mi_c, idy, idx)
                m = dec.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm])
                fr.modes[r2 + idy : r2 + idy + bh4,
                         c2 + idx : c2 + idx + bw4] = m
        ymode = int(fr.modes[r2 + 1, c2 + 1])
    uvmode = dec.tree(_MODE_TREE, _KF_UV_MODE_PROBS[ymode])
    h8, w8 = _h8(bsize), _w8(bsize)
    fr.skip[mi_r : mi_r + h8, mi_c : mi_c + w8] = skip
    return skip, uvmode, None


def _decode_leaf(fr, dec, mi_r, mi_c, sub, inter_frame):
    skip, uv, mv = _decode_modes(fr, dec, mi_r, mi_c, sub, inter_frame)
    _recon_block(fr, mi_r, mi_c, sub, skip, uv, dec, True, mv=mv)


def _decode_partition(fr, dec, mi_r, mi_c, bsize, inter_frame=False):
    if mi_r >= fr.mi_rows or mi_c >= fr.mi_cols:
        return
    n8 = _w8(bsize)
    has_rows = mi_r + (n8 >> 1) < fr.mi_rows
    has_cols = mi_c + (n8 >> 1) < fr.mi_cols
    probs = _PARTITION_PROBS[fr.partition_ctx(mi_r, mi_c, bsize)]
    if bsize == _BS_8X8:
        has_rows = has_cols = True  # 8x8 always codes the full tree
    if has_rows and has_cols:
        part = dec.tree(_PARTITION_TREE, probs)
    elif has_cols:
        part = 3 if dec.decode(probs[1]) else 1  # SPLIT : HORZ
    elif has_rows:
        part = 3 if dec.decode(probs[2]) else 2  # SPLIT : VERT
    else:
        part = 3
    sub = _subsize(bsize, part)
    if (bsize == _BS_8X8 and part != 0) or part == 0:
        _decode_leaf(fr, dec, mi_r, mi_c, sub, inter_frame)
    elif part == 1:  # HORZ
        _decode_leaf(fr, dec, mi_r, mi_c, sub, inter_frame)
        if mi_r + (n8 >> 1) < fr.mi_rows:
            _decode_leaf(fr, dec, mi_r + (n8 >> 1), mi_c, sub,
                         inter_frame)
    elif part == 2:  # VERT
        _decode_leaf(fr, dec, mi_r, mi_c, sub, inter_frame)
        if mi_c + (n8 >> 1) < fr.mi_cols:
            _decode_leaf(fr, dec, mi_r, mi_c + (n8 >> 1), sub,
                         inter_frame)
    else:  # SPLIT
        h = n8 >> 1
        _decode_partition(fr, dec, mi_r, mi_c, sub, inter_frame)
        _decode_partition(fr, dec, mi_r, mi_c + h, sub, inter_frame)
        _decode_partition(fr, dec, mi_r + h, mi_c, sub, inter_frame)
        _decode_partition(fr, dec, mi_r + h, mi_c + h, sub, inter_frame)
    if bsize == _BS_8X8 or part != 3:
        fr.update_partition_ctx(mi_r, mi_c, sub, bsize)


def _decode_compressed_header(ch, lossless: bool,
                              inter_frame: bool) -> int:
    """tx mode + the fixed zero-update flag sequence the fixture
    writer emits (inter frames add the is-inter / NEWMV / MV-prob
    slots); any set flag raises — probability updates are outside the
    decode subset."""
    tx_mode = ch.literal(2)
    if tx_mode == 3:
        tx_mode += ch.literal(1)
    if tx_mode == 4:
        raise ValueError("vp9: TX_MODE_SELECT outside the decode subset")
    if lossless:
        tx_mode = 0
    ntx = min(tx_mode, 3) + 1 if not lossless else 1
    for _ in range(ntx):  # per-tx-size coef-prob update flags
        if ch.literal(1):
            raise ValueError(
                "vp9: coefficient probability updates outside the subset"
            )
    for _ in range(3):  # skip-prob diff updates
        if ch.decode(252):
            raise ValueError(
                "vp9: skip probability updates outside the subset"
            )
    if inter_frame:
        # is-inter (3 ctx), ref-select (2), NEWMV, mv prob slots
        for _ in range(3 + 2 + 1 + 2):
            if ch.decode(252):
                raise ValueError(
                    "vp9: inter probability updates outside the subset"
                )
    return tx_mode


def _walk_frame(hdr: dict, data: bytes, tx_mode: int,
                inter_frame: bool = False, ref_planes=None,
                ref_list=None) -> "_Frame":
    fr = _Frame(hdr["width"], hdr["height"], hdr["lossless"],
                hdr["base_q"], hdr["dq_y_dc"], hdr["dq_uv_dc"],
                hdr["dq_uv_ac"], tx_mode)
    fr.ref_planes = ref_planes
    fr.ref_list = ref_list
    co = hdr["compressed_offset"]
    tile = _bool_dec(data[co + hdr["header_size"] :])
    for sb_r in range(0, fr.mi_rows, 8):
        for sb_c in range(0, fr.mi_cols, 8):
            _decode_partition(fr, tile, sb_r, sb_c, _BS_64X64,
                              inter_frame)
    return fr


def _crop(fr: "_Frame", hdr: dict) -> dict:
    w, h = hdr["width"], hdr["height"]
    return dict(
        hdr,
        y=fr.planes[0][:h, :w].astype(np.uint8),
        u=fr.planes[1][: (h + 1) >> 1, : (w + 1) >> 1].astype(np.uint8),
        v=fr.planes[2][: (h + 1) >> 1, : (w + 1) >> 1].astype(np.uint8),
    )


def _decode_keyframe_fr(data: bytes) -> tuple[dict, "_Frame"]:
    hdr = _read_full_header(data)
    if hdr["width"] * hdr["height"] > MAX_FRAME_PIXELS:
        raise ValueError("vp9: frame too large")
    co = hdr["compressed_offset"]
    ch = _bool_dec(data[co : co + hdr["header_size"]])
    tx_mode = _decode_compressed_header(ch, hdr["lossless"], False)
    return hdr, _walk_frame(hdr, data, tx_mode)


def decode_keyframe(data: bytes) -> dict:
    """VP9 keyframe → ``{"width", "height", "y", "u", "v", header
    fields}`` (profile 0, 4:2:0, filter level 0 — see the provenance
    header for the synthetic-table conformance bound)."""
    hdr, fr = _decode_keyframe_fr(data)
    return _crop(fr, hdr)


# ---------------------------------------------------------------- inter


def frame_is_key(data: bytes) -> bool:
    """Peek the frame marker / profile / show-existing / frame-type
    bits (§6.2) without decoding."""
    b = _Bits(data)
    if b.u(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = b.u(1) | (b.u(1) << 1)
    if profile == 3 and b.u(1):
        raise ValueError("vp9: reserved profile bit set")
    if b.u(1):
        raise ValueError("vp9: show-existing frame carries no header")
    return b.u(1) == 0


def _read_quant_tiles(b: "_Bits", width: int) -> dict:
    """Shared tail of both header shapes: loop filter, quant,
    segmentation, tile info, compressed-header size (fixture-gated)."""
    filter_level = b.u(6)
    _fixture_shape(b.u(3) == 0, "loop-filter sharpness")
    if b.u(1):
        _fixture_shape(False, "mode/ref loop-filter deltas")
    if filter_level != 0:
        raise ValueError(
            "vp9: in-loop filter outside the decode subset "
            "(fixtures code filter level 0)"
        )
    base_q = b.u(8)

    def read_delta():
        if b.u(1):
            mag = b.u(4)
            return -mag if b.u(1) else mag
        return 0

    dq_y_dc = read_delta()
    dq_uv_dc = read_delta()
    dq_uv_ac = read_delta()
    _fixture_shape(dq_y_dc == dq_uv_dc == dq_uv_ac == 0,
                   "non-zero quantizer deltas")
    if b.u(1):
        raise ValueError("vp9: segmentation outside the decode subset")
    mi_cols = (width + 7) >> 3
    sb_cols = (mi_cols + 7) >> 3
    min_log2 = 0
    while (sb_cols >> min_log2) > 64:
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> (max_log2 + 1)) >= 4:
        max_log2 += 1
    tile_cols_log2 = min_log2
    while tile_cols_log2 < max_log2:
        if b.u(1):
            tile_cols_log2 += 1
        else:
            break
    tile_rows_log2 = b.u(1)
    if tile_rows_log2:
        tile_rows_log2 += b.u(1)
    if tile_cols_log2 or tile_rows_log2:
        raise ValueError("vp9: multiple tiles outside the decode subset")
    header_size = b.u(16)
    if header_size == 0:
        raise ValueError("vp9: empty compressed header")
    return {
        "base_q": base_q,
        "dq_y_dc": dq_y_dc,
        "dq_uv_dc": dq_uv_dc,
        "dq_uv_ac": dq_uv_ac,
        "lossless": base_q == 0,
        "header_size": header_size,
        "pos": b.pos,
    }


def _read_inter_header(data: bytes, slots: list) -> dict:
    """Non-key frame uncompressed header (§6.2 inter shape), gated to
    the fixture-writer subset: single-ref (LAST = ref_frame_idx[0]),
    size-from-ref, BILINEAR interpolation filter, no segmentation /
    tiles / loop filter / probability updates."""
    b = _Bits(data)
    if b.u(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = b.u(1) | (b.u(1) << 1)
    if profile != 0:
        raise ValueError("vp9: only profile 0 decodes to pixels")
    if b.u(1):
        raise ValueError("vp9: show-existing frame carries no header")
    if b.u(1) != 1:
        raise ValueError("vp9: not an inter frame")
    show_frame = b.u(1)
    _fixture_shape(show_frame == 1, "hidden inter frame")
    err_res = b.u(1)
    _fixture_shape(err_res == 0, "error-resilient mode")
    _fixture_shape(b.u(2) == 0, "reset_frame_context")
    refresh_flags = b.u(8)
    refs = []
    for _ in range(3):
        refs.append(b.u(3))
        _fixture_shape(b.u(1) == 0, "ref sign bias")
    for idx in refs:
        if idx >= len(slots) or slots[idx] is None:
            raise ValueError(
                "vp9: inter frame references an empty slot")
    ref_idx = refs[0]  # LAST: frame size and the default reference
    found = b.u(1)
    _fixture_shape(found == 1, "explicit inter frame size")
    _fixture_shape(b.u(1) == 0, "explicit render size")
    b.u(1)  # allow_high_precision_mv (absolute MV code ignores it)
    _fixture_shape(b.u(1) == 0, "switchable interpolation filter")
    raw_filter = b.u(2)
    _fixture_shape(raw_filter == 3,
                   "8-tap interpolation (only BILINEAR is derivable)")
    _fixture_shape(b.u(1) == 0, "refresh_frame_context")
    _fixture_shape(b.u(1) == 1, "frame_parallel off")
    _fixture_shape(b.u(2) == 0, "frame_context_idx")
    ref = slots[ref_idx]
    width, height = ref["width"], ref["height"]
    tail = _read_quant_tiles(b, width)
    comp_off = (tail.pop("pos") + 7) >> 3
    if comp_off + tail["header_size"] > len(data):
        raise ValueError("vp9: compressed header past end of frame")
    return dict(
        tail,
        width=width,
        height=height,
        ref_idx=ref_idx,
        refs=tuple(refs),
        refresh_flags=refresh_flags,
        compressed_offset=comp_off,
    )


def decode_inter_frame(data: bytes, slots: list) -> tuple[dict, "_Frame"]:
    """One non-key frame against the 8-slot reference bank (r16 inter
    tier): header → compressed-header flag walk → partition walk with
    per-block is-inter / ZEROMV / NEWMV decode and BILINEAR motion
    compensation — then the refresh mask updates ``slots`` in place."""
    hdr = _read_inter_header(data, slots)
    if hdr["width"] * hdr["height"] > MAX_FRAME_PIXELS:
        raise ValueError("vp9: frame too large")
    co = hdr["compressed_offset"]
    ch = _bool_dec(data[co : co + hdr["header_size"]])
    tx_mode = _decode_compressed_header(ch, hdr["lossless"], True)
    ref_list = [slots[i]["planes"] for i in hdr["refs"]]
    fr = _walk_frame(hdr, data, tx_mode, True, ref_list[0],
                     ref_list=ref_list)
    _refresh_slots(slots, hdr["refresh_flags"], fr, hdr)
    return hdr, fr


def _refresh_slots(slots: list, mask: int, fr: "_Frame", hdr: dict):
    entry = {"planes": fr.planes, "width": hdr["width"],
             "height": hdr["height"]}
    for i in range(8):
        if mask & (1 << i):
            slots[i] = entry


#: per-GOP frame cap — each frame costs a full Python partition walk,
#: and WebM carriage legally holds ~1M blocks per track
MAX_GOP_FRAMES = 1 << 10


def decode_gop(frames: list[bytes]) -> dict:
    """A group of VP9 frames (keyframe first) → ``{"width", "height",
    "frames": [(y, u, v), ...]}``.  Keyframes refresh every reference
    slot; inter frames reference and refresh per their headers."""
    if not frames:
        raise ValueError("vp9: empty group")
    if len(frames) > MAX_GOP_FRAMES:
        raise ValueError("vp9: frame count over the group cap (bomb)")
    slots: list = [None] * 8
    out = []
    width = height = None
    for blob in frames:
        if frame_is_key(blob):
            hdr, fr = _decode_keyframe_fr(blob)
            _refresh_slots(slots, 0xFF, fr, hdr)
        else:
            hdr, fr = decode_inter_frame(blob, slots)
        if width is None:
            width, height = hdr["width"], hdr["height"]
        elif (hdr["width"], hdr["height"]) != (width, height):
            raise ValueError("vp9: frame size changed mid-group")
        d = _crop(fr, hdr)
        out.append((d["y"], d["u"], d["v"]))
    return {"width": width, "height": height, "frames": out}


def _fdct4x4(resid: np.ndarray) -> np.ndarray:
    """Float forward DCT matching idct4x4's scaling (encoder only; the
    decoder never uses it, so float is fine for fixture quality)."""
    c16, c8, c24 = _cospi(16), _cospi(8), _cospi(24)
    f = np.array([
        [c16, c16, c16, c16],
        [c8, c24, -c24, -c8],
        [c16, -c16, -c16, c16],
        [c24, -c8, c8, -c24],
    ], dtype=np.float64) / 16384.0
    return (f @ resid.astype(np.float64) @ f.T) * 4.0


# ---------------------------------------------------------------- encode


def _encode_modes(fr, enc, mi_r, mi_c, bsize, skip, mode_fn):
    """Dual of :func:`_decode_modes`: chooses modes via ``mode_fn``,
    writes them into the context grids, emits skip + mode symbols."""
    enc.encode(skip, _SKIP_PROBS[fr.skip_ctx(mi_r, mi_c)])
    bw, bh = _BLOCK_SIZES[bsize]
    r2, c2 = mi_r * 2, mi_c * 2
    if bsize >= _BS_8X8:
        am = fr.mode_above(mi_r, mi_c, 0, 0)
        lm = fr.mode_left(mi_r, mi_c, 0, 0)
        ymode = mode_fn(mi_r, mi_c, 0, 0)
        enc.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm], ymode)
        fr.modes[r2 : r2 + max(1, bh >> 3) * 2,
                 c2 : c2 + max(1, bw >> 3) * 2] = ymode
    else:
        bw4, bh4 = max(1, bw >> 2), max(1, bh >> 2)
        for idy in range(0, 2, bh4):
            for idx in range(0, 2, bw4):
                am = fr.mode_above(mi_r, mi_c, idy, idx)
                lm = fr.mode_left(mi_r, mi_c, idy, idx)
                m = mode_fn(mi_r, mi_c, idy, idx)
                enc.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm], m)
                fr.modes[r2 + idy : r2 + idy + bh4,
                         c2 + idx : c2 + idx + bw4] = m
        ymode = int(fr.modes[r2 + 1, c2 + 1])
    uvmode = ymode if ymode <= TM_PRED else DC_PRED
    enc.tree(_MODE_TREE, _KF_UV_MODE_PROBS[ymode], uvmode)
    fr.skip[mi_r : mi_r + _h8(bsize), mi_c : mi_c + _w8(bsize)] = skip
    return uvmode


def _encode_leaf(fr, enc, mi_r, mi_c, bsize, src, mode_fn,
                 decision=None, inter_frame=False):
    """skip decision + modes + residual for one leaf block.  Mode
    grids must be written before the residual walk (residual reads
    them), but skip is the FIRST symbol — so modes are chosen and
    written first, symbols emitted after the compute pass.

    Inter frames (r16): ``decision`` is ``("intra",)``, ``("zero",)``,
    ``("mv", (dr, dc))`` (residual-coded against the prediction) or
    the forced-skip duals ``("zero_skip",)`` / ``("mv_skip", mv)``
    (pure carry-forward / motion compensation, no tokens)."""
    if inter_frame and bsize >= _BS_8X8 and decision is not None \
            and decision[0] != "intra":
        kind = decision[0]
        rest = decision[1:]
        if kind.startswith("zero"):
            mv = (0, 0)
            ref = int(rest[0]) if rest else LAST_FRAME
        else:
            mv = (int(rest[0][0]), int(rest[0][1]))
            ref = int(rest[1]) if len(rest) > 1 else LAST_FRAME
        if not 0 <= ref <= 2:
            raise ValueError("vp9 fixture: ref selector out of range")
        fr.ref_planes = fr.ref_list[ref]
        if kind.endswith("_skip"):
            _recon_block(fr, mi_r, mi_c, bsize, True, None, None,
                         False, None, mv)
            skip, pending = 1, []
        else:
            snaps = []
            for plane in range(3):
                x0, y0, _aw4, _ah4, bw4_, bh4_ = _plane_geom(
                    fr, plane, mi_r, mi_c, bsize)
                snaps.append((plane, x0 >> 2, bw4_, y0 >> 2, bh4_))
            all_zero, pending = _recon_block(
                fr, mi_r, mi_c, bsize, False, None, None, False, src,
                mv)
            skip = 1 if all_zero else 0
            if skip:
                for plane, c4, w4, r4, h4 in snaps:
                    fr.above_nz[plane][c4 : c4 + w4] = 0
                    fr.left_nz[plane][r4 : r4 + h4] = 0
        enc.encode(skip, _SKIP_PROBS[fr.skip_ctx(mi_r, mi_c)])
        enc.encode(1, _IS_INTER_PROBS[_inter_ctx(fr, mi_r, mi_c)])
        if ref == LAST_FRAME:
            enc.encode(0, _REF_P1)
        else:
            enc.encode(1, _REF_P1)
            enc.encode(1 if ref == ALTREF_FRAME else 0, _REF_P2)
        if mv == (0, 0):
            enc.encode(0, _NEWMV_PROB)
        else:
            enc.encode(1, _NEWMV_PROB)
            _encode_mv(enc, mv)
        _set_inter_grids(fr, mi_r, mi_c, bsize, 1, mv)
        fr.skip[mi_r : mi_r + _h8(bsize),
                mi_c : mi_c + _w8(bsize)] = skip
        for plane, txs, pt, qc in pending if not skip else ():
            _encode_tokens(enc, txs, pt, qc)
        return
    # choose + write modes (no emission yet)
    bw, bh = _BLOCK_SIZES[bsize]
    r2, c2 = mi_r * 2, mi_c * 2
    if bsize >= _BS_8X8:
        ymode = mode_fn(mi_r, mi_c, 0, 0)
        fr.modes[r2 : r2 + max(1, bh >> 3) * 2,
                 c2 : c2 + max(1, bw >> 3) * 2] = ymode
    else:
        bw4, bh4 = max(1, bw >> 2), max(1, bh >> 2)
        for idy in range(0, 2, bh4):
            for idx in range(0, 2, bw4):
                fr.modes[r2 + idy : r2 + idy + bh4,
                         c2 + idx : c2 + idx + bw4] = \
                    mode_fn(mi_r, mi_c, idy, idx)
        ymode = int(fr.modes[r2 + 1, c2 + 1])
    uvmode = ymode if ymode <= TM_PRED else DC_PRED
    # compute pass (snapshots let the skip path rewind nz contexts)
    snaps = []
    for plane in range(3):
        x0, y0, aw4, ah4, bw4_, bh4_ = _plane_geom(fr, plane, mi_r,
                                                   mi_c, bsize)
        c4, r4 = x0 >> 2, y0 >> 2
        snaps.append((plane, c4, bw4_, r4, bh4_,
                      fr.above_nz[plane][c4 : c4 + bw4_].copy(),
                      fr.left_nz[plane][r4 : r4 + bh4_].copy()))
    all_zero, pending = _recon_block(fr, mi_r, mi_c, bsize, False,
                                     uvmode, None, False, src)
    skip = 1 if all_zero else 0
    if skip:
        for plane, c4, w4, r4, h4, _a, _l in snaps:
            fr.above_nz[plane][c4 : c4 + w4] = 0
            fr.left_nz[plane][r4 : r4 + h4] = 0
    # emit: skip, [is-inter], modes, then tokens
    enc.encode(skip, _SKIP_PROBS[fr.skip_ctx(mi_r, mi_c)])
    if inter_frame and bsize >= _BS_8X8:
        enc.encode(0, _IS_INTER_PROBS[_inter_ctx(fr, mi_r, mi_c)])
    if inter_frame:
        _set_inter_grids(fr, mi_r, mi_c, bsize, 0, None)
    if bsize >= _BS_8X8:
        am = fr.mode_above(mi_r, mi_c, 0, 0)
        lm = fr.mode_left(mi_r, mi_c, 0, 0)
        # neighbor ctx reads OUR OWN written modes for in-block cells —
        # identical on the decode side since modes were decoded first
        enc.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm], ymode)
    else:
        bw4, bh4 = max(1, bw >> 2), max(1, bh >> 2)
        for idy in range(0, 2, bh4):
            for idx in range(0, 2, bw4):
                am = fr.mode_above(mi_r, mi_c, idy, idx)
                lm = fr.mode_left(mi_r, mi_c, idy, idx)
                enc.tree(_MODE_TREE, _KF_Y_MODE_PROBS[am][lm],
                         int(fr.modes[r2 + idy, c2 + idx]))
    enc.tree(_MODE_TREE, _KF_UV_MODE_PROBS[ymode], uvmode)
    fr.skip[mi_r : mi_r + _h8(bsize), mi_c : mi_c + _w8(bsize)] = skip
    if not skip:
        for plane, txs, pt, qc in pending:
            _encode_tokens(enc, txs, pt, qc)


def _encode_partition(fr, enc, mi_r, mi_c, bsize, src, mode_fn,
                      part_fn, block_fn=None, inter_frame=False):
    if mi_r >= fr.mi_rows or mi_c >= fr.mi_cols:
        return
    n8 = _w8(bsize)
    has_rows = mi_r + (n8 >> 1) < fr.mi_rows
    has_cols = mi_c + (n8 >> 1) < fr.mi_cols
    probs = _PARTITION_PROBS[fr.partition_ctx(mi_r, mi_c, bsize)]
    part = part_fn(mi_r, mi_c, bsize)
    if bsize == _BS_8X8:
        has_rows = has_cols = True
    if not has_rows and not has_cols:
        part = 3
    elif not has_rows:
        part = part if part in (1, 3) else 3
        enc.encode(1 if part == 3 else 0, probs[1])
    elif not has_cols:
        part = part if part in (2, 3) else 3
        enc.encode(1 if part == 3 else 0, probs[2])
    else:
        enc.tree(_PARTITION_TREE, probs, part)
    sub = _subsize(bsize, part)

    def leaf(r, c):
        decision = block_fn(r, c, sub) if block_fn is not None else None
        _encode_leaf(fr, enc, r, c, sub, src, mode_fn, decision,
                     inter_frame)

    if part == 0 or bsize == _BS_8X8:
        leaf(mi_r, mi_c)
    elif part == 1:
        leaf(mi_r, mi_c)
        if mi_r + (n8 >> 1) < fr.mi_rows:
            leaf(mi_r + (n8 >> 1), mi_c)
    elif part == 2:
        leaf(mi_r, mi_c)
        if mi_c + (n8 >> 1) < fr.mi_cols:
            leaf(mi_r, mi_c + (n8 >> 1))
    else:
        h = n8 >> 1
        _encode_partition(fr, enc, mi_r, mi_c, sub, src, mode_fn,
                          part_fn, block_fn, inter_frame)
        _encode_partition(fr, enc, mi_r, mi_c + h, sub, src, mode_fn,
                          part_fn, block_fn, inter_frame)
        _encode_partition(fr, enc, mi_r + h, mi_c, sub, src, mode_fn,
                          part_fn, block_fn, inter_frame)
        _encode_partition(fr, enc, mi_r + h, mi_c + h, sub, src,
                          mode_fn, part_fn, block_fn, inter_frame)
    if bsize == _BS_8X8 or part != 3:
        fr.update_partition_ctx(mi_r, mi_c, sub, bsize)


def _default_mode_fn(mi_r, mi_c, idy, idx):
    # blocks land on even mi coordinates, so mix the halved coords to
    # cover all ten modes
    return ((mi_r >> 1) * 3 + (mi_c >> 1) * 7 + mi_r + idy * 2
            + idx) % 10


def _default_part_fn(mi_r, mi_c, bsize):
    if bsize == _BS_64X64:
        return 3
    if bsize > 6:  # 32x32 tier: mix of everything
        return (mi_r // 4 + mi_c // 4) % 4
    if bsize > _BS_8X8:  # 16x16 tier
        return ((mi_r >> 1) + (mi_c >> 1) * 2 + 1) % 4
    return (mi_r * 7 + mi_c * 5) % 4  # 8x8: exercises sub-8 modes


def _write_tx_header(ch, tx_mode: int, lossless: bool,
                     inter_frame: bool = False) -> None:
    """Compressed-header prefix (dual of _decode_compressed_header):
    tx mode + the zero update-flag ladder."""
    if lossless:
        tx_mode = 0
    if not 0 <= tx_mode <= 3:
        raise ValueError("vp9 fixture: tx_mode out of range")
    ch.literal(min(tx_mode, 3), 2)
    if tx_mode == 3:
        ch.literal(0, 1)  # not TX_MODE_SELECT
    ntx = min(tx_mode, 3) + 1 if not lossless else 1
    for _ in range(ntx):
        ch.literal(0, 1)
    for _ in range(3):
        ch.encode(0, 252)
    if inter_frame:
        for _ in range(3 + 2 + 1 + 2):
            ch.encode(0, 252)


def build_keyframe(y: np.ndarray, u: np.ndarray, v: np.ndarray, *,
                   lossless: bool = True, base_q: int = 40,
                   mode_fn=None, part_fn=None, tx_mode: int = 0) -> bytes:
    """Encode one 4:2:0 profile-0 keyframe.  ``lossless=True``
    reproduces the input planes BIT-EXACTLY through the decoder;
    lossy mode quantizes through the synthetic qlookup with
    transforms up to ``4 << tx_mode`` (8x8-32x32 via the derived
    DCT-III matrices, r16)."""
    y = np.asarray(y, np.uint8)
    u = np.asarray(u, np.uint8)
    v = np.asarray(v, np.uint8)
    h, w = y.shape
    if u.shape != ((h + 1) >> 1, (w + 1) >> 1) or u.shape != v.shape:
        raise ValueError("vp9: u/v planes must be the 4:2:0 halves")
    mode_fn = mode_fn or _default_mode_fn
    part_fn = part_fn or _default_part_fn
    base_q = 0 if lossless else max(1, base_q)
    if lossless:
        tx_mode = 0
    fr = _Frame(w, h, lossless, base_q, 0, 0, 0, tx_mode)
    pw, ph = fr.mi_cols * 8, fr.mi_rows * 8
    src = [
        np.pad(y.astype(np.int64), ((0, ph - h), (0, pw - w)),
               mode="edge"),
        np.pad(u.astype(np.int64),
               ((0, (ph >> 1) - u.shape[0]), (0, (pw >> 1) - u.shape[1])),
               mode="edge"),
        np.pad(v.astype(np.int64),
               ((0, (ph >> 1) - v.shape[0]), (0, (pw >> 1) - v.shape[1])),
               mode="edge"),
    ]
    # compressed header
    ch = _BoolEnc()
    _write_tx_header(ch, tx_mode, lossless)
    comp = ch.getvalue() or b"\x00"
    # tile data
    enc = _BoolEnc()
    for sb_r in range(0, fr.mi_rows, 8):
        for sb_c in range(0, fr.mi_cols, 8):
            _encode_partition(fr, enc, sb_r, sb_c, _BS_64X64, src,
                              mode_fn, part_fn)
    tile = enc.getvalue()
    # uncompressed header
    bw_ = _BitW()
    bw_.u(2, 2)
    bw_.u(0, 1)
    bw_.u(0, 1)  # profile 0
    bw_.u(0, 1)  # show_existing
    bw_.u(0, 1)  # KEY
    bw_.u(1, 1)  # show
    bw_.u(0, 1)  # error_resilient
    bw_.u(_SYNC, 24)
    bw_.u(2, 3)  # color space bt709
    bw_.u(0, 1)  # studio range
    bw_.u(w - 1, 16)
    bw_.u(h - 1, 16)
    bw_.u(0, 1)  # render == frame
    bw_.u(0, 1)  # refresh_frame_context
    bw_.u(1, 1)  # frame_parallel_decoding_mode
    bw_.u(0, 2)  # frame_context_idx
    bw_.u(0, 6)  # filter level 0
    bw_.u(0, 3)  # sharpness
    bw_.u(0, 1)  # mode_ref_delta_enabled
    bw_.u(base_q, 8)
    bw_.u(0, 1)  # delta_q_y_dc
    bw_.u(0, 1)  # delta_q_uv_dc
    bw_.u(0, 1)  # delta_q_uv_ac
    bw_.u(0, 1)  # segmentation off
    sb_cols = (fr.mi_cols + 7) >> 3
    min_log2 = 0
    while (sb_cols >> min_log2) > 64:
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> (max_log2 + 1)) >= 4:
        max_log2 += 1
    if min_log2 > 0:
        raise ValueError("vp9 fixture: frame too wide for one tile")
    if max_log2 > 0:
        bw_.u(0, 1)  # stop at tile_cols_log2 = 0
    bw_.u(0, 1)  # tile_rows_log2 = 0
    bw_.u(len(comp), 16)
    return bw_.bytes(stop_bit=False) + comp + tile


# ------------------------------------------------------------ inter encode


def _pad_planes(y, u, v, mi_cols: int, mi_rows: int) -> list:
    pw, ph = mi_cols * 8, mi_rows * 8
    return [
        np.pad(np.asarray(y, np.uint8).astype(np.int64),
               ((0, ph - y.shape[0]), (0, pw - y.shape[1])),
               mode="edge"),
        np.pad(np.asarray(u, np.uint8).astype(np.int64),
               ((0, (ph >> 1) - u.shape[0]), (0, (pw >> 1) - u.shape[1])),
               mode="edge"),
        np.pad(np.asarray(v, np.uint8).astype(np.int64),
               ((0, (ph >> 1) - v.shape[0]), (0, (pw >> 1) - v.shape[1])),
               mode="edge"),
    ]


def build_interframe(slots: list, planes=None, *, ref_idx: int = 0,
                     golden_idx: int | None = None,
                     altref_idx: int | None = None,
                     refresh: int = 1, base_q: int = 0,
                     block_fn=None, part_fn=None, mode_fn=None,
                     tx_mode: int = 0) -> bytes:
    """Encode one non-key frame against the reference bank and apply
    its refresh mask to ``slots`` (exact dual of
    :func:`decode_inter_frame`).  ``planes`` is the residual-coded
    target (omit for pure carry-forward / MC frames whose every block
    is a ``*_skip`` decision); ``base_q = 0`` is lossless, so any
    decision mix reproduces the target bit-exactly."""
    if golden_idx is None:
        golden_idx = ref_idx
    if altref_idx is None:
        altref_idx = ref_idx
    refs = (ref_idx, golden_idx, altref_idx)
    for i in refs:
        if slots[i] is None:
            raise ValueError(
                "vp9 fixture: inter frame needs a filled slot")
    ref = slots[ref_idx]
    w, h = ref["width"], ref["height"]
    lossless = base_q == 0
    if lossless:
        tx_mode = 0
    fr = _Frame(w, h, lossless, base_q, 0, 0, 0, tx_mode)
    fr.ref_planes = ref["planes"]
    fr.ref_list = [slots[i]["planes"] for i in refs]
    src = None
    if planes is not None:
        y, u, v = planes
        if y.shape != (h, w):
            raise ValueError("vp9 fixture: inter frame size mismatch")
        src = _pad_planes(y, u, v, fr.mi_cols, fr.mi_rows)
    block_fn = block_fn or (lambda r, c, b: ("zero",))
    part_fn = part_fn or (lambda r, c, b: 0)
    mode_fn = mode_fn or _default_mode_fn
    ch = _BoolEnc()
    _write_tx_header(ch, tx_mode, lossless, inter_frame=True)
    comp = ch.getvalue() or b"\x00"
    enc = _BoolEnc()
    for sb_r in range(0, fr.mi_rows, 8):
        for sb_c in range(0, fr.mi_cols, 8):
            _encode_partition(fr, enc, sb_r, sb_c, _BS_64X64, src,
                              mode_fn, part_fn, block_fn, True)
    tile = enc.getvalue()
    bw_ = _BitW()
    bw_.u(2, 2)  # frame marker
    bw_.u(0, 1)
    bw_.u(0, 1)  # profile 0
    bw_.u(0, 1)  # show_existing
    bw_.u(1, 1)  # NON_KEY
    bw_.u(1, 1)  # show_frame
    bw_.u(0, 1)  # error_resilient
    bw_.u(0, 2)  # reset_frame_context
    bw_.u(refresh, 8)
    for idx in refs:
        bw_.u(idx, 3)
        bw_.u(0, 1)  # sign bias
    bw_.u(1, 1)  # found_ref: size from ref
    bw_.u(0, 1)  # render == frame
    bw_.u(1, 1)  # allow_high_precision_mv
    bw_.u(0, 1)  # filter not switchable
    bw_.u(3, 2)  # BILINEAR
    bw_.u(0, 1)  # refresh_frame_context
    bw_.u(1, 1)  # frame_parallel_decoding_mode
    bw_.u(0, 2)  # frame_context_idx
    bw_.u(0, 6)  # filter level 0
    bw_.u(0, 3)  # sharpness
    bw_.u(0, 1)  # mode_ref_delta_enabled
    bw_.u(base_q, 8)
    bw_.u(0, 3)  # quantizer deltas
    bw_.u(0, 1)  # segmentation off
    sb_cols = (fr.mi_cols + 7) >> 3
    min_log2 = 0
    while (sb_cols >> min_log2) > 64:
        min_log2 += 1
    max_log2 = 0
    while (sb_cols >> (max_log2 + 1)) >= 4:
        max_log2 += 1
    if min_log2 > 0:
        raise ValueError("vp9 fixture: frame too wide for one tile")
    if max_log2 > 0:
        bw_.u(0, 1)
    bw_.u(0, 1)  # tile_rows_log2 = 0
    bw_.u(len(comp), 16)
    blob = bw_.bytes(stop_bit=False) + comp + tile
    _refresh_slots(slots, refresh, fr, {"width": w, "height": h})
    return blob


def build_gop(key_planes, specs: list, *, part_fn=None,
              mode_fn=None) -> list[bytes]:
    """Encode a LOSSLESS keyframe + inter-frame group.  ``specs`` is
    one dict per inter frame:

    - ``planes``: target ``(y, u, v)`` (residual-coded; omitted for
      pure-MC frames),
    - ``block_fn(mi_r, mi_c, bsize)`` → per-leaf decision (see
      :func:`_encode_leaf`); shorthands ``carry=True`` (all
      ``zero_skip``) and ``mv=(dr, dc)`` (all ``mv_skip``),
    - ``ref_idx`` / ``refresh``: reference-bank wiring (defaults 0/1;
      the keyframe refreshes all eight slots, like the spec),
    - ``part_fn`` / ``mode_fn``: per-frame overrides.

    Returns the frame blobs for :func:`decode_gop`."""
    y, u, v = key_planes
    blobs = [build_keyframe(y, u, v, lossless=True,
                            mode_fn=mode_fn, part_fn=part_fn)]
    h, w = y.shape
    mi_cols, mi_rows = (w + 7) >> 3, (h + 7) >> 3
    kf_entry = {"planes": _pad_planes(y, u, v, mi_cols, mi_rows),
                "width": w, "height": h}
    slots: list = [kf_entry] * 8
    for spec in specs:
        block_fn = spec.get("block_fn")
        if block_fn is None and spec.get("carry"):
            block_fn = lambda r, c, b: ("zero_skip",)  # noqa: E731
        elif block_fn is None and spec.get("mv") is not None:
            mv = spec["mv"]
            block_fn = lambda r, c, b, _m=mv: ("mv_skip", _m)  # noqa: E731
        blobs.append(build_interframe(
            slots, spec.get("planes"),
            ref_idx=spec.get("ref_idx", 0),
            golden_idx=spec.get("golden_idx"),
            altref_idx=spec.get("altref_idx"),
            refresh=spec.get("refresh", 1),
            block_fn=block_fn,
            part_fn=spec.get("part_fn"),
            mode_fn=spec.get("mode_fn"),
        ))
    return blobs
