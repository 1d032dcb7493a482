"""JPEG 2000 (ITU-T T.800) — the reversible lossless subset, for
``/JPXDecode`` images in scanned PDFs.

Scope (the archival-scan shape): JPEG 2000 codestreams (SOC..EOC) with
the 5/3 reversible wavelet, no quantization, single tile, single
layer, LRCP progression, default precincts, optional reversible color
transform (RCT) for 3-component images, 8-bit unsigned samples.
Decoding is BIT-EXACT (the reversible path reconstructs the original
samples), so fixtures carry decoder-independent byte expectations.

Everything here is structural or small-table:

- **MQ coder**: IDENTICAL to JBIG2's (T.88 Annex E == T.800 Annex C);
  reused from :mod:`.rawjbig2` — the spec-printed Table E.1 serves
  both, and T.800's per-context initial states (the all-zero
  significance context starts at state 4, the run-length context at
  3, the UNIFORM context at the non-adaptive state 46) are consistent
  with that table's structure.
- **EBCOT tier-1** (Annex D): per-code-block bitplane coding — the
  significance-propagation, magnitude-refinement and cleanup passes
  over 4-row stripes, the 9 significance contexts from the
  orientation-dependent neighbor tables (D.1), sign coding with the
  XOR predictions (D.2), refinement contexts (D.3), and the cleanup
  run-length mode (AGG + two UNIFORM position bits).
- **Tag trees** (B.10.2) for packet-header inclusion and
  zero-bitplane coding; packet headers with bit-stuffing, the
  number-of-passes code and Lblock length coding.
- **5/3 reversible DWT** (Annex F) with symmetric extension, and the
  RCT (G = Y0 - ((Y1+Y2)>>2) ...).
- **9/7 irreversible DWT + scalar quantization** (r16): the published
  Daubechies-Sweldens lifting constants with the DC-gain-pinned
  1/K / K normalization, Annex E scalar-expounded quantization
  (per-band 16-bit SPqcd, gain-table Rb), midpoint dequantization,
  and the ICT for color.  Lossy by nature: round-trips are bounded
  (≤ Δb/2 per coefficient), never bit-exact — fixtures and oracles
  carry documented tolerances, not byte expectations.

OUT OF SCOPE, loud: multiple tiles/layers/tile-parts, precinct
partitions, SOP/EPH, coding-style options (bypass/reset/termall/
vertically-causal/segmentation symbols), ROI shifts, derived
(style-1) quantization, JP2 boxes other than a plain passthrough to
the codestream, and >8-bit or subsampled components.

The fixture encoders are exact duals (5/3 round-trips pixel-exact by
reversibility; 9/7 within the quantization bound).  Reference
behavioral parity: the reference transport stores opaque named byte
arrays (RawdataMessage.java:15-60); media decoding is this repo's
derived multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np

from .rawjbig2 import MQDecoder, MQEncoder

# pure-Python EBCOT decodes ~0.1 Mpx/s: the pixel cap IS the hostile
# CPU budget (4 Mpx ~ a minute), and larger claims raise loudly
MAX_PIXELS = 4 << 20

# MQ context numbering: 0-8 significance, 9-13 sign, 14-16 refinement,
# 17 run-length (AGG), 18 UNIFORM
_N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18


def _fresh_ctx():
    icx = [0] * _N_CTX
    mps = [0] * _N_CTX
    icx[0] = 4       # all-zero significance context
    icx[_CTX_RL] = 3
    icx[_CTX_UNI] = 46
    return icx, mps


#: Table D.1 — significance context from neighbor counts (h, v, d),
#: for the LL/LH orientation; HL swaps h and v; HH keys on d first.
def _sig_ctx(h: int, v: int, d: int, band: str) -> int:
    if band == "HL":
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else (1 if d == 1 else 0)
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else (1 if hv == 1 else 0)


#: Table D.2 — sign context + XOR bit from clamped neighbor sums
_SIGN_TAB = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1:
    """One code block's EBCOT tier-1 state (shared by both
    directions; the encoder mirrors every context decision)."""

    def __init__(self, h: int, w: int, band: str):
        self.h, self.w = h, w
        self.band = band
        self.sig = np.zeros((h + 2, w + 2), np.int8)   # 1-padded
        self.sign = np.zeros((h + 2, w + 2), np.int8)  # -1/+1
        self.visited = np.zeros((h, w), bool)
        self.refined = np.zeros((h, w), bool)
        self.mag = np.zeros((h, w), np.int64)

    def nb(self, y: int, x: int):
        """(h, v, d) significant-neighbor counts at unpadded (y, x)."""
        s = self.sig
        yy, xx = y + 1, x + 1
        h = int(s[yy, xx - 1]) + int(s[yy, xx + 1])
        v = int(s[yy - 1, xx]) + int(s[yy + 1, xx])
        d = (int(s[yy - 1, xx - 1]) + int(s[yy - 1, xx + 1])
             + int(s[yy + 1, xx - 1]) + int(s[yy + 1, xx + 1]))
        return h, v, d

    def sign_ctx(self, y: int, x: int):
        s, g = self.sig, self.sign
        yy, xx = y + 1, x + 1
        hc = max(-1, min(1, int(s[yy, xx - 1]) * int(g[yy, xx - 1])
                         + int(s[yy, xx + 1]) * int(g[yy, xx + 1])))
        vc = max(-1, min(1, int(s[yy - 1, xx]) * int(g[yy - 1, xx])
                         + int(s[yy + 1, xx]) * int(g[yy + 1, xx])))
        return _SIGN_TAB[(hc, vc)]


def _t1_passes(t1: _T1, plane: int, coder, icx, mps, decode: bool,
               first_plane: bool):
    """Run the (up to) three coding passes of one bitplane in spec
    order.  ``decode``: coder is an MQDecoder; else MQEncoder reading
    the truth from ``t1.mag``/``t1.sign``."""
    h, w = t1.h, t1.w
    bit = 1 << plane
    t1.visited[:] = False

    def code_sig(y, x, ctx):
        if decode:
            return coder.decode(icx, mps, ctx)
        v = 1 if (t1.mag[y, x] & bit) else 0
        coder.encode(v, icx, mps, ctx)
        return v

    def code_sign(y, x):
        ctx, xorbit = t1.sign_ctx(y, x)
        if decode:
            s = coder.decode(icx, mps, ctx) ^ xorbit
            t1.sign[y + 1, x + 1] = -1 if s else 1
        else:
            s = 1 if t1.sign[y + 1, x + 1] < 0 else 0
            coder.encode(s ^ xorbit, icx, mps, ctx)

    def become_significant(y, x):
        t1.sig[y + 1, x + 1] = 1
        if decode:
            t1.mag[y, x] |= bit

    if not first_plane:
        # significance propagation
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if t1.sig[y + 1, x + 1]:
                        continue
                    hh, vv, dd = t1.nb(y, x)
                    if hh + vv + dd == 0:
                        continue
                    ctx = _sig_ctx(hh, vv, dd, t1.band)
                    t1.visited[y, x] = True
                    if code_sig(y, x, ctx):
                        code_sign(y, x)
                        become_significant(y, x)
        # magnitude refinement
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    if not t1.sig[y + 1, x + 1] or t1.visited[y, x]:
                        continue
                    if not t1.refined[y, x]:
                        hh, vv, dd = t1.nb(y, x)
                        ctx = 15 if hh + vv + dd > 0 else 14
                        t1.refined[y, x] = True
                    else:
                        ctx = 16
                    if decode:
                        if coder.decode(icx, mps, ctx):
                            t1.mag[y, x] |= bit
                    else:
                        coder.encode(
                            1 if (t1.mag[y, x] & bit) else 0,
                            icx, mps, ctx,
                        )
                    t1.visited[y, x] = True
    # cleanup
    for y0 in range(0, h, 4):
        for x in range(w):
            y = y0
            # run-length mode: full 4-row column, all insignificant,
            # unvisited, with no significant neighbors
            if (y0 + 4 <= h
                    and not t1.visited[y0 : y0 + 4, x].any()
                    and not t1.sig[y0 : y0 + 6, x : x + 3].any()):
                if decode:
                    agg = coder.decode(icx, mps, _CTX_RL)
                else:
                    agg = 1 if any(t1.mag[y0 + k, x] & bit
                                   for k in range(4)) else 0
                    coder.encode(agg, icx, mps, _CTX_RL)
                if not agg:
                    continue
                if decode:
                    r = (coder.decode(icx, mps, _CTX_UNI) << 1)
                    r |= coder.decode(icx, mps, _CTX_UNI)
                else:
                    r = next(k for k in range(4)
                             if t1.mag[y0 + k, x] & bit)
                    coder.encode((r >> 1) & 1, icx, mps, _CTX_UNI)
                    coder.encode(r & 1, icx, mps, _CTX_UNI)
                y = y0 + r
                code_sign(y, x)
                become_significant(y, x)
                y += 1
            for yy in range(y, min(y0 + 4, h)):
                if t1.visited[yy, x] or t1.sig[yy + 1, x + 1]:
                    continue
                hh, vv, dd = t1.nb(yy, x)
                ctx = _sig_ctx(hh, vv, dd, t1.band)
                if code_sig(yy, x, ctx):
                    code_sign(yy, x)
                    become_significant(yy, x)


def t1_decode(data: bytes, h: int, w: int, band: str,
              n_planes: int) -> np.ndarray:
    """Tier-1 decode of one code block → signed int coefficients."""
    t1 = _T1(h, w, band)
    icx, mps = _fresh_ctx()
    dec = MQDecoder(data)
    for p in range(n_planes - 1, -1, -1):
        _t1_passes(t1, p, dec, icx, mps, True, p == n_planes - 1)
    out = t1.mag.copy()
    neg = t1.sign[1 : h + 1, 1 : w + 1] < 0
    out[neg] = -out[neg]
    return out


def t1_encode(coeff: np.ndarray, band: str) -> tuple:
    """Tier-1 encode → (data, n_planes).  n_planes = bitplanes of the
    largest magnitude (0 for an all-zero block)."""
    coeff = np.asarray(coeff, np.int64)
    h, w = coeff.shape
    maxmag = int(np.abs(coeff).max(initial=0))
    n_planes = maxmag.bit_length()
    if n_planes == 0:
        return b"", 0
    t1 = _T1(h, w, band)
    t1.mag = np.abs(coeff)
    t1.sign[1 : h + 1, 1 : w + 1] = np.where(coeff < 0, -1, 1)
    # the encoder's sig/refined state must evolve exactly like the
    # decoder's: _t1_passes updates sig via become_significant in both
    # directions (encode path marks sig when the bit is coded set)
    icx, mps = _fresh_ctx()
    enc = MQEncoder()
    for p in range(n_planes - 1, -1, -1):
        _t1_passes(t1, p, enc, icx, mps, False, p == n_planes - 1)
    return enc.flush(), n_planes


# ---------------------------------------------------------------- DWT 5/3


def _fwd53(x: np.ndarray) -> tuple:
    """1D forward reversible 5/3 lifting → (low, high).  Symmetric
    extension; exact integers."""
    n = len(x)
    if n == 1:
        return x.copy(), x[:0].copy()
    x = x.astype(np.int64)
    ne = (n + 1) // 2

    def X(i):  # symmetric extension
        if i < 0:
            i = -i
        if i >= n:
            i = 2 * n - 2 - i
        return x[i]

    hi = np.empty(n // 2, np.int64)
    for k in range(n // 2):
        hi[k] = X(2 * k + 1) - ((X(2 * k) + X(2 * k + 2)) >> 1)

    def H(k):
        if k < 0:
            k = -k - 1
        if k >= len(hi):
            k = 2 * len(hi) - 1 - k
        return hi[k] if len(hi) else 0

    lo = np.empty(ne, np.int64)
    for k in range(ne):
        lo[k] = X(2 * k) + ((H(k - 1) + H(k) + 2) >> 2)
    return lo, hi


def _inv53(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    n = len(lo) + len(hi)
    if n == 1:
        return lo.astype(np.int64)
    lo = lo.astype(np.int64)
    hi = hi.astype(np.int64)

    def H(k):
        if k < 0:
            k = -k - 1
        if k >= len(hi):
            k = 2 * len(hi) - 1 - k
        return hi[k] if len(hi) else 0

    x = np.empty(n, np.int64)
    for k in range(len(lo)):
        x[2 * k] = lo[k] - ((H(k - 1) + H(k) + 2) >> 2)

    def E(i):
        if i < 0:
            i = -i
        if i >= n:
            i = 2 * n - 2 - i
        return x[i]

    for k in range(len(hi)):
        x[2 * k + 1] = hi[k] + ((E(2 * k) + E(2 * k + 2)) >> 1)
    return x


def dwt53_forward(img: np.ndarray, levels: int) -> list:
    """2D decomposition → [LL_n, (HL_n, LH_n, HH_n), ...,
    (HL_1, LH_1, HH_1)] (vertical then horizontal per level)."""
    cur = img.astype(np.int64)
    bands = []
    for _ in range(levels):
        h, w = cur.shape
        # vertical
        lo_rows = (h + 1) // 2
        tmp = np.empty((h, w), np.int64)
        for c in range(w):
            lo, hi = _fwd53(cur[:, c])
            tmp[:lo_rows, c] = lo
            tmp[lo_rows:, c] = hi
        # horizontal
        lo_cols = (w + 1) // 2
        out = np.empty((h, w), np.int64)
        for r in range(h):
            lo, hi = _fwd53(tmp[r])
            out[r, :lo_cols] = lo
            out[r, lo_cols:] = hi
        ll = out[:lo_rows, :lo_cols]
        hl = out[:lo_rows, lo_cols:]
        lh = out[lo_rows:, :lo_cols]
        hh = out[lo_rows:, lo_cols:]
        bands.append((hl.copy(), lh.copy(), hh.copy()))
        cur = ll.copy()
    return [cur] + bands[::-1]


def dwt53_inverse(bands: list) -> np.ndarray:
    cur = bands[0].astype(np.int64)
    for hl, lh, hh in bands[1:]:
        lo_rows, lo_cols = cur.shape
        h = lo_rows + lh.shape[0]
        w = lo_cols + hl.shape[1]
        grid = np.empty((h, w), np.int64)
        grid[:lo_rows, :lo_cols] = cur
        grid[:lo_rows, lo_cols:] = hl
        grid[lo_rows:, :lo_cols] = lh
        grid[lo_rows:, lo_cols:] = hh
        tmp = np.empty((h, w), np.int64)
        for r in range(h):
            tmp[r] = _inv53(grid[r, :lo_cols], grid[r, lo_cols:])
        out = np.empty((h, w), np.int64)
        for c in range(w):
            out[:, c] = _inv53(tmp[:lo_rows, c], tmp[lo_rows:, c])
        cur = out
    return cur


# ------------------------------------------------------------ 9/7 (r16)
#
# The irreversible path (T.800 Annex F.4.8.2 lifting + Annex E scalar
# quantization).  The lifting constants are the PUBLISHED
# Daubechies-Sweldens factorization of the CDF 9/7 filter pair (the
# same four numbers every JPEG 2000 text and implementation prints);
# the normalization (lowpass × 1/K, highpass × K) is pinned here by a
# DC-gain identity: for a constant signal the four lifting steps give
# s = 1 + 2β(1+2α) + 2δ·d₂ with d₂ = (1+2α) + 2γ(1+2β(1+2α)) ≈ 0 and
# s ≈ 1.2301741 = K exactly, so × 1/K makes the LL band sit at the
# input's nominal range (the convention the gain-table quantization
# exponents assume).  Reconstruction uses midpoint dequantization
# (r = 1/2), so per-coefficient error is bounded by Δb/2 — decode is
# NOT bit-exact (tests and oracles carry documented tolerances).

_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_KAY = 1.230174104914001

#: log2 nominal gain per band orientation (T.800 Table E.1 shape)
_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _lift97(ext: np.ndarray, inverse: bool) -> None:
    """Four lifting steps in place over a symmetric-extended array
    whose index parity matches the original signal (margin 4 covers
    the step-by-step shrink)."""
    m = len(ext)
    steps = ((_ALPHA, 1), (_BETA, 0), (_GAMMA, 1), (_DELTA, 0))
    if inverse:
        steps = tuple((-c, p) for c, p in reversed(steps))
    for coef, parity in steps:
        start = 1 if parity == 1 else 2
        ext[start : m - 1 : 2] += coef * (
            ext[start - 1 : m - 2 : 2] + ext[start + 1 : m : 2]
        )


def _fwd97(x: np.ndarray) -> tuple:
    """1D forward irreversible 9/7 lifting → (low, high) floats."""
    n = len(x)
    if n == 1:
        return x.astype(np.float64).copy(), \
            np.zeros(0, np.float64)
    ext = np.pad(x.astype(np.float64), 4, mode="reflect")
    _lift97(ext, inverse=False)
    lo = ext[4 : 4 + n : 2] * (1.0 / _KAY)
    hi = ext[5 : 4 + n : 2] * _KAY
    return lo, hi


def _inv97(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    n = len(lo) + len(hi)
    if n == 1:
        return lo.astype(np.float64).copy()
    y = np.empty(n, np.float64)
    y[0::2] = np.asarray(lo, np.float64) * _KAY
    y[1::2] = np.asarray(hi, np.float64) * (1.0 / _KAY)
    ext = np.pad(y, 4, mode="reflect")
    _lift97(ext, inverse=True)
    return ext[4 : 4 + n]


def dwt97_forward(img: np.ndarray, levels: int) -> list:
    """2D 9/7 decomposition, same band layout as
    :func:`dwt53_forward` (vertical then horizontal per level)."""
    cur = img.astype(np.float64)
    bands = []
    for _ in range(levels):
        h, w = cur.shape
        lo_rows = (h + 1) // 2
        tmp = np.empty((h, w), np.float64)
        for c in range(w):
            lo, hi = _fwd97(cur[:, c])
            tmp[:lo_rows, c] = lo
            tmp[lo_rows:, c] = hi
        lo_cols = (w + 1) // 2
        out = np.empty((h, w), np.float64)
        for r in range(h):
            lo, hi = _fwd97(tmp[r])
            out[r, :lo_cols] = lo
            out[r, lo_cols:] = hi
        bands.append((out[:lo_rows, lo_cols:].copy(),
                      out[lo_rows:, :lo_cols].copy(),
                      out[lo_rows:, lo_cols:].copy()))
        cur = out[:lo_rows, :lo_cols].copy()
    return [cur] + bands[::-1]


def dwt97_inverse(bands: list) -> np.ndarray:
    cur = np.asarray(bands[0], np.float64)
    for hl, lh, hh in bands[1:]:
        lo_rows, lo_cols = cur.shape
        h = lo_rows + lh.shape[0]
        w = lo_cols + hl.shape[1]
        grid = np.empty((h, w), np.float64)
        grid[:lo_rows, :lo_cols] = cur
        grid[:lo_rows, lo_cols:] = hl
        grid[lo_rows:, :lo_cols] = lh
        grid[lo_rows:, lo_cols:] = hh
        tmp = np.empty((h, w), np.float64)
        for r in range(h):
            tmp[r] = _inv97(grid[r, :lo_cols], grid[r, lo_cols:])
        out = np.empty((h, w), np.float64)
        for c in range(w):
            out[:, c] = _inv97(tmp[:lo_rows, c], tmp[lo_rows:, c])
        cur = out
    return cur


def _quant_step(gname: str, eps: int, mu: int, depth: int = 8) -> float:
    """Annex E scalar step Δb = 2^(Rb − εb) · (1 + μb/2^11) with
    Rb = depth + log2(band gain)."""
    rb = depth + _BAND_GAIN[gname]
    return (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)


# ---------------------------------------------------------------- tag tree


class TagTree:
    """B.10.2 tag tree over an (h, w) leaf grid — the canonical
    per-node (value, low, known) chain walk from root to leaf."""

    BIG = 1 << 30

    def __init__(self, h: int, w: int, decoder: bool = False):
        self.levels = [(h, w)]
        while h > 1 or w > 1:
            h, w = (h + 1) // 2, (w + 1) // 2
            self.levels.append((h, w))
        fill = self.BIG if decoder else 0
        self.value = [np.full(sz, fill, np.int64) for sz in self.levels]
        self.low = [np.zeros(sz, np.int64) for sz in self.levels]
        self.known = [np.zeros(sz, bool) for sz in self.levels]

    def set(self, y: int, x: int, v: int) -> None:
        self.value[0][y, x] = v
        for li in range(1, len(self.levels)):
            h, w = self.levels[li]
            below = self.value[li - 1]
            for yy in range(h):
                for xx in range(w):
                    self.value[li][yy, xx] = below[
                        2 * yy : 2 * yy + 2, 2 * xx : 2 * xx + 2
                    ].min()

    def _chain(self, y: int, x: int):
        return [(li, y >> li, x >> li)
                for li in range(len(self.levels) - 1, -1, -1)]

    def encode(self, wbit, y: int, x: int, threshold: int) -> None:
        low = 0
        for li, yy, xx in self._chain(y, x):
            if low > self.low[li][yy, xx]:
                self.low[li][yy, xx] = low
            else:
                low = int(self.low[li][yy, xx])
            v = int(self.value[li][yy, xx])
            while low < threshold:
                if low >= v:
                    if not self.known[li][yy, xx]:
                        wbit(1)
                        self.known[li][yy, xx] = True
                    break
                wbit(0)
                low += 1
            self.low[li][yy, xx] = low

    def decode(self, rbit, y: int, x: int, threshold: int) -> bool:
        """True when leaf value < threshold."""
        low = 0
        for li, yy, xx in self._chain(y, x):
            if low > self.low[li][yy, xx]:
                self.low[li][yy, xx] = low
            else:
                low = int(self.low[li][yy, xx])
            while low < threshold:
                if low >= self.value[li][yy, xx]:
                    break
                if rbit():
                    self.value[li][yy, xx] = low
                    break
                low += 1
            self.low[li][yy, xx] = low
        return int(self.value[0][y, x]) < threshold


# ---------------------------------------------------------------- packets


class _HdrWriter:
    """Packet-header bit writer with 0xFF stuffing (B.10.1)."""

    def __init__(self):
        self.out = bytearray()
        self.byte = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        self.byte = (self.byte << 1) | b
        self.nbits += 1
        if self.nbits == (7 if self._stuffed() else 8):
            self.out.append(self.byte)
            self.byte = 0
            self.nbits = 0

    def _stuffed(self) -> bool:
        return bool(self.out) and self.out[-1] == 0xFF

    def bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((value >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            pad = (7 if self._stuffed() else 8) - self.nbits
            self.out.append(self.byte << pad)
            self.byte = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


class _HdrReader:
    """Mirror of :class:`_HdrWriter` over a memoryview."""

    def __init__(self, data, pos: int):
        self.data = data
        self.pos = pos
        self.byte = 0
        self.nbits = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpx: packet header exhausted")
            self.byte = self.data[self.pos]
            if self.prev_ff and self.byte & 0x80:
                raise ValueError("jpx: missing stuffing bit")
            self.nbits = 7 if self.prev_ff else 8
            self.prev_ff = self.byte == 0xFF
            self.pos += 1
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of header: next byte boundary (plus the stuffed zero
        byte a trailing 0xFF forces)."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos < len(self.data) and self.data[self.pos] == 0:
                self.pos += 1
            self.prev_ff = False
        return self.pos


def _write_npasses(w: _HdrWriter, n: int) -> None:
    if n == 1:
        w.bit(0)
    elif n == 2:
        w.bits(0b10, 2)
    elif n <= 5:
        w.bits(0b11, 2)
        w.bits(n - 3, 2)
    elif n <= 36:
        w.bits(0b1111, 4)
        w.bits(n - 6, 5)
    elif n <= 164:
        w.bits(0b111111111, 9)
        w.bits(n - 37, 7)
    else:
        raise ValueError("jpx: too many coding passes")


def _read_npasses(r: _HdrReader) -> int:
    if not r.bit():
        return 1
    if not r.bit():
        return 2
    v = r.bits(2)
    if v != 3:
        return 3 + v
    v = r.bits(5)
    if v != 31:
        return 6 + v
    return 37 + r.bits(7)


def _band_dims(w: int, h: int, levels: int):
    """Per-resolution band geometry: [(band, bw, bh), ...] lists for
    res 0..levels (matching dwt53_forward's output shapes)."""
    dims = [(w, h)]
    for _ in range(levels):
        w2, h2 = dims[-1]
        dims.append(((w2 + 1) // 2, (h2 + 1) // 2))
    out = [[("LL", dims[levels][0], dims[levels][1])]]
    for r in range(1, levels + 1):
        lv = levels - r + 1  # wavelet level of this resolution
        full_w, full_h = dims[lv - 1]
        lo_w, lo_h = dims[lv]
        hi_w, hi_h = full_w - lo_w, full_h - lo_h
        out.append([("HL", hi_w, lo_h), ("LH", lo_w, hi_h),
                    ("HH", hi_w, hi_h)])
    return out


_CB_EXP = 6  # 64x64 code blocks


def _codeblocks(bw: int, bh: int):
    cb = 1 << _CB_EXP
    nx = (bw + cb - 1) // cb
    ny = (bh + cb - 1) // cb
    return nx, ny, cb


# ---------------------------------------------------------------- codestream

_GUARD = 2
_EXP = 29  # per-band exponent: Mb = guard + exp - 1 = 30 planes


def _default_mb(r: int, gname: str) -> int:
    return _GUARD + _EXP - 1


def _encode_tile(comp_bands: list, levels: int, w: int, h: int,
                 mb_of=_default_mb) -> bytes:
    """One tile's packet stream: LRCP, 1 layer, default precincts —
    packets ordered layer → resolution → component.  ``mb_of(r,
    gname)`` gives the per-band magnitude bit-plane count (fixed for
    the reversible path; εb + guard − 1 from the QCD for 9/7)."""
    out = bytearray()
    geom = _band_dims(w, h, levels)
    for r in range(levels + 1):
        for bands in comp_bands:  # per component
            hdr = _HdrWriter()
            hdr.bit(1)  # non-empty packet
            bodies = []
            if r == 0:
                blist = [("LL", bands[0])]
            else:
                hl, lh, hh = bands[r]
                blist = [("HL", hl), ("LH", lh), ("HH", hh)]
            for (bname, arr), (gname, bw, bh) in zip(blist, geom[r]):
                if (bw, bh) != (arr.shape[1], arr.shape[0]):
                    raise AssertionError("jpx: band geometry disagrees")
                if bw == 0 or bh == 0:
                    continue
                nx, ny, cb = _codeblocks(bw, bh)
                incl = TagTree(ny, nx)
                zbp = TagTree(ny, nx)
                coded = []
                for cy in range(ny):
                    for cx in range(nx):
                        block = arr[cy * cb : (cy + 1) * cb,
                                    cx * cb : (cx + 1) * cb]
                        data, npl = t1_encode(block, bname)
                        mb = mb_of(r, bname)
                        if npl > mb:
                            raise ValueError("jpx: coefficient too wide")
                        incl.set(cy, cx, 0)  # included in layer 0
                        zbp.set(cy, cx, mb - npl)
                        coded.append((cy, cx, data, npl, mb - npl))
                for cy, cx, data, npl, zb in coded:
                    incl.encode(hdr.bit, cy, cx, 1)
                    t = 1
                    while not (zb < t):
                        zbp.encode(hdr.bit, cy, cx, t)
                        t += 1
                    zbp.encode(hdr.bit, cy, cx, t)
                    npasses = max(1, 3 * npl - 2)
                    _write_npasses(hdr, npasses)
                    lblock = 3
                    nbits_len = lblock + int(npasses).bit_length() - 1
                    while len(data) >= (1 << nbits_len):
                        hdr.bit(1)
                        lblock += 1
                        nbits_len += 1
                    hdr.bit(0)
                    hdr.bits(len(data), nbits_len)
                    bodies.append(data)
            out += hdr.flush()
            for b in bodies:
                out += b
    return bytes(out)


def _decode_tile(data, pos: int, end: int, levels: int, w: int,
                 h: int, n_comp: int, mb_of=_default_mb) -> list:
    geom = _band_dims(w, h, levels)
    comp_bands = [[None] * (levels + 1) for _ in range(n_comp)]
    for r in range(levels + 1):
        for ci in range(n_comp):
            rdr = _HdrReader(data, pos)
            if not rdr.bit():  # empty packet: legal, all bands zero
                pos = rdr.align()
                zeros = [np.zeros((bh, bw), np.int64)
                         for _g, bw, bh in geom[r]]
                if r == 0:
                    comp_bands[ci][0] = zeros[0]
                else:
                    comp_bands[ci][r] = tuple(zeros)
                continue
            blocks_meta = []
            band_arrays = []
            for gname, bw, bh in geom[r]:
                arr = np.zeros((bh, bw), np.int64)
                band_arrays.append((gname, arr))
                if bw == 0 or bh == 0:
                    continue
                nx, ny, cb = _codeblocks(bw, bh)
                incl = TagTree(ny, nx, decoder=True)
                zbp = TagTree(ny, nx, decoder=True)
                for cy in range(ny):
                    for cx in range(nx):
                        if not incl.decode(rdr.bit, cy, cx, 1):
                            continue
                        t = 1
                        while not zbp.decode(rdr.bit, cy, cx, t):
                            t += 1
                        zb = t - 1
                        npasses = _read_npasses(rdr)
                        lblock = 3
                        while rdr.bit():
                            lblock += 1
                        nbits_len = lblock + int(npasses).bit_length() - 1
                        ln = rdr.bits(nbits_len)
                        npl = mb_of(r, gname) - zb
                        if npl < 0 or (npasses != max(1, 3 * npl - 2)
                                       and npl > 0):
                            raise ValueError(
                                "jpx: pass count outside the "
                                "all-passes subset"
                            )
                        blocks_meta.append((gname, arr, cy, cx, cb,
                                            ln, npl))
            pos = rdr.align()
            for gname, arr, cy, cx, cb, ln, npl in blocks_meta:
                if pos + ln > end:
                    raise ValueError("jpx: code-block data past tile")
                body = bytes(data[pos : pos + ln])
                pos += ln
                block = arr[cy * cb : (cy + 1) * cb,
                            cx * cb : (cx + 1) * cb]
                if npl > 0:
                    got = t1_decode(body, block.shape[0],
                                    block.shape[1], gname, npl)
                    block[...] = got
            if r == 0:
                for ci2 in (ci,):
                    comp_bands[ci2][0] = band_arrays[0][1]
            else:
                comp_bands[ci][r] = tuple(a for _, a in band_arrays)
    if pos != end:
        raise ValueError("jpx: trailing bytes in tile data")
    return comp_bands


def encode_jpx(arr: np.ndarray, levels: int = 2) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → lossless JPEG 2000
    codestream (reversible 5/3 + RCT, bit-exact round-trip)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        comps = [arr.astype(np.int64) - 128]
        mct = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.int64) - 128
        g = arr[:, :, 1].astype(np.int64) - 128
        b = arr[:, :, 2].astype(np.int64) - 128
        comps = [(r + 2 * g + b) >> 2, b - g, r - g]
        mct = 1
    else:
        raise ValueError("jpx: expected (H, W) or (H, W, 3) uint8")
    h, w = arr.shape[:2]
    comp_bands = [dwt53_forward(c, levels) for c in comps]
    tile = _encode_tile(comp_bands, levels, w, h)
    out = bytearray(b"\xff\x4f")  # SOC
    n_comp = len(comps)
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, n_comp)
    for _ in range(n_comp):
        siz += bytes([7, 1, 1])  # 8-bit unsigned, no subsampling
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = bytes([0])  # Scod: default precincts, no SOP/EPH
    cod += bytes([0]) + struct.pack(">H", 1) + bytes([mct])  # SGcod
    cod += bytes([levels, _CB_EXP - 2, _CB_EXP - 2, 0, 1])  # SPcod 5/3
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    qcd = bytes([(_GUARD << 5) | 0])  # Sqcd: no quantization
    for _ in range(3 * levels + 1):
        qcd += bytes([_EXP << 3])
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    psot = 12 + 2 + len(tile)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + tile
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _qcd_entries(levels: int):
    """QCD band order: LL, then per resolution HL, LH, HH."""
    out = [(0, "LL")]
    for r in range(1, levels + 1):
        out += [(r, "HL"), (r, "LH"), (r, "HH")]
    return out


def encode_jpx_97(arr: np.ndarray, levels: int = 2,
                  eps: int = 16, mu: int = 0) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → LOSSY JPEG 2000
    codestream (9/7 irreversible wavelet + Annex E scalar
    quantization + ICT for color).  ``eps``/``mu`` set every band's
    quantization exponent/mantissa (Δb = 2^(Rb−εb)·(1+μb/2^11) with
    the gain-table Rb); the default εb=16 is near-lossless (|err| ≲ 1
    at 8 bits).  Round trips through :func:`decode_jpx` within the
    documented Δb/2-per-coefficient bound — never bit-exact."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        comps = [arr.astype(np.float64) - 128.0]
        mct = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64) - 128.0
        g = arr[:, :, 1].astype(np.float64) - 128.0
        b = arr[:, :, 2].astype(np.float64) - 128.0
        # ICT (T.800 G.3, the published Rec.601 luma/chroma matrix)
        comps = [0.299 * r + 0.587 * g + 0.114 * b,
                 -0.168736 * r - 0.331264 * g + 0.5 * b,
                 0.5 * r - 0.418688 * g - 0.081312 * b]
        mct = 1
    else:
        raise ValueError("jpx: expected (H, W) or (H, W, 3) uint8")
    h, w = arr.shape[:2]
    if not 1 <= eps <= 31 or not 0 <= mu < 2048:
        raise ValueError("jpx: quantization parameters out of range")
    deltas = {(r_, g_): _quant_step(g_, eps, mu)
              for r_, g_ in _qcd_entries(levels)}

    def quantize(bands):
        out = [None] * (levels + 1)
        q = bands[0] / deltas[(0, "LL")]
        out[0] = (np.sign(q) * np.floor(np.abs(q))).astype(np.int64)
        for r_ in range(1, levels + 1):
            trio = []
            for g_, band in zip(("HL", "LH", "HH"), bands[r_]):
                q = band / deltas[(r_, g_)]
                trio.append((np.sign(q)
                             * np.floor(np.abs(q))).astype(np.int64))
            out[r_] = tuple(trio)
        return out

    comp_bands = [quantize(dwt97_forward(c, levels)) for c in comps]
    mb = _GUARD + eps - 1

    tile = _encode_tile(comp_bands, levels, w, h,
                        mb_of=lambda r_, g_: mb)
    out = bytearray(b"\xff\x4f")  # SOC
    n_comp = len(comps)
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, n_comp)
    for _ in range(n_comp):
        siz += bytes([7, 1, 1])
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = bytes([0])
    cod += bytes([0]) + struct.pack(">H", 1) + bytes([mct])
    cod += bytes([levels, _CB_EXP - 2, _CB_EXP - 2, 0, 0])  # SPcod 9/7
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    qcd = bytes([(_GUARD << 5) | 2])  # Sqcd: scalar expounded
    for _r, _g in _qcd_entries(levels):
        qcd += struct.pack(">H", (eps << 11) | mu)
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    psot = 12 + 2 + len(tile)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + tile
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpx(data: bytes) -> np.ndarray:
    """JPEG 2000 codestream (or JP2 wrapper) → (H, W) or (H, W, 3)
    uint8.  Raises ``ValueError`` outside the documented reversible
    subset."""
    data = bytes(data)
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        # JP2 box walk: find the contiguous codestream box
        pos = 0
        cs = None
        while pos + 8 <= len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            if ln == 0:
                ln = len(data) - pos
            if ln < 8:
                raise ValueError("jpx: bad JP2 box length")
            if tag == b"jp2c":
                cs = data[pos + 8 : pos + ln]
                break
            pos += ln
        if cs is None:
            raise ValueError("jpx: JP2 without a jp2c box")
        data = cs
    if data[:2] != b"\xff\x4f":
        raise ValueError("jpx: missing SOC marker")
    pos = 2
    w = h = None
    n_comp = 0
    levels = None
    mct = 0
    tile_end = None
    irreversible = False
    qcd_body = None
    while pos + 4 <= len(data):
        marker = data[pos : pos + 2]
        if marker == b"\xff\x93":  # SOD
            pos += 2
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == b"\xff\x51":  # SIZ
            if len(body) < 36:
                raise ValueError("jpx: truncated SIZ segment")
            (_r, xs, ys, xo, yo, xt, yt, xto, yto,
             n_comp) = struct.unpack(">HIIIIIIIIH", body[:36])
            if xo or yo or xto or yto or xt != xs or yt != ys:
                raise ValueError("jpx: tiled/offset grids unsupported")
            w, h = xs, ys
            if w * h * max(1, n_comp) > MAX_PIXELS:
                raise ValueError("jpx: image too large")
            if n_comp not in (1, 3):
                raise ValueError(f"jpx: {n_comp} components unsupported")
            if len(body) < 36 + 3 * n_comp:
                raise ValueError("jpx: SIZ shorter than its components")
            for ci in range(n_comp):
                ssiz, xr, yr = body[36 + 3 * ci : 39 + 3 * ci]
                if ssiz != 7 or xr != 1 or yr != 1:
                    raise ValueError(
                        "jpx: only 8-bit unsigned unsubsampled "
                        "components decode"
                    )
        elif marker == b"\xff\x52":  # COD
            if len(body) < 10:
                raise ValueError("jpx: truncated COD segment")
            scod = body[0]
            if scod & 0x07:
                raise ValueError(
                    "jpx: precinct/SOP/EPH coding styles unsupported"
                )
            prog = body[1]
            (layers,) = struct.unpack(">H", body[2:4])
            mct = body[4]
            levels = body[5]
            cbw, cbh, cbstyle, wavelet = body[6:10]
            if prog != 0 or layers != 1:
                raise ValueError(
                    "jpx: only single-layer LRCP decodes"
                )
            if cbstyle != 0:
                raise ValueError("jpx: code-block style options unsupported")
            if wavelet not in (0, 1):
                raise ValueError("jpx: unknown wavelet transformation")
            irreversible = wavelet == 0
            if cbw + 2 != _CB_EXP or cbh + 2 != _CB_EXP:
                raise ValueError("jpx: only 64x64 code blocks decode")
        elif marker == b"\xff\x5c":  # QCD
            if not body:
                raise ValueError("jpx: empty QCD segment")
            qcd_body = body  # validated after the loop (needs COD)
        elif marker == b"\xff\x90":  # SOT
            if len(body) < 8:
                raise ValueError("jpx: truncated SOT segment")
            (_isot, psot, _tp, _tn) = struct.unpack(">HIBB", body[:8])
            tile_end = pos + (psot if psot else len(data) - pos)
        elif marker in (b"\xff\x53", b"\xff\x5d", b"\xff\x5e"):
            # COC/QCC override per-component coding/quantization and
            # RGN shifts ROI coefficients — skipping any of them would
            # silently decode wrong pixels
            nm = {0x53: "COC", 0x5D: "QCC", 0x5E: "RGN"}[marker[1]]
            raise ValueError(
                f"jpx: {nm} per-component overrides undecoded"
            )
        elif marker in (b"\xff\x64", b"\xff\x63", b"\xff\x55",
                        b"\xff\x58"):
            pass  # COM/CRG/TLM/PLM: informational, skipped
        else:
            raise ValueError(
                f"jpx: unsupported marker {marker.hex()}"
            )
        pos += 2 + ln
    if w is None or levels is None or tile_end is None:
        raise ValueError("jpx: missing SIZ/COD/SOT")
    if qcd_body is None:
        raise ValueError("jpx: missing QCD")
    if qcd_body[0] >> 5 != _GUARD:
        raise ValueError(
            "jpx: guard-bit count outside the decoded subset"
        )
    entries = _qcd_entries(levels)
    deltas = {}
    mbs = {}
    if irreversible:
        # scalar-expounded quantization: one 16-bit SPqcd per band
        if qcd_body[0] & 0x1F != 2:
            raise ValueError(
                "jpx: 9/7 codestreams need scalar-expounded "
                "quantization (Sqcd style 2)"
            )
        if len(qcd_body) != 1 + 2 * len(entries):
            raise ValueError("jpx: QCD entry count disagrees with COD")
        for i, key in enumerate(entries):
            (v,) = struct.unpack(">H", qcd_body[1 + 2 * i : 3 + 2 * i])
            eps, mu = v >> 11, v & 0x7FF
            if _GUARD + eps - 1 <= 0:
                raise ValueError("jpx: QCD exponent leaves no planes")
            deltas[key] = _quant_step(key[1], eps, mu)
            mbs[key] = _GUARD + eps - 1
    else:
        if qcd_body[0] & 0x1F:
            raise ValueError("jpx: quantized codestreams undecoded")
        for sp in qcd_body[1:]:
            # reversible SPqcd: top 5 bits = band exponent; the tile
            # decoder assumes Mb = _GUARD + _EXP - 1, so a different
            # exponent must fail here, not via a downstream
            # pass-count mismatch
            if sp >> 3 != _EXP:
                raise ValueError(
                    "jpx: QCD band exponent outside the decoded "
                    "subset"
                )
        for key in entries:
            mbs[key] = _GUARD + _EXP - 1
    if data[tile_end - 2 : tile_end] == b"\xff\xd9":
        tile_end -= 2
    if data[-2:] != b"\xff\xd9":
        raise ValueError("jpx: missing EOC marker")
    end = tile_end if tile_end <= len(data) - 2 else len(data) - 2
    comp_bands = _decode_tile(data, pos, end, levels, w, h, n_comp,
                              mb_of=lambda r_, g_: mbs[(r_, g_)])
    planes = []
    if irreversible:
        def deq(q, key):
            # midpoint reconstruction (r = 1/2): error <= delta/2
            q = q.astype(np.float64)
            return (q + 0.5 * np.sign(q)) * deltas[key]

        for bands in comp_bands:
            flat = [deq(bands[0], (0, "LL"))]
            for r_ in range(1, levels + 1):
                flat.append(tuple(
                    deq(b_, (r_, g_))
                    for g_, b_ in zip(("HL", "LH", "HH"), bands[r_])
                ))
            planes.append(dwt97_inverse(flat))
        if n_comp == 1:
            return np.clip(np.rint(planes[0] + 128), 0,
                           255).astype(np.uint8)
        yy, cb, cr = planes
        r = yy + 1.402 * cr
        g = yy - 0.344136 * cb - 0.714136 * cr
        b = yy + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2) + 128
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    for bands in comp_bands:
        flat = [bands[0]] + [bands[r] for r in range(1, levels + 1)]
        planes.append(dwt53_inverse(flat))
    if n_comp == 1:
        return np.clip(planes[0] + 128, 0, 255).astype(np.uint8)
    y0, y1, y2 = planes
    g = y0 - ((y1 + y2) >> 2)
    b = y1 + g
    r = y2 + g
    rgb = np.stack([r, g, b], axis=2) + 128
    return np.clip(rgb, 0, 255).astype(np.uint8)
