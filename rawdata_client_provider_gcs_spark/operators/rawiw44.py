"""IW44 — DjVu's wavelet image codec (BG44/FG44/PM44 chunks), r16.

The DjVu v3 reference describes IW44 as an interpolating-wavelet
transform coded as ZP-driven bit slices over 32×32 coefficient blocks:
each block's 1024 coefficients sit in 64 buckets of 16, organized into
10 bands (the coarse 4×4 low-pass bucket, then the three orientation
bands of each scale), and each "slice" refines one magnitude bit plane
through significance/refinement decisions — the EZW shape.

Provenance tiers (the BZZ/VP9/JB2 discipline):

- REAL (spec structure): the chunk header (serial, slice count,
  version, big-endian dimensions), the 32×32 block / 64-bucket / 16
  coefficient organization with the 1 + 3 + 3×4 + 3×16 bucket-per-band
  ladder, the interpolating (4,4) lifting pair (predict
  ``(9, 9; −1, −1)/16``, update ``…/32`` — the Deslauriers-Dubuc
  filters the format is named for), and the ZP coder.
- SYNTHETIC-SUBSET, marked: the slice model here uses one
  bucket-activation and one coefficient-significance context per band
  (the reference interleaves a finer context schedule), signs and
  refinement bits pass through raw, and the transform runs 3
  interleaved levels (what the 4×4 low-pass bucket geometry implies)
  with documented ``(x+8)>>4`` / ``(x+16)>>5`` roundings.  Encoder
  and decoder share every decision, and the INTEGER lifting is
  bijective, so full-slice fixtures decode VALUE-EXACTLY; real-world
  BG44 stays the per-row boundary (doubly so while the ZP table's
  high-state tail is formula-reconstructed, ``sources/bzz.py``).

Color chunks (r16) decode too: three Y/Cb/Cr plane sets share one
slice stream, the header's gray flag (0x80 = NO chroma, the
DjVuLibre convention) routes decode, and the crcbdelay byte starts
chroma coding that many slices after luma (the total slice count
grows by the delay, so full-fidelity color round-trips stay
value-exact).  Out of scope, loud: progressive multi-chunk serials,
masked wavelet projection, and partial-slice truncation on decode
(the encoder only writes full-fidelity streams).

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
decoding is this repo's derived multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np

from ..sources.bzz import ZPDecoder, ZPEncoder

_LEVELS = 3
_BLOCK = 32
# each coefficient costs up to one Python ZP decision PER SLICE, so
# the pixel cap and the pixel x slice budget together bound hostile
# CPU (~30 s of coder calls); real full-page DjVu is the documented
# throughput boundary (SCALE.md)
MAX_PIXELS = 1 << 20
MAX_DECISIONS = 1 << 25

#: band ladder: (level, orientation) per band; band 0 is the 4×4
#: low-pass bucket of the coarsest level
_BANDS = [("LL", 3), ("HL", 3), ("LH", 3), ("HH", 3),
          ("HL", 2), ("LH", 2), ("HH", 2),
          ("HL", 1), ("LH", 1), ("HH", 1)]


def _mirror(i: int, n: int) -> int:
    """Whole-sample symmetric extension for ANY index (periodic
    double reflection — a single reflection under-corrects once
    ``|i|`` exceeds ``2n-2``, which tiny vectors hit)."""
    if n == 1:
        return 0
    period = 2 * n - 2
    i %= period
    return period - i if i >= n else i


def _lift1d(v: np.ndarray, inverse: bool) -> None:
    """In-place interpolating (4,4) lifting on one vector: odd
    positions become highs (predict), even positions lows (update)."""
    n = len(v)
    if n < 2:
        return

    def val(i):
        return int(v[_mirror(i, n)])

    def predict(sign):
        for k in range(1, n, 2):
            p = 9 * (val(k - 1) + val(k + 1)) \
                - (val(k - 3) + val(k + 3))
            v[k] += sign * ((p + 8) >> 4)

    def update(sign):
        for k in range(0, n, 2):
            u = 9 * (val(k - 1) + val(k + 1)) \
                - (val(k - 3) + val(k + 3))
            v[k] += sign * ((u + 16) >> 5)

    if not inverse:
        predict(-1)
        update(+1)
    else:
        update(-1)
        predict(+1)


def _transform(img: np.ndarray, inverse: bool) -> None:
    """3-level interleaved 2D transform in place (vertical then
    horizontal per level, reversed on inverse)."""
    h, w = img.shape
    levels = range(_LEVELS) if not inverse else reversed(range(_LEVELS))
    for lv in levels:
        s = 1 << lv
        sub = img[::s, ::s]
        sh, sw = sub.shape
        if not inverse:
            for c in range(sw):
                col = sub[:, c].copy()
                _lift1d(col, False)
                sub[:, c] = col
            for r in range(sh):
                row = sub[r, :].copy()
                _lift1d(row, False)
                sub[r, :] = row
        else:
            for r in range(sh):
                row = sub[r, :].copy()
                _lift1d(row, True)
                sub[r, :] = row
            for c in range(sw):
                col = sub[:, c].copy()
                _lift1d(col, True)
                sub[:, c] = col


def _bucket_coords():
    """Per band: list of buckets, each a list of 16 (y, x) block
    coordinates.  Interleaved layout: scale-ℓ coefficients live on the
    stride-2^ℓ grid; orientation from the parity at that stride."""
    out = []
    for orient, lv in _BANDS:
        s = 1 << lv
        half = s >> 1
        if orient == "LL":
            ys = range(0, _BLOCK, s)
            xs = range(0, _BLOCK, s)
        elif orient == "HL":  # high horizontally
            ys = range(0, _BLOCK, s)
            xs = range(half, _BLOCK, s)
        elif orient == "LH":
            ys = range(half, _BLOCK, s)
            xs = range(0, _BLOCK, s)
        else:
            ys = range(half, _BLOCK, s)
            xs = range(half, _BLOCK, s)
        coords = [(y, x) for y in ys for x in xs]
        # split row-major into buckets of 16
        buckets = [coords[i : i + 16] for i in range(0, len(coords), 16)]
        if any(len(b) != 16 for b in buckets):
            raise AssertionError("iw44: bucket geometry broken")
        out.append(buckets)
    return out


_BUCKETS = _bucket_coords()


class _PlaneState:
    """One component's slice-coding state: coefficient blocks, the
    per-coefficient significance planes, and this plane's adaptive
    contexts (each component keeps its own ZP context set)."""

    def __init__(self, coeff_blocks, nplanes, decode):
        self.blocks = coeff_blocks
        if decode:
            self.sp = [np.full((_BLOCK, _BLOCK), -1, np.int32)
                       for _ in coeff_blocks]
        else:
            self.sp = []
            for cb in coeff_blocks:
                mag = np.abs(cb)
                sp = np.full((_BLOCK, _BLOCK), -1, np.int32)
                nz = mag > 0
                sp[nz] = np.int32(np.floor(np.log2(mag[nz])))
                self.sp.append(sp)
                if mag.max() >= (1 << nplanes):
                    raise ValueError(
                        "iw44: coefficient wider than planes")
        self.bucket_ctx = [[0] for _ in range(len(_BANDS))]
        self.coeff_ctx = [[0] for _ in range(len(_BANDS))]


def _code_plane_slice(zp, st: "_PlaneState", plane: int,
                      decode: bool) -> None:
    """One bitplane of one component: per band × block × bucket, a
    bucket-activation decision, per-coefficient significance + raw
    sign, then raw refinement bits (the EZW shape)."""
    bit = 1 << plane
    for bi, buckets in enumerate(_BUCKETS):
        for blk, cb in enumerate(st.blocks):
            sp = st.sp[blk]
            for bucket in buckets:
                # "not yet significant" agrees across directions:
                # decoder's undiscovered (-1) set IS the encoder's
                # sig_plane <= current-plane set
                if decode:
                    news = [(y, x) for y, x in bucket if sp[y, x] < 0]
                else:
                    news = [(y, x) for y, x in bucket
                            if sp[y, x] <= plane]
                if news:
                    if decode:
                        active = zp.decode(st.bucket_ctx[bi], 0)
                    else:
                        active = int(any(sp[y, x] == plane
                                         for y, x in news))
                        zp.encode(active, st.bucket_ctx[bi], 0)
                    if active:
                        for y, x in news:
                            if decode:
                                if zp.decode(st.coeff_ctx[bi], 0):
                                    neg = zp.decode_raw()
                                    cb[y, x] = -bit if neg else bit
                                    sp[y, x] = plane
                            else:
                                sig = 1 if sp[y, x] == plane else 0
                                zp.encode(sig, st.coeff_ctx[bi], 0)
                                if sig:
                                    zp.encode_raw(
                                        1 if cb[y, x] < 0 else 0)
                # refinement: significant since an EARLIER plane
                for y, x in bucket:
                    if sp[y, x] > plane:
                        if decode:
                            if zp.decode_raw():
                                cb[y, x] += (bit if cb[y, x] > 0
                                             else -bit)
                        else:
                            zp.encode_raw(
                                1 if (abs(int(cb[y, x])) & bit)
                                else 0)


def _code_slices(zp, coeff_blocks, nplanes: int, decode: bool) -> None:
    """Gray slice walk (single component, MSB→LSB)."""
    st = _PlaneState(coeff_blocks, nplanes, decode)
    for plane in range(nplanes - 1, -1, -1):
        _code_plane_slice(zp, st, plane, decode)


def _code_slices_color(zp, plane_blocks: list, nplanes: int,
                       delay: int, decode: bool) -> None:
    """Color slice walk: per slice, the luma bitplane then — once
    ``delay`` slices have passed (the crcbdelay semantics: chroma
    starts late, trading its fidelity for early luma) — the two
    chroma bitplanes.  Total slices = nplanes + delay so chroma is
    fully coded."""
    states = [_PlaneState(b, nplanes, decode) for b in plane_blocks]
    for si in range(nplanes + delay):
        for pi, st in enumerate(states):
            shift = 0 if pi == 0 else delay
            plane = nplanes - 1 - (si - shift)
            if si < shift or plane < 0 or plane >= nplanes:
                continue
            _code_plane_slice(zp, st, plane, decode)


def _pad32(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ph = (h + _BLOCK - 1) // _BLOCK * _BLOCK
    pw = (w + _BLOCK - 1) // _BLOCK * _BLOCK
    return np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_iw44(arr: np.ndarray) -> bytes:
    """(H, W) uint8 gray → one full-fidelity IW44 chunk body (exact
    dual of :func:`decode_iw44`; integer lifting + all bit planes =
    value-exact round trip)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim != 2:
        raise ValueError("iw44: expected a (H, W) gray image")
    h, w = arr.shape
    if h == 0 or w == 0 or h * w > MAX_PIXELS:
        raise ValueError("iw44: image size outside bounds")
    img = _pad32(arr.astype(np.int64) - 128)
    _transform(img, inverse=False)
    ph, pw = img.shape
    blocks = [img[by : by + _BLOCK, bx : bx + _BLOCK]
              for by in range(0, ph, _BLOCK)
              for bx in range(0, pw, _BLOCK)]
    maxmag = max(int(np.abs(b).max()) for b in blocks)
    nplanes = max(1, maxmag.bit_length())
    zp = ZPEncoder()
    _code_slices(zp, blocks, nplanes, decode=False)
    body = zp.flush()
    # serial 0, slices (= planes here), major (0x80 = NO chroma, the
    # DjVuLibre flag convention), minor, height/width BE, crcbdelay
    hdr = struct.pack(">BBBBHHB", 0, nplanes, 0x81, 2, w, h, 0)
    return hdr + body


def _split_blocks(img: np.ndarray) -> list:
    ph, pw = img.shape
    return [img[by : by + _BLOCK, bx : bx + _BLOCK]
            for by in range(0, ph, _BLOCK)
            for bx in range(0, pw, _BLOCK)]


def encode_iw44_color(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                      *, delay: int = 0) -> bytes:
    """(H, W) uint8 Y/Cb/Cr planes (chroma centered on 128) → one
    full-fidelity COLOR IW44 chunk body.  ``delay`` is the crcbdelay:
    chroma slice coding starts that many slices after luma (0 keeps
    the round trip value-exact; the total slice count grows by the
    delay so chroma still codes fully)."""
    y = np.asarray(y, np.uint8)
    cb = np.asarray(cb, np.uint8)
    cr = np.asarray(cr, np.uint8)
    if y.ndim != 2 or y.shape != cb.shape or y.shape != cr.shape:
        raise ValueError("iw44: Y/Cb/Cr planes must share one shape")
    h, w = y.shape
    if h == 0 or w == 0 or 3 * h * w > MAX_PIXELS:
        raise ValueError("iw44: image size outside bounds")
    if not 0 <= delay <= 16:
        raise ValueError("iw44: crcbdelay outside bounds")
    plane_blocks = []
    maxmag = 1
    for plane in (y, cb, cr):
        img = _pad32(plane.astype(np.int64) - 128)
        _transform(img, inverse=False)
        blocks = _split_blocks(img)
        maxmag = max(maxmag,
                     max(int(np.abs(b).max()) for b in blocks))
        plane_blocks.append(blocks)
    nplanes = max(1, maxmag.bit_length())
    zp = ZPEncoder()
    _code_slices_color(zp, plane_blocks, nplanes, delay, decode=False)
    body = zp.flush()
    hdr = struct.pack(">BBBBHHB", 0, nplanes + delay, 0x01, 2, w, h,
                      delay)
    return hdr + body


def _parse_header(data: bytes):
    if len(data) < 9:
        raise ValueError("iw44: chunk shorter than its header")
    serial, slices, major, _minor, w, h, delay = struct.unpack(
        ">BBBBHHB", data[:9])
    if serial != 0:
        raise ValueError("iw44: continuation serials undecoded")
    if (major & 0x7F) != 1:
        raise ValueError("iw44: unknown major version")
    if slices < 1 or slices > 64:
        raise ValueError("iw44: slice count outside bounds")
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("iw44: image size outside bounds")
    return slices, bool(major & 0x80), w, h, delay


def iw44_is_gray(data: bytes) -> bool:
    return _parse_header(bytes(data))[1]


def _decision_guard(w: int, h: int, slices: int,
                    planes: int = 1) -> None:
    ph = (h + _BLOCK - 1) // _BLOCK * _BLOCK
    pw = (w + _BLOCK - 1) // _BLOCK * _BLOCK
    if planes * ph * pw * slices > MAX_DECISIONS:
        raise ValueError("iw44: pixel x slice budget over the cap (bomb)")


def decode_iw44(data: bytes) -> np.ndarray:
    """Gray IW44 chunk body → (H, W) uint8.  Color chunks decode via
    :func:`decode_iw44_color` (this raises on them loudly)."""
    data = bytes(data)
    slices, gray, w, h, delay = _parse_header(data)
    _decision_guard(w, h, slices)
    if not gray:
        raise ValueError(
            "iw44: color chunk (decode via decode_iw44_color)"
        )
    if delay != 0:
        raise ValueError("iw44: crcbdelay on a gray chunk")
    ph = (h + _BLOCK - 1) // _BLOCK * _BLOCK
    pw = (w + _BLOCK - 1) // _BLOCK * _BLOCK
    img = np.zeros((ph, pw), np.int64)
    zp = ZPDecoder(data[9:])
    _code_slices(zp, _split_blocks(img), slices, decode=True)
    _transform(img, inverse=True)
    return np.clip(img[:h, :w] + 128, 0, 255).astype(np.uint8)


def decode_iw44_color(data: bytes) -> tuple:
    """Color IW44 chunk body → (Y, Cb, Cr) uint8 planes."""
    data = bytes(data)
    slices, gray, w, h, delay = _parse_header(data)
    if gray:
        raise ValueError("iw44: gray chunk (decode via decode_iw44)")
    if 3 * w * h > MAX_PIXELS:
        raise ValueError("iw44: image size outside bounds")
    _decision_guard(w, h, slices, 3)
    nplanes = slices - delay
    if nplanes < 1:
        raise ValueError("iw44: crcbdelay exceeds the slice count")
    ph = (h + _BLOCK - 1) // _BLOCK * _BLOCK
    pw = (w + _BLOCK - 1) // _BLOCK * _BLOCK
    imgs = [np.zeros((ph, pw), np.int64) for _ in range(3)]
    zp = ZPDecoder(data[9:])
    _code_slices_color(zp, [_split_blocks(i) for i in imgs],
                       nplanes, delay, decode=True)
    out = []
    for img in imgs:
        _transform(img, inverse=True)
        out.append(np.clip(img[:h, :w] + 128, 0, 255).astype(np.uint8))
    return tuple(out)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                 cr: np.ndarray) -> np.ndarray:
    """Standard Rec.601 full-range conversion (the JPEG matrix) →
    (H, W, 3) uint8 RGB."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)
