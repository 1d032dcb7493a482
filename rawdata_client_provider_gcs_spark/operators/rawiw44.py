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

Out of scope, loud: color chrominance planes (the crcbdelay
machinery), progressive multi-chunk serials, masked wavelet
projection, and partial-slice truncation on decode (the encoder only
writes full-fidelity streams).

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
MAX_PIXELS = 4 << 20

#: band ladder: (level, orientation) per band; band 0 is the 4×4
#: low-pass bucket of the coarsest level
_BANDS = [("LL", 3), ("HL", 3), ("LH", 3), ("HH", 3),
          ("HL", 2), ("LH", 2), ("HH", 2),
          ("HL", 1), ("LH", 1), ("HH", 1)]


def _mirror(i: int, n: int) -> int:
    if i < 0:
        i = -i
    if i >= n:
        i = (2 * n - 2 - i) if n > 1 else 0
    return i


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


def _code_slices(zp, coeff_blocks, nplanes: int, decode: bool) -> None:
    """The EZW-shaped slice walk, shared by both directions: per
    plane (MSB→LSB) × band × block × bucket, a bucket-activation
    decision, per-coefficient significance + raw sign, then raw
    refinement bits for coefficients significant since an earlier
    plane.  ``coeff_blocks`` holds int64 (BLOCK, BLOCK) arrays —
    encoder truth in, decoder reconstruction out (exact once every
    plane is coded, since the lifting is integer)."""
    n_blocks = len(coeff_blocks)
    if decode:
        # plane at which each coefficient became significant (-1 =
        # not yet); filled in as discovered
        sig_plane = [np.full((_BLOCK, _BLOCK), -1, np.int32)
                     for _ in range(n_blocks)]
    else:
        # encoder knows it up front: highest set bit of |c|
        sig_plane = []
        for cb in coeff_blocks:
            mag = np.abs(cb)
            sp = np.full((_BLOCK, _BLOCK), -1, np.int32)
            nz = mag > 0
            sp[nz] = np.int32(np.floor(np.log2(mag[nz])))
            sig_plane.append(sp)
            if mag.max() >= (1 << nplanes):
                raise ValueError("iw44: coefficient wider than planes")
    bucket_ctx = [[0] for _ in range(len(_BANDS))]
    coeff_ctx = [[0] for _ in range(len(_BANDS))]
    for plane in range(nplanes - 1, -1, -1):
        bit = 1 << plane
        for bi, buckets in enumerate(_BUCKETS):
            for blk in range(n_blocks):
                cb = coeff_blocks[blk]
                sp = sig_plane[blk]
                for bucket in buckets:
                    # "not yet significant" agrees across directions:
                    # decoder's undiscovered (-1) set IS the encoder's
                    # sig_plane <= current-plane set
                    if decode:
                        news = [(y, x) for y, x in bucket
                                if sp[y, x] < 0]
                    else:
                        news = [(y, x) for y, x in bucket
                                if sp[y, x] <= plane]
                    if news:
                        if decode:
                            active = zp.decode(bucket_ctx[bi], 0)
                        else:
                            active = int(any(sp[y, x] == plane
                                             for y, x in news))
                            zp.encode(active, bucket_ctx[bi], 0)
                        if active:
                            for y, x in news:
                                if decode:
                                    if zp.decode(coeff_ctx[bi], 0):
                                        neg = zp.decode_raw()
                                        cb[y, x] = -bit if neg else bit
                                        sp[y, x] = plane
                                else:
                                    s = 1 if sp[y, x] == plane else 0
                                    zp.encode(s, coeff_ctx[bi], 0)
                                    if s:
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
    # serial 0, slices (= planes here), major (gray: 1), minor,
    # height/width big-endian, initial-delay byte
    hdr = struct.pack(">BBBBHHB", 0, nplanes, 1, 2, w, h, 0)
    return hdr + body


def decode_iw44(data: bytes) -> np.ndarray:
    """IW44 chunk body → (H, W) uint8 gray.  Raises ``ValueError``
    outside the documented subset (first serial chunk, gray, full
    fidelity)."""
    data = bytes(data)
    if len(data) < 9:
        raise ValueError("iw44: chunk shorter than its header")
    serial, slices, major, _minor, w, h, delay = struct.unpack(
        ">BBBBHHB", data[:9])
    if serial != 0:
        raise ValueError("iw44: continuation serials undecoded")
    if major & 0x80:
        raise ValueError("iw44: color chunks outside the decoded subset")
    if (major & 0x7F) != 1:
        raise ValueError("iw44: unknown major version")
    if delay != 0:
        raise ValueError("iw44: crcbdelay outside the decoded subset")
    if slices < 1 or slices > 48:
        raise ValueError("iw44: slice count outside bounds")
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("iw44: image size outside bounds")
    ph = (h + _BLOCK - 1) // _BLOCK * _BLOCK
    pw = (w + _BLOCK - 1) // _BLOCK * _BLOCK
    img = np.zeros((ph, pw), np.int64)
    blocks = [img[by : by + _BLOCK, bx : bx + _BLOCK]
              for by in range(0, ph, _BLOCK)
              for bx in range(0, pw, _BLOCK)]
    zp = ZPDecoder(data[9:])
    _code_slices(zp, blocks, slices, decode=True)
    _transform(img, inverse=True)
    return np.clip(img[:h, :w] + 128, 0, 255).astype(np.uint8)
