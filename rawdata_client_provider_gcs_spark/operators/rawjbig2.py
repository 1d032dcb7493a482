"""JBIG2 (ITU-T T.88) — generic-region decoding for scanned PDFs.

Scanned PDFs (the dominant archival shape) carry their page masks as
``/JBIG2Decode`` streams; this module decodes the GENERIC REGION
subset — the arithmetic-coded bilevel workhorse — so those images
become pixels instead of per-image error rows:

- **MQ-coder** (Annex E): the context-adaptive binary arithmetic coder
  shared with JPEG 2000.  The 47-state probability table below is the
  spec-printed Table E.1 (Qe, NMPS, NLPS, SWITCH) — the same
  spec-printed-constants class as the zstd FSE and Theora tables
  elsewhere in this repo.  Decoder and encoder implement the
  software-conventions procedures (INITDEC/BYTEIN/DECODE,
  INITENC/CODEMPS/CODELPS/BYTEOUT/FLUSH).
- **Generic region** (§6.2): templates 0-3 with nominal or custom AT
  pixels, context built from the template's pixels in raster order,
  and TPGDON typical-prediction rows gated by the per-template SLTP
  contexts (0x9B25 / 0x0795 / 0x00E5 / 0x0195).  The MMR=1 variant is
  ITU-T T.6 two-dimensional coding and routes to the verified CCITT
  G4 decoder (:mod:`.rawccitt`).
- **Embedded stream** (§7, the PDF organization): sequential segment
  headers (referred-to bookkeeping, 1/4-byte page association),
  page-information segments, immediate generic-region segments
  composed onto the page bitmap (OR / AND / XOR / XNOR / REPLACE).
- OUT OF SCOPE, loud: symbol dictionaries, text/halftone/refinement
  regions, unknown-length segments — each raises ``ValueError`` naming
  the segment type for per-image error capture.

The fixture encoder emits spec-shaped embedded streams (page info +
immediate generic region) through the dual MQ encoder, so decode paths
are pinned by pixel-exact round-trips plus the CCITT cross-check for
MMR.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); media decoding is this
repo's derived multimodal tier.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64 << 20
MAX_SEGMENTS = 4096

#: ITU-T T.88 Table E.1 — (Qe, NMPS, NLPS, SWITCH)
MQ_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)
_QE = [t[0] for t in MQ_TABLE]
_NMPS = [t[1] for t in MQ_TABLE]
_NLPS = [t[2] for t in MQ_TABLE]
_SWITCH = [t[3] for t in MQ_TABLE]


class MQDecoder:
    """Annex E software-conventions decoder.  Context state lives in
    caller-owned ``icx``/``mps`` arrays indexed by context value."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, icx: list, mps: list, cx: int) -> int:
        i = icx[cx]
        qe = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            if self.a < qe:  # MPS exchange
                d = mps[cx]
                icx[cx] = _NMPS[i]
            else:
                d = 1 - mps[cx]
                if _SWITCH[i]:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = _NLPS[i]
            self.a = qe
            while self.a < 0x8000:
                if self.ct == 0:
                    self._bytein()
                self.a <<= 1
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
            return d
        self.c -= qe << 16
        if self.a & 0x8000:
            return mps[cx]
        if self.a < qe:  # LPS exchange
            d = 1 - mps[cx]
            if _SWITCH[i]:
                mps[cx] = 1 - mps[cx]
            icx[cx] = _NLPS[i]
        else:
            d = mps[cx]
            icx[cx] = _NMPS[i]
        while self.a < 0x8000:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d


class MQEncoder:
    """Annex E software-conventions encoder (fixture writer dual)."""

    __slots__ = ("out", "c", "a", "ct", "b")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.b = -1  # pending byte (virtual B before the first byteout)

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self._emit(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._emit(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry: pre-increment b <= 0xFE (the stuffing branch above
            # catches 0xFF), so the carry never ripples further back
            self.b += 1
            self.c &= 0x7FFFFFF
            if self.b == 0xFF:
                self._emit(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self._emit(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def _emit(self, nb: int) -> None:
        if self.b >= 0:
            self.out.append(self.b)
        self.b = nb

    def encode(self, d: int, icx: list, mps: list, cx: int) -> None:
        i = icx[cx]
        qe = _QE[i]
        self.a -= qe
        if d == mps[cx]:
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = _NMPS[i]
        else:
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                mps[cx] = 1 - mps[cx]
            icx[cx] = _NLPS[i]
        while True:
            if self.ct == 0:
                self._byteout()
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b >= 0:
            self.out.append(self.b)
        # drop trailing 0xFF (decoder fabricates 1-bits past the end)
        while self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Generic region (§6.2)
# ---------------------------------------------------------------------------

#: fixed template pixels (x, y) per GBTEMPLATE, before AT insertion
_FIXED = (
    ((-1, -2), (0, -2), (1, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
     (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2), (2, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
     (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2),
     (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-2, 0), (-1, 0)),
    ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
)
#: nominal AT pixels per template
NOMINAL_AT = (
    ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    ((3, -1),),
    ((2, -1),),
    ((2, -1),),
)
#: SLTP (typical prediction) contexts per template (§6.2.5.7)
_SLTP_CX = (0x9B25, 0x0795, 0x00E5, 0x0195)


def _template_pixels(template: int, at) -> list:
    if not 0 <= template <= 3:
        raise ValueError(f"jbig2: GBTEMPLATE {template} out of range")
    at = tuple(at) if at is not None else NOMINAL_AT[template]
    if len(at) != len(NOMINAL_AT[template]):
        raise ValueError("jbig2: wrong AT pixel count for template")
    for ax, ay in at:
        if not (-128 <= ax <= 127 and -128 <= ay <= 0):
            raise ValueError("jbig2: AT pixel out of range")
        if ay == 0 and ax >= 0:
            raise ValueError("jbig2: AT pixel not strictly causal")
    pix = list(_FIXED[template]) + list(at)
    # raster order (y then x) defines the context bit order, MSB first
    pix.sort(key=lambda p: (p[1], p[0]))
    return pix


def _region_pass(width, height, template, at, tpgdon, coder, bits=None):
    """Shared decode/encode walk: ``bits is None`` decodes (returns the
    bitmap), else encodes ``bits``.  ``coder`` is the MQ en/decoder.

    The context splits into an above-rows part (independent of the
    current row — vectorized per row) and a current-row register that
    slides one decoded pixel at a time, so the per-pixel loop does one
    OR instead of a 10-16 pixel gather."""
    pix = _template_pixels(template, at)
    decode = bits is None
    ncx = 1 << len(pix)
    icx = [0] * ncx
    mps = [0] * ncx
    pad = 128  # AT reach <= 128 either side, 2 rows above
    plane = np.zeros((height + 2, width + 2 * pad), dtype=np.uint8)
    if not decode:
        src = np.asarray(bits, dtype=np.uint8)
        if src.shape != (height, width):
            raise ValueError("jbig2: bitmap shape disagrees")
    sltp = _SLTP_CX[template]
    ltp = 0
    # raster order puts all dy<0 pixels first (high bits) and the
    # current row's dy==0 pixels last; nominal/causal ATs with dy<0
    # keep that split exact.  A dy==0 pixel other than the fixed
    # trailing run falls back to the general gather.
    above_pix = [(dx, dy) for dx, dy in pix if dy < 0]
    row_pix = [(dx, dy) for dx, dy in pix if dy == 0]
    n_row = len(row_pix)
    fast = all(
        dx == -(n_row - i) for i, (dx, _) in enumerate(row_pix)
    )
    row_mask = (1 << n_row) - 1
    for y in range(height):
        if tpgdon:
            if decode:
                ltp ^= coder.decode(icx, mps, sltp)
            else:
                typical = (not src[0].any()) if y == 0 else bool(
                    (src[y] == src[y - 1]).all()
                )
                bit = 1 if typical != bool(ltp) else 0
                coder.encode(bit, icx, mps, sltp)
                ltp ^= bit
            if ltp:
                plane[y + 2, pad : pad + width] = plane[
                    y + 1, pad : pad + width
                ]
                continue
        row = plane[y + 2]
        if fast:
            hi = np.zeros(width, dtype=np.int64)
            for dx, dy in above_pix:
                hi = (hi << 1) | plane[y + dy + 2, pad + dx : pad + dx
                                       + width].astype(np.int64)
            hi <<= n_row
            hi_l = hi.tolist()
            cur = 0
            if decode:
                dec = coder.decode
                for x in range(width):
                    v = dec(icx, mps, hi_l[x] | cur)
                    row[pad + x] = v
                    cur = ((cur << 1) | v) & row_mask
            else:
                enc = coder.encode
                srow = src[y].tolist()
                for x in range(width):
                    v = srow[x]
                    enc(v, icx, mps, hi_l[x] | cur)
                    row[pad + x] = v
                    cur = ((cur << 1) | v) & row_mask
        else:
            offs = [(pad + dx, dy + 2) for dx, dy in pix]
            for x in range(width):
                cx = 0
                for dxp, dyp in offs:
                    cx = (cx << 1) | plane[y + dyp, x + dxp]
                if decode:
                    v = coder.decode(icx, mps, cx)
                    row[pad + x] = v
                else:
                    v = int(src[y, x])
                    coder.encode(v, icx, mps, cx)
                    row[pad + x] = v
    if decode:
        return plane[2:, pad : pad + width].copy()
    return None


def decode_generic_region(data, width, height, template=0, at=None,
                          tpgdon=False):
    """MQ-coded generic region → (H, W) uint8 bit plane (1 = black)."""
    if width <= 0 or height <= 0 or width * height > MAX_PIXELS:
        raise ValueError("jbig2: region dimensions out of range")
    return _region_pass(width, height, template, at, tpgdon,
                        MQDecoder(data))


def encode_generic_region(bits, template=0, at=None, tpgdon=False):
    """Fixture dual of :func:`decode_generic_region`."""
    bits = np.asarray(bits, dtype=np.uint8)
    height, width = bits.shape
    enc = MQEncoder()
    _region_pass(width, height, template, at, tpgdon, enc, bits)
    return enc.flush()


# ---------------------------------------------------------------------------
# Embedded stream (§7 — the PDF organization)
# ---------------------------------------------------------------------------


def _segments(data: bytes):
    """Sequential segment-header walk → (type, page, payload bytes)."""
    pos = 0
    n = len(data)
    count = 0
    while pos < n:
        if pos + 11 > n:
            raise ValueError("jbig2: truncated segment header")
        (_num,) = struct.unpack(">I", data[pos : pos + 4])
        flags = data[pos + 4]
        stype = flags & 0x3F
        pa4 = bool(flags & 0x40)
        pos += 5
        rts = data[pos]
        cnt = rts >> 5
        if cnt == 7:
            (cnt,) = struct.unpack(">I", data[pos : pos + 4])
            cnt &= 0x1FFFFFFF
            if cnt > MAX_SEGMENTS:
                raise ValueError("jbig2: referred-segment count over cap")
            pos += 4 + (cnt + 8) // 8  # retain bits
        else:
            pos += 1
        ref_size = 1 if _num <= 256 else (2 if _num <= 65536 else 4)
        pos += cnt * ref_size
        pos += 4 if pa4 else 1
        if pos + 4 > n:
            raise ValueError("jbig2: truncated segment header")
        (dlen,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if dlen == 0xFFFFFFFF:
            raise ValueError("jbig2: unknown-length segment unsupported")
        if pos + dlen > n:
            raise ValueError("jbig2: segment data past end of stream")
        yield stype, data[pos : pos + dlen]
        pos += dlen
        count += 1
        if count > MAX_SEGMENTS:
            raise ValueError("jbig2: segment count over the cap")


#: external-combination operators (§7.4.8.5)
_COMBINE = {0: "or", 1: "and", 2: "xor", 3: "xnor", 4: "replace"}


def decode_jbig2(data: bytes, globals_data: bytes | None = None) -> dict:
    """Embedded-format JBIG2 (the ``/JBIG2Decode`` organization) →
    ``{"width", "height", "bits"}`` with 1 = black.  Supports page
    info + immediate generic regions (MQ or MMR); symbol/text/halftone
    /refinement segments raise with the segment type named."""
    page_w = page_h = None
    page = None
    default = 0
    streams = ([globals_data] if globals_data else []) + [data]
    for blob in streams:
        for stype, payload in _segments(blob):
            if stype == 48:  # page information
                if len(payload) < 17:
                    raise ValueError("jbig2: short page-info segment")
                page_w, page_h = struct.unpack(">II", payload[:8])
                pflags = payload[16]
                default = (pflags >> 2) & 1
                if page_h == 0xFFFFFFFF:
                    page_h = None
                if page_w * (page_h or 1) > MAX_PIXELS:
                    raise ValueError("jbig2: page too large")
                if page_h is not None:
                    page = np.full((page_h, page_w), default, np.uint8)
            elif stype in (36, 38, 39):  # generic region
                if len(payload) < 18:
                    raise ValueError("jbig2: short generic-region segment")
                w, h, x, y = struct.unpack(">IIII", payload[:16])
                combop = payload[16] & 7
                gflags = payload[17]
                mmr = gflags & 1
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                if w * h > MAX_PIXELS:
                    raise ValueError("jbig2: region too large")
                pos = 18
                at = None
                if not mmr:
                    n_at = 4 if template == 0 else 1
                    at = []
                    for _ in range(n_at):
                        if pos + 2 > len(payload):
                            raise ValueError("jbig2: truncated AT pixels")
                        ax, ay = struct.unpack(
                            "bb", payload[pos : pos + 2]
                        )
                        at.append((ax, ay))
                        pos += 2
                body = payload[pos:]
                if mmr:
                    if tpgdon:
                        raise ValueError("jbig2: TPGDON with MMR")
                    from . import rawccitt

                    bits = rawccitt.decode_g4(body, w, h)
                    bits = np.asarray(bits, dtype=np.uint8)
                else:
                    bits = decode_generic_region(body, w, h, template,
                                                 at, tpgdon)
                if page is None:
                    if page_w is None:
                        raise ValueError(
                            "jbig2: region before page information"
                        )
                    page_h2 = y + h
                    page = np.full((page_h2, page_w), default, np.uint8)
                if (y + h > page.shape[0] or x + w > page.shape[1]):
                    raise ValueError("jbig2: region outside the page")
                dst = page[y : y + h, x : x + w]
                op = _COMBINE.get(combop)
                if op == "or":
                    dst |= bits
                elif op == "and":
                    dst &= bits
                elif op == "xor":
                    dst ^= bits
                elif op == "xnor":
                    dst[...] = 1 - (dst ^ bits)
                elif op == "replace":
                    dst[...] = bits
                else:
                    raise ValueError(
                        f"jbig2: combination operator {combop} reserved"
                    )
            elif stype in (49, 50, 51, 62):
                continue  # end-of-page/stripe/file, extension: no-op
            else:
                raise ValueError(
                    f"jbig2: segment type {stype} outside the "
                    "generic-region subset (symbol/text/halftone/"
                    "refinement undecoded)"
                )
    if page is None:
        raise ValueError("jbig2: no page produced")
    return {"width": page.shape[1], "height": page.shape[0],
            "bits": page}


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _segment(num: int, stype: int, payload: bytes, page: int = 1) -> bytes:
    return (struct.pack(">IB", num, stype) + b"\x00"
            + bytes([page]) + struct.pack(">I", len(payload)) + payload)


def build_jbig2(bits, *, template: int = 0, at=None, tpgdon: bool = False,
                mmr: bool = False, combop: int = 0,
                default_pixel: int = 0, x: int = 0, y: int = 0,
                page_size=None) -> bytes:
    """Embedded-format fixture: page-info segment + one immediate
    generic-region segment (MQ templates 0-3 / TPGDON, or MMR through
    the CCITT G4 encoder)."""
    bits = np.asarray(bits, dtype=np.uint8)
    h, w = bits.shape
    pw, ph = page_size or (x + w, y + h)
    pflags = (default_pixel & 1) << 2
    page_info = struct.pack(">IIII", pw, ph, 0, 0) + bytes([pflags]) \
        + struct.pack(">H", 0)
    out = _segment(0, 48, page_info)
    gflags = (1 if mmr else 0) | (template << 1) | (8 if tpgdon else 0)
    payload = struct.pack(">IIII", w, h, x, y) + bytes([combop & 7,
                                                        gflags])
    if mmr:
        from . import rawccitt

        body = rawccitt.encode_g4(bits)
    else:
        atl = list(at) if at is not None else list(NOMINAL_AT[template])
        for ax, ay in atl:
            payload += struct.pack("bb", ax, ay)
        body = encode_generic_region(bits, template, atl, tpgdon)
    out += _segment(1, 38, payload + body)
    out += _segment(2, 49, b"")  # end of page
    return out
