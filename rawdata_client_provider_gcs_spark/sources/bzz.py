"""BZZ — DjVu's general-purpose compressor (ZP-coder + Burrows-Wheeler),
the codec behind the ``TXTz`` hidden-text, ``ANTz`` annotation and
``NAVM`` bookmark chunks.

Public structure (*DjVu Reference* v3, djvu.org, §"BSByteStream" and
§"The ZP-coder"): a BZZ stream is a sequence of blocks, each a
Burrows-Wheeler-transformed byte block whose BWT column is coded with
an adaptive quasi-move-to-front model driven by a ZP-coder — an
approximate binary arithmetic coder with a 251-state adaptation table
printed in the spec.  Per block:

- 24-bit block size via pass-through (context-free) ZP decisions;
  size 0 terminates the stream.  Size includes the BWT marker, so the
  plaintext contribution is ``size - 1`` bytes.
- 2 pass-through "estimation speed" bits selecting how fast the MTF
  frequency counters adapt (``fshift`` in 0..2).
- ``size`` MTF codes, each a unary-ish bucket choice over contexted ZP
  decisions followed by a binary-tree refinement within the bucket
  (buckets 0, 1, 2-3, 4-7, ..., 128-255, and a 257th "marker" escape
  that records the BWT marker position).  Decoded byte ranks rotate an
  adaptive frequency-ordered MTF list.
- inverse BWT over the decoded column (the marker acts as the implicit
  smallest sentinel) reproduces the plaintext block.

TRANSCRIPTION PROVENANCE — READ BEFORE TRUSTING CONFORMANCE: the
ZP-coder default state table below is transcribed from the public
*DjVu Reference* v3 table (the same spec-printed-constants class as the
zstd FSE and Theora tables elsewhere in this repo).  This container is
fully offline, so the transcription is from study of the public spec,
not a file copy.  Confidence tiers are annotated inline: entries 0-82
(the steady-state ramp — regular doubled-pair structure) are high
confidence; entries 83-146 (the early bootstrap lattice) are medium;
entries 147-250 (the deep bootstrap tail) carry REAL transcription
uncertainty and are flagged for adversarial spec check.  The BZZ
framing's internal checks (marker-position bounds, inverse-BWT walk
must land exactly on the marker) make silent corruption from a wrong
entry UNLIKELY but not impossible: a wrongly decoded column still
passes the walk whenever the induced permutation happens to be a
single cycle ending at the marker (roughly a 1/size chance per block),
so the bound is probabilistic.  Callers that can validate content
should (the TXTz path checks UTF-8 and the zone tree; DIRM/NAVM have
weaker framing and inherit the residual risk).  All in-repo
fixtures are produced by :func:`bzz_encode`, which shares the table, so
round-trips pin the MACHINERY (coder arithmetic, MTF, BWT, framing)
decoder-independently while the table awaits external conformance
fixtures.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); text extraction out of
scanned-document payloads is this repo's derived LLM-corpus tier.
"""

from __future__ import annotations

MAX_BLOCK = 4096 * 1024  # spec MAXBLOCK: 4 MB blocks
MAX_OUTPUT = 64 << 20    # decompression bomb guard (same cap class as zstd)

# ---------------------------------------------------------------------------
# ZP-coder default state table: (p, m, up, dn) per state.
# p: LPS-threshold increment; m: MPS-adaptation threshold; up/dn: next
# state after an MPS/LPS event.  State LSB is the current MPS bit.
# ---------------------------------------------------------------------------

_ZTABLE = [
    # --- steady-state ramp: high confidence -------------------------------
    (0x8000, 0x0000, 84, 145),
    (0x8000, 0x0000, 3, 4),
    (0x8000, 0x0000, 4, 3),
    (0x6BBD, 0x10A5, 5, 1),
    (0x6BBD, 0x10A5, 6, 2),
    (0x5D45, 0x1F28, 7, 3),
    (0x5D45, 0x1F28, 8, 4),
    (0x51B9, 0x2BD3, 9, 5),
    (0x51B9, 0x2BD3, 10, 6),
    (0x4813, 0x36E3, 11, 7),
    (0x4813, 0x36E3, 12, 8),
    (0x3FD5, 0x408C, 13, 9),
    (0x3FD5, 0x408C, 14, 10),
    (0x38B1, 0x48DF, 15, 11),
    (0x38B1, 0x48DF, 16, 12),
    (0x3275, 0x4FDF, 17, 13),
    (0x3275, 0x4FDF, 18, 14),
    (0x2CFD, 0x55EA, 19, 15),
    (0x2CFD, 0x55EA, 20, 16),
    (0x2825, 0x5B0D, 21, 17),
    (0x2825, 0x5B0D, 22, 18),
    (0x23AB, 0x5F55, 23, 19),
    (0x23AB, 0x5F55, 24, 20),
    (0x1F87, 0x62A8, 25, 21),
    (0x1F87, 0x62A8, 26, 22),
    (0x1BBB, 0x654B, 27, 23),
    (0x1BBB, 0x654B, 28, 24),
    (0x1845, 0x6763, 29, 25),
    (0x1845, 0x6763, 30, 26),
    (0x1523, 0x68F6, 31, 27),
    (0x1523, 0x68F6, 32, 28),
    (0x1253, 0x6A1E, 33, 29),
    (0x1253, 0x6A1E, 34, 30),
    (0x0FCF, 0x6AD5, 35, 31),
    (0x0FCF, 0x6AD5, 36, 32),
    (0x0D95, 0x6B4A, 37, 33),
    (0x0D95, 0x6B4A, 38, 34),
    (0x0B9D, 0x6B8F, 39, 35),
    (0x0B9D, 0x6B8F, 40, 36),
    (0x09E3, 0x6BB0, 41, 37),
    (0x09E3, 0x6BB0, 42, 38),
    (0x0861, 0x6BBA, 43, 39),
    (0x0861, 0x6BBA, 44, 40),
    (0x0711, 0x6BB8, 45, 41),
    (0x0711, 0x6BB8, 46, 42),
    (0x05F1, 0x6BB1, 47, 43),
    (0x05F1, 0x6BB1, 48, 44),
    (0x04F9, 0x6BAF, 49, 45),
    (0x04F9, 0x6BAF, 50, 46),
    (0x0425, 0x6BAB, 51, 47),
    (0x0425, 0x6BAB, 52, 48),
    (0x0371, 0x6BAA, 53, 49),
    (0x0371, 0x6BAA, 54, 50),
    (0x02D9, 0x6BA9, 55, 51),
    (0x02D9, 0x6BA9, 56, 52),
    (0x0259, 0x6BA8, 57, 53),
    (0x0259, 0x6BA8, 58, 54),
    (0x01ED, 0x6BA8, 59, 55),
    (0x01ED, 0x6BA8, 60, 56),
    (0x0193, 0x6BA8, 61, 57),
    (0x0193, 0x6BA8, 62, 58),
    (0x0149, 0x6BA8, 63, 59),
    (0x0149, 0x6BA8, 64, 60),
    (0x010B, 0x6BA8, 65, 61),
    (0x010B, 0x6BA8, 66, 62),
    (0x00D5, 0x6BA8, 67, 63),
    (0x00D5, 0x6BA8, 68, 64),
    (0x00A5, 0x6BA8, 69, 65),
    (0x00A5, 0x6BA8, 70, 66),
    (0x007B, 0x6BA8, 71, 67),
    (0x007B, 0x6BA8, 72, 68),
    (0x0057, 0x6BA8, 73, 69),
    (0x0057, 0x6BA8, 74, 70),
    (0x003B, 0x6BA8, 75, 71),
    (0x003B, 0x6BA8, 76, 72),
    (0x0023, 0x6BA8, 77, 73),
    (0x0023, 0x6BA8, 78, 74),
    (0x0013, 0x6BA8, 79, 75),
    (0x0013, 0x6BA8, 80, 76),
    (0x0007, 0x6BA8, 81, 77),
    (0x0007, 0x6BA8, 82, 78),
    (0x0001, 0x6BAF, 81, 79),
    (0x0001, 0x6BAF, 82, 80),
    # --- bootstrap lattice, early section (83-146): medium-confidence
    # transcription of the spec's order-aware counting automaton ------------
    (0x5695, 0x0000, 9, 85),
    (0x24EE, 0x0000, 86, 226),
    (0x8000, 0x0000, 5, 6),
    (0x0D30, 0x0000, 88, 176),
    (0x481A, 0x0000, 89, 143),
    (0x0481, 0x0000, 90, 138),
    (0x3579, 0x0000, 91, 141),
    (0x017A, 0x0000, 92, 112),
    (0x24EF, 0x0000, 93, 135),
    (0x007B, 0x0000, 94, 104),
    (0x1978, 0x0000, 95, 133),
    (0x0028, 0x0000, 96, 100),
    (0x10CA, 0x0000, 97, 129),
    (0x000D, 0x0000, 98, 98),
    (0x0B5D, 0x0000, 99, 127),
    (0x0034, 0x0000, 100, 72),
    (0x078A, 0x0000, 101, 125),
    (0x00A0, 0x0000, 102, 102),
    (0x050F, 0x0000, 103, 123),
    (0x0117, 0x0000, 104, 64),
    (0x0358, 0x0000, 105, 121),
    (0x01EA, 0x0000, 106, 106),
    (0x0234, 0x0000, 107, 119),
    (0x0144, 0x0000, 108, 56),
    (0x0173, 0x0000, 109, 117),
    (0x0234, 0x0000, 110, 110),
    (0x00F5, 0x0000, 111, 115),
    (0x0353, 0x0000, 112, 48),
    (0x00A1, 0x0000, 113, 113),
    (0x05C5, 0x0000, 114, 134),
    (0x011A, 0x0000, 115, 112),
    (0x03CF, 0x0000, 116, 132),
    (0x01AA, 0x0000, 117, 121),
    (0x0285, 0x0000, 118, 130),
    (0x0286, 0x0000, 119, 121),
    (0x01AB, 0x0000, 120, 128),
    (0x03D3, 0x0000, 121, 123),
    (0x011A, 0x0000, 122, 126),
    (0x05C5, 0x0000, 123, 125),
    (0x00BA, 0x0000, 124, 124),
    (0x08AD, 0x0000, 125, 143),
    (0x007A, 0x0000, 126, 126),
    (0x0CCC, 0x0000, 127, 141),
    (0x01EB, 0x0000, 128, 128),
    (0x1302, 0x0000, 129, 139),
    (0x02E6, 0x0000, 130, 130),
    (0x1B81, 0x0000, 131, 137),
    (0x045E, 0x0000, 132, 132),
    (0x24EF, 0x0000, 133, 135),
    (0x0690, 0x0000, 134, 134),
    (0x2865, 0x0000, 135, 133),
    (0x09DE, 0x0000, 136, 136),
    (0x3987, 0x0000, 137, 131),
    (0x0DC8, 0x0000, 138, 138),
    (0x2C99, 0x0000, 139, 129),
    (0x10CA, 0x0000, 140, 140),
    (0x3B5F, 0x0000, 141, 127),
    (0x0B5D, 0x0000, 142, 142),
    (0x5695, 0x0000, 143, 86),
    (0x078A, 0x0000, 144, 144),
    (0x8000, 0x0000, 145, 226),
    (0x050F, 0x0000, 146, 146),
    (0x24EE, 0x0000, 147, 87),
    (0x0358, 0x0000, 148, 148),
]

# --- bootstrap tail (147-250): SYNTHETIC, NOT TRANSCRIBED -----------------
# The spec's deep-bootstrap rows could not be recalled to transcription
# confidence offline, so rather than ship fake constants this block is a
# formula-generated sound adaptive lattice: confidence deepens along the
# polarity-preserving up-chain (probability halving per pair, exiting
# into the verified steady-state ramp), a contradiction drops into the
# near-0.5 ramp head with the observed bit as the new MPS.  Both encoder
# and decoder share it, so in-repo streams are exact; REAL-WORLD BZZ
# conformance through these states is NOT claimed (see module docstring;
# a wrong state is caught by the BWT checks with HIGH PROBABILITY, not
# certainty — the walk passes a wrong column when the induced
# permutation is a single cycle ending at the marker, ~1/size odds).
while len(_ZTABLE) <= 250:
    _k = len(_ZTABLE)
    _b = _k & 1                       # state LSB == current MPS bit
    _j = (_k - 147) >> 1              # confidence depth
    _ramp = min(3 + 2 * _j, 79)       # odd ramp entry at matching depth
    _up = _k + 2 if _k + 2 <= 250 else (_ramp if _b else _ramp + 1)
    _dn = 3 if _b == 0 else 4         # flip MPS toward the observed bit
    _ZTABLE.append((max(0x0013, 0x5695 >> _j), 0x0000, _up, _dn))
del _k, _b, _j, _ramp, _up, _dn

_P = [t[0] for t in _ZTABLE]
_M = [t[1] for t in _ZTABLE]
_UP = [t[2] for t in _ZTABLE]
_DN = [t[3] for t in _ZTABLE]

# leading-ones count of a 16-bit value (renormalization shift)
_FFZ = [0] * 65536
for _i in range(65536):
    _v, _n = _i, 0
    while _v & 0x8000:
        _n += 1
        _v = (_v << 1) & 0xFFFF
    _FFZ[_i] = _n
del _i, _v, _n


class ZPDecoder:
    """ZP-coder decoder over a byte string (DjVu Reference v3: fence
    fast path, interval-reversion clamp, multi-bit LPS renormalization
    via leading-ones count, 0xFF fabrication at EOF with a bounded
    allowance)."""

    __slots__ = ("data", "pos", "a", "code", "fence", "buffer",
                 "scount", "delay")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.a = 0
        b0 = self._byte()
        b1 = self._byte()
        self.code = (b0 << 8) | b1
        self.delay = 25
        self.scount = 0
        self.buffer = 0
        self._preload()
        self.fence = min(self.code, 0x7FFF)

    def _byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        return 0xFF

    def _preload(self) -> None:
        while self.scount <= 24:
            if self.pos < len(self.data):
                b = self.data[self.pos]
                self.pos += 1
            else:
                b = 0xFF
                self.delay -= 1
                if self.delay < 1:
                    raise ValueError("bzz: coded stream exhausted")
            self.buffer = ((self.buffer << 8) | b) & 0xFFFFFFFF
            self.scount += 8

    def decode(self, ctx: list, i: int) -> int:
        """One contexted decision; adapts ``ctx[i]`` in place."""
        state = ctx[i]
        z = self.a + _P[state]
        if z <= self.fence:
            self.a = z
            return state & 1
        d = 0x6000 + ((z + self.a) >> 2)
        if z > d:
            z = d
        bit = state & 1
        if z > self.code:
            # LPS
            z = 0x10000 - z
            self.a += z
            self.code += z
            ctx[i] = _DN[state]
            shift = _FFZ[self.a]
            self.scount -= shift
            self.a = (self.a << shift) & 0xFFFF
            self.code = ((self.code << shift) & 0xFFFF) | (
                (self.buffer >> self.scount) & ((1 << shift) - 1)
            )
            if self.scount < 16:
                self._preload()
            self.fence = min(self.code, 0x7FFF)
            return bit ^ 1
        # MPS
        if self.a >= _M[state]:
            ctx[i] = _UP[state]
        self.scount -= 1
        self.a = (z << 1) & 0xFFFF
        self.code = ((self.code << 1) & 0xFFFF) | (
            (self.buffer >> self.scount) & 1
        )
        if self.scount < 16:
            self._preload()
        self.fence = min(self.code, 0x7FFF)
        return bit

    def decode_raw(self) -> int:
        """One pass-through (context-free, non-adaptive) decision."""
        z = 0x8000 + (self.a >> 1)
        if z > self.code:
            z = 0x10000 - z
            self.a += z
            self.code += z
            shift = _FFZ[self.a]
            self.scount -= shift
            self.a = (self.a << shift) & 0xFFFF
            self.code = ((self.code << shift) & 0xFFFF) | (
                (self.buffer >> self.scount) & ((1 << shift) - 1)
            )
            if self.scount < 16:
                self._preload()
            self.fence = min(self.code, 0x7FFF)
            return 1
        self.scount -= 1
        self.a = (z << 1) & 0xFFFF
        self.code = ((self.code << 1) & 0xFFFF) | (
            (self.buffer >> self.scount) & 1
        )
        if self.scount < 16:
            self._preload()
        self.fence = min(self.code, 0x7FFF)
        return 0

    def decode_bits(self, nbits: int) -> int:
        """``nbits`` pass-through bits, MSB first (spec decode_raw)."""
        n = 1
        m = 1 << nbits
        while n < m:
            n = (n << 1) | self.decode_raw()
        return n - m

    def decode_binary(self, ctx: list, base: int, nbits: int) -> int:
        """Binary-tree contexted refinement: node ``n`` adapts
        ``ctx[base + n - 1]`` (spec decode_binary)."""
        n = 1
        m = 1 << nbits
        while n < m:
            n = (n << 1) | self.decode(ctx, base + n - 1)
        return n - m


class ZPEncoder:
    """ZP-coder encoder — the mathematical dual of :class:`ZPDecoder`,
    used for fixture construction.

    The decoder's acceptance region after every decision is the
    upward interval ``code >= low`` in its (delta-adjusted) window, so
    the encoder tracks one exact big integer ``w``: the low bound of
    the adjusted value over ALL bits emitted so far (window = low 16
    bits, finalized prefix above).  An LPS adds the same delta the
    decoder adds to ``code`` (carries ripple into the prefix
    naturally); a renormalization appends one fresh zero bit.  The
    raw byte stream is the bitwise complement of ``w``'s bits — the
    decoder's EOF fabrication (0xFF bytes) extends the complement of
    the all-zero tail indefinitely, so the lazy-minimal low bound is
    emitted verbatim with no carry-counting machinery.  Fixtures are
    built in memory; no streaming requirement."""

    __slots__ = ("a", "w", "nbits")

    def __init__(self):
        self.a = 0
        self.w = 0       # low bound over all emitted bits (big int)
        self.nbits = 16  # the decoder pre-reads a 16-bit window

    def _export(self) -> None:
        while self.a >= 0x8000:
            self.w <<= 1
            self.nbits += 1
            self.a = (self.a << 1) & 0xFFFF

    def encode(self, bit: int, ctx: list, i: int) -> None:
        state = ctx[i]
        z = self.a + _P[state]
        if bit == (state & 1):
            if z >= 0x8000:
                d = 0x6000 + ((z + self.a) >> 2)
                if z > d:
                    z = d
                if self.a >= _M[state]:
                    ctx[i] = _UP[state]
                self.a = z
                self._export()
            else:
                self.a = z
        else:
            d = 0x6000 + ((z + self.a) >> 2)
            if z > d:
                z = d
            ctx[i] = _DN[state]
            z = 0x10000 - z
            self.w += z
            self.a += z
            self._export()

    def encode_raw(self, bit: int) -> None:
        z = 0x8000 + (self.a >> 1)
        if bit:
            z = 0x10000 - z
            self.w += z
            self.a += z
        else:
            self.a = z
        self._export()

    def encode_bits(self, value: int, nbits: int) -> None:
        n = 1
        m = 1 << nbits
        v = value + m
        while n < m:
            b = (v >> (nbits - 1)) & 1
            self.encode_raw(b)
            n = (n << 1) | b
            nbits -= 1

    def encode_binary(self, value: int, ctx: list, base: int,
                      nbits: int) -> None:
        n = 1
        m = 1 << nbits
        v = value + m
        while n < m:
            b = (v >> (nbits - 1)) & 1
            self.encode(b, ctx, base + n - 1)
            n = (n << 1) | b
            nbits -= 1

    def flush(self) -> bytes:
        """Render the raw byte stream (complement of the low bound,
        padded with raw 1s to a byte boundary)."""
        if self.w >> self.nbits:  # pragma: no cover - coder invariant
            raise AssertionError("zp: low bound overflowed 1.0")
        nbytes = (self.nbits + 7) // 8
        pad = nbytes * 8 - self.nbits
        raw = ((1 << (nbytes * 8)) - 1) ^ (self.w << pad)
        return raw.to_bytes(nbytes, "big")


# ---------------------------------------------------------------------------
# BSByteStream: MTF + BWT framing over the ZP coder
# ---------------------------------------------------------------------------

_CTXIDS = 3
_NCTX = 300  # context slots per the spec layout (260 used)


def _decode_block(zp: ZPDecoder, ctx: list) -> bytes | None:
    size = zp.decode_bits(24)
    if size == 0:
        return None
    if size > MAX_BLOCK:
        raise ValueError("bzz: block size over the 4 MB cap")
    fshift = 0
    if zp.decode_raw():
        fshift = 1
        if zp.decode_raw():
            fshift = 2
    mtf = list(range(256))
    freq = [0, 0, 0, 0]
    fadd = 4
    data = bytearray(size)
    mtfno = 3
    markerpos = -1
    for i in range(size):
        ctxid = mtfno if mtfno < _CTXIDS - 1 else _CTXIDS - 1
        if zp.decode(ctx, ctxid):
            mtfno = 0
        elif zp.decode(ctx, _CTXIDS + ctxid):
            mtfno = 1
        elif zp.decode(ctx, 2 * _CTXIDS):
            mtfno = 2 + zp.decode_binary(ctx, 2 * _CTXIDS + 1, 1)
        elif zp.decode(ctx, 2 * _CTXIDS + 2):
            mtfno = 4 + zp.decode_binary(ctx, 2 * _CTXIDS + 3, 2)
        elif zp.decode(ctx, 2 * _CTXIDS + 6):
            mtfno = 8 + zp.decode_binary(ctx, 2 * _CTXIDS + 7, 3)
        elif zp.decode(ctx, 2 * _CTXIDS + 14):
            mtfno = 16 + zp.decode_binary(ctx, 2 * _CTXIDS + 15, 4)
        elif zp.decode(ctx, 2 * _CTXIDS + 30):
            mtfno = 32 + zp.decode_binary(ctx, 2 * _CTXIDS + 31, 5)
        elif zp.decode(ctx, 2 * _CTXIDS + 62):
            mtfno = 64 + zp.decode_binary(ctx, 2 * _CTXIDS + 63, 6)
        elif zp.decode(ctx, 2 * _CTXIDS + 126):
            mtfno = 128 + zp.decode_binary(ctx, 2 * _CTXIDS + 127, 7)
        else:
            # the 257th symbol: the BWT marker
            mtfno = 256
            data[i] = 0
            if markerpos >= 0:
                raise ValueError("bzz: duplicate BWT marker")
            markerpos = i
            continue
        c = mtf[mtfno]
        data[i] = c
        # adaptive frequency-ordered rotation
        fadd += fadd >> fshift
        if fadd > 0x10000000:
            fadd >>= 24
            freq[0] >>= 24
            freq[1] >>= 24
            freq[2] >>= 24
            freq[3] >>= 24
        fc = fadd
        if mtfno < 4:
            fc += freq[mtfno]
        k = mtfno
        while k >= 4:
            mtf[k] = mtf[k - 1]
            k -= 1
        while k > 0 and fc >= freq[k - 1]:
            mtf[k] = mtf[k - 1]
            freq[k] = freq[k - 1]
            k -= 1
        mtf[k] = c
        freq[k] = fc
    if markerpos < 1 or markerpos >= size:
        raise ValueError("bzz: BWT marker position out of range")
    # inverse BWT (marker = implicit smallest sentinel at sorted row 0)
    count = [0] * 256
    posn = [0] * size
    for i in range(size):
        if i == markerpos:
            continue
        c = data[i]
        posn[i] = (c << 24) | (count[c] & 0xFFFFFF)
        count[c] += 1
    last = 1
    for c in range(256):
        tmp = count[c]
        count[c] = last
        last += tmp
    out = bytearray(size - 1)
    i = 0
    last = size - 1
    while last > 0:
        if i < 0 or i >= size or i == markerpos:
            raise ValueError("bzz: inverse BWT walk out of range")
        n = posn[i]
        c = n >> 24
        last -= 1
        out[last] = c
        i = count[c] + (n & 0xFFFFFF)
    if i != markerpos:
        raise ValueError("bzz: inverse BWT walk does not end at marker")
    return bytes(out)


def bzz_decode(data: bytes, max_bytes: int = MAX_OUTPUT) -> bytes:
    """Decode a BZZ stream → plaintext bytes.  Raises ``ValueError``
    on malformed input or when output exceeds ``max_bytes`` (bomb
    guard)."""
    zp = ZPDecoder(data)
    ctx = [0] * _NCTX
    out = bytearray()
    while True:
        block = _decode_block(zp, ctx)
        if block is None:
            return bytes(out)
        out += block
        if len(out) > max_bytes:
            raise ValueError("bzz: output over the decompression cap")


# ---------------------------------------------------------------------------
# Encoder (fixture writer)
# ---------------------------------------------------------------------------


def _suffix_array(s: bytes) -> list:
    """Prefix-doubling suffix array of ``s`` + implicit smallest
    sentinel (returned array covers positions 0..len(s), sentinel
    suffix first)."""
    n = len(s) + 1
    rank = [s[i] + 1 if i < n - 1 else 0 for i in range(n)]
    sa = sorted(range(n), key=lambda i: rank[i])
    k = 1
    tmp = [0] * n
    while True:
        def key(i):
            return (rank[i], rank[i + k] if i + k < n else -1)

        sa.sort(key=key)
        tmp[sa[0]] = 0
        for j in range(1, n):
            tmp[sa[j]] = tmp[sa[j - 1]] + (key(sa[j]) != key(sa[j - 1]))
        rank = tmp[:]
        if rank[sa[-1]] == n - 1:
            return sa
        k <<= 1


def _encode_block(zp: ZPEncoder, ctx: list, block: bytes,
                  fshift: int) -> None:
    """Forward BWT + MTF dual of :func:`_decode_block`."""
    n = len(block)
    size = n + 1
    zp.encode_bits(size, 24)
    zp.encode_raw(1 if fshift >= 1 else 0)
    if fshift >= 1:
        zp.encode_raw(1 if fshift >= 2 else 0)
    # BWT column over rotations of block+sentinel: sorting rotations
    # equals sorting suffixes because the sentinel is unique/smallest.
    sa = _suffix_array(block)
    col = bytearray(size)
    markerpos = -1
    for row, start in enumerate(sa):
        if start == 0:
            markerpos = row  # predecessor is the sentinel
            col[row] = 0
        else:
            col[row] = block[start - 1]
    # (decision-context, tree-base, bucket-low, tree-bits) per level;
    # the first two levels use the running-mtfno refinement slot
    levels = (
        (None, None, 0, 0),
        (None, None, 1, 0),
        (2 * _CTXIDS, 2 * _CTXIDS + 1, 2, 1),
        (2 * _CTXIDS + 2, 2 * _CTXIDS + 3, 4, 2),
        (2 * _CTXIDS + 6, 2 * _CTXIDS + 7, 8, 3),
        (2 * _CTXIDS + 14, 2 * _CTXIDS + 15, 16, 4),
        (2 * _CTXIDS + 30, 2 * _CTXIDS + 31, 32, 5),
        (2 * _CTXIDS + 62, 2 * _CTXIDS + 63, 64, 6),
        (2 * _CTXIDS + 126, 2 * _CTXIDS + 127, 128, 7),
    )
    mtf = list(range(256))
    pos = list(range(256))  # pos[c] = index of c in mtf (O(1) lookup)
    freq = [0, 0, 0, 0]
    fadd = 4
    prev = 3  # running mtfno context selector, reset per block
    for i in range(size):
        mtfno = 256 if i == markerpos else pos[col[i]]
        ctxid = prev if prev < _CTXIDS - 1 else _CTXIDS - 1
        if mtfno == 0:
            zp.encode(1, ctx, ctxid)
        elif mtfno == 1:
            zp.encode(0, ctx, ctxid)
            zp.encode(1, ctx, _CTXIDS + ctxid)
        else:
            zp.encode(0, ctx, ctxid)
            zp.encode(0, ctx, _CTXIDS + ctxid)
            for dec, base, low, bits in levels[2:]:
                if mtfno < low + (1 << bits):
                    zp.encode(1, ctx, dec)
                    zp.encode_binary(mtfno - low, ctx, base, bits)
                    break
                zp.encode(0, ctx, dec)
            # falling through all levels encodes the 257th (marker)
        prev = mtfno
        if mtfno == 256:
            continue
        c = col[i]
        fadd += fadd >> fshift
        if fadd > 0x10000000:
            fadd >>= 24
            freq[0] >>= 24
            freq[1] >>= 24
            freq[2] >>= 24
            freq[3] >>= 24
        fc = fadd
        if mtfno < 4:
            fc += freq[mtfno]
        k = mtfno
        while k >= 4:
            mtf[k] = mtf[k - 1]
            pos[mtf[k]] = k
            k -= 1
        while k > 0 and fc >= freq[k - 1]:
            mtf[k] = mtf[k - 1]
            pos[mtf[k]] = k
            freq[k] = freq[k - 1]
            k -= 1
        mtf[k] = c
        pos[c] = k
        freq[k] = fc


def bzz_encode(data: bytes, blocksize: int = 64 * 1024,
               fshift: int = 1) -> bytes:
    """Encode plaintext → BZZ stream (fixture writer; arbitrary block
    partition is legal — the decoder concatenates blocks until the
    zero-size terminator)."""
    if not 0 <= fshift <= 2:
        raise ValueError("bzz: fshift must be 0..2")
    if blocksize < 1 or blocksize > MAX_BLOCK - 1:
        raise ValueError("bzz: bad blocksize")
    zp = ZPEncoder()
    ctx = [0] * _NCTX
    for off in range(0, len(data), blocksize):
        _encode_block(zp, ctx, data[off : off + blocksize], fshift)
    zp.encode_bits(0, 24)  # terminator
    return zp.flush()
