"""Zstandard (RFC 8878) — pure-Python frame decoder for ``.zst`` wrappers.

``.tar.zst`` is the modern default dump shape (distro packages, dataset
mirrors); until this module it was whole-file data loss.  Everything
here is implemented from the public spec, RFC 8878:

- frame walk: magic ``0xFD2FB528``, frame header (window descriptor,
  dictionary id, frame content size), data blocks, optional XXH64
  content checksum (verified), skippable frames (``0x184D2A5x``);
- block types raw / RLE / compressed (§3.1.1.2);
- literals: raw / RLE / Huffman-compressed (1 and 4 streams) /
  treeless repeat (§3.1.1.3.1), Huffman weights direct or
  FSE-compressed (§4.2.1);
- sequences: predefined / RLE / FSE-compressed / repeat table modes
  for literal-length, offset and match-length codes, the three-slot
  repeated-offset history, and sequence execution against the in-frame
  window (§3.1.1.3.2).

The predefined FSE distributions transcribed in this file are the ones
PRINTED in RFC 8878 §3.1.1.3.2.2 — small, spec-stated, offline-
verifiable — which is what moves zstd inside the honesty boundary that
still excludes e.g. brotli's embedded dictionary.  Verification has no
fixture-mirror loophole: the decoder is pinned against frames written
by the system ``zstd`` CLI across levels/shapes, and the CLI reads the
raw-block frames :func:`build_zst` emits — two-direction interop.

Decompression only.  The engine never needs to WRITE zstd (fixtures
use raw-block frames, which are trivially valid zstd); a real
compressor would quadruple the module for no reachability gain.

Dictionaries (RFC 8878 §5) are supported both ways a crawl meets
them: passed explicitly (``dict_data``) or embedded in a leading
``0x184D2A5D`` skippable frame — raw, structured, or itself
zstd-compressed — the Common Crawl ``.warc.zst`` convention.  A
structured dictionary's entropy tables (HUF→OF→ML→LL), repeat
offsets, and content prefix seed each frame's context.

Bomb/hostility contract matches the archive tier: output caps
enforced while decoding, ``ValueError`` on malformed bytes for
per-row capture, ``UnsupportedCodecError`` only for frames that
declare a dictionary id when no dictionary is available (undecodable
without out-of-band data, like a 7z AES chain).

Reference behavioral parity: the reference transport requires stored
files to be readable to be part of the stream
(GCSRawdataUtils.java:99-114); transparent wrappers belong to this
repo's derived ingestion tier like gzip/lz4/xz (sources/archive.py).
"""

from __future__ import annotations

import struct

from ..operators.rawavi import UnsupportedCodecError

MAX_OUTPUT_BYTES = 1 << 30

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
DICT_MAGIC = b"\x37\xa4\x30\xec"  # 0xEC30A437 LE (RFC 8878 §5)
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
#: the web-archive convention (Common Crawl .warc.zst): the shared
#: dictionary rides a leading skippable frame with THIS magic, raw or
#: itself zstd-compressed
_SKIPPABLE_DICT = 0x184D2A5D
_BLOCK_MAX = 1 << 17  # a block regenerates at most 128 KiB (§3.1.1.2.3)

# ---------------------------------------------------------------------------
# XXH64 (xxHash spec) — zstd content checksums
# ---------------------------------------------------------------------------

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 over ``data`` — the checksum zstd frames carry (low 32
    bits stored).  32-byte stripes stream through ``iter_unpack``; the
    sequential lane dependency rules out wider vectorization."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        stripes = (n // 32) * 32
        p1, p2, m = _P64_1, _P64_2, _M64
        for a, b, c, d in struct.iter_unpack("<QQQQ", data[:stripes]):
            v1 = (v1 + a * p2) & m
            v1 = (((v1 << 31) | (v1 >> 33)) & m) * p1 & m
            v2 = (v2 + b * p2) & m
            v2 = (((v2 << 31) | (v2 >> 33)) & m) * p1 & m
            v3 = (v3 + c * p2) & m
            v3 = (((v3 << 31) | (v3 >> 33)) & m) * p1 & m
            v4 = (v4 + d * p2) & m
            v4 = (((v4 << 31) | (v4 >> 33)) & m) * p1 & m
        i = stripes
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _rotl64((v * _P64_2) & _M64, 31) * _P64_1 & _M64
            h = ((h * _P64_1) + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = _rotl64((k * _P64_2) & _M64, 31) * _P64_1 & _M64
        h = ((_rotl64(h ^ k, 27) * _P64_1) + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = ((_rotl64(h, 23) * _P64_2) + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bit readers
# ---------------------------------------------------------------------------


class _BackBits:
    """zstd's backward bitstream (§3.1.1.3.2.1.1): bits are written
    LSB-first per byte but READ from the last byte's padding sentinel
    downward.  Maintains a bounded accumulator (no big-int shifts, so
    a 128 KiB literals stream stays O(n))."""

    __slots__ = ("buf", "ptr", "acc", "navail", "overdrawn")

    def __init__(self, buf: bytes):
        if not buf:
            raise ValueError("zstd: empty bitstream")
        last = buf[-1]
        if last == 0:
            raise ValueError("zstd: bitstream without its padding sentinel")
        sent = last.bit_length() - 1
        self.buf = buf
        self.ptr = len(buf) - 1  # bytes not yet in the accumulator
        self.acc = last & ((1 << sent) - 1)
        self.navail = sent
        self.overdrawn = False

    def _refill(self) -> None:
        while self.navail <= 48 and self.ptr > 0:
            take = min(6, self.ptr)
            self.ptr -= take
            chunk = int.from_bytes(
                self.buf[self.ptr : self.ptr + take], "little"
            )
            self.acc = (self.acc << (8 * take)) | chunk
            self.navail += 8 * take

    def remaining(self) -> int:
        return self.navail + 8 * self.ptr

    def read(self, n: int) -> int:
        """Read ``n`` bits; zero-pads past the start and sets
        ``overdrawn`` (FSE weight decoding terminates on overdraw;
        everything else treats it as corruption at the final check)."""
        if n == 0:
            return 0
        if self.navail < n:
            self._refill()
        if self.navail < n:
            pad = n - self.navail
            self.overdrawn = True
            v = (self.acc << pad) & ((1 << n) - 1)
            self.acc = 0
            self.navail = 0
            return v
        self.navail -= n
        v = (self.acc >> self.navail) & ((1 << n) - 1)
        self.acc &= (1 << self.navail) - 1
        return v

    def peek(self, n: int) -> int:
        """Peek ``n`` bits without consuming (zero-padded past start)."""
        if self.navail < n:
            self._refill()
        if self.navail < n:
            return (self.acc << (n - self.navail)) & ((1 << n) - 1)
        return (self.acc >> (self.navail - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.navail < n:
            self._refill()
        if self.navail < n:
            raise ValueError("zstd: bitstream overdraw")
        self.navail -= n
        self.acc &= (1 << self.navail) - 1


# ---------------------------------------------------------------------------
# FSE (§4.1)
# ---------------------------------------------------------------------------


def _fse_read_distribution(
    buf: bytes, max_al: int, max_symbols: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description (forward, LSB-first).  Returns
    (probabilities, accuracy_log, bytes consumed)."""
    # descriptions are tiny; 1 KiB covers 256 symbols at worst
    region = buf[:1024]
    big = int.from_bytes(region, "little")
    limit = 8 * len(region)
    bitpos = 0

    def rd(n: int) -> int:
        nonlocal bitpos
        if bitpos + n > limit:
            raise ValueError("zstd: FSE description past end of data")
        v = (big >> bitpos) & ((1 << n) - 1)
        bitpos += n
        return v

    al = rd(4) + 5
    if al > max_al:
        raise ValueError(
            f"zstd: FSE accuracy log {al} over the {max_al} cap"
        )
    remaining = (1 << al) + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) >= max_symbols:
            raise ValueError("zstd: FSE description has too many symbols")
        bits = remaining.bit_length()
        val = rd(bits)
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & low_mask) < threshold:
            bitpos -= 1  # small values use one bit fewer
            val &= low_mask
        elif val > low_mask:
            val -= threshold
        prob = val - 1
        remaining -= -prob if prob < 0 else prob
        if remaining < 1:
            raise ValueError("zstd: FSE probabilities exceed the table")
        probs.append(prob)
        if prob == 0:
            while True:
                rep = rd(2)
                if len(probs) + rep > max_symbols:
                    raise ValueError(
                        "zstd: FSE description has too many symbols"
                    )
                probs.extend([0] * rep)
                if rep != 3:
                    break
    return probs, al, (bitpos + 7) // 8


def _fse_build(
    probs: list[int], al: int
) -> tuple[list[int], list[int], list[int]]:
    """Build the FSE decoding table (§4.1.1): (symbol, nb_bits,
    baseline) per state."""
    size = 1 << al
    syms = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            syms[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            syms[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    ctr = [1 if p == -1 else p for p in probs]
    nb = [0] * size
    base = [0] * size
    for i in range(size):
        s = syms[i]
        c = ctr[s]
        ctr[s] = c + 1
        nbits = al - (c.bit_length() - 1)
        nb[i] = nbits
        base[i] = (c << nbits) - size
    return syms, nb, base


def _fse_rle_table(symbol: int) -> tuple[list[int], list[int], list[int], int]:
    """A degenerate 1-state table for the sequences RLE mode."""
    return [symbol], [0], [0], 0


#: RFC 8878 §3.1.1.3.2.2 — predefined distributions (spec-printed)
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]  # 36 symbols, accuracy log 6
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]  # 53 symbols, accuracy log 6
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]  # 29 symbols, accuracy log 5

#: literals-length codes (§3.1.1.3.2.1.3): (baseline, extra bits)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
#: match-length codes: (baseline, extra bits)
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_LL_PRE = _fse_build(_LL_DEFAULT, 6) + (6,)
_ML_PRE = _fse_build(_ML_DEFAULT, 6) + (6,)
_OF_PRE = _fse_build(_OF_DEFAULT, 5) + (5,)


# ---------------------------------------------------------------------------
# Huffman (§4.2)
# ---------------------------------------------------------------------------


def _huf_read_weights(buf: bytes) -> tuple[list[int], int]:
    """Parse a Huffman tree description.  Returns (weights including
    the inferred last one, bytes consumed)."""
    if not buf:
        raise ValueError("zstd: empty huffman description")
    head = buf[0]
    if head < 128:
        # FSE-compressed weights: `head` bytes follow
        if 1 + head > len(buf):
            raise ValueError("zstd: huffman weight stream past end")
        body = buf[1 : 1 + head]
        probs, al, used = _fse_read_distribution(body, 6, 256)
        syms, nb, base = _fse_build(probs, al)
        stream = body[used:]
        br = _BackBits(stream)
        s1 = br.read(al)
        s2 = br.read(al)
        if br.overdrawn:
            raise ValueError("zstd: huffman weight stream too short")
        weights: list[int] = []
        while True:
            if len(weights) > 254:
                raise ValueError("zstd: more than 255 huffman weights")
            weights.append(syms[s1])
            s1 = base[s1] + br.read(nb[s1])
            if br.overdrawn:
                weights.append(syms[s2])
                break
            weights.append(syms[s2])
            s2 = base[s2] + br.read(nb[s2])
            if br.overdrawn:
                weights.append(syms[s1])
                break
        consumed = 1 + head
    else:
        n = head - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(buf):
            raise ValueError("zstd: huffman weights past end")
        weights = []
        for i in range(n):
            b = buf[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        consumed = 1 + nbytes
    # infer the last symbol's weight: total must land on a power of 2
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: huffman weights sum to zero")
    left = (1 << total.bit_length()) - total
    if left & (left - 1):
        raise ValueError("zstd: huffman weights do not sum to a power of 2")
    weights.append(left.bit_length())
    return weights, consumed


def _huf_build(weights: list[int]) -> tuple[bytearray, bytearray, int]:
    """Canonical Huffman decode table (§4.2.1): index by ``max_bits``
    peeked bits -> (symbol, code length)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    max_bits = total.bit_length() - 1
    if total != (1 << max_bits):
        raise ValueError("zstd: huffman weight total not a power of 2")
    if max_bits > 11:
        raise ValueError(f"zstd: huffman table log {max_bits} over 11")
    size = 1 << max_bits
    nbits_sym = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    rank_count = [0] * (max_bits + 2)
    for nbv in nbits_sym:
        if nbv:
            rank_count[nbv] += 1
    rank_idx = [0] * (max_bits + 2)
    for b in range(max_bits, 0, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (max_bits - b))
    if rank_idx[0] != size:
        raise ValueError("zstd: huffman ranks do not fill the table")
    syms = bytearray(size)
    nbs = bytearray(size)
    for s, nbv in enumerate(nbits_sym):
        if nbv == 0:
            continue
        code = rank_idx[nbv]
        ln = 1 << (max_bits - nbv)
        for j in range(code, code + ln):
            syms[j] = s
            nbs[j] = nbv
        rank_idx[nbv] = code + ln
    return syms, nbs, max_bits


def _huf_decode_stream(
    stream: bytes, table: tuple[bytearray, bytearray, int], n: int
) -> bytearray:
    syms, nbs, max_bits = table
    br = _BackBits(stream)
    out = bytearray(n)
    peek = br.peek
    skip = br.skip
    for i in range(n):
        idx = peek(max_bits)
        out[i] = syms[idx]
        skip(nbs[idx])
    if br.remaining() != 0:
        raise ValueError("zstd: huffman stream not fully consumed")
    return out


# ---------------------------------------------------------------------------
# Literals section (§3.1.1.3.1)
# ---------------------------------------------------------------------------


def _decode_literals(block: bytes, ctx: dict) -> tuple[bytes, int]:
    """Decode the literals section of a compressed block.  Returns
    (literals, bytes consumed).  ``ctx['huf']`` carries the frame's
    previous Huffman table for the treeless mode."""
    if not block:
        raise ValueError("zstd: empty compressed block")
    b0 = block[0]
    lit_type = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if lit_type in (0, 1):  # Raw / RLE
        if size_fmt in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif size_fmt == 1:
            if len(block) < 2:
                raise ValueError("zstd: literals header past end")
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ValueError("zstd: literals header past end")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if regen > _BLOCK_MAX:
            raise ValueError("zstd: literals size over the block cap")
        if lit_type == 0:
            if hdr + regen > len(block):
                raise ValueError("zstd: raw literals past end of block")
            return bytes(block[hdr : hdr + regen]), hdr + regen
        if hdr + 1 > len(block):
            raise ValueError("zstd: RLE literal byte past end of block")
        return bytes([block[hdr]]) * regen, hdr + 1
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        hdr, streams, rbits = 3, 1, 10
    elif size_fmt == 1:
        hdr, streams, rbits = 3, 4, 10
    elif size_fmt == 2:
        hdr, streams, rbits = 4, 4, 14
    else:
        hdr, streams, rbits = 5, 4, 18
    if len(block) < hdr:
        raise ValueError("zstd: literals header past end")
    h = int.from_bytes(block[:hdr], "little")
    regen = (h >> 4) & ((1 << rbits) - 1)
    comp = (h >> (4 + rbits)) & ((1 << rbits) - 1)
    if regen > _BLOCK_MAX:
        raise ValueError("zstd: literals size over the block cap")
    if hdr + comp > len(block):
        raise ValueError("zstd: compressed literals past end of block")
    body = bytes(block[hdr : hdr + comp])
    if lit_type == 2:
        weights, used = _huf_read_weights(body)
        ctx["huf"] = _huf_build(weights)
        body = body[used:]
    elif ctx.get("huf") is None:
        raise ValueError("zstd: treeless literals without a previous table")
    table = ctx["huf"]
    if streams == 1:
        lits = _huf_decode_stream(body, table, regen)
    else:
        if len(body) < 6:
            raise ValueError("zstd: 4-stream jump table past end")
        s1, s2, s3 = struct.unpack_from("<HHH", body)
        o1, o2, o3 = 6, 6 + s1, 6 + s1 + s2
        o4 = 6 + s1 + s2 + s3
        if o4 > len(body):
            raise ValueError("zstd: 4-stream sizes past end of literals")
        n1 = (regen + 3) // 4
        n4 = regen - 3 * n1
        if n4 < 0:
            raise ValueError("zstd: 4-stream regenerated size too small")
        lits = bytearray()
        lits += _huf_decode_stream(body[o1:o2], table, n1)
        lits += _huf_decode_stream(body[o2:o3], table, n1)
        lits += _huf_decode_stream(body[o3:o4], table, n1)
        lits += _huf_decode_stream(body[o4:], table, n4)
    if len(lits) != regen:
        raise ValueError("zstd: literals regenerated size mismatch")
    return bytes(lits), hdr + comp


# ---------------------------------------------------------------------------
# Sequences section (§3.1.1.3.2)
# ---------------------------------------------------------------------------


def _seq_table(
    mode: int,
    data: bytes,
    pos: int,
    kind: str,
    ctx: dict,
    predefined,
    max_al: int,
    max_symbols: int,
) -> tuple[tuple, int]:
    """Resolve one symbol type's decoding table per its 2-bit mode.
    Returns ((syms, nb, base, al), new pos)."""
    if mode == 0:  # Predefined
        table = predefined
    elif mode == 1:  # RLE: one byte
        if pos >= len(data):
            raise ValueError("zstd: RLE sequence symbol past end")
        sym = data[pos]
        if sym >= max_symbols:
            raise ValueError(f"zstd: {kind} RLE symbol {sym} out of range")
        pos += 1
        table = _fse_rle_table(sym)
    elif mode == 2:  # FSE_Compressed
        probs, al, used = _fse_read_distribution(
            data[pos:], max_al, max_symbols
        )
        pos += used
        table = _fse_build(probs, al) + (al,)
    else:  # Repeat
        table = ctx.get(kind)
        if table is None:
            raise ValueError(
                f"zstd: {kind} repeat mode without a previous table"
            )
    ctx[kind] = table
    return table, pos


def _decode_sequences(
    data: bytes, literals: bytes, out: bytearray, ctx: dict, cap: int
) -> None:
    """Decode and EXECUTE the sequences section, appending to the
    frame output ``out`` (the in-frame window)."""
    if not data:
        raise ValueError("zstd: missing sequences section")
    b0 = data[0]
    if b0 == 0:
        if len(data) != 1:
            raise ValueError("zstd: bytes after empty sequences section")
        out += literals
        return
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise ValueError("zstd: sequence count past end")
        nseq, pos = ((b0 - 128) << 8) + data[1], 2
    else:
        if len(data) < 3:
            raise ValueError("zstd: sequence count past end")
        nseq, pos = data[1] + (data[2] << 8) + 0x7F00, 3
    if pos >= len(data):
        raise ValueError("zstd: sequences modes byte past end")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_tab, pos = _seq_table(
        (modes >> 6) & 3, data, pos, "ll", ctx, _LL_PRE, 9, 36
    )
    of_tab, pos = _seq_table(
        (modes >> 4) & 3, data, pos, "of", ctx, _OF_PRE, 8, 32
    )
    ml_tab, pos = _seq_table(
        (modes >> 2) & 3, data, pos, "ml", ctx, _ML_PRE, 9, 53
    )
    ll_s, ll_nb, ll_base, ll_al = ll_tab
    of_s, of_nb, of_base, of_al = of_tab
    ml_s, ml_nb, ml_base, ml_al = ml_tab

    br = _BackBits(bytes(data[pos:]))
    ll_state = br.read(ll_al)
    of_state = br.read(of_al)
    ml_state = br.read(ml_al)
    if br.overdrawn:
        raise ValueError("zstd: sequence bitstream too short for states")

    rep = ctx["rep"]
    lit_pos = 0
    read = br.read
    for i in range(nseq):
        of_code = of_s[of_state]
        if of_code > 31:
            raise ValueError(f"zstd: offset code {of_code} out of range")
        offset_value = (1 << of_code) + read(of_code) if of_code else 1
        ml_code = ml_s[ml_state]
        base_ml, bits_ml = _ML_CODE[ml_code]
        ml = base_ml + (read(bits_ml) if bits_ml else 0)
        ll_code = ll_s[ll_state]
        base_ll, bits_ll = _LL_CODE[ll_code]
        ll = base_ll + (read(bits_ll) if bits_ll else 0)

        # repeated-offset history (§3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[0] - 1 if idx == 3 else rep[idx]
                if offset == 0:
                    raise ValueError("zstd: repeated offset of zero")
                if idx != 1:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset

        if lit_pos + ll > len(literals):
            raise ValueError("zstd: sequence literals run past the section")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset past start of frame")
        if len(out) + ml > cap:
            raise ValueError(
                f"zstd: output past the {cap}-byte guard (bomb)"
            )
        if ml <= offset:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy: replicate the window pattern
            pattern = out[-offset:]
            reps = ml // offset + 1
            out += (pattern * reps)[:ml]

        if i != nseq - 1:  # the last sequence does not update states
            ll_state = ll_base[ll_state] + read(ll_nb[ll_state])
            ml_state = ml_base[ml_state] + read(ml_nb[ml_state])
            of_state = of_base[of_state] + read(of_nb[of_state])
    if br.overdrawn or br.remaining() != 0:
        raise ValueError("zstd: sequence bitstream not exactly consumed")
    out += literals[lit_pos:]


# ---------------------------------------------------------------------------
# Dictionaries (RFC 8878 §5)
# ---------------------------------------------------------------------------


def parse_dictionary(blob: bytes) -> dict:
    """Parse a zstd dictionary: either the structured format (magic
    ``0xEC30A437``: dict id, entropy tables in HUF→OF→ML→LL order,
    three initial repeat offsets, content) or a raw content-only
    prefix (anything without the magic)."""
    if blob[:4] != DICT_MAGIC:
        if not blob:
            raise ValueError("zstd: empty dictionary")
        return {"dict_id": 0, "huf": None, "of": None, "ml": None,
                "ll": None, "rep": None, "content": bytes(blob)}
    if len(blob) < 8:
        raise ValueError("zstd: dictionary shorter than its header")
    did = int.from_bytes(blob[4:8], "little")
    pos = 8
    weights, used = _huf_read_weights(blob[pos:])
    huf = _huf_build(weights)
    pos += used
    tables = {}
    for kind, max_al, max_symbols in (
        ("of", 8, 32), ("ml", 9, 53), ("ll", 9, 36),
    ):
        probs, al, used = _fse_read_distribution(
            blob[pos:], max_al, max_symbols
        )
        tables[kind] = _fse_build(probs, al) + (al,)
        pos += used
    if pos + 12 > len(blob):
        raise ValueError("zstd: dictionary repeat offsets past end")
    rep = [int.from_bytes(blob[pos + 4 * i : pos + 4 * i + 4], "little")
           for i in range(3)]
    if any(r == 0 for r in rep):
        raise ValueError("zstd: dictionary repeat offset of zero")
    pos += 12
    return {"dict_id": did, "huf": huf, "of": tables["of"],
            "ml": tables["ml"], "ll": tables["ll"], "rep": rep,
            "content": bytes(blob[pos:])}


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------


def _decode_frame(
    data: bytes, off: int, cap: int, zdict: dict | None = None,
    max_output: int | None = None,
) -> tuple[bytes, int]:
    """Decode one zstd frame starting at the magic.  Returns
    (content, offset past the frame).

    With ``max_output``, decoding stops at block granularity once that
    many content bytes exist and returns ``(prefix, -1)`` — the -1
    offset marks an early stop (unverifiable checksum, unknown frame
    end).  A declared content size past ``cap`` is then not an error:
    the caller only wants the prefix."""
    if data[off : off + 4] != ZSTD_MAGIC:
        raise ValueError("zstd: bad frame magic")
    off += 4
    if off >= len(data):
        raise ValueError("zstd: frame header past end")
    fhd = data[off]
    off += 1
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame header bit set")
    single = (fhd >> 5) & 1
    has_checksum = (fhd >> 2) & 1
    window = None
    if not single:
        if off >= len(data):
            raise ValueError("zstd: window descriptor past end")
        wd = data[off]
        off += 1
        wlog = 10 + (wd >> 3)
        if wlog > 31:
            raise ValueError("zstd: window log over 31")
        wbase = 1 << wlog
        window = wbase + (wbase >> 3) * (wd & 7)
    did_size = (0, 1, 2, 4)[fhd & 3]
    if off + did_size > len(data):
        raise ValueError("zstd: dictionary id past end")
    did = int.from_bytes(data[off : off + did_size], "little")
    off += did_size
    if did != 0:
        if zdict is None:
            raise UnsupportedCodecError(
                f"zstd: frame requires external dictionary {did} "
                "(pass dict_data, or embed it in a 0x184D2A5D "
                "skippable frame per the web-archive convention)"
            )
        if zdict["dict_id"] and zdict["dict_id"] != did:
            raise ValueError(
                f"zstd: frame wants dictionary {did}, "
                f"got {zdict['dict_id']}"
            )
    fcs_size = (1 if single else 0, 2, 4, 8)[fhd >> 6]
    fcs = None
    if fcs_size:
        if off + fcs_size > len(data):
            raise ValueError("zstd: frame content size past end")
        fcs = int.from_bytes(data[off : off + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        off += fcs_size
    if single:
        window = fcs
    if max_output is not None:
        # prefix mode: per-block guards must admit the prefix plus one
        # block (memory stays bounded by that), and a huge declared
        # content size is not an error — only the head is wanted
        cap = max(cap, max_output + _BLOCK_MAX)
    elif fcs is not None and fcs > cap:
        raise ValueError(
            f"zstd: declared content size {fcs} past the {cap}-byte "
            "guard (bomb)"
        )

    # With a dictionary, its content is the virtual window prefix and
    # its entropy tables/rep offsets seed the frame context — the
    # first block may open with treeless literals or Repeat FSE modes.
    if zdict is not None:
        out = bytearray(zdict["content"])
        ctx: dict = {"huf": zdict["huf"], "ll": zdict["ll"],
                     "of": zdict["of"], "ml": zdict["ml"],
                     "rep": list(zdict["rep"] or [1, 4, 8])}
    else:
        out = bytearray()
        ctx = {"huf": None, "ll": None, "of": None, "ml": None,
               "rep": [1, 4, 8]}
    base = len(out)
    while True:
        if off + 3 > len(data):
            raise ValueError("zstd: block header past end")
        bh = int.from_bytes(data[off : off + 3], "little")
        off += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ValueError("zstd: reserved block type")
        if btype == 1:  # RLE: bsize is the REGENERATED size, 1 byte follows
            if bsize > _BLOCK_MAX:
                raise ValueError("zstd: RLE block over the 128 KiB cap")
            if off >= len(data):
                raise ValueError("zstd: RLE block byte past end")
            if len(out) - base + bsize > cap:
                raise ValueError(
                    f"zstd: output past the {cap}-byte guard (bomb)"
                )
            out += bytes([data[off]]) * bsize
            off += 1
        else:
            if bsize > _BLOCK_MAX:
                raise ValueError("zstd: block size over the 128 KiB cap")
            if off + bsize > len(data):
                raise ValueError("zstd: block past end of data")
            block = data[off : off + bsize]
            off += bsize
            if btype == 0:  # raw
                if len(out) - base + bsize > cap:
                    raise ValueError(
                        f"zstd: output past the {cap}-byte guard (bomb)"
                    )
                out += block
            else:  # compressed
                before = len(out)
                lits, used = _decode_literals(block, ctx)
                _decode_sequences(block[used:], lits, out, ctx, cap + base)
                if len(out) - before > _BLOCK_MAX:
                    raise ValueError(
                        "zstd: block regenerates over the 128 KiB cap"
                    )
        if max_output is not None and len(out) - base >= max_output:
            return bytes(out[base : base + max_output]), -1
        if window is not None and len(out) - base > cap:
            raise ValueError(
                f"zstd: output past the {cap}-byte guard (bomb)"
            )
        if last:
            break
    if fcs is not None and len(out) - base != fcs:
        raise ValueError(
            f"zstd: frame regenerated {len(out) - base} bytes, "
            f"header declared {fcs}"
        )
    if has_checksum:
        if off + 4 > len(data):
            raise ValueError("zstd: content checksum past end")
        want = int.from_bytes(data[off : off + 4], "little")
        off += 4
        got = xxh64(bytes(out[base:])) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                f"zstd: content checksum mismatch "
                f"(got {got:08x}, frame says {want:08x})"
            )
    return bytes(out[base:]), off


def sniff_zstd(data: bytes) -> bool:
    """True if ``data`` is a zstd payload: a content frame up front, or
    one behind leading skippable frames (pzstd writes a skippable seek
    table; the 0x184D2A5x magic family is shared with LZ4, so the
    SNIFF must look past them to find the real codec)."""
    off = 0
    for _ in range(4):  # bounded: nobody stacks skippables legitimately
        if data[off : off + 4] == ZSTD_MAGIC:
            return True
        if len(data) - off < 8:
            return False
        magic = int.from_bytes(data[off : off + 4], "little")
        if not _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            return False
        off += 8 + int.from_bytes(data[off + 4 : off + 8], "little")
    return False


def zstd_decompress(
    data: bytes,
    cap: int = MAX_OUTPUT_BYTES,
    dict_data: bytes | None = None,
    max_output: int | None = None,
) -> bytes:
    """Decode a ``.zst`` payload: one or more zstd frames (the CLI and
    pzstd concatenate them) plus skippable frames, bounded by ``cap``.

    ``dict_data`` supplies an external dictionary (structured or raw
    content).  Independently, a skippable frame with the web-archive
    dictionary magic ``0x184D2A5D`` (the Common Crawl ``.warc.zst``
    convention) installs its payload — raw, structured, or itself a
    zstd frame holding the dictionary — for the frames that follow.

    ``max_output`` switches to PREFIX mode: decode stops (at block
    granularity) once that many bytes exist and the prefix returns
    without error — for consumers like payload classification that
    only need the head, so a wrapped row costs ~KiBs, not the cap."""
    out = bytearray()
    off = 0
    saw_frame = False
    zdict = parse_dictionary(dict_data) if dict_data is not None else None
    while off < len(data):
        if len(data) - off < 4:
            if data[off:].lstrip(b"\x00") == b"":
                break  # trailing null padding
            raise ValueError("zstd: trailing bytes too short for a frame")
        magic = int.from_bytes(data[off : off + 4], "little")
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if off + 8 > len(data):
                raise ValueError("zstd: skippable frame header past end")
            size = int.from_bytes(data[off + 4 : off + 8], "little")
            if off + 8 + size > len(data):
                raise ValueError("zstd: skippable frame past end of data")
            if magic == _SKIPPABLE_DICT and zdict is None:
                blob = bytes(data[off + 8 : off + 8 + size])
                if blob[:4] == ZSTD_MAGIC:  # compressed dictionary
                    blob = zstd_decompress(blob, cap)
                zdict = parse_dictionary(blob)
            off += 8 + size
            continue
        if data[off : off + 4] != ZSTD_MAGIC:
            raise ValueError("zstd: bad frame magic")
        frame, off = _decode_frame(
            data, off, cap - len(out), zdict,
            None if max_output is None else max_output - len(out),
        )
        out += frame
        saw_frame = True
        if max_output is not None and (off < 0 or len(out) >= max_output):
            return bytes(out[:max_output])
        if len(out) > cap:
            raise ValueError(
                f"zstd: output past the {cap}-byte guard (bomb)"
            )
    if not saw_frame:
        raise ValueError("zstd: no zstd frame in payload")
    return bytes(out)


# ---------------------------------------------------------------------------
# Fixture writer — raw-block frames (trivially valid zstd)
# ---------------------------------------------------------------------------


def build_zst(
    payload: bytes,
    *,
    block_size: int = 1 << 16,
    checksum: bool = True,
    skippable_prefix: bytes | None = None,
    frame_split: int | None = None,
) -> bytes:
    """Deterministic ``.zst`` writer using RAW blocks only — a valid
    zstd frame needs no entropy coding, so fixtures stay independent of
    the decoder's FSE/Huffman paths and the system CLI reads them back
    (two-direction interop without a full compressor).

    ``skippable_prefix`` prepends a skippable frame; ``frame_split``
    splits the payload into multiple frames at that byte count (pzstd
    shape)."""
    out = bytearray()
    if skippable_prefix is not None:
        out += struct.pack("<I", _SKIPPABLE_LO)
        out += struct.pack("<I", len(skippable_prefix))
        out += skippable_prefix
    pieces = (
        [payload[i : i + frame_split]
         for i in range(0, max(len(payload), 1), frame_split)]
        if frame_split
        else [payload]
    )
    for piece in pieces:
        out += ZSTD_MAGIC
        # single-segment, FCS 4-byte, optional checksum
        fhd = (2 << 6) | (1 << 5) | ((1 << 2) if checksum else 0)
        out += bytes([fhd])
        out += struct.pack("<I", len(piece))
        blocks = [piece[i : i + block_size]
                  for i in range(0, len(piece), block_size)] or [b""]
        for i, blk in enumerate(blocks):
            lastf = 1 if i == len(blocks) - 1 else 0
            out += (lastf | (0 << 1) | (len(blk) << 3)).to_bytes(3, "little")
            out += blk
        if checksum:
            out += struct.pack("<I", xxh64(piece) & 0xFFFFFFFF)
    return bytes(out)
