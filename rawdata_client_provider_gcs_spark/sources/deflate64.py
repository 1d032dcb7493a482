"""Deflate64 ("enhanced deflate", ZIP method 9) — pure Python.

PKWARE's APPNOTE §Method 9 extends RFC 1951 deflate in exactly three
ways; everything else (stored blocks, fixed/dynamic Huffman trees, the
code-length code, LSB-first bit packing) is unchanged:

- the sliding window grows from 32 KiB to 64 KiB;
- length code 285 carries 16 extra bits over base 3 (match lengths
  3..65538) instead of the fixed value 258;
- distance codes 30 and 31 become valid (bases 32769 and 49153, 14
  extra bits each → distances up to 65536).

WinZip emits method 9 for large members, which were 100% member loss
before r14.  No tool in this environment can produce Deflate64
(libarchive reads it in some builds but never writes it), so the
fixture side is a fixed-Huffman block writer emitting hand-chosen
literal/match ops — enough to exercise the 16-extra-bit length form,
the new distance codes, and >32 KiB window references; the decode
grammar is pinned by hand-built vectors in ``tests/test_archive.py``.
Interop with stdlib zlib holds on the shared subset: a RAW DEFLATE
stream that never uses length code 285 (i.e. no 258-byte matches) or
distance codes 30/31 is byte-identically decodable by both (tested).
Deflate64 is NOT a strict superset — code 285 *changes meaning* (RFC
1951: fixed length 258, zero extra bits; Deflate64: base 3 with 16
extra bits), which is exactly why stdlib zlib cannot read method-9
members at all.

Reference behavioral parity: the reference transport stores opaque
byte arrays (RawdataMessage.java:15-60); archive decode is this repo's
derived crawl tier.
"""

from __future__ import annotations

MAX_OUTPUT = 1 << 31  # absolute backstop; callers pass tighter caps

#: length codes 257..285: (extra bits, base) — code 285 is the
#: Deflate64 16-extra-bit form
_LEN_TABLE = (
    (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9), (0, 10),
    (1, 11), (1, 13), (1, 15), (1, 17), (2, 19), (2, 23), (2, 27),
    (2, 31), (3, 35), (3, 43), (3, 51), (3, 59), (4, 67), (4, 83),
    (4, 99), (4, 115), (5, 131), (5, 163), (5, 195), (5, 227),
    (16, 3),
)

#: distance codes 0..31 — 30/31 are the Deflate64 extensions
_DIST_TABLE = (
    (0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (1, 7), (2, 9), (2, 13),
    (3, 17), (3, 25), (4, 33), (4, 49), (5, 65), (5, 97), (6, 129),
    (6, 193), (7, 257), (7, 385), (8, 513), (8, 769), (9, 1025),
    (9, 1537), (10, 2049), (10, 3073), (11, 4097), (11, 6145),
    (12, 8193), (12, 12289), (13, 16385), (13, 24577),
    (14, 32769), (14, 49153),
)

#: RFC 1951 §3.2.7 code-length alphabet order
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
              14, 1, 15)


class _Br:
    """LSB-first bit reader over bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("deflate64: bit read past end of stream")
        out = 0
        pos = self.pos
        data = self.data
        for i in range(n):
            out |= ((data[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        self.pos = pos
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        self.align()
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("deflate64: stored block past end")
        self.pos += 8 * n
        return self.data[start : start + n]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol → (codeword, length), canonical per RFC 1951 §3.2.2."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _decoder(lengths: list[int]) -> dict[tuple[int, int], int]:
    """(codeword, length) → symbol map, with over-subscription check."""
    codes = _canonical_codes(lengths)
    kraft = sum((1 << (15 - ln)) for _c, ln in codes.values())
    if kraft > (1 << 15):
        raise ValueError("deflate64: over-subscribed Huffman code")
    return {(c, ln): sym for sym, (c, ln) in codes.items()}


def _decode_sym(r: _Br, table: dict, max_len: int = 15) -> int:
    code = 0
    for ln in range(1, max_len + 1):
        code = (code << 1) | r.read(1)
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("deflate64: invalid Huffman codeword")


_FIXED_LIT = ([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = [5] * 32


def _read_dynamic(r: _Br) -> tuple[dict, dict]:
    hlit = r.read(5) + 257
    hdist = r.read(5) + 1
    hclen = r.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CLC_ORDER[i]] = r.read(3)
    cl_table = _decoder(cl_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        sym = _decode_sym(r, cl_table, 7)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("deflate64: repeat with no prior length")
            lengths += [lengths[-1]] * (3 + r.read(2))
        elif sym == 17:
            lengths += [0] * (3 + r.read(3))
        else:
            lengths += [0] * (11 + r.read(7))
    if len(lengths) != hlit + hdist:
        raise ValueError("deflate64: code-length overrun")
    return (_decoder(lengths[:hlit]), _decoder(lengths[hlit:]))


def inflate64(data: bytes, cap: int = MAX_OUTPUT) -> bytes:
    """Decode a raw Deflate64 stream (no zlib/gzip wrapper), bounded
    to ``cap`` output bytes (bomb guard)."""
    r = _Br(data)
    out = bytearray()
    while True:
        bfinal = r.read(1)
        btype = r.read(2)
        if btype == 0:
            hdr = r.read_bytes(4)
            ln = int.from_bytes(hdr[:2], "little")
            nln = int.from_bytes(hdr[2:], "little")
            if ln ^ nln != 0xFFFF:
                raise ValueError("deflate64: stored block LEN/NLEN mismatch")
            out += r.read_bytes(ln)
            if len(out) > cap:
                raise ValueError("deflate64: output over the cap")
        elif btype in (1, 2):
            if btype == 1:
                lit_t = _decoder(_FIXED_LIT)
                dist_t = _decoder(_FIXED_DIST)
            else:
                lit_t, dist_t = _read_dynamic(r)
            while True:
                sym = _decode_sym(r, lit_t)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(
                            f"deflate64: invalid length code {sym}"
                        )
                    extra, base = _LEN_TABLE[sym - 257]
                    length = base + r.read(extra)
                    dsym = _decode_sym(r, dist_t)
                    if dsym > 31:
                        raise ValueError(
                            f"deflate64: invalid distance code {dsym}"
                        )
                    dextra, dbase = _DIST_TABLE[dsym]
                    dist = dbase + r.read(dextra)
                    if dist > len(out):
                        raise ValueError(
                            "deflate64: distance before stream start"
                        )
                    if dist > 65536:
                        raise ValueError(
                            "deflate64: distance over the 64 KiB window"
                        )
                    for _ in range(length):
                        out.append(out[-dist])
                if len(out) > cap:
                    raise ValueError("deflate64: output over the cap")
        else:
            raise ValueError("deflate64: reserved block type 3")
        if bfinal:
            return bytes(out)


# ---------------------------------------------------------------------------
# Fixture writer: fixed-Huffman blocks from explicit literal/match ops
# ---------------------------------------------------------------------------


class _Bw:
    __slots__ = ("buf", "bit")

    def __init__(self):
        self.buf = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.buf.append(0)
            if (v >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, n: int) -> None:
        """Huffman codeword: MSB of the code goes first."""
        for i in range(n - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _pick_len_code(length: int, force_285: bool = False) -> tuple[int, int, int]:
    """(code, extra bits, extra value) for a match length."""
    if force_285 or length > 227 + 31:
        if not 3 <= length <= 65538:
            raise ValueError("deflate64 fixture: length out of range")
        return 285, 16, length - 3
    for code in range(284, 256, -1):
        extra, base = _LEN_TABLE[code - 257]
        if base <= length < base + (1 << extra):
            return code, extra, length - base
    raise ValueError("deflate64 fixture: length out of range")


def _pick_dist_code(dist: int) -> tuple[int, int, int]:
    for code in range(31, -1, -1):
        extra, base = _DIST_TABLE[code]
        if base <= dist < base + (1 << extra):
            return code, extra, dist - base
    raise ValueError("deflate64 fixture: distance out of range")


def deflate64_fixed(ops: list, *, force_285: bool = False) -> bytes:
    """One final fixed-Huffman Deflate64 block from explicit ops:
    ``("lit", bytes)`` or ``("match", length, distance)``.  With
    ``force_285`` every match uses the 16-extra-bit length code."""
    lit_codes = _canonical_codes(_FIXED_LIT)
    dist_codes = _canonical_codes(_FIXED_DIST)
    w = _Bw()
    w.write(1, 1)  # BFINAL
    w.write(1, 2)  # fixed Huffman
    for op in ops:
        if op[0] == "lit":
            for b in op[1]:
                c, ln = lit_codes[b]
                w.write_code(c, ln)
        else:
            _tag, length, dist = op
            code, extra, ev = _pick_len_code(length, force_285)
            c, ln = lit_codes[code]
            w.write_code(c, ln)
            w.write(ev, extra)
            dcode, dextra, dev = _pick_dist_code(dist)
            c, ln = dist_codes[dcode]
            w.write_code(c, ln)
            w.write(dev, dextra)
    c, ln = lit_codes[256]
    w.write_code(c, ln)
    return bytes(w.buf)


def deflate64_compress(data: bytes) -> bytes:
    """Fixture compressor: literals + one long self-referencing match
    when the data is repetitive enough — emits real Deflate64 (length
    code 285 / far distances) for data bigger than a deflate block
    could express in one match."""
    n = len(data)
    # naive: find the longest prefix-period repetition; matches over
    # the 65538 maximum split into successive 285-coded matches
    for period in range(1, min(n // 2, 65536) + 1):
        if data[period:] == data[:-period] and n - period >= 3:
            ops: list = [("lit", data[:period])]
            remaining = n - period
            while remaining > 0:
                chunk = min(remaining, 65538)
                if chunk < 3:
                    ops.append(("lit", data[n - remaining : n]))
                    break
                ops.append(("match", chunk, period))
                remaining -= chunk
            return deflate64_fixed(ops, force_285=n - period > 258)
    return deflate64_fixed([("lit", data)])
