"""HuffCDIC (MOBI compression 17480, ``DH``) — canonical-Huffman codes
over a phrase dictionary, the Kindle-era PalmDoc successor.

Everything needed to decode ships INSIDE the PDB container (the
in-stream-tables honesty class): the MOBI header points at one ``HUFF``
record and N ``CDIC`` records.  Public structure (MobileRead wiki "PDB
Format" / the widely-documented mobi toolchain):

- **HUFF** record: ``HUFF`` magic, 32-bit header length (24), two
  32-bit offsets — a 256-entry *cache table* (one big-endian uint32
  per first byte: bits 0-4 code length, bit 7 terminal flag, bits 8-31
  the group's max code) and a 64-uint32 *base table* (min/max code per
  code length 1..32, consulted when the first 8 bits are not terminal).
- **CDIC** records: ``CDIC`` magic, header length (16), total phrase
  count, ``bits`` (each record holds up to ``1 << bits`` phrases);
  then uint16 offsets (relative to the 16-byte header) to entries of
  ``uint16 flags|length`` + payload.  Bit 15 marks a FLAT phrase;
  a clear bit 15 means the payload is itself HuffCDIC-coded and must
  be unpacked once (memoized), giving the format its recursion.
- Decoding: a 32-bit big-endian lookahead; the cache resolves codes of
  length ≤ 8 directly, longer codes walk the base table's min-code
  ladder; the symbol index is ``(maxcode - code) >> (32 - len)``
  (codes are assigned in DESCENDING order within a length group);
  bit budget is the record's bit count — a trailing partial code is
  padding, discarded.

The fixture encoder emits uniform-length canonical codes (length 8 —
pure cache path — or 9 — the base-table walk), optional multi-CDIC
splits and recursive phrase entries, so both decoder paths and the
recursion/memoization are pinned without any external tool.

Hostile inputs (cyclic phrases, out-of-range symbols, lying offsets,
zero code lengths) raise ``ValueError`` for per-row capture.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); document decoding is
this repo's derived curation tier.
"""

from __future__ import annotations

import struct

MAX_PHRASES = 1 << 16
MAX_DEPTH = 16


class HuffCdic:
    """Decoder over the HUFF + CDIC records of one MOBI file."""

    def __init__(self, records: list):
        if not records:
            raise ValueError("huffcdic: no HUFF record")
        huff = records[0]
        if huff[:4] != b"HUFF" or len(huff) < 16:
            raise ValueError("huffcdic: bad HUFF magic")
        (hlen,) = struct.unpack(">I", huff[4:8])
        if hlen < 16:
            raise ValueError("huffcdic: HUFF header too short")
        off1, off2 = struct.unpack(">II", huff[8:16])
        if off1 + 1024 > len(huff) or off2 + 256 > len(huff):
            raise ValueError("huffcdic: HUFF tables past record end")
        self.codelen = []
        self.term = []
        self.maxc = []
        for i in range(256):
            (v,) = struct.unpack(">I", huff[off1 + 4 * i : off1 + 4 * i + 4])
            cl = v & 0x1F
            self.codelen.append(cl)
            self.term.append(bool(v & 0x80))
            self.maxc.append((((v >> 8) + 1) << (32 - cl)) - 1 if cl else 0)
        base = struct.unpack(">64I", huff[off2 : off2 + 256])
        self.mincode = [0]
        self.maxcode = [-1]
        for cl in range(1, 33):
            self.mincode.append(base[2 * (cl - 1)] << (32 - cl))
            self.maxcode.append(((base[2 * cl - 1] + 1) << (32 - cl)) - 1)
        # phrase dictionary across the CDIC chain
        self.dictionary: list = []
        total = None
        for cdic in records[1:]:
            if cdic[:4] != b"CDIC" or len(cdic) < 16:
                raise ValueError("huffcdic: bad CDIC magic")
            phrases, bits = struct.unpack(">II", cdic[8:16])
            if total is None:
                if phrases > MAX_PHRASES or bits > 16:
                    raise ValueError("huffcdic: CDIC geometry out of range")
                total = phrases
            n = min(1 << bits, total - len(self.dictionary))
            if 16 + 2 * n > len(cdic):
                raise ValueError("huffcdic: CDIC offset index truncated")
            for i in range(n):
                (off,) = struct.unpack(
                    ">H", cdic[16 + 2 * i : 18 + 2 * i]
                )
                p = 16 + off
                if p + 2 > len(cdic):
                    raise ValueError("huffcdic: CDIC entry past record")
                (blen,) = struct.unpack(">H", cdic[p : p + 2])
                ln = blen & 0x7FFF
                if p + 2 + ln > len(cdic):
                    raise ValueError("huffcdic: CDIC phrase past record")
                self.dictionary.append(
                    (cdic[p + 2 : p + 2 + ln], bool(blen & 0x8000))
                )
        if total is not None and len(self.dictionary) != total:
            raise ValueError(
                "huffcdic: CDIC chain shorter than the phrase count"
            )

    def unpack(self, data: bytes, cap: int, depth: int = 0) -> bytes:
        """One HuffCDIC-coded record → plaintext bytes."""
        if depth > MAX_DEPTH:
            raise ValueError("huffcdic: phrase recursion too deep")
        bitsleft = len(data) * 8
        buf = data + b"\x00" * 8
        pos = 0
        x = int.from_bytes(buf[:8], "big")
        n = 32
        out = bytearray()
        while True:
            if n <= 0:
                pos += 4
                x = int.from_bytes(buf[pos : pos + 8], "big")
                n += 32
            code = (x >> n) & 0xFFFFFFFF
            first = code >> 24
            cl = self.codelen[first]
            if cl == 0:
                raise ValueError("huffcdic: zero code length in cache")
            maxcode = self.maxc[first]
            if not self.term[first]:
                while cl < 32 and code < self.mincode[cl]:
                    cl += 1
                if code < self.mincode[cl]:
                    raise ValueError("huffcdic: code below every min code")
                maxcode = self.maxcode[cl]
            n -= cl
            bitsleft -= cl
            if bitsleft < 0:
                break  # trailing partial code = padding
            r = (maxcode - code) >> (32 - cl)
            if r < 0 or r >= len(self.dictionary):
                raise ValueError("huffcdic: symbol index out of range")
            phrase, flat = self.dictionary[r]
            if phrase is None:
                raise ValueError("huffcdic: self-referential phrase")
            if not flat:
                self.dictionary[r] = (None, False)  # cycle trap
                phrase = self.unpack(phrase, cap, depth + 1)
                self.dictionary[r] = (phrase, True)
            out += phrase
            if len(out) > cap:
                raise ValueError("huffcdic: output over the cap")
        return bytes(out)


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


class HuffCdicEncoder:
    """Uniform-length canonical-Huffman fixture encoder.

    ``code_len=8`` exercises the terminal cache path; ``code_len=9``
    the base-table min-code walk; ``cdic_bits`` < log2(phrases) splits
    the dictionary across several CDIC records; ``recursive=True``
    stores two-byte phrases as coded pairs of one-byte phrases
    (flag 0), pinning the recursive unpack + memoization."""

    def __init__(self, chunks: list, *, code_len: int = 8,
                 cdic_bits: int = 16, recursive: bool = False):
        if code_len not in (8, 9):
            raise ValueError("huffcdic fixture: code_len must be 8 or 9")
        self.code_len = code_len
        self.cdic_bits = cdic_bits
        self.recursive = recursive
        piece = 2 if recursive else 1
        self.piece = piece
        seen: dict = {}
        for chunk in chunks:
            for i in range(0, len(chunk), piece):
                p = bytes(chunk[i : i + piece])
                seen.setdefault(p, len(seen))
                if recursive:
                    for b in p:  # constituent singles for flag-0 bodies
                        seen.setdefault(bytes([b]), len(seen))
        self.index = seen
        nsym = len(seen)
        if nsym > (1 << code_len) - 1:
            raise ValueError("huffcdic fixture: alphabet too large")
        self.nsym = nsym

    def _code(self, r: int) -> int:
        return (1 << self.code_len) - 1 - r  # descending assignment

    def _pack(self, symbols: list) -> bytes:
        acc = 0
        nbits = 0
        for r in symbols:
            acc = (acc << self.code_len) | self._code(r)
            nbits += self.code_len
        pad = (-nbits) % 8
        acc <<= pad
        return acc.to_bytes((nbits + pad) // 8, "big")

    def encode(self, chunk: bytes) -> bytes:
        syms = [self.index[bytes(chunk[i : i + self.piece])]
                for i in range(0, len(chunk), self.piece)]
        return self._pack(syms)

    def records(self) -> list:
        L = self.code_len
        huff = bytearray(b"HUFF" + struct.pack(">III", 24, 24, 24 + 1024))
        huff += b"\x00" * 8  # pad header to the declared 24 bytes
        maxraw = (1 << L) - 1
        for _ in range(256):
            if L == 8:
                huff += struct.pack(">I", (maxraw << 8) | 0x80 | 8)
            else:  # non-terminal: walk the base table from length 8
                huff += struct.pack(">I", 8)
        base = [0] * 64
        for cl in range(1, L):
            base[2 * (cl - 1)] = 1 << cl  # min above any code: keep walking
        base[2 * (L - 1)] = (1 << L) - self.nsym
        base[2 * L - 1] = (1 << L) - 1
        huff += struct.pack(">64I", *base)
        # phrases in index order; two-byte phrases coded when recursive
        phrases = []
        for p, r in sorted(self.index.items(), key=lambda kv: kv[1]):
            if self.recursive and len(p) == 2:
                body = self._pack([self.index[bytes([p[0]])],
                                   self.index[bytes([p[1]])]])
                phrases.append((body, 0))
            else:
                phrases.append((p, 0x8000))
        per = 1 << self.cdic_bits
        out = [bytes(huff)]
        for start in range(0, len(phrases) or 1, per):
            group = phrases[start : start + per]
            cdic = bytearray(
                b"CDIC" + struct.pack(">III", 16, len(phrases),
                                      self.cdic_bits)
            )
            index = bytearray()
            blobs = bytearray()
            data_base = 2 * len(group)
            for body, flag in group:
                index += struct.pack(">H", data_base + len(blobs))
                blobs += struct.pack(">H", flag | len(body)) + body
            cdic += index + blobs
            out.append(bytes(cdic))
        return out
