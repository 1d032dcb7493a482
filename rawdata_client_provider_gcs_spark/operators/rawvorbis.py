"""Vorbis setup-header structure decode + window census.

The Vorbis I specification is fully public and — unlike MP3's
synthesis window or AAC's scalefactor tables — ships every constant a
decoder needs inside the STREAM's own setup header (codebooks, floor
curves, residue partitions).  That makes Vorbis the one compressed
audio codec whose decode is not blocked by the repo's honesty
boundary (COVERAGE.md).  This module lands the verifiable first tier:

- the complete setup-header bit grammar (Vorbis I §4.2.4): codebooks
  (ordered/sparse length lists, Kraft-sum prefix-code validation, VQ
  lookup types 0/1/2 with ``float32_unpack``), time domain stubs,
  floor 0/1 configurations, residue 0/1/2 configurations, channel
  mappings with coupling steps, and the mode list;
- a per-packet WINDOW CENSUS: each audio packet's first bits name its
  mode, whose blockflag picks the short or long MDCT window — the
  long/short distribution is the codec-level transient census
  curation uses (speech/music discrimination, splice detection)
  without touching floor/residue payloads.

PCM synthesis (floor curve → residue → inverse MDCT → overlap-add)
lives in :mod:`.vorbisdec`, built on this module's setup parse —
Vorbis is no longer a boundary codec.  Every parse below is pinned by
hand-derived bit vectors (lengths, codewords, float32 fields computed
on paper from the spec), not by the fixture writer mirroring the
reader.

Reference behavioral parity: the reference transport stores opaque
named byte arrays (RawdataMessage.java:15-60); media introspection is
this repo's derived multimodal tier.
"""

from __future__ import annotations

MAX_CODEBOOKS = 256
MAX_ENTRIES = 1 << 24


def ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit (ilog(0) = 0,
    ilog(1) = 1, ilog(7) = 3)."""
    return max(0, x).bit_length()


def float32_unpack(x: int) -> float:
    """Vorbis packed float (§9.2.2): 21-bit mantissa, sign, 10-bit
    biased exponent."""
    mantissa = x & 0x1FFFFF
    if x & 0x80000000:
        mantissa = -mantissa
    exponent = (x & 0x7FE00000) >> 21
    return float(mantissa) * 2.0 ** (exponent - 788)


def lookup1_values(entries: int, dims: int) -> int:
    """Largest integer v with v**dims <= entries (§9.2.3)."""
    v = int(round(entries ** (1.0 / dims)))
    while (v + 1) ** dims <= entries:
        v += 1
    while v > 0 and v**dims > entries:
        v -= 1
    return v


class _Bits:
    """LSB-first bit reader (Vorbis packs into bytes low bit first)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("vorbis: setup header truncated mid-field")
        first = self.pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "little")
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return v

    def read_flag(self) -> bool:
        return bool(self.read(1))


def _parse_codebook(r: _Bits) -> dict:
    if r.read(24) != 0x564342:  # 'BCV' little-endian
        raise ValueError("vorbis: codebook sync pattern missing")
    dims = r.read(16)
    entries = r.read(24)
    if dims == 0 or entries == 0:
        raise ValueError("vorbis: empty codebook")
    if entries > MAX_ENTRIES:
        raise ValueError("vorbis: codebook entry count over the cap")
    lengths = [0] * entries
    ordered = r.read_flag()
    if not ordered:
        sparse = r.read_flag()
        for i in range(entries):
            if sparse:
                if r.read_flag():
                    lengths[i] = r.read(5) + 1
            else:
                lengths[i] = r.read(5) + 1
    else:
        cur_len = r.read(5) + 1
        cur = 0
        while cur < entries:
            num = r.read(ilog(entries - cur))
            if cur + num > entries:
                raise ValueError("vorbis: ordered codebook overruns entries")
            for i in range(cur, cur + num):
                lengths[i] = cur_len
            cur += num
            cur_len += 1
            if cur_len > 32:
                raise ValueError("vorbis: codeword length over 32")
    used = [ln for ln in lengths if ln > 0]
    if not used:
        raise ValueError("vorbis: codebook with no used entries")
    # Kraft sum: over-full prefix trees are unconditionally invalid;
    # under-full ones are invalid except the single-entry special case
    # (§3.2.1), which decodes as one 1-bit codeword.
    kraft = sum(1 << (32 - ln) for ln in used)  # scaled by 2^32
    if len(used) > 1:
        if kraft > (1 << 32):
            raise ValueError("vorbis: overpopulated huffman tree")
        if kraft < (1 << 32):
            raise ValueError("vorbis: underpopulated huffman tree")
    lookup = r.read(4)
    book: dict = {
        "dims": dims,
        "entries": entries,
        "lengths": lengths,
        "lookup_type": lookup,
    }
    if lookup == 0:
        return book
    if lookup not in (1, 2):
        raise ValueError(f"vorbis: reserved codebook lookup type {lookup}")
    book["minimum"] = float32_unpack(r.read(32))
    book["delta"] = float32_unpack(r.read(32))
    value_bits = r.read(4) + 1
    book["sequence_p"] = r.read_flag()
    n_vals = (
        lookup1_values(entries, dims) if lookup == 1 else entries * dims
    )
    if n_vals > MAX_ENTRIES:
        raise ValueError("vorbis: lookup table over the cap")
    book["multiplicands"] = [r.read(value_bits) for _ in range(n_vals)]
    return book


def _parse_floor(r: _Bits, n_books: int) -> dict:
    ftype = r.read(16)
    if ftype == 0:
        f = {
            "type": 0,
            "order": r.read(8),
            "rate": r.read(16),
            "bark_map_size": r.read(16),
            "amplitude_bits": r.read(6),
            "amplitude_offset": r.read(8),
        }
        nb = r.read(4) + 1
        f["books"] = [r.read(8) for _ in range(nb)]
        if any(b >= n_books for b in f["books"]):
            raise ValueError("vorbis: floor0 names a missing codebook")
        return f
    if ftype != 1:
        raise ValueError(f"vorbis: reserved floor type {ftype}")
    partitions = r.read(5)
    classes = [r.read(4) for _ in range(partitions)]
    n_classes = (max(classes) + 1) if classes else 0
    class_dims = []
    class_subs = []
    masterbooks = []
    subbooks = []
    for _ in range(n_classes):
        class_dims.append(r.read(3) + 1)
        subs = r.read(2)
        class_subs.append(subs)
        if subs:
            mb = r.read(8)
            if mb >= n_books:
                raise ValueError("vorbis: floor1 masterbook missing")
            masterbooks.append(mb)
        else:
            masterbooks.append(-1)
        row = []
        for _ in range(1 << subs):
            b = r.read(8) - 1
            if b >= n_books:
                raise ValueError("vorbis: floor1 subclass book missing")
            row.append(b)  # -1 = unused, legal
        subbooks.append(row)
    multiplier = r.read(2) + 1
    rangebits = r.read(4)
    xs = [0, 1 << rangebits]
    for p in range(partitions):
        for _ in range(class_dims[classes[p]]):
            xs.append(r.read(rangebits))
    if len(set(xs)) != len(xs):
        raise ValueError("vorbis: floor1 X list has duplicate positions")
    return {
        "type": 1,
        "partitions": partitions,
        "classes": classes,
        "class_dims": class_dims,
        "class_subclasses": class_subs,
        "masterbooks": masterbooks,
        "subclass_books": subbooks,
        "multiplier": multiplier,
        "rangebits": rangebits,
        "x_list": xs,
    }


def _parse_residue(r: _Bits, n_books: int) -> dict:
    rtype = r.read(16)
    if rtype > 2:
        raise ValueError(f"vorbis: reserved residue type {rtype}")
    begin = r.read(24)
    end = r.read(24)
    part_size = r.read(24) + 1
    n_class = r.read(6) + 1
    classbook = r.read(8)
    if classbook >= n_books:
        raise ValueError("vorbis: residue classbook missing")
    cascades = []
    for _ in range(n_class):
        low = r.read(3)
        high = r.read(5) if r.read_flag() else 0
        cascades.append(low | (high << 3))
    books = []
    for c in cascades:
        row = []
        for stage in range(8):
            if c & (1 << stage):
                b = r.read(8)
                if b >= n_books:
                    raise ValueError("vorbis: residue stage book missing")
                row.append(b)
            else:
                row.append(-1)
        books.append(row)
    return {
        "type": rtype,
        "begin": begin,
        "end": end,
        "partition_size": part_size,
        "classifications": n_class,
        "classbook": classbook,
        "cascades": cascades,
        "books": books,
    }


def _parse_mapping(r: _Bits, channels: int, n_floors: int,
                   n_residues: int) -> dict:
    if r.read(16) != 0:
        raise ValueError("vorbis: reserved mapping type")
    submaps = r.read(4) + 1 if r.read_flag() else 1
    coupling = []
    if r.read_flag():
        steps = r.read(8) + 1
        bits = ilog(channels - 1)
        for _ in range(steps):
            mag = r.read(bits)
            ang = r.read(bits)
            if mag == ang or mag >= channels or ang >= channels:
                raise ValueError("vorbis: invalid coupling step")
            coupling.append((mag, ang))
    if r.read(2) != 0:
        raise ValueError("vorbis: mapping reserved bits set")
    mux = (
        [r.read(4) for _ in range(channels)] if submaps > 1
        else [0] * channels
    )
    if any(m >= submaps for m in mux):
        raise ValueError("vorbis: mux names a missing submap")
    submap_floor = []
    submap_residue = []
    for _ in range(submaps):
        r.read(8)  # unused time configuration
        fl = r.read(8)
        res = r.read(8)
        if fl >= n_floors or res >= n_residues:
            raise ValueError("vorbis: submap names a missing floor/residue")
        submap_floor.append(fl)
        submap_residue.append(res)
    return {
        "submaps": submaps,
        "coupling": coupling,
        "mux": mux,
        "submap_floor": submap_floor,
        "submap_residue": submap_residue,
    }


def parse_setup(pkt: bytes, channels: int) -> dict:
    """Full Vorbis setup-header parse (§4.2.4) → structure dict.

    Raises ``ValueError`` on every malformed shape — truncation,
    bad sync, over/under-populated prefix trees, out-of-range book
    references, reserved types — the per-row capture class.
    """
    if pkt[:7] != b"\x05vorbis":
        raise ValueError("vorbis: not a setup header packet")
    if channels < 1:
        raise ValueError("vorbis: channel count must be positive")
    r = _Bits(pkt, 7 * 8)
    n_books = r.read(8) + 1
    if n_books > MAX_CODEBOOKS:
        raise ValueError("vorbis: codebook count over the cap")
    books = [_parse_codebook(r) for _ in range(n_books)]
    # time domain transforms: all zero placeholders in Vorbis I
    for _ in range(r.read(6) + 1):
        if r.read(16) != 0:
            raise ValueError("vorbis: reserved time-domain transform")
    floors = [_parse_floor(r, n_books) for _ in range(r.read(6) + 1)]
    residues = [_parse_residue(r, n_books) for _ in range(r.read(6) + 1)]
    mappings = [
        _parse_mapping(r, channels, len(floors), len(residues))
        for _ in range(r.read(6) + 1)
    ]
    modes = []
    for _ in range(r.read(6) + 1):
        blockflag = r.read(1)
        if r.read(16) != 0 or r.read(16) != 0:
            raise ValueError("vorbis: reserved window/transform type")
        mapping = r.read(8)
        if mapping >= len(mappings):
            raise ValueError("vorbis: mode names a missing mapping")
        modes.append({"blockflag": blockflag, "mapping": mapping})
    if not r.read_flag():
        raise ValueError("vorbis: setup framing bit unset")
    return {
        "codebooks": books,
        "floors": floors,
        "residues": residues,
        "mappings": mappings,
        "modes": modes,
    }


def window_census(audio_packets: list[bytes], modes: list[dict]) -> dict:
    """Per-packet mode decode (§4.3.1 step 2): the first bit of an
    audio packet must be 0, then ``ilog(mode_count - 1)`` bits name
    the mode whose blockflag picks the short (0) or long (1) window.
    Damaged packets are skipped, never raised — census semantics."""
    n_long = n_short = bad = 0
    bits = ilog(len(modes) - 1)
    for pkt in audio_packets:
        if not pkt:
            bad += 1
            continue
        try:
            r = _Bits(pkt)
            if r.read(1) != 0:
                bad += 1  # header-typed packet in the audio sequence
                continue
            mode = r.read(bits)
            if mode >= len(modes):
                bad += 1
                continue
        except ValueError:
            bad += 1
            continue
        if modes[mode]["blockflag"]:
            n_long += 1
        else:
            n_short += 1
    return {"n_long": n_long, "n_short": n_short, "n_bad": bad}


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


class _BitW:
    """LSB-first bit writer (the fixture half of :class:`_Bits`)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def build_setup(
    *,
    n_modes: int = 2,
    channels: int = 2,
    coupling: bool = True,
) -> bytes:
    """Deterministic minimal-but-complete setup header: one 4-entry
    non-sparse codebook (lengths 1,2,3,3 — an exactly-full prefix
    tree) with a type-1 VQ lookup, one flat floor1, one residue type
    2, one mapping (with a stereo coupling step when requested), and
    ``n_modes`` modes alternating short/long blockflags."""
    w = _BitW()
    w.write(0, 8)             # codebook count - 1 (one codebook)
    w.write(0x564342, 24)
    w.write(2, 16)            # dims
    w.write(4, 24)            # entries
    w.write(0, 1)             # not ordered
    w.write(0, 1)             # not sparse
    for ln in (1, 2, 3, 3):   # Kraft-complete
        w.write(ln - 1, 5)
    w.write(1, 4)             # lookup type 1
    w.write(0x00000000, 32)   # minimum = 0.0
    w.write((788 << 21) | 1, 32)  # delta = 1.0 (mantissa 1, exp 788)
    w.write(3, 4)             # value_bits = 4
    w.write(0, 1)             # sequence_p
    for m in (0, 1):          # lookup1_values(4, 2) = 2
        w.write(m, 4)
    # time domain
    w.write(0, 6)             # one time transform
    w.write(0, 16)
    # one floor1
    w.write(0, 6)
    w.write(1, 16)            # floor type 1
    w.write(1, 5)             # 1 partition
    w.write(0, 4)             # class 0
    w.write(0, 3)             # class dim = 1
    w.write(0, 2)             # no subclasses
    w.write(1, 8)             # 1 subclass book entry: book 0 (-1+1)
    w.write(0, 2)             # multiplier 1
    w.write(2, 4)             # rangebits 2
    w.write(2, 2)             # one X value (dim 1): 2 (unique vs 0,4)
    # one residue type 2
    w.write(0, 6)
    w.write(2, 16)
    w.write(0, 24)            # begin
    w.write(8, 24)            # end
    w.write(3, 24)            # partition size 4
    w.write(0, 6)             # 1 classification
    w.write(0, 8)             # classbook 0
    w.write(1, 3)             # cascade low bits: stage 0
    w.write(0, 1)             # no high bits
    w.write(0, 8)             # stage-0 book: 0
    # one mapping
    w.write(0, 6)
    w.write(0, 16)            # mapping type 0
    w.write(0, 1)             # no submap flag (1 submap)
    if coupling and channels == 2:
        w.write(1, 1)         # coupling flag
        w.write(0, 8)         # 1 step
        w.write(0, 1)         # magnitude = 0 (ilog(1) = 1 bit)
        w.write(1, 1)         # angle = 1
    else:
        w.write(0, 1)
    w.write(0, 2)             # reserved
    w.write(0, 8)             # time config (discarded)
    w.write(0, 8)             # floor 0
    w.write(0, 8)             # residue 0
    # modes
    w.write(n_modes - 1, 6)
    for i in range(n_modes):
        w.write(i & 1, 1)     # alternate short/long
        w.write(0, 16)
        w.write(0, 16)
        w.write(0, 8)         # mapping 0
    w.write(1, 1)             # framing bit
    return b"\x05vorbis" + w.bytes()


def audio_packet(mode: int, n_modes: int, filler: bytes = b"\x00" * 40) -> bytes:
    """An audio packet selecting ``mode``: type bit 0 + mode bits,
    LSB-first, padded with opaque filler."""
    w = _BitW()
    w.write(0, 1)
    w.write(mode, ilog(n_modes - 1))
    head = w.bytes()
    return head + filler
