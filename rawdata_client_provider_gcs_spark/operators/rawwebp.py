"""WebP (VP8L lossless) codec — the modern web image format.

WebP is the one mainstream crawl image format the engine's pure-Python
tier could not open.  This module implements the LOSSLESS half of the
format (RFC 9649 §3, the VP8L bitstream) completely on the read path:

- RIFF container walk (bare ``VP8L`` and ``VP8X``-extended layouts);
- the LSB-first bit reader and canonical prefix codes, including the
  code-length-code machinery, simple (1/2-symbol) codes, and the
  ``max_symbol`` length limit;
- meta prefix codes (entropy image) selecting per-tile code groups;
- LZ77 backward references with the 120-entry 2D distance map and the
  standard length/distance prefix scheme;
- the color cache (``0x1e35a7bd`` multiplicative hash);
- all four transforms, inverted in reverse order: PREDICTOR (all 14
  modes with the border rules), COLOR_TRANSFORM (signed ``>> 5``
  cross-channel deltas), SUBTRACT_GREEN, and COLOR_INDEXING including
  pixel bundling for palettes of ≤16 colors.

Lossy WebP (``VP8 `` chunks) decodes through :mod:`.rawvp8` (RFC 6386
key-frame intra: bool coder, token decode, IWHT/IDCT, all intra modes,
loop filter), and ``ALPH`` alpha planes decode too (raw or headerless-
VP8L compression, all four prediction filters) — both as of round 9.

The write path (``encode_webp_lossless``) is a fixture-grade encoder
used by the oracle-checked query and the tests: literal coding with
fixed-length prefix codes, plus optional exercise of each transform,
the color cache, and distance-1 LZ77 runs — each variant chosen so an
encode→decode roundtrip is BIT-EXACT, which is what lets the test
suite pin every decoder path without external libraries.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); image
decoding belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import numpy as np

from .rawavi import UnsupportedCodecError

#: hard cap on decoded pixel count (same guard idea as rawtiff)
_MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# Bit I/O (LSB-first within bytes, as in DEFLATE)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.pos + nbits > self.n:
            raise ValueError("vp8l: bitstream exhausted")
        out = 0
        data = self.data
        pos = self.pos
        for i in range(nbits):
            byte = data[(pos + i) >> 3]
            out |= ((byte >> ((pos + i) & 7)) & 1) << i
        self.pos += nbits
        return out

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("vp8l: bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are emitted MSB-first (root of the tree first)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (DEFLATE order)."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixCode:
    """Decoder for one prefix code: a binary tree walked bit by bit."""

    __slots__ = ("tree", "single")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("vp8l: empty prefix code")
        if len(used) == 1:
            # only a length-1 single symbol is a legal zero-bit code
            # (the simple-code form); a lone longer length means an
            # incomplete table, which libwebp rejects — accepting it
            # would decode garbage silently
            if used[0][0] != 1:
                raise ValueError("vp8l: incomplete single-symbol code")
            self.single = used[0][1]
            self.tree = None
            return
        self.single = None
        # tree nodes as dict {0: child, 1: child}; leaves are ints
        codes = _canonical_codes(lengths)
        # completeness check (Kraft sum must be exactly 1, in integers)
        max_len = max(ln for _, (_, ln) in codes.items())
        kraft = sum(1 << (max_len - ln) for _, (_, ln) in codes.items())
        if kraft != 1 << max_len:
            raise ValueError("vp8l: prefix code is not complete")
        root: dict = {}
        for sym, (code, ln) in codes.items():
            node = root
            for i in range(ln - 1, 0, -1):
                node = node.setdefault((code >> i) & 1, {})
                if not isinstance(node, dict):
                    raise ValueError("vp8l: prefix code collision")
            bit = code & 1
            if bit in node:
                raise ValueError("vp8l: prefix code collision")
            node[bit] = sym
        self.tree = root

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        node = self.tree
        while True:
            bit = br.read_bit()
            if bit not in node:
                raise ValueError("vp8l: invalid prefix code path")
            node = node[bit]
            if not isinstance(node, dict):
                return node


_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of alphabet")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("vp8l: simple-code symbol out of alphabet")
            if sym1 == sym0:
                raise ValueError("vp8l: duplicate simple-code symbols")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = sym0
            pc.tree = None
            return pc
        return _PrefixCode(lengths)

    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CODE_LENGTH_ORDER):
        raise ValueError("vp8l: too many code-length codes")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)

    if br.read_bit():  # use a symbol-count limit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            if symbol + rep > alphabet_size:
                raise ValueError("vp8l: code-length repeat overruns alphabet")
            for _ in range(rep):
                lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        elif s == 18:
            symbol += 11 + br.read(7)
        else:
            raise ValueError("vp8l: bad code-length symbol")
        if symbol > alphabet_size:
            raise ValueError("vp8l: code lengths overrun alphabet")
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _prefix_value(br: _BitReader, symbol: int) -> int:
    """length/distance prefix scheme: symbol -> value (1-based)."""
    if symbol < 4:
        return symbol + 1
    extra_bits = (symbol - 2) >> 1
    offset = (2 + (symbol & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _prefix_symbol(value: int) -> tuple[int, int, int]:
    """value (1-based) -> (symbol, extra_value, extra_bits) — writer side."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra_bits = v.bit_length() - 2
    bit = (v >> extra_bits) & 1
    offset = (2 + bit) << extra_bits
    return 2 * extra_bits + 2 + bit, value - offset - 1, extra_bits


# the 2D neighbor map for distance codes 1..120 (RFC 9649 §3.6.2.3),
# (dx, dy) pairs ordered by increasing distance
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_distance(dist_code: int, width: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * width + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# Entropy-coded image decode
# ---------------------------------------------------------------------------


_CACHE_MULT = 0x1E35A7BD


def _cache_hash(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_code_groups(br: _BitReader, n_groups: int, cache_size: int):
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    return groups


def _decode_entropy_image(
    br: _BitReader, width: int, height: int, is_main: bool
):
    """Decode one spatially/entropy-coded ARGB image to a flat uint32
    list of length width*height."""
    if width < 1 or height < 1 or width * height > _MAX_PIXELS:
        raise ValueError(f"vp8l: image dimensions {width}x{height} out of bounds")
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"vp8l: color cache bits {cache_bits} invalid")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (width + (1 << meta_bits) - 1) >> meta_bits
        mh = (height + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    groups = _read_code_groups(br, n_groups, cache_size)
    cache = [0] * cache_size

    npix = width * height
    out = [0] * npix
    pos = 0
    meta_w = (width + (1 << meta_bits) - 1) >> meta_bits if meta else 0
    x = y = 0  # maintained incrementally: div-mod per pixel is hot-loop cost
    while pos < npix:
        if meta is not None:
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            green_c, red_c, blue_c, alpha_c, dist_c = groups[(mp >> 8) & 0xFFFF]
        else:
            green_c, red_c, blue_c, alpha_c, dist_c = groups[0]
        s = green_c.decode(br)
        if s < 256:  # literal
            r = red_c.decode(br)
            b = blue_c.decode(br)
            a = alpha_c.decode(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = argb
            if cache_size:
                cache[_cache_hash(argb, cache_bits)] = argb
            pos += 1
            x += 1
            if x == width:
                x = 0
                y += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(br, s - 256)
            dist_sym = dist_c.decode(br)
            dist_code = _prefix_value(br, dist_sym)
            dist = _plane_distance(dist_code, width)
            if dist > pos or pos + length > npix:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                argb = out[pos - dist]
                out[pos] = argb
                if cache_size:
                    cache[_cache_hash(argb, cache_bits)] = argb
                pos += 1
            x = pos % width
            y = pos // width
        else:  # color cache
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("vp8l: color cache index out of range")
            out[pos] = cache[idx]
            pos += 1
            x += 1
            if x == width:
                x = 0
                y += 1
    return out


# ---------------------------------------------------------------------------
# Transforms (inverse on decode)
# ---------------------------------------------------------------------------


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = img[:, :, 1].astype(np.uint16)
    img[:, :, 0] = ((img[:, :, 0] + g) & 0xFF).astype(np.uint8)
    img[:, :, 2] = ((img[:, :, 2] + g) & 0xFF).astype(np.uint8)
    return img


def _avg2(a, b):
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


def _predict(mode: int, L, T, TL, TR):
    """One pixel's predictor (each arg a length-4 uint8 vector ARGB
    order [a, r, g, b] — we use [r, g, b, a] internally; order only
    needs to be consistent)."""
    if mode == 0:
        return np.array([0, 0, 0, 255], np.uint8)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T).astype(np.uint8)
    if mode == 6:
        return _avg2(L, TL).astype(np.uint8)
    if mode == 7:
        return _avg2(L, T).astype(np.uint8)
    if mode == 8:
        return _avg2(TL, T).astype(np.uint8)
    if mode == 9:
        return _avg2(T, TR).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR)).astype(np.uint8)
    if mode == 11:  # Select
        li = L.astype(np.int32)
        ti = T.astype(np.int32)
        tli = TL.astype(np.int32)
        p = li + ti - tli
        pl = int(np.abs(p - li).sum())
        pt = int(np.abs(p - ti).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf: clamp(a + (a - b) / 2)
        avg = _avg2(L, T).astype(np.int32)
        diff = avg - TL.astype(np.int32)
        # C TRUNCATING division (libwebp `(a - b) / 2`): floor shift is
        # off by one for negative odd differences
        half = diff // 2 + ((diff < 0) & (diff % 2 != 0))
        return np.clip(avg + half, 0, 255).astype(np.uint8)
    raise ValueError(f"vp8l: predictor mode {mode} invalid")


def _inv_predictor(img: np.ndarray, modes, size_bits: int) -> np.ndarray:
    h, w = img.shape[:2]
    mw = (w + (1 << size_bits) - 1) >> size_bits
    out = img.astype(np.uint16)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255], np.uint16)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = (modes[(y >> size_bits) * mw + (x >> size_bits)] >> 8) & 0xFF
                L = out[y, x - 1].astype(np.uint8)
                T = out[y - 1, x].astype(np.uint8)
                TL = out[y - 1, x - 1].astype(np.uint8)
                # TR at the right edge wraps to the CURRENT row's
                # leftmost pixel (flat addressing top[x+1] == row y,
                # column 0 — already decoded), per RFC 9649/libwebp
                TR = (
                    out[y - 1, x + 1].astype(np.uint8)
                    if x + 1 < w
                    else out[y, 0].astype(np.uint8)
                )
                pred = _predict(mode, L, T, TL, TR).astype(np.uint16)
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 multiply >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(img: np.ndarray, elems, size_bits: int) -> np.ndarray:
    h, w = img.shape[:2]
    mw = (w + (1 << size_bits) - 1) >> size_bits
    for y in range(h):
        for x in range(w):
            e = elems[(y >> size_bits) * mw + (x >> size_bits)]
            g2r = e & 0xFF  # stored in blue channel
            g2b = (e >> 8) & 0xFF  # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            r, g, b = int(img[y, x, 0]), int(img[y, x, 1]), int(img[y, x, 2])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            img[y, x, 0] = r
            img[y, x, 2] = b
    return img


def _inv_palette(
    pixels, palette, w_packed: int, width: int, height: int, width_bits: int
) -> np.ndarray:
    """COLOR_INDEXING inverse, including sub-pixel bundling."""
    out = np.zeros((height, width, 4), np.uint8)
    npal = len(palette)
    per = 1 << width_bits
    bits = 8 >> width_bits
    mask = (1 << bits) - 1
    for y in range(height):
        for x in range(width):
            if width_bits:
                packed = pixels[y * w_packed + (x >> width_bits)]
                g = (packed >> 8) & 0xFF
                idx = (g >> ((x % per) * bits)) & mask
            else:
                idx = (pixels[y * w_packed + x] >> 8) & 0xFF
            if idx >= npal:
                raise ValueError("vp8l: palette index out of range")
            out[y, x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# Top-level decode
# ---------------------------------------------------------------------------


def sniff_webp(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def _find_stream(payload: bytes) -> tuple[str, bytes, bytes | None]:
    """Walk the RIFF chunks to the image stream:
    ('vp8l'|'vp8', body, alph_body_or_None)."""
    pos = 12
    n = len(payload)
    alph = None
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: chunk overruns container")
        if fourcc == b"VP8L":
            return "vp8l", body, None  # VP8L carries its own alpha
        if fourcc == b"ALPH":
            alph = body
        if fourcc == b"VP8 ":
            return "vp8", body, alph
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8/VP8L image chunk found")


def _find_vp8l(payload: bytes) -> bytes:
    kind, body, _ = _find_stream(payload)
    if kind != "vp8l":
        raise ValueError("webp: no VP8L chunk found")
    return body


def _argb_list_to_array(pixels, width: int, height: int) -> np.ndarray:
    arr = np.array(pixels, np.uint32).reshape(height, width)
    out = np.zeros((height, width, 4), np.uint8)
    out[:, :, 0] = (arr >> 16) & 0xFF  # r
    out[:, :, 1] = (arr >> 8) & 0xFF  # g
    out[:, :, 2] = arr & 0xFF  # b
    out[:, :, 3] = (arr >> 24) & 0xFF  # a
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP (lossless or lossy) to an (H, W, 3) uint8 RGB array."""
    return decode_webp_rgba(payload)[:, :, :3].copy()


def decode_webp_rgba(payload: bytes) -> np.ndarray:
    """Decode a WebP (VP8L lossless or VP8 lossy key frame) to an
    (H, W, 4) uint8 RGBA array (alpha 255 for lossy)."""
    if not sniff_webp(payload):
        raise ValueError("payload is not a RIFF/WEBP container")
    kind, stream, alph = _find_stream(payload)
    if kind == "vp8":
        from . import rawvp8  # noqa: PLC0415

        rgb = rawvp8.decode_vp8_rgb(stream)
        h, w = rgb.shape[:2]
        out = np.empty((h, w, 4), np.uint8)
        out[:, :, :3] = rgb
        out[:, :, 3] = decode_alph(alph, w, h) if alph is not None else 255
        return out
    if len(stream) < 5 or stream[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _BitReader(stream[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    if width * height > _MAX_PIXELS:
        raise ValueError("vp8l: declared dimensions exceed the pixel cap")
    return _decode_vp8l_body(br, width, height)


def _decode_vp8l_body(br: _BitReader, width: int, height: int) -> np.ndarray:
    """Decode a VP8L stream AFTER the signature/dimension header —
    shared by full lossless files and the headerless ALPH alpha plane
    (whose dimensions come from the VP8 frame)."""
    # transforms, in bitstream order (inverted in reverse later)
    transforms = []
    seen_types = set()
    xsize = width
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("vp8l: duplicate transform")
        seen_types.add(ttype)
        if ttype == 0:  # PREDICTOR
            size_bits = br.read(3) + 2
            mw = (xsize + (1 << size_bits) - 1) >> size_bits
            mh = (height + (1 << size_bits) - 1) >> size_bits
            data = _decode_entropy_image(br, mw, mh, False)
            transforms.append(("predictor", size_bits, data))
        elif ttype == 1:  # COLOR_TRANSFORM
            size_bits = br.read(3) + 2
            mw = (xsize + (1 << size_bits) - 1) >> size_bits
            mh = (height + (1 << size_bits) - 1) >> size_bits
            data = _decode_entropy_image(br, mw, mh, False)
            transforms.append(("color", size_bits, data))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            npal = br.read(8) + 1
            pal_pixels = _decode_entropy_image(br, npal, 1, False)
            # palette entries are delta-coded per channel
            pal = np.zeros((npal, 4), np.uint8)
            prev = np.zeros(4, np.uint16)
            for i, p in enumerate(pal_pixels):
                cur = np.array(
                    [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, (p >> 24) & 0xFF],
                    np.uint16,
                )
                prev = (prev + cur) & 0xFF
                pal[i] = prev
            if npal <= 2:
                width_bits = 3
            elif npal <= 4:
                width_bits = 2
            elif npal <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("palette", pal, width_bits, xsize))
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits
        if len(transforms) == 4:
            break

    pixels = _decode_entropy_image(br, xsize, height, True)

    # invert transforms in reverse order
    img = None
    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, width_bits, orig_w = t
            if pixels is None:
                # a transform read after COLOR_INDEXING was already
                # inverted on the packed index image — re-flatten it
                # for the palette lookup (spec allows any order)
                pixels = [
                    (int(img[y, x, 3]) << 24)
                    | (int(img[y, x, 0]) << 16)
                    | (int(img[y, x, 1]) << 8)
                    | int(img[y, x, 2])
                    for y in range(height)
                    for x in range(img.shape[1])
                ]
            img = _inv_palette(pixels, pal, xsize, orig_w, height, width_bits)
            xsize = orig_w
            pixels = None
        else:
            if img is None:
                img = _argb_list_to_array(pixels, xsize, height)
                pixels = None
            if t[0] == "subtract_green":
                img = _inv_subtract_green(img)
            elif t[0] == "predictor":
                img = _inv_predictor(img, t[2], t[1])
            elif t[0] == "color":
                img = _inv_color_transform(img, t[2], t[1])
    if img is None:
        img = _argb_list_to_array(pixels, xsize, height)
    return img


# ---------------------------------------------------------------------------
# Encoder (fixture-grade: complete balanced codes, optional transforms)
# ---------------------------------------------------------------------------


def _balanced_lengths(symbols: list[int], alphabet_size: int) -> list[int]:
    """A complete prefix code over exactly these symbols: k symbols get
    lengths L-1/L with L = ceil(log2(k)) so the Kraft sum is exactly 1."""
    k = len(symbols)
    lengths = [0] * alphabet_size
    if k == 1:
        lengths[symbols[0]] = 1  # handled as a simple code downstream
        return lengths
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k  # symbols with length L-1
    for i, sym in enumerate(sorted(symbols)):
        lengths[sym] = (L - 1) if i < n_short and L > 1 else L
    return lengths


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a code-length-coded prefix code (the non-simple form)."""
    used_lens = sorted({ln for ln in lengths if ln > 0})
    cl_symbols = sorted(set(used_lens) | {0, 18})
    cl_lengths = _balanced_lengths(cl_symbols, 19)
    # a 1-symbol code-length code cannot be expressed (no simple form
    # here); pad with symbol 0 at equal length — always possible since
    # cl_symbols includes 0 and 18 already (>= 2 symbols)
    max_pos = max(_CODE_LENGTH_ORDER.index(s) for s in cl_symbols)
    num_code_lengths = max(4, max_pos + 1)
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol limit: we emit full coverage
    cl_codes = _canonical_codes(cl_lengths)

    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 0
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                chunk = min(run, 138)
                code, ln = cl_codes[18]
                bw.write_code(code, ln)
                bw.write(chunk - 11, 7)
                run -= chunk
            for _ in range(run):
                code, ln = cl_codes[0]
                bw.write_code(code, ln)
        else:
            code, ln = cl_codes[lengths[i]]
            bw.write_code(code, ln)
            i += 1


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1 and used[0][0] < 256:
        sym = used[0][0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if sym < 2:
            bw.write(0, 1)
            bw.write(sym, 1)
        else:
            bw.write(1, 1)
            bw.write(sym, 8)
        return
    if (
        len(used) == 2
        and all(ln == 1 for _, ln in used)
        and used[0][0] < 256
        and used[1][0] < 256
    ):
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        sym0, sym1 = used[0][0], used[1][0]
        if sym0 < 2:
            bw.write(0, 1)
            bw.write(sym0, 1)
        else:
            bw.write(1, 1)
            bw.write(sym0, 8)
        bw.write(sym1, 8)
        return
    bw.write(0, 1)  # code-length-coded
    _write_code_lengths(bw, lengths)


def _emit_meta_entropy_image(
    bw: _BitWriter, pixels: list[int], width: int, meta_bits: int
) -> None:
    """Write the main image with meta prefix codes: one code group per
    2^meta_bits tile, each built from its own tile's symbols — the
    decoder path real encoders use for spatially varying statistics."""
    height = len(pixels) // width
    mw = (width + (1 << meta_bits) - 1) >> meta_bits
    mh = (height + (1 << meta_bits) - 1) >> meta_bits
    n_groups = mw * mh
    if n_groups > 64:
        raise ValueError("meta fixture writer caps at 64 tiles")
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(meta_bits - 2, 3)
    # entropy image: green channel carries the group index
    meta_pixels = [
        (0xFF << 24) | ((ty * mw + tx) << 8)
        for ty in range(mh)
        for tx in range(mw)
    ]
    _emit_entropy_image(bw, meta_pixels, is_main=False)

    # per-group codes from per-tile symbol sets
    group_syms: list[tuple[set, set, set, set]] = [
        (set(), set(), set(), set()) for _ in range(n_groups)
    ]
    for pos, argb in enumerate(pixels):
        x, y = pos % width, pos // width
        g = (y >> meta_bits) * mw + (x >> meta_bits)
        gs, rs, bs, as_ = group_syms[g]
        gs.add((argb >> 8) & 0xFF)
        rs.add((argb >> 16) & 0xFF)
        bs.add(argb & 0xFF)
        as_.add((argb >> 24) & 0xFF)

    group_codes = []
    for gs, rs, bs, as_ in group_syms:
        lens = [
            _balanced_lengths(sorted(gs) or [0], 256 + 24),
            _balanced_lengths(sorted(rs) or [0], 256),
            _balanced_lengths(sorted(bs) or [0], 256),
            _balanced_lengths(sorted(as_) or [0], 256),
            _balanced_lengths([0], 40),
        ]
        for ln in lens:
            _write_prefix_code(bw, ln)
        group_codes.append(
            [
                {s: (0, 0) for s in _canonical_codes(ln)}
                if len(_canonical_codes(ln)) == 1
                else _canonical_codes(ln)
                for ln in lens
            ]
        )

    for pos, argb in enumerate(pixels):
        x, y = pos % width, pos // width
        g = (y >> meta_bits) * mw + (x >> meta_bits)
        gc, rc, bc, ac, _ = group_codes[g]
        for codes, sym in (
            (gc, (argb >> 8) & 0xFF),
            (rc, (argb >> 16) & 0xFF),
            (bc, argb & 0xFF),
            (ac, (argb >> 24) & 0xFF),
        ):
            code, ln = codes[sym]
            bw.write_code(code, ln)


def _emit_entropy_image(
    bw: _BitWriter,
    pixels: list[int],
    is_main: bool,
    cache_bits: int = 0,
    rle: bool = False,
) -> None:
    """Write one entropy-coded ARGB image (single code group)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    tokens = []  # ('lit', argb) | ('cache', idx) | ('ref', length)
    pos = 0
    n = len(pixels)
    while pos < n:
        argb = pixels[pos]
        if rle and pos > 0 and argb == pixels[pos - 1]:
            run = 1
            while (
                pos + run < n
                and pixels[pos + run] == pixels[pos + run - 1]
                and run < 4096
            ):
                run += 1
            if run >= 3:
                tokens.append(("ref", run))
                if cache_size:
                    for i in range(run):
                        cache[_cache_hash(pixels[pos + i], cache_bits)] = pixels[
                            pos + i
                        ]
                pos += run
                continue
        if cache_size:
            h = _cache_hash(argb, cache_bits)
            if cache[h] == argb and pos > 0:
                tokens.append(("cache", h))
                pos += 1
                continue
            cache[h] = argb
        tokens.append(("lit", argb))
        pos += 1

    green_syms, red_syms, blue_syms, alpha_syms, dist_syms = (
        set(),
        set(),
        set(),
        set(),
        set(),
    )
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            green_syms.add((argb >> 8) & 0xFF)
            red_syms.add((argb >> 16) & 0xFF)
            blue_syms.add(argb & 0xFF)
            alpha_syms.add((argb >> 24) & 0xFF)
        elif t[0] == "cache":
            green_syms.add(256 + 24 + t[1])
        else:
            s, _, _ = _prefix_symbol(t[1])
            green_syms.add(256 + s)
            ds, _, _ = _prefix_symbol(121)  # plain distance 1
            dist_syms.add(ds)

    green_alpha = 256 + 24 + cache_size
    green_lengths = _balanced_lengths(sorted(green_syms), green_alpha)
    red_lengths = _balanced_lengths(sorted(red_syms) or [0], 256)
    blue_lengths = _balanced_lengths(sorted(blue_syms) or [0], 256)
    alpha_lengths = _balanced_lengths(sorted(alpha_syms) or [0], 256)
    dist_lengths = _balanced_lengths(sorted(dist_syms) or [0], 40)

    # header: cache, then (main only) no meta codes
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_main:
        bw.write(0, 1)  # no meta prefix codes

    for lengths in (
        green_lengths,
        red_lengths,
        blue_lengths,
        alpha_lengths,
        dist_lengths,
    ):
        _write_prefix_code(bw, lengths)

    def emit_codes(lengths):
        codes = _canonical_codes(lengths)
        if len(codes) == 1:
            # a single-symbol code consumes ZERO bits on decode
            return {sym: (0, 0) for sym in codes}
        return codes

    g_codes = emit_codes(green_lengths)
    r_codes = emit_codes(red_lengths)
    b_codes = emit_codes(blue_lengths)
    a_codes = emit_codes(alpha_lengths)
    d_codes = emit_codes(dist_lengths)

    def put(codes, sym):
        code, ln = codes[sym]
        bw.write_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            put(g_codes, (argb >> 8) & 0xFF)
            put(r_codes, (argb >> 16) & 0xFF)
            put(b_codes, argb & 0xFF)
            put(a_codes, (argb >> 24) & 0xFF)
        elif t[0] == "cache":
            put(g_codes, 256 + 24 + t[1])
        else:
            s, extra, nbits = _prefix_symbol(t[1])
            put(g_codes, 256 + s)
            bw.write(extra, nbits)
            ds, dextra, dnbits = _prefix_symbol(121)
            put(d_codes, ds)
            bw.write(dextra, dnbits)


def _to_argb(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3|4) uint8 -> (H, W) uint32 ARGB."""
    h, w = arr.shape[:2]
    a = (
        arr[:, :, 3].astype(np.uint32)
        if arr.shape[2] == 4
        else np.full((h, w), 255, np.uint32)
    )
    return (
        (a << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    )


def encode_webp_lossless(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
    meta_bits: int | None = None,
    headerless: bool = False,
) -> bytes:
    """Write a lossless WebP.  Every option exercises one decoder path
    and the roundtrip stays bit-exact: ``subtract_green``, a fixed
    ``predictor`` mode (0-13), a fixed ``color_transform``
    (g2r, g2b, r2b), ``palette`` indexing (with pixel bundling when the
    image has <= 16 distinct colors), a color ``cache``, and ``rle``
    distance-1 backward references."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless wants (H, W, 3|4) uint8")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l: dimensions out of the 14-bit range")
    argb = _to_argb(arr)

    bw = _BitWriter()
    if not headerless:
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(1 if arr.shape[2] == 4 else 0, 1)
        bw.write(0, 3)  # version

    size_bits = 2  # 4x4 tiles for predictor/color transforms

    # transforms are written (and applied forward) in this order;
    # the decoder inverts them in reverse
    if palette:
        if subtract_green or predictor is not None or color_transform or meta_bits:
            # this fixture writer applies palette exclusively; silently
            # ignoring the other kwargs would make a test exercise a
            # different decoder path than it claims
            raise ValueError(
                "palette=True cannot be combined with other transform "
                "options in this writer"
            )
        colors = np.unique(argb.reshape(-1))
        if len(colors) > 256:
            raise ValueError("palette variant needs <= 256 distinct colors")
        pal = list(int(c) for c in colors)
        npal = len(pal)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(npal - 1, 8)
        # delta-code the palette, per channel mod 256
        deltas = []
        prev = 0
        for c in pal:
            d = 0
            for shift in (24, 16, 8, 0):
                dc = ((c >> shift) - (prev >> shift)) & 0xFF
                d |= dc << shift
            deltas.append(d)
            prev = c
        _emit_entropy_image(bw, deltas, is_main=False)
        index_of = {c: i for i, c in enumerate(pal)}
        if npal <= 2:
            width_bits = 3
        elif npal <= 4:
            width_bits = 2
        elif npal <= 16:
            width_bits = 1
        else:
            width_bits = 0
        idx = np.vectorize(index_of.get)(argb)
        if width_bits:
            per = 1 << width_bits
            bits = 8 >> width_bits
            packed_w = (w + per - 1) // per
            packed = np.zeros((h, packed_w), np.uint32)
            for x in range(w):
                packed[:, x // per] |= idx[:, x].astype(np.uint32) << (
                    (x % per) * bits
                )
            argb = (0xFF << 24) | (packed << 8)
        else:
            argb = (0xFF << 24) | (idx.astype(np.uint32) << 8)
        bw.write(0, 1)  # no more transforms
        _emit_entropy_image(
            bw,
            [int(v) for v in argb.reshape(-1)],
            is_main=True,
            cache_bits=cache_bits,
            rle=rle,
        )
        return _wrap_riff(bw.getvalue())

    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        bw.write(size_bits - 2, 3)
        mw = (w + (1 << size_bits) - 1) >> size_bits
        mh = (h + (1 << size_bits) - 1) >> size_bits
        cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _emit_entropy_image(bw, [cte] * (mw * mh), is_main=False)
        # forward transform (inverse of the decoder's addition)
        out = argb.copy()
        for y in range(h):
            for x in range(w):
                p = int(argb[y, x])
                r = (p >> 16) & 0xFF
                g = (p >> 8) & 0xFF
                b = p & 0xFF
                new_r = (r - _ct_delta(g2r, g)) & 0xFF
                # the decoder applies red_to_blue against the RESTORED
                # red (it adds g2r first), i.e. the original value
                new_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
                out[y, x] = (p & 0xFF00FF00) | (new_r << 16) | new_b
        argb = out

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & 0xFF00FF00) | (r << 16) | b

    if predictor is not None:
        if not (0 <= predictor <= 13):
            raise ValueError("predictor mode must be 0..13")
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(size_bits - 2, 3)
        mw = (w + (1 << size_bits) - 1) >> size_bits
        mh = (h + (1 << size_bits) - 1) >> size_bits
        mode_pix = (0xFF << 24) | (predictor << 8)
        _emit_entropy_image(bw, [mode_pix] * (mw * mh), is_main=False)
        # forward residuals, scanning in order against DECODED values
        src = np.zeros((h, w, 4), np.uint8)
        src[:, :, 0] = (argb >> 16) & 0xFF
        src[:, :, 1] = (argb >> 8) & 0xFF
        src[:, :, 2] = argb & 0xFF
        src[:, :, 3] = (argb >> 24) & 0xFF
        res = np.zeros_like(src)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([0, 0, 0, 255], np.uint8)
                elif y == 0:
                    pred = src[0, x - 1]
                elif x == 0:
                    pred = src[y - 1, 0]
                else:
                    L = src[y, x - 1]
                    T = src[y - 1, x]
                    TL = src[y - 1, x - 1]
                    # same right-edge TR rule as the decoder (current
                    # row's leftmost pixel, already reconstructed —
                    # equal to src here because coding is lossless)
                    TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                    pred = _predict(predictor, L, T, TL, TR)
                res[y, x] = (
                    src[y, x].astype(np.int16) - pred.astype(np.int16)
                ) & 0xFF
        argb = (
            (res[:, :, 3].astype(np.uint32) << 24)
            | (res[:, :, 0].astype(np.uint32) << 16)
            | (res[:, :, 1].astype(np.uint32) << 8)
            | res[:, :, 2].astype(np.uint32)
        )

    bw.write(0, 1)  # no more transforms
    flat = [int(v) for v in argb.reshape(-1)]
    if meta_bits is not None:
        if not (2 <= meta_bits <= 9):
            raise ValueError("meta_bits must be 2..9")
        _emit_meta_entropy_image(bw, flat, w, meta_bits)
    else:
        _emit_entropy_image(
            bw, flat, is_main=True, cache_bits=cache_bits, rle=rle
        )
    if headerless:
        return bw.getvalue()
    return _wrap_riff(bw.getvalue())


def _wrap_riff(vp8l_bits: bytes) -> bytes:
    body = b"\x2f" + vp8l_bits
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# ---------------------------------------------------------------------------
# Animation (VP8X + ANIM/ANMF)
# ---------------------------------------------------------------------------


def _u24(b: bytes) -> int:
    return int.from_bytes(b[:3], "little")


def is_animated_webp(payload: bytes) -> bool:
    if not sniff_webp(payload):
        return False
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if fourcc == b"VP8X" and size >= 10:
            return bool(payload[pos + 8] & 0x02)  # animation flag
        pos += 8 + size + (size & 1)
    return False


def decode_webp_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode (duration_ms, RGB frame) pairs — the GIF-parity API.

    Non-animated files yield one frame with duration 0.  ANMF frames
    composite onto the canvas honoring the blend flag (src-over alpha
    vs replace) and dispose-to-background; frame rectangles are bounds-
    checked against the VP8X canvas.  Lossy sub-frames decode via
    :mod:`.rawvp8` like still lossy files, including their ALPH alpha
    planes (:func:`decode_alph`).
    """
    if not sniff_webp(payload):
        raise ValueError("payload is not a RIFF/WEBP container")
    if not is_animated_webp(payload):
        return [(0, decode_webp(payload))]

    canvas_w = canvas_h = None
    background = (255, 255, 255, 0)
    frames: list[tuple[int, np.ndarray]] = []
    canvas = None
    pending_dispose_rect = None

    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("webp: chunk overruns container")
        if fourcc == b"VP8X":
            if size < 10:
                raise ValueError("webp: short VP8X chunk")
            canvas_w = _u24(body[4:7]) + 1
            canvas_h = _u24(body[7:10]) + 1
            if canvas_w * canvas_h > _MAX_PIXELS:
                raise ValueError("webp: canvas exceeds the pixel cap")
            canvas = np.zeros((canvas_h, canvas_w, 4), np.uint8)
        elif fourcc == b"ANIM":
            if size < 6:
                raise ValueError("webp: short ANIM chunk")
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            background = (r_, g_, b_, a_)
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("webp: ANMF before VP8X canvas")
            if size < 16:
                raise ValueError("webp: short ANMF chunk")
            fx = _u24(body[0:3]) * 2
            fy = _u24(body[3:6]) * 2
            fw = _u24(body[6:9]) + 1
            fh = _u24(body[9:12]) + 1
            duration = _u24(body[12:15])
            flags = body[15]
            blend_none = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError("webp: ANMF frame outside the canvas")
            frame_rgba = decode_webp_rgba(
                b"RIFF"
                + (4 + len(body[16:])).to_bytes(4, "little")
                + b"WEBP"
                + body[16:]
            )
            if frame_rgba.shape[:2] != (fh, fw):
                raise ValueError("webp: ANMF frame size mismatch")
            if pending_dispose_rect is not None:
                x0, y0, x1, y1 = pending_dispose_rect
                canvas[y0:y1, x0:x1] = background
                pending_dispose_rect = None
            region = canvas[fy : fy + fh, fx : fx + fw]
            if blend_none:
                region[:] = frame_rgba
            else:  # src-over alpha blend (integer arithmetic)
                fa = frame_rgba[:, :, 3:4].astype(np.uint32)
                ba = region[:, :, 3:4].astype(np.uint32)
                out_a = fa + (ba * (255 - fa)) // 255
                safe = np.maximum(out_a, 1)
                out_rgb = (
                    frame_rgba[:, :, :3].astype(np.uint32) * fa
                    + region[:, :, :3].astype(np.uint32) * ba * (255 - fa) // 255
                ) // safe
                region[:, :, :3] = out_rgb.astype(np.uint8)
                region[:, :, 3:4] = out_a.astype(np.uint8)
            frames.append((duration, canvas[:, :, :3].copy()))
            if dispose_bg:
                pending_dispose_rect = (fx, fy, fx + fw, fy + fh)
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("webp: animated file carries no ANMF frames")
    return frames


def encode_webp_animation(
    frames: list[tuple[int, np.ndarray]],
    *,
    blend_none: bool = True,
    **encode_kwargs,
) -> bytes:
    """Fixture writer: full-canvas ANMF frames wrapping VP8L data."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    h, w = frames[0][1].shape[:2]
    chunks = bytearray()
    vp8x = bytearray(10)
    vp8x[0] = 0x02  # animation flag
    vp8x[4:7] = (w - 1).to_bytes(3, "little")
    vp8x[7:10] = (h - 1).to_bytes(3, "little")
    chunks += b"VP8X" + (10).to_bytes(4, "little") + vp8x
    anim = bytes([255, 255, 255, 255]) + (0).to_bytes(2, "little")
    chunks += b"ANIM" + len(anim).to_bytes(4, "little") + anim
    for duration, arr in frames:
        if arr.shape[:2] != (h, w):
            raise ValueError("fixture writer wants full-canvas frames")
        still = encode_webp_lossless(arr, **encode_kwargs)
        vp8l_chunk = still[12:]  # strip RIFF....WEBP
        body = bytearray()
        body += (0).to_bytes(3, "little")  # x/2
        body += (0).to_bytes(3, "little")  # y/2
        body += (w - 1).to_bytes(3, "little")
        body += (h - 1).to_bytes(3, "little")
        body += int(duration).to_bytes(3, "little")
        body += bytes([0x02 if blend_none else 0x00])
        body += vp8l_chunk
        chunks += b"ANMF" + len(body).to_bytes(4, "little") + bytes(body)
        if len(body) & 1:
            chunks += b"\x00"
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# ---------------------------------------------------------------------------
# ALPH alpha plane (WebP container spec §"Alpha") — round 9
# ---------------------------------------------------------------------------


def _alpha_unfilter(res: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH prediction filter.  Residuals are mod-256; the
    predictor is 0 at (0,0), the above pixel down the first column, the
    left pixel along the first row, then per-method (1 horizontal =
    left, 2 vertical = above, 3 gradient = clip(L+T-TL))."""
    if method == 0:
        return res
    h, w = res.shape
    a = res.astype(np.int64)
    if method == 1:  # horizontal: first column seeds from above
        a[:, 0] = np.cumsum(a[:, 0]) & 0xFF
        a = np.cumsum(a, axis=1) & 0xFF
    elif method == 2:  # vertical: first row seeds from left
        a[0, :] = np.cumsum(a[0, :]) & 0xFF
        a = np.cumsum(a, axis=0) & 0xFF
    elif method == 3:  # gradient: inherently sequential
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    p = 0
                elif y == 0:
                    p = a[0, x - 1]
                elif x == 0:
                    p = a[y - 1, 0]
                else:
                    p = min(255, max(0, int(a[y, x - 1]) + int(a[y - 1, x])
                                     - int(a[y - 1, x - 1])))
                a[y, x] = (a[y, x] + p) & 0xFF
    else:
        raise ValueError(f"webp: bad ALPH filtering method {method}")
    return a.astype(np.uint8)


def _alpha_filter(plane: np.ndarray, method: int) -> np.ndarray:
    """Forward filter for the fixture writer (exact inverse of
    :func:`_alpha_unfilter` — alpha coding is lossless)."""
    if method == 0:
        return plane
    h, w = plane.shape
    a = plane.astype(np.int64)
    res = np.zeros_like(a)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                p = 0
            elif y == 0:
                p = a[0, x - 1]
            elif x == 0:
                p = a[y - 1, 0]
            elif method == 1:
                p = a[y, x - 1]
            elif method == 2:
                p = a[y - 1, x]
            else:
                p = min(255, max(0, int(a[y, x - 1]) + int(a[y - 1, x])
                                 - int(a[y - 1, x - 1])))
            res[y, x] = (a[y, x] - p) & 0xFF
    return res.astype(np.uint8)


def decode_alph(body: bytes, width: int, height: int) -> np.ndarray:
    """Decode an ALPH chunk body to an (H, W) uint8 alpha plane.

    Header byte: compression (2 bits: 0 raw, 1 headerless VP8L with
    alpha in the green channel), filtering method (2 bits), level-
    reduction preprocessing (2 bits, informational).  Dimensions come
    from the VP8 frame.
    """
    if not body:
        raise ValueError("webp: empty ALPH chunk")
    hdr = body[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    if comp == 0:
        need = width * height
        if len(body) - 1 < need:
            raise ValueError("webp: raw ALPH plane shorter than the frame")
        res = np.frombuffer(body[1 : 1 + need], np.uint8).reshape(
            height, width
        ).copy()
    elif comp == 1:
        img = _decode_vp8l_body(_BitReader(body[1:]), width, height)
        if img.shape[:2] != (height, width):
            raise ValueError("webp: ALPH lossless plane size mismatch")
        res = img[:, :, 1].copy()  # alpha rides the green channel
    else:
        raise ValueError(f"webp: bad ALPH compression method {comp}")
    return _alpha_unfilter(res, filt)


def encode_alph(
    alpha: np.ndarray, *, compression: int = 1, filter_method: int = 0
) -> bytes:
    """Fixture writer for ALPH chunk bodies (both compression methods,
    all four filters) — roundtrips bit-exactly through
    :func:`decode_alph`."""
    if compression not in (0, 1):
        raise ValueError("webp: ALPH compression must be 0 or 1")
    res = _alpha_filter(alpha, filter_method)
    hdr = bytes([(filter_method << 2) | compression])
    if compression == 0:
        return hdr + res.tobytes()
    h, w = alpha.shape
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :, 1] = res  # green channel carries the plane
    return hdr + encode_webp_lossless(rgb, headerless=True)
