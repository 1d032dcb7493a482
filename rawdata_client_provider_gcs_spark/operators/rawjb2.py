"""JB2 — DjVu's bitonal mask codec (Sjbz chunks), r16.

The DjVu v3 reference describes JB2 as a record stream over the ZP
coder: a start-of-data record carrying the image size, "new mark"
records that direct-code a symbol bitmap and place it (adding it to a
symbol library), "matched copy" records that re-place a library symbol
by index, and an end record — the shape scanned text actually
compresses to (each glyph coded once, reused everywhere).

Provenance tiers (the BZZ/VP9 discipline):

- REAL (spec structure): the record-stream organization, the symbol
  library add/reuse/refine semantics, the 10-pixel direct-coding
  context (three pixels two rows up, five one row up, two to the left
  — 1024 adaptive ZP contexts), center alignment of refinement
  references, and the ZP coder itself (:mod:`..sources.bzz`).
- SYNTHETIC-SUBSET, marked: the adaptive number coder here is a
  contexted binary-search tree over ``[low, high]`` (one lazily
  allocated ZP context per visited node) standing in for the
  reference's phased range decomposition, and coordinates are coded
  absolutely rather than through the reference's relative-baseline
  prediction.  Encoder and decoder share every context decision, so
  in-repo fixtures decode VALUE-EXACTLY; real-world Sjbz stays the
  documented per-row boundary — doubly so while the ZP table's
  high-state tail is formula-reconstructed (``sources/bzz.py``).

Refinement records (type 4, r16) decode too: the refined bitmap is
coded against its center-aligned library ancestor through a 13-pixel
current+reference context and joins the library.  Out of scope, loud:
comments, required dictionaries (shared shape tables), and the other
record types.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
decoding is this repo's derived multimodal tier.
"""

from __future__ import annotations

import numpy as np

from ..sources.bzz import ZPDecoder, ZPEncoder

#: record types (DjVu v3 reference numbering)
REC_START = 0
REC_NEW_MARK = 1       # add to image and library
REC_REFINE = 4         # matched symbol with refinement, add to both
REC_MATCHED_COPY = 6   # place a library symbol by index
REC_END = 11

#: hostile-input bounds.  Besides the page cap, the DECODED-symbol
#: budget bounds hostile CPU: each symbol pixel is one Python-level
#: ZP decision (~1 M/s), and record count alone would let a crafted
#: stream demand 65k × 4 Mpx symbols.
MAX_DIM = 1 << 14
MAX_PIXELS = 4 << 20
MAX_SYMBOL_PIXELS = 1 << 20
MAX_TOTAL_SYMBOL_PIXELS = 1 << 22
MAX_RECORDS = 1 << 16


class _NumCoder:
    """One adaptive number distribution: a contexted binary search
    over ``[low, high]`` with a lazily grown ZP context per tree node
    (synthetic-subset stand-in for the reference's phased
    decomposition — see the module header)."""

    __slots__ = ("ctx", "nodes")

    def __init__(self):
        self.ctx: list = []
        self.nodes: dict = {}

    def _slot(self, node: int) -> int:
        idx = self.nodes.get(node)
        if idx is None:
            idx = len(self.ctx)
            self.nodes[node] = idx
            self.ctx.append(0)
        return idx

    def decode(self, zp: ZPDecoder, low: int, high: int) -> int:
        if low > high:
            raise ValueError("jb2: empty number range")
        node = 1
        while low < high:
            mid = (low + high) >> 1
            if zp.decode(self.ctx, self._slot(node)):
                low = mid + 1
                node = node * 2 + 1
            else:
                high = mid
                node = node * 2
        return low

    def encode(self, zp: ZPEncoder, value: int, low: int,
               high: int) -> None:
        if not low <= value <= high:
            raise ValueError("jb2: number outside its coded range")
        node = 1
        while low < high:
            mid = (low + high) >> 1
            bit = 1 if value > mid else 0
            zp.encode(bit, self.ctx, self._slot(node))
            if bit:
                low = mid + 1
                node = node * 2 + 1
            else:
                high = mid
                node = node * 2
        assert low == value


def _direct_ctx(bm: np.ndarray, y: int, x: int) -> int:
    """10-pixel direct-coding context: (y-2, x-1..x+1), (y-1,
    x-2..x+2), (y, x-2..x-1); out-of-bounds pixels read 0."""
    h, w = bm.shape

    def px(yy, xx):
        if yy < 0 or xx < 0 or xx >= w:
            return 0
        return int(bm[yy, xx])

    c = 0
    for xx in (x - 1, x, x + 1):
        c = (c << 1) | px(y - 2, xx)
    for xx in (x - 2, x - 1, x, x + 1, x + 2):
        c = (c << 1) | px(y - 1, xx)
    c = (c << 1) | px(y, x - 2)
    c = (c << 1) | px(y, x - 1)
    return c


def _decode_bitmap(zp: ZPDecoder, ctx: list, w: int, h: int) -> np.ndarray:
    bm = np.zeros((h, w), np.uint8)
    for y in range(h):
        for x in range(w):
            bm[y, x] = zp.decode(ctx, _direct_ctx(bm, y, x))
    return bm


def _encode_bitmap(zp: ZPEncoder, ctx: list, bm: np.ndarray) -> None:
    h, w = bm.shape
    for y in range(h):
        for x in range(w):
            zp.encode(int(bm[y, x]), ctx, _direct_ctx(bm, y, x))


def _refine_ctx(bm: np.ndarray, ref: np.ndarray, y: int, x: int,
                oy: int, ox: int) -> int:
    """13-pixel refinement context: 4 causal pixels of the bitmap
    being decoded ((y-1, x-1..x+1), (y, x-1)) plus the 3×3 reference
    neighborhood around the center-aligned position (spec shape; the
    exact pixel set is the documented subset choice — shared by both
    directions)."""
    h, w = bm.shape
    rh, rw = ref.shape

    def cur(yy, xx):
        if yy < 0 or xx < 0 or xx >= w:
            return 0
        return int(bm[yy, xx])

    def rp(yy, xx):
        if yy < 0 or xx < 0 or yy >= rh or xx >= rw:
            return 0
        return int(ref[yy, xx])

    c = 0
    for xx in (x - 1, x, x + 1):
        c = (c << 1) | cur(y - 1, xx)
    c = (c << 1) | cur(y, x - 1)
    ry, rx = y - oy, x - ox
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            c = (c << 1) | rp(ry + dy, rx + dx)
    return c


def _center_offset(sh: int, sw: int, rh: int, rw: int) -> tuple:
    """Center alignment of the reference under the refined bitmap."""
    return ((sh - 1) // 2 - (rh - 1) // 2,
            (sw - 1) // 2 - (rw - 1) // 2)


def _decode_refined(zp: ZPDecoder, ctx: list, w: int, h: int,
                    ref: np.ndarray) -> np.ndarray:
    bm = np.zeros((h, w), np.uint8)
    oy, ox = _center_offset(h, w, *ref.shape)
    for y in range(h):
        for x in range(w):
            bm[y, x] = zp.decode(ctx, _refine_ctx(bm, ref, y, x, oy, ox))
    return bm


def _encode_refined(zp: ZPEncoder, ctx: list, bm: np.ndarray,
                    ref: np.ndarray) -> None:
    h, w = bm.shape
    oy, ox = _center_offset(h, w, *ref.shape)
    for y in range(h):
        for x in range(w):
            zp.encode(int(bm[y, x]), ctx,
                      _refine_ctx(bm, ref, y, x, oy, ox))


class _Dists:
    """The per-stream number distributions (one adaptive tree each,
    like the reference's separate NumContexts per field)."""

    def __init__(self):
        self.rec_type = _NumCoder()
        self.image_size = _NumCoder()
        self.sym_size = _NumCoder()
        self.sym_col = _NumCoder()
        self.sym_row = _NumCoder()
        self.sym_index = _NumCoder()


def _decode_stream(data: bytes) -> tuple[int, int, list]:
    """Shared record walk → (width, height, blits) with blits =
    ``[(bitmap, x, y), ...]`` in record order (matched copies
    resolved to their library bitmaps)."""
    zp = ZPDecoder(bytes(data))
    d = _Dists()
    direct_ctx = [0] * 1024
    refine_ctx = [0] * 8192
    rec = d.rec_type.decode(zp, 0, 11)
    if rec != REC_START:
        raise ValueError("jb2: stream does not begin with start-of-data")
    w = d.image_size.decode(zp, 0, MAX_DIM)
    h = d.image_size.decode(zp, 0, MAX_DIM)
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise ValueError("jb2: image size outside bounds")
    library: list = []
    blits: list = []
    budget = MAX_TOTAL_SYMBOL_PIXELS
    for _ in range(MAX_RECORDS):
        rec = d.rec_type.decode(zp, 0, 11)
        if rec == REC_END:
            return w, h, blits
        if rec in (REC_NEW_MARK, REC_REFINE):
            if rec == REC_REFINE:
                if not library:
                    raise ValueError(
                        "jb2: refinement with empty library")
                idx = d.sym_index.decode(zp, 0, len(library) - 1)
            sw = d.sym_size.decode(zp, 1, MAX_DIM)
            sh = d.sym_size.decode(zp, 1, MAX_DIM)
            if sw * sh > MAX_SYMBOL_PIXELS:
                raise ValueError("jb2: symbol too large")
            budget -= sw * sh
            if budget < 0:
                raise ValueError(
                    "jb2: decoded symbol pixels over the budget (bomb)"
                )
            if rec == REC_NEW_MARK:
                bm = _decode_bitmap(zp, direct_ctx, sw, sh)
            else:
                bm = _decode_refined(zp, refine_ctx, sw, sh,
                                     library[idx])
            library.append(bm)
        elif rec == REC_MATCHED_COPY:
            if not library:
                raise ValueError("jb2: matched copy with empty library")
            idx = d.sym_index.decode(zp, 0, len(library) - 1)
            bm = library[idx]
        else:
            raise ValueError(
                f"jb2: record type {rec} outside the decoded subset "
                "(refinement/comment/dictionary records undecoded)"
            )
        x = d.sym_col.decode(zp, 0, max(0, w - 1))
        y = d.sym_row.decode(zp, 0, max(0, h - 1))
        blits.append((bm, x, y))
    raise ValueError("jb2: record count over the cap")


def decode_jb2_blits(data: bytes) -> list:
    """JB2 record stream → the blit list ``[(bitmap, x, y), ...]`` in
    record order (the per-blit unit FGbz foreground colors key on)."""
    return _decode_stream(data)[2]


def decode_jb2(data: bytes) -> np.ndarray:
    """JB2 record stream → (H, W) uint8 {0,1} bitmap (the page
    mask).  Raises ``ValueError`` outside the documented subset."""
    w, h, blits = _decode_stream(data)
    page = np.zeros((h, w), np.uint8)
    for bm, x, y in blits:
        sh, sw = bm.shape
        # clip placement to the page (mirrors the JBIG2 text-region
        # clipping the r15 advice asked for)
        ph = min(sh, h - y)
        pw = min(sw, w - x)
        if ph > 0 and pw > 0:
            page[y : y + ph, x : x + pw] |= bm[:ph, :pw]
    return page


def encode_jb2(w: int, h: int, marks: list) -> bytes:
    """Exact dual of :func:`decode_jb2`.  ``marks`` is a list of
    ``(bitmap, x, y)`` (a new symbol each), ``(index, x, y)`` with an
    int index (a matched copy of an earlier mark), or
    ``("refine", index, bitmap, x, y)`` (a refinement of mark
    ``index``, coded against it through the refinement context and
    added to the library)."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError("jb2: image size outside bounds")
    zp = ZPEncoder()
    d = _Dists()
    direct_ctx = [0] * 1024
    refine_ctx = [0] * 8192
    d.rec_type.encode(zp, REC_START, 0, 11)
    d.image_size.encode(zp, w, 0, MAX_DIM)
    d.image_size.encode(zp, h, 0, MAX_DIM)
    n_lib = 0
    lib_bitmaps: list = []
    for mark in marks:
        if len(mark) == 5 and mark[0] == "refine":
            _tag, ridx, bmr, x, y = mark
            if not 0 <= ridx < n_lib:
                raise ValueError("jb2: refined index out of range")
            bmr = np.asarray(bmr, np.uint8)
            sh, sw = bmr.shape
            if sw * sh > MAX_SYMBOL_PIXELS:
                raise ValueError("jb2: symbol too large")
            d.rec_type.encode(zp, REC_REFINE, 0, 11)
            d.sym_index.encode(zp, int(ridx), 0, n_lib - 1)
            d.sym_size.encode(zp, sw, 1, MAX_DIM)
            d.sym_size.encode(zp, sh, 1, MAX_DIM)
            _encode_refined(zp, refine_ctx, bmr, lib_bitmaps[ridx])
            lib_bitmaps.append(bmr)
            n_lib += 1
            d.sym_col.encode(zp, int(x), 0, max(0, w - 1))
            d.sym_row.encode(zp, int(y), 0, max(0, h - 1))
            continue
        first, x, y = mark
        if isinstance(first, (int, np.integer)):
            if not 0 <= first < n_lib:
                raise ValueError("jb2: matched index out of range")
            d.rec_type.encode(zp, REC_MATCHED_COPY, 0, 11)
            d.sym_index.encode(zp, int(first), 0, n_lib - 1)
        else:
            bm = np.asarray(first, np.uint8)
            sh, sw = bm.shape
            if sw * sh > MAX_SYMBOL_PIXELS:
                raise ValueError("jb2: symbol too large")
            d.rec_type.encode(zp, REC_NEW_MARK, 0, 11)
            d.sym_size.encode(zp, sw, 1, MAX_DIM)
            d.sym_size.encode(zp, sh, 1, MAX_DIM)
            _encode_bitmap(zp, direct_ctx, bm)
            lib_bitmaps.append(bm)
            n_lib += 1
        d.sym_col.encode(zp, int(x), 0, max(0, w - 1))
        d.sym_row.encode(zp, int(y), 0, max(0, h - 1))
    d.rec_type.encode(zp, REC_END, 0, 11)
    return zp.flush()
