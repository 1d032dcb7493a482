"""Pure-numpy baseline TIFF codec (II/MM, strips, LZW/PackBits/Deflate).

TIFF is the last mainstream still-image container a crawl contains that
the repo's library-free decode tier did not cover (PPM/PGM/BMP/PNG/JPEG/
GIF already decode; see ``rawimage.sniff_format``).  Baseline TIFF 6.0
needs nothing beyond numpy and stdlib ``zlib``:

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- strip layout (``StripOffsets``/``StripByteCounts``/``RowsPerStrip``)
  AND tile layout (``TileWidth``/``TileLength``/``TileOffsets``/
  ``TileByteCounts``, zero-padded edge tiles per TIFF 6.0 §15);
- compressions 1 (none), 2/3/4 (CCITT fax: MH RLE, Group 3 incl. the
  mixed-2D layout, Group 4 — via :mod:`rawccitt`, JDK-cross-pinned),
  5 (LZW, MSB-first with the spec's early-change width switch), 7
  (new-style JPEG per TIFF Technical Note 2, including abbreviated
  streams against the shared ``JPEGTables`` tag — decoded by the
  repo's own ``rawjpeg`` tier), 8/32946 (Deflate via ``zlib``),
  32773 (PackBits);
- sub-byte packed rasters (1/2/4-bit gray or palette, FillOrder 1/2,
  tag-258-absent spec default);
- planar configuration 2 (one strip run per sample plane);
- predictor 2 (horizontal differencing — undone with a wrapping cumsum);
- photometric 0/1 (gray, optionally inverted), 2 (RGB, alpha dropped),
  3 (palette via ``ColorMap``), at 8 or 16 bits per sample (16-bit
  scales to 8 via the high byte, pillow's ``I;16``→``L`` convention).

Recognized-but-undecodable per-file features — planar tiles,
T.4/T.6 uncompressed mode, float samples — raise
:class:`~.rawavi.UnsupportedCodecError` so one exotic
file in a crawl lands in the per-row ``error`` column (queryable apart
from corruption) instead of killing the task; genuinely malformed bytes
raise ``ValueError`` as in every other codec here.

Reference behavioral parity: the reference treats payloads as opaque
named byte arrays (RawdataMessage.java:15-60); decode fidelity is this
repo's extension tier, tested in ``tests/test_tiff.py`` (round-trip
matrix, hand-built fixtures, hostile-byte fuzz, pillow parity where
pillow is installed).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .rawavi import UnsupportedCodecError

_LE = b"II*\x00"
_BE = b"MM\x00*"
# BigTIFF (version 43): 8-byte offsets — scanned-document archives and
# satellite rasters exceed the classic 4 GiB limit routinely, and a
# BigTIFF was previously wholly unreachable (ZIP64-class data loss)
_LE8 = b"II+\x00"
_BE8 = b"MM\x00+"

# IFD entry types → byte width (only the ones baseline TIFF uses;
# 7 = UNDEFINED raw bytes, carried by JPEGTables among others)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 16: 8, 17: 8, 18: 8}

#: hard per-image decode cap (1 GiB of pixels).  A row in a Spark
#: DataFrame cannot exceed 2 GiB anyway, so anything bigger is either a
#: lying IFD on hostile crawl bytes or data this tier should not try to
#: hold in one task — both get a clean ValueError, not an executor OOM.
_MAX_DECODED_BYTES = 1 << 30


def sniff_tiff(payload: bytes) -> bool:
    """True when the payload starts with a classic or BigTIFF header."""
    return payload[:4] in (_LE, _BE, _LE8, _BE8)


def _header(payload: bytes) -> tuple[str, bool, int]:
    """(byte order, is_bigtiff, first IFD offset) — version 42 uses a
    32-bit offset at byte 4; version 43 (BigTIFF) declares its offset
    width (must be 8) then a 64-bit offset at byte 8."""
    bo = "<" if payload[:2] == b"II" else ">"
    big = payload[:4] in (_LE8, _BE8)
    if big:
        if len(payload) < 16:
            raise ValueError("truncated BigTIFF: no IFD offset")
        osize, zero = struct.unpack_from(bo + "HH", payload, 4)
        if osize != 8 or zero != 0:
            raise ValueError(
                f"BigTIFF declares offset size {osize} (only 8 is defined)"
            )
        (ifd_off,) = struct.unpack_from(bo + "Q", payload, 8)
    else:
        if len(payload) < 8:
            raise ValueError("truncated TIFF: no IFD offset")
        (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    return bo, big, ifd_off


# ------------------------------------------------------------------ LZW


def _lzw_decode(data: bytes, limit: int | None = None) -> bytes:
    """TIFF-variant LZW: MSB-first packing, 9→12-bit codes, early change.

    Unlike the GIF variant (LSB-first, variable min code size —
    ``rawgif._lzw_decode``), TIFF fixes the alphabet at 8-bit bytes with
    Clear=256/EOI=257 and widens the code size one code EARLY (when the
    next free slot is ``2**width - 1``, TIFF 6.0 §13).

    ``limit`` bounds the output: decoding stops once ``limit`` bytes are
    produced, so a tiny hostile strip paired with a lying IFD cannot
    expand past what the caller will actually consume (decompression
    bomb guard; trailing legitimate padding is simply not materialized,
    matching the old tolerate-extra behavior without the allocation).
    """
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # stream ended without EOI: tolerate
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt TIFF LZW stream (bad first code)")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt TIFF LZW stream (code gap)")
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change: widen one slot before full
        out += entry
        if limit is not None and len(out) >= limit:
            return bytes(out[:limit])
        prev = entry


def _lzw_encode(data: bytes) -> bytes:
    """Compress with the exact stream :func:`_lzw_decode` (and libtiff)
    reads: MSB-first, Clear emitted first, early-change width switch,
    table reset at 4094."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # mirror of the decoder's width switch: the decoder's table runs
        # one entry behind this one, so its early change at (1<<w)-1
        # lands exactly when next_code here reaches 1<<w (exercised across
        # every width transition and the 4094 reset in test_tiff.py)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits


def _packbits_decode(data: bytes, limit: int | None = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if limit is not None and len(out) >= limit:
            return bytes(out[:limit])
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Simple spec-correct PackBits: repeat runs ≥3 become repeats,
    everything else literals (≤128 per run)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        start = i
        i += run
        while i < n and i - start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        lit = data[start : min(i, start + 128)]
        out += bytes([len(lit) - 1]) + lit
        i = start + len(lit)
    return bytes(out)


# ------------------------------------------------------------- IFD read


def _read_ifd(payload: bytes) -> dict[int, tuple[int, list[int]]]:
    """Parse the first IFD into {tag: (type, values)} (offsets resolved)."""
    bo, big, ifd_off = _header(payload)
    return _read_ifd_at(payload, bo, ifd_off, big)[0]


def _read_ifd_at(
    payload: bytes, bo: str, ifd_off: int, big: bool = False
) -> tuple[dict[int, tuple[int, list[int]]], int]:
    """(entries, next_ifd_offset) for the IFD at ``ifd_off`` — the
    multi-page chain walker's unit (scanned documents are routinely
    multi-page fax TIFFs).  ``big``: BigTIFF layout (64-bit entry
    counts/values/offsets, 20-byte entries)."""
    cnt_w, ent_w, val_w = (8, 20, 8) if big else (2, 12, 4)
    if ifd_off + cnt_w > len(payload):
        raise ValueError("truncated TIFF: IFD offset out of range")
    (count,) = struct.unpack_from(bo + ("Q" if big else "H"), payload, ifd_off)
    if count > 0xFFFF:
        raise ValueError(f"BigTIFF IFD declares {count} entries (hostile)")
    entries: dict[int, tuple[int, list[int]]] = {}
    for k in range(count):
        off = ifd_off + cnt_w + ent_w * k
        if off + ent_w > len(payload):
            raise ValueError("truncated TIFF: IFD entry out of range")
        if big:
            tag, typ = struct.unpack_from(bo + "HH", payload, off)
            (n,) = struct.unpack_from(bo + "Q", payload, off + 4)
        else:
            tag, typ, n = struct.unpack_from(bo + "HHI", payload, off)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * n
        if total <= val_w:
            voff = off + (12 if big else 8)
        else:
            (voff,) = struct.unpack_from(
                bo + ("Q" if big else "I"), payload, off + (12 if big else 8)
            )
        if voff + total > len(payload):
            raise ValueError(f"truncated TIFF: tag {tag} values out of range")
        if typ in (1, 2, 7):  # BYTE / ASCII / UNDEFINED: raw bytes
            vals = list(payload[voff : voff + n])
        elif typ == 3:
            vals = list(struct.unpack_from(bo + f"{n}H", payload, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{n}I", payload, voff))
        elif typ in (16, 18):  # LONG8 / IFD8
            vals = list(struct.unpack_from(bo + f"{n}Q", payload, voff))
        elif typ == 17:  # SLONG8
            vals = list(struct.unpack_from(bo + f"{n}q", payload, voff))
        else:  # RATIONAL: num/den as floats (EXIF GPS/exposure use them;
            # no raster tag does, so decode behavior is unchanged)
            raw = struct.unpack_from(bo + f"{2 * n}I", payload, voff)
            vals = [
                (raw[2 * i] / raw[2 * i + 1]) if raw[2 * i + 1] else 0.0
                for i in range(n)
            ]
        entries[tag] = (typ, vals)
    next_off_pos = ifd_off + cnt_w + ent_w * count
    if next_off_pos + (8 if big else 4) > len(payload):
        next_ifd = 0  # tolerate a truncated next-IFD pointer: last page
    else:
        (next_ifd,) = struct.unpack_from(
            bo + ("Q" if big else "I"), payload, next_off_pos
        )
    return entries, next_ifd


def _tag(entries, tag: int, default=None):
    got = entries.get(tag)
    return got[1] if got is not None else default


def _tag1(entries, tag: int, default: int) -> int:
    """First value of a scalar tag.  A hostile IFD can carry a valid
    entry with count 0 (bit-flip fuzz finds this) or declare an integer
    tag as RATIONAL (floats since the EXIF change) — both are malformed
    data → ValueError, never IndexError/TypeError downstream."""
    got = entries.get(tag)
    if got is None:
        return default
    if not got[1]:
        raise ValueError(f"malformed TIFF: tag {tag} has no values")
    v = got[1][0]
    if not isinstance(v, int):
        raise ValueError(
            f"malformed TIFF: tag {tag} declared rational where an "
            "integer is required"
        )
    return v


# --------------------------------------------------------------- decode


def _decompress_block(
    chunk: bytes, compression: int, need: int, label: str
) -> bytes:
    """One strip/tile through the compression dispatch, bounded to
    ``need`` output bytes (decompression-bomb guard) and length-checked."""
    if compression == 1:
        data = chunk
    elif compression == 5:
        data = _lzw_decode(chunk, limit=need)
    elif compression in (8, 32946):
        try:
            data = zlib.decompressobj().decompress(chunk, need)
        except zlib.error as exc:
            raise ValueError(f"corrupt TIFF deflate {label}: {exc}")
    else:  # 32773
        data = _packbits_decode(chunk, limit=need)
    if len(data) < need:
        raise ValueError(
            f"TIFF {label} decodes to {len(data)} bytes, need {need}"
        )
    return data


def _decode_jpeg_in_tiff(
    payload: bytes, e: dict, width: int, height: int
) -> np.ndarray:
    """New-style JPEG compression (7, TIFF Technical Note 2): each strip
    or tile is a self-contained JPEG interchange stream, optionally
    abbreviated against the shared ``JPEGTables`` tag (347) — a
    SOI/tables/EOI stream whose body is spliced after each strip's SOI.
    Decoding rides the repo's own JPEG tier (``rawjpeg`` — baseline and
    progressive), so no media library is involved here either."""
    from . import rawjpeg  # noqa: PLC0415 — avoid import cost on the 99%

    tables_body = b""
    jpt = _tag(e, 347)
    if jpt:
        jt = bytes(jpt)
        if len(jt) < 4 or jt[:2] != b"\xff\xd8" or jt[-2:] != b"\xff\xd9":
            raise ValueError("malformed JPEGTables (need SOI ... EOI)")
        tables_body = jt[2:-2]

    def decode_block(off: int, cnt: int, label: str) -> np.ndarray:
        if off + cnt > len(payload):
            raise ValueError(f"TIFF {label} extends past end of payload")
        data = payload[off : off + cnt]
        if data[:2] != b"\xff\xd8":
            raise ValueError(f"TIFF {label} is not a JPEG stream")
        return rawjpeg.decode_jpeg(b"\xff\xd8" + tables_body + data[2:])

    out = np.zeros((height, width, 3), np.uint8)
    if 322 in e or 323 in e:
        tw, th = _tag1(e, 322, 0), _tag1(e, 323, 0)
        if tw <= 0 or th <= 0:
            raise ValueError("tiled TIFF missing TileWidth/TileLength")
        offsets, counts = _tag(e, 324), _tag(e, 325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiled TIFF missing TileOffsets/TileByteCounts")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if len(offsets) < across * down:
            raise ValueError(
                f"tiled TIFF carries {len(offsets)} tiles, grid needs "
                f"{across * down}"
            )
        for t in range(across * down):
            block = decode_block(offsets[t], counts[t], f"tile {t}")
            y0 = (t // across) * th
            x0 = (t % across) * tw
            ys = min(th, height - y0, block.shape[0])
            xs = min(tw, width - x0, block.shape[1])
            out[y0 : y0 + ys, x0 : x0 + xs] = block[:ys, :xs]
    else:
        offsets, counts = _tag(e, 273), _tag(e, 279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing StripOffsets/StripByteCounts")
        rows_per_strip = _tag1(e, 278, height) or height
        rows_done = 0
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            strip_rows = min(rows_per_strip, height - rows_done)
            if strip_rows <= 0:
                break
            block = decode_block(off, cnt, f"strip {i}")
            ys = min(strip_rows, block.shape[0])
            xs = min(width, block.shape[1])
            out[rows_done : rows_done + ys, :xs] = block[:ys, :xs]
            rows_done += strip_rows
        if rows_done < height:
            raise ValueError(
                f"TIFF strips cover {rows_done} rows, ImageLength says "
                f"{height}"
            )
    return out


#: bit-reversal LUT for FillOrder 2 (LSB-first bytes)
_REVERSE_BITS = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], np.uint8
)


def _decode_ccitt_tiff(
    payload: bytes, e: dict, width: int, height: int, compression: int
) -> np.ndarray:
    """Compressions 2 (MH byte-aligned), 3 (T.4 G3, 1D or mixed 2D via
    T4Options bit 0) and 4 (T.6 G4) through :mod:`rawccitt`, honoring
    FillOrder and the per-strip row split."""
    from . import rawccitt  # noqa: PLC0415

    photometric = _tag1(e, 262, 0)
    fill = _tag1(e, 266, 1)
    t4opt = _tag1(e, 292, 0)
    t6opt = _tag1(e, 293, 0)
    if compression == 3 and t4opt & 2:
        raise UnsupportedCodecError("T.4 uncompressed mode is not supported")
    if compression == 4 and t6opt & 2:
        raise UnsupportedCodecError("T.6 uncompressed mode is not supported")
    offsets = _tag(e, 273)
    counts = _tag(e, 279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing StripOffsets/StripByteCounts")
    rows_per_strip = _tag1(e, 278, height) or height

    bits_img = np.zeros((height, width), np.uint8)
    rows_done = 0
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, height - rows_done)
        if strip_rows <= 0:
            break
        if off + cnt > len(payload):
            raise ValueError(f"TIFF strip {i} extends past end of payload")
        data = payload[off : off + cnt]
        if fill == 2:
            data = _REVERSE_BITS[np.frombuffer(data, np.uint8)].tobytes()
        if compression == 2:
            block = rawccitt.decode_mh(data, width, strip_rows)
        elif compression == 3:
            block = rawccitt.decode_g3(
                data, width, strip_rows, two_d=bool(t4opt & 1)
            )
        else:
            block = rawccitt.decode_g4(data, width, strip_rows)
        bits_img[rows_done : rows_done + strip_rows] = block
        rows_done += strip_rows
    if rows_done < height:
        raise ValueError(
            f"TIFF strips cover {rows_done} rows, ImageLength says {height}"
        )
    # CCITT codes white/black runs directly; the stored-bit convention
    # is photometric 0 (white-is-zero).  photometric 1 inverts the
    # rendering of the same stored bits.
    white = np.uint8(255 if photometric == 0 else 0)
    gray = np.where(bits_img == 1, np.uint8(255) - white, white)
    return np.repeat(gray[:, :, None], 3, axis=2)


def _decode_subbyte_tiff(
    payload: bytes, e: dict, width: int, height: int, compression: int,
    b: int,
) -> np.ndarray:
    """1/2/4-bit packed rasters (strip layout, rows padded to whole
    bytes, MSB-first within the byte modulo FillOrder) under the
    byte-stream compressions: bilevel scans, 4-bit grayscale, and small
    ColorMap palettes — the sub-8-bit shapes old document scans use."""
    photometric = _tag1(e, 262, 0)
    fill = _tag1(e, 266, 1)
    offsets = _tag(e, 273)
    counts = _tag(e, 279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing StripOffsets/StripByteCounts")
    rows_per_strip = _tag1(e, 278, height) or height
    row_bytes = (width * b + 7) // 8
    vals_img = np.zeros((height, width), np.uint8)
    rows_done = 0
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, height - rows_done)
        if strip_rows <= 0:
            break
        if off + cnt > len(payload):
            raise ValueError(f"TIFF strip {i} extends past end of payload")
        need = strip_rows * row_bytes
        data = _decompress_block(
            payload[off : off + cnt], compression, need, f"strip {i}"
        )
        packed = np.frombuffer(data, np.uint8, count=need)
        if fill == 2:
            packed = _REVERSE_BITS[packed]
        rows = np.unpackbits(packed.reshape(strip_rows, row_bytes), axis=1)
        # group b bits MSB-first into sample values
        vals = rows.reshape(strip_rows, -1, b) @ (
            1 << np.arange(b - 1, -1, -1)
        )
        vals_img[rows_done : rows_done + strip_rows] = vals[
            :, :width
        ].astype(np.uint8)
        rows_done += strip_rows
    if rows_done < height:
        raise ValueError(
            f"TIFF strips cover {rows_done} rows, ImageLength says {height}"
        )
    maxv = (1 << b) - 1
    if photometric == 3:
        cmap = _tag(e, 320)
        n = maxv + 1
        if not cmap or len(cmap) < 3 * n:
            raise ValueError(f"palette TIFF missing a {n}-entry ColorMap")
        lut = np.asarray(cmap[: 3 * n], np.uint16).reshape(3, n) >> 8
        return (
            np.stack(
                [lut[0][vals_img], lut[1][vals_img], lut[2][vals_img]], axis=2
            )
            .astype(np.uint8)
            .copy()
        )
    # gray ramp: scale to 8-bit; photometric 0 (white-is-zero) inverts
    scale = 255 // maxv
    gray = (vals_img * np.uint8(scale)).astype(np.uint8)
    if photometric == 0:
        gray = np.uint8(255) - gray
    return np.repeat(gray[:, :, None], 3, axis=2)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode baseline TIFF bytes to an (H, W, 3) uint8 RGB array.

    Strip or tile layout, 8- or 16-bit samples (16-bit scales to 8 by
    taking the high byte, pillow's ``I;16``→``L`` convention — matching
    the ``rawimage.decode_png`` 16-bit path)."""
    if not sniff_tiff(payload):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    return _decode_ifd(payload, bo, _read_ifd(payload))


def decode_tiff_pages(
    payload: bytes, max_pages: int = 1000
) -> list[np.ndarray]:
    """Decode every page of a multi-page TIFF (next-IFD chain walk,
    cycle-guarded) — scanned documents are routinely multi-page fax
    files, and page 0 alone silently drops the rest of the document."""
    if not sniff_tiff(payload):
        raise ValueError("not a TIFF payload")
    bo, big, ifd_off = _header(payload)
    pages: list[np.ndarray] = []
    seen: set[int] = set()
    while ifd_off and len(pages) < max_pages:
        if ifd_off in seen:
            raise ValueError("TIFF IFD chain loops")
        seen.add(ifd_off)
        entries, ifd_off = _read_ifd_at(payload, bo, ifd_off, big)
        pages.append(_decode_ifd(payload, bo, entries))
    if not pages:
        raise ValueError("TIFF carries no pages")
    return pages


def _decode_ifd(payload: bytes, bo: str, e: dict) -> np.ndarray:
    """Decode ONE IFD's raster (the shared body of ``decode_tiff`` and
    ``decode_tiff_pages``)."""
    planar = _tag1(e, 284, 1)
    if planar not in (1, 2):
        raise UnsupportedCodecError(
            f"TIFF planar configuration {planar} is not supported"
        )
    compression = _tag1(e, 259, 1)
    if planar == 2 and compression in (2, 3, 4, 7):
        raise UnsupportedCodecError(
            "planar configuration 2 is only supported for byte-stream "
            "compressions"
        )
    if compression not in (1, 2, 3, 4, 5, 7, 8, 32773, 32946):
        raise UnsupportedCodecError(
            f"TIFF compression {compression} is not supported"
        )

    width = _tag1(e, 256, 0)
    height = _tag1(e, 257, 0)
    if width <= 0 or height <= 0:
        raise ValueError("TIFF missing or zero ImageWidth/ImageLength")
    spp = _tag1(e, 277, 1)
    # TIFF 6.0 default BitsPerSample is 1 (bilevel); writers of bilevel
    # files (the JDK among them) legitimately omit tag 258 entirely
    bits = _tag(e, 258, [1] * spp)

    if compression in (2, 3, 4):  # CCITT fax family (bilevel)
        if spp != 1 or bits != [1]:
            raise UnsupportedCodecError(
                "CCITT TIFF must be 1-bit single-sample"
            )
        if height * width > _MAX_DECODED_BYTES:
            raise ValueError(
                f"TIFF dimensions {width}x{height} exceed the "
                f"{_MAX_DECODED_BYTES >> 20} MiB decode cap"
            )
        return _decode_ccitt_tiff(payload, e, width, height, compression)

    if spp == 1 and bits in ([1], [2], [4]):  # packed sub-byte samples
        if compression == 7:
            raise UnsupportedCodecError("JPEG-in-TIFF cannot be sub-8-bit")
        if height * width > _MAX_DECODED_BYTES:
            raise ValueError(
                f"TIFF dimensions {width}x{height} exceed the "
                f"{_MAX_DECODED_BYTES >> 20} MiB decode cap"
            )
        return _decode_subbyte_tiff(
            payload, e, width, height, compression, bits[0]
        )

    if len(bits) != spp or any(b != bits[0] for b in bits) or bits[0] not in (
        8,
        16,
    ):
        raise UnsupportedCodecError(
            f"TIFF bits-per-sample {bits} is not supported (uniform 8/16 only)"
        )
    sample_bytes = bits[0] // 8
    dtype = np.dtype(bo + "u2") if sample_bytes == 2 else np.dtype(np.uint8)
    photometric = _tag1(e, 262, 1)
    if photometric == 3 and sample_bytes != 1:
        raise UnsupportedCodecError("palette TIFF must be 8-bit")
    predictor = _tag1(e, 317, 1)
    if predictor not in (1, 2):
        raise UnsupportedCodecError(f"TIFF predictor {predictor} unsupported")

    row_bytes = width * spp * sample_bytes
    if height * row_bytes > _MAX_DECODED_BYTES:
        raise ValueError(
            f"TIFF dimensions {width}x{height}x{spp}@{bits[0]} exceed the "
            f"{_MAX_DECODED_BYTES >> 20} MiB decode cap"
        )

    if compression == 7:  # new-style JPEG-in-TIFF (TTN2)
        if sample_bytes != 1:
            raise UnsupportedCodecError("JPEG-in-TIFF must be 8-bit")
        if predictor != 1:
            raise ValueError("JPEG-in-TIFF cannot carry a predictor")
        return _decode_jpeg_in_tiff(payload, e, width, height)

    def undiff(block: np.ndarray) -> np.ndarray:
        # horizontal differencing is per row per sample; the inverse is
        # a wrapping cumsum along x (uintN arithmetic is mod 2^N)
        if predictor == 2:
            acc = np.cumsum(
                block.astype(dtype.newbyteorder("=")), axis=1,
                dtype=dtype.newbyteorder("="),
            )
            return acc
        return block.astype(dtype.newbyteorder("="))

    if planar == 2 and (322 in e or 323 in e):
        raise UnsupportedCodecError("planar tiled TIFF is not supported")
    if 322 in e or 323 in e:  # tiled layout (TIFF 6.0 §15)
        tw = _tag1(e, 322, 0)
        th = _tag1(e, 323, 0)
        if tw <= 0 or th <= 0:
            raise ValueError("tiled TIFF missing TileWidth/TileLength")
        offsets = _tag(e, 324)
        counts = _tag(e, 325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiled TIFF missing TileOffsets/TileByteCounts")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        if len(offsets) < across * down:
            raise ValueError(
                f"tiled TIFF carries {len(offsets)} tiles, grid needs "
                f"{across * down}"
            )
        tile_need = th * tw * spp * sample_bytes
        if tile_need > _MAX_DECODED_BYTES:
            raise ValueError("TIFF tile size exceeds the decode cap")
        img = np.zeros((height, width, spp), dtype.newbyteorder("="))
        for t in range(across * down):
            off, cnt = offsets[t], counts[t]
            if off + cnt > len(payload):
                raise ValueError(f"TIFF tile {t} extends past end of payload")
            data = _decompress_block(
                payload[off : off + cnt], compression, tile_need, f"tile {t}"
            )
            block = np.frombuffer(
                data, dtype, count=th * tw * spp
            ).reshape(th, tw, spp)
            block = undiff(block)
            y0 = (t // across) * th
            x0 = (t % across) * tw
            ys = min(th, height - y0)
            xs = min(tw, width - x0)
            img[y0 : y0 + ys, x0 : x0 + xs] = block[:ys, :xs]
    elif planar == 2:  # one full set of strips per sample plane
        offsets = _tag(e, 273)
        counts = _tag(e, 279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing StripOffsets/StripByteCounts")
        rows_per_strip = _tag1(e, 278, height) or height
        spl = (height + rows_per_strip - 1) // rows_per_strip
        if len(offsets) < spp * spl:
            raise ValueError(
                f"planar TIFF carries {len(offsets)} strips, "
                f"{spp} planes x {spl} strips needed"
            )
        planes = []
        for p in range(spp):
            raw = bytearray()
            rows_done = 0
            for j in range(spl):
                off, cnt = offsets[p * spl + j], counts[p * spl + j]
                if off + cnt > len(payload):
                    raise ValueError(
                        f"TIFF strip {p * spl + j} extends past end of payload"
                    )
                strip_rows = min(rows_per_strip, height - rows_done)
                need = strip_rows * width * sample_bytes
                data = _decompress_block(
                    payload[off : off + cnt], compression, need,
                    f"strip {p * spl + j}",
                )
                block = np.frombuffer(
                    data, dtype, count=strip_rows * width
                ).reshape(strip_rows, width, 1)
                raw += undiff(block).tobytes()
                rows_done += strip_rows
            planes.append(
                np.frombuffer(bytes(raw), dtype.newbyteorder("=")).reshape(
                    height, width
                )
            )
        img = np.stack(planes, axis=2)
    else:
        offsets = _tag(e, 273)
        counts = _tag(e, 279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing StripOffsets/StripByteCounts")
        rows_per_strip = _tag1(e, 278, height) or height

        raw = bytearray()
        rows_done = 0
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                raise ValueError(f"TIFF strip {i} extends past end of payload")
            strip_rows = min(rows_per_strip, height - rows_done)
            if strip_rows <= 0:
                break  # more strips than ImageLength needs: ignore the tail
            need = strip_rows * row_bytes
            data = _decompress_block(
                payload[off : off + cnt], compression, need, f"strip {i}"
            )
            block = np.frombuffer(
                data, dtype, count=strip_rows * width * spp
            ).reshape(strip_rows, width, spp)
            raw += undiff(block).tobytes()
            rows_done += strip_rows
        if rows_done < height:
            raise ValueError(
                f"TIFF strips cover {rows_done} rows, ImageLength says "
                f"{height}"
            )
        img = np.frombuffer(bytes(raw), dtype.newbyteorder("=")).reshape(
            height, width, spp
        )

    if sample_bytes == 2:
        img = (img >> 8).astype(np.uint8)  # high byte, as pillow I;16 -> L
    if photometric in (0, 1):
        gray = img[:, :, 0]
        if photometric == 0:  # WhiteIsZero
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2).copy()
    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples/pixel")
        return img[:, :, :3].copy()  # drop alpha/extra samples
    if photometric == 3:
        cmap = _tag(e, 320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing a 256-entry ColorMap")
        # ColorMap stores 16-bit R[256] G[256] B[256]; take the high byte
        lut = (np.asarray(cmap[: 3 * 256], np.uint16).reshape(3, 256) >> 8)
        idx = img[:, :, 0]
        return (
            np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
            .astype(np.uint8)
            .copy()
        )
    raise UnsupportedCodecError(
        f"TIFF photometric interpretation {photometric} is not supported"
    )


# --------------------------------------------------------------- encode


_COMP_IDS = {
    "none": 1,
    "ccitt_rle": 2,
    "g3": 3,
    "g4": 4,
    "lzw": 5,
    "jpeg": 7,
    "deflate": 8,
    "packbits": 32773,
}

_JPEG_TABLE_MARKERS = frozenset({0xDB, 0xC4, 0xDD})  # DQT / DHT / DRI


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """(tables_body, abbreviated_stream): pull every DQT/DHT/DRI segment
    out of a full JPEG interchange stream, for the JPEGTables tag."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    keep = bytearray(b"\xff\xd8")
    pos = 2
    n = len(stream)
    while pos + 4 <= n:
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows; keep the rest
            keep += stream[pos:]
            break
        length = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + length]
        if marker in _JPEG_TABLE_MARKERS:
            tables += seg
        else:
            keep += seg
        pos += 2 + length
    return bytes(tables), bytes(keep)


def encode_tiff_multipage(pages: list[np.ndarray], **kwargs) -> bytes:
    """Encode a multi-page TIFF by relocating single-page encodes onto
    one next-IFD chain (the multi-page fax document layout).

    Each page is produced by :func:`encode_tiff` with the same keyword
    options; appended pages have every absolute offset (IFD pointer,
    out-of-line values, strip/tile offsets) rebased, and each page's
    next-IFD pointer is patched to the following page.
    """
    if not pages:
        raise ValueError("need at least one page")
    bo = kwargs.get("byte_order", "<")
    blobs = [encode_tiff(p, **kwargs) for p in pages]
    out = bytearray(blobs[0])
    (prev_ifd,) = struct.unpack_from(bo + "I", out, 4)
    for blob in blobs[1:]:
        delta = len(out) - 8  # the appended page loses its 8-byte header
        (page_ifd,) = struct.unpack_from(bo + "I", blob, 4)
        body = bytearray(blob[8:])
        # rebase this page's IFD in place
        ifd_pos = page_ifd - 8  # position within `body`
        (count,) = struct.unpack_from(bo + "H", body, ifd_pos)
        for k in range(count):
            eoff = ifd_pos + 2 + 12 * k
            tag, typ, n = struct.unpack_from(bo + "HHI", body, eoff)
            total = _TYPE_SIZES[typ] * n
            orig_voff = None
            if total > 4:
                (orig_voff,) = struct.unpack_from(bo + "I", body, eoff + 8)
                struct.pack_into(bo + "I", body, eoff + 8, orig_voff + delta)
            if tag in (273, 324):  # Strip/TileOffsets VALUES are absolute
                if total <= 4:
                    (v,) = struct.unpack_from(bo + "I", body, eoff + 8)
                    struct.pack_into(bo + "I", body, eoff + 8, v + delta)
                else:
                    vpos = orig_voff - 8  # body-relative value block
                    for j in range(n):
                        (v,) = struct.unpack_from(
                            bo + "I", body, vpos + 4 * j
                        )
                        struct.pack_into(
                            bo + "I", body, vpos + 4 * j, v + delta
                        )
        # chain the previous page to this one
        struct.pack_into(
            bo + "I", out,
            _next_ifd_pointer_pos(out, bo, prev_ifd),
            page_ifd + delta,
        )
        out += body
        prev_ifd = page_ifd + delta
    return bytes(out)


def _next_ifd_pointer_pos(buf: bytes, bo: str, ifd_off: int) -> int:
    (count,) = struct.unpack_from(bo + "H", buf, ifd_off)
    return ifd_off + 2 + 12 * count


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    byte_order: str = "<",
    predictor: int = 1,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    jpeg_quality: int = 75,
    jpeg_tables: bool = True,
    planar: int = 1,
) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W) gray array as TIFF.

    Fixture-grade but spec-correct: strip layout (or tiles via
    ``tile=(tw, th)`` — edge tiles zero-padded to full size per TIFF
    6.0 §15), optional LZW/Deflate/PackBits/JPEG compression, optional
    predictor 2, either byte order, uint8 or uint16 samples —
    everything :func:`decode_tiff` (and libtiff/pillow) reads back.
    ``compression="jpeg"`` writes new-style (7) streams; with
    ``jpeg_tables`` the shared DQT/DHT move to the JPEGTables tag and
    each strip/tile is an abbreviated stream (the common libtiff
    layout), otherwise every block is a full interchange stream.
    """
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    comp_id = _COMP_IDS[compression]
    if predictor == 2 and comp_id not in (5, 8):
        # predictor 2 is an LZW/Deflate companion in practice; readers
        # (JDK ImageIO among them) skip the tag for PackBits/uncompressed
        raise ValueError("predictor 2 requires lzw or deflate compression")
    if tile is not None and rows_per_strip is not None:
        raise ValueError("tile and rows_per_strip are mutually exclusive")
    arr = np.asarray(arr)
    if comp_id in (2, 3, 4):  # CCITT: bilevel (H, W), 1 = black
        if arr.ndim != 2:
            raise ValueError("CCITT input must be a bilevel (H, W) array")
        if tile is not None:
            raise ValueError("CCITT layout is strip-only here")
        arr = (arr > 0).astype(np.uint8)
    if arr.dtype not in (np.uint8, np.uint16):
        raise ValueError("array must be uint8 or uint16")
    if comp_id == 7 and arr.dtype != np.uint8:
        raise ValueError("JPEG-in-TIFF requires uint8 samples")
    bits_val = 16 if arr.dtype == np.uint16 else 8
    sdtype = np.dtype(byte_order + "u2") if bits_val == 16 else np.uint8
    wdtype = np.int32 if bits_val == 16 else np.int16  # diff widening
    arr = np.ascontiguousarray(arr)
    gray = arr.ndim == 2
    if gray:
        h, w = arr.shape
        spp, photometric = 1, 1
        arr3 = arr[:, :, None]
    else:
        h, w, spp = arr.shape
        photometric = 2
        arr3 = arr
    if comp_id == 7:
        if gray:  # the JPEG tier is 3-component; lift gray to RGB
            arr3 = np.repeat(arr[:, :, None], 3, axis=2)
            spp, gray = 3, False
        photometric = 6  # YCbCr, the JPEG-in-TIFF convention (TTN2)
    if comp_id in (2, 3, 4):
        bits_val = 1
        photometric = 0  # white-is-zero, the fax convention

    def pack_block(block: np.ndarray) -> bytes:
        if comp_id in (2, 3, 4):
            from . import rawccitt  # noqa: PLC0415

            rows = block[:, :, 0]
            if comp_id == 2:
                return rawccitt.encode_mh(rows)
            if comp_id == 3:
                return rawccitt.encode_mh(rows, eol=True)
            return rawccitt.encode_g4(rows)
        if comp_id == 7:
            from . import rawjpeg  # noqa: PLC0415

            rgb = block if spp == 3 else np.repeat(block, 3, axis=2)
            return rawjpeg.encode_jpeg(rgb, quality=jpeg_quality)
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1].astype(wdtype),
                 np.diff(block.astype(wdtype), axis=1)],
                axis=1,
            ).astype(arr.dtype)
        data = block.astype(sdtype).tobytes()
        if comp_id == 5:
            return _lzw_encode(data)
        if comp_id == 8:
            return zlib.compress(data, 6)
        if comp_id == 32773:
            # PackBits runs must not cross row boundaries (TIFF 6.0 §9)
            rb = block.shape[1] * block.shape[2] * (bits_val // 8)
            return b"".join(
                _packbits_encode(data[i : i + rb])
                for i in range(0, len(data), rb)
            )
        return data

    if planar not in (1, 2):
        raise ValueError("planar must be 1 or 2")
    if planar == 2 and (comp_id in (2, 3, 4, 7) or tile is not None or gray):
        raise ValueError(
            "planar 2 needs a multi-sample array under a byte-stream "
            "compression in strip layout"
        )
    blocks: list[bytes] = []
    if planar == 2:  # one full run of strips per sample plane
        rps = h if rows_per_strip is None else rows_per_strip
        for p in range(spp):
            for y0 in range(0, h, rps):
                blocks.append(pack_block(arr3[y0 : y0 + rps, :, p : p + 1]))
    elif tile is not None:
        tw, th = tile
        for y0 in range(0, h, th):
            for x0 in range(0, w, tw):
                full = np.zeros((th, tw, spp), arr.dtype)
                sub = arr3[y0 : y0 + th, x0 : x0 + tw]
                full[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(pack_block(full))
    else:
        rps = h if rows_per_strip is None else rows_per_strip
        for y0 in range(0, h, rps):
            blocks.append(pack_block(arr3[y0 : y0 + rps]))

    jpt_blob = b""
    if comp_id == 7 and jpeg_tables:
        # shared DQT/DHT(/DRI) move to the JPEGTables tag; every block
        # becomes an abbreviated stream (tables spliced back on decode)
        split = [_split_jpeg_tables(b) for b in blocks]
        blocks = [abbr for _, abbr in split]
        jpt_blob = b"\xff\xd8" + split[0][0] + b"\xff\xd9"

    bo = byte_order
    data_area = b"".join(blocks)
    block_offsets: list[int] = []
    pos = 8
    for s in blocks:
        block_offsets.append(pos)
        pos += len(s)
    ifd_off = pos + (pos & 1)  # word-align the IFD

    # symbolic entries: (tag, type, values); packed exactly below
    entries: list[tuple[int, int, list[int]]] = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [bits_val] * spp),
        (259, 3, [comp_id]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
    ]
    if tile is not None:
        entries += [
            (322, 3, [tile[0]]),
            (323, 3, [tile[1]]),
            (324, 4, block_offsets),
            (325, 4, [len(s) for s in blocks]),
        ]
    else:
        entries += [
            (273, 4, block_offsets),
            (278, 4, [h if rows_per_strip is None else rows_per_strip]),
            (279, 4, [len(s) for s in blocks]),
        ]
    if predictor == 2:
        entries.append((317, 3, [2]))
    if planar == 2:
        entries.append((284, 3, [2]))
    if comp_id == 3:
        entries.append((292, 4, [0]))  # T4Options: 1D, no fill
    elif comp_id == 4:
        entries.append((293, 4, [0]))  # T6Options: no uncompressed mode
    if jpt_blob:
        entries.append((347, 7, list(jpt_blob)))
    entries.sort(key=lambda t: t[0])

    # exact layout: header | data | IFD (2 + 12n + 4) | out-of-line values
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    extra: list[bytes] = []
    packed_entries: list[bytes] = []
    for tag, typ, vals in entries:
        size = _TYPE_SIZES[typ] * len(vals)
        if typ == 7:
            blob = bytes(vals)
        else:
            fmt = "H" if typ == 3 else "I"
            blob = struct.pack(bo + f"{len(vals)}{fmt}", *vals)
        if size <= 4:
            value = blob.ljust(4, b"\x00")
        else:
            extra.append(blob)
            value = struct.pack(bo + "I", extra_off)
            extra_off += len(blob)
        packed_entries.append(
            struct.pack(bo + "HHI", tag, typ, len(vals)) + value
        )

    out = bytearray()
    out += (_LE if bo == "<" else _BE)
    out += struct.pack(bo + "I", ifd_off)
    out += data_area
    if len(out) & 1:
        out += b"\x00"
    assert len(out) == ifd_off
    out += struct.pack(bo + "H", len(packed_entries))
    out += b"".join(packed_entries)
    out += struct.pack(bo + "I", 0)  # next-IFD pointer: none
    for blob in extra:
        out += blob
    return bytes(out)
