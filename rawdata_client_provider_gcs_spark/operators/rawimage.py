"""Pure-numpy/stdlib codecs for common image formats (PPM/PGM/BMP/PNG/JPEG).

Media containers in this environment ship no pillow/libjpeg, but these
formats need nothing beyond numpy and stdlib ``zlib``: netpbm P6 (PPM,
binary RGB), P5 (PGM, binary gray), 24-bit uncompressed BMP, 8-bit PNG
(IDAT inflate + per-scanline unfilter — the dominant lossless format),
and baseline-sequential JPEG (the dominant lossy format; Huffman +
IDCT in :mod:`.rawjpeg`).  Decoding them here makes the multimodal
decode/resize kernels *real* — not stubbed — in every environment;
pillow remains a first-choice fast path when importable.

All functions are batch-friendly (called from ``mapInPandas`` kernels)
and deterministic.
"""

from __future__ import annotations

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Return "ppm"|"pgm"|"bmp"|"png"|"jpeg"|"gif"|"tiff"|"ico"|
    "webp"|"jp2" when decodable here."""
    from . import rawico  # noqa: PLC0415 — one sniff, no duplicate magic

    if rawico.sniff_ico(payload):
        return "ico"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n" or \
            payload[:2] == b"\xff\x4f":
        return "jp2"
    if payload[:2] == b"BM" and len(payload) >= 34:
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if (bpp, compression) in (
            (24, 0), (32, 0), (8, 0), (4, 0), (1, 0),  # uncompressed
            (8, 1), (4, 2),  # BI_RLE8 / BI_RLE4
        ):
            return "bmp"
    return None


def _parse_netpbm_header(payload: bytes, magic: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, data_offset) for a binary netpbm header.

    Tolerates arbitrary whitespace and ``#`` comments, per the spec.
    """
    if payload[:2] != magic:
        raise ValueError(f"not a {magic!r} netpbm payload")
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < n and not payload[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated netpbm header")
        fields.append(int(payload[start:i]))
    # exactly one whitespace byte separates maxval from raster data
    i += 1
    width, height, maxval = fields
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported netpbm maxval: {maxval}")
    return width, height, maxval, i


def expand_dib_indices(rows: np.ndarray, bpp: int, w: int) -> np.ndarray:
    """(H, stride) packed DIB rows → (H, w) palette indices for the
    1/4/8-bit depths — shared by the standalone-BMP and ICO decoders."""
    if bpp == 8:
        return rows[:, :w]
    if bpp == 4:
        h, stride = rows.shape
        expanded = np.empty((h, stride * 2), np.uint8)
        expanded[:, 0::2] = rows >> 4
        expanded[:, 1::2] = rows & 0x0F
        return expanded[:, :w]
    if bpp == 1:
        return np.unpackbits(rows, axis=1)[:, :w]
    raise ValueError(f"dib: unsupported palettized depth {bpp}")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode PPM/PGM/BMP bytes to an (H, W, 3) uint8 RGB array."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        w, h, _, off = _parse_netpbm_header(payload, b"P6")
        arr = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off)
        return arr.reshape(h, w, 3).copy()
    if fmt == "pgm":
        w, h, _, off = _parse_netpbm_header(payload, b"P5")
        gray = np.frombuffer(payload, np.uint8, count=w * h, offset=off)
        return np.repeat(gray.reshape(h, w, 1), 3, axis=2)
    if fmt == "bmp":
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        if w < 1 or h < 1 or w * h > (1 << 26):
            raise ValueError(f"bmp: dimensions {w}x{h} out of bounds")
        if bpp == 24 and compression == 0:
            stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
            if data_off + stride * h > len(payload):
                raise ValueError("bmp: pixel data overruns payload")
            rows = np.frombuffer(
                payload, np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            rgb = bgr[:, :, ::-1]
            return (rgb[::-1] if flip else rgb).copy()
        if bpp == 32 and compression == 0:
            stride = w * 4
            if data_off + stride * h > len(payload):
                raise ValueError("bmp: pixel data overruns payload")
            rows = np.frombuffer(
                payload, np.uint8, count=stride * h, offset=data_off
            ).reshape(h, w, 4)
            rgb = rows[:, :, :3][:, :, ::-1]
            return (rgb[::-1] if flip else rgb).copy()
        # palettized (1/4/8-bit) via the shared DIB index expansion
        # (also used by the ICO tier); MS-RLE via the AVI RLE kernels
        hdr_size = int.from_bytes(payload[14:18], "little")
        n_colors = int.from_bytes(payload[46:50], "little") or (1 << bpp)
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("bmp: palette overruns payload")
        pal = np.frombuffer(
            payload, np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(-1, 4)[:, :3][:, ::-1]
        if compression in (1, 2):  # BI_RLE8 / BI_RLE4
            from . import rawavi  # noqa: PLC0415

            if not flip:
                # top-down DIBs cannot be RLE-compressed per spec; the
                # RLE kernels produce bottom-up rasters, so accepting
                # this would return a silently upside-down image
                raise ValueError("bmp: negative height is invalid with RLE")
            data = payload[data_off:]
            idx = (
                rawavi._rle8_decode(data, w, h)
                if compression == 1
                else rawavi._rle4_decode(data, w, h)
            )
            # RLE rasters are bottom-up index grids
            if idx.max(initial=0) >= len(pal):
                raise ValueError("bmp: RLE palette index out of range")
            rgb = pal[idx]
            return (rgb[::-1] if flip else rgb).copy()
        row_bits = w * bpp
        stride = ((row_bits + 31) // 32) * 4
        if data_off + stride * h > len(payload):
            raise ValueError("bmp: pixel data overruns payload")
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        idx = expand_dib_indices(rows, bpp, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("bmp: palette index out of range")
        rgb = pal[idx]
        return (rgb[::-1] if flip else rgb).copy()
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jp2":
        from . import rawjpx  # noqa: PLC0415

        arr = rawjpx.decode_jpx(payload)
        if arr.ndim == 2:
            return np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    if fmt == "jpeg":
        from . import rawjpeg  # noqa: PLC0415 — keep numpy-DCT import lazy

        return rawjpeg.decode_jpeg(payload)
    if fmt == "gif":
        from . import rawgif  # noqa: PLC0415

        return rawgif.decode_gif_first_frame(payload)
    if fmt == "tiff":
        from . import rawtiff  # noqa: PLC0415

        return rawtiff.decode_tiff(payload)
    if fmt == "ico":
        from . import rawico  # noqa: PLC0415

        return rawico.decode_ico_best(payload)
    if fmt == "webp":
        from . import rawwebp  # noqa: PLC0415

        return rawwebp.decode_webp(payload)
    raise ValueError(
        "payload is not a decodable PPM/PGM/BMP/PNG/JPEG/GIF/TIFF/ICO/WEBP image"
    )


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass, in
#: transmission order (PNG spec §8.2) — the same de-interlace-by-
#: scatter shape the GIF decoder uses for its 4-pass row interlacing
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter_block(
    raw: bytes, off: int, rows: int, width_px: int, fch: int
) -> tuple[np.ndarray, int]:
    """Unfilter ``rows`` scanlines of ``width_px`` pixels with ``fch``
    filter bytes per pixel starting at ``raw[off]``.

    PNG filters operate on BYTES with the left neighbor ``bpp`` bytes
    back, so a 16-bit sample unfilters exactly like two extra channels
    — ``fch = channels * bytes_per_sample`` is the only generalization
    needed.  Returns ``((rows, width_px*fch) uint8, next_offset)``.
    None/Up are pure array ops, Sub is a prefix sum (mod 256 distributes
    over the cumsum), and Average/Paeth — whose left-neighbor dependency
    is inherently sequential — loop over PIXELS with the channels
    vectorized, not over bytes (a per-byte Python loop costs seconds
    per megapixel).
    """
    stride = width_px * fch
    if len(raw) - off < rows * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = np.empty((rows, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(rows):
        row_off = off + y * (stride + 1)
        ftype = raw[row_off]
        cur = np.frombuffer(
            raw, np.uint8, count=stride, offset=row_off + 1
        ).astype(np.int32)
        if ftype == 0:
            row = cur
        elif ftype == 1:  # Sub
            row = (
                np.cumsum(cur.reshape(width_px, fch), axis=0, dtype=np.int64)
                & 0xFF
            ).reshape(stride).astype(np.int32)
        elif ftype == 2:  # Up
            row = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            px = cur.reshape(width_px, fch)
            up = prev.reshape(width_px, fch)
            rp = np.empty_like(px)
            left = np.zeros(fch, np.int32)
            for x in range(width_px):
                rp[x] = (px[x] + ((left + up[x]) >> 1)) & 0xFF
                left = rp[x]
            row = rp.reshape(stride)
        elif ftype == 4:  # Paeth
            px = cur.reshape(width_px, fch)
            up = prev.reshape(width_px, fch)
            rp = np.empty_like(px)
            left = np.zeros(fch, np.int32)
            upleft = np.zeros(fch, np.int32)
            for x in range(width_px):
                p = left + up[x] - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up[x])
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up[x], upleft),
                )
                rp[x] = (px[x] + pred) & 0xFF
                left = rp[x]
                upleft = up[x]
            row = rp.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type: {ftype}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out, off + rows * (stride + 1)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8/16-bit, sequential or Adam7-interlaced PNG to an
    (H, W, 3) uint8 RGB array.

    Stdlib-only: chunk walk, ``zlib`` IDAT inflate, per-scanline
    unfilter (None/Sub/Up/Average/Paeth), then color-type normalization
    — grayscale and gray+alpha expand to RGB, palette indices map
    through PLTE, RGBA drops alpha (matching what pillow's ``convert``
    does for the luma path).  Adam7 passes unfilter independently and
    scatter into place (``out[y0::dy, x0::dx]``); 16-bit samples
    (big-endian per spec) reduce to their high byte, pillow's
    ``I;16``→``L`` convention.  Sub-8-bit depths raise — they are rare
    for the thumbnails/fixtures this engine decodes, and a loud error
    beats a silent misdecode.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat: list[bytes] = []
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # data + length + type + CRC
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth not in (8, 16) or comp != 0 or filt != 0 or interlace > 1:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} interlace={interlace}"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type: {color}")
    if color == 3 and depth == 16:
        raise ValueError("PNG palette color type cannot be 16-bit")
    bps = depth // 8  # bytes per sample
    fch = channels * bps  # filter bytes per pixel
    raw = zlib.decompress(b"".join(idat))
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    if interlace == 0:
        out, _ = _unfilter_block(raw, 0, h, w, fch)
        bytes_arr = out.reshape(h, w, fch)
    else:  # Adam7: each pass is an independently-filtered sub-image
        bytes_arr = np.zeros((h, w, fch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            block, off = _unfilter_block(raw, off, ph, pw, fch)
            bytes_arr[y0::dy, x0::dx, :] = block.reshape(ph, pw, fch)
    if depth == 16:
        # big-endian sample pairs -> high byte (pillow I;16 -> L)
        arr = bytes_arr.reshape(h, w, channels, 2)[:, :, :, 0]
    else:
        arr = bytes_arr
    if color == 0:  # grayscale
        return np.repeat(arr, 3, axis=2)
    if color == 2:  # RGB
        return arr.copy()
    if color == 3:  # palette
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[arr[:, :, 0]]
    if color == 4:  # gray + alpha
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return arr[:, :, :3].copy()  # RGBA


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode an (H, W, 3) uint8 array as an 8-bit RGB PNG (filter 0).

    ``level=0`` emits zlib *stored* blocks, whose byte count is a closed
    form of the dimensions — ``68 + (3·W + 1)·H`` for raster < 64 KiB —
    which the oracle-checked image queries rely on (a compressed size
    would depend on the zlib build).  Higher levels are for real use.
    """
    import struct
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected an (H, W, 3) uint8 array")
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )  # filter 0 per scanline
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster, level))
        + chunk(b"IEND", b"")
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected an (H, W, 3) uint8 array")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — pure indexing."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]
