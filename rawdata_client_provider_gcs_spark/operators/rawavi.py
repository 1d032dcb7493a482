"""Pure-numpy AVI codec: raw DIB, MS-RLE4/8, I420, YUY2, MJPG.

The video half of the multimodal tier's "real decode without media
libs" family (rawimage/rawjpeg/rawgif/rawaudio): AVI is a RIFF
container (same chunk grammar the WAV codec already parses,
``rawaudio._chunks``), and the BI_RGB frame payloads are device-
independent bitmaps — byte-identical row layout to the 24-bit BMP
raster the image codec already decodes (bottom-up, BGR, rows padded to
4 bytes).  So an uncompressed AVI decodes here with zero new
compression machinery; MS-RLE8/RLE4 (biCompression=1/2, the era's
dominant palettized codecs) add one short run-length grammar
(:func:`_rle8_decode`/:func:`_rle4_decode`) plus the strf RGBQUAD
table, and the uncompressed YUV layouts I420 (planar 4:2:0) and YUY2
(packed 4:2:2) are one BT.601 integer matrix away from RGB
(:func:`_yuv_to_rgb`); Motion JPEG rides the repo's own baseline JPEG
tier, with table-less frames completed from the T.81 Annex K typical
tables (``rawjpeg.ensure_huffman_tables``).  That leaves only genuinely transform-coded
video at the "video containers" boundary: a
recognized-but-undecodable codec (H.264, VP9, XVID, ...) raises
:class:`UnsupportedCodecError` from :func:`decode_avi` — recorded
PER-ROW by the multimodal kernels under its own class name (compressed
AVIs are ordinary crawl data; one must never kill the job), yet never
conflated with corruption — while the CONTAINER path — parse, frame
timing, frame extraction — is real and round-trippable.

Format notes (public AVI/RIFF spec, msdn AVIMAINHEADER et al.):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih'  — dwMicroSecPerFrame, ..., dwTotalFrames, ...,
                  dwWidth, dwHeight (56 bytes)
        LIST 'strl'
          'strh' — fccType 'vids', ..., dwScale, dwRate (fps =
                    rate/scale), ...
          'strf' — BITMAPINFOHEADER (biBitCount=24,
                    biCompression=0=BI_RGB)
      LIST 'movi'
        '00db' chunks — one uncompressed DIB frame each
      'idx1'  — optional index (written for players; ignored on read)

Reference behavior parity note: the reference transport treats media
as opaque ``bytes`` values in the message map
(AvroRawdataProducer.java:42-49); this codec exists for the derived
LLM-pipeline tier, not the transport.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedCodecError(NotImplementedError):
    """A RECOGNIZED compressed codec this build cannot decode.

    Distinct from both boundaries it sits between: unlike a plain
    ``NotImplementedError`` (a mime-level missing decoder — EVERY row
    of that mime would fail, so it stays loud and kills the job),
    a codec fourcc is a property of ONE file in the crawl — ordinary
    data, not cluster configuration — so the multimodal kernels record
    it per-row under its own class name, queryable separately from
    corruption (``ValueError``/``MediaDecodeError``) in the ``error``
    column.  Subclasses ``NotImplementedError`` so direct callers that
    treat "cannot decode this codec" as not-implemented keep working.
    """


#: video codec fourccs a crawl actually contains — RECOGNIZED but not
#: decodable without media libraries.  Exactly these raise
#: :class:`UnsupportedCodecError` (recorded per-row, distinctly
#: labeled); any OTHER nonzero biCompression is an unrecognizable
#: value, i.e. a malformed container (bit flips land here), and stays
#: ``ValueError`` so it reads as data corruption.
_KNOWN_COMPRESSED_FOURCCS = frozenset({
    b"H264", b"h264", b"X264", b"x264", b"avc1", b"AVC1",
    b"H265", b"hev1", b"hvc1", b"HEVC",
    b"XVID", b"xvid", b"DIVX", b"divx", b"DX50", b"FMP4",
    b"MP42", b"MP43", b"MPG4", b"mp4v",
    b"VP80", b"VP90", b"vp08", b"vp09", b"av01",
    b"WMV1", b"WMV2", b"WMV3", b"WVC1",
    b"IV50", b"cvid", b"MSVC", b"CRAM",
})

_BI_RGB = b"\x00\x00\x00\x00"
_BI_RLE8 = b"\x01\x00\x00\x00"  # MS-RLE declares itself through INTEGER
_BI_RLE4 = b"\x02\x00\x00\x00"  # biCompression values, not ASCII fourccs
_I420 = (b"I420", b"IYUV")  # planar YUV 4:2:0 (two fourcc spellings)
_YUY2 = (b"YUY2", b"YUNV", b"V422")  # packed YUV 4:2:2
_MJPG = (b"MJPG", b"mjpg", b"dmb1", b"AVRn")  # motion JPEG: frames are
# JPEG interchange streams, commonly table-less (Annex K assumed)


def sniff_avi(payload: bytes) -> bool:
    """True when the payload is a RIFF/AVI container."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _sub_chunks(payload: bytes, off: int, end: int):
    """Yield (chunk_id, data_offset, size) inside payload[off:end].

    Chunk sizes are hostile input: a size field claiming more data than
    the buffer holds must not walk the cursor past the payload (the
    classic RIFF trap — an inflated LIST size once made this loop spin
    over billions of phantom 8-byte headers).  The walk is clamped to
    the real buffer and each declared size is truncated to what is
    actually present."""
    end = min(end, len(payload))
    i = off
    while i + 8 <= end:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        yield cid, i + 8, min(size, end - i - 8)
        i += 8 + size + (size & 1)


#: hard per-frame decode cap (matches the TIFF tier's reasoning: a
#: Spark row tops out at 2 GiB, so bigger dims are a lying header)
_MAX_FRAME_BYTES = 1 << 30


def _dib_to_rgb(
    data: bytes, width: int, height: int, topdown: bool = False
) -> np.ndarray:
    """Decode one BI_RGB 24-bit DIB frame to (H, W, 3) RGB.  DIBs are
    bottom-up unless the strf declared a negative biHeight (top-down,
    written by some capture software — review r8)."""
    stride = (width * 3 + 3) & ~3
    need = stride * height
    if need > len(data):
        raise ValueError(
            f"DIB frame holds {len(data)} bytes, header needs {need}"
        )
    rows = np.frombuffer(data, np.uint8, count=need).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not topdown:
        bgr = bgr[::-1]  # bottom-up -> top-down
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def _rle8_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode one MS-RLE8 frame payload to a bottom-up (H, W) uint8
    index raster (MS-WMF §2.1.1.20 / BITMAPINFOHEADER docs).

    Stream grammar: ``(count>0, index)`` encoded runs; ``(0, 0)`` end of
    line; ``(0, 1)`` end of bitmap; ``(0, 2, dx, dy)`` delta (right and
    UP in raster terms — RLE rasters are bottom-up like every DIB);
    ``(0, n>=3)`` absolute run of n literal indices padded to a word
    boundary.  Skipped pixels stay index 0 per common player behavior.
    Out-of-raster writes are corruption → ValueError (never a numpy
    IndexError out of the Arrow kernel)."""
    out = np.zeros((height, width), np.uint8)
    x = y = 0  # y counts bottom-up rows, matching the DIB origin
    i = 0
    n = len(data)
    while i + 1 < n:
        count, val = data[i], data[i + 1]
        i += 2
        if count > 0:  # encoded run
            if y >= height or x + count > width:
                raise ValueError("RLE8 run writes outside the raster")
            out[y, x : x + count] = val
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 2 > n:
                raise ValueError("truncated RLE8 delta escape")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ValueError("RLE8 delta jumps outside the raster")
        else:  # absolute run of `val` literals, word-aligned
            run = val
            if i + run > n:
                raise ValueError("truncated RLE8 absolute run")
            if y >= height or x + run > width:
                raise ValueError("RLE8 absolute run writes outside the raster")
            out[y, x : x + run] = np.frombuffer(data, np.uint8, run, i)
            x += run
            i += run + (run & 1)
    raise ValueError("RLE8 stream ended without an end-of-bitmap escape")


def _rle4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode one MS-RLE4 frame payload to a bottom-up (H, W) uint8
    index raster.  Same escape grammar as RLE8 (:func:`_rle8_decode`)
    with nibble-packed indices: an encoded run alternates the byte's
    high/low nibbles; absolute runs pack two indices per byte, padded
    to a word boundary."""
    out = np.zeros((height, width), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        count, val = data[i], data[i + 1]
        i += 2
        if count > 0:  # encoded run, alternating hi/lo nibbles
            if y >= height or x + count > width:
                raise ValueError("RLE4 run writes outside the raster")
            pair = np.array([val >> 4, val & 0xF], np.uint8)
            out[y, x : x + count] = np.tile(pair, (count + 1) // 2)[:count]
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 2 > n:
                raise ValueError("truncated RLE4 delta escape")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ValueError("RLE4 delta jumps outside the raster")
        else:  # absolute run of `val` nibble indices, word-aligned
            run = val
            nbytes = (run + 1) // 2
            consumed = nbytes + (nbytes & 1)  # pad to 16-bit boundary
            if i + consumed > n:
                raise ValueError("truncated RLE4 absolute run")
            if y >= height or x + run > width:
                raise ValueError("RLE4 absolute run writes outside the raster")
            packed = np.frombuffer(data, np.uint8, nbytes, i)
            nib = np.empty(nbytes * 2, np.uint8)
            nib[0::2] = packed >> 4
            nib[1::2] = packed & 0xF
            out[y, x : x + run] = nib[:run]
            x += run
            i += consumed
    raise ValueError("RLE4 stream ended without an end-of-bitmap escape")


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range integer conversion (the AVI YUV convention):
    ``R = (298(Y-16) + 409(V-128) + 128) >> 8`` etc., clipped — exact
    deterministic integer math, same formula every decoder era used."""
    c = 298 * (y.astype(np.int32) - 16)
    d = u.astype(np.int32) - 128
    e = v.astype(np.int32) - 128
    r = (c + 409 * e + 128) >> 8
    g = (c - 100 * d - 208 * e + 128) >> 8
    b = (c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _i420_to_rgb(data: bytes, width: int, height: int) -> np.ndarray:
    """Planar YUV 4:2:0 (I420/IYUV): full Y plane then quarter U and V
    planes; chroma upsampled by pixel doubling.  Top-down raster (the
    YUV-in-AVI convention, unlike bottom-up DIBs)."""
    if width % 2 or height % 2:
        raise ValueError("I420 frame dimensions must be even")
    need = width * height * 3 // 2
    if len(data) < need:
        raise ValueError(f"I420 frame holds {len(data)} bytes, need {need}")
    ysize = width * height
    csize = ysize // 4
    y = np.frombuffer(data, np.uint8, ysize).reshape(height, width)
    u = np.frombuffer(data, np.uint8, csize, ysize).reshape(
        height // 2, width // 2
    )
    v = np.frombuffer(data, np.uint8, csize, ysize + csize).reshape(
        height // 2, width // 2
    )
    u2 = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
    v2 = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    return _yuv_to_rgb(y, u2, v2)


def _yuy2_to_rgb(data: bytes, width: int, height: int) -> np.ndarray:
    """Packed YUV 4:2:2 (YUY2): rows of ``Y0 U Y1 V`` macropixels;
    chroma doubled horizontally.  Top-down raster."""
    if width % 2:
        raise ValueError("YUY2 frame width must be even")
    need = width * height * 2
    if len(data) < need:
        raise ValueError(f"YUY2 frame holds {len(data)} bytes, need {need}")
    rows = np.frombuffer(data, np.uint8, need).reshape(height, width * 2)
    y = rows[:, 0::2]
    u = np.repeat(rows[:, 1::4], 2, axis=1)
    v = np.repeat(rows[:, 3::4], 2, axis=1)
    return _yuv_to_rgb(y, u, v)


def _read_strf_palette(payload: bytes, doff: int, size: int) -> np.ndarray:
    """(256, 3) uint8 RGB palette from the RGBQUADs that follow the
    BITMAPINFOHEADER inside a ``strf`` chunk (entries are B,G,R,pad;
    ``biClrUsed`` 0 means the full 2^biBitCount table)."""
    header = int.from_bytes(payload[doff : doff + 4], "little") or 40
    used = int.from_bytes(payload[doff + 32 : doff + 36], "little") or 256
    used = min(used, 256)
    table = np.frombuffer(
        payload, np.uint8, min(used * 4, max(0, size - header)) & ~3,
        doff + header,
    ).reshape(-1, 4)
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(table)] = table[:, 2::-1]  # BGRx -> RGB
    return pal


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an uncompressed AVI to ``(frames, fps)``.

    Each frame is an (H, W, 3) uint8 RGB array.  Only BI_RGB 24-bit
    video streams are supported.  The error split mirrors the
    documented multimodal boundary (``multimodal._catch_row``): a
    RECOGNIZED-but-compressed video codec (H.264, MJPG, ...) raises
    :class:`UnsupportedCodecError` — captured per-row under its own
    label, distinct from corruption — while genuinely malformed
    containers raise ``ValueError`` (the data-corruption row error).

    Each ``strf`` is attributed to the stream type declared by the
    preceding ``strh`` (``fccType``), so an AVI whose ``auds`` strl
    precedes the ``vids`` strl has its WAVEFORMATEX skipped rather than
    misparsed as a BITMAPINFOHEADER, and the vids stream's compression
    is always checked regardless of stream order.
    """
    if not sniff_avi(payload):
        raise ValueError("payload is not a RIFF/AVI container")
    width = height = None
    rate = scale = None
    usec_per_frame = None
    compression = None
    palette = None  # (256, 3) RGB for the RLE8 path
    cur_fcc = None  # fccType of the most recent strh, scoped per strl
    frames: list[np.ndarray] = []

    # iterative DFS via a stack of chunk generators: a hostile payload
    # of deeply nested LISTs must raise the documented ValueError, not
    # RecursionError (review r8); real AVIs nest 2-3 levels
    topdown = False
    stack = [_sub_chunks(payload, 12, len(payload))]
    while stack:
        if len(stack) > 64:
            raise ValueError("AVI LIST nesting too deep")
        try:
            cid, doff, size = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if cid == b"LIST":
            if payload[doff : doff + 4] == b"strl":
                cur_fcc = None  # a new stream list: forget the old strh
            stack.append(
                _sub_chunks(payload, doff + 4, doff + size)
            )  # skip the 4-byte list type
        elif cid == b"avih" and size >= 40:
            usec_per_frame = int.from_bytes(
                payload[doff : doff + 4], "little"
            )
            width = int.from_bytes(payload[doff + 32 : doff + 36], "little")
            height = int.from_bytes(
                payload[doff + 36 : doff + 40], "little"
            )
        elif cid == b"strh" and size >= 32:
            cur_fcc = payload[doff : doff + 4]
            if cur_fcc == b"vids":
                scale = int.from_bytes(
                    payload[doff + 20 : doff + 24], "little"
                )
                rate = int.from_bytes(
                    payload[doff + 24 : doff + 28], "little"
                )
        elif (
            cid == b"strf"
            and size >= 20
            and cur_fcc == b"vids"
            and compression is None
        ):
            bits = int.from_bytes(payload[doff + 14 : doff + 16], "little")
            # biHeight's SIGN is the raster-direction declaration:
            # negative means top-down (review r8)
            topdown = (
                int.from_bytes(
                    payload[doff + 8 : doff + 12], "little", signed=True
                )
                < 0
            )
            compression = payload[doff + 16 : doff + 20]
            if compression in _KNOWN_COMPRESSED_FOURCCS:
                raise UnsupportedCodecError(
                    "unsupported AVI video codec: fourcc="
                    f"{compression!r}; only uncompressed BI_RGB "
                    "24-bit and MS-RLE8 are decodable without media "
                    "libraries"
                )
            if compression == _BI_RLE8 and bits == 8:
                palette = _read_strf_palette(payload, doff, size)
            elif compression == _BI_RLE4 and bits == 4:
                palette = _read_strf_palette(payload, doff, size)
            elif compression in _I420 and bits == 12:
                pass  # planar YUV 4:2:0, no palette
            elif compression in _YUY2 and bits == 16:
                pass  # packed YUV 4:2:2
            elif compression in _MJPG:
                pass  # per-frame JPEG streams (any declared depth)
            elif compression != _BI_RGB or bits != 24:
                # an UNRECOGNIZED nonzero fourcc / wrong bit depth is
                # not a codec the crawl could contain — it's a
                # corrupt header, captured per-row downstream
                raise ValueError(
                    "malformed AVI video stream header: fourcc="
                    f"{compression!r} bits={bits}"
                )
        elif cid in (b"00db", b"00dc"):
            if width is None or height is None:
                raise ValueError("AVI frame chunk before headers")
            if width <= 0 or height <= 0 or (
                width * height * 3 > _MAX_FRAME_BYTES
            ):
                # hostile avih dims would otherwise overflow or OOM
                # the frame allocation (fuzz-found)
                raise ValueError(
                    f"implausible AVI dimensions {width}x{height}"
                )
            data = payload[doff : doff + size]
            if compression == _BI_RLE8:
                idx = _rle8_decode(data, width, height)
                frames.append(palette[idx][::-1].copy())  # bottom-up
            elif compression == _BI_RLE4:
                idx = _rle4_decode(data, width, height)
                frames.append(palette[idx][::-1].copy())  # bottom-up
            elif compression in _I420:
                frames.append(_i420_to_rgb(data, width, height))
            elif compression in _YUY2:
                frames.append(_yuy2_to_rgb(data, width, height))
            elif compression in _MJPG:
                from . import rawjpeg  # noqa: PLC0415

                frames.append(
                    rawjpeg.decode_jpeg(
                        rawjpeg.ensure_huffman_tables(data)
                    )
                )
            else:
                frames.append(_dib_to_rgb(data, width, height, topdown))

    if not frames:
        raise ValueError("AVI payload carries no video frames")
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    else:
        raise ValueError("AVI payload carries no frame timing")
    return frames, fps


def _rle8_encode(idx_bottom_up: np.ndarray) -> bytes:
    """Encode one bottom-up (H, W) uint8 index raster as MS-RLE8 using
    encoded runs only (always legal; absolute mode is an optimization)."""
    out = bytearray()
    for row in idx_bottom_up:
        j = 0
        w = len(row)
        while j < w:
            run = 1
            while j + run < w and run < 255 and row[j + run] == row[j]:
                run += 1
            out += bytes((run, int(row[j])))
            j += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode_avi_rle8(
    index_frames: list[np.ndarray],
    palette: np.ndarray,
    fps: float = 10.0,
) -> bytes:
    """Encode top-down (H, W) uint8 palette-index frames as an MS-RLE8
    AVI (biCompression=BI_RLE8, biBitCount=8, RGBQUAD table in strf) —
    the fixture-grade mirror of the :func:`decode_avi` RLE8 path."""
    if not index_frames:
        raise ValueError("need at least one frame")
    h, w = index_frames[0].shape
    for f in index_frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be equal-shape (H, W) uint8")
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(palette)] = np.asarray(palette, np.uint8)[:256]
    rgbquads = np.zeros((256, 4), np.uint8)
    rgbquads[:, 2::-1] = pal  # RGB -> BGRx
    strf_tail = rgbquads.tobytes()
    payloads = [_rle8_encode(f[::-1]) for f in index_frames]
    return _assemble_avi(
        payloads,
        w,
        h,
        fps,
        bits=8,
        compression=_BI_RLE8,
        strf_tail=strf_tail,
        frame_cid=b"00dc",
    )


def _rle4_encode(idx_bottom_up: np.ndarray) -> bytes:
    """Encode one bottom-up (H, W) raster of 4-bit indices as MS-RLE4
    (encoded runs only; a constant run repeats its nibble in both
    halves of the value byte)."""
    out = bytearray()
    for row in idx_bottom_up:
        j = 0
        w = len(row)
        while j < w:
            run = 1
            while j + run < w and run < 255 and row[j + run] == row[j]:
                run += 1
            v = int(row[j])
            out += bytes((run, (v << 4) | v))
            j += run
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def encode_avi_rle4(
    index_frames: list[np.ndarray],
    palette: np.ndarray,
    fps: float = 10.0,
) -> bytes:
    """MS-RLE4 AVI from top-down (H, W) uint8 index frames (< 16)."""
    if not index_frames:
        raise ValueError("need at least one frame")
    h, w = index_frames[0].shape
    for f in index_frames:
        if f.shape != (h, w) or f.dtype != np.uint8 or f.max() > 15:
            raise ValueError("frames must be equal-shape uint8 indices < 16")
    pal = np.zeros((16, 3), np.uint8)
    pal[: len(palette)] = np.asarray(palette, np.uint8)[:16]
    rgbquads = np.zeros((16, 4), np.uint8)
    rgbquads[:, 2::-1] = pal
    return _assemble_avi(
        [_rle4_encode(f[::-1]) for f in index_frames],
        w, h, fps,
        bits=4, compression=_BI_RLE4,
        strf_tail=rgbquads.tobytes(), frame_cid=b"00dc",
    )


def encode_avi_i420(
    planes: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    fps: float = 10.0,
) -> bytes:
    """I420 AVI from per-frame (Y, U, V) planes (top-down; U/V are
    half-resolution in both axes)."""
    if not planes:
        raise ValueError("need at least one frame")
    h, w = planes[0][0].shape
    payloads = []
    for y, u, v in planes:
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != (
            h // 2,
            w // 2,
        ):
            raise ValueError("inconsistent I420 plane shapes")
        payloads.append(
            np.ascontiguousarray(y, np.uint8).tobytes()
            + np.ascontiguousarray(u, np.uint8).tobytes()
            + np.ascontiguousarray(v, np.uint8).tobytes()
        )
    return _assemble_avi(
        payloads, w, h, fps,
        bits=12, compression=b"I420", strf_tail=b"", frame_cid=b"00dc",
    )


def encode_avi_mjpg(
    frames: list[np.ndarray],
    fps: float = 10.0,
    quality: int = 75,
    tableless: bool = True,
) -> bytes:
    """Motion-JPEG AVI from (H, W, 3) uint8 RGB frames: each frame is
    an Annex-K-coded baseline JPEG; with ``tableless`` (the common
    OpenDML layout) the DHT segments are stripped and decoders assume
    the Annex K typical tables (:func:`rawjpeg.ensure_huffman_tables`
    splices them back)."""
    from . import rawjpeg  # noqa: PLC0415

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = []
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be equal-shape (H, W, 3) uint8")
        stream = rawjpeg.encode_jpeg(f, quality=quality, huffman="annex_k")
        if tableless:
            stream = rawjpeg.strip_huffman_tables(stream)
        payloads.append(stream)
    return _assemble_avi(
        payloads, w, h, fps,
        bits=24, compression=b"MJPG", strf_tail=b"", frame_cid=b"00dc",
    )


def encode_avi_yuy2(
    planes: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    fps: float = 10.0,
) -> bytes:
    """YUY2 AVI from per-frame (Y, U, V) planes (U/V half-width)."""
    if not planes:
        raise ValueError("need at least one frame")
    h, w = planes[0][0].shape
    payloads = []
    for y, u, v in planes:
        if y.shape != (h, w) or u.shape != (h, w // 2) or v.shape != (
            h,
            w // 2,
        ):
            raise ValueError("inconsistent YUY2 plane shapes")
        rows = np.empty((h, w * 2), np.uint8)
        rows[:, 0::2] = y
        rows[:, 1::4] = u
        rows[:, 3::4] = v
        payloads.append(rows.tobytes())
    return _assemble_avi(
        payloads, w, h, fps,
        bits=16, compression=b"YUY2", strf_tail=b"", frame_cid=b"00dc",
    )


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames as an uncompressed BI_RGB AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be equal-shape (H, W, 3) uint8")
    stride = (w * 3 + 3) & ~3

    def dib(arr: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    return _assemble_avi(
        [dib(f) for f in frames],
        w,
        h,
        fps,
        bits=24,
        compression=_BI_RGB,
        strf_tail=b"",
        frame_cid=b"00db",
    )


def _assemble_avi(
    payloads: list[bytes],
    w: int,
    h: int,
    fps: float,
    bits: int,
    compression: bytes,
    strf_tail: bytes,
    frame_cid: bytes,
) -> bytes:
    """Wrap per-frame payload bytes in the RIFF/AVI container grammar
    (hdrl with avih/strh/strf, movi, idx1) shared by the BI_RGB and
    MS-RLE8 encoders."""

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    frame_bytes = max(len(p) for p in payloads)
    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack(
        "<14I",
        int(1_000_000 * scale / rate),  # dwMicroSecPerFrame
        frame_bytes * int(round(fps)),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(payloads),
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,
        w,
        h,
        0,
        0,
        0,
        0,
    )
    strh = (
        b"vids"
        + b"\x00" * 4  # fccHandler: unset for raw DIB / MS-RLE
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # flags
            0,  # priority
            0,  # language
            0,  # initial frames
            scale,
            rate,
            0,  # start
            len(payloads),
            frame_bytes,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,  # sample size
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = (
        struct.pack(
            "<IiiHH4sIiiII",
            40,
            w,
            h,
            1,
            bits,
            compression,
            frame_bytes,
            0,
            0,
            (len(strf_tail) // 4) if strf_tail else 0,  # biClrUsed
            0,
        )
        + strf_tail
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = [chunk(frame_cid, p) for p in payloads]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: (ckid, flags=KEYFRAME, offset from 'movi' type tag, size)
    idx_entries = []
    off = 4
    for p in payloads:
        idx_entries.append(
            frame_cid + struct.pack("<III", 0x10, off, len(p))
        )
        off += 8 + len(p) + (len(p) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_avi_frames(
    payload: bytes, every_ms: int, max_frames: int
) -> list[tuple[int, int, np.ndarray]]:
    """(frame_idx, frame_ms, rgb_array) on the ``every_ms`` grid from
    the container's native frame times — the same sampling contract as
    the GIF path in ``multimodal.sample_frames``."""
    frames, fps = decode_avi(payload)
    out: list[tuple[int, int, np.ndarray]] = []
    next_ms = 0.0
    for i, arr in enumerate(frames):
        if len(out) >= max_frames:
            break
        t = i * 1000.0 / fps
        if t >= next_ms:
            out.append((i, int(t), arr))
            next_ms = t + every_ms
    return out
