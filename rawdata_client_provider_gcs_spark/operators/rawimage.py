"""Pure-numpy codecs for uncompressed image formats (PPM/PGM/BMP).

Media containers in this environment ship no pillow/libjpeg, but the
uncompressed interchange formats need nothing beyond numpy: netpbm P6
(PPM, binary RGB), P5 (PGM, binary gray), and 24-bit uncompressed BMP
are plain headers over raw pixels.  Decoding them here makes the
multimodal decode/resize kernels *real* — not stubbed — for any payload
in these formats, in every environment; pillow remains the first-choice
path for compressed formats when importable.

All functions are batch-friendly (called from ``mapInPandas`` kernels)
and deterministic.
"""

from __future__ import annotations

import numpy as np


def sniff_format(payload: bytes) -> str | None:
    """Return "ppm" | "pgm" | "bmp" when the payload is decodable here."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM" and len(payload) >= 30:
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp == 24 and compression == 0:
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
        data_off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return (rgb[::-1] if flip else rgb).copy()
    raise ValueError("payload is not a decodable PPM/PGM/BMP image")


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
