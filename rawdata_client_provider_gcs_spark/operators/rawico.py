"""ICO/CUR icon containers — the favicon format every crawl collects.

An ICO file is a directory of images; each entry is either a PNG file
(modern, usually the 256px slot) or a headerless BMP ("DIB") whose
``BITMAPINFOHEADER`` declares DOUBLE the real height because the pixel
data is followed by a 1-bit AND transparency mask.  This module
decodes both entry kinds into RGB arrays (32/24-bit truecolor and
8/4/1-bit palettized DIBs; the AND mask is parsed for bounds but not
composited — the engine's image tier is RGB), exposes the largest
entry as *the* image for the generic decode path, and writes
deterministic fixtures for the oracle-checked query.

Same loud-boundary discipline as the other codecs: malformed input
raises a data-dependent exception (``ValueError`` from this module;
``zlib.error`` may surface from a corrupt PNG entry, exactly like the
direct PNG path) that ``multimodal._catch_row`` records per row.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); icon
decoding belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import numpy as np

from . import rawimage

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: hard cap on one icon's pixel count (256×256 is the format maximum,
#: but hostile directories can lie — same guard idea as rawtiff)
_MAX_PIXELS = 1 << 22


def sniff_ico(payload: bytes) -> bool:
    """True for ICO (type 1) and CUR (type 2) directories."""
    return (
        len(payload) >= 6
        and payload[0:2] == b"\x00\x00"
        and payload[2:4] in (b"\x01\x00", b"\x02\x00")
        and int.from_bytes(payload[4:6], "little") > 0
    )


def _decode_dib(entry: bytes) -> np.ndarray:
    """Headerless BMP entry → (H, W, 3) RGB. Height is stored doubled
    (XOR pixels + AND mask)."""
    if len(entry) < 40:
        raise ValueError("ico: DIB entry shorter than BITMAPINFOHEADER")
    hdr_size = int.from_bytes(entry[0:4], "little")
    if hdr_size < 40:
        raise ValueError(f"ico: unsupported DIB header size {hdr_size}")
    w = int.from_bytes(entry[4:8], "little", signed=True)
    h2 = int.from_bytes(entry[8:12], "little", signed=True)
    bpp = int.from_bytes(entry[14:16], "little")
    compression = int.from_bytes(entry[16:20], "little")
    if compression != 0:
        raise ValueError(f"ico: compressed DIB entries unsupported ({compression})")
    h = abs(h2) // 2 if abs(h2) % 2 == 0 else abs(h2)
    flip = h2 > 0
    if w < 1 or h < 1 or w * h > _MAX_PIXELS:
        raise ValueError(f"ico: DIB dimensions {w}x{h} outside bounds")
    n_colors = int.from_bytes(entry[32:36], "little")
    pos = hdr_size
    palette = None
    if bpp <= 8:
        if n_colors == 0:
            n_colors = 1 << bpp
        if pos + 4 * n_colors > len(entry):
            raise ValueError("ico: palette overruns entry")
        pal = np.frombuffer(entry, np.uint8, count=4 * n_colors, offset=pos)
        palette = pal.reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        pos += 4 * n_colors

    if bpp in (32, 24):
        bytes_pp = bpp // 8
        stride = (w * bytes_pp + 3) & ~3
        need = stride * h
        if pos + need > len(entry):
            raise ValueError("ico: pixel data overruns entry")
        rows = np.frombuffer(entry, np.uint8, count=need, offset=pos).reshape(
            h, stride
        )
        px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
        rgb = px[:, :, :3][:, :, ::-1]
    elif bpp in (8, 4, 1):
        row_bits = w * bpp
        stride = ((row_bits + 31) // 32) * 4
        need = stride * h
        if pos + need > len(entry):
            raise ValueError("ico: pixel data overruns entry")
        rows = np.frombuffer(entry, np.uint8, count=need, offset=pos).reshape(
            h, stride
        )
        idx = rawimage.expand_dib_indices(rows, bpp, w)
        if palette is None or idx.max(initial=0) >= len(palette):
            raise ValueError("ico: palette index out of range")
        rgb = palette[idx]
    else:
        raise ValueError(f"ico: unsupported DIB bit depth {bpp}")
    return (rgb[::-1] if flip else rgb).copy()


def decode_ico(payload: bytes) -> list[dict]:
    """Decode every directory entry: ``[{"width","height","image"}]``."""
    if not sniff_ico(payload):
        raise ValueError("payload is not an ICO/CUR directory")
    count = int.from_bytes(payload[4:6], "little")
    if 6 + 16 * count > len(payload):
        raise ValueError("ico: directory overruns payload")
    out = []
    for i in range(count):
        e = payload[6 + 16 * i : 6 + 16 * (i + 1)]
        size = int.from_bytes(e[8:12], "little")
        off = int.from_bytes(e[12:16], "little")
        if off + size > len(payload) or size < 8:
            raise ValueError(f"ico: entry {i} extends past payload")
        blob = payload[off : off + size]
        if blob[:8] == _PNG_SIG:
            img = rawimage.decode_png(blob)
        else:
            img = _decode_dib(blob)
        out.append(
            {"width": img.shape[1], "height": img.shape[0], "image": img}
        )
    if not out:
        raise ValueError("ico: empty directory")
    return out


def decode_ico_best(payload: bytes) -> np.ndarray:
    """The largest entry's RGB array — the generic decode of an icon."""
    entries = decode_ico(payload)
    best = max(entries, key=lambda d: d["width"] * d["height"])
    return best["image"]


def encode_ico(images: list[np.ndarray], png: bool = False) -> bytes:
    """Deterministic ICO writer: 32-bit DIB entries (with an all-opaque
    AND mask) or PNG entries."""
    blobs = []
    for arr in images:
        h, w = arr.shape[:2]
        if png:
            blobs.append(rawimage.encode_png(arr))
            continue
        bgra = np.zeros((h, w, 4), np.uint8)
        bgra[:, :, :3] = arr[:, :, ::-1]
        bgra[:, :, 3] = 255
        # bottom-up rows, 32bpp stride is already 4-aligned
        xor = bgra[::-1].tobytes()
        mask_stride = ((w + 31) // 32) * 4
        mask = bytes(mask_stride * h)  # all transparent bits clear
        hdr = (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + (2 * h).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (32).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(xor).to_bytes(4, "little")
            + bytes(16)
        )
        blobs.append(hdr + xor + mask)
    out = bytearray(b"\x00\x00\x01\x00" + len(images).to_bytes(2, "little"))
    off = 6 + 16 * len(images)
    for arr, blob in zip(images, blobs):
        h, w = arr.shape[:2]
        out += bytes(
            [w if w < 256 else 0, h if h < 256 else 0, 0, 0]
        )
        out += (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        out += len(blob).to_bytes(4, "little") + off.to_bytes(4, "little")
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
