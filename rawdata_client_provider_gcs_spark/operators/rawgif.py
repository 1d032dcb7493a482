"""Pure-Python GIF codec (LZW, 87a/89a, multi-frame animation).

GIF is the one mainstream *multi-frame* visual format that needs no
codec library — LZW plus palettes, all stdlib — which makes it the
image-side analog of the WAV codec: with it, ``sample_frames`` in
:mod:`.multimodal` is REAL for a visual media type (an animated GIF is
the poor man's video), not just for audio.  Like the other payload
codecs this mirrors the reference's opaque-bytes data model
(``data: map<string,bytes>``, AvroRawdataProducer.java:42-49).

Decoder: header + logical screen descriptor, global/local color
tables, graphic-control extensions (frame delays, disposal), image
descriptors (sub-rectangles composed onto the canvas), variable-width
LSB-first LZW with CLEAR/EOI handling and the deferred-clear growth
rule.  Interlaced frames are de-interlaced.  Encoder: global palette,
real LZW compression (growing code width, dictionary reset at 4096),
per-frame delays — lossless round-trip for any ≤256-color image.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


# ----------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/EOI codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            # width grows when the NEXT code could not be represented
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression emitting the stream the decoder above (and
    any compliant GIF reader) expects."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # decoder grows its width after registering next_code-1; match it
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode all frames: list of ``(delay_ms, (H, W, 3) uint8 RGB)``.

    Frames are composed onto the logical-screen canvas honoring
    sub-rectangle placement; disposal method 2 restores the background
    after the frame, anything else leaves the canvas (the common cases).
    Transparent pixels keep the underlying canvas content.
    """
    if not sniff_gif(payload):
        raise ValueError("not a GIF payload")
    width, height, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", payload[pos + 1 : pos + 5]
                )
                delay_ms = delay_cs * 10
                transparent = tidx if gflags & 1 else None
                disposal = (gflags >> 2) & 7
                pos += 1 + size
            while payload[pos] != 0:  # skip (remaining) sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, lflags = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        pal = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            size = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code_size), np.uint8
        )[: fw * fh].reshape(fh, fw)
        if lflags & 0x40:  # interlaced: de-interlace rows
            rows = np.empty(fh, np.int64)
            i = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    rows[y] = i  # display row y was stored i-th
                    i += 1
            idx = idx[rows]
        saved = canvas[top : top + fh, left : left + fw].copy()
        rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = (
                gct[bg] if gct is not None and bg < len(gct) else 0
            )
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = saved
    return frames


def decode_gif_first_frame(payload: bytes) -> np.ndarray:
    frames = decode_gif(payload)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0][1]


# ------------------------------------------------------------- encoder


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | int = 100,
) -> bytes:
    """Encode (H, W, 3) uint8 frame(s) as an animated GIF.

    All frames must share one ≤256-color palette (collected globally);
    raises when the color count exceeds 256 — quantization is a modeling
    choice the caller should make, not something to silently apply.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if isinstance(delays_ms, int):
        delays_ms = [delays_ms] * len(frames)
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be equal-shape (H, W, 3) uint8")
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors; GIF palettes cap at 256"
        )
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    pal_size = 1 << pal_bits
    pal_bytes = np.zeros((pal_size, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    per_frame = [
        inverse[i * h * w : (i + 1) * h * w].astype(np.uint8)
        for i in range(len(frames))
    ]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 7), 0, 0)
    out += pal_bytes.tobytes()
    if len(frames) > 1:
        # Netscape looping extension (loop forever) — what viewers expect
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code_size = max(2, pal_bits)
    for delay, indices in zip(delays_ms, per_frame):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        lzw = _lzw_encode(indices.tobytes(), min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
