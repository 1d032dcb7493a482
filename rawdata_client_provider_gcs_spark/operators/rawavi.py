"""Pure-numpy AVI container codec for uncompressed (raw-DIB) video.

The video half of the multimodal tier's "real decode without media
libs" family (rawimage/rawjpeg/rawgif/rawaudio): AVI is a RIFF
container (same chunk grammar the WAV codec already parses,
``rawaudio._chunks``), and the BI_RGB frame payloads are device-
independent bitmaps — byte-identical row layout to the 24-bit BMP
raster the image codec already decodes (bottom-up, BGR, rows padded to
4 bytes).  So an uncompressed AVI decodes here with zero new
compression machinery, which makes it the honest first rung of the
"video containers" boundary: a recognized-but-compressed codec
(H.264, MJPG, ...) raises :class:`UnsupportedCodecError` from
:func:`decode_avi` — recorded PER-ROW by the multimodal kernels under
its own class name (compressed AVIs are ordinary crawl data; one must
never kill the job), yet never conflated with corruption — while the
CONTAINER path — parse, frame timing, frame extraction — is real and
round-trippable.

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
    b"MJPG", b"mjpg", b"dmb1",
    b"XVID", b"xvid", b"DIVX", b"divx", b"DX50", b"FMP4",
    b"MP42", b"MP43", b"MPG4", b"mp4v",
    b"VP80", b"VP90", b"vp08", b"vp09", b"av01",
    b"WMV1", b"WMV2", b"WMV3", b"WVC1",
    b"IV50", b"cvid", b"MSVC", b"CRAM",
    # MS-RLE declares itself through the INTEGER biCompression values
    # BI_RLE8=1 / BI_RLE4=2 (little-endian dwords below), not an ASCII
    # fourcc; I420/YUY2 are uncompressed pixel LAYOUTS this decoder
    # cannot unpack — recognized here so they label as unsupported
    # codec rather than corruption
    b"\x01\x00\x00\x00", b"\x02\x00\x00\x00", b"I420", b"YUY2",
})


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


def _dib_to_rgb(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode one BI_RGB bottom-up 24-bit DIB frame to (H, W, 3) RGB."""
    stride = (width * 3 + 3) & ~3
    need = stride * height
    rows = np.frombuffer(data, np.uint8, count=need).reshape(height, stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


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
    cur_fcc = None  # fccType of the most recent strh, scoped per strl
    frames: list[np.ndarray] = []

    def walk(off: int, end: int) -> None:
        nonlocal width, height, rate, scale, usec_per_frame, compression
        nonlocal cur_fcc
        for cid, doff, size in _sub_chunks(payload, off, end):
            if cid == b"LIST":
                if payload[doff : doff + 4] == b"strl":
                    cur_fcc = None  # a new stream list: forget the old strh
                walk(doff + 4, doff + size)  # skip the 4-byte list type
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
                compression = payload[doff + 16 : doff + 20]
                if compression in _KNOWN_COMPRESSED_FOURCCS:
                    raise UnsupportedCodecError(
                        "unsupported AVI video codec: fourcc="
                        f"{compression!r}; only uncompressed BI_RGB "
                        "24-bit is decodable without media libraries"
                    )
                if compression != b"\x00\x00\x00\x00" or bits != 24:
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
                frames.append(
                    _dib_to_rgb(payload[doff : doff + size], width, height)
                )

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI payload carries no video frames")
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    else:
        raise ValueError("AVI payload carries no frame timing")
    return frames, fps


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames as an uncompressed BI_RGB AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be equal-shape (H, W, 3) uint8")
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def dib(arr: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack(
        "<14I",
        int(1_000_000 * scale / rate),  # dwMicroSecPerFrame
        frame_bytes * int(round(fps)),  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
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
        + b"\x00" * 4  # fccHandler: unset for raw DIB
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # flags
            0,  # priority
            0,  # language
            0,  # initial frames
            scale,
            rate,
            0,  # start
            len(frames),
            frame_bytes,  # suggested buffer
            0xFFFFFFFF,  # quality (default)
            0,  # sample size
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,
        w,
        h,
        1,
        24,
        b"\x00\x00\x00\x00",  # BI_RGB
        frame_bytes,
        0,
        0,
        0,
        0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = [chunk(b"00db", dib(f)) for f in frames]
    movi = lst(b"movi", b"".join(movi_chunks))
    # idx1: (ckid, flags=KEYFRAME, offset from 'movi' type tag, size)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, frame_bytes)
        )
        off += 8 + frame_bytes + (frame_bytes & 1)
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
