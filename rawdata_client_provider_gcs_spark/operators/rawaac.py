"""AAC ADTS stream metadata — ISO/IEC 14496-3 §1.A (ADTS transport).

Raw ``.aac`` files on the web are ADTS: a 7/9-byte header per frame
(12-bit sync, MPEG version, profile/object type, the 13-entry
sampling-frequency-index table, channel configuration, 13-bit frame
length, optional CRC) followed by one AAC access unit of 1024 samples.
The header walk is exact and table-free beyond the public frequency
table, so frame census / duration / bitrate extract directly, while
spectral decode stays the documented loud boundary
(:func:`decode_aac_pcm` raises
:class:`~.rawavi.UnsupportedCodecError`).

Same resync discipline as :mod:`.rawmp3`: junk between frames is
tolerated up to a budget, a second coherent header confirms stream
parameters before they lock, and ID3 furniture is skipped.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); audio
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError
from .rawmp3 import MAX_RESYNC_BYTES, _skip_id3v2

#: ISO 14496-3 sampling_frequency_index (13 defined entries; 13/14
#: reserved, 15 forbidden/explicit)
SAMPLE_RATES = [
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
]

#: profile (MPEG-4 audio object type - 1, 2 bits in ADTS)
PROFILES = {0: "Main", 1: "LC", 2: "SSR", 3: "LTP"}

#: samples per frame per access unit (fixed for ADTS AAC)
SAMPLES_PER_FRAME = 1024


def parse_adts_header(data: bytes, pos: int) -> dict | None:
    """Decode one ADTS header at ``pos``; None when not a valid one."""
    if pos + 7 > len(data):
        return None
    b = data
    if b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
        return None
    mpeg2 = bool(b[pos + 1] & 0x08)
    no_crc = bool(b[pos + 1] & 0x01)
    profile = (b[pos + 2] >> 6) & 0x3
    sf_index = (b[pos + 2] >> 2) & 0xF
    if sf_index >= len(SAMPLE_RATES):
        return None
    channel_cfg = ((b[pos + 2] & 0x1) << 2) | (b[pos + 3] >> 6)
    frame_len = (
        ((b[pos + 3] & 0x03) << 11) | (b[pos + 4] << 3) | (b[pos + 5] >> 5)
    )
    hdr_len = 7 if no_crc else 9
    if frame_len < hdr_len:
        return None  # lying length: cannot even hold its own header
    n_blocks = (b[pos + 6] & 0x03) + 1
    return {
        "version": "MPEG-2" if mpeg2 else "MPEG-4",
        "profile": PROFILES[profile],
        "sample_rate": SAMPLE_RATES[sf_index],
        "channels": channel_cfg,  # 0 = signalled in-band (PCE)
        "frame_len": frame_len,
        "crc": not no_crc,
        "n_blocks": n_blocks,
    }


def sniff_aac(data: bytes) -> bool:
    """Two coherent consecutive ADTS headers (one alone is 12 bits of
    sync — far too weak against random bytes)."""
    start = _skip_id3v2(data)
    h = parse_adts_header(data, start)
    if h is None:
        return False
    nxt = parse_adts_header(data, start + h["frame_len"])
    return start + h["frame_len"] >= len(data) or (
        nxt is not None and nxt["sample_rate"] == h["sample_rate"]
    )


def parse_aac(data: bytes) -> dict:
    """Walk every ADTS frame; return stream-level metadata
    (``n_frames``, ``duration_ms``, ``bitrate`` average, ``resyncs``,
    rate/profile/channels from the confirmed first header)."""
    if len(data) < 7:
        raise ValueError("aac: payload shorter than one ADTS header")
    pos = _skip_id3v2(data)
    end = len(data)
    first = None
    n_frames = 0
    total_blocks = 0
    payload_bytes = 0
    junk = 0
    resyncs = 0
    while pos + 7 <= end:
        hdr = parse_adts_header(data, pos)
        if hdr is None or (
            first is not None
            and hdr["sample_rate"] != first["sample_rate"]
        ):
            junk += 1
            if junk > MAX_RESYNC_BYTES:
                break
            if junk == 1:
                resyncs += 1
            pos += 1
            continue
        if first is None:
            # confirm with a second coherent header before locking
            nxt = parse_adts_header(data, pos + hdr["frame_len"])
            confirmed = pos + hdr["frame_len"] >= end or (
                nxt is not None
                and nxt["sample_rate"] == hdr["sample_rate"]
            )
            if not confirmed:
                junk += 1
                if junk > MAX_RESYNC_BYTES:
                    break
                if junk == 1:
                    resyncs += 1
                pos += 1
                continue
            first = hdr
        junk = 0
        n_frames += 1
        total_blocks += hdr["n_blocks"]
        payload_bytes += hdr["frame_len"]
        pos += hdr["frame_len"]
    if first is None:
        raise ValueError("aac: no coherent ADTS frame sequence")
    rate = first["sample_rate"]
    duration_ms = total_blocks * SAMPLES_PER_FRAME * 1000 // rate
    return {
        "version": first["version"],
        "profile": first["profile"],
        "sample_rate": rate,
        "channels": first["channels"],
        "crc": first["crc"],
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "bitrate": (
            payload_bytes * 8 * 1000 // duration_ms if duration_ms else 0
        ),
        "resyncs": resyncs,
    }


def decode_aac_pcm(data: bytes):
    """The documented loud boundary: AAC spectral decode needs the
    filterbank window tables and Huffman codebooks, which cannot be
    transcribed verifiably offline (same honesty rule as MP3)."""
    raise UnsupportedCodecError(
        "AAC spectral decode is not implemented; frame-level metadata "
        "is available via parse_aac"
    )


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_aac(
    n_frames: int,
    *,
    sf_index: int = 4,
    profile: int = 1,
    channels: int = 2,
    crc: bool = False,
    frame_payload: int = 200,
    mpeg2: bool = False,
    id3v2_size: int = 0,
) -> bytes:
    """Write a syntactically valid ADTS stream with zeroed access
    units (header walks never read payload bytes)."""
    from .rawmp3 import _to_syncsafe

    out = bytearray()
    if id3v2_size:
        out += b"ID3" + bytes([4, 0, 0]) + _to_syncsafe(id3v2_size)
        out += b"\x00" * id3v2_size
    hdr_len = 9 if crc else 7
    frame_len = hdr_len + frame_payload
    for _ in range(n_frames):
        h = bytearray(hdr_len)
        h[0] = 0xFF
        h[1] = 0xF0 | (0x08 if mpeg2 else 0) | (0 if crc else 1)
        h[2] = (profile << 6) | (sf_index << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0x3) << 6) | ((frame_len >> 11) & 0x03)
        h[4] = (frame_len >> 3) & 0xFF
        h[5] = ((frame_len & 0x7) << 5) | 0x1F
        h[6] = 0xFC  # buffer fullness low bits + n_blocks-1 = 0
        out += h + b"\x00" * frame_payload
    return bytes(out)
