"""Pure-numpy codec for uncompressed WAV audio (RIFF PCM / IEEE float).

The audio analog of :mod:`rawimage`: this environment ships no
librosa/soundfile, but canonical WAV — a RIFF header over raw samples —
needs nothing beyond numpy.  Supported sample encodings: PCM unsigned
8-bit, signed 16/24/32-bit little-endian, and IEEE float32/float64
(format tags 1 and 3, plus WAVE_FORMAT_EXTENSIBLE wrapping either),
and the compressed telephony tiers: G.711 μ-law/A-law (tags 7/6)
and IMA/DVI ADPCM (tag 0x11, blocked nibble streams) — expansion
tables and the ADPCM step transition built from the standard integer
formulas and pinned bit-exact against stdlib ``audioop``.
Decoding here makes the multimodal audio feature/segment kernels *real*
— not stubbed — for WAV payloads, in every environment.

All functions are batch-friendly (called from ``mapInPandas`` kernels)
and deterministic.
"""

from __future__ import annotations

import math

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_EXTENSIBLE = 0xFFFE


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """(mu_lut, a_lut): 256-entry int16 expansion tables from the G.711
    integer formulas (the classic ulaw2linear/alaw2linear); pinned
    bit-exact against the stdlib ``audioop`` implementation in
    ``test_operators.py::test_g711_tables_match_audioop``."""
    mu = np.empty(256, np.int16)
    for u in range(256):
        x = ~u & 0xFF
        t = (((x & 0x0F) << 3) + 0x84) << ((x & 0x70) >> 4)
        mu[u] = (0x84 - t) if (x & 0x80) else (t - 0x84)
    al = np.empty(256, np.int16)
    for a in range(256):
        x = a ^ 0x55
        seg = (x & 0x70) >> 4
        t = (x & 0x0F) << 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        al[a] = t if (x & 0x80) else -t
    return mu, al


_MU_LUT, _A_LUT = _g711_luts()

_ADPCM = 0x11  # IMA/DVI ADPCM

#: IMA ADPCM step-size table (89 entries) + index adjustments — the
#: standard DVI tables; the step transition is pinned bit-exact against
#: stdlib ``audioop.adpcm2lin`` over every (index, nibble) pair in
#: ``test_round8.py::test_ima_adpcm_step_matches_audioop``.
_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
     37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
     157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
     544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
     1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
     4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
     12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
     29794, 32767],
    np.int32,
)
_IMA_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode transition (audioop-pinned)."""
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_ADJUST[nib & 7])))
    return pred, idx


def _ima_decode_block(
    block: bytes, channels: int, samples_per_block: int
) -> np.ndarray:
    """One WAV IMA block to (samples_per_block, channels) int16.

    Block layout: a 4-byte header per channel (predictor i16, step
    index u8, reserved), then nibble data in 4-byte per-channel groups
    (low nibble first) — the canonical wSamplesPerBlock framing."""
    if len(block) < 4 * channels:
        raise ValueError("IMA ADPCM block shorter than its headers")
    preds = []
    idxs = []
    for c in range(channels):
        pred = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
        idx = block[c * 4 + 2]
        if idx > 88:
            raise ValueError("IMA ADPCM step index out of range")
        preds.append(pred)
        idxs.append(idx)
    chans = [[p] for p in preds]
    body = block[4 * channels :]
    usable = len(body) - (len(body) % (4 * channels))
    for g in range(0, usable, 4 * channels):
        for c in range(channels):
            for b in body[g + 4 * c : g + 4 * c + 4]:
                for nib in (b & 0xF, b >> 4):
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    chans[c].append(preds[c])
    out = np.zeros((samples_per_block, channels), np.int16)
    for c in range(channels):
        got = chans[c][:samples_per_block]
        if len(got) < samples_per_block:
            raise ValueError("IMA ADPCM block carries too few samples")
        out[:, c] = got
    return out


def _ima_encode_block(
    samples: np.ndarray, idxs: list[int]
) -> bytes:
    """Compress one (n, channels) int16 block (step indexes carried
    in/out; the predictor restarts from each block's first sample per
    the WAV framing)."""
    n, channels = samples.shape
    out = bytearray()
    preds = []
    for c in range(channels):
        preds.append(int(samples[0, c]))
        out += preds[c].to_bytes(2, "little", signed=True)
        out += bytes((idxs[c], 0))
    nibs = [[] for _ in range(channels)]
    for i in range(1, n):
        for c in range(channels):
            step = int(_IMA_STEPS[idxs[c]])
            diff = int(samples[i, c]) - preds[c]
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
            nibs[c].append(nib)
    for c in range(channels):
        while len(nibs[c]) % 8:
            nibs[c].append(0)
    for g in range(len(nibs[0]) // 8):
        for c in range(channels):
            chunk = nibs[c][g * 8 : g * 8 + 8]
            for k in range(0, 8, 2):
                out.append(chunk[k] | (chunk[k + 1] << 4))
    return bytes(out)


def _pcm24_to_float(data: bytes, big_endian: bool) -> np.ndarray:
    """24-bit packed PCM → float64 in [-1, 1) — shared by all three
    container decoders (WAV little-endian, AIFF/AU big-endian)."""
    raw = np.frombuffer(data, np.uint8)
    raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
    if big_endian:
        b0, b1, b2 = raw[:, 2], raw[:, 1], raw[:, 0]
    else:
        b0, b1, b2 = raw[:, 0], raw[:, 1], raw[:, 2]
    as_int = (
        b0.astype(np.int32)
        | (b1.astype(np.int32) << 8)
        | (b2.astype(np.int32) << 16)
    )
    as_int = np.where(as_int >= 1 << 23, as_int - (1 << 24), as_int)
    return as_int.astype(np.float64) / float(1 << 23)


def sniff_wav(payload: bytes) -> bool:
    """True when the payload is a RIFF/WAVE container."""
    return (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _chunks(payload: bytes):
    """Yield (chunk_id, offset, size) for every top-level RIFF chunk."""
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        yield cid, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to ``((n_frames, channels) float64 in [-1, 1], rate)``.

    Integer PCM is scaled by its full-scale value (asymmetric two's
    complement, the convention soundfile/librosa use); float payloads
    pass through unscaled.
    """
    if not sniff_wav(payload):
        raise ValueError("payload is not a RIFF/WAVE container")
    fmt = None
    data = None
    for cid, off, size in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = payload[off : off + size]
        elif cid == b"data" and data is None:
            data = payload[off : off + size]
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag == _EXTENSIBLE and len(fmt) >= 26:
        # SubFormat GUID's leading u16 is the real format tag
        tag = int.from_bytes(fmt[24:26], "little")
    if channels < 1 or rate < 1:
        raise ValueError(f"bad WAV header: channels={channels} rate={rate}")

    if tag == _IEEE_FLOAT and bits in (32, 64):
        samples = np.frombuffer(
            data, np.float32 if bits == 32 else np.float64
        ).astype(np.float64)
    elif tag == _PCM and bits == 8:
        samples = (
            np.frombuffer(data, np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif tag == _PCM and bits in (16, 32):
        dtype = np.dtype("<i2") if bits == 16 else np.dtype("<i4")
        scale = float(2 ** (bits - 1))
        samples = np.frombuffer(data, dtype).astype(np.float64) / scale
    elif tag == _PCM and bits == 24:
        samples = _pcm24_to_float(data, big_endian=False)
    elif tag in (_MULAW, _ALAW) and bits == 8:
        lut = _MU_LUT if tag == _MULAW else _A_LUT
        samples = lut[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif tag == _ADPCM and bits == 4:
        block_align = int.from_bytes(fmt[12:14], "little")
        if len(fmt) >= 20:
            spb = int.from_bytes(fmt[18:20], "little")
        else:  # derive from the canonical framing
            spb = (block_align - 4 * channels) * 2 // channels + 1
        if block_align < 4 * channels or spb < 1:
            raise ValueError("bad IMA ADPCM framing")
        blocks = []
        usable = len(data) - (len(data) % block_align)
        for off2 in range(0, usable, block_align):
            blocks.append(
                _ima_decode_block(
                    data[off2 : off2 + block_align], channels, spb
                )
            )
        if not blocks:
            raise ValueError("IMA ADPCM payload carries no full block")
        return (
            np.concatenate(blocks).astype(np.float64) / 32768.0,
            rate,
        )
    else:
        raise ValueError(f"unsupported WAV encoding: tag={tag} bits={bits}")

    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), rate


def encode_wav_adpcm(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode float samples as an IMA ADPCM WAV (tag 0x11) — the
    fixture-grade compander mirror of the block decoder."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if samples_per_block < 2:
        raise ValueError("samples_per_block must be at least 2")
    int16 = np.clip(
        np.round(samples * 32768.0), -32768, 32767
    ).astype(np.int16)
    groups = ((samples_per_block - 1) + 7) // 8
    block_align = 4 * channels + groups * 4 * channels
    idxs = [0] * channels
    body = bytearray()
    for start in range(0, frames, samples_per_block):
        chunk = int16[start : start + samples_per_block]
        if len(chunk) < samples_per_block:  # pad the tail block
            pad = np.repeat(chunk[-1:], samples_per_block - len(chunk), 0)
            chunk = np.concatenate([chunk, pad])
        body += _ima_encode_block(chunk, idxs)
    fmt = (
        _ADPCM.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // samples_per_block).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")  # cbSize
        + samples_per_block.to_bytes(2, "little")  # wSamplesPerBlock
    )
    out = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    out += b"data" + len(body).to_bytes(4, "little") + bytes(body)
    if len(body) & 1:
        out += b"\x00"
    return b"RIFF" + len(out).to_bytes(4, "little") + out


def _g711_nearest_codes(samples: np.ndarray, law: str) -> np.ndarray:
    """Nearest G.711 codeword per float sample via the expansion LUT —
    the one compander both the WAV and AU writers share."""
    if law not in ("mu", "a"):
        raise ValueError("law must be 'mu' or 'a'")
    lut = _MU_LUT if law == "mu" else _A_LUT
    order = np.argsort(lut, kind="stable")
    svals = lut[order].astype(np.int32)
    target = np.clip(np.round(samples.reshape(-1) * 32768.0), -32768, 32767)
    pos = np.searchsorted(svals, target).clip(1, 255)
    lo, hi = svals[pos - 1], svals[pos.clip(0, 255)]
    take_hi = np.abs(hi - target) < np.abs(target - lo)
    return order[np.where(take_hi, pos, pos - 1)].astype(np.uint8)


def encode_wav_g711(
    samples: np.ndarray, rate: int, law: str = "mu"
) -> bytes:
    """Encode float samples as a G.711 μ-law/A-law WAV (nearest
    codeword via the expansion LUT — fixture-grade compander)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    codes = _g711_nearest_codes(samples, law)
    tag = _MULAW if law == "mu" else _ALAW
    fmt = (
        tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels).to_bytes(4, "little")
        + channels.to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    data = codes.tobytes()
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_wav_float32(samples: np.ndarray, rate: int) -> bytes:
    """Encode ``(n_frames, channels)`` float as IEEE-float32 WAV.

    Float storage is lossless for float32-representable values — the
    encode→decode round-trip is bit-exact, which makes decoded signal
    statistics algebraically predictable (the oracle-checked audio
    queries rely on this; 16-bit PCM would quantize).
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    data = samples.astype("<f4").tobytes()
    fmt = (
        _IEEE_FLOAT.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 4).to_bytes(4, "little")
        + (channels * 4).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
    )
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Encode ``(n_frames, channels)`` float64 in [-1, 1] as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = (
        _PCM.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """8 deterministic summary features of a decoded clip.

    [duration_s, channels, rate, rms, peak, zero_crossing_rate,
    mean, std] — mono-mixed before the signal stats, all plain
    numpy reductions.
    """
    frames, channels = samples.shape
    mono = samples.mean(axis=1)
    dur = frames / rate
    rms = float(np.sqrt(np.mean(mono**2))) if frames else 0.0
    peak = float(np.max(np.abs(mono))) if frames else 0.0
    zcr = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if frames > 1
        else 0.0
    )
    mean = float(mono.mean()) if frames else 0.0
    std = float(mono.std()) if frames else 0.0
    return [dur, float(channels), float(rate), rms, peak, zcr, mean, std]


# ---------------------------------------------------------------------------
# AIFF / AIFF-C (the big-endian IFF twin of WAV) and Sun AU
# ---------------------------------------------------------------------------


def _read_extended80(b: bytes) -> float:
    """IEEE 754 80-bit extended float — AIFF's sample-rate encoding."""
    if len(b) < 10:
        raise ValueError("AIFF extended float shorter than 10 bytes")
    sign_exp = int.from_bytes(b[0:2], "big")
    mantissa = int.from_bytes(b[2:10], "big")
    exp = sign_exp & 0x7FFF
    if exp == 0 and mantissa == 0:
        return 0.0
    # sample rates live in [1, ~2^40); a hostile exponent outside that
    # band would overflow float64 (OverflowError, not the ValueError
    # boundary) or round to 0 — reject it before the arithmetic
    if exp >= 16383 + 41 or exp < 16383 - 16 or exp == 0x7FFF:
        raise ValueError(f"AIFF sample-rate exponent {exp} outside sane range")
    val = mantissa * 2.0 ** (exp - 16383 - 63)
    return -val if sign_exp & 0x8000 else val


def _write_extended80(value: float) -> bytes:
    if value <= 0:
        raise ValueError("extended80 writer handles positive rates only")
    exp = 16383 + 63
    mant = int(value)
    frac = value - mant
    m = mant
    # normalize: shift mantissa so bit 63 is set
    shift = 63 - (m.bit_length() - 1)
    m = (m << shift) | int(frac * (1 << shift))
    exp -= shift
    return exp.to_bytes(2, "big") + m.to_bytes(8, "big")


def sniff_aiff(payload: bytes) -> bool:
    """True when the payload is a FORM/AIFF or FORM/AIFC container."""
    return (
        len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] in (b"AIFF", b"AIFC")
    )


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode AIFF/AIFF-C to ``((frames, channels) float64, rate)``.

    PCM (big-endian 8/16/24/32 — AIFF 8-bit is SIGNED, unlike WAV),
    AIFC ``sowt`` (little-endian 16-bit), ``ulaw``/``alaw`` (shared
    G.711 LUTs), ``fl32``/``fl64`` floats.  Anything else raises.
    """
    if not sniff_aiff(payload):
        raise ValueError("payload is not a FORM/AIFF container")
    is_aifc = payload[8:12] == b"AIFC"
    comm = ssnd = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "big")
        if size < 0 or i + 8 + size > n:
            raise ValueError("AIFF chunk overruns container")
        if cid == b"COMM" and comm is None:
            comm = payload[i + 8 : i + 8 + size]
        elif cid == b"SSND" and ssnd is None:
            ssnd = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if comm is None or len(comm) < 18 or ssnd is None or len(ssnd) < 8:
        raise ValueError("AIFF missing COMM or SSND chunk")
    channels = int.from_bytes(comm[0:2], "big", signed=True)
    bits = int.from_bytes(comm[6:8], "big", signed=True)
    rate = int(round(_read_extended80(comm[8:18])))
    compression = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise ValueError("AIFC COMM missing compression type")
        compression = comm[18:22]
    if channels < 1 or rate < 1:
        raise ValueError(f"bad AIFF header: channels={channels} rate={rate}")
    data_off = int.from_bytes(ssnd[0:4], "big")  # offset field
    data = ssnd[8 + data_off :]

    if compression == b"NONE" and bits in (8, 16, 24, 32):
        if bits == 8:
            samples = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
        elif bits == 24:
            samples = _pcm24_to_float(data, big_endian=True)
        else:
            dtype = np.dtype(">i2") if bits == 16 else np.dtype(">i4")
            samples = np.frombuffer(data, dtype).astype(np.float64) / float(
                2 ** (bits - 1)
            )
    elif compression == b"sowt" and bits == 16:
        samples = np.frombuffer(data, np.dtype("<i2")).astype(np.float64) / 32768.0
    elif compression in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        lut = _MU_LUT if compression.lower() == b"ulaw" else _A_LUT
        samples = lut[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif compression == b"fl32":
        samples = np.frombuffer(data, np.dtype(">f4")).astype(np.float64)
    elif compression == b"fl64":
        samples = np.frombuffer(data, np.dtype(">f8")).astype(np.float64)
    else:
        raise ValueError(
            f"unsupported AIFF encoding: compression={compression!r} bits={bits}"
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), rate


def encode_aiff_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Deterministic big-endian 16-bit AIFF writer (fixture/roundtrip)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    ints = np.clip(np.round(samples * 32768.0), -32768, 32767).astype(">i2")
    data = ints.tobytes()
    comm = (
        channels.to_bytes(2, "big")
        + frames.to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + _write_extended80(float(rate))
    )
    ssnd = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data
    body = (
        b"AIFF"
        + b"COMM"
        + len(comm).to_bytes(4, "big")
        + comm
        + b"SSND"
        + len(ssnd).to_bytes(4, "big")
        + ssnd
        + (b"\x00" if len(ssnd) & 1 else b"")
    )
    return b"FORM" + len(body).to_bytes(4, "big") + body


_AU_ENCODINGS = {
    1: ("ulaw", 8),
    2: ("pcm", 8),
    3: ("pcm", 16),
    4: ("pcm", 24),
    5: ("pcm", 32),
    6: ("float", 32),
    7: ("float", 64),
}


def sniff_au(payload: bytes) -> bool:
    """True when the payload is a Sun/NeXT .au (.snd) stream."""
    return len(payload) >= 24 and payload[:4] == b".snd"


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode Sun AU to ``((frames, channels) float64, rate)``.

    Big-endian throughout; encodings 1 (G.711 μ-law) and 2-7 (linear
    PCM 8/16/24/32, float32/64).  AU 8-bit PCM is signed.
    """
    if not sniff_au(payload):
        raise ValueError("payload is not a Sun AU stream")
    off = int.from_bytes(payload[4:8], "big")
    enc = int.from_bytes(payload[12:16], "big")
    rate = int.from_bytes(payload[16:20], "big")
    channels = int.from_bytes(payload[20:24], "big")
    if off < 24 or off > len(payload):
        raise ValueError("AU data offset outside the payload")
    if channels < 1 or rate < 1:
        raise ValueError(f"bad AU header: channels={channels} rate={rate}")
    if enc not in _AU_ENCODINGS:
        raise ValueError(f"unsupported AU encoding: {enc}")
    kind, bits = _AU_ENCODINGS[enc]
    data = payload[off:]
    if kind == "ulaw":
        samples = _MU_LUT[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif kind == "float":
        samples = np.frombuffer(
            data, np.dtype(">f4") if bits == 32 else np.dtype(">f8")
        ).astype(np.float64)
    elif bits == 8:
        samples = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif bits == 24:
        samples = _pcm24_to_float(data, big_endian=True)
    else:
        dtype = np.dtype(">i2") if bits == 16 else np.dtype(">i4")
        samples = np.frombuffer(data, dtype).astype(np.float64) / float(
            2 ** (bits - 1)
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), rate


def encode_au(samples: np.ndarray, rate: int, encoding: str = "pcm16") -> bytes:
    """Deterministic AU writer: ``pcm16`` (encoding 3) or ``ulaw``."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    if encoding == "pcm16":
        ints = np.clip(np.round(samples * 32768.0), -32768, 32767).astype(">i2")
        data, enc = ints.tobytes(), 3
    elif encoding == "ulaw":
        data, enc = _g711_nearest_codes(samples, "mu").tobytes(), 1
    else:
        raise ValueError(f"unsupported AU writer encoding: {encoding}")
    header = (
        b".snd"
        + (24).to_bytes(4, "big")
        + len(data).to_bytes(4, "big")
        + enc.to_bytes(4, "big")
        + int(rate).to_bytes(4, "big")
        + int(channels).to_bytes(4, "big")
    )
    return header + data


def sniff_audio(payload: bytes) -> bool:
    """True when the payload is any decodable audio container."""
    return (
        sniff_wav(payload)
        or sniff_aiff(payload)
        or sniff_au(payload)
        or payload[:4] == b"fLaC"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Dispatch WAV / AIFF / AU / FLAC decode by container magic."""
    if sniff_wav(payload):
        return decode_wav(payload)
    if sniff_aiff(payload):
        return decode_aiff(payload)
    if sniff_au(payload):
        return decode_au(payload)
    if payload[:4] == b"fLaC":
        from . import rawflac  # noqa: PLC0415

        return rawflac.decode_flac(payload)
    raise ValueError("payload is not a recognized audio container")


def segment_wav(
    payload: bytes, every_ms: int, max_segments: int
) -> list[tuple[int, int, bytes]]:
    """Split an audio payload into ``every_ms`` slices re-encoded as WAV.

    Returns ``[(idx, start_ms, wav_bytes), ...]`` — at most
    ``max_segments`` entries, the audio analog of video frame sampling.
    Slices are cut on frame boundaries so every segment is a valid
    standalone clip.  Accepts any container ``decode_audio`` handles;
    segments are always emitted as PCM-16 WAV.
    """
    samples, rate = decode_audio(payload)
    return segment_samples(samples, rate, every_ms, max_segments)


def segment_samples(
    samples: np.ndarray, rate: int, every_ms: int, max_segments: int
) -> list[tuple[int, int, bytes]]:
    """Slice already-decoded ``(frames, channels)`` samples into
    ``every_ms`` PCM-16 WAV clips — the shared tail of
    :func:`segment_wav`, reused by the Ogg Vorbis decode path."""
    frames = samples.shape[0]
    step = max(1, rate * every_ms // 1000)
    out = []
    for idx in range(min((frames + step - 1) // step, max_segments)):
        start = idx * step
        seg = samples[start : start + step]
        out.append(
            (idx, start * 1000 // rate, encode_wav_pcm16(seg, rate))
        )
    return out


def audio_quality(
    samples: "np.ndarray",
    rate: int,
    *,
    clip_thresh: float = 0.999,
    silence_rms: float = 1e-4,
    window_ms: int = 20,
) -> list[float]:
    """Curation-grade quality signals of a decoded clip.

    ``[clipping_ratio, silence_ratio, dc_offset, crest_db,
    trim_ratio]`` — the numbers a speech/audio corpus pass filters
    on: fraction of samples at or beyond full scale, fraction of
    ``window_ms`` windows whose RMS sits under the silence floor, DC
    bias, peak-to-RMS crest factor in dB (0 for silence), and the
    fraction of the clip a leading/trailing silence trim would drop.
    Mono-mixed first; plain numpy reductions, no FFT.
    """
    frames = samples.shape[0]
    if frames == 0:
        return [0.0, 0.0, 0.0, 0.0, 0.0]
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    clipping = float(np.mean(np.abs(mono) >= clip_thresh))
    dc = float(mono.mean())
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    crest = 20.0 * math.log10(peak / rms) if rms > 0 else 0.0
    win = max(1, rate * window_ms // 1000)
    n_win = (frames + win - 1) // win
    silent = np.zeros(n_win, dtype=bool)
    for i in range(n_win):
        seg = mono[i * win : (i + 1) * win]
        silent[i] = float(np.sqrt(np.mean(seg**2))) < silence_rms
    silence_ratio = float(silent.mean())
    active = np.nonzero(~silent)[0]
    if len(active):
        lead = int(active[0]) * win
        tail_start = min(frames, (int(active[-1]) + 1) * win)
        trim = (lead + (frames - tail_start)) / frames
    else:
        trim = 1.0
    return [clipping, silence_ratio, dc, crest, float(trim)]


def spectrum_features(
    samples: np.ndarray, rate: int, n_fft: int = 256
) -> list[float]:
    """Frequency-domain features of a decoded clip (real numpy FFT).

    [dominant_bin, dominant_freq_hz, dominant_mag, spectral_centroid_hz]
    over the first ``n_fft`` mono frames (zero-padded when shorter).
    The DC bin is excluded from the dominant search; magnitudes are
    un-normalized ``|rfft|`` so an on-bin sine of amplitude A yields a
    dominant magnitude of exactly ``A·n_fft/2`` — the property the
    oracle-checked spectrum query pins.
    """
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    frame = np.zeros(n_fft, np.float64)
    frame[: min(len(mono), n_fft)] = mono[:n_fft]
    mags = np.abs(np.fft.rfft(frame))
    k = int(np.argmax(mags[1:])) + 1  # exclude DC
    freqs = np.arange(len(mags)) * (rate / n_fft)
    total = float(mags.sum())
    centroid = float((freqs * mags).sum() / total) if total > 0 else 0.0
    return [float(k), float(k * rate / n_fft), float(mags[k]), centroid]
