"""FLAC codec — lossless compressed audio for the multimodal tier.

Speech and music corpora ship as FLAC; without a reader the audio tier
stopped at uncompressed containers (WAV/AIFF/AU).  This module
implements the FLAC bitstream (RFC 9639) on the read path:

- the MSB-first bit reader, "fLaC" + metadata-block walk (STREAMINFO
  parsed, others skipped);
- frame headers: sync code, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields, the UTF-8-like
  coded frame number, and the header CRC-8 (poly 0x07) actually
  verified;
- all subframe types: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC
  up to order 32 (signed quantized coefficients, arithmetic shift),
  plus wasted-bits unpacking;
- Rice-coded residuals, both 4-bit and 5-bit parameter methods,
  partition orders 0-15, and the escape-to-raw-bits form;
- stereo decorrelation: independent, left/side, right/side, mid/side;
- the frame-footer CRC-16 (poly 0x8005), verified per frame.

Anything malformed raises ``ValueError`` for the per-row capture
discipline; hostile allocations are bounded by the format's own field
widths (block size ≤ 65536, ≤ 8 channels) — there is no wider size
field to lie through.

The write path (``encode_flac``) is a fixture-grade encoder (verbatim
/ constant / fixed-predictor subframes, real Rice coding, real CRCs,
optional mid/side) whose output roundtrips bit-exactly — the same
strategy that pins every decoder path in the WebP/JPEG codecs.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); audio
decoding belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import numpy as np

_MAX_CHANNELS = 8


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first, unlike the VP8L reader)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.pos + nbits > self.n:
            raise ValueError("flac: bitstream exhausted")
        out = 0
        data = self.data
        pos = self.pos
        for i in range(nbits):
            byte = data[(pos + i) >> 3]
            out = (out << 1) | ((byte >> (7 - ((pos + i) & 7))) & 1)
        self.pos += nbits
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        count = 0
        data = self.data
        while True:
            if self.pos >= self.n:
                raise ValueError("flac: bitstream exhausted in unary")
            bit = (data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            if bit:
                return count
            count += 1
            if count > 1 << 24:
                raise ValueError("flac: runaway unary code")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        if value < 0 or value >> nbits:
            # silent truncation here produced undecodable streams
            # (frame numbers, rates) — fail at the right altitude
            raise ValueError(
                f"flac writer: value {value} does not fit in {nbits} bits"
            )
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def getvalue(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def sniff_flac(payload: bytes) -> bool:
    return payload[:4] == b"fLaC"


_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _BitReader) -> int:
    """The UTF-8-like coded frame/sample number."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_ones = 0
    v = first
    while v & 0x80:
        n_ones += 1
        v <<= 1
    if n_ones == 1 or n_ones > 7:
        raise ValueError("flac: malformed coded number")
    out = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: malformed coded-number continuation")
        out = (out << 6) | (b & 0x3F)
    return out


def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("flac: block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_parts):
        count = block_size // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = br.read(plen)
        if param == escape:
            raw_bits = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                bits = br.read(param) if param else 0
                zz = (q << param) | bits
                out.append((zz >> 1) ^ -(zz & 1))
    return out


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")

    if stype == 0:  # CONSTANT
        v = br.read_signed(eff_bps)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff_bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warmup = [br.read_signed(eff_bps) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        samples = list(warmup)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warmup = [br.read_signed(eff_bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        samples = list(warmup)
        for r in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode FLAC bytes to ``((frames, channels) float64 in [-1, 1], rate)``
    — the same convention as :func:`rawaudio.decode_wav`."""
    if not sniff_flac(payload):
        raise ValueError("payload is not a FLAC stream")
    pos = 4
    n = len(payload)
    rate = channels = bps = None
    last = False
    while not last:
        if pos + 4 > n:
            raise ValueError("flac: truncated metadata block header")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("flac: metadata block overruns payload")
        if btype == 0:  # STREAMINFO
            if blen < 34:
                raise ValueError("flac: short STREAMINFO")
            sb = _BitReader(body)
            sb.read(16)  # min block
            sb.read(16)  # max block
            sb.read(24)  # min frame
            sb.read(24)  # max frame
            rate = sb.read(20)
            channels = sb.read(3) + 1
            bps = sb.read(5) + 1
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        pos += 4 + blen
    if rate is None:
        raise ValueError("flac: missing STREAMINFO")
    if rate < 1 or channels < 1 or channels > _MAX_CHANNELS:
        raise ValueError(f"flac: bad STREAMINFO rate={rate} channels={channels}")

    chans: list[list[int]] = [[] for _ in range(channels)]
    br = _BitReader(payload, pos * 8)
    total = 0
    while br.pos + 16 <= br.n:
        frame_start_byte = br.pos >> 3
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: reserved frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved frame header bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code 0")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        if ss_code == 0:
            frame_bps = bps
        elif ss_code == 3:
            raise ValueError("flac: reserved sample size code 3")
        else:
            frame_bps = _SAMPLE_SIZE_CODES[ss_code]
            if frame_bps != bps:
                # decoding at frame_bps but normalizing by STREAMINFO
                # bps would silently mis-scale amplitudes 2^k-fold
                raise ValueError(
                    "flac: frame sample size disagrees with STREAMINFO"
                )
        # header CRC-8 covers everything up to here
        br.align()
        header_bytes = payload[frame_start_byte : br.pos >> 3]
        crc8 = br.read(8)
        if _crc8(header_bytes) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("flac: frame channel count != STREAMINFO")
            sub = [
                _read_subframe(br, block_size, frame_bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("flac: stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left/side
                left = _read_subframe(br, block_size, frame_bps)
                side = _read_subframe(br, block_size, frame_bps + 1)
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, block_size, frame_bps + 1)
                right = _read_subframe(br, block_size, frame_bps)
                sub = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(br, block_size, frame_bps)
                side = _read_subframe(br, block_size, frame_bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")

        br.align()
        frame_bytes = payload[frame_start_byte : br.pos >> 3]
        crc16 = br.read(16)
        if _crc16(frame_bytes) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(sub[c])
        total += block_size
        # tolerate trailing byte padding after the final frame
        while br.pos + 16 <= br.n and (br.pos & 7) == 0:
            probe = (payload[br.pos >> 3] << 6) | (payload[(br.pos >> 3) + 1] >> 2)
            if probe == 0x3FFE:
                break
            if payload[br.pos >> 3] == 0:
                br.pos += 8
                continue
            break

    if total == 0:
        raise ValueError("flac: stream carries no frames")
    arr = np.array(chans, np.float64).T  # (frames, channels)
    scale = float(1 << (bps - 1))
    return arr / scale, rate


# ---------------------------------------------------------------------------
# Encoder (fixture-grade)
# ---------------------------------------------------------------------------


def _write_coded_number(bw: _BitWriter, value: int) -> None:
    """The UTF-8-like coded frame number, general multi-byte form
    (the exact inverse of ``_read_coded_number``)."""
    if value < 0x80:
        bw.write(value, 8)
        return
    payload_bits = value.bit_length()
    # n-byte form carries 6*(n-1) + (7-n) payload bits
    for n in range(2, 8):
        if payload_bits <= 6 * (n - 1) + (7 - n):
            break
    else:
        raise ValueError(f"flac: frame number {value} too large to code")
    lead_payload = 7 - n
    lead = (0xFF << (8 - n)) & 0xFF
    bw.write(lead | (value >> (6 * (n - 1))) & ((1 << lead_payload) - 1), 8)
    for i in range(n - 2, -1, -1):
        bw.write(0x80 | ((value >> (6 * i)) & 0x3F), 8)


def _write_rice(bw: _BitWriter, values: list[int], param: int) -> None:
    for v in values:
        zz = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(zz >> param)
        if param:
            bw.write(zz & ((1 << param) - 1), param)


def _best_rice_param(values: list[int]) -> int:
    best, best_bits = 0, float("inf")
    for param in range(15):
        bits = sum(
            ((((v << 1) if v >= 0 else ((-v) << 1) - 1)) >> param) + 1 + param
            for v in values
        )
        if bits < best_bits:
            best, best_bits = param, bits
    return best


def _write_subframe(
    bw: _BitWriter, samples: list[int], bps: int, subframe: str
) -> None:
    if subframe.startswith("fixed") and len(samples) <= int(subframe[-1]):
        # a final partial block shorter than the predictor order cannot
        # carry its warmup — emit it verbatim
        subframe = "verbatim"
    bw.write(0, 1)  # padding
    if subframe == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bps)
        return
    if subframe == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    if subframe.startswith("fixed"):
        order = int(subframe[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        coefs = _FIXED_COEFS[order]
        for s in samples[:order]:
            bw.write_signed(s, bps)
        resid = []
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
            resid.append(samples[i] - pred)
        bw.write(0, 2)  # 4-bit rice method
        bw.write(0, 4)  # partition order 0
        param = min(_best_rice_param(resid) if resid else 0, 14)
        bw.write(param, 4)
        _write_rice(bw, resid, param)
        return
    raise ValueError(f"unknown fixture subframe kind {subframe!r}")


def encode_flac(
    samples: np.ndarray,
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
    subframe: str = "fixed2",
    mid_side: bool = False,
) -> bytes:
    """Fixture FLAC writer: real frame headers and CRCs; subframe kind
    ``constant`` / ``verbatim`` / ``fixed0``..``fixed4``; optional
    mid/side decorrelation for stereo input.  Roundtrips bit-exactly
    through :func:`decode_flac`."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if frames == 0:
        # a frameless stream is undecodable; fail at encode time so
        # the asymmetry with the WAV writers is loud, not latent
        raise ValueError("flac: cannot encode an empty clip")
    ints = np.clip(
        np.round(samples * float(1 << (bps - 1))),
        -(1 << (bps - 1)),
        (1 << (bps - 1)) - 1,
    ).astype(np.int64)

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(frames & ((1 << 36) - 1), 36)
    streaminfo = si.getvalue() + bytes(16)  # zero MD5 (unset)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    if mid_side and channels != 2:
        raise ValueError("mid_side needs stereo input")

    frame_no = 0
    for start in range(0, frames, block_size):
        chunk = ints[start : start + block_size]
        bs = chunk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # rate from STREAMINFO
        bw.write(10 if mid_side else channels - 1, 4)
        bw.write(0, 3)  # bps from STREAMINFO
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.align()
        header = bw.getvalue()
        bw.write(_crc8(header), 8)

        if mid_side:
            left = chunk[:, 0].tolist()
            right = chunk[:, 1].tolist()
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            _write_subframe(bw, mid, bps, subframe)
            _write_subframe(bw, side, bps + 1, subframe)
        else:
            for c in range(channels):
                _write_subframe(bw, chunk[:, c].tolist(), bps, subframe)
        bw.align()
        body = bw.getvalue()
        bw.write(_crc16(body), 16)
        out += bw.getvalue()
        frame_no += 1
    return bytes(out)
