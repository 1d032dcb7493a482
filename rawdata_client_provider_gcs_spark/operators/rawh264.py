"""H.264/AVC sequence parameter set parsing — ITU-T H.264 §7.3.2.1.

The SPS is the one NAL unit a curation pipeline needs from an H.264
stream: profile/level and the TRUE coded dimensions (macroblock counts
minus the frame-cropping rectangle in chroma-dependent crop units).
It is pure Exp-Golomb bit grammar — no entropy tables — so parsing it
is exactly specified and offline-verifiable, unlike slice decode
(which stays out of scope entirely).

Entry points: :func:`parse_sps` (one RBSP), :func:`sps_from_avcc`
(the ISO-BMFF ``avcC`` decoder-configuration record carried in
``stsd``), :func:`find_sps_annexb` (byte-stream format with
``00 00 01`` start codes, as carried in MPEG-TS PES payloads).
Emulation-prevention bytes (``00 00 03``) are unescaped first.

Hostile input: bit-reader exhaustion, absurd Exp-Golomb values
(leading-zero run over 31), scaling-list overruns, and dimension
bombs (>2^16 MBs per axis) raise ``ValueError``.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

#: profiles whose SPS carries the chroma/bit-depth block (§7.3.2.1.1)
_HIGH_PROFILES = {
    100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135,
}

PROFILE_NAMES = {
    66: "Baseline", 77: "Main", 88: "Extended", 100: "High",
    110: "High 10", 122: "High 4:2:2", 244: "High 4:4:4",
}


class _Bits:
    """MSB-first bit reader over an unescaped RBSP."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("h264: SPS bit reader exhausted")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: Exp-Golomb run over 31 zeros")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape_rbsp(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00."""
    out = bytearray()
    i = 0
    n = len(nal)
    while i < n:
        if i + 2 < n and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def _skip_scaling_list(b: _Bits, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + b.se() + 256) % 256
        last = last if nxt == 0 else nxt


def parse_sps(nal: bytes) -> dict:
    """Parse one SPS NAL unit (with or without its 1-byte header) and
    return profile/level/chroma/dimensions."""
    if not nal:
        raise ValueError("h264: empty SPS")
    if (nal[0] & 0x1F) == 7:  # NAL header present
        nal = nal[1:]
    b = _Bits(_unescape_rbsp(nal))
    profile = b.u(8)
    b.u(8)  # constraint flags + reserved
    level = b.u(8)
    b.ue()  # seq_parameter_set_id
    chroma = 1  # 4:2:0 default for non-high profiles
    if profile in _HIGH_PROFILES:
        chroma = b.ue()
        if chroma > 3:
            raise ValueError(f"h264: chroma_format_idc {chroma} invalid")
        if chroma == 3:
            b.u(1)  # separate_colour_plane_flag
        b.ue()  # bit_depth_luma_minus8
        b.ue()  # bit_depth_chroma_minus8
        b.u(1)  # qpprime_y_zero_transform_bypass
        if b.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if b.u(1):
                    _skip_scaling_list(b, 16 if i < 6 else 64)
    b.ue()  # log2_max_frame_num_minus4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()
    elif poc_type == 1:
        b.u(1)
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.u(1)  # gaps_in_frame_num_value_allowed
    width_mbs = b.ue() + 1
    height_units = b.ue() + 1
    if width_mbs > (1 << 16) or height_units > (1 << 16):
        raise ValueError("h264: macroblock count over the dimension cap")
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)  # mb_adaptive_frame_field
    b.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if b.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = b.ue(), b.ue(), b.ue(), b.ue()
    # crop units per §7.4.2.1.1: chroma-format-dependent
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma]
    unit_x = 1 if chroma == 0 else sub_w
    unit_y = (1 if chroma == 0 else sub_h) * (2 - frame_mbs_only)
    width = width_mbs * 16 - (crop_l + crop_r) * unit_x
    height = height_units * 16 * (2 - frame_mbs_only) - (
        crop_t + crop_b
    ) * unit_y
    if width <= 0 or height <= 0:
        raise ValueError("h264: cropping rectangle larger than the frame")
    return {
        "profile_idc": profile,
        "profile": PROFILE_NAMES.get(profile, f"profile-{profile}"),
        "level": level / 10.0,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
        "interlaced": not frame_mbs_only,
    }


def sps_from_avcc(avcc: bytes) -> dict:
    """SPS out of an ISO-BMFF ``avcC`` AVCDecoderConfigurationRecord
    (ISO 14496-15 §5.3.3.1): the first listed SPS decides."""
    if len(avcc) < 8 or avcc[0] != 1:
        raise ValueError("h264: not an avcC configuration record")
    n_sps = avcc[5] & 0x1F
    if n_sps == 0:
        raise ValueError("h264: avcC carries no SPS")
    ln = int.from_bytes(avcc[6:8], "big")
    if 8 + ln > len(avcc):
        raise ValueError("h264: avcC SPS length over record end")
    return parse_sps(avcc[8 : 8 + ln])


def find_sps_annexb(data: bytes, max_scan: int = 1 << 20) -> dict:
    """First SPS in an Annex-B byte stream (TS PES payloads): scan
    bounded ``00 00 01`` start codes for NAL type 7."""
    end = min(len(data), max_scan)
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i, end)
        if j < 0:
            raise ValueError("h264: no SPS start code in the scanned span")
        start = j + 3
        if start < end and (data[start] & 0x1F) == 7:
            k = data.find(b"\x00\x00\x01", start, end)
            nal_end = k if k > 0 else end
            if data[nal_end - 1 : nal_end] == b"\x00":  # 4-byte next code
                nal_end -= 1
            return parse_sps(data[start:nal_end])
        i = start


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int):
        k = val + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self, stop_bit: bool = True) -> bytes:
        """Byte-pack: with the RBSP stop bit (H.264/HEVC NAL payloads)
        or plain zero-padded (VP9 headers, where frame data follows)."""
        bits = self.bits + ([1] if stop_bit else [])
        bits += [0] * ((8 - len(bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i : i + 8])), 2))
        return bytes(out)


def build_sps(
    *,
    width: int,
    height: int,
    profile: int = 66,
    level: int = 30,
    chroma: int = 1,
) -> bytes:
    """Encode an SPS NAL (with header byte) whose cropped dimensions
    are exactly ``width × height`` (4:2:0 crop units; progressive)."""
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma]
    unit_x = 1 if chroma == 0 else sub_w
    unit_y = 1 if chroma == 0 else sub_h  # progressive (frame_mbs_only)
    if (16 - width % 16) % 16 % unit_x or (16 - height % 16) % 16 % unit_y:
        raise ValueError(
            "sps fixture: padding not expressible in this chroma's "
            "crop units"
        )
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // unit_x
    crop_b = (h_mbs * 16 - height) // unit_y
    w = _BitW()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)  # sps id
    if profile in _HIGH_PROFILES:
        w.ue(chroma)
        if chroma == 3:
            w.u(0, 1)
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(2)  # poc type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    rbsp = w.bytes()
    # re-escape: insert emulation prevention where 00 00 0x would form
    out = bytearray([0x67])  # nal_ref_idc=3, type=7
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def build_avcc(sps: bytes) -> bytes:
    """Wrap one SPS NAL in an avcC configuration record."""
    return (
        bytes([1, sps[1] if len(sps) > 1 else 66, 0, 30, 0xFF, 0xE1])
        + len(sps).to_bytes(2, "big")
        + sps
        + bytes([0])  # no PPS
    )
