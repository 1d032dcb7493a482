"""HEVC/H.265 sequence parameter set parsing — ITU-T H.265 §7.3.2.2.

The HEVC SPS carries the codec-authoritative dimensions for ``hvc1``
tracks (fMP4), HEIC photos' ``hvcC`` records, and MPEG-TS stream type
0x24 — the last dimension gap across the four web video codecs
(H.264/VP8/AV1 handled elsewhere).  Like its H.264 cousin it is pure
Exp-Golomb/fixed-width grammar with no entropy tables: the
profile_tier_level block, luma sample dimensions, and the
chroma-scaled conformance window are all this module reads; slice
decode stays entirely out of scope.

Entry points: :func:`parse_sps` (one NAL, with or without its 2-byte
header), :func:`sps_from_hvcc` (the ISO 14496-15 ``hvcC``
HEVCDecoderConfigurationRecord's NAL arrays, type 33).  The RBSP
unescape and bit reader are shared with :mod:`.rawh264`.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawh264 import _Bits, _BitW, _unescape_rbsp

PROFILE_NAMES = {1: "Main", 2: "Main 10", 3: "Main Still Picture"}

#: (SubWidthC, SubHeightC) by chroma_format_idc — conformance window
#: offsets count in these units
_SUB_WH = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}


def _profile_tier_level(b: _Bits, max_sub_layers_minus1: int) -> dict:
    b.u(2)  # general_profile_space
    b.u(1)  # general_tier_flag
    profile = b.u(5)
    b.u(32)  # compatibility flags
    b.u(4)   # progressive/interlaced/non_packed/frame_only
    b.u(43)  # reserved zero bits
    b.u(1)   # inbld / reserved
    level = b.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(b.u(1))
        sub_level.append(b.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            b.u(2)  # reserved alignment
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            b.u(88)  # sub-layer profile block (same 88-bit shape)
        if sub_level[i]:
            b.u(8)
    return {"profile_idc": profile, "level_idc": level}


def parse_sps(nal: bytes) -> dict:
    """One HEVC SPS NAL → profile/level/chroma/dimensions (the
    conformance window subtracted in chroma units)."""
    if len(nal) < 2:
        raise ValueError("hevc: SPS shorter than its NAL header")
    if (nal[0] >> 1) & 0x3F == 33:  # NAL header present (2 bytes)
        nal = nal[2:]
    b = _Bits(_unescape_rbsp(nal))
    b.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = b.u(3)
    if max_sub_layers_minus1 > 6:
        raise ValueError("hevc: sps_max_sub_layers over 7")
    b.u(1)  # temporal_id_nesting
    ptl = _profile_tier_level(b, max_sub_layers_minus1)
    b.ue()  # sps_seq_parameter_set_id
    chroma = b.ue()
    if chroma > 3:
        raise ValueError(f"hevc: chroma_format_idc {chroma} invalid")
    if chroma == 3:
        b.u(1)  # separate_colour_plane_flag
    width = b.ue()
    height = b.ue()
    if width == 0 or height == 0 or width > (1 << 16) or height > (1 << 16):
        raise ValueError("hevc: luma dimensions outside the sane range")
    if b.u(1):  # conformance_window_flag
        left, right, top, bottom = b.ue(), b.ue(), b.ue(), b.ue()
        sub_w, sub_h = _SUB_WH[chroma]
        width -= (left + right) * sub_w
        height -= (top + bottom) * sub_h
        if width <= 0 or height <= 0:
            raise ValueError("hevc: conformance window larger than frame")
    return {
        "profile_idc": ptl["profile_idc"],
        "profile": PROFILE_NAMES.get(
            ptl["profile_idc"], f"profile-{ptl['profile_idc']}"
        ),
        "level": ptl["level_idc"] / 30.0,
        "chroma_format_idc": chroma,
        "width": width,
        "height": height,
    }


def sps_from_hvcc(hvcc: bytes) -> dict:
    """SPS out of an ISO 14496-15 ``hvcC``
    HEVCDecoderConfigurationRecord: skip the 22-byte fixed prefix,
    walk the NAL arrays for type 33."""
    if len(hvcc) < 23 or hvcc[0] != 1:
        raise ValueError("hevc: not an hvcC configuration record")
    n_arrays = hvcc[22]
    pos = 23
    for _ in range(n_arrays):
        if pos + 3 > len(hvcc):
            raise ValueError("hevc: hvcC NAL array truncated")
        nal_type = hvcc[pos] & 0x3F
        count = int.from_bytes(hvcc[pos + 1 : pos + 3], "big")
        pos += 3
        for _ in range(count):
            if pos + 2 > len(hvcc):
                raise ValueError("hevc: hvcC NAL unit truncated")
            ln = int.from_bytes(hvcc[pos : pos + 2], "big")
            pos += 2
            if pos + ln > len(hvcc):
                raise ValueError("hevc: hvcC NAL unit over record end")
            if nal_type == 33:
                return parse_sps(hvcc[pos : pos + ln])
            pos += ln
    raise ValueError("hevc: hvcC carries no SPS")


def find_sps_annexb(data: bytes, max_scan: int = 1 << 20) -> dict:
    """First HEVC SPS in an Annex-B byte stream (TS stream type 0x24):
    bounded ``00 00 01`` scan for NAL type 33 (2-byte NAL headers)."""
    end = min(len(data), max_scan)
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i, end)
        if j < 0:
            raise ValueError("hevc: no SPS start code in the scanned span")
        start = j + 3
        if start < end and (data[start] >> 1) & 0x3F == 33:
            k = data.find(b"\x00\x00\x01", start, end)
            nal_end = k if k > 0 else end
            if data[nal_end - 1 : nal_end] == b"\x00":
                nal_end -= 1
            return parse_sps(data[start:nal_end])
        i = start


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_sps(
    *,
    width: int,
    height: int,
    profile: int = 1,
    level: int = 120,
    chroma: int = 1,
) -> bytes:
    """Encode an HEVC SPS NAL (with its 2-byte header) whose cropped
    dimensions are exactly ``width × height``."""
    # luma dims must be multiples of the minimum CB size (8); pad and
    # crop back through the conformance window.  Window offsets count
    # in chroma units, so an odd crop is INEXPRESSIBLE in 4:2:0/4:2:2
    # (real encoders use even dims there) — the fixture falls back to
    # 4:4:4, whose unit is 1, for such dimensions
    luma_w = (width + 7) // 8 * 8
    luma_h = (height + 7) // 8 * 8
    sub_w, sub_h = _SUB_WH[chroma]
    if (luma_w - width) % sub_w or (luma_h - height) % sub_h:
        chroma = 3
        sub_w, sub_h = _SUB_WH[chroma]
    w = _BitW()
    w.u(0, 4)  # vps id
    w.u(0, 3)  # max_sub_layers_minus1
    w.u(1, 1)  # temporal_id_nesting
    # profile_tier_level, zero sub-layers
    w.u(0, 2)
    w.u(0, 1)
    w.u(profile, 5)
    w.u(0, 32)
    w.u(0b1000, 4)  # progressive_source
    w.u(0, 43)
    w.u(0, 1)
    w.u(level, 8)
    w.ue(0)  # sps id
    w.ue(chroma)
    if chroma == 3:
        w.u(0, 1)
    w.ue(luma_w)
    w.ue(luma_h)
    if luma_w != width or luma_h != height:
        w.u(1, 1)  # conformance window
        w.ue(0)
        w.ue((luma_w - width) // sub_w)
        w.ue(0)
        w.ue((luma_h - height) // sub_h)
    else:
        w.u(0, 1)
    rbsp = w.bytes()
    # NAL header: forbidden 0, type 33, layer 0, tid+1 = 1; re-escape
    out = bytearray([33 << 1, 1])
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def build_hvcc(sps: bytes) -> bytes:
    """Wrap one SPS NAL in an hvcC configuration record (fixed prefix
    zero-filled except version; one type-33 array)."""
    return (
        bytes([1]) + bytes(21) + bytes([1])   # version, prefix, 1 array
        + bytes([33]) + (1).to_bytes(2, "big")
        + len(sps).to_bytes(2, "big") + sps
    )
