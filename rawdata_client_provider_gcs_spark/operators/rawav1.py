"""AV1 sequence-header parsing — AV1 Bitstream & Decoding Process
Specification §5.5 (sequence_header_obu) and the ISOBMFF ``av1C``
AV1CodecConfigurationRecord.

The sequence header is the AV1 analogue of H.264's SPS: pure
fixed-width/uvlc bit grammar, no entropy tables, carrying the
codec-AUTHORITATIVE profile/level/bit-depth and frame dimensions.  For
AVIF curation this cross-checks the container's ``ispe`` (which can
lie; the sequence header is what a decoder obeys); for AV1-in-ISOBMFF
video it is the only dimension source before slice decode — which
stays entirely out of scope.

Both header shapes are handled: the ``reduced_still_picture_header``
form AVIF writers emit, and the full form with timing/decoder-model/
operating-point blocks that video configs use.

Hostile input: bit-reader exhaustion, bad marker/version bytes, and
dimension bombs raise ``ValueError`` for per-row capture.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawh264 import _Bits

PROFILE_NAMES = {0: "Main", 1: "High", 2: "Professional"}


def _uvlc(b: _Bits) -> int:
    zeros = 0
    while b.u(1) == 0:
        zeros += 1
        if zeros > 31:
            raise ValueError("av1: uvlc run over 31 zeros")
    if zeros == 0:
        return 0
    return (1 << zeros) - 1 + b.u(zeros)


def parse_seq_header_obu(data: bytes) -> dict:
    """One sequence_header_obu (with its OBU header) → profile/level/
    depth/monochrome/dimensions."""
    if not data:
        raise ValueError("av1: empty OBU")
    b = _Bits(data)
    if b.u(1) != 0:
        raise ValueError("av1: forbidden bit set in OBU header")
    obu_type = b.u(4)
    if obu_type != 1:
        raise ValueError(f"av1: OBU type {obu_type} is not sequence header")
    ext = b.u(1)
    has_size = b.u(1)
    b.u(1)  # reserved
    if ext:
        b.u(8)  # temporal/spatial ids
    if has_size:
        # leb128 size (≤8 bytes per spec); value itself unused — the
        # bit reader's own bounds are the guard
        for _ in range(8):
            if b.u(1) == 0:
                b.u(7)
                break
            b.u(7)
    profile = b.u(3)
    if profile > 2:
        raise ValueError(f"av1: seq_profile {profile} invalid")
    b.u(1)  # still_picture
    reduced = b.u(1)
    if reduced:
        level = b.u(5)
    else:
        if b.u(1):  # timing_info_present
            b.u(32)  # num_units_in_display_tick
            b.u(32)  # time_scale
            if b.u(1):  # equal_picture_interval
                _uvlc(b)  # num_ticks_per_picture_minus_1
            dmi_present = b.u(1)  # decoder_model_info_present
        else:
            dmi_present = 0
        buffer_delay_len = 0
        if dmi_present:
            buffer_delay_len = b.u(5) + 1
            b.u(32)  # num_units_in_decoding_tick
            b.u(5)   # buffer_removal_time_length_minus_1
            b.u(5)   # frame_presentation_time_length_minus_1
        idd_present = b.u(1)  # initial_display_delay_present
        n_ops = b.u(5) + 1
        level = 0
        for i in range(n_ops):
            b.u(12)  # operating_point_idc
            lv = b.u(5)
            if i == 0:
                level = lv
            if lv > 7:
                b.u(1)  # seq_tier
            if dmi_present and b.u(1):  # decoder_model_present_for_op
                b.u(buffer_delay_len)  # decoder_buffer_delay
                b.u(buffer_delay_len)  # encoder_buffer_delay
                b.u(1)                  # low_delay_mode
            if idd_present and b.u(1):
                b.u(4)  # initial_display_delay_minus_1
    wbits = b.u(4) + 1
    hbits = b.u(4) + 1
    width = b.u(wbits) + 1
    height = b.u(hbits) + 1
    if width > (1 << 16) or height > (1 << 16):
        raise ValueError("av1: frame dimensions over the 16-bit cap")
    return {
        "profile": PROFILE_NAMES.get(profile, str(profile)),
        "profile_idx": profile,
        "level_idx": level,
        "reduced_header": bool(reduced),
        "width": width,
        "height": height,
    }


def parse_av1c(record: bytes) -> dict:
    """The ``av1C`` AV1CodecConfigurationRecord: fixed 4-byte prefix
    (marker/version, profile+level, tier/depth/chroma flags) then the
    config OBUs, whose sequence header carries the dimensions."""
    if len(record) < 4:
        raise ValueError("av1: av1C record shorter than its fields")
    if record[0] != 0x81:
        raise ValueError(
            f"av1: av1C marker/version byte 0x{record[0]:02x} != 0x81"
        )
    out = {
        "profile_idx": record[1] >> 5,
        "level_idx": record[1] & 0x1F,
        "high_bitdepth": bool(record[2] & 0x40),
        "twelve_bit": bool(record[2] & 0x20),
        "monochrome": bool(record[2] & 0x10),
    }
    out["bit_depth"] = (
        12 if out["twelve_bit"] else 10 if out["high_bitdepth"] else 8
    )
    if len(record) > 4:
        seq = parse_seq_header_obu(record[4:])
        # the OBU is authoritative; the prefix bytes are a copy
        out.update(
            {
                "profile": seq["profile"],
                "width": seq["width"],
                "height": seq["height"],
                "reduced_header": seq["reduced_header"],
            }
        )
    else:
        out["profile"] = PROFILE_NAMES.get(out["profile_idx"], "?")
    return out


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_seq_header_obu(
    *,
    width: int,
    height: int,
    profile: int = 0,
    level: int = 8,
    reduced: bool = True,
) -> bytes:
    """Encode a sequence_header_obu (no size field) for fixtures."""
    from .rawh264 import _BitW

    w = _BitW()
    w.u(0, 1)  # forbidden
    w.u(1, 4)  # type: sequence header
    w.u(0, 1)  # no extension
    w.u(0, 1)  # no size field
    w.u(0, 1)  # reserved
    w.u(profile, 3)
    w.u(1, 1)  # still_picture
    w.u(1 if reduced else 0, 1)
    if reduced:
        w.u(level, 5)
    else:
        w.u(0, 1)  # no timing info
        w.u(0, 1)  # no initial display delay
        w.u(0, 5)  # one operating point
        w.u(0, 12)
        w.u(level, 5)
        if level > 7:
            w.u(0, 1)  # seq_tier (Main)
    wbits = max((width - 1).bit_length(), 1)
    hbits = max((height - 1).bit_length(), 1)
    w.u(wbits - 1, 4)
    w.u(hbits - 1, 4)
    w.u(width - 1, wbits)
    w.u(height - 1, hbits)
    # _BitW closes with an RBSP stop bit; AV1's trailing_bits are the
    # same shape (a 1 then zero padding), so reuse is exact
    return w.bytes()


def build_av1c(
    *,
    width: int,
    height: int,
    profile: int = 0,
    level: int = 8,
    high_bitdepth: bool = False,
    monochrome: bool = False,
    reduced: bool = True,
) -> bytes:
    flags = (
        (0x40 if high_bitdepth else 0)
        | (0x10 if monochrome else 0)
    )
    return (
        bytes([0x81, (profile << 5) | level, flags, 0])
        + build_seq_header_obu(
            width=width, height=height, profile=profile, level=level,
            reduced=reduced,
        )
    )
