"""VP9 keyframe uncompressed header — VP9 Bitstream Specification §6.2.

The uncompressed frame header carries the codec-authoritative
dimensions for WebM ``V_VP9`` tracks: frame marker, profile bits,
sync code ``0x49 0x83 0x42``, color config, and the 16-bit minus-one
frame/render sizes — all fixed-width reads, zero entropy tables, the
same honest tier as the H.264/HEVC SPS and AV1 sequence-header
parsers.  Inter-frame reconstruction (the compressed header's
boolean-coded probabilities and beyond) stays the documented
per-row boundary.

Entry point: :func:`parse_keyframe_header` over the first bytes of a
VP9 keyframe (a WebM SimpleBlock payload).  The container walker
(:mod:`.rawwebm`) calls it for the first keyframe of a ``V_VP9``
track.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawh264 import _Bits, _BitW

_SYNC = 0x498342

#: VP9 spec color_space enum (3 bits)
COLOR_SPACES = {
    0: "unknown",
    1: "bt601",
    2: "bt709",
    3: "smpte170",
    4: "smpte240",
    5: "bt2020",
    6: "reserved",
    7: "rgb",
}


def parse_keyframe_header(data: bytes) -> dict:
    """First bytes of a VP9 keyframe → profile/bit-depth/color/
    dimensions (render size falling back to the frame size)."""
    if len(data) < 10:
        raise ValueError("vp9: payload shorter than a keyframe header")
    b = _Bits(data)
    if b.u(2) != 2:
        raise ValueError("vp9: bad frame marker")
    profile = b.u(1) | (b.u(1) << 1)  # low bit first
    if profile == 3 and b.u(1):
        raise ValueError("vp9: reserved profile bit set")
    if b.u(1):  # show_existing_frame
        raise ValueError("vp9: show-existing frame carries no header")
    frame_type = b.u(1)
    show_frame = b.u(1)
    b.u(1)  # error_resilient_mode
    if frame_type != 0:
        raise ValueError(
            "vp9: not a keyframe (inter frames are the documented boundary)"
        )
    if b.u(24) != _SYNC:
        raise ValueError("vp9: bad keyframe sync code")
    # color_config (§6.2.2)
    bit_depth = 8
    if profile >= 2:
        bit_depth = 12 if b.u(1) else 10
    cs = b.u(3)
    if cs != 7:  # not CS_RGB
        color_range = b.u(1)
        if profile in (1, 3):
            ss_x, ss_y = b.u(1), b.u(1)
            if b.u(1):
                raise ValueError("vp9: reserved color bit set")
        else:
            ss_x = ss_y = 1  # profiles 0/2 are 4:2:0
    else:
        if profile in (0, 2):
            raise ValueError("vp9: RGB requires profile 1 or 3")
        color_range = 1
        ss_x = ss_y = 0
        if b.u(1):
            raise ValueError("vp9: reserved color bit set")
    width = b.u(16) + 1
    height = b.u(16) + 1
    render_w, render_h = width, height
    if b.u(1):  # render_and_frame_size_different
        render_w = b.u(16) + 1
        render_h = b.u(16) + 1
    return {
        "profile": profile,
        "bit_depth": bit_depth,
        "color_space": COLOR_SPACES[cs],
        "color_range": "full" if color_range else "studio",
        "subsampling": f"{ss_x}{ss_y}",
        "show_frame": bool(show_frame),
        "width": width,
        "height": height,
        "render_width": render_w,
        "render_height": render_h,
    }


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_keyframe_header(
    *,
    width: int,
    height: int,
    profile: int = 0,
    bit_depth: int = 8,
    color_space: int = 2,
    render: tuple[int, int] | None = None,
) -> bytes:
    """Encode a VP9 keyframe uncompressed header (plus a little filler
    standing in for the compressed data that would follow).  Uses the
    shared MSB-first writer without the RBSP stop bit — VP9 headers
    are plain zero-padded."""
    w = _BitW()
    w.u(2, 2)  # frame_marker
    w.u(profile & 1, 1)
    w.u(profile >> 1, 1)
    if profile == 3:
        w.u(0, 1)
    w.u(0, 1)  # show_existing_frame
    w.u(0, 1)  # frame_type = KEY
    w.u(1, 1)  # show_frame
    w.u(0, 1)  # error_resilient
    w.u(_SYNC, 24)
    if profile >= 2:
        w.u(1 if bit_depth == 12 else 0, 1)
    w.u(color_space, 3)
    if color_space != 7:
        w.u(0, 1)  # studio range
        if profile in (1, 3):
            w.u(0, 1)  # ss_x = 0 (4:4:4 family in profiles 1/3)
            w.u(0, 1)
            w.u(0, 1)
    else:
        w.u(0, 1)  # reserved
    w.u(width - 1, 16)
    w.u(height - 1, 16)
    if render is not None:
        w.u(1, 1)
        w.u(render[0] - 1, 16)
        w.u(render[1] - 1, 16)
    else:
        w.u(0, 1)
    return w.bytes(stop_bit=False) + b"\x00" * 8
