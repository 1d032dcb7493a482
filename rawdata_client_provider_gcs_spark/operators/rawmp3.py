"""MPEG audio (MP3/MP2/MP1) frame-level metadata — ISO/IEC 11172-3.

MP3 is the dominant compressed audio format in web crawls.  Full
Layer-III PCM decode needs ~2,500 empirical constants (the Annex-B
Huffman code tables and the 512-tap synthesis window) that cannot be
verified in this offline container — fabricating them would produce a
decoder that is silently wrong on every real file while fixture
roundtrips stay green, which is strictly worse than a loud boundary.
What a curation pipeline actually consumes from audio at 100 TB is
METADATA — duration, bitrate, sample rate, channel layout, VBR-ness —
and that layer is exactly specified by small tables this module knows
verbatim:

- the full frame-header grammar (sync, MPEG 1/2/2.5 versions, layers
  I-III, CRC flag, bitrate/sample-rate indices, padding, channel
  mode) with the version×layer bitrate and sample-rate tables;
- frame-length arithmetic (``spf/8 * bitrate / rate + padding``, ×4
  slots for Layer I) and the samples-per-frame table (384 / 1152 /
  576 for MPEG-2 Layer III);
- container furniture: ID3v2 (syncsafe size + footer flag) skipped up
  front, trailing ID3v1 ``TAG`` excluded from the frame walk;
- Xing/Info and VBRI headers (first-frame, after the side info whose
  size is version×mode dependent) for VBR frame counts;
- a bounded resync scan (real crawl MP3s carry junk between frames),
  with the junk budget capped so hostile bytes cost linear time.

PCM decode for ``audio/mpeg`` remains the documented loud boundary:
:func:`decode_mp3_pcm` raises :class:`~.rawavi.UnsupportedCodecError`.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); audio
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError

#: kbps by [version_group][layer][index]; index 0 is "free format"
#: (unsupported here), 15 is forbidden.  version_group 0 = MPEG-1,
#: 1 = MPEG-2 / MPEG-2.5 (which share tables).
_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

#: Hz by [version][index]; version key: 3 = MPEG-1, 2 = MPEG-2,
#: 0 = MPEG-2.5 (the raw 2-bit header field values; 1 is reserved)
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}

_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _samples_per_frame(version_bits: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version_bits == 3 else 576  # Layer III


def parse_frame_header(b: bytes, pos: int) -> dict | None:
    """Decode the 4-byte header at ``pos``; None when it isn't one."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 3->I, 2->II, 1->III
    crc = not ((h >> 16) & 1)  # protection_bit == 0 means CRC present
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / forbidden
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    vgroup = 0 if version_bits == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _SAMPLE_RATES[version_bits][sr_idx]
    spf = _samples_per_frame(version_bits, layer)
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        frame_len = spf // 8 * bitrate // rate + padding
    version = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[version_bits]
    return {
        "version": version,
        "version_bits": version_bits,
        "layer": layer,
        "crc": crc,
        "bitrate": bitrate,
        "sample_rate": rate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODES[mode],
        "channels": 1 if mode == 3 else 2,
        "samples_per_frame": spf,
        "frame_len": frame_len,
    }


def _syncsafe32(b: bytes, pos: int) -> int:
    """ID3's 7-bit-per-byte big-endian integer."""
    return (
        ((b[pos] & 0x7F) << 21)
        | ((b[pos + 1] & 0x7F) << 14)
        | ((b[pos + 2] & 0x7F) << 7)
        | (b[pos + 3] & 0x7F)
    )


def _to_syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _skip_id3v2(b: bytes) -> int:
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    total = 10 + _syncsafe32(b, 6) + (10 if b[5] & 0x10 else 0)  # footer
    return min(total, len(b))


def _xing_offset(hdr: dict) -> int:
    """Side-info size after the (4+CRC) header bytes, Layer III."""
    if hdr["version_bits"] == 3:  # MPEG-1
        side = 17 if hdr["channels"] == 1 else 32
    else:
        side = 9 if hdr["channels"] == 1 else 17
    return 4 + (2 if hdr["crc"] else 0) + side


#: junk tolerated between frames before the walk gives up (real crawl
#: files carry tag remnants and truncated garbage; a pure-noise payload
#: must still fail in bounded time)
MAX_RESYNC_BYTES = 1 << 16


def parse_mp3(data: bytes) -> dict:
    """Walk every MPEG audio frame; return stream-level metadata.

    Raises ``ValueError`` when no coherent frame sequence exists.
    """
    if len(data) < 4:
        raise ValueError("mp3: payload shorter than one frame header")
    start = _skip_id3v2(data)
    end = len(data)
    has_id3v1 = end >= 128 and data[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128

    pos = start
    n_frames = 0
    junk = 0
    resyncs = 0
    bitrate_sum = 0
    first = None
    xing_frames = None
    vbr_tag = None
    while pos + 4 <= end:
        hdr = parse_frame_header(data, pos)
        if hdr is None or (
            first is not None
            and (
                hdr["sample_rate"] != first["sample_rate"]
                or hdr["layer"] != first["layer"]
            )
        ):
            # resync: a header must agree with the stream's rate/layer
            junk += 1
            if junk > MAX_RESYNC_BYTES:
                break
            if junk == 1:
                # a junk run begins: count the resync whether it sits
                # before the first confirmed frame (corrupt head) or
                # between frames — 'resyncs' reports every recovery
                resyncs += 1
            pos += 1
            continue
        if first is None:
            # confirm with a coherent SECOND header before locking the
            # stream parameters: a stray 0xFFEx word in leading junk
            # would otherwise poison rate/layer for the whole walk
            nxt = parse_frame_header(data, pos + hdr["frame_len"])
            confirmed = pos + hdr["frame_len"] >= end or (
                nxt is not None
                and nxt["sample_rate"] == hdr["sample_rate"]
                and nxt["layer"] == hdr["layer"]
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
        if n_frames == 0:
            # Xing/Info or VBRI in the first frame
            off = pos + _xing_offset(hdr)
            tag = data[off : off + 4]
            if tag in (b"Xing", b"Info") and off + 8 <= end:
                vbr_tag = tag.decode()
                flags = int.from_bytes(data[off + 4 : off + 8], "big")
                if flags & 1 and off + 12 <= end:
                    xing_frames = int.from_bytes(data[off + 8 : off + 12], "big")
            elif data[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
                vbr_tag = "VBRI"
                o = pos + 4 + 32
                if o + 18 <= end:
                    xing_frames = int.from_bytes(data[o + 14 : o + 18], "big")
        n_frames += 1
        bitrate_sum += hdr["bitrate"]
        pos += hdr["frame_len"]
    if first is None or n_frames == 0:
        raise ValueError("mp3: no valid MPEG audio frame found")

    spf = first["samples_per_frame"]
    rate = first["sample_rate"]
    # a Xing/VBRI frame count wins (the walk may be cut by truncation)
    eff_frames = xing_frames if xing_frames else n_frames
    duration_ms = eff_frames * spf * 1000 // rate
    avg_bitrate = bitrate_sum // n_frames
    vbr = vbr_tag == "Xing" or vbr_tag == "VBRI" or (
        bitrate_sum != first["bitrate"] * n_frames
    )
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": rate,
        "channel_mode": first["channel_mode"],
        "channels": first["channels"],
        "bitrate": avg_bitrate,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "vbr": bool(vbr),
        "vbr_tag": vbr_tag,
        "has_id3v2": start > 0,
        "has_id3v1": has_id3v1,
        "resyncs": resyncs,
    }


def decode_mp3_pcm(data: bytes):
    """The documented loud boundary: Layer-III PCM synthesis needs the
    Annex-B Huffman tables and the synthesis window, which cannot be
    transcribed verifiably offline (see the module docstring)."""
    raise UnsupportedCodecError(
        "MPEG Layer III PCM decode is not implemented; frame-level "
        "metadata is available via parse_mp3"
    )


def sniff_mp3(data: bytes) -> bool:
    """True when the payload starts with ID3v2 or a valid frame header
    followed by a second coherent header (guards against random 0xFF)."""
    start = _skip_id3v2(data)
    if data[:3] == b"ID3" and start >= len(data):
        return False
    h0 = parse_frame_header(data, start)
    if h0 is None:
        return False
    h1 = parse_frame_header(data, start + h0["frame_len"])
    if h1 is None:
        # a single-frame file is legal; accept if it ends at the frame
        return start + h0["frame_len"] >= len(data) - 128
    return (
        h1["sample_rate"] == h0["sample_rate"] and h1["layer"] == h0["layer"]
    )


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def build_mp3(
    n_frames: int,
    *,
    version_bits: int = 3,
    layer: int = 3,
    bitrate_index: int = 9,
    samplerate_index: int = 0,
    channel_mode: int = 3,
    pad_every: int = 0,
    crc: bool = False,
    xing: bool = False,
    id3v2_size: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Write a syntactically valid MPEG audio stream with zeroed main
    data (metadata parsing never reads past the side info, so zeroed
    payloads are fine fixtures; they are NOT decodable audio)."""
    out = bytearray()
    if id3v2_size:
        out += b"ID3" + bytes([4, 0, 0]) + _to_syncsafe(id3v2_size)
        out += b"\x00" * id3v2_size
    layer_bits = 4 - layer
    for i in range(n_frames):
        padding = 1 if pad_every and i % pad_every == 0 else 0
        h = (
            (0x7FF << 21)
            | (version_bits << 19)
            | (layer_bits << 17)
            | ((0 if crc else 1) << 16)
            | (bitrate_index << 12)
            | (samplerate_index << 10)
            | (padding << 9)
            | (channel_mode << 6)
        )
        hdr_bytes = h.to_bytes(4, "big")
        hdr = parse_frame_header(hdr_bytes, 0)
        frame = bytearray(hdr["frame_len"])
        frame[:4] = hdr_bytes
        if xing and i == 0:
            off = _xing_offset(hdr)
            frame[off : off + 4] = b"Xing"
            frame[off + 4 : off + 8] = (1).to_bytes(4, "big")  # frames flag
            frame[off + 8 : off + 12] = n_frames.to_bytes(4, "big")
        out += frame
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


# ---------------------------------------------------------------------------
# ID3 tag fields (v1, v1.1, v2.2/2.3/2.4 text frames)
# ---------------------------------------------------------------------------

_V2_TEXT_IDS = {
    b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
    b"TYER": "year", b"TDRC": "year", b"TRCK": "track", b"TCON": "genre",
    # v2.2 3-byte ids
    b"TT2": "title", b"TP1": "artist", b"TAL": "album",
    b"TYE": "year", b"TRK": "track", b"TCO": "genre",
}

_TEXT_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _decode_text_frame(body: bytes) -> str:
    if not body:
        return ""
    enc = _TEXT_ENCODINGS.get(body[0], "latin-1")
    return body[1:].decode(enc, "replace").strip("\x00").strip()


def id3_tags(data: bytes) -> dict:
    """Extract the common tag fields: ``{"title", "artist", "album",
    "year", "track", "genre", "source"}`` — v2 frames win over the v1
    trailer when both exist.  Lenient by design: malformed tag
    structure stops the walk and returns what was collected (tags are
    curation metadata, never worth failing a row over)."""
    out: dict = {}
    # --- ID3v1 / v1.1 trailer
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        t = data[-128:]

        def fld(a: int, b: int) -> str:
            return t[a:b].split(b"\x00")[0].decode("latin-1", "replace").strip()

        out = {
            "title": fld(3, 33),
            "artist": fld(33, 63),
            "album": fld(63, 93),
            "year": fld(93, 97),
            "genre": str(t[127]),
            "source": "id3v1",
        }
        if t[125] == 0 and t[126] != 0:  # v1.1 track convention
            out["track"] = str(t[126])
    # --- ID3v2 header
    if data[:3] != b"ID3" or len(data) < 10:
        return out
    ver = data[3]
    flags = data[5]
    size = _syncsafe32(data, 6)
    body = data[10 : min(10 + size, len(data))]
    if flags & 0x80 and ver in (2, 3):
        # v2.2/2.3 unsynchronisation applies to the WHOLE tag body:
        # every 0xFF 0x00 pair was an escaped 0xFF — reverse it before
        # the frame walk (sizes in the header count the escaped form)
        body = body.replace(b"\xff\x00", b"\xff")
    pos, end = 0, len(body)
    v2: dict = {}
    if ver in (3, 4) and flags & 0x40 and pos + 4 <= end:
        ext = int.from_bytes(body[pos : pos + 4], "big")
        if ver == 4:  # syncsafe, includes its own four bytes
            pos += _syncsafe32(body, pos)
        else:  # v2.3: size excludes the size field
            pos += 4 + ext
    hdr_len, id_len = (6, 3) if ver == 2 else (10, 4)
    while pos + hdr_len <= end:
        fid = body[pos : pos + id_len]
        if fid.rstrip(b"\x00") == b"":
            break  # padding
        if ver == 2:
            fsize = int.from_bytes(body[pos + 3 : pos + 6], "big")
        elif ver == 4:  # syncsafe frame sizes
            fsize = _syncsafe32(body, pos + 4)
        else:
            fsize = int.from_bytes(body[pos + 4 : pos + 8], "big")
        body_start = pos + hdr_len
        if fsize < 0 or body_start + fsize > end:
            break  # lying size: keep what we have
        key = _V2_TEXT_IDS.get(fid)
        if key is not None:
            fbody = body[body_start : body_start + fsize]
            if ver == 4 and hdr_len == 10 and (
                body[pos + 9] & 0x02 or flags & 0x80
            ):
                # v2.4 moved unsynchronisation to a PER-FRAME format
                # flag; the frame's syncsafe size counts escaped bytes.
                # Spec-legal writers may instead assert the TAG-level
                # flag (header 0x80), which declares ALL frames
                # unsynchronised even without per-frame 0x02 flags —
                # honor both forms (id3v2.4.0-structure §3.1).
                fbody = fbody.replace(b"\xff\x00", b"\xff")
            v2[key] = _decode_text_frame(fbody)
        pos = body_start + fsize
    if v2:
        v2["source"] = "id3v2.%d" % ver
        out = {**out, **v2}
    return out


def build_id3v2(
    tags: dict,
    *,
    version: int = 3,
    padding: int = 32,
    encoding: int = 3,
    unsync: bool = False,
) -> bytes:
    """Fixture writer: an ID3v2.2/2.3/2.4 header with text frames.

    ``encoding`` is the ID3 text-encoding byte (0 latin-1, 1 utf-16
    with BOM, 3 utf-8; v2.2 predates utf-8 so it clamps to 0/1).
    ``unsync=True`` applies unsynchronisation — whole-tag for
    v2.2/2.3 (header flag 0x80), per-frame for v2.4 (format flag
    0x02) — escaping EVERY 0xFF as 0xFF 0x00 (always lossless; the
    spec mandates escaping only some successors but permits all)."""
    if version == 2:
        name_by_key = {"title": b"TT2", "artist": b"TP1", "album": b"TAL",
                       "year": b"TYE", "track": b"TRK", "genre": b"TCO"}
        encoding = min(encoding, 1)
    else:
        name_by_key = {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB",
                       "year": b"TYER" if version == 3 else b"TDRC",
                       "track": b"TRCK", "genre": b"TCON"}
    codec = {0: "latin-1", 1: "utf-16", 3: "utf-8"}[encoding]
    frames = bytearray()
    for key, val in tags.items():
        fid = name_by_key[key]
        body = bytes([encoding]) + str(val).encode(codec)
        if version == 2:
            frames += fid + len(body).to_bytes(3, "big") + body
        elif version == 4:
            fflags = 0
            if unsync:
                body = body.replace(b"\xff", b"\xff\x00")
                fflags = 0x02
            frames += fid + _to_syncsafe(len(body)) + bytes([0, fflags]) + body
        else:
            frames += fid + len(body).to_bytes(4, "big") + b"\x00\x00" + body
    frames += b"\x00" * padding
    hdr_flags = 0
    if unsync and version in (2, 3):
        frames = bytearray(bytes(frames).replace(b"\xff", b"\xff\x00"))
        hdr_flags = 0x80
    hdr = b"ID3" + bytes([version, 0, hdr_flags]) + _to_syncsafe(len(frames))
    return hdr + bytes(frames)
