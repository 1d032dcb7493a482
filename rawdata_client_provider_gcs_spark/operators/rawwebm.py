"""Matroska / WebM container metadata — the EBML structure (RFC 8794)
plus the Matroska element IDs a curation pipeline needs.

Same honest tier as :mod:`.rawmp3` / :mod:`.rawogg` / :mod:`.rawmp4`:
the CONTAINER is exactly specified and table-free — EBML variable-
length integers, the element tree, Segment → Info (TimecodeScale,
Duration, MuxingApp) and Tracks → TrackEntry (type, CodecID, video
PixelWidth/Height, audio SamplingFrequency/Channels) — while the codec
payloads (VP8/VP9/AV1 inter frames, Vorbis/Opus audio) stay the
documented per-row :class:`~.rawavi.UnsupportedCodecError` boundary.

Parsed IDs (Matroska registry):

- ``1A45DFA3`` EBML header → ``4282`` DocType (matroska / webm)
- ``18538067`` Segment → ``1549A966`` Info → ``2AD7B1`` TimecodeScale
  (ns/tick, default 1,000,000), ``4489`` Duration (float ticks),
  ``4D80``/``5741`` Muxing/WritingApp
- ``1654AE6B`` Tracks → ``AE`` TrackEntry → ``D7`` TrackNumber,
  ``83`` TrackType (1 video / 2 audio), ``86`` CodecID,
  ``E0`` Video → ``B0`` PixelWidth / ``BA`` PixelHeight,
  ``E1`` Audio → ``B5`` SamplingFrequency / ``9F`` Channels

Unknown-size elements (streamed Matroska uses them for Segment) are
supported at the top level; hostile structure — lying sizes, element
floods, deep nesting — lands on ``ValueError`` with the same bomb caps
as the MP4 walker.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

import math
import struct

from .rawavi import UnsupportedCodecError

_MAX_ELEMENTS = 10_000


def read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, next_pos).

    ``keep_marker=True`` for element IDs (the length-marker bit stays
    part of the value, as Matroska writes IDs); False for sizes."""
    if pos >= len(data):
        raise ValueError("ebml: varint past end of payload")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid varint leading byte 0x00")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("ebml: truncated varint")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if not keep_marker:
        raw &= (1 << (7 * length)) - 1
    return raw, pos + length


def _is_unknown_size(size: int, length_of_field: int) -> bool:
    return size == (1 << (7 * length_of_field)) - 1


def _walk(data: bytes, start: int, end: int, budget: list[int]):
    """Yield (element_id, body_start, body_end) within [start, end)."""
    pos = start
    while pos < end:
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("ebml: element count over the hostile-input cap")
        eid, p2 = read_vint(data, pos, keep_marker=True)
        size_start = p2
        size, p3 = read_vint(data, p2, keep_marker=False)
        size_len = p3 - size_start
        if _is_unknown_size(size, size_len):
            # unknown-size element: extends to the end of the scope
            yield eid, p3, end
            return
        if p3 + size > end:
            raise ValueError(
                f"ebml: element 0x{eid:X} size {size} overruns its scope"
            )
        yield eid, p3, p3 + size
        pos = p3 + size


def _uint(data: bytes, a: int, b: int) -> int:
    return int.from_bytes(data[a:b], "big")


def _xiph_packets(blob: bytes) -> list[bytes]:
    """All packets out of Matroska's Xiph-laced CodecPrivate: byte 0
    is the packet count minus one, then 255-continued sizes for all
    but the last packet, then the packets back to back."""
    if not blob:
        raise ValueError("webm: empty CodecPrivate")
    n_sizes = blob[0]  # sizes stored for n_sizes packets (last implicit)
    pos = 1
    sizes: list[int] = []
    for _ in range(n_sizes):
        size = 0
        while pos < len(blob):
            b = blob[pos]
            size += b
            pos += 1
            if b != 255:
                break
        else:
            raise ValueError("webm: truncated Xiph lacing")
        sizes.append(size)
    if sum(sizes) > len(blob) - pos:
        raise ValueError("webm: Xiph lacing over CodecPrivate end")
    sizes.append(len(blob) - pos - sum(sizes))
    out = []
    for size in sizes:
        out.append(blob[pos : pos + size])
        pos += size
    return out


def _xiph_first_packet(blob: bytes) -> bytes:
    return _xiph_packets(blob)[0]


def _float(data: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", data[a:b])[0]
    if n == 8:
        return struct.unpack(">d", data[a:b])[0]
    if n == 0:
        return 0.0
    raise ValueError(f"ebml: float element of width {n}")


def parse_webm(data: bytes) -> dict:
    """Container-level + per-track metadata for a Matroska/WebM payload."""
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("ebml: no EBML header magic")
    budget = [_MAX_ELEMENTS]
    meta: dict = {"doc_type": "matroska", "tracks": [], "muxing_app": ""}
    timecode_scale = 1_000_000  # ns per tick (Matroska default)
    duration_ticks = 0.0

    def parse_track(a: int, b: int) -> dict:
        t: dict = {}
        for eid, s, e in _walk(data, a, b, budget):
            if eid == 0xD7:
                t["track_number"] = _uint(data, s, e)
            elif eid == 0x83:
                t["track_type"] = _uint(data, s, e)
            elif eid == 0x86:
                t["codec_id"] = data[s:e].decode("latin-1", "replace")
            elif eid == 0x63A2:
                t["_codec_private"] = (s, e)
            elif eid == 0xE0:  # Video
                for vid, vs, ve in _walk(data, s, e, budget):
                    if vid == 0xB0:
                        t["width"] = _uint(data, vs, ve)
                    elif vid == 0xBA:
                        t["height"] = _uint(data, vs, ve)
            elif eid == 0xE1:  # Audio
                for aid, as_, ae in _walk(data, s, e, budget):
                    if aid == 0xB5:
                        t["sample_rate"] = _float(data, as_, ae)
                    elif aid == 0x9F:
                        t["channels"] = _uint(data, as_, ae)
        return t

    saw_segment = False
    first_blocks: list[tuple[int, bool, int, int]] = []
    for eid, s, e in _walk(data, 0, len(data), budget):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hs, he in _walk(data, s, e, budget):
                if hid == 0x4282:
                    meta["doc_type"] = data[hs:he].decode("latin-1", "replace")
        elif eid == 0x18538067:  # Segment
            saw_segment = True
            for sid, ss, se in _walk(data, s, e, budget):
                if sid == 0x1549A966:  # Info
                    for iid, is_, ie in _walk(data, ss, se, budget):
                        if iid == 0x2AD7B1:
                            timecode_scale = _uint(data, is_, ie)
                        elif iid == 0x4489:
                            duration_ticks = _float(data, is_, ie)
                        elif iid == 0x4D80:
                            meta["muxing_app"] = data[is_:ie].decode(
                                "utf-8", "replace"
                            )
                elif sid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _walk(data, ss, se, budget):
                        if tid == 0xAE:
                            meta["tracks"].append(parse_track(ts, te))
                elif sid == 0x1F43B675 and len(first_blocks) < 16:
                    # Cluster: remember the head SimpleBlocks so a
                    # V_VP9 track's first keyframe can contribute
                    # codec-authoritative dimensions.  The scan is an
                    # OPTIONAL enrichment with its own local budget —
                    # a huge-but-valid cluster must neither consume
                    # the container walk's element budget nor fail the
                    # parse; it just stops contributing blocks.
                    cluster_budget = [256]
                    try:
                        for cid, cs, ce in _walk(
                            data, ss, se, cluster_budget
                        ):
                            if len(first_blocks) >= 16:
                                break
                            if cid != 0xA3:
                                continue
                            try:
                                tn, p = read_vint(
                                    data, cs, keep_marker=False
                                )
                            except ValueError:
                                continue
                            if p + 3 > ce:
                                continue
                            keyframe = bool(data[p + 2] & 0x80)
                            first_blocks.append((tn, keyframe, p + 3, ce))
                    except ValueError:
                        pass  # damaged cluster internals: dims stay absent
    if not saw_segment:
        raise ValueError("ebml: no Matroska Segment element")
    for t in meta["tracks"]:
        cp = t.pop("_codec_private", None)
        if cp is not None and t.get("track_type") == 2:
            # audio CodecPrivate: A_OPUS carries an OpusHead
            # (RFC 7845 §5.1), A_VORBIS the three Xiph-laced header
            # packets — both codec-authoritative over the track fields
            blob = data[cp[0] : cp[1]]
            cid = t.get("codec_id", "")
            try:
                if cid == "A_OPUS" and blob[:8] == b"OpusHead":
                    if len(blob) < 19:
                        raise ValueError("webm: short OpusHead")
                    t["opus_channels"] = blob[9]
                    t["opus_pre_skip"] = int.from_bytes(
                        blob[10:12], "little"
                    )
                    t["opus_input_sample_rate"] = int.from_bytes(
                        blob[12:16], "little"
                    )
                elif cid == "A_VORBIS":
                    ident = _xiph_first_packet(blob)
                    if ident[:7] != b"\x01vorbis" or len(ident) < 30:
                        raise ValueError("webm: no vorbis ident header")
                    t["vorbis_channels"] = ident[11]
                    t["vorbis_sample_rate"] = int.from_bytes(
                        ident[12:16], "little"
                    )
            except (ValueError, IndexError):
                pass  # damaged private data: fields stay absent
        if cp is not None and t.get("track_type") == 1:
            # Matroska CodecPrivate carries the ISO configuration
            # record for AVC/HEVC/AV1 tracks — the same
            # codec-authoritative dimensions MP4 stsd provides, so
            # true-dims coverage spans all four codecs here too.
            # A damaged record leaves dims absent, never raises.
            blob = data[cp[0] : cp[1]]
            cid = t.get("codec_id", "")
            try:
                if cid == "V_MPEG4/ISO/AVC":
                    from . import rawh264  # noqa: PLC0415

                    sps = rawh264.sps_from_avcc(blob)
                    t["avc_width"] = sps["width"]
                    t["avc_height"] = sps["height"]
                    t["avc_profile"] = sps["profile"]
                elif cid == "V_MPEGH/ISO/HEVC":
                    from . import rawhevc  # noqa: PLC0415

                    sps = rawhevc.sps_from_hvcc(blob)
                    t["hevc_width"] = sps["width"]
                    t["hevc_height"] = sps["height"]
                    t["hevc_profile"] = sps["profile"]
                elif cid == "V_AV1":
                    from . import rawav1  # noqa: PLC0415

                    seq = rawav1.parse_av1c(blob)
                    if "width" in seq:
                        t["av1_width"] = seq["width"]
                        t["av1_height"] = seq["height"]
                    t["av1_profile"] = seq.get("profile", "")
            except ValueError:
                pass
        if t.get("codec_id") != "V_VP9" or t.get("track_type") != 1:
            continue
        for tn, keyframe, bs, be in first_blocks:
            if tn != t.get("track_number") or not keyframe:
                continue
            # VP9 keyframe header is pure fixed-width grammar — pull
            # the TRUE coded dimensions (same tier as H.264/HEVC SPS)
            try:
                from .rawvp9 import parse_keyframe_header  # noqa: PLC0415

                kf = parse_keyframe_header(data[bs:be])
            except ValueError:
                break  # corrupt/inter head: dims stay absent
            t["vp9_width"] = kf["width"]
            t["vp9_height"] = kf["height"]
            t["vp9_profile"] = kf["profile"]
            t["vp9_bit_depth"] = kf["bit_depth"]
            t["vp9_frame_span"] = (bs, be)  # for the pixel decoder
            break
    if timecode_scale == 0:
        raise ValueError("ebml: zero timecode scale")
    if not math.isfinite(duration_ticks) or duration_ticks < 0:
        # inf would raise OverflowError out of int(), escaping the
        # ValueError-only per-row capture contract
        raise ValueError("ebml: non-finite or negative duration")
    meta["timecode_scale_ns"] = timecode_scale
    meta["duration_ms"] = int(duration_ticks * timecode_scale / 1e6)
    meta["n_tracks"] = len(meta["tracks"])
    return meta


#: bomb guard for the per-track block walk
MAX_TRACK_BLOCKS = 1 << 20


def _block_frames(data: bytes, cs: int, ce: int) -> tuple[int, list[bytes]]:
    """One (Simple)Block element body → (track_number, frames) with
    all four Matroska lacing modes (none/Xiph/fixed/EBML)."""
    tn, p = read_vint(data, cs, keep_marker=False)
    if p + 3 > ce:
        raise ValueError("webm: block shorter than its header")
    flags = data[p + 2]
    pos = p + 3
    ltype = flags & 0x06
    if ltype == 0x00:
        return tn, [data[pos:ce]]
    if pos >= ce:
        raise ValueError("webm: laced block missing its frame count")
    n = data[pos] + 1
    pos += 1
    sizes: list[int] = []
    if ltype == 0x02:  # Xiph
        for _ in range(n - 1):
            size = 0
            while pos < ce:
                b = data[pos]
                size += b
                pos += 1
                if b != 255:
                    break
            else:
                raise ValueError("webm: truncated Xiph block lacing")
            sizes.append(size)
    elif ltype == 0x04:  # fixed
        total = ce - pos
        if total % n:
            raise ValueError("webm: fixed lacing does not divide evenly")
        sizes = [total // n] * (n - 1)
    elif n == 1:  # EBML lacing with one frame carries NO size fields
        pass
    else:  # EBML: first size a vint, then signed-vint deltas
        first, npos = read_vint(data, pos, keep_marker=False)
        sizes = [first]
        prev = first
        pos = npos
        for _ in range(n - 2):
            raw, npos = read_vint(data, pos, keep_marker=False)
            length = npos - pos
            prev += raw - ((1 << (7 * length - 1)) - 1)
            if prev < 0:
                raise ValueError("webm: negative EBML-laced frame size")
            sizes.append(prev)
            pos = npos
    declared = sum(sizes)
    if declared > ce - pos:
        raise ValueError("webm: laced frame sizes overrun the block")
    sizes.append(ce - pos - declared)
    frames = []
    for size in sizes:
        frames.append(data[pos : pos + size])
        pos += size
    return tn, frames


def webm_track_blocks(data: bytes, track: int) -> list[bytes]:
    """Every frame of ``track`` across all Clusters, in stream order —
    SimpleBlocks and BlockGroup Blocks, lacing unrolled."""
    budget = [1 << 20]
    out: list[bytes] = []

    def handle(cs: int, ce: int) -> None:
        try:
            tn, frames = _block_frames(data, cs, ce)
        except ValueError:
            return  # damaged block: skip, census semantics
        if tn == track:
            out.extend(frames)
            if len(out) > MAX_TRACK_BLOCKS:
                raise ValueError("webm: track block count over the cap")

    for eid, s, e in _walk(data, 0, len(data), budget):
        if eid != 0x18538067:
            continue
        for sid, ss, se in _walk(data, s, e, budget):
            if sid != 0x1F43B675:
                continue
            for cid, cs, ce in _walk(data, ss, se, budget):
                if cid == 0xA3:
                    handle(cs, ce)
                elif cid == 0xA0:  # BlockGroup
                    for gid, gs, ge in _walk(data, cs, ce, budget):
                        if gid == 0xA1:
                            handle(gs, ge)
    return out


def decode_webm_vorbis_pcm(data: bytes):
    """A_VORBIS track → (PCM, rate): the three Xiph-laced header
    packets from CodecPrivate plus the track's laced block frames,
    decoded by :mod:`.vorbisdec`.  Raises UnsupportedCodecError when
    no complete Vorbis track exists (every other Matroska codec stays
    the loud boundary)."""
    budget = [1 << 20]
    track_no = None
    headers: list[bytes] | None = None
    for eid, s, e in _walk(data, 0, len(data), budget):
        if eid != 0x18538067:
            continue
        for sid, ss, se in _walk(data, s, e, budget):
            if sid != 0x1654AE6B:
                continue
            for tid, ts, te in _walk(data, ss, se, budget):
                if tid != 0xAE:
                    continue
                num = codec = cp = None
                for fid, fs, fe in _walk(data, ts, te, budget):
                    if fid == 0xD7:
                        num = _uint(data, fs, fe)
                    elif fid == 0x86:
                        codec = data[fs:fe].decode("latin-1", "replace")
                    elif fid == 0x63A2:
                        cp = data[fs:fe]
                if codec == "A_VORBIS" and cp is not None:
                    try:
                        pkts = _xiph_packets(cp)
                    except ValueError:
                        continue
                    if (len(pkts) == 3 and pkts[0][:7] == b"\x01vorbis"
                            and pkts[2][:7] == b"\x05vorbis"):
                        track_no, headers = num, pkts
    if track_no is None or headers is None:
        raise UnsupportedCodecError(
            "Matroska/WebM codec payload decode is not implemented "
            "(no complete A_VORBIS track); container metadata is "
            "available via parse_webm"
        )
    from .vorbisdec import decode_packets

    blocks = webm_track_blocks(data, track_no)
    return decode_packets(headers[0], headers[2], blocks)


def decode_webm_media(data: bytes):
    """Vorbis audio tracks decode for real
    (:func:`decode_webm_vorbis_pcm`); everything else (VP8/VP9/AV1
    inter frames, Opus) stays the documented loud boundary."""
    return decode_webm_vorbis_pcm(data)


def sniff_webm(data: bytes) -> bool:
    return data[:4] == b"\x1a\x45\xdf\xa3"


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _vint_size(n: int) -> bytes:
    """Encode an element SIZE as a minimal-width EBML varint."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("ebml: size too large")


def _el(eid: int, body: bytes) -> bytes:
    nbytes = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nbytes, "big") + _vint_size(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def build_webm(
    *,
    doc_type: str = "webm",
    duration_ms: int = 2000,
    timecode_scale: int = 1_000_000,
    video: tuple[str, int, int] | None = ("V_VP9", 640, 360),
    audio: tuple[str, int, int] | None = ("A_OPUS", 2, 48000),
    unknown_size_segment: bool = False,
    vp9_keyframe: tuple[int, int] | None = None,
    vp9_frame: bytes | None = None,
    vp9_frames: list[bytes] | None = None,
    codec_private: bytes | None = None,
    audio_codec_private: bytes | None = None,
    audio_blocks: list[list[bytes]] | None = None,
    audio_lacing: str = "xiph",
) -> bytes:
    """Write a structurally valid Matroska/WebM — by default with no
    clusters (metadata parsing never touches codec payloads).

    With ``vp9_keyframe=(w, h)`` one Cluster is appended whose first
    SimpleBlock carries a real VP9 keyframe uncompressed header with
    those coded dimensions (which may differ from the track's
    PixelWidth/Height — the codec is authoritative)."""
    header = _el(
        0x1A45DFA3,
        _uint_el(0x4286, 1)  # EBMLVersion
        + _uint_el(0x42F7, 1)
        + _uint_el(0x42F2, 4)
        + _uint_el(0x42F3, 8)
        + _el(0x4282, doc_type.encode())
        + _uint_el(0x4287, 2)
        + _uint_el(0x4285, 2),
    )
    ticks = duration_ms * 1_000_000 / timecode_scale
    info = _el(
        0x1549A966,
        _uint_el(0x2AD7B1, timecode_scale)
        + _el(0x4489, struct.pack(">d", ticks))
        + _el(0x4D80, b"rawdata-fixture"),
    )
    tracks_body = b""
    tnum = 1
    if video is not None:
        codec, w, h = video
        tracks_body += _el(
            0xAE,
            _uint_el(0xD7, tnum) + _uint_el(0x83, 1)
            + _el(0x86, codec.encode())
            + (
                _el(0x63A2, codec_private)
                if codec_private is not None
                else b""
            )
            + _el(0xE0, _uint_el(0xB0, w) + _uint_el(0xBA, h)),
        )
        tnum += 1
    if audio is not None:
        codec, ch, rate = audio
        tracks_body += _el(
            0xAE,
            _uint_el(0xD7, tnum) + _uint_el(0x83, 2)
            + _el(0x86, codec.encode())
            + (
                _el(0x63A2, audio_codec_private)
                if audio_codec_private is not None
                else b""
            )
            + _el(0xE1, _el(0xB5, struct.pack(">f", rate))
                  + _uint_el(0x9F, ch)),
        )
    tracks = _el(0x1654AE6B, tracks_body)
    seg_body = info + tracks
    if (vp9_keyframe is not None or vp9_frame is not None) \
            and video is not None:
        if vp9_frame is not None:
            frame = vp9_frame  # a fully CODED keyframe (rawvp9, r15)
        else:
            from .rawvp9 import build_keyframe_header  # noqa: PLC0415

            frame = build_keyframe_header(
                width=vp9_keyframe[0], height=vp9_keyframe[1]
            )
        # SimpleBlock: track-1 varint, timecode 0, keyframe flag
        block = b"\x81" + b"\x00\x00" + b"\x80" + frame
        seg_body += _el(
            0x1F43B675, _uint_el(0xE7, 0) + _el(0xA3, block)
        )
    if vp9_frames is not None and video is not None:
        # a coded GOP (rawvp9 r16): one Cluster, one SimpleBlock per
        # frame at 40 ms spacing, keyframe flag on the first only
        cluster = _uint_el(0xE7, 0)
        for i, frame in enumerate(vp9_frames):
            tc = (i * 40).to_bytes(2, "big")
            flags = b"\x80" if i == 0 else b"\x00"
            cluster += _el(0xA3, b"\x81" + tc + flags + frame)
        seg_body += _el(0x1F43B675, cluster)
    if audio_blocks is not None and audio is not None:
        atrack = tnum  # the audio TrackEntry's number
        cluster = _uint_el(0xE7, 0)
        for i, frames in enumerate(audio_blocks):
            body = bytes([0x80 | atrack]) + b"\x00\x00"
            if len(frames) == 1 and audio_lacing != "ebml":
                body += b"\x80" + frames[0]
            elif audio_lacing == "xiph":
                body += b"\x82" + bytes([len(frames) - 1])
                for f in frames[:-1]:
                    q, r = divmod(len(f), 255)
                    body += b"\xff" * q + bytes([r])
                body += b"".join(frames)
            elif audio_lacing == "fixed":
                if len({len(f) for f in frames}) != 1:
                    raise ValueError(
                        "webm fixture: fixed lacing needs equal frames"
                    )
                body += b"\x84" + bytes([len(frames) - 1])
                body += b"".join(frames)
            elif audio_lacing == "ebml":
                body += b"\x86" + bytes([len(frames) - 1])
                if len(frames) > 1:  # n == 1 carries NO size fields
                    first = len(frames[0])
                    body += bytes([0x80 | first]) if first < 127 else (
                        bytes([0x40 | (first >> 8), first & 0xFF])
                    )
                    prev = first
                    for f in frames[1:-1]:
                        delta = len(f) - prev
                        # signed vint, 2-byte form: value = delta + 0x1FFF
                        body += bytes([0x40 | ((delta + 0x1FFF) >> 8),
                                       (delta + 0x1FFF) & 0xFF])
                        prev = len(f)
                body += b"".join(frames)
            else:
                raise ValueError(
                    f"webm fixture: unknown lacing {audio_lacing!r}"
                )
            # alternate SimpleBlock and BlockGroup/Block carriage
            if i % 2 == 0:
                cluster += _el(0xA3, body)
            else:
                cluster += _el(0xA0, _el(0xA1, body))
        seg_body += _el(0x1F43B675, cluster)
    if unknown_size_segment:
        # streamed-Matroska shape: size field all-ones (unknown)
        segment = (0x18538067).to_bytes(4, "big") + b"\xff" + seg_body
    else:
        segment = _el(0x18538067, seg_body)
    return header + segment


def decode_vp9_gop(data: bytes) -> dict:
    """Decode the V_VP9 track of a WebM file as a GOP — every block of
    the track in stream order through :func:`rawvp9.decode_gop`
    (keyframe + inter frames, r16).  Subset and table provenance per
    :mod:`.rawvp9`; non-fixture header shapes raise per-row."""
    meta = parse_webm(data)
    for t in meta.get("tracks", []):
        if t.get("codec_id") == "V_VP9" and t.get("track_type") == 1:
            frames = webm_track_blocks(data, t["track_number"])
            if not frames:
                break
            from .rawvp9 import decode_gop  # noqa: PLC0415

            return decode_gop(frames)
    raise ValueError("webm: no V_VP9 frames to decode")


def decode_first_vp9_keyframe(data: bytes) -> dict:
    """Decode the first V_VP9 keyframe of a WebM file to PIXELS
    (r15; profile-0 subset and table provenance per
    :mod:`.rawvp9`)."""
    meta = parse_webm(data)
    for t in meta.get("tracks", []):
        span = t.get("vp9_frame_span")
        if span:
            from .rawvp9 import decode_keyframe  # noqa: PLC0415

            return decode_keyframe(data[span[0] : span[1]])
    raise ValueError("webm: no V_VP9 keyframe to decode")
