"""MP4 / ISO-BMFF container metadata — ISO/IEC 14496-12.

The box (atom) structure is exact, small, and table-free: this module
walks it for the metadata a crawl curation pipeline needs from
``video/mp4`` / ``audio/mp4`` payloads — brands, movie duration,
per-track codec fourcc / handler / timescale / duration / dimensions /
audio layout — while codec payload decode (H.264/H.265/AAC) stays the
documented loud boundary (:func:`decode_mp4_media` raises
:class:`~.rawavi.UnsupportedCodecError`; crawl rows capture per-row).

Parsed boxes: ``ftyp`` (brands), ``moov``/``mvhd`` (movie timescale +
duration, version 0 and 1), ``trak``/``tkhd`` (track id, the 16.16
fixed-point width/height), ``mdia``/``mdhd`` (media timescale +
duration), ``hdlr`` (vide/soun/...), ``stbl``/``stsd`` (sample-entry
fourcc; channel count + sample rate for audio entries), ``stts``
(sample counts), and 64-bit large sizes.  Hostile structure — lying
sizes, truncated headers, unbounded recursion — lands on
``ValueError`` with depth and box-count caps.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"mvex"}
_MAX_BOXES = 10_000


def _walk(data: bytes, start: int, end: int, budget: list[int]):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("mp4: box count over the hostile-input cap")
        size = int.from_bytes(data[pos : pos + 4], "big")
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated 64-bit box size")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to the end of the enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"mp4: box {fourcc!r} size {size} overruns its container"
            )
        yield fourcc, body, pos + size
        pos += size


def _fixed_16_16(raw: int) -> float:
    return raw / 65536.0


def parse_mp4(data: bytes) -> dict:
    """Container-level + per-track metadata for an ISO-BMFF payload.

    Fragmented files (DASH/HLS fMP4 — the dominant web-video delivery
    shape) are first-class: ``mvex``/``trex`` defaults, ``moof`` →
    ``traf`` → ``tfhd``/``tfdt``/``trun`` sample runs, and ``styp``
    media segments WITHOUT a moov (an init-less segment is valid and
    must not read as corruption).  Duration precedence per sample run:
    trun per-sample > tfhd default > trex default.  When the movie
    header says duration 0 (live/fragmented encoders), the per-track
    fragment tick totals convert through the track timescale instead.
    """
    if len(data) < 8:
        raise ValueError("mp4: shorter than one box header")
    budget = [_MAX_BOXES]
    meta: dict = {"brands": [], "tracks": []}
    saw_moov = False
    n_fragments = 0
    trex_defaults: dict[int, int] = {}  # track_id -> default duration
    frag_ticks: dict[int, int] = {}     # track_id -> summed durations
    frag_samples: dict[int, int] = {}   # track_id -> summed counts

    def parse_traf(start: int, end: int):
        track_id = None
        tfhd_default = None
        for fourcc, body, box_end in _walk(data, start, end, budget):
            if fourcc == b"tfhd":
                if box_end - body < 8:
                    raise ValueError("mp4: tfhd box shorter than its fields")
                flags = int.from_bytes(data[body + 1 : body + 4], "big")
                track_id = int.from_bytes(data[body + 4 : body + 8], "big")
                p = body + 8
                if flags & 0x01:
                    p += 8  # base_data_offset
                if flags & 0x02:
                    p += 4  # sample_description_index
                if flags & 0x08:
                    if p + 4 > box_end:
                        raise ValueError("mp4: tfhd default duration truncated")
                    tfhd_default = int.from_bytes(data[p : p + 4], "big")
            elif fourcc == b"trun":
                if track_id is None:
                    raise ValueError("mp4: trun before tfhd in traf")
                if box_end - body < 8:
                    raise ValueError("mp4: trun box shorter than its fields")
                flags = int.from_bytes(data[body + 1 : body + 4], "big")
                count = int.from_bytes(data[body + 4 : body + 8], "big")
                if count > (1 << 22):
                    raise ValueError(
                        "mp4: trun sample count over the hostile-input cap"
                    )
                p = body + 8
                if flags & 0x001:
                    p += 4  # data_offset
                if flags & 0x004:
                    p += 4  # first_sample_flags
                per = (
                    (4 if flags & 0x100 else 0)
                    + (4 if flags & 0x200 else 0)
                    + (4 if flags & 0x400 else 0)
                    + (4 if flags & 0x800 else 0)
                )
                if p + count * per > box_end:
                    raise ValueError("mp4: trun sample table truncated")
                if flags & 0x100:
                    ticks = 0
                    for i in range(count):
                        ticks += int.from_bytes(
                            data[p + i * per : p + i * per + 4], "big"
                        )
                else:
                    default = (
                        tfhd_default
                        if tfhd_default is not None
                        else trex_defaults.get(track_id, 0)
                    )
                    ticks = count * default
                frag_samples[track_id] = frag_samples.get(track_id, 0) + count
                frag_ticks[track_id] = frag_ticks.get(track_id, 0) + ticks

    def walk(start: int, end: int, depth: int, track: dict | None):
        nonlocal saw_moov, n_fragments
        if depth > 8:
            raise ValueError("mp4: box nesting over the depth cap")
        for fourcc, body, box_end in _walk(data, start, end, budget):
            if fourcc in (b"ftyp", b"styp"):
                meta["major_brand"] = data[body : body + 4].decode(
                    "latin-1", "replace"
                )
                meta["brands"] = [
                    data[p : p + 4].decode("latin-1", "replace")
                    for p in range(body + 8, box_end, 4)
                ]
            elif fourcc == b"moof":
                n_fragments += 1
                for mcc, mb, me in _walk(data, body, box_end, budget):
                    if mcc == b"traf":
                        parse_traf(mb, me)
            elif fourcc == b"trex":
                if box_end - body < 24:
                    raise ValueError("mp4: trex box shorter than its fields")
                tid = int.from_bytes(data[body + 4 : body + 8], "big")
                trex_defaults[tid] = int.from_bytes(
                    data[body + 12 : body + 16], "big"
                )
            elif fourcc == b"mvhd":
                saw_moov = True
                if box_end - body < 20:
                    raise ValueError("mp4: mvhd box shorter than its fields")
                ver = data[body]
                if ver == 1:
                    ts = int.from_bytes(data[body + 20 : body + 24], "big")
                    dur = int.from_bytes(data[body + 24 : body + 32], "big")
                else:
                    ts = int.from_bytes(data[body + 12 : body + 16], "big")
                    dur = int.from_bytes(data[body + 16 : body + 20], "big")
                if ts == 0:
                    raise ValueError("mp4: zero movie timescale")
                meta["timescale"] = ts
                meta["duration_ms"] = dur * 1000 // ts
            elif fourcc == b"trak":
                t: dict = {}
                meta["tracks"].append(t)
                walk(body, box_end, depth + 1, t)
            elif fourcc == b"tkhd" and track is not None:
                # full version-dependent body (ver/flags + fields +
                # matrix + width/height): 84 bytes for v0, 96 for v1 —
                # a short-but-parseable tkhd must not yield in-bounds
                # garbage dimensions read off box_end
                ver = data[body] if box_end - body >= 1 else None
                if ver not in (0, 1):
                    raise ValueError(f"mp4: tkhd unknown version {ver!r}")
                if box_end - body < (96 if ver == 1 else 84):
                    raise ValueError("mp4: tkhd box shorter than its fields")
                track["track_id"] = int.from_bytes(
                    data[body + (20 if ver == 1 else 12) : body
                         + (24 if ver == 1 else 16)], "big"
                )
                # width/height sit at version-fixed offsets (v0: body+76,
                # v1: body+88) — NOT at box_end-8: some muxers pad the
                # tkhd body past the canonical 84/96 bytes, and reading
                # off box_end would pick up padding garbage
                dim = body + (88 if ver == 1 else 76)
                w = int.from_bytes(data[dim : dim + 4], "big")
                h = int.from_bytes(data[dim + 4 : dim + 8], "big")
                track["width"] = _fixed_16_16(w)
                track["height"] = _fixed_16_16(h)
            elif fourcc == b"mdhd" and track is not None:
                if box_end - body < 20:
                    raise ValueError("mp4: mdhd box shorter than its fields")
                ver = data[body]
                if ver == 1:
                    ts = int.from_bytes(data[body + 20 : body + 24], "big")
                    dur = int.from_bytes(data[body + 24 : body + 32], "big")
                else:
                    ts = int.from_bytes(data[body + 12 : body + 16], "big")
                    dur = int.from_bytes(data[body + 16 : body + 20], "big")
                if ts == 0:
                    raise ValueError("mp4: zero media timescale")
                track["timescale"] = ts
                track["duration_ms"] = dur * 1000 // ts
            elif fourcc == b"hdlr" and track is not None:
                if box_end - body < 12:
                    raise ValueError("mp4: hdlr box shorter than its fields")
                track["handler"] = data[body + 8 : body + 12].decode(
                    "latin-1", "replace"
                )
            elif fourcc == b"stsd" and track is not None:
                if box_end - body < 8:
                    raise ValueError("mp4: stsd box shorter than its fields")
                n = int.from_bytes(data[body + 4 : body + 8], "big")
                if n >= 1 and body + 16 <= box_end:
                    entry = body + 8
                    track["codec"] = data[entry + 4 : entry + 8].decode(
                        "latin-1", "replace"
                    )
                    if track.get("handler") == "soun" and entry + 36 <= box_end:
                        track["channels"] = int.from_bytes(
                            data[entry + 24 : entry + 26], "big"
                        )
                        track["sample_rate"] = int.from_bytes(
                            data[entry + 32 : entry + 34], "big"
                        )
                    if track["codec"] == "vp09" \
                            and entry + 36 <= box_end:
                        # coded dims from the VisualSampleEntry +
                        # the vpcC configuration record
                        track["vp9_width"] = int.from_bytes(
                            data[entry + 32 : entry + 34], "big"
                        )
                        track["vp9_height"] = int.from_bytes(
                            data[entry + 34 : entry + 36], "big"
                        )
                        cfg_start = entry + 8 + 78
                        entry_end = min(
                            entry + int.from_bytes(
                                data[entry : entry + 4], "big"
                            ),
                            box_end,
                        )
                        for ccc, cb, ce in _walk(
                            data, cfg_start, entry_end, budget
                        ):
                            if ccc != b"vpcC" or ce - cb < 10:
                                continue
                            track["vp9_profile"] = data[cb + 4]
                            track["vp9_level"] = data[cb + 5]
                            pk = data[cb + 6]
                            track["vp9_bit_depth"] = pk >> 4
                            track["vp9_subsampling"] = (pk >> 1) & 7
                            break
                    if track["codec"] in ("avc1", "avc3", "hvc1", "hev1"):
                        # the codec config record sits after the
                        # 78-byte VisualSampleEntry body: parse its SPS
                        # for the TRUE coded dimensions (tkhd width/
                        # height are presentation hints; the SPS is
                        # authoritative)
                        cfg_start = entry + 8 + 78
                        entry_end = min(
                            entry + int.from_bytes(
                                data[entry : entry + 4], "big"
                            ),
                            box_end,
                        )
                        for ccc, cb, ce in _walk(
                            data, cfg_start, entry_end, budget
                        ):
                            if ccc not in (b"avcC", b"hvcC"):
                                continue
                            try:
                                if ccc == b"avcC":
                                    from . import rawh264  # noqa: PLC0415

                                    sps = rawh264.sps_from_avcc(
                                        data[cb:ce]
                                    )
                                else:
                                    from . import rawhevc  # noqa: PLC0415

                                    sps = rawhevc.sps_from_hvcc(
                                        data[cb:ce]
                                    )
                            except ValueError:
                                break  # malformed config: keep going
                            track["sps_width"] = sps["width"]
                            track["sps_height"] = sps["height"]
                            track["sps_profile"] = sps["profile"]
                            break
            elif fourcc == b"stts" and track is not None:
                if box_end - body < 8:
                    raise ValueError("mp4: stts box shorter than its fields")
                n = int.from_bytes(data[body + 4 : body + 8], "big")
                total = 0
                p = body + 8
                for _ in range(min(n, 1 << 20)):
                    if p + 8 > box_end:
                        break
                    total += int.from_bytes(data[p : p + 4], "big")
                    p += 8
                track["n_samples"] = total
            elif fourcc in _CONTAINERS:
                walk(body, box_end, depth + 1, track)

    walk(0, len(data), 0, None)
    if not saw_moov and not n_fragments:
        raise ValueError("mp4: no moov/mvhd box")
    meta["n_tracks"] = len(meta["tracks"])
    meta["fragmented"] = bool(n_fragments or trex_defaults)
    meta["n_fragments"] = n_fragments
    meta["fragment_samples"] = dict(frag_samples)
    meta["fragment_ticks"] = dict(frag_ticks)
    if not saw_moov:
        # a bare styp media segment (HLS/DASH .m4s): valid, but tick
        # rates live in the absent init segment — report raw ticks
        meta["segment_only"] = True
        meta.setdefault("timescale", 0)
        meta.setdefault("duration_ms", 0)
    elif meta.get("duration_ms", 0) == 0 and frag_ticks:
        # live/fragmented encoders write mvhd duration 0: derive the
        # movie duration from the longest track's fragment ticks via
        # its MEDIA timescale
        best = 0
        for t in meta["tracks"]:
            tid, ts = t.get("track_id"), t.get("timescale", 0)
            if ts and tid in frag_ticks:
                t["duration_ms"] = frag_ticks[tid] * 1000 // ts
                best = max(best, t["duration_ms"])
        meta["duration_ms"] = best
    return meta


def decode_mp4_media(data: bytes):
    """The documented loud boundary (H.264/H.265/AAC payloads)."""
    raise UnsupportedCodecError(
        "MP4 codec payload decode (H.264/HEVC/AAC) is not implemented; "
        "container metadata is available via parse_mp4"
    )


def sniff_mp4(data: bytes) -> bool:
    # styp opens bare DASH/HLS media segments (.m4s) — first-class
    # since the fragmented-MP4 support; moof covers headerless splices
    return (
        len(data) >= 12
        and data[4:8] in (
            b"ftyp", b"styp", b"moov", b"moof",
            b"mdat", b"free", b"wide", b"skip",
        )
    )


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return (1).to_bytes(4, "big") + fourcc + (16 + len(body)).to_bytes(
            8, "big"
        ) + body
    return (8 + len(body)).to_bytes(4, "big") + fourcc + body


def _full(fourcc: bytes, ver: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver, 0, 0, 0]) + body)


def build_mp4(
    *,
    duration_ms: int = 2000,
    timescale: int = 1000,
    video: tuple[int, int] | None = (640, 360),
    audio: tuple[int, int] | None = (2, 44100),
    version1: bool = False,
    brands: tuple[str, ...] = ("isom", "mp42"),
    large_mdat: bool = False,
    fragments: int = 0,
    samples_per_fragment: int = 8,
    duration_source: str = "trun",
    avc_sps: tuple[int, int] | None = None,
    vp9_config: tuple[int, int, int, int] | None = None,
) -> bytes:
    """Write a structurally valid MP4 with empty media data (metadata
    parsing never touches codec payloads).

    With ``fragments > 0`` the file is fMP4: movie/track headers say
    duration 0 (the live-encoder shape), moov carries mvex/trex, and
    ``fragments`` moof+mdat pairs follow.  ``duration_source`` places
    the per-sample duration in ``trun`` rows, the ``tfhd`` default,
    or the ``trex`` default — the three real-world variants."""
    dur = duration_ms * timescale // 1000
    frag_sample_dur = 0
    if fragments:
        total_samples = fragments * samples_per_fragment
        frag_sample_dur = dur // total_samples
        dur = 0  # headers say zero; fragments carry the real timing

    def times(ts, d):
        if version1:
            return (0).to_bytes(8, "big") * 2 + ts.to_bytes(4, "big") + d.to_bytes(8, "big")
        return (0).to_bytes(4, "big") * 2 + ts.to_bytes(4, "big") + d.to_bytes(4, "big")

    ftyp = _box(
        b"ftyp",
        brands[0].encode() + (0).to_bytes(4, "big")
        + b"".join(b.encode() for b in brands),
    )
    tracks = b""
    tid = 1
    specs = []
    if video is not None:
        specs.append(("vide", b"vp09" if vp9_config else b"avc1",
                      video))
    if audio is not None:
        specs.append(("soun", b"mp4a", audio))
    for handler, codec, spec in specs:
        if handler == "vide":
            w, h = spec
            tkhd_tail = (
                bytes(52)
                + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
            )
            # VisualSampleEntry body is exactly 78 bytes after
            # size+fourcc (6 reserved + 2 dri land before entry_body):
            # 66 zeros + depth + pre_defined, then child config boxes
            entry_body = bytes(66) + (0x18).to_bytes(2, "big") + b"\xff\xff"
            if vp9_config is not None:
                # vp09 sample entry: the CODED dims live in the
                # VisualSampleEntry (bytes 16-20 of its tail; the
                # tkhd dims above are presentation hints), followed
                # by the VP Codec Configuration Box (vpcC, FullBox
                # v1: profile, level, bitDepth<<4|subsampling<<1|
                # fullRange, colour triple, 16-bit init-data size)
                cw, chh, profile, bitdepth = vp9_config
                entry_body = (
                    bytes(16)
                    + cw.to_bytes(2, "big") + chh.to_bytes(2, "big")
                    + bytes(46) + (0x18).to_bytes(2, "big")
                    + b"\xff\xff"
                )
                entry_body += _full(
                    b"vpcC", 1,
                    bytes([profile, 10,
                           (bitdepth << 4) | (1 << 1) | 0,
                           2, 2, 2])
                    + (0).to_bytes(2, "big"),
                )
            elif avc_sps is not None:
                from . import rawh264  # noqa: PLC0415

                entry_body += _box(
                    b"avcC",
                    rawh264.build_avcc(
                        rawh264.build_sps(
                            width=avc_sps[0], height=avc_sps[1]
                        )
                    ),
                )
        else:
            ch, rate = spec
            tkhd_tail = bytes(52) + (0).to_bytes(4, "big") * 2
            entry_body = (
                bytes(8)
                + ch.to_bytes(2, "big") + (16).to_bytes(2, "big")
                + bytes(4)
                + rate.to_bytes(2, "big") + b"\x00\x00"
            )
        if version1:
            tkhd = _full(
                b"tkhd", 1,
                (0).to_bytes(8, "big") * 2 + tid.to_bytes(4, "big")
                + bytes(4) + dur.to_bytes(8, "big") + tkhd_tail,
            )
        else:
            tkhd = _full(
                b"tkhd", 0,
                (0).to_bytes(4, "big") * 2 + tid.to_bytes(4, "big")
                + bytes(4) + dur.to_bytes(4, "big") + tkhd_tail,
            )
        entry = (
            (16 + len(entry_body)).to_bytes(4, "big")
            + codec + bytes(6) + (1).to_bytes(2, "big") + entry_body
        )
        stsd = _full(b"stsd", 0, (1).to_bytes(4, "big") + entry)
        stts = _full(
            b"stts", 0,
            (1).to_bytes(4, "big")
            + (50).to_bytes(4, "big") + (dur // 50 or 1).to_bytes(4, "big"),
        )
        stbl = _box(b"stbl", stsd + stts)
        minf = _box(b"minf", stbl)
        hdlr = _full(
            b"hdlr", 0, bytes(4) + handler.encode() + bytes(12) + b"\x00"
        )
        mdhd = _full(b"mdhd", 1 if version1 else 0, times(timescale, dur)
                     + bytes(4))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tracks += _box(b"trak", tkhd + mdia)
        tid += 1
    mvhd = _full(
        b"mvhd", 1 if version1 else 0,
        times(timescale, dur) + bytes(80),
    )
    mvex = b""
    if fragments:
        trexes = b""
        for t in range(1, tid):
            trexes += _full(
                b"trex", 0,
                t.to_bytes(4, "big") + (1).to_bytes(4, "big")
                + (frag_sample_dur if duration_source == "trex" else 0)
                .to_bytes(4, "big")
                + (0).to_bytes(4, "big") + (0).to_bytes(4, "big"),
            )
        mvex = _box(b"mvex", trexes)
    moov = _box(b"moov", mvhd + mvex + tracks)
    out = ftyp + moov
    if fragments:
        for seq in range(1, fragments + 1):
            out += build_fragment(
                seq,
                [t for t in range(1, tid)],
                samples_per_fragment,
                frag_sample_dur,
                duration_source,
            )
        return out
    mdat = _box(b"mdat", b"\x00" * 64, large=large_mdat)
    return out + mdat


def build_fragment(
    seq: int,
    track_ids: list[int],
    n_samples: int,
    sample_dur: int,
    duration_source: str = "trun",
) -> bytes:
    """One moof+mdat pair (``duration_source='trex'`` leaves both
    tfhd and trun duration-less so the init segment's default rules)."""
    trafs = b""
    for t in track_ids:
        tf_flags = 0x08 if duration_source == "tfhd" else 0
        tfhd_body = t.to_bytes(4, "big")
        if tf_flags & 0x08:
            tfhd_body += sample_dur.to_bytes(4, "big")
        tfhd = _box(
            b"tfhd", bytes([0]) + tf_flags.to_bytes(3, "big") + tfhd_body
        )
        tr_flags = 0x100 if duration_source == "trun" else 0
        trun_body = n_samples.to_bytes(4, "big")
        if tr_flags & 0x100:
            trun_body += sample_dur.to_bytes(4, "big") * n_samples
        trun = _box(
            b"trun", bytes([0]) + tr_flags.to_bytes(3, "big") + trun_body
        )
        trafs += _box(b"traf", tfhd + trun)
    mfhd = _full(b"mfhd", 0, seq.to_bytes(4, "big"))
    moof = _box(b"moof", mfhd + trafs)
    return moof + _box(b"mdat", b"\x00" * 16)


def build_m4s(
    *,
    track_id: int = 1,
    n_samples: int = 8,
    sample_dur: int = 40,
    seq: int = 1,
) -> bytes:
    """A bare HLS/DASH media segment: styp + one fragment, NO moov."""
    styp = _box(
        b"styp", b"msdh" + (0).to_bytes(4, "big") + b"msdhmsix"
    )
    return styp + build_fragment(
        seq, [track_id], n_samples, sample_dur, "tfhd"
    )
