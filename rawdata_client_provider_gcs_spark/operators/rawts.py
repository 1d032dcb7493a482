"""MPEG transport stream (HLS ``.ts`` segment) metadata — ISO/IEC
13818-1.

HLS delivers a large share of the web's video bytes as MPEG-TS
segments: fixed 188-byte packets, a PAT (PID 0) naming each program's
PMT, PMTs naming elementary streams, and PES packets whose 33-bit
90 kHz PTS stamps give segment timing.  All of it is exact, small and
table-free, so this module walks it for the metadata a crawl curation
pipeline needs — program/stream census with codec names, packet and
continuity accounting, PTS-span durations — while elementary-stream
decode (H.264/HEVC/AAC/AC-3) stays the documented loud boundary
(:func:`decode_ts_media` raises
:class:`~.rawavi.UnsupportedCodecError`).

Hostile input: a lost sync byte triggers a bounded forward scan to the
next 0x47 at stride alignment (real crawl segments are truncated
mid-packet all the time); lying section lengths, truncated adaptation
fields and PES headers raise ``ValueError``; packet count is naturally
bounded by input size (no amplification — the walk is one linear
pass).

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError

_PKT = 188
_SYNC = 0x47

#: ISO 13818-1 table 2-34 stream_type assignments (the web-relevant rows)
STREAM_TYPES = {
    0x01: "mpeg1-video",
    0x02: "mpeg2-video",
    0x03: "mp3",
    0x04: "mp2",
    0x0F: "aac",
    0x11: "aac-latm",
    0x1B: "h264",
    0x24: "hevc",
    0x81: "ac3",
    0x87: "eac3",
}


def sniff_ts(data: bytes) -> bool:
    """Sync bytes at EVERY available 188-byte stride position (up to
    three) — one leading 0x47 alone is ASCII ``G`` and far too weak;
    requiring each present stride byte keeps truncated-segment support
    while cutting the false-positive rate."""
    if len(data) < _PKT:
        return False
    return all(
        data[i * _PKT] == _SYNC
        for i in range(3)
        if i * _PKT < len(data)
    )


def _header_plausible(data: bytes, pos: int) -> bool:
    """Resync-candidate header sanity: sync byte, a non-reserved
    adaptation_field_control, and an adaptation field that fits the
    packet — enough to reject the payload-embedded 0x47s whose fake
    headers would blow up the packet walk."""
    if pos + 5 > len(data) or data[pos] != _SYNC:
        return False
    afc = (data[pos + 3] >> 4) & 0x3
    if afc == 0:  # reserved
        return False
    if afc in (2, 3) and 5 + data[pos + 4] > _PKT:
        return False
    return True


def _first_coherent(head: bytes, parse_fn, scan: int = 1 << 13) -> dict | None:
    """First coherent audio frame header in a buffered ES head
    (bounded scan; coherence = the next frame boundary also parses
    with the same sample rate, or lies past the truncated head).
    ``parse_fn(head, pos) -> dict|None`` must expose ``frame_len`` and
    ``sample_rate`` — the ADTS and MPEG-audio header walks both do."""
    for pos in range(min(len(head), scan)):
        hdr = parse_fn(head, pos)
        if hdr is None:
            continue
        nxt = parse_fn(head, pos + hdr["frame_len"])
        if pos + hdr["frame_len"] >= len(head) or (
            nxt is not None and nxt["sample_rate"] == hdr["sample_rate"]
        ):
            return hdr
    return None


def _first_adts(head: bytes, scan: int = 1 << 13) -> dict | None:
    from . import rawaac  # noqa: PLC0415

    return _first_coherent(head, rawaac.parse_adts_header, scan)


def _first_mpeg_audio(head: bytes, scan: int = 1 << 13) -> dict | None:
    from . import rawmp3  # noqa: PLC0415

    return _first_coherent(head, rawmp3.parse_frame_header, scan)


def _pts_of(b: bytes, pos: int) -> int:
    """The 33-bit PTS/DTS packed '- xxx m xxxxxxxx xxxxxxx m xxxxxxxx
    xxxxxxx m' form (markers ignored; crawl data lies about them)."""
    return (
        ((b[pos] >> 1) & 0x07) << 30
        | b[pos + 1] << 22
        | (b[pos + 2] >> 1) << 15
        | b[pos + 3] << 7
        | b[pos + 4] >> 1
    )


def parse_ts(data: bytes) -> dict:
    """Program/stream census + timing for an MPEG-TS payload.

    Returns ``n_packets``, ``n_sync_losses``, ``continuity_errors``,
    ``programs`` (program_number → PMT PID), ``streams``: per
    elementary PID ``{pid, stream_type, codec, n_packets, first_pts,
    last_pts, duration_ms}`` (PTS at 90 kHz; duration from the span),
    and ``duration_ms`` (the longest stream span).
    """
    if len(data) < _PKT or data[0] != _SYNC:
        raise ValueError("ts: payload does not start with a sync byte")
    pos = 0
    n_packets = 0
    sync_losses = 0
    cont_errors = 0
    last_cc: dict[int, int] = {}
    pmt_pids: dict[int, int] = {}   # pmt pid -> program number
    programs: dict[int, int] = {}   # program number -> pmt pid
    streams: dict[int, dict] = {}   # elementary pid -> info

    while pos + _PKT <= len(data):
        if data[pos] != _SYNC:
            # bounded resync: a bare 0x47 inside PES payload is common,
            # so prefer a candidate whose NEXT packet boundary
            # (188 bytes later) is also a sync byte.  When no
            # stride-confirmed candidate exists in the rest of the
            # stream (last packet before trailing garbage), fall back
            # to the first candidate whose header bytes are plausible
            # (valid afc, adaptation field fits) — the shape the
            # original hostile case fails and a real packet passes.
            sync_losses += 1
            # The stride scan is WINDOW-BOUNDED: hostile data dense in
            # bare 0x47 bytes that never stride-confirm would otherwise
            # force a full O(n) rescan per ~188-byte advance (O(n^2) on
            # one row).  Scan at most 64 KiB ahead; past the window fall
            # back to the plausible/first candidate, keeping the walk
            # linear (each resync advances pos past everything scanned
            # or lands on a confirmed packet that consumes 188 bytes).
            limit = min(len(data), pos + 1 + (64 << 10))
            nxt = data.find(b"\x47", pos + 1, limit)
            plausible = -1
            last = -1
            budget = 512  # candidates examined per resync (linearity cap)
            exhausted = False
            while nxt >= 0 and nxt + _PKT < len(data) and data[nxt + _PKT] != _SYNC:
                if plausible < 0 and _header_plausible(data, nxt):
                    plausible = nxt
                last = nxt
                budget -= 1
                if budget <= 0:
                    exhausted = True
                    nxt = -1
                    break
                nxt = data.find(b"\x47", nxt + 1, limit)
            if nxt >= 0:
                pos = nxt  # stride-confirmed (or trailing candidate)
            elif plausible >= 0:
                pos = plausible
            elif exhausted:
                # budget spent on hostile 0x47 density: resume right
                # after the last examined candidate — never re-examine
                # a byte (linearity), never over-skip real packets
                pos = last + 1
            elif limit < len(data):
                # no candidate at all inside the window: skip it — a
                # >64 KiB corruption burst must not silently truncate
                # the rest of the stream
                pos = limit
            else:
                break
            continue
        pkt = data[pos : pos + _PKT]
        pos += _PKT
        n_packets += 1
        pusi = bool(pkt[1] & 0x40)
        pid = (pkt[1] & 0x1F) << 8 | pkt[2]
        afc = (pkt[3] >> 4) & 0x3
        cc = pkt[3] & 0x0F
        if pid == 0x1FFF:  # null packet: no payload, no continuity
            continue
        if afc in (1, 3):
            prev = last_cc.get(pid)
            if prev is not None and (prev + 1) & 0xF != cc:
                cont_errors += 1
            last_cc[pid] = cc
        p = 4
        if afc in (2, 3):
            if p >= _PKT:
                raise ValueError("ts: adaptation field over packet end")
            aflen = pkt[p]
            p += 1 + aflen
            if p > _PKT:
                raise ValueError("ts: adaptation field over packet end")
        if afc in (2, 0) or p >= _PKT:
            continue  # no payload

        if pid == 0 and pusi:
            # PAT: pointer_field, then the section
            ptr = pkt[p]
            s = p + 1 + ptr
            if s + 8 > _PKT:
                raise ValueError("ts: PAT section over packet end")
            if pkt[s] != 0x00:
                continue  # not a PAT table after all
            slen = (pkt[s + 1] & 0x0F) << 8 | pkt[s + 2]
            end = s + 3 + slen
            if end > _PKT:
                raise ValueError("ts: PAT section length over packet end")
            q = s + 8  # past tsid/version/section numbers
            while q + 4 <= end - 4:  # 4-byte CRC at section end
                prog = pkt[q] << 8 | pkt[q + 1]
                ppid = (pkt[q + 2] & 0x1F) << 8 | pkt[q + 3]
                if prog != 0:  # 0 = network PID, not a program
                    programs[prog] = ppid
                    pmt_pids[ppid] = prog
                q += 4
        elif pid in pmt_pids and pusi:
            ptr = pkt[p]
            s = p + 1 + ptr
            if s + 12 > _PKT:
                raise ValueError("ts: PMT section over packet end")
            if pkt[s] != 0x02:
                continue
            slen = (pkt[s + 1] & 0x0F) << 8 | pkt[s + 2]
            end = s + 3 + slen
            if end > _PKT:
                raise ValueError("ts: PMT section length over packet end")
            pinfo = (pkt[s + 10] & 0x0F) << 8 | pkt[s + 11]
            q = s + 12 + pinfo
            while q + 5 <= end - 4:
                stype = pkt[q]
                epid = (pkt[q + 1] & 0x1F) << 8 | pkt[q + 2]
                eslen = (pkt[q + 3] & 0x0F) << 8 | pkt[q + 4]
                streams.setdefault(
                    epid,
                    {
                        "pid": epid,
                        "stream_type": stype,
                        "codec": STREAM_TYPES.get(
                            stype, f"0x{stype:02x}"
                        ),
                        "n_packets": 0,
                        "first_pts": None,
                        "last_pts": None,
                    },
                )
                q += 5 + eslen
        elif pid in streams:
            st = streams[pid]
            st["n_packets"] += 1
            if pusi and p + 9 <= _PKT and pkt[p : p + 3] == b"\x00\x00\x01":
                pts_dts = pkt[p + 7] >> 6
                hdr_len = pkt[p + 8]
                if pts_dts >= 2:
                    if p + 14 > _PKT or hdr_len < 5:
                        raise ValueError("ts: PES header over packet end")
                    pts = _pts_of(pkt, p + 9)
                    if st["first_pts"] is None:
                        st["first_pts"] = pts
                    st["last_pts"] = pts
            if (
                st["stream_type"] in (0x1B, 0x24, 0x0F, 0x03, 0x04)
                and "width" not in st
            ):
                # buffer the first ~64 KiB of ES bytes (PES header
                # stripped on PUSI packets: a video stream id like
                # 0xE7 would otherwise read as NAL type 7 and poison
                # the SPS scan); the SPS — or for type 0x0F the first
                # ADTS header — rides in the first access unit
                buf = st.setdefault("_es_head", bytearray())
                if len(buf) < (1 << 16):
                    es_at = p
                    if (
                        pusi
                        and p + 9 <= _PKT
                        and pkt[p : p + 3] == b"\x00\x00\x01"
                    ):
                        es_at = p + 9 + pkt[p + 8]
                    if es_at < _PKT:
                        buf += pkt[es_at:]

    out_streams = []
    best = 0
    for st in streams.values():
        if st["first_pts"] is not None and st["last_pts"] is not None:
            st["duration_ms"] = (st["last_pts"] - st["first_pts"]) // 90
        else:
            st["duration_ms"] = 0
        es_head = st.pop("_es_head", None)
        if es_head is not None and st["stream_type"] in (0x1B, 0x24):
            # H.264/HEVC SPS are pure Exp-Golomb grammar — pull the
            # TRUE coded dimensions out of the buffered ES head
            try:
                if st["stream_type"] == 0x1B:
                    from . import rawh264  # noqa: PLC0415

                    sps = rawh264.find_sps_annexb(bytes(es_head))
                else:
                    from . import rawhevc  # noqa: PLC0415

                    sps = rawhevc.find_sps_annexb(bytes(es_head))
                st["width"] = sps["width"]
                st["height"] = sps["height"]
                st["profile"] = sps["profile"]
            except ValueError:
                pass  # no/corrupt SPS in the head: dims stay absent
        elif es_head is not None and st["stream_type"] == 0x0F:
            # ADTS AAC (ISO 13818-7): the ES head's first coherent
            # header yields rate/profile/channels — audio's analog of
            # the video SPS enrichment
            hdr = _first_adts(bytes(es_head))
            if hdr is not None:
                st["sample_rate"] = hdr["sample_rate"]
                st["channels"] = hdr["channels"]
                st["profile"] = f"AAC/{hdr['profile']}"
        elif es_head is not None and st["stream_type"] in (0x03, 0x04):
            # MPEG-1/2 audio (ISO 11172-3 / 13818-3): same treatment
            # through the MP3 frame-header walk
            hdr = _first_mpeg_audio(bytes(es_head))
            if hdr is not None:
                st["sample_rate"] = hdr["sample_rate"]
                st["channels"] = hdr["channels"]
                st["profile"] = f"{hdr['version']}/L{hdr['layer']}"
        best = max(best, st["duration_ms"])
        out_streams.append(st)
    out_streams.sort(key=lambda s: s["pid"])
    return {
        "n_packets": n_packets,
        "n_sync_losses": sync_losses,
        "continuity_errors": cont_errors,
        "programs": dict(programs),
        "n_programs": len(programs),
        "streams": out_streams,
        "n_streams": len(out_streams),
        "duration_ms": best,
    }


def decode_ts_media(data: bytes):
    """The documented loud boundary (H.264/HEVC/AAC elementary
    streams)."""
    raise UnsupportedCodecError(
        "MPEG-TS elementary-stream decode (H.264/HEVC/AAC) is not "
        "implemented; container metadata is available via parse_ts"
    )


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _packet(
    pid: int, payload: bytes, cc: int, pusi: bool = False
) -> bytes:
    hdr = bytes(
        [
            _SYNC,
            (0x40 if pusi else 0) | (pid >> 8) & 0x1F,
            pid & 0xFF,
            0x10 | (cc & 0x0F),  # payload only
        ]
    )
    pad = _PKT - len(hdr) - len(payload)
    if pad < 0:
        raise ValueError("ts fixture: payload over packet size")
    return hdr + payload + b"\xff" * pad


def _section(table_id: int, body: bytes) -> bytes:
    # section_length counts everything after its own field incl. a fake CRC
    slen = len(body) + 4
    return (
        bytes([0x00, table_id, 0xB0 | (slen >> 8), slen & 0xFF])
        + body
        + b"\x00\x00\x00\x00"  # CRC placeholder (not validated)
    )


def _pts_bytes(pts: int, marker: int = 2) -> bytes:
    return bytes(
        [
            (marker << 4) | ((pts >> 30) & 0x7) << 1 | 1,
            (pts >> 22) & 0xFF,
            ((pts >> 15) & 0x7F) << 1 | 1,
            (pts >> 7) & 0xFF,
            (pts & 0x7F) << 1 | 1,
        ]
    )


def build_ts(
    *,
    duration_ms: int = 4000,
    streams: tuple[tuple[int, int], ...] = ((0x1B, 0x100), (0x0F, 0x101)),
    pes_per_stream: int = 5,
    program: int = 1,
    pmt_pid: int = 0x20,
    null_packets: int = 0,
    pts_base: int = 900_000,
    h264_sps: tuple[int, int] | None = None,
    aac_es: tuple[int, int] | None = None,
    mp3_es: bool = False,
) -> bytes:
    """Write a structurally valid single-program transport stream:
    PAT → PMT → interleaved PES packets whose PTS stamps span exactly
    ``duration_ms`` (90 kHz ticks) per stream.  Payloads are filler —
    metadata parsing never decodes elementary streams."""
    out = bytearray()
    # PAT
    pat_body = bytes([0, 1, 0xC1, 0, 0])  # tsid, version/current, sec 0/0
    pat_body += bytes([program >> 8, program & 0xFF,
                       0xE0 | (pmt_pid >> 8), pmt_pid & 0xFF])
    out += _packet(0, _section(0x00, pat_body), cc=0, pusi=True)
    # PMT
    pmt_body = bytes([program >> 8, program & 0xFF, 0xC1, 0, 0])
    pmt_body += bytes([0xE0 | (streams[0][1] >> 8), streams[0][1] & 0xFF])
    pmt_body += bytes([0xF0, 0])  # program_info_length 0
    for stype, epid in streams:
        pmt_body += bytes(
            [stype, 0xE0 | (epid >> 8), epid & 0xFF, 0xF0, 0]
        )
    out += _packet(pmt_pid, _section(0x02, pmt_body), cc=0, pusi=True)
    # PES packets with evenly spaced PTS covering duration_ms
    ticks = duration_ms * 90
    ccs = {epid: 0 for _, epid in streams}
    for i in range(pes_per_stream):
        pts = pts_base + (
            ticks * i // (pes_per_stream - 1) if pes_per_stream > 1 else 0
        )
        for stype, epid in streams:
            es = b"\x00" * 8  # a little ES filler
            if h264_sps is not None and stype == 0x1B and i == 0:
                from . import rawh264  # noqa: PLC0415

                es = b"\x00\x00\x00\x01" + rawh264.build_sps(
                    width=h264_sps[0], height=h264_sps[1]
                )
            elif aac_es is not None and stype == 0x0F and i == 0:
                from . import rawaac  # noqa: PLC0415

                es = rawaac.build_aac(
                    2,
                    profile=aac_es[0],
                    channels=aac_es[1],
                    frame_payload=40,
                )
            elif mp3_es and stype in (0x03, 0x04) and i == 0:
                from . import rawmp3  # noqa: PLC0415

                # Layer I at 32 kbps/48 kHz: 32-byte frames, so two
                # whole frames fit the single-packet PES the fixture
                # writes (and the census exercises a non-L3 layer)
                es = rawmp3.build_mp3(
                    2, layer=1, bitrate_index=1, samplerate_index=1
                )
            pes = (
                b"\x00\x00\x01\xe0\x00\x00"  # start code, stream id, len 0
                + bytes([0x80, 0x80, 5])       # flags: PTS only, hdr len 5
                + _pts_bytes(pts)
                + es
            )
            out += _packet(epid, pes, cc=ccs[epid], pusi=True)
            ccs[epid] = (ccs[epid] + 1) & 0xF
            # one continuation packet so continuity accounting is real
            out += _packet(epid, b"\x00" * 32, cc=ccs[epid])
            ccs[epid] = (ccs[epid] + 1) & 0xF
    for _ in range(null_packets):
        out += _packet(0x1FFF, b"", cc=0)
    return bytes(out)
