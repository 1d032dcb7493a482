"""Ogg container (Vorbis/Opus) stream metadata — RFC 3533/7845, the
Vorbis I specification.

Like :mod:`.rawmp3`, this is the metadata tier a 100 TB curation
pipeline actually consumes from crawl audio: codec, channels, sample
rate, duration (granule positions), declared bitrates, and the
VorbisComment/OpusTags key-value fields.  Everything here is exact
structure — page capture/lacing, BOS/EOS flags, packet reassembly
across 255-lacing continuations, the two codec identification headers
and the comment headers — with no empirical tables.  PCM synthesis
(Vorbis MDCT floors/residues, Opus CELT/SILK) stays the documented
loud boundary: :func:`decode_ogg_pcm` raises
:class:`~.rawavi.UnsupportedCodecError` so crawl rows capture per-row.

CRC note, documented honesty: Ogg pages carry a CRC-32 (polynomial
0x04C11DB7, unreflected, zero init/xor).  The checker is implemented
and the fixture writer round-trips it, but no third-party Ogg exists
in this container to cross-pin the convention — so a mismatch is
REPORTED (``crc_failures`` count) rather than fatal: failing the parse
on a convention slip would silently turn every real-world file into
100 % data loss, while a count keeps it observable either way.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); audio
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from .rawavi import UnsupportedCodecError

_CRC_TABLE: list[int] | None = None
_CRC_TABS: list[list[int]] | None = None


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _CRC_TABLE = tab
    return _CRC_TABLE


def _crc_tabs() -> list[list[int]]:
    """Slicing-by-8 tables: TABS[k][b] advances byte b through k more
    zero bytes — 8 bytes per Python iteration instead of 1 (the page
    CRC is this module's measured cost center; 1.8× on 1 MB)."""
    global _CRC_TABS
    if _CRC_TABS is None:
        t0 = _crc_table()
        tabs = [list(t0)]
        for _ in range(7):
            prev = tabs[-1]
            tabs.append(
                [((prev[i] << 8) & 0xFFFFFFFF) ^ t0[(prev[i] >> 24) & 0xFF]
                 for i in range(256)]
            )
        _CRC_TABS = tabs
    return _CRC_TABS


def ogg_crc(data: bytes, seed: int = 0) -> int:
    """Ogg CRC-32 (poly 0x04C11DB7, unreflected, zero init/xor);
    ``seed`` allows incremental chunk feeding."""
    tabs = _crc_tabs()
    t7, t6, t5, t4 = tabs[7], tabs[6], tabs[5], tabs[4]
    t3, t2, t1, t0 = tabs[3], tabs[2], tabs[1], tabs[0]
    r = seed
    n = len(data)
    i = 0
    while i + 8 <= n:
        b0, b1, b2, b3, b4, b5, b6, b7 = data[i : i + 8]
        r = (
            t7[((r >> 24) & 0xFF) ^ b0]
            ^ t6[((r >> 16) & 0xFF) ^ b1]
            ^ t5[((r >> 8) & 0xFF) ^ b2]
            ^ t4[(r & 0xFF) ^ b3]
            ^ t3[b4] ^ t2[b5] ^ t1[b6] ^ t0[b7]
        )
        i += 8
    tab = tabs[0]
    for b in data[i:]:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


def parse_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, segments, crc_ok)
    tuples; raises ``ValueError`` on structural corruption."""
    pos = 0
    n = len(data)
    while pos < n:
        nxt = data.find(b"OggS", pos)
        if nxt < 0:
            break
        pos = nxt
        if pos + 27 > n:
            raise ValueError("ogg: truncated page header")
        if data[pos + 4] != 0:
            raise ValueError("ogg: unsupported stream structure version")
        htype = data[pos + 5]
        granule = int.from_bytes(data[pos + 6 : pos + 14], "little", signed=True)
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(data[pos + 18 : pos + 22], "little")
        crc = int.from_bytes(data[pos + 22 : pos + 26], "little")
        nseg = data[pos + 26]
        lace = data[pos + 27 : pos + 27 + nseg]
        if len(lace) < nseg:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lace)
        body_start = pos + 27 + nseg
        if body_start + body_len > n:
            raise ValueError("ogg: page body past end of payload")
        # incremental CRC over (header-with-zeroed-crc-field, body)
        # slices — no page copy
        r = ogg_crc(data[pos : pos + 22])
        r = ogg_crc(b"\x00\x00\x00\x00", r)
        r = ogg_crc(data[pos + 26 : body_start + body_len], r)
        crc_ok = r == crc
        segments = []
        off = body_start
        cur = bytearray()
        for ln in lace:
            cur += data[off : off + ln]
            off += ln
            if ln < 255:
                segments.append((bytes(cur), False))
                cur = bytearray()
        if cur:
            segments.append((bytes(cur), True))  # continues on next page
        yield htype, granule, serial, seq, segments, crc_ok
        pos = body_start + body_len


def _packets(data: bytes):
    """Reassemble packets across pages (single logical stream assumed
    for the id/comment headers; multiplexed streams keep per-serial
    continuation state)."""
    partial: dict[int, bytearray] = {}
    info = {"last_granule": {}, "crc_failures": 0, "n_pages": 0}
    out = []
    for htype, granule, serial, seq, segments, crc_ok in parse_pages(data):
        info["n_pages"] += 1
        if not crc_ok:
            info["crc_failures"] += 1
        if granule >= 0:
            info["last_granule"][serial] = granule
        buf = partial.pop(serial, bytearray())
        for seg, continues in segments:
            buf += seg
            if continues:
                partial[serial] = buf
                buf = bytearray()
            else:
                out.append((serial, bytes(buf)))
                buf = bytearray()
    return out, info


def parse_ogg(data: bytes) -> dict:
    """Stream-level metadata for an Ogg Vorbis/Opus file."""
    if data[:4] != b"OggS":
        raise ValueError("ogg: no capture pattern at start")
    packets, info = _packets(data)
    if not packets:
        raise ValueError("ogg: no complete packets")
    codec = None
    meta: dict = {
        "n_pages": info["n_pages"],
        "crc_failures": info["crc_failures"],
        "comments": {},
        "vendor": "",
    }
    audio_serial = None
    for serial, pkt in packets:
        if pkt[:7] == b"\x01vorbis" and codec is None:
            if len(pkt) < 30:
                raise ValueError("ogg: short vorbis identification header")
            codec = "vorbis"
            audio_serial = serial
            meta["channels"] = pkt[11]
            meta["sample_rate"] = int.from_bytes(pkt[12:16], "little")
            if meta["sample_rate"] == 0:
                raise ValueError("ogg: zero vorbis sample rate")
            meta["bitrate_nominal"] = int.from_bytes(
                pkt[20:24], "little", signed=True
            )
        elif pkt[:8] == b"OpusHead" and codec is None:
            if len(pkt) < 19:
                raise ValueError("ogg: short OpusHead")
            codec = "opus"
            audio_serial = serial
            meta["channels"] = pkt[9]
            meta["pre_skip"] = int.from_bytes(pkt[10:12], "little")
            meta["input_sample_rate"] = int.from_bytes(pkt[12:16], "little")
            meta["sample_rate"] = 48000  # Opus granules tick at 48 kHz
        elif pkt[:8] == b"Speex   " and codec is None:
            # Speex header (public libspeex layout): 8 magic, 20
            # version string, version_id/header_size u32, then rate,
            # mode, mode_bitstream_version, nb_channels … all LE
            if len(pkt) < 68:
                raise ValueError("ogg: short Speex header")
            codec = "speex"
            audio_serial = serial
            meta["sample_rate"] = int.from_bytes(pkt[36:40], "little")
            if meta["sample_rate"] == 0:
                raise ValueError("ogg: zero Speex sample rate")
            mode = int.from_bytes(pkt[40:44], "little")
            meta["speex_mode"] = {
                0: "narrowband", 1: "wideband", 2: "ultra-wideband",
            }.get(mode, f"mode-{mode}")
            meta["channels"] = int.from_bytes(pkt[48:52], "little")
            # SpeexHeader: bitrate@52, frame_size@56, vbr@60,
            # frames_per_packet@64 (review finding, round 12: the old
            # read at 56 returned frame_size and the fixture mirrored)
            meta["speex_frame_size"] = int.from_bytes(pkt[56:60], "little")
            meta["speex_frames_per_packet"] = int.from_bytes(
                pkt[64:68], "little"
            )
        elif pkt[:7] == b"\x80theora" and codec is None:
            # Theora ident (spec §6.2): big-endian fields after the
            # 7-byte magic; the last two bytes pack QUAL(6) KFGSHIFT(5)
            # PF(2) — the granule split video duration needs
            if len(pkt) < 42:
                raise ValueError("ogg: short Theora ident header")
            codec = "theora"
            audio_serial = serial
            meta["theora_version"] = f"{pkt[7]}.{pkt[8]}.{pkt[9]}"
            meta["channels"] = 0
            meta["sample_rate"] = 0
            meta["frame_width"] = int.from_bytes(pkt[10:12], "big") * 16
            meta["frame_height"] = int.from_bytes(pkt[12:14], "big") * 16
            meta["pic_width"] = int.from_bytes(pkt[14:17], "big")
            meta["pic_height"] = int.from_bytes(pkt[17:20], "big")
            meta["fps_num"] = int.from_bytes(pkt[22:26], "big")
            meta["fps_den"] = int.from_bytes(pkt[26:30], "big")
            if not meta["fps_num"] or not meta["fps_den"]:
                raise ValueError("ogg: zero Theora frame rate")
            packed = int.from_bytes(pkt[40:42], "big")
            meta["theora_kfgshift"] = (packed >> 5) & 0x1F
        elif pkt[:7] == b"\x03vorbis" or pkt[:8] == b"OpusTags" \
                or pkt[:7] == b"\x81theora":
            off = 7 if pkt[:1] in (b"\x03", b"\x81") else 8
            try:
                vlen = int.from_bytes(pkt[off : off + 4], "little")
                meta["vendor"] = pkt[off + 4 : off + 4 + vlen].decode(
                    "utf-8", "replace"
                )
                p = off + 4 + vlen
                ncom = int.from_bytes(pkt[p : p + 4], "little")
                p += 4
                for _ in range(min(ncom, 1024)):  # bound hostile counts
                    if p + 4 > len(pkt):
                        break
                    clen = int.from_bytes(pkt[p : p + 4], "little")
                    p += 4
                    if p + clen > len(pkt):
                        break
                    k, _, v = pkt[p : p + clen].decode(
                        "utf-8", "replace"
                    ).partition("=")
                    meta["comments"][k.upper()] = v
                    p += clen
            except Exception:  # noqa: BLE001 — tags are best-effort
                pass
    if codec is None:
        raise ValueError(
            "ogg: no Vorbis/Opus/Speex/Theora identification header"
        )
    meta["codec"] = codec
    if codec == "vorbis":
        # setup-header structure + window census (operators/rawvorbis):
        # optional — legacy metadata-only streams lack a setup packet —
        # but a PRESENT malformed setup is corruption and raises.
        from . import rawvorbis as _V  # noqa: PLC0415

        setup_pkt = next(
            (p for s, p in packets
             if s == audio_serial and p[:7] == b"\x05vorbis"),
            None,
        )
        if setup_pkt is not None:
            st = _V.parse_setup(setup_pkt, meta["channels"])
            meta["vorbis_codebooks"] = len(st["codebooks"])
            meta["vorbis_floor_types"] = [f["type"] for f in st["floors"]]
            meta["vorbis_residue_types"] = [
                r["type"] for r in st["residues"]
            ]
            meta["vorbis_modes"] = len(st["modes"])
            meta["vorbis_coupling_steps"] = sum(
                len(m["coupling"]) for m in st["mappings"]
            )
            audio = [
                p for s, p in packets
                if s == audio_serial
                and p[:7] not in (b"\x01vorbis", b"\x03vorbis",
                                  b"\x05vorbis")
            ]
            census = _V.window_census(audio, st["modes"])
            meta["vorbis_long_blocks"] = census["n_long"]
            meta["vorbis_short_blocks"] = census["n_short"]
    last = info["last_granule"].get(audio_serial, 0)
    if codec == "opus":
        last = max(0, last - meta.get("pre_skip", 0))
        # TOC census over the audio packets (RFC 6716 §3.1): the TOC
        # byte is plain bit grammar — mode/bandwidth/frame-duration
        # distribution without touching SILK/CELT payloads
        modes: dict[str, int] = {}
        bands: dict[str, int] = {}
        frames = 0
        toc_ms = 0.0
        seen = 0
        for serial, pkt in packets:
            if serial != audio_serial or pkt[:8] in (b"OpusHead", b"OpusTags"):
                continue
            seen += 1
            try:
                t = parse_opus_packet(pkt)
            except ValueError:
                continue  # damaged packet: census skips, never raises
            modes[t["mode"]] = modes.get(t["mode"], 0) + 1
            bands[t["bandwidth"]] = bands.get(t["bandwidth"], 0) + 1
            frames += t["n_frames"]
            toc_ms += t["n_frames"] * t["frame_ms"]
        meta["opus_packets"] = seen
        meta["opus_modes"] = modes
        meta["opus_bandwidths"] = bands
        meta["opus_frames"] = frames
        meta["opus_toc_duration_ms"] = int(toc_ms)
    if codec == "theora":
        # granule splits at kfgshift: keyframe part << shift + delta.
        # Bitstream 3.2.0 stores the frame INDEX in the granule
        # position; 3.2.1+ stores the frame COUNT (Theora I spec §A.1;
        # libtheora th_granule_frame) — so pre-3.2.1 streams need +1.
        # A 3.2.0 single-frame stream (granule 0) is indistinguishable
        # from an empty one by granule alone; 0 stays 0 frames.
        shift = meta["theora_kfgshift"]
        frames = (last >> shift) + (last & ((1 << shift) - 1)) if last \
            else 0
        ver = tuple(
            int(x) for x in meta.get("theora_version", "3.2.1").split(".")
        )
        if frames and ver < (3, 2, 1):
            frames += 1
        meta["n_frames"] = frames
        meta["duration_ms"] = (
            frames * 1000 * meta["fps_den"] // meta["fps_num"]
        )
    else:
        meta["duration_ms"] = (
            last * 1000 // meta["sample_rate"] if last else 0
        )
    return meta


#: RFC 6716 Table 2 — TOC config (5 bits) → (mode, bandwidth, frame ms).
#: The table is pure structure: SILK 0-11 (NB/MB/WB × 10/20/40/60),
#: Hybrid 12-15 (SWB/FB × 10/20), CELT 16-31 (NB/WB/SWB/FB × 2.5/5/10/20).
_OPUS_CONFIGS = (
    [("silk", bw, ms) for bw in ("nb", "mb", "wb") for ms in (10, 20, 40, 60)]
    + [("hybrid", bw, ms) for bw in ("swb", "fb") for ms in (10, 20)]
    + [
        ("celt", bw, ms)
        for bw in ("nb", "wb", "swb", "fb")
        for ms in (2.5, 5, 10, 20)
    ]
)


def parse_opus_packet(pkt: bytes) -> dict:
    """One Opus packet's TOC → mode/bandwidth/frame duration/count
    (RFC 6716 §3.1-3.2.5; code-3 packets read the frame-count byte)."""
    if not pkt:
        raise ValueError("opus: empty packet")
    toc = pkt[0]
    mode, bw, ms = _OPUS_CONFIGS[toc >> 3]
    code = toc & 3
    if code in (0,):
        n = 1
    elif code in (1, 2):
        n = 2
    else:
        if len(pkt) < 2:
            raise ValueError("opus: code-3 packet missing its count byte")
        n = pkt[1] & 0x3F
        if n == 0:
            raise ValueError("opus: code-3 packet with zero frames")
        if n * ms > 120:
            raise ValueError("opus: packet over the 120 ms limit")
    return {
        "mode": mode,
        "bandwidth": bw,
        "frame_ms": ms,
        "n_frames": n,
        "stereo": bool((toc >> 2) & 1),
    }


def decode_ogg_pcm(data: bytes):
    """Ogg audio → (PCM float64 (samples, channels), sample_rate).

    Vorbis decodes fully (:mod:`.vorbisdec` — every table ships in
    the stream's setup header, so the honesty boundary does not
    apply); Ogg FLAC reassembles the native stream (the Xiph mapping:
    a ``\\x7fFLAC`` first packet carrying ``fLaC`` + STREAMINFO, then
    header packets, then one frame per packet) and hands it to
    :mod:`.rawflac`.  Opus stays the loud boundary: SILK/CELT decode
    needs codec-fixed tables the repo will not fabricate."""
    if b"OpusHead" in data[:512]:
        raise UnsupportedCodecError(
            "Opus PCM decode is not implemented (SILK/CELT tables); "
            "stream metadata is available via parse_ogg"
        )
    packets, _info = _packets(data)
    for s, pkt in packets:
        if pkt[:5] == b"\x7fFLAC":
            return _decode_ogg_flac(packets, s, pkt)
        if pkt[:7] == b"\x01vorbis":
            break
    from .vorbisdec import decode_ogg_vorbis

    return decode_ogg_vorbis(data)


def _decode_ogg_flac(packets, serial: int, first: bytes):
    """Xiph Ogg-FLAC mapping → native stream → :mod:`.rawflac`."""
    from .rawflac import decode_flac

    if len(first) < 13 or first[5] != 1:
        raise ValueError(
            f"ogg-flac: unsupported mapping version "
            f"{first[5] if len(first) > 5 else '?'}"
        )
    native = bytearray(first[9:])
    if native[:4] != b"fLaC":
        raise ValueError("ogg-flac: first packet lacks the fLaC signature")
    seen_first = False
    for s, pkt in packets:
        if s != serial:
            continue
        if not seen_first:
            seen_first = pkt is first
            continue
        native += pkt
    return decode_flac(bytes(native))


def build_ogg_flac(native: bytes, *, serial: int = 0x7F1A) -> bytes:
    """Wrap a native single-frame FLAC stream (fixture clips encode
    with ``block_size >= n`` so exactly one frame follows the
    metadata) as Ogg FLAC per the Xiph mapping."""
    if native[:4] != b"fLaC":
        raise ValueError("ogg-flac fixture: not a native FLAC stream")
    pos = 4
    n_extra = 0
    while True:
        if pos + 4 > len(native):
            raise ValueError("ogg-flac fixture: truncated metadata")
        flags = native[pos]
        pos += 4 + int.from_bytes(native[pos + 1 : pos + 4], "big")
        if flags & 0x80:
            break
        n_extra += 1
    first = (b"\x7fFLAC\x01\x00" + n_extra.to_bytes(2, "big")
             + native[:pos])
    frames = native[pos:]
    pages = [_page(serial, 0, 0, [first], 2)]
    pages.append(_page(serial, 1, 0, [frames], 4))
    return b"".join(pages)


def sniff_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS" and len(data) > 27 and data[4] == 0


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------


def _page(
    serial: int, seq: int, granule: int, packets: list[bytes], htype: int
) -> bytes:
    lace = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lace += b"\xff" * q + bytes([r])
        body += pkt
    hdr = bytearray(b"OggS")
    hdr += bytes([0, htype])
    hdr += granule.to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"
    hdr += bytes([len(lace)]) + lace
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def build_ogg(
    *,
    codec: str = "vorbis",
    channels: int = 2,
    sample_rate: int = 44100,
    total_samples: int = 44100,
    comments: dict | None = None,
    n_audio_pages: int = 3,
    serial: int = 0x1234,
    pre_skip: int = 312,
    opus_tocs: list[int] | None = None,
    vorbis_modes: list[int] | None = None,
    speex_mode: int = 1,
    width: int = 320,
    height: int = 240,
    fps_num: int = 25,
    fps_den: int = 1,
    theora_kfgshift: int = 6,
    theora_version: tuple[int, int, int] = (3, 2, 1),
) -> bytes:
    """Write a structurally valid Ogg Vorbis/Opus stream whose audio
    packets are opaque filler (metadata parsing never decodes them).

    With ``opus_tocs`` (codec opus) each entry becomes one audio
    packet led by that TOC byte (code-3 entries get a count byte of
    2 frames appended), spread round-robin over the audio pages — the
    packet bodies stay filler, only the TOC grammar is real.

    With ``vorbis_modes`` (codec vorbis) a REAL setup header
    (:func:`..rawvorbis.build_setup`, two modes short/long) rides the
    comment page, and each list entry becomes one audio packet whose
    leading bits select that mode — the window-census grammar is
    real, the packet bodies stay filler."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis" + (0).to_bytes(4, "little")
            + bytes([channels]) + sample_rate.to_bytes(4, "little")
            + (0).to_bytes(4, "little", signed=True)
            + (128000).to_bytes(4, "little", signed=True)
            + (0).to_bytes(4, "little", signed=True)
            + bytes([0xB8, 0x01])
        )
        tag_prefix = b"\x03vorbis"
    elif codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + pre_skip.to_bytes(2, "little")
            + sample_rate.to_bytes(4, "little")
            + (0).to_bytes(2, "little") + bytes([0])
        )
        tag_prefix = b"OpusTags"
    elif codec == "speex":
        ident = bytearray(80)
        ident[:8] = b"Speex   "
        ident[8:28] = b"1.2.0".ljust(20, b"\x00")
        ident[28:32] = (1).to_bytes(4, "little")   # version_id
        ident[32:36] = (80).to_bytes(4, "little")  # header_size
        ident[36:40] = sample_rate.to_bytes(4, "little")
        ident[40:44] = (speex_mode).to_bytes(4, "little")
        ident[44:48] = (4).to_bytes(4, "little")   # mode bitstream ver
        ident[48:52] = channels.to_bytes(4, "little")
        ident[52:56] = (0xFFFFFFFF).to_bytes(4, "little")  # bitrate -1
        ident[56:60] = (160 << speex_mode).to_bytes(4, "little")  # frame_size
        ident[60:64] = (0).to_bytes(4, "little")   # vbr
        ident[64:68] = (1).to_bytes(4, "little")   # frames per packet
        ident = bytes(ident)
        tag_prefix = b""  # speex comments carry no magic: skip tags
    elif codec == "theora":
        w_mb, h_mb = (width + 15) // 16, (height + 15) // 16
        packed = (48 << 10) | (theora_kfgshift << 5)  # QUAL|KFGSHIFT|PF
        ident = (
            b"\x80theora" + bytes(theora_version)
            + w_mb.to_bytes(2, "big") + h_mb.to_bytes(2, "big")
            + width.to_bytes(3, "big") + height.to_bytes(3, "big")
            + bytes([0, 0])
            + fps_num.to_bytes(4, "big") + fps_den.to_bytes(4, "big")
            + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
            + bytes([0]) + (0).to_bytes(3, "big")
            + packed.to_bytes(2, "big")
        )
        tag_prefix = b"\x81theora"
    else:
        raise ValueError(f"ogg fixture: unknown codec {codec}")
    vendor = b"rawdata-fixture"
    tag = tag_prefix + len(vendor).to_bytes(4, "little") + vendor
    items = [
        f"{k}={v}".encode() for k, v in (comments or {}).items()
    ]
    tag += len(items).to_bytes(4, "little")
    for it in items:
        tag += len(it).to_bytes(4, "little") + it
    if codec == "vorbis":
        tag += b"\x01"  # framing bit

    out = bytearray()
    out += _page(serial, 0, 0, [ident], 0x02)  # BOS
    if codec == "vorbis" and vorbis_modes is not None:
        from .rawvorbis import build_setup  # noqa: PLC0415

        out += _page(serial, 1, 0, [tag, build_setup(n_modes=2,
                                                     channels=channels)], 0)
    else:
        out += _page(serial, 1, 0, [tag], 0)
    # audio pages with filler packets; granules advance to the total.
    # total_samples is already in granule units (48 kHz ticks for opus,
    # sample_rate ticks for vorbis) — no rate conversion happens here.
    total_gran = total_samples + (pre_skip if codec == "opus" else 0)
    for i in range(n_audio_pages):
        gran = total_gran * (i + 1) // n_audio_pages
        if codec == "theora":
            # granule packs (keyframe << shift) | delta; fixture
            # frames are all keyframes so the delta stays zero.
            # 3.2.1+ granules carry the frame COUNT; 3.2.0 the INDEX
            if theora_version < (3, 2, 1):
                gran = max(0, gran - 1)
            gran <<= theora_kfgshift
        flags = 0x04 if i == n_audio_pages - 1 else 0
        if opus_tocs is not None and codec == "opus":
            # no filler fallback: b"\x00"*40 would parse as a REAL
            # TOC (0x00 = silk-nb code 0) and pollute the census — a
            # page with zero packets (empty lacing table) is legal Ogg
            pkts = [
                bytes([t])
                + (bytes([0x02]) if t & 3 == 3 else b"")
                + b"\x00" * 40
                for j, t in enumerate(opus_tocs)
                if j % n_audio_pages == i
            ]
        elif vorbis_modes is not None and codec == "vorbis":
            from .rawvorbis import audio_packet  # noqa: PLC0415

            pkts = [
                audio_packet(m, 2)
                for j, m in enumerate(vorbis_modes)
                if j % n_audio_pages == i
            ]
        else:
            pkts = [b"\x00" * 300]
        out += _page(serial, 2 + i, gran, pkts, flags)
    return bytes(out)
