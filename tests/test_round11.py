"""Round-11 regression pins: the five round-10 ADVICE findings.

Each test pins the FIXED behavior of a spec-variant bug found by the
round-10 advisor review: TS resync stride confirmation, ID3v2.4
tag-level unsynchronisation, HEVC image-sequence brand classification,
version-fixed tkhd dimension offsets, and a hand-packed HEVC SPS
vector independent of the fixture encoder.
"""

from __future__ import annotations

import pytest

# ------------------------------------------------------------------ ts


def test_ts_resync_requires_stride_confirmed_sync():
    """A bare 0x47 inside junk must NOT re-lock the packet walk: only a
    candidate whose next 188-byte boundary is also a sync byte counts.
    Pre-fix the misaligned candidate below parsed as a packet with
    afc=3 / aflen=0xff and raised 'adaptation field over packet end'.
    """
    from rawdata_client_provider_gcs_spark.operators import rawts as T

    data = T.build_ts(duration_ms=2000, pes_per_stream=4)
    # splice 20 junk bytes after the PAT+PMT packets; the embedded
    # 0x47 at junk offset 5 is followed by hostile afc bytes (afc=3,
    # aflen=0xff would overrun the packet)
    junk = b"\x00" * 5 + b"\x47\x01\x00\x30\xff" + b"\x00" * 10
    cut = 2 * 188
    hostile = data[:cut] + junk + data[cut:]
    # fixture sanity: the misaligned candidate is NOT stride-confirmed
    # (its +188 byte is PES filler), the real resync target IS
    cand = cut + 5
    assert hostile[cand] == 0x47 and hostile[cand + 188] != 0x47
    real = cut + len(junk)
    assert hostile[real] == 0x47 and hostile[real + 188] == 0x47

    meta = T.parse_ts(hostile)
    clean = T.parse_ts(data)
    assert meta["n_sync_losses"] >= 1
    # every real packet after the junk still parses: stream census and
    # duration match the clean fixture
    assert meta["duration_ms"] == clean["duration_ms"]
    assert {s["pid"] for s in meta["streams"]} == {
        s["pid"] for s in clean["streams"]
    }


# ------------------------------------------------------------- id3v2.4


def test_id3v24_tag_level_unsync_flag():
    """ID3v2.4 writers may assert tag-level unsynchronisation (header
    flag 0x80) without per-frame 0x02 flags — the header flag declares
    ALL frames unsynchronised (id3v2.4.0-structure §3.1).  Pre-fix the
    escaped 0xFF 0x00 pairs survived into the decoded text."""
    from rawdata_client_provider_gcs_spark.operators import rawmp3 as M

    title = "A\xffB"  # latin-1 text with a byte that needs escaping
    body = bytes([0]) + title.encode("latin-1")
    escaped = body.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + M._to_syncsafe(len(escaped)) + b"\x00\x00" + escaped
    tag = b"ID3" + bytes([4, 0, 0x80]) + M._to_syncsafe(len(frame)) + frame
    out = M.id3_tags(tag)
    assert out["title"] == title
    assert out["source"] == "id3v2.4"
    # the per-frame 0x02 form (fixture default) still decodes too
    t2 = M.build_id3v2({"title": title}, version=4, unsync=True)
    assert M.id3_tags(t2)["title"] == title


# ----------------------------------------------------------------- heif


def test_heif_hevc_sequence_brands():
    """hevc/hevx are HEVC image-SEQUENCE brands (ISO 23008-12 §B.3) and
    must classify as heic-sequence even without msf1."""
    from rawdata_client_provider_gcs_spark.operators import rawheif as H

    base = H.build_heif(fmt="heic")
    assert H.parse_heif(base)["format"] == "heic"  # stills unchanged
    for brand in (b"hevc", b"hevx"):
        # patch the ftyp brands (major + compatible) in the header
        data = base[:40].replace(b"heic", brand) + base[40:]
        assert H.parse_heif(data)["format"] == "heic-sequence", brand


# ------------------------------------------------------------------ mp4


def _pad_tkhd(data: bytes, pad: int) -> bytes:
    """Append ``pad`` bytes of 0xDE inside the first tkhd box (after
    its canonical fields), fixing tkhd/trak/moov sizes — the
    trailing-padding shape some muxers emit."""
    start = data.find(b"tkhd") - 4
    size = int.from_bytes(data[start : start + 4], "big")
    out = bytearray(data[: start + size] + b"\xde" * pad + data[start + size :])
    out[start : start + 4] = (size + pad).to_bytes(4, "big")
    for anc in (b"moov", b"trak"):
        j = data.find(anc) - 4
        s = int.from_bytes(data[j : j + 4], "big")
        out[j : j + 4] = (s + pad).to_bytes(4, "big")
    return bytes(out)


@pytest.mark.parametrize("version1", [False, True])
def test_mp4_tkhd_padding_keeps_true_dimensions(version1):
    """tkhd width/height sit at version-fixed offsets (v0 body+76,
    v1 body+88); a padded tkhd body must not yield garbage dims read
    off box_end (pre-fix: 0xDEDE… fixed-point dimensions)."""
    from rawdata_client_provider_gcs_spark.operators import rawmp4 as M

    data = _pad_tkhd(
        M.build_mp4(video=(640, 360), version1=version1), pad=12
    )
    meta = M.parse_mp4(data)
    vid = next(t for t in meta["tracks"] if t.get("width"))
    assert (vid["width"], vid["height"]) == (640.0, 360.0)


# ----------------------------------------------------------------- hevc


def test_hevc_sps_hand_packed_vector():
    """Hand-derived HEVC SPS byte vector, independent of build_sps —
    a mirrored bug in the 96-bit profile_tier_level layout cannot pass
    this.  Derivation (H.265 §7.3.2.2.1, bit by bit):

      0000            sps_video_parameter_set_id = 0
      000             sps_max_sub_layers_minus1 = 0
      1               sps_temporal_id_nesting_flag
      00              general_profile_space
      0               general_tier_flag (Main tier)
      00001           general_profile_idc = 1 (Main)
      0110…(32b)      compatibility flags 0x60000000
      1011            progressive=1 interlaced=0 non_packed=1 frame_only=1
      0×43            reserved
      0               inbld/reserved
      01111011        general_level_idc = 123 (level 4.1)
      1               sps_seq_parameter_set_id ue(0)
      010             chroma_format_idc ue(1) = 4:2:0
      0×10 11110000001  pic_width_in_luma_samples ue(1920) (1921=0b11110000001)
      0×10 10001000001  pic_height_in_luma_samples ue(1088) (1089=0b10001000001)
      1               conformance_window_flag
      1 1 1           left/right/top offsets ue(0)
      00101           conf_win_bottom_offset ue(4) → 4×SubHeightC(2)=8 luma
      1 + align       rbsp_stop_one_bit

    RBSP escaped per §7.4.2 (the reserved-zero runs produce two
    00 00 03 emulation-prevention insertions), NAL header type 33.
    Cropped size: 1920 × (1088 − 8) = 1920 × 1080.
    """
    from rawdata_client_provider_gcs_spark.operators import rawhevc as HV

    nal = bytes.fromhex(
        "420101016000000300b0000003000003007ba003c0801107cb"
    )
    m = HV.parse_sps(nal)
    assert m["profile"] == "Main" and m["profile_idc"] == 1
    assert m["level"] == 4.1
    assert m["chroma_format_idc"] == 1
    assert (m["width"], m["height"]) == (1920, 1080)


# ------------------------------------------------------- xz/bz2 wrappers


class TestXzBz2Wrappers:
    """Transparent .tar.xz / .tar.bz2 wrapper peel (stdlib lzma/bz2,
    bounded, multi-stream) — the default source-dump shapes."""

    def _members(self):
        return [
            ("doc/1/a.txt", b"hello xz world" * 3),
            ("doc/1/b.txt", b"second member"),
        ]

    def test_roundtrip_all_shapes(self):
        import bz2
        import gzip
        import lzma

        from rawdata_client_provider_gcs_spark.sources import archive as A

        tar = A.build_tar(self._members())
        zp = A.build_zip(self._members())
        for blob, want in [
            (lzma.compress(tar), "tar.xz"),
            (bz2.compress(tar), "tar.bz2"),
            (lzma.compress(zp), "zip.xz"),
            (bz2.compress(zp), "zip.bz2"),
            (gzip.compress(lzma.compress(tar)), "tar.xz.gz"),
            (bz2.compress(gzip.compress(tar)), "tar.gz.bz2"),
        ]:
            fmt, ms = A.parse_archive(blob)
            assert fmt == want
            assert [m["path"] for m in ms] == ["doc/1/a.txt", "doc/1/b.txt"]
            assert ms[0]["payload"] == b"hello xz world" * 3

    def test_concatenated_streams(self):
        """pixz/pbzip2 emit concatenated independent streams — the
        decoder must restart on stream end, not stop at the first."""
        import bz2
        import lzma

        from rawdata_client_provider_gcs_spark.sources import archive as A

        tar = A.build_tar(self._members())
        for blob in (
            lzma.compress(tar[:512]) + lzma.compress(tar[512:]),
            bz2.compress(tar[:512]) + bz2.compress(tar[512:]),
        ):
            fmt, ms = A.parse_archive(blob)
            assert len(ms) == 2 and ms[1]["payload"] == b"second member"

    def test_hostile_truncated_and_corrupt(self):
        import bz2
        import lzma

        import pytest

        from rawdata_client_provider_gcs_spark.sources import archive as A

        tar = A.build_tar(self._members())
        with pytest.raises(ValueError, match="truncated xz"):
            A.parse_archive(lzma.compress(tar)[:40])
        with pytest.raises(ValueError, match="truncated bzip2"):
            A.parse_archive(bz2.compress(tar)[:20])
        corrupt = bytearray(bz2.compress(tar))
        corrupt[20] ^= 0xFF
        with pytest.raises(ValueError, match="corrupt bzip2"):
            A.parse_archive(bytes(corrupt))

    def test_bomb_cap(self):
        """A wrapper inflating past the cap trips the guard without
        materializing the bomb."""
        import lzma

        import pytest

        from rawdata_client_provider_gcs_spark.sources.archive import (
            _bunzip2_bounded,
            _unxz_bounded,
        )
        import bz2

        bomb = lzma.compress(b"\x00" * (1 << 22))
        with pytest.raises(ValueError, match="bomb"):
            _unxz_bounded(bomb, cap=1 << 16)
        with pytest.raises(ValueError, match="bomb"):
            _bunzip2_bounded(bz2.compress(b"\x00" * (1 << 22)), cap=1 << 16)

    def test_three_layer_chain_rejected(self):
        import bz2
        import gzip
        import lzma

        import pytest

        from rawdata_client_provider_gcs_spark.sources import archive as A

        tar = A.build_tar(self._members())
        with pytest.raises(ValueError, match="nested compression"):
            A.parse_archive(bz2.compress(gzip.compress(lzma.compress(tar))))

    def test_bzh_text_not_sniffed(self):
        """Plain tar content starting with 'BZh9' must not sniff as a
        bzip2 wrapper (the block pi-magic check)."""
        from rawdata_client_provider_gcs_spark.sources import archive as A

        tar = A.build_tar([("BZh9.txt", b"BZh9 looks like bzip2")])
        fmt, ms = A.parse_archive(tar)
        assert fmt == "tar" and ms[0]["payload"].startswith(b"BZh9")


# ------------------------------------------------------------------ vp9


class TestVP9Keyframe:
    def test_roundtrip_profiles(self):
        from rawdata_client_provider_gcs_spark.operators import rawvp9 as V

        for kw, want_depth in [
            (dict(width=640, height=360), 8),
            (dict(width=1920, height=1080, profile=2, bit_depth=10), 10),
            (dict(width=320, height=240, profile=1), 8),
            (dict(width=8192, height=4320, profile=3, bit_depth=12,
                  color_space=5), 12),
            (dict(width=100, height=50, render=(200, 100)), 8),
        ]:
            m = V.parse_keyframe_header(V.build_keyframe_header(**kw))
            assert (m["width"], m["height"]) == (kw["width"], kw["height"])
            assert m["bit_depth"] == want_depth
            if "render" in kw:
                assert (m["render_width"], m["render_height"]) == kw["render"]

    def test_hand_packed_vector(self):
        """Hand-derived byte vector, independent of the fixture writer
        (VP9 spec §6.2, bit by bit):

          10                frame_marker
          0 0               profile 0 (low bit, high bit)
          0                 show_existing_frame
          0                 frame_type = KEY
          1                 show_frame
          0                 error_resilient_mode
          0x498342 (24b)    frame_sync_code
          010               color_space = 2 (bt709)
          0                 color_range = studio
          0x04FF (16b)      frame_width_minus_1 = 1279
          0x02CF (16b)      frame_height_minus_1 = 719
          0                 render_and_frame_size_different
          + zero pad        (compressed data would follow)
        """
        from rawdata_client_provider_gcs_spark.operators import rawvp9 as V

        m = V.parse_keyframe_header(
            bytes.fromhex("82498342404ff02cf0") + b"\x00" * 8
        )
        assert (m["width"], m["height"]) == (1280, 720)
        assert m["profile"] == 0 and m["bit_depth"] == 8
        assert m["color_space"] == "bt709"
        assert m["subsampling"] == "11"  # profiles 0/2 are 4:2:0

    def test_hostile(self):
        import pytest

        from rawdata_client_provider_gcs_spark.operators import rawvp9 as V

        with pytest.raises(ValueError, match="shorter"):
            V.parse_keyframe_header(b"\x82\x49")
        with pytest.raises(ValueError, match="frame marker"):
            V.parse_keyframe_header(b"\x00" * 16)
        with pytest.raises(ValueError, match="sync"):
            V.parse_keyframe_header(b"\x82" + b"\x00" * 16)
        # inter frame (frame_type=1): loud boundary
        inter = bytearray(V.build_keyframe_header(width=64, height=64))
        inter[0] |= 0x04  # flip frame_type bit (bit 5 of byte 0)
        with pytest.raises(ValueError, match="keyframe"):
            V.parse_keyframe_header(bytes(inter))
        # fuzz: ValueError-only under random bytes
        import random

        rng = random.Random(11)
        for _ in range(300):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(24)))
            try:
                V.parse_keyframe_header(blob)
            except ValueError:
                pass

    def test_webm_cluster_carries_codec_dims(self):
        from rawdata_client_provider_gcs_spark.operators import rawwebm as W

        m = W.parse_webm(W.build_webm(vp9_keyframe=(1280, 720)))
        vid = next(t for t in m["tracks"] if t.get("track_type") == 1)
        # track header says 640x360, the codec says 1280x720 — codec wins
        assert (vid["width"], vid["height"]) == (640, 360)
        assert (vid["vp9_width"], vid["vp9_height"]) == (1280, 720)
        # no cluster -> no vp9 keys; corrupt sync -> dims absent, no raise
        assert "vp9_width" not in W.parse_webm(W.build_webm())["tracks"][0]
        blob = W.build_webm(vp9_keyframe=(1280, 720))
        bad = blob.replace(bytes.fromhex("498342"), b"\x00\x00\x00")
        assert "vp9_width" not in W.parse_webm(bad)["tracks"][0]


# ----------------------------------------------------------------- opus


class TestOpusToc:
    def test_config_table_matrix(self):
        """RFC 6716 Table 2, all 32 configs: mode/bandwidth boundaries
        and frame durations."""
        from rawdata_client_provider_gcs_spark.operators import rawogg as O

        for cfg in range(32):
            t = O.parse_opus_packet(bytes([cfg << 3, 0]))
            if cfg < 12:
                assert t["mode"] == "silk"
                assert t["frame_ms"] == (10, 20, 40, 60)[cfg % 4]
                assert t["bandwidth"] == ("nb", "mb", "wb")[cfg // 4]
            elif cfg < 16:
                assert t["mode"] == "hybrid"
                assert t["frame_ms"] == (10, 20)[cfg % 2]
                assert t["bandwidth"] == ("swb", "fb")[(cfg - 12) // 2]
            else:
                assert t["mode"] == "celt"
                assert t["frame_ms"] == (2.5, 5, 10, 20)[cfg % 4]
                assert t["bandwidth"] == ("nb", "wb", "swb", "fb")[
                    (cfg - 16) // 4
                ]

    def test_frame_count_codes(self):
        import pytest

        from rawdata_client_provider_gcs_spark.operators import rawogg as O

        assert O.parse_opus_packet(b"\x00x")["n_frames"] == 1
        assert O.parse_opus_packet(b"\x01x")["n_frames"] == 2
        assert O.parse_opus_packet(b"\x02x")["n_frames"] == 2
        assert O.parse_opus_packet(b"\x03\x05x")["n_frames"] == 5
        assert O.parse_opus_packet(b"\x04x")["stereo"] is True
        with pytest.raises(ValueError, match="count byte"):
            O.parse_opus_packet(b"\x03")
        with pytest.raises(ValueError, match="zero frames"):
            O.parse_opus_packet(b"\x03\x40")  # vbr flag set, M=0
        with pytest.raises(ValueError, match="120 ms"):
            # config 3 = silk 60 ms, 3 frames = 180 ms
            O.parse_opus_packet(bytes([(3 << 3) | 3, 3]))
        with pytest.raises(ValueError, match="empty"):
            O.parse_opus_packet(b"")

    def test_census_through_ogg(self):
        from rawdata_client_provider_gcs_spark.operators import rawogg as O

        tocs = [(1 << 3), (14 << 3) | 4, (28 << 3) | 3, (8 << 3) | 1]
        m = O.parse_ogg(O.build_ogg(codec="opus", opus_tocs=tocs))
        assert m["opus_packets"] == 4
        assert m["opus_modes"] == {"silk": 2, "hybrid": 1, "celt": 1}
        assert m["opus_frames"] == 6  # 1 + 1 + 2 (code3 count=2) + 2
        assert m["opus_toc_duration_ms"] == 55  # 20 + 10 + 2*2.5 + 2*10
        # vorbis streams carry no opus keys
        assert "opus_modes" not in O.parse_ogg(O.build_ogg(codec="vorbis"))


# ----------------------------------------------- round-11 review findings


def test_webm_huge_cluster_does_not_burn_the_budget():
    """A valid WebM whose first cluster holds >10k blocks must still
    parse (the cluster scan has its own local budget and breaks at 16
    collected blocks) — pre-fix it raised the hostile-input cap."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm as W

    base = W.build_webm(video=("V_VP9", 640, 360), audio=None)
    # segment body += one cluster of 10,001 tiny audio-track blocks
    block = W._el(0xA3, b"\x82" + b"\x00\x00" + b"\x00" + b"\x00" * 4)
    cluster = W._el(0x1F43B675, W._uint_el(0xE7, 0) + block * 10_001)
    # splice into the segment: rebuild with the cluster appended
    seg_at = base.find(bytes.fromhex("18538067"))
    seg_size, p = W.read_vint(base, seg_at + 4, keep_marker=False)
    body = base[p : p + seg_size] + cluster
    data = base[:seg_at] + W._el(0x18538067, body)
    m = W.parse_webm(data)
    assert m["n_tracks"] == 1  # full container metadata intact


def test_webm_infinite_duration_is_valueerror():
    """An inf Duration double must land as ValueError (per-row
    capture), not OverflowError out of int()."""
    import struct

    import pytest

    from rawdata_client_provider_gcs_spark.operators import rawwebm as W

    blob = W.build_webm(duration_ms=2000)
    fin = struct.pack(">d", 2000.0)
    assert fin in blob
    bad = blob.replace(fin, struct.pack(">d", float("inf")))
    with pytest.raises(ValueError, match="non-finite"):
        W.parse_webm(bad)


def test_ts_resync_recovers_last_packet_before_tail_garbage():
    """A re-lock candidate whose +188 boundary lands in trailing
    garbage must still be taken when its header is plausible — the
    stride check alone dropped the final packet(s)."""
    from rawdata_client_provider_gcs_spark.operators import rawts as T

    data = T.build_ts(duration_ms=1000, pes_per_stream=2,
                      streams=((0x1B, 0x100),))
    # keep PAT+PMT+first PES packet, splice junk, then the LAST packet
    # followed by >=188 bytes of non-TS garbage
    head, last = data[: 3 * 188], data[-188:]
    hostile = head + b"\x00" * 11 + last + b"\xAA" * 200
    meta = T.parse_ts(hostile)
    clean = T.parse_ts(data[: 3 * 188] + last)
    assert meta["n_packets"] == clean["n_packets"]  # last packet kept
    assert meta["duration_ms"] == clean["duration_ms"]


def test_opus_census_ignores_empty_pages():
    """Fewer TOCs than audio pages must not grow the census with
    filler packets (pre-fix the empty page's filler parsed as a
    phantom silk packet)."""
    from rawdata_client_provider_gcs_spark.operators import rawogg as O

    tocs = [(20 << 3), (20 << 3)]  # two celt-wb packets, 3 pages
    m = O.parse_ogg(O.build_ogg(codec="opus", opus_tocs=tocs))
    assert m["opus_packets"] == 2
    assert m["opus_modes"] == {"celt": 2}


# --------------------------------------------------------- ts aac es


def test_ts_aac_es_enrichment():
    """Stream type 0x0F's buffered ES head runs through the ADTS
    parser: rate/profile/channels surface per stream, the audio analog
    of the video SPS enrichment; filler-only fixtures stay clean."""
    from rawdata_client_provider_gcs_spark.operators import rawts as T

    m = T.parse_ts(T.build_ts(aac_es=(1, 2), h264_sps=(1280, 720)))
    aud = next(s for s in m["streams"] if s["stream_type"] == 0x0F)
    assert aud["sample_rate"] == 44100
    assert aud["channels"] == 2
    assert aud["profile"] == "AAC/LC"
    vid = next(s for s in m["streams"] if s["stream_type"] == 0x1B)
    assert (vid["width"], vid["height"]) == (1280, 720)
    # default fixture (zero filler ES): no false lock, fields absent
    aud2 = next(
        s
        for s in T.parse_ts(T.build_ts())["streams"]
        if s["stream_type"] == 0x0F
    )
    assert "sample_rate" not in aud2


# --------------------------------------------------- webm codec private


def test_webm_codec_private_records():
    """Matroska CodecPrivate = the ISO configuration record: avcC,
    hvcC, av1C run through the same parsers MP4 stsd uses; a damaged
    record leaves dims absent (per-row), never raises."""
    from rawdata_client_provider_gcs_spark.operators import (
        rawav1 as AV,
        rawh264 as A,
        rawhevc as HV,
        rawwebm as W,
    )

    cases = [
        ("V_MPEG4/ISO/AVC", "avc",
         A.build_avcc(A.build_sps(width=1920, height=1080)), (1920, 1080)),
        ("V_MPEGH/ISO/HEVC", "hevc",
         HV.build_hvcc(HV.build_sps(width=1280, height=720)), (1280, 720)),
        ("V_AV1", "av1", AV.build_av1c(width=640, height=360), (640, 360)),
    ]
    for cid, pre, cp, (w, h) in cases:
        m = W.parse_webm(W.build_webm(video=(cid, 320, 240),
                                      codec_private=cp))
        t = m["tracks"][0]
        assert (t[f"{pre}_width"], t[f"{pre}_height"]) == (w, h), cid
        assert t["width"] == 320  # the lying track header is kept too
    # corrupt record / absent record: dims absent, parse survives
    bad = W.parse_webm(W.build_webm(video=("V_MPEG4/ISO/AVC", 320, 240),
                                    codec_private=b"\x99bad"))
    assert "avc_width" not in bad["tracks"][0]
    none = W.parse_webm(W.build_webm(video=("V_MPEG4/ISO/AVC", 320, 240)))
    assert "avc_width" not in none["tracks"][0]


def test_ts_mpeg_audio_es_enrichment():
    """Stream types 0x03/0x04 (MPEG-1/2 audio) run through the MP3
    frame-header walk — Layer I fixture frames confirm a non-L3 layer
    surfaces; filler-only fixtures stay clean."""
    from rawdata_client_provider_gcs_spark.operators import rawts as T

    m = T.parse_ts(
        T.build_ts(streams=((0x1B, 0x100), (0x03, 0x102)), mp3_es=True)
    )
    aud = next(s for s in m["streams"] if s["stream_type"] == 0x03)
    assert aud["sample_rate"] == 48000
    assert aud["profile"] == "MPEG1/L1"
    assert aud["channels"] == 1
    clean = T.parse_ts(
        T.build_ts(streams=((0x1B, 0x100), (0x03, 0x102)))
    )
    assert "sample_rate" not in next(
        s for s in clean["streams"] if s["stream_type"] == 0x03
    )


def test_webm_audio_codec_private():
    """A_OPUS CodecPrivate is an OpusHead; A_VORBIS is the Xiph-laced
    header packets (255-continued sizes) — both codec-authoritative
    over the track fields; damage leaves fields absent."""
    from rawdata_client_provider_gcs_spark.operators import rawwebm as W

    oh = (
        b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little")
        + (48000).to_bytes(4, "little") + bytes(3)
    )
    m = W.parse_webm(
        W.build_webm(audio=("A_OPUS", 2, 48000), audio_codec_private=oh)
    )
    aud = next(t for t in m["tracks"] if t.get("track_type") == 2)
    assert (aud["opus_channels"], aud["opus_pre_skip"],
            aud["opus_input_sample_rate"]) == (2, 312, 48000)

    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([4])
        + (96000).to_bytes(4, "little") + bytes(300 - 16)
    )
    comment = b"\x03vorbis" + bytes(10)
    # first size 300 needs a 255-continuation byte
    cp = (
        bytes([2]) + b"\xff" + bytes([300 - 255]) + bytes([len(comment)])
        + ident + comment + b"\x05vorbis" + bytes(20)
    )
    m = W.parse_webm(
        W.build_webm(audio=("A_VORBIS", 2, 44100), audio_codec_private=cp)
    )
    aud = next(t for t in m["tracks"] if t.get("track_type") == 2)
    assert (aud["vorbis_channels"], aud["vorbis_sample_rate"]) == (4, 96000)

    # truncated OpusHead / truncated lacing: absent, never raises
    for codec, blob, key in [
        ("A_OPUS", b"OpusHead", "opus_channels"),
        ("A_VORBIS", b"\x02\xff", "vorbis_channels"),
    ]:
        m = W.parse_webm(
            W.build_webm(audio=(codec, 2, 48000), audio_codec_private=blob)
        )
        assert key not in next(
            t for t in m["tracks"] if t.get("track_type") == 2
        )


# -------------------------------------------------------------- .Z (LZW)


class TestCompressZ:
    """compress(1) .Z: pure-Python LZW with the eight-code group
    alignment; the encoder is interop-verified against the system
    uncompress, which transitively pins the decoder (roundtrip of
    spec-true streams)."""

    def _cases(self):
        import random

        rng = random.Random(7)
        text = "".join(f"tok{i % 997} " for i in range(60_000)).encode()
        return [
            ("empty", b""),
            ("single", b"a"),
            ("runs", b"ab" * 200_000),
            ("text", text),
            ("random", bytes(rng.randrange(256) for _ in range(150_000))),
        ]

    def test_roundtrip_all_widths(self):
        from rawdata_client_provider_gcs_spark.sources import compression as C

        for desc, data in self._cases():
            assert C.z_decompress(C.z_compress(data)) == data, desc
        # every maxbits setting
        blob = b"xyz " * 50_000
        for mb in range(9, 17):
            assert C.z_decompress(C.z_compress(blob, maxbits=mb)) == blob

    def test_uncompress_interop(self):
        """The real tool must decode our encoder byte-for-byte — pins
        the group-alignment rule against ncompress, not a mirror."""
        import os
        import shutil
        import subprocess
        import tempfile

        import pytest

        from rawdata_client_provider_gcs_spark.sources import compression as C

        if shutil.which("uncompress") is None:
            pytest.skip("no system uncompress binary")
        for desc, data in self._cases():
            with tempfile.NamedTemporaryFile(
                suffix=".Z", delete=False
            ) as f:
                f.write(C.z_compress(data))
                path = f.name
            try:
                r = subprocess.run(
                    ["uncompress", "-c", path], capture_output=True
                )
            finally:
                os.unlink(path)
            assert r.returncode == 0 and r.stdout == data, desc

    def test_hostile(self):
        import pytest

        from rawdata_client_provider_gcs_spark.sources import compression as C

        with pytest.raises(ValueError, match="magic"):
            C.z_decompress(b"\x00\x00\x00")
        with pytest.raises(ValueError, match="maxbits"):
            C.z_decompress(b"\x1f\x9d\x88")  # maxbits 8
        with pytest.raises(ValueError, match="bomb"):
            C.z_decompress(C.z_compress(b"\x00" * (1 << 20)), cap=1 << 10)
        # a code pointing past the dictionary
        with pytest.raises(ValueError, match="dictionary"):
            C.z_decompress(b"\x1f\x9d\x90" + b"\xff\xff\xff\xff")

    def test_tar_z_wrapper(self):
        from rawdata_client_provider_gcs_spark.sources import (
            archive as A,
            compression as C,
        )

        tar = A.build_tar([("a.txt", b"hello Z"), ("b.txt", b"two")])
        fmt, ms = A.parse_archive(C.z_compress(tar))
        assert fmt == "tar.Z" and [m["path"] for m in ms] == [
            "a.txt", "b.txt"
        ]
        import gzip

        fmt, _ = A.parse_archive(gzip.compress(C.z_compress(tar)))
        assert fmt == "tar.Z.gz"


# ------------------------------------------------------------------ cpio


class TestCpio:
    MS = [("a.txt", b"cpio member one"), ("d/b.bin", bytes(range(64))),
          ("empty", b"")]

    def test_roundtrip_both_formats(self):
        from rawdata_client_provider_gcs_spark.sources import archive as A

        for fmt in ("newc", "odc"):
            got = A.parse_cpio(A.build_cpio(self.MS, fmt=fmt))
            assert [(m["path"], m["payload"]) for m in got] == self.MS, fmt

    def test_bsdtar_interop_both_directions(self, tmp_path):
        import shutil
        import subprocess

        import pytest

        from rawdata_client_provider_gcs_spark.sources import archive as A

        bsdtar = shutil.which("bsdtar")
        if bsdtar is None:
            pytest.skip("no system bsdtar")
        src = tmp_path / "in"
        (src / "sub").mkdir(parents=True)
        (src / "a.txt").write_bytes(b"alpha cpio content")
        (src / "sub" / "b.txt").write_bytes(b"beta")
        for opt in ("cpio", "odc"):
            path = tmp_path / f"{opt}.cpio"
            r = subprocess.run(
                [bsdtar, "-cf", str(path), "--format", opt,
                 "a.txt", "sub/b.txt"],
                cwd=src, capture_output=True,
            )
            assert r.returncode == 0, r.stderr
            ms = {m["path"]: m["payload"]
                  for m in A.parse_cpio(path.read_bytes())}
            assert ms["a.txt"] == b"alpha cpio content"
            assert ms["sub/b.txt"] == b"beta"
        for fmt in ("newc", "odc"):
            mine = tmp_path / f"mine_{fmt}.cpio"
            mine.write_bytes(A.build_cpio(self.MS, fmt=fmt))
            out = tmp_path / f"x_{fmt}"
            out.mkdir()
            r = subprocess.run(
                [bsdtar, "-xf", str(mine), "-C", str(out)],
                capture_output=True,
            )
            assert r.returncode == 0, (fmt, r.stderr)
            for name, payload in self.MS:
                assert (out / name).read_bytes() == payload, (fmt, name)

    def test_initramfs_shape_and_hostility(self):
        import gzip

        import pytest

        from rawdata_client_provider_gcs_spark.sources import archive as A

        blob = A.build_cpio([("init", b"#!/bin/sh")], fmt="newc")
        fmt, ms = A.parse_archive(gzip.compress(blob))
        assert fmt == "cpio.gz" and ms[0]["path"] == "init"
        with pytest.raises(ValueError, match="trailer|truncated"):
            A.parse_cpio(blob[:-20])
        with pytest.raises(ValueError, match="magic"):
            A.parse_cpio(b"070700" + b"0" * 120)
        with pytest.raises(ValueError, match="non-hex"):
            A.parse_cpio(b"070701" + b"zz" * 52 + b"\x00" * 8)
        with pytest.raises(ValueError, match="guard"):
            hdr = A.build_cpio([("big", b"x" * 100)], fmt="newc")
            A.parse_cpio(hdr, cap=16)
