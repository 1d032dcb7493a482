"""Ogg (Vorbis/Opus) and MP4/ISO-BMFF container-metadata tiers.

Durations, layouts and tags are pinned by hand-derived closed forms
(granule arithmetic, box layouts); the fixture writers are trusted for
byte layout only.  PCM/codec-payload decode stays the per-row
UnsupportedCodecError boundary, checked through the Spark kernels."""

from __future__ import annotations

import random

import pytest

from rawdata_client_provider_gcs_spark.operators import rawmp4 as M4
from rawdata_client_provider_gcs_spark.operators import rawogg as O


# ---------------------------------------------------------------- ogg


def test_ogg_vorbis_metadata_hand_derived():
    b = O.build_ogg(codec="vorbis", channels=2, sample_rate=44100,
                    total_samples=88200, comments={"TITLE": "Søng"})
    m = O.parse_ogg(b)
    assert m["codec"] == "vorbis" and m["channels"] == 2
    assert m["sample_rate"] == 44100
    assert m["duration_ms"] == 88200 * 1000 // 44100 == 2000
    assert m["comments"]["TITLE"] == "Søng"
    assert m["bitrate_nominal"] == 128000
    assert m["crc_failures"] == 0


def test_ogg_opus_pre_skip_and_48k_granules():
    b = O.build_ogg(codec="opus", channels=1, total_samples=96000,
                    pre_skip=312)
    m = O.parse_ogg(b)
    assert m["codec"] == "opus" and m["sample_rate"] == 48000
    assert m["pre_skip"] == 312
    # granule ticks at 48 kHz and pre-skip is subtracted
    assert m["duration_ms"] == 96000 * 1000 // 48000 == 2000


def test_ogg_crc_failure_counted_not_fatal():
    bb = bytearray(O.build_ogg())
    bb[-5] ^= 0xFF  # corrupt an audio page body
    m = O.parse_ogg(bytes(bb))
    assert m["crc_failures"] >= 1
    assert m["codec"] == "vorbis"  # headers still parse


def test_ogg_packet_spans_pages():
    """A comment packet larger than one page continues via the
    255-lacing rule across a page boundary (hand-built two-page split)."""
    big = O.build_ogg(comments={"K": "v" * 700})
    assert O.parse_ogg(big)["comments"]["K"] == "v" * 700
    # hand-split: page 2 carries the first 255 bytes of the tag packet
    # (lacing [255] = continues), page 3 the rest with the continuation
    # flag set
    ident = None
    pages = list(O.parse_pages(big))
    tag_packet = None
    for htype, gran, serial, seq, segs, ok in pages:
        for seg, cont in segs:
            if seg[:7] == b"\x03vorbis":
                tag_packet = seg
    assert tag_packet is not None
    first, rest = tag_packet[:255], tag_packet[255:]
    ident = (
        b"\x01vorbis" + bytes(4) + bytes([2])
        + (44100).to_bytes(4, "little") + bytes(14)
    )
    p1 = O._page(7, 0, 0, [ident], 0x02)
    # continued packet: emit the 255-byte prefix with NO terminating
    # lacing value (255 means "continues"), then the rest on the next
    # page with the continuation header flag
    hdr = bytearray(b"OggS") + bytes([0, 0]) + (0).to_bytes(8, "little")
    hdr += (7).to_bytes(4, "little") + (1).to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00" + bytes([1, 255])
    page2 = bytes(hdr) + first
    page2 = page2[:22] + O.ogg_crc(page2).to_bytes(4, "little") + page2[26:]
    p3 = O._page(7, 2, 0, [rest], 0x01)
    p4 = O._page(7, 3, 44100, [b"\x00" * 10], 0x04)
    m = O.parse_ogg(p1 + page2 + p3 + p4)
    assert m["comments"]["K"] == "v" * 700
    assert m["duration_ms"] == 1000


def test_ogg_hostile_and_boundary():
    with pytest.raises(ValueError):
        O.parse_ogg(b"not ogg at all")
    with pytest.raises(ValueError):
        O.parse_ogg(b"OggS" + b"\x00" * 10)  # truncated header
    # Opus PCM stays the loud boundary; a Vorbis stream without a
    # setup header is now CORRUPTION for the real decoder (vorbisdec)
    with pytest.raises(O.UnsupportedCodecError):
        O.decode_ogg_pcm(O.build_ogg(codec="opus"))
    with pytest.raises(ValueError, match="lacks ident or setup"):
        O.decode_ogg_pcm(O.build_ogg())
    rng = random.Random(2)
    for _ in range(200):
        blob = b"OggS" + rng.randbytes(rng.randrange(0, 300))
        try:
            O.parse_ogg(blob)
        except ValueError:
            pass


# ---------------------------------------------------------------- mp4


def test_mp4_metadata_hand_derived():
    b = M4.build_mp4(duration_ms=2500, video=(640, 360), audio=(2, 44100))
    m = M4.parse_mp4(b)
    assert m["duration_ms"] == 2500 and m["major_brand"] == "isom"
    assert m["brands"] == ["isom", "mp42"] and m["n_tracks"] == 2
    vt = [t for t in m["tracks"] if t.get("handler") == "vide"][0]
    at = [t for t in m["tracks"] if t.get("handler") == "soun"][0]
    assert vt["codec"] == "avc1" and (vt["width"], vt["height"]) == (640.0, 360.0)
    assert at["codec"] == "mp4a" and at["channels"] == 2
    assert at["sample_rate"] == 44100
    assert vt["duration_ms"] == 2500 and vt["n_samples"] == 50


def test_mp4_version1_and_large_boxes():
    m = M4.parse_mp4(M4.build_mp4(duration_ms=1000, version1=True,
                                  large_mdat=True))
    assert m["duration_ms"] == 1000 and m["n_tracks"] == 2


def test_mp4_audio_only():
    m = M4.parse_mp4(M4.build_mp4(video=None, audio=(1, 16000)))
    assert m["n_tracks"] == 1
    assert m["tracks"][0]["sample_rate"] == 16000


def test_mp4_hostile_and_boundary():
    with pytest.raises(ValueError):
        M4.parse_mp4(b"\x00" * 4)
    with pytest.raises(ValueError):
        M4.parse_mp4(b"\x00\x00\x00\x10ftypisom" + b"\x00" * 8)  # no moov
    # lying box size
    blob = bytearray(M4.build_mp4())
    blob[0:4] = (1 << 30).to_bytes(4, "big")
    with pytest.raises(ValueError):
        M4.parse_mp4(bytes(blob))
    with pytest.raises(M4.UnsupportedCodecError):
        M4.decode_mp4_media(M4.build_mp4())
    rng = random.Random(5)
    for _ in range(300):
        blob = bytearray(M4.build_mp4())
        k = rng.randrange(3)
        if k == 0:
            for _ in range(rng.randrange(1, 5)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        elif k == 1:
            blob = blob[: rng.randrange(len(blob))]
        else:
            blob = bytearray(rng.randbytes(rng.randrange(8, 200)))
        try:
            M4.parse_mp4(bytes(blob))
        except ValueError:
            pass


def test_mp4_box_bomb_guards():
    # deep nesting
    body = b""
    for _ in range(20):
        body = (8 + len(body)).to_bytes(4, "big") + b"moov" + body
    with pytest.raises(ValueError, match="depth|moov"):
        M4.parse_mp4(body)
    # box-count flood: thousands of tiny boxes
    flood = (b"\x00\x00\x00\x08free") * 20000
    with pytest.raises(ValueError, match="cap|moov"):
        M4.parse_mp4(flood)


# ----------------------------------------------------- spark boundary


def test_spark_per_row_boundaries(spark):
    from rawdata_client_provider_gcs_spark.operators import multimodal

    from rawdata_client_provider_gcs_spark.operators import vorbisdec

    rows = [
        (1, bytearray(O.build_ogg(codec="opus"))),
        (2, bytearray(b"\x00noise" * 20)),
        (3, bytearray(O.build_ogg())),  # vorbis without setup: corrupt
        (4, bytearray(vorbisdec.build_pcm_ogg([(5, 2), (5, 2)]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = multimodal.with_media_columns(df, "blob", "audio/ogg", "doc_id")
    got = {r["doc_id"]: r
           for r in multimodal.extract_features(media).collect()}
    assert got[1]["error"].startswith("UnsupportedCodecError")
    assert got[2]["error"].startswith("MediaDecodeError")
    assert got[3]["error"].startswith("ValueError")
    # real Vorbis PCM decodes: 32 mono samples at 8 kHz
    assert got[4]["error"] is None
    feats = got[4]["features"]
    assert feats[1] == 1.0 and feats[2] == 8000.0
    assert abs(feats[0] - 32 / 8000) < 1e-12

    rows = [
        (1, bytearray(M4.build_mp4())),
        (2, bytearray(b"\x00noise" * 20)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = multimodal.with_media_columns(df, "blob", "video/mp4", "doc_id")
    out = {r["doc_id"]: r["error"]
           for r in multimodal.extract_features(media).collect()}
    assert out[1].startswith("UnsupportedCodecError")
    assert out[2].startswith("MediaDecodeError")


# --------------------------------------------------------------- webm


def test_webm_metadata_hand_derived():
    from rawdata_client_provider_gcs_spark.operators import rawwebm as WM

    b = WM.build_webm(duration_ms=2345, video=("V_VP9", 1280, 720),
                      audio=("A_OPUS", 2, 48000))
    m = WM.parse_webm(b)
    assert m["doc_type"] == "webm" and m["duration_ms"] == 2345
    vt = [t for t in m["tracks"] if t["track_type"] == 1][0]
    at = [t for t in m["tracks"] if t["track_type"] == 2][0]
    assert vt["codec_id"] == "V_VP9" and (vt["width"], vt["height"]) == (1280, 720)
    assert at["codec_id"] == "A_OPUS" and at["channels"] == 2
    assert at["sample_rate"] == 48000.0


def test_webm_unknown_size_segment_and_timecode_scale():
    from rawdata_client_provider_gcs_spark.operators import rawwebm as WM

    m = WM.parse_webm(WM.build_webm(unknown_size_segment=True,
                                    duration_ms=1500))
    assert m["duration_ms"] == 1500 and m["n_tracks"] == 2
    m = WM.parse_webm(WM.build_webm(doc_type="matroska",
                                    timecode_scale=500_000,
                                    duration_ms=3000))
    assert m["doc_type"] == "matroska"
    assert m["timecode_scale_ns"] == 500_000
    assert m["duration_ms"] == 3000


def test_webm_vint_edges():
    from rawdata_client_provider_gcs_spark.operators import rawwebm as WM

    # 1-byte vint: 0x81 -> 1 (size), id keeps marker
    assert WM.read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert WM.read_vint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    # 2-byte: 0x40 0x7F -> 127
    assert WM.read_vint(b"\x40\x7f", 0, keep_marker=False) == (127, 2)
    with pytest.raises(ValueError):
        WM.read_vint(b"\x00\x01", 0, keep_marker=False)
    with pytest.raises(ValueError):
        WM.read_vint(b"\x40", 0, keep_marker=False)  # truncated


def test_webm_hostile_and_boundary():
    from rawdata_client_provider_gcs_spark.operators import rawwebm as WM

    with pytest.raises(ValueError):
        WM.parse_webm(b"RIFF....")
    with pytest.raises(ValueError):
        WM.parse_webm(b"\x1a\x45\xdf\xa3")  # header only, no segment
    with pytest.raises(WM.UnsupportedCodecError):
        WM.decode_webm_media(WM.build_webm())
    rng = random.Random(7)
    good = WM.build_webm()
    for _ in range(300):
        blob = bytearray(good)
        k = rng.randrange(3)
        if k == 0:
            for _ in range(rng.randrange(1, 5)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        elif k == 1:
            blob = blob[: rng.randrange(len(blob))]
        else:
            blob = bytearray(b"\x1a\x45\xdf\xa3" + rng.randbytes(200))
        try:
            WM.parse_webm(bytes(blob))
        except ValueError:
            pass


def test_frames_kernel_per_row_for_container_mimes(spark):
    """sample_frames must capture audio/mp4, video/mp4, application/ogg
    and corrupt container payloads PER ROW — never kill the job with
    NotImplementedError (review finding, round 9)."""
    from rawdata_client_provider_gcs_spark.operators import multimodal

    rows = [
        (1, bytearray(M4.build_mp4()), "audio/mp4"),
        (2, bytearray(O.build_ogg(codec="opus")), "application/ogg"),
        (3, bytearray(b"\x00garbage" * 8), "video/mp4"),
        (4, bytearray(b"\x00garbage" * 8), "audio/ogg"),
    ]
    for did, blob, mime in rows:
        df = spark.createDataFrame([(did, blob)], "doc_id long, blob binary")
        media = multimodal.with_media_columns(df, "blob", mime, "doc_id")
        out = multimodal.sample_frames(media).collect()
        assert len(out) == 1
        err = out[0]["error"]
        assert err is not None and (
            err.startswith("UnsupportedCodecError")
            or err.startswith("MediaDecodeError")
        ), (mime, err)


def test_mp4_truncated_version_boxes_raise_value_error():
    """Empty-bodied mvhd/tkhd/mdhd must land on ValueError, not
    IndexError (review finding, round 9)."""
    with pytest.raises(ValueError):
        M4.parse_mp4(b"\x00\x00\x00\x10moov\x00\x00\x00\x08mvhd")
    body = b"\x00\x00\x00\x08tkhd"
    trak = (8 + len(body)).to_bytes(4, "big") + b"trak" + body
    moov = (8 + len(trak)).to_bytes(4, "big") + b"moov" + trak
    with pytest.raises(ValueError):
        M4.parse_mp4(moov)


# --------------------------------------------------------------- exif


def test_exif_fields_and_gps_hand_derived():
    from rawdata_client_provider_gcs_spark.operators import rawexif as E

    j = E.build_exif_jpeg(orientation=6, gps=(59.5, -10.25),
                          datetime_str="2021:06:07 08:09:10")
    m = E.exif_meta(j)
    assert m["orientation"] == 6 and m["make"] == "FixtureCam"
    assert m["datetime"] == "2021:06:07 08:09:10"
    # 59.5 = 59° 30' 0" exactly; -10.25 = 10° 15' 0" W
    assert m["has_gps"] and m["gps_lat"] == 59.5 and m["gps_lon"] == -10.25
    m = E.exif_meta(E.build_exif_jpeg())
    assert m["has_gps"] is False and m["orientation"] == 1


def test_exif_absence_is_data_not_error():
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import (
        rawexif as E,
        rawjpeg,
        rawtiff,
    )

    img = np.full((8, 8, 3), 77, np.uint8)
    assert E.exif_meta(rawjpeg.encode_jpeg(img)) == {"has_gps": False}
    assert E.exif_meta(rawtiff.encode_tiff(img[:, :, 0]))["has_gps"] is False
    assert E.exif_meta(b"not an image") == {"has_gps": False}


def test_exif_hostile_lands_on_value_error():
    import random

    from rawdata_client_provider_gcs_spark.operators import rawexif as E

    good = E.build_exif_jpeg(gps=(1.5, 2.25))
    rng = random.Random(3)
    for _ in range(200):
        blob = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(12, len(blob))] = rng.randrange(256)
        try:
            E.exif_meta(bytes(blob))
        except ValueError:
            pass


def test_review_r9_final_fixes():
    """Fourth-review regressions: nested-gzip bound, zlib.error capture,
    mboxrd quoting symmetry, rational IFD pointers, JPEG fill bytes."""
    import gzip
    import struct

    from rawdata_client_provider_gcs_spark.operators import rawexif as E
    from rawdata_client_provider_gcs_spark.sources import archive as A
    from rawdata_client_provider_gcs_spark.sources import mail as ML

    deep = A.build_tar([("a", b"x")])
    for _ in range(50):
        deep = gzip.compress(deep)
    with pytest.raises(ValueError, match="nested compression"):
        A.parse_archive(deep)
    fmt, ms = A.parse_archive(gzip.compress(gzip.compress(A.build_tar([("a", b"x")]))))
    assert fmt == "tar.gz.gz" and len(ms) == 1

    blob = bytearray(gzip.compress(b"payload" * 100))
    blob[18] ^= 0xFF
    with pytest.raises(ValueError, match="gzip"):
        A.parse_archive(bytes(blob))

    msgs = [{"sender": "a@x", "subject": "s", "message_id": "<1@x>",
             "body": "keep\n>From quoted line stays\nend"}]
    out = ML.parse_mailbox(ML.build_mbox(msgs))
    assert ">From quoted line stays" in out[0]["body"]

    j = bytearray(E.build_exif_jpeg(gps=(1.5, 2.25)))
    idx = bytes(j).find(struct.pack("<HH", 0x8825, 4))
    j[idx + 2 : idx + 4] = struct.pack("<H", 5)  # pointer declared RATIONAL
    with pytest.raises(ValueError, match="non-integer"):
        E.exif_meta(bytes(j))

    good = E.build_exif_jpeg(orientation=3)
    assert E.exif_meta(good[:2] + b"\xff\xff\xff" + good[2:])["orientation"] == 3


def test_assign_threads_duplicate_message_ids(spark):
    """Cross-posted/re-crawled duplicate Message-IDs must not multiply
    rows through the pointer-jumping self-joins."""
    from rawdata_client_provider_gcs_spark.sources.mail import assign_threads

    rows = [("<a>", ""), ("<a>", ""), ("<b>", "<a>"), ("<b>", "<a>")]
    df = spark.createDataFrame(rows, "message_id string, in_reply_to string")
    out = assign_threads(df, max_hops=3).collect()
    assert len(out) == 4  # one thread_id per original row, no blowup
    assert all(r["thread_id"] == "<a>" for r in out)


def test_assign_threads_cycles_terminate(spark):
    from rawdata_client_provider_gcs_spark.sources.mail import assign_threads

    rows = [("<a>", "<b>"), ("<b>", "<a>"), ("<c>", "<d>"),
            ("<d>", "<e>"), ("<e>", "<c>")]
    df = spark.createDataFrame(rows, "message_id string, in_reply_to string")
    out = {r["message_id"]: r["thread_id"]
           for r in assign_threads(df, max_hops=4).collect()}
    # 2-cycle stabilizes with each message rooting at itself
    assert out["<a>"] == "<a>" and out["<b>"] == "<b>"
    # longer cycles terminate with SOME root (corrupt data, bounded)
    assert all(out[k] in ("<c>", "<d>", "<e>") for k in ("<c>", "<d>", "<e>"))


def test_speex_and_theora_ident_parse():
    """The remaining Ogg codecs: Speex rate/mode/channels, Theora
    geometry + kfgshift-split granule duration."""
    sp = O.build_ogg(codec="speex", channels=2, sample_rate=32000,
                     speex_mode=2, total_samples=96000)
    m = O.parse_ogg(sp)
    assert (m["codec"], m["channels"], m["sample_rate"]) == (
        "speex", 2, 32000,
    )
    assert m["speex_mode"] == "ultra-wideband"
    assert m["duration_ms"] == 3000
    # SpeexHeader layout: frame_size@56, frames_per_packet@64 — the
    # review-found off-by-8 read returned frame_size here
    assert m["speex_frames_per_packet"] == 1
    assert m["speex_frame_size"] == 160 << 2
    th = O.build_ogg(codec="theora", width=334, height=242,
                     fps_num=30000, fps_den=1001, total_samples=90,
                     comments={"TITLE": "tv"})
    m = O.parse_ogg(th)
    assert (m["pic_width"], m["pic_height"]) == (334, 242)
    # frame geometry rounds up to whole macroblocks
    assert (m["frame_width"], m["frame_height"]) == (336, 256)
    assert m["n_frames"] == 90 and m["duration_ms"] == 3003
    assert m["theora_version"] == "3.2.1"
    assert m["comments"]["TITLE"] == "tv"  # \x81theora comment packet


def test_theora_granule_version_bias():
    """Bitstream 3.2.0 granules carry the frame INDEX, 3.2.1+ the
    frame COUNT (Theora I spec §A.1, libtheora th_granule_frame) —
    both version forms must report the same frame total."""
    for ver in ((3, 2, 0), (3, 2, 1), (3, 2, 2)):
        th = O.build_ogg(codec="theora", fps_num=25, fps_den=1,
                         total_samples=50, theora_version=ver)
        m = O.parse_ogg(th)
        assert m["theora_version"] == ".".join(map(str, ver))
        assert m["n_frames"] == 50, ver
        assert m["duration_ms"] == 2000, ver


def test_speex_theora_hostiles():
    # short speex header
    blob = O.build_ogg(codec="speex")
    idx = blob.find(b"Speex   ")
    short = blob[:idx + 40]  # truncate inside the header packet
    # rebuild a page carrying only the truncated ident
    page = O._page(1, 0, 0, [short[idx:]], 2)
    with pytest.raises(ValueError, match="short Speex"):
        O.parse_ogg(page)
    # zero theora frame rate
    th = bytearray(O.build_ogg(codec="theora"))
    i = th.find(b"\x80theora")
    th[i + 22 : i + 26] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="zero Theora frame rate"):
        O.parse_ogg(bytes(th))
    # short theora ident
    page = O._page(1, 0, 0, [b"\x80theora" + b"\x00" * 10], 2)
    with pytest.raises(ValueError, match="short Theora"):
        O.parse_ogg(page)
