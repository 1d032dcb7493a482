"""MPEG audio metadata tier (rawmp3) — ISO 11172-3 frame arithmetic.

Frame lengths and durations are pinned by HAND-DERIVED values (the
bitrate/sample-rate tables and the spf/8*bitrate/rate+padding formula
are closed-form), not by encoder mirroring; the fixture writer is only
trusted for byte layout."""

from __future__ import annotations

import random

import pytest

from rawdata_client_provider_gcs_spark.operators import rawmp3 as M


def test_frame_lengths_hand_derived():
    # MPEG1 L3 128kbps @ 44100: 144*128000/44100 = 417 (floor)
    b = M.build_mp3(1, bitrate_index=9, samplerate_index=0)
    assert len(b) == 417
    # with padding: 418
    b = M.build_mp3(1, bitrate_index=9, samplerate_index=0, pad_every=1)
    assert len(b) == 418
    # MPEG1 L3 320kbps @ 48000: 144*320000/48000 = 960
    assert len(M.build_mp3(1, bitrate_index=14, samplerate_index=1)) == 960
    # MPEG1 L2 128kbps @ 48000: 144*128000/48000 = 384
    assert len(M.build_mp3(1, layer=2, bitrate_index=8, samplerate_index=1)) == 384
    # MPEG1 L1 96kbps @ 32000: (12*96000/32000 + 0)*4 = 144
    assert len(M.build_mp3(1, layer=1, bitrate_index=3, samplerate_index=2)) == 144
    # MPEG2 L3 64kbps @ 24000: 72*64000/24000 = 192
    assert len(
        M.build_mp3(1, version_bits=2, bitrate_index=8, samplerate_index=1)
    ) == 192


def test_header_field_decode():
    # hand-built header: FF FB 90 00 = MPEG1 L3, no CRC, 128k, 44100,
    # no pad, stereo
    h = M.parse_frame_header(b"\xff\xfb\x90\x00", 0)
    assert h["version"] == "MPEG1" and h["layer"] == 3
    assert not h["crc"] and h["bitrate"] == 128000
    assert h["sample_rate"] == 44100 and h["padding"] == 0
    assert h["channel_mode"] == "stereo" and h["channels"] == 2
    assert h["frame_len"] == 417
    # protection bit 0 -> CRC present
    h = M.parse_frame_header(b"\xff\xfa\x90\x00", 0)
    assert h["crc"]
    # free-format and bad indices rejected
    assert M.parse_frame_header(b"\xff\xfb\x00\x00", 0) is None
    assert M.parse_frame_header(b"\xff\xfb\xf0\x00", 0) is None
    assert M.parse_frame_header(b"\xff\xfb\x9c\x00", 0) is None  # sr=3
    assert M.parse_frame_header(b"\xff\xeb\x90\x00", 0) is None  # ver=1


def test_durations_hand_derived():
    # 40 frames * 1152 samples / 44100 Hz = 1044.89... -> 1044 ms
    m = M.parse_mp3(M.build_mp3(40))
    assert m["duration_ms"] == 40 * 1152 * 1000 // 44100 == 1044
    # Layer I: 384 samples/frame @ 32000 -> 25 frames = 300 ms
    m = M.parse_mp3(M.build_mp3(25, layer=1, bitrate_index=4, samplerate_index=2))
    assert m["duration_ms"] == 25 * 384 * 1000 // 32000 == 300
    # MPEG2 L3: 576 samples @ 24000
    m = M.parse_mp3(M.build_mp3(10, version_bits=2, samplerate_index=1,
                                bitrate_index=8))
    assert m["duration_ms"] == 10 * 576 * 1000 // 24000 == 240


def test_id3_and_xing():
    b = M.build_mp3(9, version_bits=2, bitrate_index=6, samplerate_index=1,
                    channel_mode=0, crc=True, xing=True, id3v2_size=77,
                    id3v1=True)
    m = M.parse_mp3(b)
    assert m["has_id3v2"] and m["has_id3v1"]
    assert m["vbr_tag"] == "Xing" and m["n_frames"] == 9
    assert m["channels"] == 2 and m["version"] == "MPEG2"
    # the Xing frame count wins over the walk when they disagree
    # (truncated downloads): cut the stream after 4 frames
    hdr = M.parse_frame_header(b, M._skip_id3v2(b))
    cut = M._skip_id3v2(b) + 4 * hdr["frame_len"]
    m2 = M.parse_mp3(b[:cut])
    assert m2["n_frames"] == 4
    assert m2["duration_ms"] == 9 * 576 * 1000 // 24000  # Xing count


def test_resync_over_junk():
    clean = M.build_mp3(6)
    # junk between frames 2 and 3: frames 1-2 confirm each other, the
    # walk resyncs over the junk and recovers all six frames
    noisy = b"\x00garbage\xff" + clean[:834] + b"\xff\xe0junk" + clean[834:]
    m = M.parse_mp3(noisy)
    assert m["n_frames"] == 6
    assert m["resyncs"] >= 1
    # junk right after frame 1 breaks its second-header confirmation:
    # the frame is treated as junk and the stream re-locks at frame 2
    # (5 frames, correct parameters) — the price of not letting a
    # stray sync word in leading garbage poison the whole walk
    noisy = clean[:417] + b"\xff\xe0junk" + clean[417:]
    m = M.parse_mp3(noisy)
    assert m["n_frames"] == 5 and m["sample_rate"] == 44100


def test_false_sync_in_leading_junk_does_not_poison():
    """A stray 0xFFF3 word before the real stream must not lock wrong
    stream parameters (review finding, round 9)."""
    real = M.build_mp3(6)
    m = M.parse_mp3(b"\xff\xf3\x90\x00" + b"\x00" * 200 + real)
    assert m["n_frames"] == 6 and m["sample_rate"] == 44100
    assert m["version"] == "MPEG1"


def test_hostile_inputs_bounded():
    import time

    with pytest.raises(ValueError):
        M.parse_mp3(b"")
    with pytest.raises(ValueError):
        M.parse_mp3(b"RIFF" + b"\x00" * 100)
    t0 = time.time()
    with pytest.raises(ValueError):
        M.parse_mp3(bytes(range(256)) * 1000)  # 256 KB of noise
    assert time.time() - t0 < 5
    rng = random.Random(1)
    for _ in range(100):
        blob = rng.randbytes(rng.randrange(0, 2000))
        try:
            M.parse_mp3(blob)
        except ValueError:
            pass


def test_sniff_mp3():
    assert M.sniff_mp3(M.build_mp3(3))
    assert M.sniff_mp3(M.build_mp3(5, id3v2_size=50))
    assert not M.sniff_mp3(b"\xff\xff\xff\xff" + b"\x00" * 400)
    assert not M.sniff_mp3(b"RIFF....WAVEfmt ")
    assert not M.sniff_mp3(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")


def test_pcm_decode_is_loud_boundary():
    with pytest.raises(M.UnsupportedCodecError):
        M.decode_mp3_pcm(M.build_mp3(3))


def test_multimodal_mp3_rows_capture_not_kill(spark):
    """An audio/mpeg payload in a feature batch lands in the per-row
    error column as UnsupportedCodecError (the compressed-AVI
    discipline) — it must not kill the task; mislabeled noise is
    corruption (MediaDecodeError)."""
    from rawdata_client_provider_gcs_spark.operators import multimodal

    rows = [
        (1, bytearray(M.build_mp3(5))),
        (2, bytearray(b"\x00not audio at all" * 10)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = multimodal.with_media_columns(df, "blob", "audio/mpeg", "doc_id")
    out = {r["doc_id"]: r["error"]
           for r in multimodal.extract_features(media).collect()}
    assert out[1].startswith("UnsupportedCodecError")
    assert out[2].startswith("MediaDecodeError")


def test_id3v2_text_frames_both_versions():
    for ver in (3, 4):
        tag = M.build_id3v2(
            {"title": "Søme Tïtle", "artist": "An Artist", "year": "1999",
             "track": "7"},
            version=ver,
        )
        blob = tag + M.build_mp3(4)
        t = M.id3_tags(blob)
        assert t["title"] == "Søme Tïtle" and t["artist"] == "An Artist"
        assert t["year"] == "1999" and t["track"] == "7"
        assert t["source"] == f"id3v2.{ver}"
        assert M.parse_mp3(blob)["n_frames"] == 4


def test_id3v1_trailer_fields_and_v2_precedence():
    v1 = (
        b"TAG" + b"Old Title".ljust(30, b"\x00")
        + b"Old Artist".ljust(30, b"\x00") + b"Album".ljust(30, b"\x00")
        + b"1984" + b"\x00" * 28 + bytes([0, 5]) + bytes([17])
    )
    t = M.id3_tags(M.build_mp3(3) + v1)
    assert t["title"] == "Old Title" and t["track"] == "5"
    assert t["genre"] == "17" and t["source"] == "id3v1"
    # v2 frames win field-by-field; v1-only fields survive
    t = M.id3_tags(M.build_id3v2({"title": "New"}) + M.build_mp3(3) + v1)
    assert t["title"] == "New" and t["artist"] == "Old Artist"
    assert t["source"] == "id3v2.3"


def test_id3_hostile_is_lenient():
    assert M.id3_tags(b"\x00" * 300) == {}
    # lying frame size: keep what was collected, never crash
    assert isinstance(
        M.id3_tags(b"ID3\x03\x00\x00\x00\x00\x00\x7f" + bytes(50)), dict
    )
    import random
    rng = random.Random(3)
    for _ in range(200):
        M.id3_tags(b"ID3" + rng.randbytes(rng.randrange(0, 300)))
