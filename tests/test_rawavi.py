"""AVI container codec: round-trip, timing, hostile bytes, Spark kernel."""

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import (
    multimodal,
    rawavi,
    rawimage,
)


def _frames(n=6, h=8, w=10, seed=3):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]


def test_avi_roundtrip_lossless():
    frames = _frames()
    payload = rawavi.encode_avi(frames, fps=20.0)
    assert rawavi.sniff_avi(payload)
    decoded, fps = rawavi.decode_avi(payload)
    assert fps == pytest.approx(20.0)
    assert len(decoded) == len(frames)
    for a, b in zip(frames, decoded):
        assert np.array_equal(a, b)


def test_avi_odd_width_row_padding():
    # width 7 -> 21-byte rows padded to 24: the DIB stride math
    frames = _frames(n=2, h=4, w=7)
    decoded, _ = rawavi.decode_avi(rawavi.encode_avi(frames, fps=5))
    for a, b in zip(frames, decoded):
        assert np.array_equal(a, b)


def test_avi_frame_sampling_grid():
    # 10 fps -> frames at 0,100,200,...; sample every 250 ms
    frames = _frames(n=10)
    payload = rawavi.encode_avi(frames, fps=10.0)
    sampled = rawavi.sample_avi_frames(payload, every_ms=250, max_frames=8)
    assert [(i, ms) for i, ms, _ in sampled] == [
        (0, 0),
        (3, 300),
        (6, 600),
        (9, 900),
    ]
    assert np.array_equal(sampled[1][2], frames[3])


def test_avi_rejects_compressed_and_garbage():
    frames = _frames(n=1)
    payload = bytearray(rawavi.encode_avi(frames, fps=5))
    # flip the strf biCompression field to a codec fourcc: a RECOGNIZED
    # but compressed codec is a missing-codec configuration signal ->
    # loud NotImplementedError, never a per-row data error
    i = payload.find(b"strf")
    payload[i + 8 + 16 : i + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        rawavi.decode_avi(bytes(payload))
    # MS-RLE declares itself via the INTEGER biCompression values
    # BI_RLE8=1 / BI_RLE4=2, not an ASCII tag: both must label as an
    # unsupported codec, not corruption (ADVICE r7 #4)
    for rle in (b"\x01\x00\x00\x00", b"\x02\x00\x00\x00"):
        payload[i + 8 + 16 : i + 8 + 20] = rle
        with pytest.raises(rawavi.UnsupportedCodecError):
            rawavi.decode_avi(bytes(payload))
    # genuinely malformed containers stay ValueError (per-row capture)
    with pytest.raises(ValueError):
        rawavi.decode_avi(b"RIFF\x00\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        rawavi.decode_avi(b"not an avi at all")


def test_avi_audio_first_stream_order():
    """An 'auds' strl preceding the 'vids' strl must not have its
    WAVEFORMATEX misparsed as the video BITMAPINFOHEADER — and the vids
    strf must still be codec-checked even when it is second."""
    frames = _frames(n=3, h=4, w=4)
    payload = rawavi.encode_avi(frames, fps=10.0)
    # split out hdrl pieces so we can splice an audio strl ahead of the
    # video strl
    import struct

    def chunk(cid, data):
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype, data):
        return chunk(b"LIST", ltype + data)

    # a minimal auds strh + WAVEFORMATEX strf (PCM): the strf's bytes at
    # offsets 14-20 are nothing like BI_RGB/24-bit, so the old
    # first-strf-wins parser rejected the file
    auds_strh = b"auds" + b"\x00" * 52
    wavefmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    auds_strl = lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", wavefmt))

    i = payload.find(b"LIST", 12)
    # find the strl LIST inside hdrl and insert the audio strl before it
    j = payload.find(b"strl")
    strl_start = j - 8  # back up over 'LIST' + 4-byte size
    assert payload[strl_start : strl_start + 4] == b"LIST"
    new = bytearray(payload[:strl_start] + auds_strl + payload[strl_start:])
    # fix the hdrl LIST size and the RIFF size
    hdrl_sz = int.from_bytes(new[i + 4 : i + 8], "little") + len(auds_strl)
    new[i + 4 : i + 8] = struct.pack("<I", hdrl_sz)
    new[4:8] = struct.pack("<I", len(new) - 8)
    decoded, fps = rawavi.decode_avi(bytes(new))
    assert fps == pytest.approx(10.0)
    assert len(decoded) == 3
    assert np.array_equal(decoded[0], frames[0])

    # and a compressed vids strf is still caught when it comes second
    k = new.find(b"strf", new.find(b"vids"))
    new[k + 8 + 16 : k + 8 + 20] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        rawavi.decode_avi(bytes(new))


def test_sample_frames_real_avi_through_spark(spark):
    from pyspark.sql import functions as F

    frames = _frames(n=5, h=4, w=4)
    payload = rawavi.encode_avi(frames, fps=10.0)
    df = spark.createDataFrame([(1, payload)], "doc_id long, vid binary")
    media = multimodal.with_media_columns(df, "vid", "video/avi", "doc_id")
    out = multimodal.sample_frames(media, every_ms=200, max_frames=4).collect()
    assert [(r["frame_idx"], r["frame_ms"]) for r in out] == [
        (0, 0),
        (2, 200),
        (4, 400),
    ]
    # frame payloads are the PPM encoding of the original frames
    assert bytes(out[1]["frame"]) == rawimage.encode_ppm(frames[2])
    assert all(r["error"] is None for r in out)

    # corrupt payload under the same mime -> sentinel row, not a crash
    bad = spark.createDataFrame(
        [(2, b"\x00garbage-video")], "doc_id long, vid binary"
    )
    bad_media = multimodal.with_media_columns(bad, "vid", "video/avi", "doc_id")
    rows = multimodal.sample_frames(bad_media, every_ms=200).collect()
    assert len(rows) == 1 and rows[0]["error"] is not None
    assert rows[0]["frame"] is None

    # content sniffing wins over the label (same contract as the GIF
    # path): an AVI payload under video/mp4 still decodes...
    mp4 = multimodal.with_media_columns(df, "vid", "video/mp4", "doc_id")
    assert len(multimodal.sample_frames(mp4, every_ms=200).collect()) == 3
    # ...but an unsupported-codec mime with undecodable bytes fails
    # loud (missing-codec configuration, not data corruption)
    really_mp4 = multimodal.with_media_columns(
        spark.createDataFrame(
            [(3, b"\x00\x00\x00\x18ftypmp42----")], "doc_id long, vid binary"
        ),
        "vid",
        "video/mp4",
        "doc_id",
    )
    with pytest.raises(Exception):
        multimodal.sample_frames(really_mp4, every_ms=200).collect()


def test_compressed_avi_is_per_row_distinctly_labeled(spark):
    """A compressed-codec AVI is ordinary crawl DATA: through
    sample_frames it must yield a per-row error labeled with its own
    class (UnsupportedCodecError — never conflated with corruption and
    never killing the job), and with fake=True it falls through to the
    deterministic stub.  Other rows in the same batch stay unaffected."""
    frames = _frames(n=2, h=4, w=4)
    good = rawavi.encode_avi(frames, fps=10.0)
    payload = bytearray(good)
    i = payload.find(b"strf")
    payload[i + 8 + 16 : i + 8 + 20] = b"H264"
    df = spark.createDataFrame(
        [(1, bytes(payload)), (2, good)], "doc_id long, vid binary"
    )
    media = multimodal.with_media_columns(df, "vid", "video/avi", "doc_id")
    rows = multimodal.sample_frames(media, every_ms=200).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1  # sentinel row
    assert by_doc[1][0]["error"].startswith("UnsupportedCodecError")
    assert "H264" in by_doc[1][0]["error"]
    assert all(r["error"] is None for r in by_doc[2])  # neighbor decodes
    # fake=True: deterministic stub frames for the compressed one
    rows = multimodal.sample_frames(media, every_ms=200, fake=True).collect()
    assert all(r["error"] is None for r in rows)
    assert all(r["frame"] is not None for r in rows)
    # direct kernel callers still get the NotImplementedError family
    with pytest.raises(NotImplementedError, match="H264"):
        rawavi.decode_avi(bytes(payload))
    assert issubclass(rawavi.UnsupportedCodecError, NotImplementedError)
