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
    # BI_RLE8=1 / BI_RLE4=2, not an ASCII tag (ADVICE r7 #4).  Both
    # DECODE now (test_rle8_*/test_rle4_* below), so either value
    # claimed on a 24-bit header with no palette reads as a malformed
    # header (per-row corruption), never as a missing codec.
    for rle in (b"\x01\x00\x00\x00", b"\x02\x00\x00\x00"):
        payload[i + 8 + 16 : i + 8 + 20] = rle
        with pytest.raises(ValueError):
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
    # ...and a REAL ISO-BMFF payload is a recognized container whose
    # codec payloads are the boundary: per-row UnsupportedCodecError
    # since round 9 (rawmp4 metadata tier), never a job kill
    really_mp4 = multimodal.with_media_columns(
        spark.createDataFrame(
            [(3, b"\x00\x00\x00\x18ftypmp42----")], "doc_id long, vid binary"
        ),
        "vid",
        "video/mp4",
        "doc_id",
    )
    rows = multimodal.sample_frames(really_mp4, every_ms=200).collect()
    assert len(rows) == 1
    assert rows[0]["error"].startswith("UnsupportedCodecError")


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


def _palette():
    pal = np.zeros((256, 3), np.uint8)
    pal[:, 0] = np.arange(256)  # R ramp
    pal[:, 1] = 255 - np.arange(256)  # G inverse ramp
    pal[:, 2] = (np.arange(256) * 7) % 256
    return pal


def test_rle8_roundtrip_lossless():
    """encode_avi_rle8 -> decode_avi reproduces palette[idx] exactly,
    with the container's frame timing intact."""
    rng = np.random.default_rng(5)
    pal = _palette()
    idx_frames = [
        rng.integers(0, 256, size=(9, 13), dtype=np.uint8) for _ in range(3)
    ]
    blob = rawavi.encode_avi_rle8(idx_frames, pal, fps=12.5)
    frames, fps = rawavi.decode_avi(blob)
    assert fps == pytest.approx(12.5)
    assert len(frames) == 3
    for got, idx in zip(frames, idx_frames):
        np.testing.assert_array_equal(got, pal[idx])


def test_rle8_run_compression_is_real():
    """A flat frame must RLE down to a handful of bytes per row."""
    idx = np.full((32, 200), 7, np.uint8)
    enc = rawavi._rle8_encode(idx)
    # 200 wide = one 255-cap means ceil(200/255)=1 run of 200 -> 2 bytes
    # per row + 2-byte EOL, + 2-byte EOB
    assert len(enc) == 32 * 4 + 2
    blob = rawavi.encode_avi_rle8([idx], _palette(), fps=10)
    raw = rawavi.encode_avi([_palette()[idx]], fps=10)
    assert len(blob) < len(raw) // 10


def test_rle8_delta_and_absolute_escapes():
    """Hand-built stream: absolute run, delta skip (skipped pixels are
    index 0), encoded run, EOL, EOB — decoded bottom-up."""
    # raster 4 wide, 3 tall
    stream = (
        b"\x00\x04" + bytes([10, 11, 12, 13])  # absolute run of 4 (row 0)
        + b"\x00\x00"  # end of line
        + b"\x00\x02\x02\x01"  # delta: right 2, up 1 (to row 2, x=2)
        + b"\x02\x09"  # encoded run: two pixels of index 9
        + b"\x00\x01"  # end of bitmap
    )
    idx = rawavi._rle8_decode(stream, 4, 3)
    # bottom-up: y=0 is the BOTTOM row of the decoded (top-down) image
    np.testing.assert_array_equal(idx[0], [10, 11, 12, 13])
    np.testing.assert_array_equal(idx[1], [0, 0, 0, 0])  # skipped by delta
    np.testing.assert_array_equal(idx[2], [0, 0, 9, 9])


def test_rle8_hostile_streams_raise_valueerror():
    bad = [
        b"\x09\x01\x00\x01",  # run of 9 in a 4-wide raster
        b"\x00\x05" + b"\x01\x02",  # truncated absolute run
        b"\x00\x02\x09\x09",  # delta jumps outside
        b"\x02\x01",  # no end-of-bitmap escape
        b"\x00\x02\x01",  # truncated delta
    ]
    for stream in bad:
        with pytest.raises(ValueError):
            rawavi._rle8_decode(stream, 4, 3)


def test_rle8_through_spark_sample_frames(spark):
    """An MS-RLE8 AVI rides the same multimodal path as BI_RGB: frames
    really decode, on the sampling grid, with real timing."""
    from rawdata_client_provider_gcs_spark.operators import multimodal

    pal = _palette()
    idx_frames = [np.full((6, 8), i * 10, np.uint8) for i in range(5)]
    blob = rawavi.encode_avi_rle8(idx_frames, pal, fps=10.0)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, v binary")
    media = multimodal.with_media_columns(df, "v", "video/avi", "doc_id")
    rows = (
        multimodal.sample_frames(media, every_ms=200)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all(r.error is None for r in rows)


def test_rle4_roundtrip_and_hostile():
    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    blob = rawavi.encode_avi_rle4([idx, idx[::-1]], pal, fps=8.0)
    frames, fps = rawavi.decode_avi(blob)
    assert fps == pytest.approx(8.0) and len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[idx])
    np.testing.assert_array_equal(frames[1], pal[idx[::-1]])
    bad = [
        b"\x09\x11\x00\x01",  # run of 9 in a 4-wide raster
        b"\x00\x05\x12\x34",  # absolute run missing its pad byte
        b"\x02\x11",  # no end-of-bitmap
    ]
    for stream in bad:
        with pytest.raises(ValueError):
            rawavi._rle4_decode(stream, 4, 3)
    # absolute mode with word padding decodes correct nibbles
    stream = b"\x00\x05" + bytes([0x12, 0x34, 0x50, 0x00]) + b"\x00\x00\x00\x01"
    out = rawavi._rle4_decode(stream, 5, 1)
    np.testing.assert_array_equal(out[0], [1, 2, 3, 4, 5])


def test_yuv_decodes_bt601_reference_colors():
    """The classic BT.601 limited-range triples decode to their exact
    primaries under the integer matrix: red (81,90,240), green
    (145,54,34), blue (41,240,110), white (235,128,128), black
    (16,128,128)."""
    cases = [
        ((81, 90, 240), (255, 0, 0)),
        # green's canonical triple is not exactly invertible under the
        # integer matrix: B lands on 1, not 0 (386 >> 8)
        ((145, 54, 34), (0, 255, 1)),
        ((41, 240, 110), (0, 0, 255)),
        ((235, 128, 128), (255, 255, 255)),
        ((16, 128, 128), (0, 0, 0)),
    ]
    h, w = 4, 6
    for (yv, uv, vv), rgb in cases:
        y = np.full((h, w), yv, np.uint8)
        u = np.full((h // 2, w // 2), uv, np.uint8)
        v = np.full((h // 2, w // 2), vv, np.uint8)
        fi, _ = rawavi.decode_avi(rawavi.encode_avi_i420([(y, u, v)]))
        assert tuple(fi[0][0, 0]) == rgb, (yv, uv, vv, fi[0][0, 0])
        y2 = np.full((h, w), yv, np.uint8)
        u2 = np.full((h, w // 2), uv, np.uint8)
        v2 = np.full((h, w // 2), vv, np.uint8)
        f2, _ = rawavi.decode_avi(rawavi.encode_avi_yuy2([(y2, u2, v2)]))
        np.testing.assert_array_equal(f2[0], fi[0])


def test_yuv_chroma_subsampling_geometry():
    """4:2:0 doubles chroma in both axes, 4:2:2 only horizontally."""
    y = np.zeros((4, 4), np.uint8) + 128
    u = np.array([[90, 240], [240, 90]], np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    fi, _ = rawavi.decode_avi(rawavi.encode_avi_i420([(y, u, v)]))
    img = fi[0]
    # 2x2 chroma blocks: pixel (0,0)==(1,1) share u=90; (0,2) uses u=240
    np.testing.assert_array_equal(img[0, 0], img[1, 1])
    assert not np.array_equal(img[0, 0], img[0, 2])


def test_yuv_hostile_dims_and_truncation():
    with pytest.raises(ValueError):
        rawavi._i420_to_rgb(b"\x00" * 100, 5, 4)  # odd width
    with pytest.raises(ValueError):
        rawavi._i420_to_rgb(b"\x00" * 10, 8, 8)  # short payload
    with pytest.raises(ValueError):
        rawavi._yuy2_to_rgb(b"\x00" * 10, 8, 2)  # short payload


def test_mjpg_roundtrip_both_layouts():
    """MJPG frames decode through the JPEG tier; the table-less layout
    (DHT stripped, Annex K assumed) decodes byte-identically to the
    with-tables layout."""
    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    frames = [img, img[::-1]]
    ref = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, huffman="annex_k"))
    for tableless in (True, False):
        blob = rawavi.encode_avi_mjpg(frames, fps=15.0, tableless=tableless)
        dec, fps = rawavi.decode_avi(blob)
        assert fps == pytest.approx(15.0) and len(dec) == 2
        np.testing.assert_array_equal(dec[0], ref)
    # constant even-gray at 4:4:4 stays bit-exact through the container
    c = np.full((16, 16, 3), 128, np.uint8)
    blob = rawavi.encode_avi_mjpg([c], fps=10.0, quality=50)
    np.testing.assert_array_equal(rawavi.decode_avi(blob)[0][0], c)


def test_annex_k_tables_match_the_jdk():
    """The Annex K transcription is re-extracted from the DHT segments
    the JDK's ImageIO JPEG encoder writes (it emits the K.3 defaults) —
    a transcription typo cannot survive this comparison."""
    import os
    import subprocess
    import tempfile

    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    java_home = os.environ.get("JAVA_HOME")
    if not java_home or not os.path.exists(java_home + "/bin/javac"):
        pytest.skip("no JDK available")
    src = (
        "import javax.imageio.*;import java.awt.image.*;import java.io.*;"
        "public class T{public static void main(String[] a)throws Exception{"
        "BufferedImage i=new BufferedImage(16,16,BufferedImage.TYPE_3BYTE_BGR);"
        "ByteArrayOutputStream o=new ByteArrayOutputStream();"
        'ImageIO.write(i,"jpeg",o);'
        "System.out.write(o.toByteArray());System.out.flush();}}"
    )
    with tempfile.TemporaryDirectory() as d:
        open(d + "/T.java", "w").write(src)
        subprocess.run(
            [java_home + "/bin/javac", "T.java"], cwd=d, check=True,
            capture_output=True,
        )
        stream = subprocess.run(
            [java_home + "/bin/java", "T"], cwd=d, check=True,
            capture_output=True,
        ).stdout
    # walk DHT segments, collect (class, id) -> (bits, vals)
    tables = {}
    pos = 2
    while pos + 4 <= len(stream):
        marker = stream[pos + 1]
        length = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        if marker == 0xC4:
            body = stream[pos + 4 : pos + 2 + length]
            i = 0
            while i < len(body):
                tc, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                tables[(tc, tid)] = (bits, list(body[i + 17 : i + 17 + nv]))
                i += 17 + nv
        if marker == 0xDA:
            break
        pos += 2 + length
    assert tables[(1, 0)] == (
        rawjpeg._ANNEX_K_AC_LUMA[0], rawjpeg._ANNEX_K_AC_LUMA[1]
    )
    assert tables[(1, 1)] == (
        rawjpeg._ANNEX_K_AC_CHROMA[0], rawjpeg._ANNEX_K_AC_CHROMA[1]
    )
    assert tables[(0, 0)] == (
        rawjpeg._DC_LUMA_SPEC[0], rawjpeg._DC_LUMA_SPEC[1]
    )
    assert tables[(0, 1)] == (
        rawjpeg._DC_CHROMA_SPEC[0], rawjpeg._DC_CHROMA_SPEC[1]
    )


def test_mjpg_through_spark_sample_frames(spark):
    from rawdata_client_provider_gcs_spark.operators import multimodal

    frames = [np.full((8, 12, 3), 64 + 32 * i, np.uint8) for i in range(4)]
    blob = rawavi.encode_avi_mjpg(frames, fps=10.0, quality=50)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, v binary")
    media = multimodal.with_media_columns(df, "v", "video/avi", "doc_id")
    rows = (
        multimodal.sample_frames(media, every_ms=200)
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in rows] == [0, 2] and all(
        r.error is None for r in rows
    )


def test_topdown_dib_decodes_unflipped():
    """A negative strf biHeight declares a TOP-DOWN raster (review r8):
    frames must not be vertically flipped."""
    frames = _frames(n=1, h=6, w=4)
    blob = bytearray(rawavi.encode_avi(frames, fps=5.0))
    i = blob.find(b"strf")
    # strf body: biSize(4) biWidth(4) biHeight(4) ... negate biHeight
    import struct

    h = struct.unpack_from("<i", blob, i + 8 + 8)[0]
    struct.pack_into("<i", blob, i + 8 + 8, -h)
    dec, _ = rawavi.decode_avi(bytes(blob))
    # the payload rows were written bottom-up by encode_avi, so a
    # top-down interpretation yields the vertically flipped image
    np.testing.assert_array_equal(dec[0], frames[0][::-1])


def test_nested_lists_raise_valueerror_not_recursionerror():
    """~1000 nested LIST headers must land in the documented ValueError
    corruption contract, not RecursionError (review r8)."""
    body = b""
    for _ in range(1000):
        body = b"LIST" + (len(body) + 4).to_bytes(4, "little") + b"hdrl" + body
    payload = b"RIFF" + (len(body) + 4).to_bytes(4, "little") + b"AVI " + body
    with pytest.raises(ValueError):
        rawavi.decode_avi(payload)
