"""Hostile-bytes robustness for the media codecs (VERDICT r5 task #3).

At 100 TB crawl scale malformed media is certain: a payload declaring a
supported image/audio mime but carrying truncated or bit-flipped bytes
must surface as a per-row ``error`` value — never as an
executor-killing exception inside the Arrow kernel.

Two layers: a hypothesis fuzz of the decode kernel itself (no Spark,
hundreds of examples in seconds), and one Spark job pushing a seeded
corpus of mutated JPEG/GIF/PNG/WAV/PPM payloads through
``extract_features`` / ``resize_images`` / ``sample_frames``.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import (
    multimodal,
    rawaudio,
    rawgif,
    rawimage,
    rawjpeg,
)

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


def _valid_payloads() -> dict[str, tuple[bytes, str]]:
    """{format: (valid payload, mime)} built with this package's encoders."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    # GIF needs a <=256-color global palette across frames
    paletted = (rgb // 32) * 32
    samples = np.sin(np.linspace(0, 40 * np.pi, 1600)).astype(np.float32)
    from rawdata_client_provider_gcs_spark.operators import (
        rawjpeg_progressive,
    )

    return {
        "ppm": (rawimage.encode_ppm(rgb), "image/x-portable-pixmap"),
        "png": (rawimage.encode_png(rgb), "image/png"),
        "jpeg": (rawjpeg.encode_jpeg(rgb), "image/jpeg"),
        "jpeg_progressive": (
            rawjpeg_progressive.encode_jpeg_progressive(
                rgb, successive=True
            ),
            "image/jpeg",
        ),
        "gif": (
            rawgif.encode_gif(
                [paletted, paletted[:, ::-1]], delays_ms=[100, 100]
            ),
            "image/gif",
        ),
        "wav": (rawaudio.encode_wav_pcm16(samples, 8000), "audio/wav"),
    }


PAYLOADS = _valid_payloads()


def _mutate(payload: bytes, rng: random.Random) -> bytes:
    """Truncate, bit-flip, splice, or garbage-prefix a valid payload."""
    mode = rng.randrange(4)
    if mode == 0 and len(payload) > 1:  # truncate
        return payload[: rng.randrange(1, len(payload))]
    if mode == 1:  # flip 1-8 random bits
        b = bytearray(payload)
        for _ in range(rng.randrange(1, 9)):
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
        return bytes(b)
    if mode == 2:  # splice two halves from different offsets
        i = rng.randrange(1, len(payload))
        j = rng.randrange(1, len(payload))
        return payload[:i] + payload[j:]
    return bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))


# -- layer 1: hypothesis on the kernel, no Spark ---------------------------


@settings(max_examples=300, deadline=None)
@given(
    fmt=st.sampled_from(sorted(PAYLOADS)),
    seed=st.integers(0, 2**32 - 1),
)
def test_decode_kernel_never_raises_uncatchable(fmt, seed):
    """_decode_bytes on a mutated payload either returns a normalized
    8-bin histogram or raises a data-dependent exception that
    _catch_row converts to an error value — never NotImplementedError
    (reserved for missing codecs) and never a hang/crash."""
    payload, mime = PAYLOADS[fmt]
    mutated = _mutate(payload, random.Random(seed))
    result, err = multimodal._catch_row(
        multimodal._decode_bytes, mutated, mime, False
    )
    if err is None:
        assert len(result) == 8
        if mime.startswith("image/"):
            # image features are a normalized 8-bin luma histogram
            assert all(np.isfinite(v) and v >= 0 for v in result)
            assert abs(sum(result) - 1.0) < 1e-9 or sum(result) == 0.0
    else:
        assert "NotImplementedError" not in err


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=256))
def test_decode_kernel_on_pure_garbage(data):
    for mime in (
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/x-portable-pixmap",
        "audio/wav",
    ):
        result, err = multimodal._catch_row(
            multimodal._decode_bytes, data, mime, False
        )
        if err is None:
            assert len(result) == 8


# -- layer 2: one Spark job over a seeded mutated corpus -------------------


def _mutated_corpus() -> list[tuple[int, bytes, str]]:
    rng = random.Random(42)
    rows = []
    doc_id = 0
    for fmt, (payload, mime) in sorted(PAYLOADS.items()):
        rows.append((doc_id, payload, mime))  # one pristine row per format
        doc_id += 1
        for _ in range(24):
            rows.append((doc_id, _mutate(payload, rng), mime))
            doc_id += 1
    return rows


def test_spark_kernels_survive_mutated_corpus(spark):
    from pyspark.sql import functions as F

    rows = _mutated_corpus()
    df = spark.createDataFrame(rows, "doc_id long, img binary, mime string")
    # with_media_columns stamps a constant mime; this corpus mixes
    # formats, so build the meta struct with the per-row mime directly
    media = df.select(
        "doc_id",
        F.col("img").alias("payload"),
        F.struct(
            F.col("mime"),
            F.octet_length("img").cast("long").alias("n_bytes"),
            F.sha2("img", 256).alias("sha256"),
        ).alias("meta"),
    )

    feats = multimodal.extract_features(media, fake=False).collect()
    assert len(feats) == len(rows)
    for r in feats:
        assert (r["features"] is None) != (r["error"] is None)
        if r["error"] is not None:
            assert "NotImplementedError" not in r["error"]
    # the pristine rows decoded; at least one mutation errored
    errored = {r["doc_id"] for r in feats if r["error"] is not None}
    pristine = {i * 25 for i in range(len(PAYLOADS))}
    assert pristine.isdisjoint(errored)
    assert errored, "no mutation produced a decode error"

    image_media = media.join(
        df.filter(df.mime != "audio/wav").select("doc_id"), "doc_id"
    )
    thumbs = multimodal.resize_images(
        image_media, 4, 4, fake=False, raw_only=True
    ).collect()
    for r in thumbs:
        assert (r["thumb"] is None) != (r["error"] is None)

    frame_media = media.join(
        df.filter(df.mime.isin("audio/wav", "image/gif")).select("doc_id"),
        "doc_id",
    )
    frames = multimodal.sample_frames(
        frame_media, every_ms=50, max_frames=3
    ).collect()
    assert frames
    by_doc_err = {}
    for r in frames:
        assert (r["frame"] is None) == (r["error"] is not None)
        by_doc_err.setdefault(r["doc_id"], set()).add(r["error"] is not None)
    # a failing document yields exactly its sentinel row, not a mix
    for doc, kinds in by_doc_err.items():
        assert len(kinds) == 1, doc


# -- AVI container fuzz (VERDICT r6 task #5) -------------------------------
#
# The classic RIFF parser trap: chunk sizes that lie about their
# extents ('movi' LIST claiming more than the buffer holds, frame
# chunks overrunning the payload, avih dimensions disagreeing with the
# DIB data).  Every mutation must land in the per-row error column —
# NotImplementedError stays reserved for RECOGNIZED compressed codecs.


def _avi_payload() -> bytes:
    from rawdata_client_provider_gcs_spark.operators import rawavi

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    return rawavi.encode_avi(frames, fps=10.0)


AVI_PAYLOAD = _avi_payload()


@settings(max_examples=300, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_avi_kernel_never_raises_uncatchable(seed):
    from rawdata_client_provider_gcs_spark.operators import rawavi

    mutated = _mutate(AVI_PAYLOAD, random.Random(seed))
    try:
        frames, fps = rawavi.decode_avi(mutated)
        assert fps > 0 and frames
    except NotImplementedError as exc:
        # only reachable when the mutation forged a RECOGNIZED codec
        # fourcc into the vids strf — astronomically unlikely from bit
        # flips, but legitimate if it happens
        assert "fourcc" in str(exc)
    except ValueError:
        pass  # per-row capture path


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), lie=st.integers(0, 2**32 - 1))
def test_avi_lying_chunk_sizes(seed, lie):
    """Overwrite one RIFF size field with an arbitrary value: sizes
    claiming more data than the buffer holds (the movi-extent trap at
    rawavi._sub_chunks) must decode-or-ValueError, never crash."""
    from rawdata_client_provider_gcs_spark.operators import rawavi

    rng = random.Random(seed)
    b = bytearray(AVI_PAYLOAD)
    # size fields live 4 bytes after each chunk/list id; collect them
    size_offsets = [4]  # RIFF size
    for tag in (b"LIST", b"avih", b"strh", b"strf", b"00db", b"idx1"):
        i = 0
        while True:
            i = AVI_PAYLOAD.find(tag, i)
            if i < 0:
                break
            size_offsets.append(i + 4)
            i += 4
    off = rng.choice(size_offsets)
    b[off : off + 4] = int(lie).to_bytes(4, "little")
    try:
        frames, fps = rawavi.decode_avi(bytes(b))
        assert fps > 0
    except ValueError:
        pass
    except NotImplementedError as exc:
        assert "fourcc" in str(exc)


def test_avi_header_dimension_lies():
    """avih width/height disagreeing with the DIB payload: huge claims
    must ValueError (frombuffer bound check), zero claims must not
    crash."""
    from rawdata_client_provider_gcs_spark.operators import rawavi

    base = bytearray(AVI_PAYLOAD)
    i = base.find(b"avih") + 8
    for w, h in [(2**24, 2**24), (0xFFFFFFFF, 1), (0, 0), (1, 0)]:
        b = bytearray(base)
        b[i + 32 : i + 36] = w.to_bytes(4, "little")
        b[i + 36 : i + 40] = h.to_bytes(4, "little")
        try:
            frames, _ = rawavi.decode_avi(bytes(b))
            # degenerate-but-consistent dims may "decode" empty frames
            assert all(f.size == 0 or f.shape[2] == 3 for f in frames)
        except ValueError:
            pass


def test_spark_sample_frames_survives_mutated_avi_corpus(spark):
    """One Spark job over 40 mutated AVIs + 1 pristine: per-row error
    capture, zero task deaths (the 'zero task deaths' bar from the
    round-6 verdict)."""
    from pyspark.sql import functions as F

    rng = random.Random(4242)
    rows = [(0, AVI_PAYLOAD)]
    rows += [(i, _mutate(AVI_PAYLOAD, rng)) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, vid binary")
    media = multimodal.with_media_columns(df, "vid", "video/avi", "doc_id")
    frames = multimodal.sample_frames(media, every_ms=100, max_frames=3)
    got = frames.collect()
    by_doc = {}
    for r in got:
        assert (r["frame"] is None) == (r["error"] is not None)
        if r["error"] is not None:
            assert "NotImplementedError" not in r["error"]
        by_doc.setdefault(r["doc_id"], set()).add(r["error"] is not None)
    assert by_doc[0] == {False}  # pristine decodes
    for doc, kinds in by_doc.items():
        assert len(kinds) == 1, doc  # sentinel row XOR real frames


def _avi_rle8_payload() -> bytes:
    from rawdata_client_provider_gcs_spark.operators import rawavi

    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx_frames = [
        rng.integers(0, 40, size=(8, 10), dtype=np.uint8) for _ in range(3)
    ]
    return rawavi.encode_avi_rle8(idx_frames, pal, fps=10.0)


AVI_RLE8_PAYLOAD = _avi_rle8_payload()


@settings(max_examples=300, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_avi_rle8_kernel_never_raises_uncatchable(seed):
    """Same contract as the BI_RGB fuzz, over the MS-RLE8 decode path:
    a mutated RLE stream (runs off the raster, truncated escapes,
    corrupt palette) must decode or ValueError — the RLE scatter can
    never raise an uncatchable numpy IndexError out of the kernel."""
    from rawdata_client_provider_gcs_spark.operators import rawavi

    mutated = _mutate(AVI_RLE8_PAYLOAD, random.Random(seed))
    try:
        frames, fps = rawavi.decode_avi(mutated)
        assert fps > 0 and frames
        assert all(f.ndim == 3 and f.dtype == np.uint8 for f in frames)
    except NotImplementedError as exc:
        assert "fourcc" in str(exc)
    except ValueError:
        pass  # per-row capture path


def _avi_layout_payloads() -> dict[str, bytes]:
    from rawdata_client_provider_gcs_spark.operators import rawavi

    rng = np.random.default_rng(15)
    pal16 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx4 = rng.integers(0, 16, (8, 10), dtype=np.uint8)
    h, w = 8, 10
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    u2 = rng.integers(0, 256, (h, w // 2), dtype=np.uint8)
    v2 = rng.integers(0, 256, (h, w // 2), dtype=np.uint8)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return {
        "rle4": rawavi.encode_avi_rle4([idx4] * 2, pal16, fps=10.0),
        "i420": rawavi.encode_avi_i420([(y, u, v)] * 2, fps=10.0),
        "yuy2": rawavi.encode_avi_yuy2([(y, u2, v2)] * 2, fps=10.0),
        "mjpg": rawavi.encode_avi_mjpg([rgb] * 2, fps=10.0),
    }


AVI_LAYOUT_PAYLOADS = _avi_layout_payloads()


@settings(max_examples=200, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    layout=st.sampled_from(sorted(AVI_LAYOUT_PAYLOADS)),
)
def test_avi_layout_kernels_never_raise_uncatchable(seed, layout):
    """RLE4 nibble streams and the YUV layout unpackers under mutation:
    decode or ValueError, never an uncatchable numpy error."""
    from rawdata_client_provider_gcs_spark.operators import rawavi

    mutated = _mutate(AVI_LAYOUT_PAYLOADS[layout], random.Random(seed))
    try:
        frames, fps = rawavi.decode_avi(mutated)
        assert fps > 0 and frames
        assert all(f.ndim == 3 and f.dtype == np.uint8 for f in frames)
    except NotImplementedError as exc:
        assert "fourcc" in str(exc)
    except ValueError:
        pass
