"""Progressive JPEG (SOF2): scan scripts, refinement, hostile bytes.

The load-bearing property: progressive transmits the SAME quantized
coefficients as baseline, only reordered — so for any image, quality,
and subsampling, decoding the progressive stream must yield pixels
IDENTICAL to decoding the baseline stream.  That pins the whole
multi-scan machinery (spectral selection, successive approximation,
EOB runs, correction-bit ordering) against the already-oracle-checked
baseline codec without needing any external decoder.
"""

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import rawjpeg
from rawdata_client_provider_gcs_spark.operators import (
    rawjpeg_progressive as prog,
)


def _rand(shape, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:0", "4:2:2"])
@pytest.mark.parametrize("successive", [False, True])
def test_progressive_equals_baseline_pixels(subsampling, successive):
    for shape, seed in (((24, 40), 1), ((17, 23), 2), ((33, 31), 3)):
        img = _rand(shape, seed)
        base = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, 75, subsampling))
        p = prog.encode_jpeg_progressive(
            img, 75, subsampling, successive=successive
        )
        assert p[3] == 0xE0 and b"\xff\xc2" in p[:700]  # really SOF2
        assert np.array_equal(base, rawjpeg.decode_jpeg(p)), (
            shape,
            subsampling,
            successive,
        )


@pytest.mark.parametrize("quality", [30, 50, 75, 92])
def test_progressive_quality_sweep(quality):
    img = _rand((32, 48), seed=7)
    base = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, quality, "4:2:0"))
    p = rawjpeg.decode_jpeg(
        prog.encode_jpeg_progressive(img, quality, "4:2:0", successive=True)
    )
    assert np.array_equal(base, p)


def test_progressive_flat_and_gradient_eob_paths():
    """Flat blocks drive maximal EOB-run folding; gradients drive long
    zero runs with scattered refinement corrections."""
    flat = np.full((32, 32, 3), 77, np.uint8)
    grad = (
        np.tile(np.arange(48, dtype=np.uint8), (48, 1))[:, :, None]
        .repeat(3, 2)
    )
    for img in (flat, grad):
        for successive in (False, True):
            b = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, 50, "4:2:0"))
            p = rawjpeg.decode_jpeg(
                prog.encode_jpeg_progressive(
                    img, 50, "4:2:0", successive=successive
                )
            )
            assert np.array_equal(b, p)


def test_progressive_constant_even_gray_bit_exact():
    """The baseline codec's strongest pin carries over: a constant
    even-gray image round-trips to EXACTLY its input through the
    progressive path too (DC-only blocks, every AC scan pure EOB)."""
    img = np.full((24, 24, 3), 128, np.uint8)
    for successive in (False, True):
        out = rawjpeg.decode_jpeg(
            prog.encode_jpeg_progressive(
                img, 50, "4:4:4", successive=successive
            )
        )
        assert np.array_equal(out, img)


def test_progressive_hostile_bytes_raise_catchable():
    img = _rand((16, 16), seed=5)
    payload = prog.encode_jpeg_progressive(img, 75, "4:4:4")
    import random

    rng = random.Random(11)
    for _ in range(40):
        mode = rng.randrange(3)
        if mode == 0:
            mutated = payload[: rng.randrange(4, len(payload))]
        elif mode == 1:
            b = bytearray(payload)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            mutated = bytes(b)
        else:
            i = rng.randrange(1, len(payload))
            mutated = payload[:i] + payload[rng.randrange(1, len(payload)):]
        try:
            out = rawjpeg.decode_jpeg(mutated)
            assert out.ndim == 3  # survived the mutation: fine
        except NotImplementedError:
            raise AssertionError("progressive must not fall into the stub")
        except Exception:
            pass  # catchable per-row error is the contract


def test_progressive_through_spark_kernel(spark):
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import multimodal

    img = _rand((16, 16), seed=9)
    good = prog.encode_jpeg_progressive(img, 75, "4:4:4")
    df = spark.createDataFrame(
        [(1, good), (2, b"\xff\xd8\xff\xc2garbage-progressive")],
        "doc_id long, img binary",
    )
    media = multimodal.with_media_columns(df, "img", "image/jpeg", "doc_id")
    rows = {
        r["doc_id"]: r
        for r in multimodal.extract_features(media, fake=False).collect()
    }
    assert rows[1]["error"] is None and len(rows[1]["features"]) == 8
    assert rows[2]["error"] is not None and rows[2]["features"] is None


def test_progressive_matches_pillow_when_available():
    Image = pytest.importorskip("PIL.Image", reason="pillow parity opt-in")
    import io

    img = _rand((40, 56), seed=13)
    payload = prog.encode_jpeg_progressive(img, 75, "4:2:0", successive=True)
    with Image.open(io.BytesIO(payload)) as im:
        theirs = np.asarray(im.convert("RGB"))
    ours = rawjpeg.decode_jpeg(payload)
    # same stream, two decoders: IDCT rounding may differ by 1 LSB
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 1


@pytest.mark.parametrize("restart_interval", [1, 2, 5])
def test_progressive_restart_intervals(restart_interval):
    """RSTn segmentation in every scan type (interleaved DC by MCU,
    non-interleaved AC first/refine by block): predictors and EOB runs
    reset per segment on both sides, pixels stay baseline-identical."""
    img = _rand((33, 31), seed=21)
    for subsampling in ("4:4:4", "4:2:0"):
        base = rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, 75, subsampling))
        for successive in (False, True):
            p = prog.encode_jpeg_progressive(
                img,
                75,
                subsampling,
                successive=successive,
                restart_interval=restart_interval,
            )
            assert b"\xff\xdd" in p[:700]  # DRI present
            assert np.array_equal(base, rawjpeg.decode_jpeg(p))
