#!/usr/bin/env python
"""Throughput of the pure-Python media codecs (no Spark).

The multimodal kernels run these inside Arrow-batched ``mapInPandas``
across executor cores, so single-core codec throughput × cores is the
cluster-side decode budget.  Prints one JSON line:

    {"png_decode_mb_s": ..., "jpeg_decode_mb_s": ..., ...}

Sizes are measured on raw RGB megabytes processed (H·W·3), not
container bytes, so numbers compare across formats.  Run on an idle
box; results land in PERF.md's codec table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawdata_client_provider_gcs_spark.operators import (  # noqa: E402
    rawaudio,
    rawgif,
    rawimage,
    rawjpeg,
)


def _timeit(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(1)
    out: dict[str, float] = {}

    # photographic-ish image: smooth gradients + mild noise, 512x512
    x = np.linspace(0, 255, 512)
    base = (np.add.outer(x, x) / 2).astype(np.float64)
    img = np.stack(
        [base, base.T, 255 - base], axis=2
    ) + rng.normal(0, 4, (512, 512, 3))
    img = np.clip(img, 0, 255).astype(np.uint8)
    raw_mb = img.nbytes / 1e6

    png = rawimage.encode_png(img)
    out["png_encode_mb_s"] = round(raw_mb / _timeit(lambda: rawimage.encode_png(img), 3), 1)
    out["png_decode_mb_s"] = round(raw_mb / _timeit(lambda: rawimage.decode_png(png), 3), 1)

    jpg = rawjpeg.encode_jpeg(img, quality=85)
    out["jpeg_encode_mb_s"] = round(
        raw_mb / _timeit(lambda: rawjpeg.encode_jpeg(img, quality=85), 3), 1
    )
    out["jpeg_decode_mb_s"] = round(
        raw_mb / _timeit(lambda: rawjpeg.decode_jpeg(jpg), 3), 1
    )

    from rawdata_client_provider_gcs_spark.operators import (
        rawavi,
        rawjpeg_progressive,
    )

    pjpg = rawjpeg_progressive.encode_jpeg_progressive(img, quality=85)
    out["jpeg_progressive_encode_mb_s"] = round(
        raw_mb
        / _timeit(
            lambda: rawjpeg_progressive.encode_jpeg_progressive(
                img, quality=85
            ),
            3,
        ),
        1,
    )
    out["jpeg_progressive_decode_mb_s"] = round(
        raw_mb / _timeit(lambda: rawjpeg.decode_jpeg(pjpg), 3), 1
    )

    frames = [img[:128, :128], img[128:256, :128], img[:128, 128:256]]
    avi = rawavi.encode_avi(frames, fps=10)
    avi_mb = sum(f.nbytes for f in frames) / 1e6
    out["avi_encode_mb_s"] = round(
        avi_mb / _timeit(lambda: rawavi.encode_avi(frames, fps=10), 3), 1
    )
    out["avi_decode_mb_s"] = round(
        avi_mb / _timeit(lambda: rawavi.decode_avi(avi), 3), 1
    )

    pal = (img // 32 * 32).astype(np.uint8)  # <=256 colors
    gif = rawgif.encode_gif(pal, 100)
    out["gif_encode_mb_s"] = round(
        pal.nbytes / 1e6 / _timeit(lambda: rawgif.encode_gif(pal, 100), 3), 1
    )
    out["gif_decode_mb_s"] = round(
        pal.nbytes / 1e6 / _timeit(lambda: rawgif.decode_gif(gif), 3), 1
    )

    from rawdata_client_provider_gcs_spark.operators import rawpdf, rawwebp

    # WebP: bit-serial prefix decode is Python-loop bound, so measure
    # on a 128x128 tile and report honestly (the catalog query uses
    # 16x16 fixtures; real crawl WebP decode at scale would sit behind
    # a native library — this codec is the correctness/loud-boundary
    # tier)
    tile = img[:128, :128]
    tile_mb = tile.nbytes / 1e6
    webp = rawwebp.encode_webp_lossless(tile, subtract_green=True)
    out["webp_encode_mb_s"] = round(
        tile_mb
        / _timeit(
            lambda: rawwebp.encode_webp_lossless(tile, subtract_green=True), 3
        ),
        2,
    )
    out["webp_decode_mb_s"] = round(
        tile_mb / _timeit(lambda: rawwebp.decode_webp(webp), 3), 2
    )

    # Lossy WebP (VP8 key-frame): per-MB Python token/recon loop —
    # same honesty note as VP8L; measured on a 128x128 gradient
    from rawdata_client_provider_gcs_spark.operators import rawmp3, rawvp8

    yv = np.clip(base[:128, :128], 0, 255).astype(np.uint8)
    uv = np.full((64, 64), 128, np.uint8)
    vp8 = rawvp8.encode_webp_lossy(yv, uv, uv.copy(), filter_level=20)
    vp8_mb = (yv.nbytes * 3 // 2) / 1e6  # YUV420 payload
    out["webp_lossy_encode_mb_s"] = round(
        vp8_mb
        / _timeit(
            lambda: rawvp8.encode_webp_lossy(yv, uv, uv.copy(), filter_level=20),
            3,
        ),
        2,
    )
    out["webp_lossy_decode_mb_s"] = round(
        vp8_mb / _timeit(lambda: rawwebp.decode_webp(vp8), 3), 2
    )

    mp3 = rawmp3.build_mp3(2000)  # ~52 s of 128k frames, ~834 KB
    mp3_mb = len(mp3) / 1e6
    out["mp3_meta_mb_s"] = round(
        mp3_mb / _timeit(lambda: rawmp3.parse_mp3(mp3), 5), 1
    )

    pdf_pages = [[f"line {i} of synthetic page text" * 3 for i in range(40)]] * 10
    pdf = rawpdf.encode_pdf(pdf_pages)
    pdf_mb = len(pdf) / 1e6
    out["pdf_extract_mb_s"] = round(
        pdf_mb / _timeit(lambda: rawpdf.extract_pdf(pdf), 5), 1
    )

    from rawdata_client_provider_gcs_spark.operators import rawflac

    flac_sig = rng.normal(0, 0.2, 16000 * 10).astype(np.float64)
    flac = rawflac.encode_flac(flac_sig, 16000, subframe="fixed2")
    flac_mb = len(flac_sig) * 2 / 1e6  # PCM-16 equivalent
    out["flac_encode_mb_s"] = round(
        flac_mb
        / _timeit(
            lambda: rawflac.encode_flac(flac_sig, 16000, subframe="fixed2"), 3
        ),
        2,
    )
    out["flac_decode_mb_s"] = round(
        flac_mb / _timeit(lambda: rawflac.decode_flac(flac), 3), 2
    )

    wav_samples = rng.normal(0, 0.2, 16000 * 30).astype(np.float64)  # 30 s
    wav = rawaudio.encode_wav_pcm16(wav_samples, 16000)
    wav_mb = len(wav) / 1e6
    out["wav_decode_mb_s"] = round(
        wav_mb / _timeit(lambda: rawaudio.decode_wav(wav), 5), 1
    )
    samples, rate = rawaudio.decode_wav(wav)
    out["fft_spectrum_clips_s"] = round(
        1.0 / _timeit(lambda: rawaudio.spectrum_features(samples, rate), 5), 1
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
