"""Operator-quality tests the oracle can't express: sketch recall vs the
exact operators, SimHash behavior on duplicates, ANN recall vs brute
force, multimodal feature extraction determinism."""

import pytest
from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from rawdata_client_provider_gcs_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "documents")


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates + exact verification recover nearly all truly
    similar pairs found by the exact shingle-join operator."""
    exact = _pair_set(
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    )
    assert exact, "fixture should contain near-duplicate documents"
    lsh = _pair_set(
        dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, num_hashes=64, bands=16,
            verify_threshold=0.5,
        )
    )
    # verified LSH pairs are a subset of exact pairs (no false positives)…
    assert lsh <= exact
    # …and recall at 16 bands × 4 rows for j >= 0.5 should be high
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"recall {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_simhash_duplicates_hamming_zero(spark, docs):
    """Duplicated texts (same content, new ids) produce identical SimHash
    signatures, so every duplicate pair surfaces at Hamming distance 0."""
    base = docs.select("doc_id", "text").limit(50)
    copies = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    both = base.unionAll(copies)
    sigs = dedup.simhash_signatures(both, "doc_id", "text")
    a = sigs.select(F.col("doc_id").alias("ida"), F.col("simhash").alias("sa"))
    b = sigs.select(
        (F.col("doc_id") + 100000).alias("ida"), F.col("simhash").alias("sb")
    )
    pairs = a.join(b, "ida")
    assert pairs.count() == 50
    assert pairs.filter(F.col("sa") != F.col("sb")).count() == 0
    # and the pair generator itself finds them all at distance 0
    found = dedup.simhash_pairs(both, "doc_id", "text", max_hamming=0)
    found_ids = {(r["id_a"], r["id_b"]) for r in found.collect()}
    expected = {
        (r["doc_id"], r["doc_id"] + 100000) for r in base.select("doc_id").collect()
    }
    assert expected <= found_ids


def test_lsh_ann_recall_vs_bruteforce(spark, sf_smoke_dir):
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_ann_topk(
            emb, q, k=5, dim=64, planes=4, tables=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall:.2f}"


def test_multimodal_features_deterministic(spark, docs):
    media = multimodal.with_media_columns(docs, "text", "text/plain", "doc_id")
    f1 = multimodal.extract_features(media, fake=True).orderBy("doc_id")
    f2 = multimodal.extract_features(media, fake=True).orderBy("doc_id")
    assert [r.asDict() for r in f1.limit(20).collect()] == [
        r.asDict() for r in f2.limit(20).collect()
    ]
    row = f1.first()
    assert row["n_bytes"] > 0 and len(row["features"]) > 0


def test_approx_percentile_error_bound(spark, sf_smoke_dir):
    """approx_percentile(accuracy=1000) lands within rank-error 1/1000 of
    the exact percentile on every group."""
    l = load_table(spark, sf_smoke_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["p"]
        for r in l.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_p"][1]
        for r in l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)"
            ).alias("approx_p")
        )
        .collect()
    }
    counts = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for flag, med in exact.items():
        n = counts[flag]
        # rank error 1/accuracy => value must fall between the exact
        # values at ranks 0.5*n -/+ n/1000 (plus one for boundary slack)
        lo_rank = max(0.0, 0.5 - 1.5 / 1000)
        hi_rank = min(1.0, 0.5 + 1.5 / 1000)
        bounds = (
            l.filter(F.col("l_returnflag") == flag)
            .agg(
                F.expr(f"percentile(l_extendedprice, {lo_rank})").alias("lo"),
                F.expr(f"percentile(l_extendedprice, {hi_rank})").alias("hi"),
            )
            .first()
        )
        assert bounds["lo"] <= approx[flag] <= bounds["hi"], (
            flag, bounds["lo"], approx[flag], bounds["hi"],
        )


def test_multimodal_resize_and_frames(spark, docs):
    # a video mime with NO recognized container tier: video/mp4 and
    # webm/avi read garbage as per-row corruption since round 9, so the
    # fake-stub plumbing is exercised under a genuinely stub-gated mime
    media = multimodal.with_media_columns(
        docs.limit(10), "text", "video/x-flv", "doc_id"
    )
    thumbs = multimodal.resize_images(media, 8, 8, fake=True)
    rows = thumbs.collect()
    assert len(rows) == 10
    assert all(len(bytes(r["thumb"])) == 64 for r in rows)
    # deterministic: same payload -> same thumb
    again = {r["doc_id"]: bytes(r["thumb"]) for r in thumbs.collect()}
    assert {r["doc_id"]: bytes(r["thumb"]) for r in rows} == again

    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=3, fake=True)
    frows = frames.collect()
    assert len(frows) >= 10  # at least one frame per doc
    assert all(len(bytes(r["frame"])) == 16 for r in frows)
    assert all(r["frame_ms"] == r["frame_idx"] * 1000 for r in frows)

    # real-decode path refuses loudly without the codec libraries
    with pytest.raises(Exception):
        multimodal.resize_images(media, 8, 8, fake=False).collect()


def test_hot_shingle_cap_bounds_pair_explosion(spark):
    """A stop-phrase shingle shared by every document must not create the
    |D|^2 pair explosion: with the doc-frequency cap the ubiquitous shingle
    is dropped from the representation; without it (cap disabled) the same
    corpus produces ~n^2/2 candidate pairs (VERDICT r1 'What's wrong' #3)."""
    n = 200
    rows = [
        # every doc shares the same 3-token phrase; unique tail tokens
        (i, f"common stop phrase unique{i} tail{i} word{i}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_doc_freq=50
    )
    uncapped = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.0, max_doc_freq=None
    )
    # uncapped: the shared shingle joins every doc pair -> n*(n-1)/2 rows
    assert uncapped.count() == n * (n - 1) // 2
    # capped: the hot shingle is gone; no doc pair shares a shingle
    assert capped.count() == 0
    # docs above the cap keep their *other* shingles (sizes consistent)
    sig = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", verify_threshold=0.0, max_doc_freq=50
    )
    assert sig.filter(F.col("jaccard") > 0.99).count() == 0


def test_ivf_ann_recall_vs_bruteforce(spark, sf_smoke_dir):
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_ann_topk(emb, q, k=5, nlist=16, nprobe=4).collect()
    }
    # probing 4/16 lists scans ~25% of the corpus; recall should beat that
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall {recall:.2f}"
    # every approx hit carries the exact cosine, so ranks are honest
    assert len(approx) == len(exact)


def test_ivf_kmeans_centroids_improve_recall_path(spark, sf_smoke_dir):
    """Trained quantizer plugs into the same operator (recall >= naive-ish)."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = similarity.train_centroids_kmeans(emb, nlist=16)
    assert cents.count() == 16
    out = similarity.ivf_ann_topk(
        emb, q, k=5, nlist=16, nprobe=4, centroids=cents
    )
    rows = out.collect()
    assert len(rows) == 50 and all(r["rank"] <= 5 for r in rows)


def test_connected_components_planted_graph(spark):
    """Chain, triangle, and isolated edge resolve to min-id components."""
    edges = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        (r["node_id"], r["component_id"])
        for r in dedup.connected_components(edges).collect()
    }
    want = {(n, 1) for n in (1, 2, 3, 4, 5)}
    want |= {(n, 10) for n in (10, 11, 12)}
    want |= {(n, 20) for n in (20, 21)}
    assert got == want


def test_binned_interval_join_equivalent_to_naive(spark, sf_smoke_dir):
    """Bin rewrite returns exactly the naive range-join pairs, via an
    equi-join plan (no nested-loop/cartesian operator)."""
    from rawdata_client_provider_gcs_spark.operators.rangejoin import (
        binned_interval_join,
    )
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    binned = binned_interval_join(
        clicks, purchases,
        point=us("click_ts"),
        start=us("purchase_ts") - 1_800_000_000,
        end=us("purchase_ts"),
        bin_width=600_000_000,  # deliberately != interval length
    )
    naive = clicks.join(
        purchases,
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            us("click_ts") >= us("purchase_ts") - 1_800_000_000
        ),
    )
    got = {(r["click_id"], r["purchase_id"]) for r in binned.collect()}
    want = {(r["click_id"], r["purchase_id"]) for r in naive.collect()}
    assert got == want and want
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_near_dup_auto_lsh_blocking_no_cartesian(spark, sf_smoke_dir):
    """Without block_col the near-dup self-join auto-blocks via LSH:
    the plan must contain no cartesian/nested-loop node, every emitted
    pair must be a true pair (exact cosines => precision 1), and recall
    on the fixture must clear the hyperplane-collision floor."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    auto = similarity.embedding_near_dup_pairs(
        emb, threshold=0.35, planes=4, tables=8
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    got = {(r["id_a"], r["id_b"]) for r in auto.collect()}
    # ground truth via an explicit all-pairs join (test-only, tiny fixture)
    l = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    r = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = {
        (row["id_a"], row["id_b"])
        for row in l.crossJoin(r)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(similarity.cosine_similarity(F.col("va"), F.col("vb")) >= 0.35)
        .collect()
    }
    assert got <= truth, "auto-blocked pairs must all be true pairs"
    assert truth, "fixture must produce ground-truth pairs"
    recall = len(got) / len(truth)
    assert recall >= 0.5, f"LSH-blocked recall {recall:.2f}"


def test_ivf_assignment_is_mapside(spark, sf_smoke_dir):
    """Small-nlist IVF assignment must not shuffle the corpus BY CELL OR
    JOIN KEY: the only exchanges allowed are the per-query top-k window
    (on query_id) and the pre-kernel ``scan_parallel`` repartition on
    the corpus id (guide §2.5 — a no-op whenever the scan already has
    core-count splits, i.e. at any real corpus scale; here the
    single-row-group fixture triggers it)."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    out = similarity.ivf_ann_topk(emb, q, k=5, nlist=16, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    key_lists = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    window_ex = [k for k in key_lists if "query_id" in k]
    parallelize_ex = [
        k for k in key_lists if "vec_id" in k or "neighbor_id" in k
    ]
    assert len(window_ex) <= 1, plan
    assert len(parallelize_ex) <= 1, plan
    assert len(key_lists) == len(window_ex) + len(parallelize_ex), plan
    assert "CartesianProduct" not in plan


def test_ngram_jaccard_releases_shingle_persist(spark, sf_smoke_dir):
    """The exploded shingle persist must not outlive the operator call
    (a full-corpus cache left pinned evicts everything else at scale)."""
    docs = load_table(spark, sf_smoke_dir, "documents")
    before = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    assert out.count() >= 0
    after = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert after == before, "operator leaked a cached plan"


def test_cc_star_deep_path_graph(spark):
    """Large-star/small-star resolves a 200-node path (diameter 199) in
    O(log n) rounds — far inside max_iter=12, where min-label propagation
    would need ~199 rounds."""
    n = 200
    # path with ids shuffled so the minimum sits mid-path (adversarial)
    ids = [(i * 73) % n for i in range(n)]  # 73 coprime with 200: a permutation
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        (r["node_id"], r["component_id"])
        for r in dedup.connected_components(
            edges, max_iter=12, algorithm="star"
        ).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    # propagation with the same budget provably cannot finish a 199-diameter path
    prop = {
        (r["node_id"], r["component_id"])
        for r in dedup.connected_components(
            edges, max_iter=12, algorithm="propagation"
        ).collect()
    }
    assert prop != got, "12 propagation rounds should not close a 199-diameter path"


def test_cc_star_agrees_with_propagation(spark):
    """Both variants produce identical labelings on a mixed graph."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (20, 21), (30, 30)],
        "id_a long, id_b long",
    )
    a = {
        (r["node_id"], r["component_id"])
        for r in dedup.connected_components(edges, algorithm="star").collect()
    }
    b = {
        (r["node_id"], r["component_id"])
        for r in dedup.connected_components(
            edges, algorithm="propagation"
        ).collect()
    }
    assert a == b


def test_real_image_decode_when_pillow_present(spark):
    """With pillow importable the image kernels are real: decode, resize,
    and feature-extract actual pixels behind the identical schema.  Skips
    in containers without pillow (like this one) — the stub paths above
    cover the plumbing there."""
    Image = multimodal._pil_image()
    if Image is None:
        pytest.skip("pillow not installed")
    import io

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, png)], "doc_id long, img binary")
    media = multimodal.with_media_columns(df, "img", "image/png", "doc_id")

    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 1 and abs(sum(feats[0]["features"]) - 1.0) < 1e-9
    # uniform gray 128 -> every pixel in bucket 128>>5 == 4
    assert feats[0]["features"][4] == 1.0

    thumbs = multimodal.resize_images(media, 8, 8).collect()
    with Image.open(io.BytesIO(bytes(thumbs[0]["thumb"]))) as t:
        assert t.size == (8, 8)


def test_multimodal_raw_image_decode_real(spark):
    """Uncompressed PPM/BMP payloads decode for REAL (no pillow, no fake)."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    ppm = rawimage.encode_ppm(img)
    assert np.array_equal(rawimage.decode_image(ppm), img)

    # hand-rolled 24-bit BMP of the same pixels (bottom-up, padded rows)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        raster += line + b"\0" * (stride - len(line))
    header = (
        b"BM"
        + (14 + 40 + len(raster)).to_bytes(4, "little")
        + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\0" * 16
    )
    assert np.array_equal(rawimage.decode_image(header + bytes(raster)), img)

    # through the Spark kernels, fake=False: decode and resize both real
    df = spark.createDataFrame(
        [(1, bytes(ppm)), (2, header + bytes(raster))], "doc_id long, content binary"
    )
    media = multimodal.with_media_columns(df, "content", "image/x-raw", "doc_id")
    feats = {
        r["doc_id"]: r["features"]
        for r in multimodal.extract_features(media, fake=False).collect()
    }
    assert len(feats) == 2
    assert abs(sum(feats[1]) - 1.0) < 1e-9
    assert feats[1] == feats[2]  # same pixels -> same histogram

    thumbs = multimodal.resize_images(media, 8, 6, fake=False).collect()
    for r in thumbs:
        arr = rawimage.decode_image(bytes(r["thumb"]))
        assert arr.shape == (6, 8, 3)
    # nearest-neighbor from identical pixels -> identical thumbs
    t = {r["doc_id"]: bytes(r["thumb"]) for r in thumbs}
    assert t[1] == t[2]


def test_rawaudio_codec_roundtrip():
    """WAV encode/decode round-trips across PCM widths and float."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio

    rng = np.random.default_rng(11)
    samples = rng.uniform(-0.9, 0.9, size=(800, 2))
    wav = rawaudio.encode_wav_pcm16(samples, 8000)
    assert rawaudio.sniff_wav(wav)
    decoded, rate = rawaudio.decode_wav(wav)
    assert rate == 8000 and decoded.shape == (800, 2)
    # 16-bit quantization + the asymmetric 32767-encode/32768-decode scale
    assert np.abs(decoded - samples).max() < 1e-4

    # IEEE float32 mono, hand-rolled container
    f32 = samples[:, 0].astype("<f4").tobytes()
    fmt = (
        (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (32).to_bytes(2, "little")
    )
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(f32).to_bytes(4, "little") + f32
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    dec, rate = rawaudio.decode_wav(payload)
    assert rate == 8000 and dec.shape == (800, 1)
    assert np.abs(dec[:, 0] - samples[:, 0]).max() < 1e-6

    # 24-bit PCM round-trip via manual encode
    ints = np.round(samples[:, 0] * (1 << 23)).clip(-(1 << 23), (1 << 23) - 1).astype(np.int64)
    raw = bytearray()
    for v in ints:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    fmt24 = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (24000).to_bytes(4, "little")
        + (3).to_bytes(2, "little") + (24).to_bytes(2, "little")
    )
    body = b"WAVEfmt " + len(fmt24).to_bytes(4, "little") + fmt24
    body += b"data" + len(raw).to_bytes(4, "little") + bytes(raw)
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    dec24, _ = rawaudio.decode_wav(payload)
    assert np.abs(dec24[:, 0] - samples[:, 0]).max() < 1.0 / (1 << 23) + 1e-9


def test_multimodal_wav_audio_real(spark):
    """WAV payloads get REAL features and REAL segmentation (no fake)."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio

    rng = np.random.default_rng(13)
    rate = 4000
    # 2.5 seconds mono: deterministic sine + noise
    t = np.arange(int(rate * 2.5)) / rate
    clip = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
    wav = rawaudio.encode_wav_pcm16(np.clip(clip, -1, 1), rate)

    df = spark.createDataFrame([(1, wav), (2, wav)], "doc_id long, content binary")
    media = multimodal.with_media_columns(df, "content", "audio/wav", "doc_id")

    feats = {
        r["doc_id"]: r["features"]
        for r in multimodal.extract_features(media, fake=False).collect()
    }
    assert len(feats) == 2 and feats[1] == feats[2]
    dur, channels, frate, rms, peak, zcr, mean, std = feats[1]
    assert abs(dur - 2.5) < 1e-9
    assert channels == 1.0 and frate == rate
    assert 0.3 < rms < 0.45  # sine RMS ~0.354 plus noise
    assert 0 < zcr < 1

    # real segmentation: one standalone WAV clip per second
    frames = multimodal.sample_frames(
        media, every_ms=1000, max_frames=8, fake=False
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {len(v) for v in by_doc.values()} == {3}  # 2.5 s -> 3 segments
    for r in sorted(by_doc[1], key=lambda r: r["frame_idx"]):
        seg, seg_rate = rawaudio.decode_wav(bytes(r["frame"]))
        assert seg_rate == rate
        expect = rate if r["frame_idx"] < 2 else rate // 2
        assert seg.shape[0] == expect
        assert r["frame_ms"] == r["frame_idx"] * 1000


def test_ivf_pq_recall_vs_bruteforce(spark, sf_smoke_dir):
    """PQ codes + exact rerank recover most true neighbors; scores on the
    reranked output are exact cosines (rerank re-scores true vectors)."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    truth_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}

    approx = similarity.ivf_pq_topk(
        emb, q, k=5, nlist=16, nprobe=8, m=8, codes=16, rerank=60
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # nprobe 8/16 scans ~half the corpus; PQ shortlist + exact rerank
    # must do far better than the 50% scan fraction
    assert recall >= 0.6, f"IVF-PQ recall {recall:.2f}"
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in truth_cos:
            assert abs(r["cosine"] - truth_cos[key]) < 1e-9  # exact rerank


def test_ivf_pq_no_rerank_scores_are_adc(spark, sf_smoke_dir):
    """Without rerank the scores are PQ approximations: close to the true
    cosine but not equal — proving candidates were scored from codes,
    never from the original vectors."""
    emb = load_table(spark, sf_smoke_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = similarity.ivf_pq_topk(
        emb, q, k=5, nlist=16, nprobe=8, m=8, codes=16, rerank=0
    ).collect()
    assert len(rows) == 25 and all(r["rank"] <= 5 for r in rows)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.brute_force_topk(emb, q, k=400).collect()
    }
    diffs = [
        abs(r["cosine"] - exact[(r["query_id"], r["neighbor_id"])])
        for r in rows
        if (r["query_id"], r["neighbor_id"]) in exact
    ]
    assert diffs, "no overlap with exact scores to compare"
    assert 1e-12 < max(diffs) < 0.5, f"ADC error range off: {max(diffs)}"


def test_zorder_write_locality(spark, tmp_path, sf_smoke_dir):
    """Min/max file pruning on the SECOND dimension: a linear sort on x
    leaves y unconstrained (every file's [ymin, ymax] spans everything,
    nothing prunes), while z-order bounds both dimensions, so a
    y-predicate skips most files — the property that matters at 100 TB."""
    import glob as _glob

    import pyarrow.parquet as pq

    from rawdata_client_provider_gcs_spark.operators import zorder

    li = load_table(spark, sf_smoke_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("x"),
        F.col("l_suppkey").cast("long").alias("y"),
    )

    def files_matching_y(path, y_val):
        total, hit = 0, 0
        for f in _glob.glob(f"{path}/*.parquet"):
            ys = pq.read_table(f, columns=["y"])["y"].to_numpy()
            total += 1
            if ys.min() <= y_val <= ys.max():
                hit += 1
        return hit, total

    z_path = str(tmp_path / "zordered")
    zorder.zorder_write(li, z_path, ["x", "y"], bits=16, num_files=16)
    lin_path = str(tmp_path / "linear")
    (
        li.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    z_hit, z_total = files_matching_y(z_path, 5)
    lin_hit, lin_total = files_matching_y(lin_path, 5)
    # x-sorted files all contain every supplier key: nothing prunes
    assert lin_hit == lin_total
    # z-ordered files bound y too: a y-predicate reads at most half
    assert z_hit <= z_total // 2, (z_hit, z_total)
    # no rows lost by the rewrite
    assert spark.read.parquet(z_path).count() == li.count()
    # the key itself is consistent with the SQL formula via the
    # oracle-checked catalog query (q_zorder_key)


def test_rank_scale_bounds(spark, sf_smoke_dir):
    from rawdata_client_provider_gcs_spark.operators import zorder

    s = load_table(spark, sf_smoke_dir, "supplier")
    scaled = zorder.rank_scale(s, "s_acctbal", bits=8)
    row = scaled.agg(
        F.min("s_acctbal__scaled").alias("lo"),
        F.max("s_acctbal__scaled").alias("hi"),
    ).first()
    assert row["lo"] == 0 and 0 < row["hi"] <= 255


def test_png_codec_roundtrip_and_closed_form_size():
    """PNG encode→decode round-trips, and level-0 (stored) byte count is
    the closed form the oracle-checked image queries rely on."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (4, 8), (7, 5), (16, 16)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for level in (0, 6, 9):
            png = rawimage.encode_png(img, level=level)
            assert rawimage.sniff_format(png) == "png"
            assert np.array_equal(rawimage.decode_image(png), img)
        assert len(rawimage.encode_png(img, level=0)) == 68 + (3 * w + 1) * h


def test_png_decode_all_filter_types():
    """Scanlines forward-filtered with each of Sub/Up/Average/Paeth
    unfilter back to the original pixels."""
    import struct
    import zlib

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    flat = img.reshape(h, stride).astype(int)
    raster = bytearray()
    filters = [0, 1, 2, 3, 4]
    for y, ftype in zip(range(h), filters):
        raster.append(ftype)
        for i in range(stride):
            x = flat[y, i]
            left = flat[y, i - ch] if i >= ch else 0
            up = flat[y - 1, i] if y else 0
            ul = flat[y - 1, i - ch] if (y and i >= ch) else 0
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = x - left
            elif ftype == 2:
                v = x - up
            elif ftype == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - paeth(left, up, ul)
            raster.append(v & 0xFF)

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(rawimage.decode_image(png), img)


def test_png_decode_color_types():
    """Grayscale, palette, gray+alpha, and RGBA PNGs all normalize to the
    (H, W, 3) RGB contract."""
    import struct
    import zlib

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    def build(w, h, color, raster, plte=None):
        body = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        if plte is not None:
            body += chunk(b"PLTE", plte)
        body += chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
        return b"\x89PNG\r\n\x1a\n" + body

    # grayscale 2x2: values 10,20 / 30,40
    gray = build(2, 2, 0, b"\x00\x0a\x14" + b"\x00\x1e\x28")
    expect = np.array(
        [[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]], dtype=np.uint8
    )
    assert np.array_equal(rawimage.decode_image(gray), expect)

    # palette 2x1: indices 1,0 over a 2-entry palette
    pal = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    plte_png = build(2, 1, 3, b"\x00\x01\x00", plte=pal)
    assert np.array_equal(
        rawimage.decode_image(plte_png),
        np.array([[[0, 0, 255], [255, 0, 0]]], dtype=np.uint8),
    )

    # gray+alpha 1x2 and RGBA 1x1: alpha dropped
    ga = build(2, 1, 4, b"\x00\x64\xff\xc8\x00")
    assert np.array_equal(
        rawimage.decode_image(ga),
        np.array([[[100] * 3, [200] * 3]], dtype=np.uint8),
    )
    rgba = build(1, 1, 6, b"\x00\x01\x02\x03\x80")
    assert np.array_equal(
        rawimage.decode_image(rgba), np.array([[[1, 2, 3]]], dtype=np.uint8)
    )


def test_png_pillow_parity():
    """When pillow is importable, its decode of our PNGs matches ours
    byte-for-byte (and vice versa for a pillow-written PNG)."""
    import io

    import numpy as np

    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    from rawdata_client_provider_gcs_spark.operators import rawimage

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    ours = rawimage.encode_png(img)
    with Image.open(io.BytesIO(ours)) as p:
        assert np.array_equal(np.asarray(p.convert("RGB")), img)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert np.array_equal(rawimage.decode_image(buf.getvalue()), img)


def test_png_through_spark_kernels(spark):
    """image/png payloads run the REAL decode path (fake=False) through
    extract_features and resize_images."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import multimodal, rawimage

    img = np.full((4, 8, 3), 128, dtype=np.uint8)
    png = rawimage.encode_png(img)
    df = spark.createDataFrame([(1, png)], "doc_id long, content binary")
    media = multimodal.with_media_columns(df, "content", "image/png", "doc_id")
    feats = multimodal.extract_features(media, fake=False).collect()
    assert feats[0]["features"][128 >> 5] == 1.0  # one-hot luma histogram
    thumbs = multimodal.resize_images(media, 4, 2, fake=False, raw_only=True).collect()
    arr = rawimage.decode_image(bytes(thumbs[0]["thumb"]))
    assert arr.shape == (2, 4, 3) and (arr == 128).all()


def test_brute_force_topk_guards_oversized_query_set(spark):
    """The exact tier broadcasts the query set; an oversized one must
    fail loud (pointing at the ANN tiers) instead of OOMing mid-job."""
    from rawdata_client_provider_gcs_spark.operators import similarity

    vecs = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="exceeds 10 rows"):
        similarity.brute_force_topk(vecs, vecs, k=3, max_queries=10)
    # small query sets (and an explicit opt-out) still work
    out = similarity.brute_force_topk(vecs, vecs.limit(5), k=3)
    assert out.count() == 15
    assert similarity.brute_force_topk(
        vecs, vecs.limit(12), k=1, max_queries=None
    ).count() == 12


def test_decontam_planted_overlap(spark):
    """Planted benchmark overlap is found exactly; clean docs pass the
    anti-join untouched; and the probe plan broadcasts the benchmark
    side (no corpus-sized shuffle for the join)."""
    from rawdata_client_provider_gcs_spark.operators import decontam

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            # contains an exact 8-gram of the benchmark
            (1, "x y " + "alpha beta gamma delta epsilon zeta eta theta" + " q r"),
            (2, "totally unrelated words nothing shared here at all ok fine"),
            # shares 7-gram only -> NOT contaminated at k=8
            (3, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    report = decontam.contaminated_docs(docs, bench, k=8)
    rows = {r["doc_id"]: r for r in report.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_grams_hit"] == 1 and rows[1]["n_bench_docs"] == 1

    clean = decontam.decontaminate(docs, bench, k=8)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}

    plan = report._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_exact_counts(spark):
    """Token/bigram repetition facts are exact on hand-computable docs,
    including the no-bigram edge cases."""
    from rawdata_client_provider_gcs_spark.operators import decontam

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # 4 tokens, 2 distinct; bigrams: a a, a a, a b -> top 2
            (2, "one"),              # single token: no bigrams
            (3, ""),                 # empty: all zero
            (4, "x y x y x"),        # bigrams: x y, y x, x y, y x -> top 2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontam.repetition_stats(docs).collect()}
    assert (got[1]["n_tokens"], got[1]["n_distinct_tokens"],
            got[1]["n_bigrams"], got[1]["top_bigram_count"]) == (4, 2, 3, 2)
    assert (got[2]["n_tokens"], got[2]["n_bigrams"], got[2]["top_bigram_count"]) == (1, 0, 0)
    assert (got[3]["n_tokens"], got[3]["n_bigrams"], got[3]["top_bigram_count"]) == (0, 0, 0)
    assert (got[4]["n_tokens"], got[4]["n_distinct_tokens"],
            got[4]["top_bigram_count"]) == (5, 2, 2)


def test_jpeg_roundtrip_constant_gray_exact():
    """Constant even-gray images round-trip bit-exactly at quality 50 in
    both samplings — the closed form the JPEG oracle rows rely on: the
    DC coefficient 8*(v-128) divides the luma DC quantizer 16 exactly,
    and chroma planes are exactly 128."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage, rawjpeg

    for v in (0, 64, 128, 200, 254):
        img = np.full((24, 40, 3), v, dtype=np.uint8)
        for sub in ("4:4:4", "4:2:0", "4:2:2"):
            enc = rawjpeg.encode_jpeg(img, quality=50, subsampling=sub)
            assert rawimage.sniff_format(enc) == "jpeg"
            assert np.array_equal(rawimage.decode_image(enc), img), (v, sub)


def test_jpeg_roundtrip_psnr():
    """Smooth images survive encode→decode at high quality in 4:4:4,
    4:2:0, with restart markers, and at odd (padded) dimensions."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)

    x = np.linspace(0, 255, 64)
    grad = np.stack(np.meshgrid(x, x), axis=-1).sum(-1) / 2
    img = np.stack([grad, grad[::-1], grad.T], axis=2).astype(np.uint8)

    assert psnr(img, rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, 90))) > 45
    assert (
        psnr(
            img,
            rawjpeg.decode_jpeg(
                rawjpeg.encode_jpeg(img, 90, subsampling="4:2:0")
            ),
        )
        > 40
    )
    assert (
        psnr(
            img,
            rawjpeg.decode_jpeg(
                rawjpeg.encode_jpeg(img, 90, subsampling="4:2:2")
            ),
        )
        > 42
    )
    assert (
        psnr(
            img,
            rawjpeg.decode_jpeg(rawjpeg.encode_jpeg(img, 90, restart_interval=3)),
        )
        > 45
    )
    odd = img[:37, :53]
    dec = rawjpeg.decode_jpeg(
        rawjpeg.encode_jpeg(odd, 90, subsampling="4:2:0", restart_interval=2)
    )
    assert dec.shape == odd.shape
    assert psnr(odd, dec) > 40


def test_jpeg_decode_handcrafted_single_block():
    """A hand-assembled one-block grayscale JPEG (quant all-ones, one
    1-bit Huffman code per table, DC=10, no AC) must decode to a
    constant 129 = round(128 + 10/8).  This fixture is independent of
    our encoder, so a compensating DC-scale bug in encode+decode (both
    off by the same factor) cannot hide behind round-trip tests."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    jpeg = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + b"\x01" * 64)
        + seg(0xC0, b"\x08\x00\x08\x00\x08\x01\x01\x11\x00")
        + seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + bytes([4]))
        + seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + bytes([0]))
        + seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        # bits: DC code "0", category-4 value 1010 (=+10), AC EOB "0",
        # padded with 1s -> 0b01010011
        + b"\x53"
        + b"\xff\xd9"
    )
    out = rawjpeg.decode_jpeg(jpeg)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, np.full((8, 8, 3), 129, dtype=np.uint8))


def test_jpeg_sof2_routing_and_malformed_scan_rejection():
    """Real progressive (SOF2) streams decode via the progressive
    module (round 6); a baseline stream with a REWRITTEN SOF2 marker —
    whose single 0-63 scan is illegal under a progressive header —
    still raises loudly instead of silently decoding only the DC band."""
    import numpy as np
    import pytest as _pytest

    from rawdata_client_provider_gcs_spark.operators import rawjpeg
    from rawdata_client_provider_gcs_spark.operators import (
        rawjpeg_progressive as prog,
    )

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    out = rawjpeg.decode_jpeg(prog.encode_jpeg_progressive(img, 50))
    assert np.array_equal(out, img)

    enc = bytearray(rawjpeg.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with _pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        rawjpeg.decode_jpeg(bytes(enc))


def test_jpeg_pillow_parity():
    """When pillow is importable: libjpeg decodes our streams to within
    a few LSBs of our own decode (DCT rounding differs), and our decoder
    handles a pillow-written 4:2:0 JPEG."""
    import io

    import numpy as np

    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    from rawdata_client_provider_gcs_spark.operators import rawjpeg

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)

    x = np.linspace(0, 255, 48)
    grad = np.stack(np.meshgrid(x, x), axis=-1).sum(-1) / 2
    img = np.stack([grad, grad.T, grad[::-1]], axis=2).astype(np.uint8)

    for sub in ("4:4:4", "4:2:0"):
        enc = rawjpeg.encode_jpeg(img, quality=90, subsampling=sub)
        with Image.open(io.BytesIO(enc)) as p:
            theirs = np.asarray(p.convert("RGB"))
        assert psnr(rawjpeg.decode_jpeg(enc), theirs) > 40, sub

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    assert psnr(img, rawjpeg.decode_jpeg(buf.getvalue())) > 35


def test_gif_codec_roundtrip_and_animation():
    """GIF encode→decode is lossless for palette images: single frame,
    multi-frame with per-frame delays, and a full 256-color image big
    enough to force LZW code-width growth and a dictionary reset."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawgif, rawimage

    rng = np.random.default_rng(5)
    img = (rng.integers(0, 6, (17, 23, 3)) * 40).astype(np.uint8)
    gif = rawgif.encode_gif(img, 100)
    assert rawimage.sniff_format(gif) == "gif"
    assert np.array_equal(rawimage.decode_image(gif), img)

    f1 = np.full((8, 10, 3), 30, np.uint8)
    f2 = np.full((8, 10, 3), 60, np.uint8)
    f2[2:5, 3:7] = 200
    f3 = np.zeros((8, 10, 3), np.uint8)
    out = rawgif.decode_gif(rawgif.encode_gif([f1, f2, f3], [50, 120, 250]))
    assert [d for d, _ in out] == [50, 120, 250]
    assert all(np.array_equal(a, b) for (_, a), b in zip(out, [f1, f2, f3]))

    pal = np.stack(
        [np.arange(256), np.arange(256)[::-1], np.full(256, 7)], axis=1
    ).astype(np.uint8)
    rgb = pal[rng.integers(0, 256, (120, 200), np.uint8)]
    assert np.array_equal(rawgif.decode_gif(rawgif.encode_gif(rgb, 100))[0][1], rgb)

    with pytest.raises(ValueError, match="cap"):
        rawgif.encode_gif(rng.integers(0, 256, (40, 40, 3), np.uint8), 100)


def test_gif_decode_interlaced():
    """A hand-assembled interlaced GIF (rows stored in four-pass order)
    de-interlaces back to natural row order."""
    import struct

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawgif

    h, w = 8, 4
    idx = np.repeat(np.arange(h, dtype=np.uint8), w).reshape(h, w)
    stored = idx[[0, 4, 2, 6, 1, 3, 5, 7]]  # pass order for 8 rows
    pal = np.zeros((8, 3), np.uint8)
    pal[:, 0] = np.arange(8) * 30  # row y decodes to red 30*y
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x80 | 2, 0, 0)  # GCT, 8 entries
    gif += pal.tobytes()
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    mcs = 3
    gif.append(mcs)
    lzw = rawgif._lzw_encode(stored.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif += b"\x00\x3b"
    out = rawgif.decode_gif(bytes(gif))[0][1]
    expect = pal[idx]
    assert np.array_equal(out, expect)


def test_gif_decode_transparency_composes_over_previous():
    """Frame 2's transparent pixels keep frame 1's canvas content."""
    import struct

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawgif

    w = h = 4
    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 40], [9, 9, 9]], np.uint8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # GCT, 4 entries
    gif += pal.tobytes()

    def frame(indices, transparent=None):
        body = bytearray()
        gflags = 1 if transparent is not None else 0
        body += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, 5, transparent or 0
        ) + b"\x00"
        body += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        body.append(2)
        lzw = rawgif._lzw_encode(bytes(indices), 2)
        body.append(len(lzw))
        body += lzw
        body.append(0)
        return body

    gif += frame([0] * 16)  # all color 0
    # second frame: top half transparent (index 3), bottom half color 2
    gif += frame([3] * 8 + [2] * 8, transparent=3)
    gif += b"\x3b"
    frames = rawgif.decode_gif(bytes(gif))
    assert len(frames) == 2
    final = frames[1][1]
    assert np.array_equal(final[:2], np.broadcast_to(pal[0], (2, w, 3)))
    assert np.array_equal(final[2:], np.broadcast_to(pal[2], (2, w, 3)))


def test_gif_pillow_parity():
    """When pillow is importable it reads our GIFs frame-for-frame."""
    import io

    import numpy as np

    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    from rawdata_client_provider_gcs_spark.operators import rawgif

    f1 = np.full((6, 9, 3), 50, np.uint8)
    f2 = np.full((6, 9, 3), 90, np.uint8)
    gif = rawgif.encode_gif([f1, f2], [40, 80])
    with Image.open(io.BytesIO(gif)) as im:
        assert im.n_frames == 2
        im.seek(0)
        assert np.array_equal(np.asarray(im.convert("RGB")), f1)
        im.seek(1)
        assert np.array_equal(np.asarray(im.convert("RGB")), f2)


def test_pagerank_hand_computed_two_node_graph(spark):
    """A→B for two iterations, worked by hand: rank mass conserves and
    matches the recurrence exactly (incl. the dangling term — B is a
    sink, so its whole mass recirculates each round)."""
    from rawdata_client_provider_gcs_spark.operators import graph

    edges = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(edges, iters=2, weight_col="w").collect()
    }
    assert abs(got[1] - 0.3778125) < 1e-12
    assert abs(got[2] - 0.6221875) < 1e-12


def test_pagerank_mass_conservation_and_weights(spark):
    """Total rank mass stays 1.0 on an arbitrary weighted graph, and a
    heavier inbound edge yields a higher rank."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import graph

    edges = spark.createDataFrame(
        [
            (1, 2, 3.0),
            (1, 3, 1.0),
            (2, 3, 1.0),
            (3, 1, 2.0),
            (4, 1, 1.0),
        ],
        "src long, dst long, w double",
    )
    ranks = graph.pagerank(edges, iters=8, weight_col="w")
    total = ranks.agg(F.sum("pr")).first()[0]
    assert abs(total - 1.0) < 1e-9
    got = {r["node"]: r["pr"] for r in ranks.collect()}
    # node 2 receives 3/4 of node 1's rank, node 3 only 1/4 of it
    assert got[2] > got[4]
    assert got[3] > got[4]  # two inbound edges beat the leaf


def test_bpe_training_hand_computed():
    """Merge learning on a 2-word corpus, worked by hand: ('a','b')
    first (weighted count 5 beats ('a','a') at 4), then the tie between
    ('a','a') and ('a','ab') at 2 breaks lexicographically."""
    from rawdata_client_provider_gcs_spark.functions import bpe

    merges = bpe.train_merges_local([("aaab", 2), ("ab", 3)], 4)
    assert merges == [("a", "b"), ("a", "a"), ("aa", "ab")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.apply_merges_to_word("aaab", ranks) == ["aaab"]
    assert bpe.apply_merges_to_word("aab", ranks) == ["a", "ab"]
    assert bpe.apply_merges_to_word("xyz", ranks) == ["x", "y", "z"]


def test_bpe_spark_train_apply_invariants(spark, sf_smoke_dir):
    """Distributed train + apply: segmentation partitions the text
    (detokenization reproduces the regex-word character stream) and
    token counts are monotonically nonincreasing in merge count."""
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.functions import bpe
    from rawdata_client_provider_gcs_spark.tables import load_table

    d = load_table(spark, sf_smoke_dir, "documents")
    merges = bpe.train_bpe(d, num_merges=20)
    assert 0 < len(merges) <= 20
    assert len(set(merges)) == len(merges)  # no duplicate merges

    toks = bpe.bpe_tokenize(d, merges)
    joined = toks.select(
        "doc_id", F.concat_ws("", "tokens").alias("detok")
    )
    expect = d.select(
        "doc_id",
        F.concat_ws(
            "", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("detok"),
    )
    assert joined.exceptAll(expect).count() == 0
    assert expect.exceptAll(joined).count() == 0

    n_few = (
        bpe.bpe_tokenize(d, merges[:5]).agg(F.sum("n_tokens")).first()[0]
    )
    n_many = toks.agg(F.sum("n_tokens")).first()[0]
    n_none = bpe.bpe_tokenize(d, []).agg(F.sum("n_tokens")).first()[0]
    assert n_none >= n_few >= n_many
    assert n_many < n_none  # merges actually compress


def test_quantize_int8_error_bound_and_roundtrip(spark):
    """int8 quantization: |x − c·s| ≤ s/2 on every dimension, zero
    vectors stay zero, and dequantized cosine stays close."""
    import numpy as np
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import similarity

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(0, 0.3, 16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = similarity.quantize_int8(emb)
    got = {r["vec_id"]: r for r in q.collect()}
    assert got[99]["scale"] == 0.0 and got[99]["sum_codes"] == 0
    for i, vec in rows[:-1]:
        r = got[i]
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        recon = np.array(r["codes"], float) * r["scale"]
        orig = np.array(vec)
        cos = recon.dot(orig) / (
            np.linalg.norm(recon) * np.linalg.norm(orig)
        )
        assert cos > 0.999, (i, cos)
    # pure map: no exchange in the plan
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rawaudio_spectrum_features():
    """rfft features on on-bin sines: dominant bin/freq exact, magnitude
    A*N/2 to float64 precision, centroid equal to the sine frequency."""
    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawaudio

    rate, n = 8000, 256
    for b, amp in [(1, 0.5), (37, 0.25), (100, 0.125), (127, 1.0)]:
        x = amp * np.sin(2 * np.pi * b * np.arange(n) / n)
        k, f, m, c = rawaudio.spectrum_features(x, rate)
        assert k == b
        assert f == b * rate / n
        assert abs(m - amp * n / 2) < 1e-9
        assert abs(c - f) < 1e-5 * max(f, 1.0)
    # stereo mixes to mono first; short clips zero-pad
    st = np.stack([x, x], axis=1)
    assert rawaudio.spectrum_features(st, rate)[0] == 127
    short = amp * np.sin(2 * np.pi * 16 * np.arange(64) / 64)
    k, _, _, _ = rawaudio.spectrum_features(short, rate)
    assert k == 64  # 16 cycles in 64 samples -> bin 64 of a 256-pt FFT


def test_compression_stats_invariants(spark):
    """Compression-ratio signal: repetitive text compresses far below
    random prose, ratios stay within sane bounds, empty text is 0/0,
    and repeated runs are byte-identical (zlib is deterministic)."""
    from rawdata_client_provider_gcs_spark.operators import decontam

    import random

    rng = random.Random(3)
    rand_text = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(200)
    )
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, rand_text),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontam.compression_stats(docs).collect()}
    assert got[1]["compression_ratio"] < 0.05  # pure repetition
    assert got[2]["compression_ratio"] > 0.5  # random letters barely compress
    assert got[3]["raw_bytes"] == 0 and got[3]["compression_ratio"] == 0.0
    assert got[4]["raw_bytes"] == 0
    again = {r["doc_id"]: r for r in decontam.compression_stats(docs).collect()}
    assert all(
        got[k]["zlib_bytes"] == again[k]["zlib_bytes"] for k in got
    )


def test_vector_index_persists_in_topic_metadata(spark, tmp_path, sf_smoke_dir):
    """Train an IVF quantizer, persist it in a topic's metadata KV
    (the reference's S15 surface), load it back, and get bit-identical
    search results — the train-once/reuse-everywhere flow."""
    import numpy as np

    from rawdata_client_provider_gcs_spark import RawdataClient
    from rawdata_client_provider_gcs_spark.operators import similarity
    from rawdata_client_provider_gcs_spark.tables import load_table

    emb = load_table(spark, sf_smoke_dir, "embeddings")
    cents = similarity.train_centroids_kmeans(emb, nlist=4)
    _, books = None, similarity.train_pq_codebooks(emb, m=4, k=8)

    client = RawdataClient(spark, str(tmp_path))
    meta = client.metadata("t-index")
    similarity.save_vector_index(meta, "ivf-main", cents, books)
    assert "ivf-main" in meta.keys()
    loaded_c, loaded_b = similarity.load_vector_index(meta, "ivf-main", spark)
    orig = {r["cid"]: list(r["cvec"]) for r in cents.collect()}
    back = {r["cid"]: list(r["cvec"]) for r in loaded_c.collect()}
    assert orig == back
    assert np.array_equal(np.asarray(books, np.float64), loaded_b)

    queries = emb.limit(3)
    a = similarity.ivf_ann_topk(emb, queries, k=5, centroids=cents)
    b = similarity.ivf_ann_topk(emb, queries, k=5, centroids=loaded_c)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    with pytest.raises(KeyError):
        similarity.load_vector_index(meta, "absent-key")
    client.close()


def test_gif_decode_local_color_table():
    """A frame carrying its own local color table overrides the global
    one — hand-assembled fixture, since our encoder only emits GCTs."""
    import struct

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawgif

    w = h = 2
    gct = np.array([[1, 1, 1], [2, 2, 2]], np.uint8)
    lct = np.array([[200, 0, 0], [0, 0, 200]], np.uint8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", w, h, 0x80 | 0, 0, 0)  # GCT, 2 entries
    gif += gct.tobytes()
    # image descriptor with LCT flag (0x80) + 2-entry local table
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | 0)
    gif += lct.tobytes()
    gif.append(2)  # min code size
    lzw = rawgif._lzw_encode(bytes([0, 1, 1, 0]), 2)
    gif.append(len(lzw))
    gif += lzw
    gif += b"\x00\x3b"
    out = rawgif.decode_gif(bytes(gif))[0][1]
    expect = lct[np.array([[0, 1], [1, 0]])]
    assert np.array_equal(out, expect)


def test_bigram_lm_scores_rarity_ordering_and_determinism(spark):
    """Planted-rarity ordering: a document made of corpus-unique bigrams
    must score lower (more surprising) under the add-k bigram LM than a
    document repeating the corpus's dominant bigram; two runs agree."""
    from rawdata_client_provider_gcs_spark.functions import text as T

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zyx qwv plk mnb vcx"))  # all-hapax bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["mean_log2_prob"]
        for r in T.bigram_lm_scores(docs).collect()
    }
    assert out[100] < out[0] < 0.0
    out2 = {
        r["doc_id"]: r["mean_log2_prob"]
        for r in T.bigram_lm_scores(docs).collect()
    }
    assert out == out2
    # integer-exact sibling agrees on which doc is the outlier
    stats = {
        r["doc_id"]: (r["n_hapax"], r["n_bigrams"])
        for r in T.bigram_stats(docs).collect()
    }
    assert stats[100][0] == stats[100][1]  # every bigram hapax
    assert stats[0][0] == 0


def test_dup_substring_stats_planted_duplicates(spark):
    """A substring shared verbatim by two documents is flagged in both;
    unique text is not; hash-mod subsampling is content-defined, so the
    duplicated span is still witnessed even though its offset differs
    between the two documents (a positional stride would miss it)."""
    from rawdata_client_provider_gcs_spark.functions import text as T

    shared = "this exact sentence appears verbatim in two documents of the corpus"
    docs = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other intro " + shared + " closing beta"),
            (3, "entirely unrelated content with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in T.dup_substring_stats(docs, k=25).collect()
    }
    assert out[1]["n_dup_grams"] > 0 and out[2]["n_dup_grams"] > 0
    assert out[3]["n_dup_grams"] == 0
    # the span has ~44 grams; mod-8 keeps ~5 of them, the SAME ones in
    # both documents because selection keys on gram content, not offset
    sampled = {
        r["doc_id"]: r
        for r in T.dup_substring_stats(docs, k=25, sample_mod=8).collect()
    }
    assert sampled[1]["n_dup_grams"] > 0 and sampled[2]["n_dup_grams"] > 0
    assert 3 not in sampled or sampled[3]["n_dup_grams"] == 0


def test_chunk_tokens_tiling_and_overlap(spark):
    """Chunk windows cover every token, starts land on the stride grid,
    and overlapping windows repeat exactly chunk-minus-stride tokens."""
    from rawdata_client_provider_gcs_spark.operators import curation

    text = " ".join(f"w{i:03d}" for i in range(150))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = curation.chunk_tokens(docs, chunk=64, stride=32).orderBy("chunk_idx")
    rows = out.collect()
    # starts 1, 33, 65, 97, 129 over 150 tokens
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in rows] == [64, 64, 64, 54, 22]
    # tiling (stride == chunk) partitions the tokens exactly
    tiled = curation.chunk_tokens(docs, chunk=64, stride=64).collect()
    assert sum(r["n_tokens"] for r in tiled) == 150
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curation.chunk_tokens(docs, chunk=0, stride=32)


def test_funnel_first_touch_and_horizon(spark):
    """Planted event sequences: step anchors on the earliest qualifying
    occurrence, later steps must follow strictly after, the horizon
    drops slow converters, and counts are monotone down the funnel."""
    from datetime import datetime, timedelta

    from rawdata_client_provider_gcs_spark.operators import funnel

    t0 = datetime(2024, 1, 1)

    def ev(uid, typ, minutes):
        return (uid, typ, t0 + timedelta(minutes=minutes))

    rows = [
        # u1 converts fully, in order, fast
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2 clicked BEFORE viewing -> click doesn't count; no purchase
        ev(2, "click", 0), ev(2, "view", 10),
        # u3 converts but the purchase is outside the 1-hour horizon
        ev(3, "view", 0), ev(3, "click", 5), ev(3, "purchase", 120),
        # u4 views only
        ev(4, "view", 0),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["step"]: r["n_users"]
        for r in funnel.funnel_counts(
            e, ["view", "click", "purchase"], within="1 HOUR"
        ).collect()
    }
    assert out == {"view": 4, "click": 2, "purchase": 1}
    # without a horizon u3's late purchase counts
    loose = {
        r["step"]: r["n_users"]
        for r in funnel.funnel_counts(e, ["view", "click", "purchase"]).collect()
    }
    assert loose == {"view": 4, "click": 2, "purchase": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel.funnel_counts(e, ["view"])


def test_quality_model_separates_planted_junk(spark):
    """The learned filter tier: trained on labeled clean-vs-junk text it
    must rank every held-out clean document above every junk document,
    and scoring a corpus twice with one model is bit-identical."""
    from rawdata_client_provider_gcs_spark.operators import quality_model

    clean = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a well formed sentence with common words and a natural rhythm",
        "data pipelines read tables and write results to the warehouse",
        "the committee approved the plan for the new public library",
        "she walked to the market and bought fresh bread and apples",
        "engineers review the design before the system goes to production",
    ]
    junk = [
        "zzz qqq xxx kkk jjj vvv www yyy qq zz xx kk jj vv",
        "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa",
        "qwerty asdfgh zxcvbn qwerty asdfgh zxcvbn poiuyt",
        "xk9 qz3 vv7 mm2 pp0 xk9 qz3 vv7 mm2 pp0 xk9",
        "lorem zork blarg frobnitz quux zork blarg frobnitz",
        "kjh sdf oiu wer mnb vcx lkj poi uyt rew qas",
    ]
    rows = [(i, t, 1.0) for i, t in enumerate(clean)]
    rows += [(100 + i, t, 0.0) for i, t in enumerate(junk)]
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label double")
    # hold one of each out of training
    train = labeled.filter(~F.col("doc_id").isin(5, 105))
    model = quality_model.train_quality_model(train)
    scores = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.score_quality(labeled, model).collect()
    }
    worst_clean = min(scores[i] for i in range(6))
    best_junk = max(scores[100 + i] for i in range(6))
    assert worst_clean > best_junk, (worst_clean, best_junk)
    # held-out docs land on the right side too
    assert scores[5] > 0.5 > scores[105]
    again = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.score_quality(labeled, model).collect()
    }
    assert scores == again  # scoring is a deterministic pure map


def test_ivf_cell_report_fallback_parity(spark, sf_smoke_dir):
    """The big-quantizer broadcast fallback must produce bit-identical
    cell reports to the inlined-literal map-side path."""
    from rawdata_client_provider_gcs_spark.operators import similarity as S
    from rawdata_client_provider_gcs_spark.tables import load_table

    e = load_table(spark, sf_smoke_dir, "embeddings")
    small = {
        r["cid"]: (r["n_vectors"], r["min_cos"], r["max_cos"])
        for r in S.ivf_cell_report(e, nlist=8).collect()
    }
    orig = S._MAPSIDE_CENTROID_CELLS
    S._MAPSIDE_CENTROID_CELLS = 1
    try:
        big = {
            r["cid"]: (r["n_vectors"], r["min_cos"], r["max_cos"])
            for r in S.ivf_cell_report(e, nlist=8).collect()
        }
    finally:
        S._MAPSIDE_CENTROID_CELLS = orig
    assert small == big


def test_asof_join_forward_direction(spark):
    """Forward as-of picks the EARLIEST right row at-or-after each left
    row; equal-time ties break to the greatest tiebreak id; lookahead
    tolerance drops far matches; backward on the same data differs."""
    from datetime import datetime, timedelta

    from rawdata_client_provider_gcs_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 10, t0)], "user_id long, lid long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 100, t0 - timedelta(minutes=5)),   # before: backward's pick
            (1, 101, t0),                          # tie at t0
            (1, 102, t0),                          # tie at t0 (greater id wins)
            (1, 103, t0 + timedelta(minutes=30)),
            (1, 104, t0 + timedelta(days=3)),      # outside 1-day tolerance
        ],
        "user_id long, rid long, rt timestamp",
    )
    fwd = asof_join(
        left, right, on="user_id", left_time="lt", right_time="rt",
        right_cols=["rid"], tiebreak_cols=["rt", "rid"],
        direction="forward",
    ).collect()
    assert fwd[0]["rid"] == 102  # inclusive, greatest id among the tie
    back = asof_join(
        left, right, on="user_id", left_time="lt", right_time="rt",
        right_cols=["rid"], tiebreak_cols=["rt", "rid"],
    ).collect()
    assert back[0]["rid"] == 102  # backward-inclusive shares the t0 tie
    # strictly-later left: forward finds 103, backward finds the tie pair
    left2 = spark.createDataFrame(
        [(1, 11, t0 + timedelta(minutes=1))],
        "user_id long, lid long, lt timestamp",
    )
    fwd2 = asof_join(
        left2, right, on="user_id", left_time="lt", right_time="rt",
        right_cols=["rid"], tiebreak_cols=["rt", "rid"],
        direction="forward",
    ).collect()
    assert fwd2[0]["rid"] == 103
    # tolerance: nothing within 1 hour after t0+2h
    left3 = spark.createDataFrame(
        [(1, 12, t0 + timedelta(hours=2))],
        "user_id long, lid long, lt timestamp",
    )
    import pyspark.sql.functions as SF

    fwd3 = asof_join(
        left3, right, on="user_id", left_time="lt", right_time="rt",
        right_cols=["rid"], tiebreak_cols=["rt", "rid"],
        direction="forward", tolerance=SF.expr("INTERVAL 1 HOUR"),
    ).collect()
    assert fwd3[0]["rid"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on="user_id", left_time="lt",
                  right_time="rt", direction="nearest")


def test_png_adam7_and_16bit_decode():
    """Adam7-interlaced and 16-bit PNGs decode value-exactly.

    The fixtures are encoded HERE by the inverse transform (gather each
    Adam7 pass / widen samples to big-endian 16-bit), independent of
    the decoder's scatter path, so agreement pins both directions.
    Filter types are mixed per scanline to exercise unfiltering inside
    interlace passes too."""
    import struct
    import zlib

    import numpy as np

    from rawdata_client_provider_gcs_spark.operators import rawimage

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    def build(w, h, depth, color, interlace, raster):
        body = chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace),
        )
        body += chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
        return b"\x89PNG\r\n\x1a\n" + body

    def filt(rows, fch, ftypes):
        """Apply PNG filters 0/1/2 per scanline (encoder side)."""
        out = bytearray()
        prev = np.zeros(rows.shape[1], np.int32)
        for y, ft in zip(range(rows.shape[0]), ftypes):
            cur = rows[y].astype(np.int32)
            if ft == 0:
                enc = cur
            elif ft == 1:  # Sub: diff vs left pixel (fch bytes back)
                px = cur.reshape(-1, fch)
                enc = np.concatenate(
                    [px[:1], (px[1:] - px[:-1]) & 0xFF]
                ).reshape(-1)
            else:  # Up
                enc = (cur - prev) & 0xFF
            out.append(ft)
            out += bytes(enc.astype(np.uint8))
            prev = cur
        return bytes(out)

    rng = np.random.default_rng(3)
    # 9x10 exercises every Adam7 pass including ragged edges
    img = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    h, w = img.shape[:2]

    # -- Adam7, 8-bit RGB ---------------------------------------------
    raster = b""
    for pi, (x0, y0, dx, dy) in enumerate(rawimage._ADAM7):
        sub = img[y0::dy, x0::dx, :]
        if sub.size == 0:
            continue
        rows = sub.reshape(sub.shape[0], -1)
        raster += filt(rows, 3, [(pi + y) % 3 for y in range(rows.shape[0])])
    adam = build(w, h, 8, 2, 1, raster)
    assert np.array_equal(rawimage.decode_image(adam), img)

    # -- sequential 16-bit RGB: high byte must come back --------------
    img16 = img.astype(np.uint16) << 8 | rng.integers(
        0, 256, img.shape, dtype=np.uint16
    )
    flat = img16.astype(">u2").tobytes()
    rows16 = np.frombuffer(flat, np.uint8).reshape(h, w * 6)
    raster16 = filt(rows16, 6, [y % 3 for y in range(h)])
    png16 = build(w, h, 16, 2, 0, raster16)
    assert np.array_equal(rawimage.decode_image(png16), img)  # high bytes

    # -- Adam7 AND 16-bit together, grayscale -------------------------
    g16 = rng.integers(0, 65536, size=(7, 5), dtype=np.uint16)
    raster = b""
    for x0, y0, dx, dy in rawimage._ADAM7:
        sub = g16[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        rows = np.frombuffer(sub.astype(">u2").tobytes(), np.uint8).reshape(
            sub.shape[0], sub.shape[1] * 2
        )
        raster += filt(rows, 2, [0] * rows.shape[0])
    both = build(5, 7, 16, 0, 1, raster)
    hi = (g16 >> 8).astype(np.uint8)
    assert np.array_equal(
        rawimage.decode_image(both), np.repeat(hi[:, :, None], 3, axis=2)
    )

    # sub-8-bit still refuses loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth=4"):
        rawimage.decode_image(build(2, 2, 4, 0, 0, b"\x00\x55\x00\x55"))


def test_png_adam7_pillow_parity():
    """Where pillow exists: its Adam7 + 16-bit encodes decode to the
    same pixels through our decoder."""
    import io

    import numpy as np

    Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    from rawdata_client_provider_gcs_spark.operators import rawimage

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(11, 6, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG", interlace=True)
    assert np.array_equal(rawimage.decode_image(buf.getvalue()), img)

    g16 = rng.integers(0, 65536, size=(8, 9), dtype=np.uint16)
    buf = io.BytesIO()
    Image.fromarray(g16, mode="I;16").save(buf, format="PNG")
    decoded = rawimage.decode_image(buf.getvalue())
    hi = (g16 >> 8).astype(np.uint8)
    assert np.array_equal(decoded, np.repeat(hi[:, :, None], 3, axis=2))
