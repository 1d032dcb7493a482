"""Seen-before Bloom filter: no false negatives, bounded FPR, merge,
KV persistence, and determinism."""

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import seenfilter as SF


def _docs(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        F.col("id").alias("doc_id"),
    )


def test_no_false_negatives_and_bounded_fpr(spark):
    prior = _docs(spark, 0, 2000)
    blob = SF.build_seen_filter(prior, "text", expected_items=2000, fpp=0.01)

    marked_prior = SF.mark_seen(prior, "text", blob).collect()
    assert all(r["seen_before"] for r in marked_prior)  # NEVER misses

    fresh = _docs(spark, 100_000, 104_000)
    fp = SF.mark_seen(fresh, "text", blob).filter("seen_before").count()
    assert fp / 4000 <= 0.03  # ~3x headroom over the 1% design point

    unseen = SF.filter_unseen(fresh, "text", blob)
    assert unseen.count() == 4000 - fp
    assert "seen_before" not in unseen.columns
    # deterministic: same corpus -> byte-identical filter
    assert blob == SF.build_seen_filter(
        prior, "text", expected_items=2000, fpp=0.01
    )


def test_merge_across_increments(spark):
    a = _docs(spark, 0, 500)
    b = _docs(spark, 500, 1000)
    fa = SF.build_seen_filter(a, "text", expected_items=1000, fpp=0.01)
    fb = SF.build_seen_filter(b, "text", expected_items=1000, fpp=0.01)
    merged = SF.merge_seen_filters(fa, fb)
    both = _docs(spark, 0, 1000)
    assert SF.mark_seen(both, "text", merged).filter("seen_before").count() == 1000
    # merged equals building over the union (pure OR of deterministic bits)
    assert merged == SF.build_seen_filter(
        both, "text", expected_items=1000, fpp=0.01
    )
    with pytest.raises(ValueError, match="different params"):
        SF.merge_seen_filters(
            fa, SF.build_seen_filter(b, "text", expected_items=50, fpp=0.01)
        )


def test_kv_persistence_roundtrip(spark, tmp_path):
    from rawdata_client_provider_gcs_spark import RawdataClient

    client = RawdataClient(spark, str(tmp_path))
    md = client.metadata("corpus-v1")
    blob = SF.build_seen_filter(
        _docs(spark, 0, 100), "text", expected_items=100
    )
    SF.save_seen_filter(md, "engine-seen-filter.v1", blob)
    back = SF.load_seen_filter(md, "engine-seen-filter.v1")
    assert back == blob
    with pytest.raises(KeyError):
        SF.load_seen_filter(md, "engine-seen-filter.v2")
    client.close()


def test_params_and_blob_validation():
    m, k = SF.bloom_params(10_000, 0.01)
    assert m % 64 == 0 and 6 <= k <= 8  # textbook ~9.6 bits/item, k~7
    with pytest.raises(ValueError):
        SF.bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        SF._parse(b"garbage")
