"""Streaming near-duplicate filter (incremental MinHash-LSH dedup).

Covers the three load-bearing claims of
``rawdata_client_provider_gcs_spark.streaming.dedup``:

1. the map-side band-bucket computation is bit-identical to the batch
   MinHash tier (same buckets whether a doc arrives by batch or stream);
2. the admitted set is an independent set of the LSH collision graph —
   no two admitted documents are near-dup candidates of each other;
3. state carries across micro-batches: an exact duplicate arriving in a
   later batch is dropped by bucket state, not within-batch ordering.
"""

import pyspark.sql.functions as F
import pytest

from rawdata_client_provider_gcs_spark.operators import dedup as batch_dedup
from rawdata_client_provider_gcs_spark.streaming import dedup as stream_dedup
from rawdata_client_provider_gcs_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "documents")


def test_bucket_parity_with_batch_tier(spark, docs):
    """Map-side streaming buckets == batch minhash_signatures buckets."""
    sig = batch_dedup.minhash_signatures(docs, "doc_id", "text", 3, 64)
    rows_per_band = 64 // 16
    band_cols = []
    for b in range(16):
        cols = [
            F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    batch_banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("k")
    ).select("doc_id", F.col("k.band").alias("band"), F.col("k.sig").alias("sig"))
    mine = stream_dedup.banded_buckets(docs)
    assert batch_banded.exceptAll(mine).count() == 0
    assert mine.exceptAll(batch_banded).count() == 0


def test_admitted_set_is_lsh_independent(spark, sf_smoke_dir, docs):
    """No two admitted docs share any LSH band bucket."""
    kept = stream_dedup.near_dup_admitted(
        spark, stream_dedup.stream_documents(spark, sf_smoke_dir)
    )
    kept_ids = {r[0] for r in kept.collect()}
    n_docs = docs.count()
    assert 0 < len(kept_ids) <= n_docs
    candidates = batch_dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=64, bands=16,
        verify_threshold=None,
    ).collect()
    both_kept = [
        (r["id_a"], r["id_b"])
        for r in candidates
        if r["id_a"] in kept_ids and r["id_b"] in kept_ids
    ]
    assert both_kept == []
    # and every dropped doc has SOME candidate edge (to an earlier doc)
    dropped = {r[0] for r in docs.select("doc_id").collect()} - kept_ids
    with_edge = {r["id_a"] for r in candidates} | {r["id_b"] for r in candidates}
    assert dropped <= with_edge


def test_cross_batch_duplicates_dropped(spark, sf_smoke_dir):
    """Second micro-batch of identical texts is fully dropped by state."""
    kept = stream_dedup.near_dup_admitted(
        spark, stream_dedup.stream_documents_doubled(spark, sf_smoke_dir)
    )
    kept_ids = [r[0] for r in kept.collect()]
    assert kept_ids, "nothing admitted"
    assert all(d < 10**10 for d in kept_ids), "a second-copy duplicate slipped through"
    # identical to the single-stream admitted set
    single = stream_dedup.near_dup_admitted(
        spark, stream_dedup.stream_documents(spark, sf_smoke_dir)
    )
    assert sorted(kept_ids) == sorted(r[0] for r in single.collect())

def test_state_ttl_recency_window(spark, tmp_path):
    """With ttl_hours, a bucket whose marker is older than the window
    reads as absent — the late duplicate is admitted again; without a
    TTL the same duplicate is dropped by cross-batch state."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    text_x = "alpha beta gamma delta epsilon zeta eta theta iota"
    src = tmp_path / "docs"
    src.mkdir()

    def stage(fname, doc_id, mtime_off):
        path = str(src / fname)
        pq.write_table(
            pa.table({"doc_id": pa.array([doc_id], pa.int64()),
                      "text": pa.array([text_x])}),
            path,
        )
        base = os.stat(path).st_mtime
        os.utime(path, (base + mtime_off, base + mtime_off))

    def drain(ttl_hours, name, ck):
        from pyspark.sql.types import LongType, StringType, StructField, StructType
        from rawdata_client_provider_gcs_spark.streaming.windows import (
            BOUNDED_STATE_PARTITIONS,
        )

        schema = StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        flags = stream_dedup.first_seen_flags(
            stream_dedup.banded_buckets(stream, "doc_id", "text"),
            "doc_id",
            ttl_hours=ttl_hours,
        )
        # memory sink refuses checkpoint recovery; foreachBatch supports
        # it, which this test needs to resume the same stateful query
        rows = []

        def collect_batch(bdf, _bid):
            rows.extend(bdf.collect())

        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(BOUNDED_STATE_PARTITIONS))
        try:
            q = (
                flags.writeStream.foreachBatch(collect_batch)
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / ck))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return rows

    ttl = 1.0 / 3600  # one second
    stage("0-a.parquet", 1, 0)
    drain(ttl, "ttl_run1", "ck_ttl")
    time.sleep(2.5)  # recency window lapses
    stage("1-b.parquet", 3, 1)
    out = drain(ttl, "ttl_run2", "ck_ttl")
    dup3 = max(r["had_prior"] for r in out if r["doc_id"] == 3)
    assert dup3 == 0, "stale marker still dropped the late duplicate"

    # control: same two batches, no TTL, fresh checkpoint -> dropped
    for f in src.iterdir():
        f.touch()
    out2 = drain(None, "ttl_ctrl", "ck_ctrl")
    dup3b = max(r["had_prior"] for r in out2 if r["doc_id"] == 3)
    assert dup3b == 1, "cross-batch duplicate not dropped without TTL"
