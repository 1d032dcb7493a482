"""Freshness-stamp invalidation of the driver-side metadata caches
(``tables._SCHEMA_CACHE`` / ``_nanos_timestamp_columns`` /
``_SCAN_DECISIONS``): a table REWRITTEN at the same path must be re-read
through fresh inference, never through a stale cached schema (r17
verdict watch-list #1)."""

import pyarrow as pa
import pyarrow.parquet as pq

from rawdata_client_provider_gcs_spark import tables


def test_load_table_sees_inprocess_rewrite(spark, tmp_path):
    """Rewrite a table at the same path with DIFFERENT column types and
    names; a stale cached schema would surface the old columns (or
    all-null casts).  The stamp key must force re-inference."""
    path = tmp_path / "widgets.parquet"
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([1.5, 2.5, 3.5], pa.float64())}),
        path,
    )
    df1 = tables.load_table(spark, str(tmp_path), "widgets")
    assert [f.name for f in df1.schema.fields] == ["id", "v"]
    assert df1.count() == 3

    # rewrite in place: new column set AND new types (id becomes string)
    pq.write_table(
        pa.table({"id": pa.array(["a", "b"], pa.string()),
                  "label": pa.array([10, 20], pa.int32())}),
        path,
    )
    df2 = tables.load_table(spark, str(tmp_path), "widgets")
    assert [f.name for f in df2.schema.fields] == ["id", "label"]
    rows = sorted((r["id"], r["label"]) for r in df2.collect())
    assert rows == [("a", 10), ("b", 20)]


def test_load_table_sees_timestamp_unit_change(spark, tmp_path):
    """The nanos-timestamp column detection is also stamp-keyed: a
    rewrite that changes ts from micros to nanos must pick up the
    ns->us conversion (and vice versa)."""
    path = tmp_path / "stamps.parquet"
    us = pa.array([1_700_000_000_000_000], pa.timestamp("us"))
    pq.write_table(pa.table({"ts": us}), path)
    df_us = tables.load_table(spark, str(tmp_path), "stamps")
    v_us = df_us.collect()[0]["ts"]

    ns = pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ns}), path)
    df_ns = tables.load_table(spark, str(tmp_path), "stamps")
    v_ns = df_ns.collect()[0]["ts"]
    # same instant either way; a stale unit map would be off by 1000x
    assert v_us == v_ns


def test_rewrite_bumps_scan_decision_epoch(spark, tmp_path):
    """A rewrite observed by load_table must bump the stamp epoch so
    every memoized scan_parallel decision is invalidated (a rewrite can
    change the split count without changing the plan string)."""
    path = tmp_path / "epoch.parquet"
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), path)
    tables.load_table(spark, str(tmp_path), "epoch")
    before = tables._STAMP_EPOCH
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), path)
    tables.load_table(spark, str(tmp_path), "epoch")
    assert tables._STAMP_EPOCH > before
