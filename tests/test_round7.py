"""Round-7 hardening: thread-scoped maintenance-lock reentrancy,
outer-join key preservation in stream_static_enrich, and the enrich
alias-collision guard."""

import threading

import pytest

from rawdata_client_provider_gcs_spark.datamodel import MESSAGE_SCHEMA
from rawdata_client_provider_gcs_spark.sources.topic import (
    ConcurrentMaintenanceError,
    Topic,
)
from rawdata_client_provider_gcs_spark.streaming.windows import (
    stream_static_enrich,
)


def _fill_topic(spark, tmp_path, name, n=10, per_file=10):
    topic = Topic(spark, f"file://{tmp_path}", name)
    rows = []
    for i in range(n):
        ts = 1_700_000_000_000 + i * 10
        ulid = ts.to_bytes(6, "big") + i.to_bytes(10, "big")
        rows.append((ulid, ts, "g", i, f"p-{i}", {"k": b"v"}))
    topic.write_dataframe(
        spark.createDataFrame(rows, MESSAGE_SCHEMA),
        max_records_per_file=per_file,
    )
    return topic


# -- maintenance lock: reentrancy is per-thread, not per-handle ------------


def test_maintenance_lock_excludes_second_thread_on_same_handle(
    spark, tmp_path
):
    """Two threads sharing ONE Topic handle must mutually exclude: the
    reentrancy fast-path only applies to the thread that took the lock,
    so a concurrent sweep from another thread fails fast instead of
    silently riding the first thread's lock."""
    topic = _fill_topic(spark, tmp_path, "tlock")
    entered = threading.Event()
    release = threading.Event()
    results = {}

    def holder():
        with topic._maintenance_lock("sweep"):
            entered.set()
            release.wait(timeout=30)

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert entered.wait(timeout=30)
        # same handle, different thread: no silent re-entry
        with pytest.raises(ConcurrentMaintenanceError):
            with topic._maintenance_lock("other-thread"):
                results["entered"] = True
        assert "entered" not in results
        # the owning thread's lock is still intact
        assert topic.fs.exists(topic._maintenance_lock_uri())
    finally:
        release.set()
        t.join(timeout=30)
    # released after the owner exits; a fresh acquisition works
    assert not topic.fs.exists(topic._maintenance_lock_uri())
    with topic._maintenance_lock("again"):
        with topic._maintenance_lock("nested-same-thread"):
            pass  # same-thread reentrancy still works
    assert not topic.fs.exists(topic._maintenance_lock_uri())


# -- stream_static_enrich: outer joins keep the dim key --------------------


def test_stream_static_enrich_right_outer_keeps_dim_key(spark):
    events = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id int, action string"
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (9, "bronze")], "user_id int, tier string"
    )
    out = stream_static_enrich(
        events, dim, on=("user_id", "user_id"), how="right"
    )
    assert out.columns.count("user_id") == 1
    got = {
        (r["user_id"], r["action"], r["tier"]) for r in out.collect()
    }
    # the unmatched dim row (9, bronze) keeps its own key value instead
    # of surfacing as (NULL, NULL, bronze)
    assert got == {(1, "a", "gold"), (9, None, "bronze")}


def test_stream_static_enrich_full_outer_keeps_both_keys(spark):
    events = spark.createDataFrame(
        [(1, "a"), (2, "b")], "uid int, action string"
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (9, "bronze")], "id int, tier string"
    )
    out = stream_static_enrich(events, dim, on=("uid", "id"), how="full")
    got = {(r["uid"], r["action"], r["tier"]) for r in out.collect()}
    assert got == {
        (1, "a", "gold"),
        (2, "b", None),
        (9, None, "bronze"),  # dim-only row identifiable by its key
    }


def test_stream_static_enrich_alias_collision_raises(spark):
    events = spark.createDataFrame(
        [(1, "x", "a")], "uid int, __enrich_id string, action string"
    )
    dim = spark.createDataFrame([(1, "gold")], "id int, tier string")
    with pytest.raises(ValueError, match="__enrich_id"):
        stream_static_enrich(events, dim, on=("uid", "id"))


def test_stream_static_enrich_semi_anti_still_work(spark):
    """Review regression: semi/anti joins emit only the events side, so
    the outer-join key fold must not reference the dropped dim key."""
    events = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "uid int, action string"
    )
    dim = spark.createDataFrame([(1, "gold"), (2, "s")], "id int, tier string")
    semi = stream_static_enrich(events, dim, on=("uid", "id"), how="left_semi")
    assert sorted(r["uid"] for r in semi.collect()) == [1, 2]
    assert semi.columns == ["uid", "action"]
    anti = stream_static_enrich(events, dim, on=("uid", "id"), how="left_anti")
    assert [r["uid"] for r in anti.collect()] == [3]
