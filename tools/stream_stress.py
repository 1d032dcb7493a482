#!/usr/bin/env python
"""Streaming-tier scale stress: state volume (keys), not batch count.

The batch tier's 100 TB story is backed by measured 10× ratios
(``tools/scale_stress.py`` → SCALE.md); this closes the same gap for the
stateful streaming tier, which VERDICT r4 called "argued, not measured".

State in Structured Streaming scales with DISTINCT KEYS (sessions per
user, live windows, LSH buckets), not with input rows per key — so the
stress dimension here is key count: each operator runs at 1× and 10×
keys and the harness records, per run, the wall time and the state-store
facts Spark itself reports in ``StreamingQuery.recentProgress``
(``stateOperators``: peak ``numRowsTotal``, peak ``memoryUsedBytes``,
summed ``commitTimeMs``/``allUpdatesTimeMs``).  A healthy operator shows
~10× state rows / memory at ~sub-10× wall growth (per-trigger overhead
amortizes); superlinear wall or memory is a scaling bug.

The 10× runs repeat at two state-store partition counts (8 and 32) to
measure how per-partition state and commit cost shift with store count —
the knob a production deployment turns as key cardinality grows (state
store instances = ``spark.sql.shuffle.partitions`` at query start).

Usage::

    python tools/stream_stress.py                # full matrix, JSON line
    python tools/stream_stress.py --ops stream_session stream_sink
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from rawdata_client_provider_gcs_spark.session import get_spark
from rawdata_client_provider_gcs_spark.streaming import dedup as sdedup
from rawdata_client_provider_gcs_spark.streaming import windows as W
from rawdata_client_provider_gcs_spark.streaming.sink import stream_to_topic
from rawdata_client_provider_gcs_spark.sources.topic import Topic
from rawdata_client_provider_gcs_spark import ulid as ulid_mod

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14, microseconds

_EVENT_TYPES = ["view", "click", "buy", "scroll", "hover", "exit", "load", "auth"]


def make_event_files(out_dir: str, n_keys: int, n_rows: int, span_hours: int) -> None:
    """One data file + two sentinel files (mtime-ordered micro-batches).

    The sentinels sit a year past the data so append-mode watermarks
    close and EXPIRE every real window before the bounded drain ends —
    state peaks mid-run at its true size, then drains, exactly like a
    production tail.
    """
    os.makedirs(out_dir, exist_ok=True)
    span_us = span_hours * 3600 * 10**6
    ids = list(range(n_rows))
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [BASE_TS_US + (i * span_us) // n_rows for i in ids], pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([i % n_keys for i in ids], pa.int64()),
            "event_type": pa.array(
                [_EVENT_TYPES[i % len(_EVENT_TYPES)] for i in ids]
            ),
            "value": pa.array([float(i % 97) for i in ids], pa.float64()),
            "props": pa.array([None] * n_rows, pa.string()),
        }
    )
    data_path = os.path.join(out_dir, "0-events.parquet")
    pq.write_table(table, data_path)
    now = os.stat(data_path).st_mtime
    year_us = 365 * 24 * 3600 * 10**6
    for i in (1, 2):
        path = os.path.join(out_dir, f"{i}-sentinel.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([10**15 + i], pa.int64()),
                    "ts": pa.array(
                        [BASE_TS_US + span_us + i * year_us], pa.int64()
                    ).cast(pa.timestamp("us")),
                    "user_id": pa.array([W.SENTINEL_USER_ID], pa.int64()),
                    "event_type": pa.array([W.SENTINEL_EVENT_TYPE]),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array([None], pa.string()),
                }
            ),
            path,
        )
        os.utime(path, (now + 10 * i, now + 10 * i))


def event_stream(spark, src_dir: str):
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def make_doc_files(out_dir: str, n_docs: int, n_files: int = 4) -> None:
    """Documents with ~20% near-duplicates, split into n_files batches."""
    os.makedirs(out_dir, exist_ok=True)
    per = n_docs // n_files
    now = None
    for fi in range(n_files):
        ids, texts = [], []
        for j in range(per):
            did = fi * per + j
            base_id = did - (did % 5) if did % 5 == 4 else did  # every 5th ~dups an earlier one
            words = [f"tok{(base_id * 31 + w) % 9973}" for w in range(30)]
            if did != base_id:
                words[-1] = f"drift{did}"
            ids.append(did)
            texts.append(" ".join(words))
        path = os.path.join(out_dir, f"{fi}-docs.parquet")
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
            ),
            path,
        )
        if now is None:
            now = os.stat(path).st_mtime
        os.utime(path, (now + fi, now + fi))


def doc_stream(spark, src_dir: str):
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )


def make_seq_files(
    out_dir: str, n_groups: int, n_rows: int, n_files: int = 4
) -> None:
    """(group_id, seq) rows: contiguous per-group sequences with a hole
    every 101, sharded by ``seq % n_files`` so every group's sequences
    arrive out of order across micro-batches (the adversarial case for
    the interval-merge gap state)."""
    os.makedirs(out_dir, exist_ok=True)
    per_group = max(1, n_rows // n_groups)
    now = None
    import numpy as np

    groups = np.repeat(np.arange(n_groups, dtype=np.int64), per_group)
    seqs = np.tile(np.arange(1, per_group + 1, dtype=np.int64), n_groups)
    keep = seqs % 101 != 7
    groups, seqs = groups[keep], seqs[keep]
    for fi in range(n_files):
        m = seqs % n_files == fi
        table = pa.table(
            {
                "group_id": pa.array(groups[m], pa.int64()),
                "seq": pa.array(seqs[m], pa.int64()),
            }
        )
        path = os.path.join(out_dir, f"{fi}-seqs.parquet")
        pq.write_table(table, path)
        if now is None:
            now = os.stat(path).st_mtime
        os.utime(path, (now + fi, now + fi))


def seq_stream(spark, src_dir: str):
    return (
        spark.readStream.schema("group_id long, seq long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )


def make_message_files(out_dir: str, n_rows: int, n_files: int = 4) -> None:
    os.makedirs(out_dir, exist_ok=True)
    per = n_rows // n_files
    now = None
    for fi in range(n_files):
        rows = []
        for j in range(per):
            seq = fi * per + j
            ts = 1_700_000_000_000 + seq
            rows.append((ulid_mod.encode(ts, seq), ts, "g", seq, f"p-{seq}", {"k": b"v"}))
        table = pa.table(
            {
                "ulid": pa.array([r[0] for r in rows], pa.binary()),
                "ulid_ts_ms": pa.array([r[1] for r in rows], pa.int64()),
                "ordering_group": pa.array([r[2] for r in rows]),
                "sequence_number": pa.array([r[3] for r in rows], pa.int64()),
                "position": pa.array([r[4] for r in rows]),
                "data": pa.array(
                    [r[5] for r in rows], pa.map_(pa.string(), pa.binary())
                ),
            }
        )
        path = os.path.join(out_dir, f"{fi}-msgs.parquet")
        pq.write_table(table, path)
        if now is None:
            now = os.stat(path).st_mtime
        os.utime(path, (now + fi, now + fi))


def run_capture(stream_df, mode: str, state_partitions: int) -> dict:
    """Bounded drain with recentProgress capture (state-store metrics)."""
    spark = stream_df.sparkSession
    name = f"stress_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix="rawdata-stress-ckpt-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    t0 = time.perf_counter()
    try:
        q = (
            stream_df.writeStream.format("noop")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        progress = q.recentProgress
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(checkpoint, ignore_errors=True)
    out = {
        "wall_s": round(wall, 2),
        "triggers": len(progress),
        "state_rows_peak": 0,
        "state_mem_peak_mb": 0.0,
        "commit_ms_sum": 0,
        "updates_ms_sum": 0,
        "rows_in": 0,
    }
    for p in progress:
        if not isinstance(p, dict):
            p = json.loads(p.json) if hasattr(p, "json") else {}
        out["rows_in"] += int(p.get("numInputRows") or 0)
        for so in p.get("stateOperators") or []:
            out["state_rows_peak"] = max(
                out["state_rows_peak"], int(so.get("numRowsTotal") or 0)
            )
            out["state_mem_peak_mb"] = max(
                out["state_mem_peak_mb"],
                round((so.get("memoryUsedBytes") or 0) / 1e6, 2),
            )
            out["commit_ms_sum"] += int(so.get("commitTimeMs") or 0)
            out["updates_ms_sum"] += int(so.get("allUpdatesTimeMs") or 0)
    return out


def run_sink(spark, src_dir: str, state_partitions: int) -> dict:
    """stream_to_topic wall time + file/row accounting (no state store —
    the sink's cost is the per-batch commit protocol)."""
    schema = (
        "ulid binary, ulid_ts_ms long, ordering_group string, "
        "sequence_number long, position string, data map<string,binary>"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    root = tempfile.mkdtemp(prefix="rawdata-stress-topic-")
    topic = Topic(spark, f"file://{root}", f"t-{uuid.uuid4().hex[:6]}")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    t0 = time.perf_counter()
    try:
        q = stream_to_topic(
            stream,
            topic,
            checkpoint_dir=tempfile.mkdtemp(prefix="rawdata-stress-ckpt-"),
            available_now=True,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    n_files = len(topic.list_manifest())
    n_rows = topic.dataframe().count()
    shutil.rmtree(root, ignore_errors=True)
    return {"wall_s": round(wall, 2), "files": n_files, "rows": n_rows}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ops",
        nargs="*",
        default=[
            "stream_window_counts",
            "stream_session",
            "stream_stateful_user",
            "stream_near_dup",
            "stream_seq_gaps",
            "stream_join",
            "stream_sink",
        ],
    )
    ap.add_argument("--keys-1x", type=int, default=20_000)
    ap.add_argument("--rows-1x", type=int, default=200_000)
    ap.add_argument("--docs-1x", type=int, default=5_000)
    ap.add_argument("--msgs-1x", type=int, default=100_000)
    ap.add_argument(
        "--provider",
        choices=["hdfs", "rocksdb"],
        default="hdfs",
        help="state store backend (RocksDB = the large-state production choice)",
    )
    ap.add_argument(
        "--engine",
        choices=["groupstate", "tws"],
        default="groupstate",
        help="stateful engine for stream_seq_gaps (tws = "
        "transformWithStateInPandas; needs google.protobuf and the "
        "RocksDB provider — unavailable in this sandbox, runnable where "
        "the runtime exists)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-spark-stream-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if args.provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    scales = {"1x": 1, "10x": 10}
    staged: dict[tuple[str, str], str] = {}

    def events_dir(scale: str) -> str:
        key = ("events", scale)
        if key not in staged:
            d = tempfile.mkdtemp(prefix=f"rawdata-stress-ev-{scale}-")
            m = scales[scale]
            make_event_files(
                d, args.keys_1x * m, args.rows_1x * m, span_hours=24 * m
            )
            staged[key] = d
        return staged[key]

    def docs_dir(scale: str) -> str:
        key = ("docs", scale)
        if key not in staged:
            d = tempfile.mkdtemp(prefix=f"rawdata-stress-doc-{scale}-")
            make_doc_files(d, args.docs_1x * scales[scale])
            staged[key] = d
        return staged[key]

    def msgs_dir(scale: str) -> str:
        key = ("msgs", scale)
        if key not in staged:
            d = tempfile.mkdtemp(prefix=f"rawdata-stress-msg-{scale}-")
            make_message_files(d, args.msgs_1x * scales[scale])
            staged[key] = d
        return staged[key]

    def run_op(op: str, scale: str, parts: int) -> dict:
        if op == "stream_window_counts":
            return run_capture(
                W.tumbling_counts(event_stream(spark, events_dir(scale))),
                "append",
                parts,
            )
        if op == "stream_session":
            return run_capture(
                W.session_counts(event_stream(spark, events_dir(scale))),
                "append",
                parts,
            )
        if op == "stream_stateful_user":
            return run_capture(
                W.stateful_user_counts(event_stream(spark, events_dir(scale))),
                "update",
                parts,
            )
        if op == "stream_near_dup":
            banded = sdedup.banded_buckets(
                doc_stream(spark, docs_dir(scale)), "doc_id", "text"
            )
            return run_capture(
                sdedup.first_seen_flags(banded, "doc_id"), "update", parts
            )
        if op == "stream_seq_gaps":
            from rawdata_client_provider_gcs_spark.streaming import gaps as G

            key = ("seqs", scale)
            if key not in staged:
                d = tempfile.mkdtemp(prefix=f"rawdata-stress-seq-{scale}-")
                m = scales[scale]
                make_seq_files(d, args.keys_1x * m, args.rows_1x * m)
                staged[key] = d
            if args.engine == "tws":
                if not G.tws_available():
                    raise SystemExit(
                        "--engine tws: google.protobuf runtime not present"
                    )
                gap_fn = G.sequence_gap_stats
            else:
                gap_fn = G.sequence_gap_stats_groupstate
            return run_capture(
                gap_fn(seq_stream(spark, staged[key])),
                "update",
                parts,
            )
        if op == "stream_join":
            # watermarked interval left-outer join: state = both sides'
            # retained rows inside the 1-hour range bound; sentinels kept
            # above the watermark (stream_join_sides semantics) so outer
            # rows drain and state peaks then empties
            def side(typ, pre):
                return W.watermarked_join_side(
                    event_stream(spark, events_dir(scale)),
                    typ,
                    (f"{pre}_user", f"{pre}_id", f"{pre}_ts"),
                )

            joined = side("buy", "l").join(
                side("click", "r"),
                (F.col("l_user") == F.col("r_user"))
                & (F.col("r_ts") <= F.col("l_ts"))
                & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR")),
                "left_outer",
            )
            return run_capture(joined, "append", parts)
        if op == "stream_sink":
            return run_sink(spark, msgs_dir(scale), parts)
        raise ValueError(op)

    # one throwaway micro-drain so the first measured run doesn't carry
    # JVM/codegen/state-store-provider warm-up
    warm = tempfile.mkdtemp(prefix="rawdata-stress-warm-")
    make_event_files(warm, 10, 100, span_hours=1)
    run_capture(W.session_counts(event_stream(spark, warm)), "append", 2)
    shutil.rmtree(warm, ignore_errors=True)

    # matrix: 1x@8 parts (toy baseline), 10x@8 (state grows, stores fixed),
    # 10x@32 (stores scaled with the state — the production response)
    matrix = [("1x", 8), ("10x", 8), ("10x", 32)]
    results: dict[str, dict] = {}
    for op in args.ops:
        results[op] = {}
        for scale, parts in matrix:
            label = f"{scale}@{parts}p"
            r = run_op(op, scale, parts)
            results[op][label] = r
            print(f"{op} {label}: {json.dumps(r)}", file=sys.stderr)

    print(json.dumps({"keys_1x": args.keys_1x, "rows_1x": args.rows_1x, "results": results}))
    for d in staged.values():
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
