#!/usr/bin/env python
"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR.

Runs every ``bench=True`` query from the catalog on
``local[$SPARK_GRAFT_CPUS]`` against ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) and prints ONE JSON line:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (computes every output
column and row; no driver collect bottleneck, no result truncation).  A
warm-up query runs first so JVM/codegen startup is not billed to the first
benchmark entry.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rawdata_client_provider_gcs_spark.plans import catalog
from rawdata_client_provider_gcs_spark.session import get_spark
from rawdata_client_provider_gcs_spark.streaming import windows as _stream_windows


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="rawdata-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = catalog.bench_queries()

    # Warm up: JVM, codegen, parquet footer reads, noop-sink classloading —
    # not billed to any query.
    warm = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    warm.limit(1000).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    # micro-batch counts per streaming bench query (r16 verdict ask #2:
    # the stateful streaming queries are micro-batch-overhead dominated,
    # so the count must be in the artifact for load-vs-regression calls)
    stream_batches: dict[str, dict[str, int]] = {}
    for name, qdef in bench.items():
        _stream_windows.LAST_RUN_BATCHES.clear()
        # one un-timed run amortizes whole-stage-codegen compilation (a
        # per-plan constant that vanishes at real scale), then the best of
        # two timed steady-state runs (JVM/OS jitter on this box is ±30%).
        qdef.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            qdef.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if i == 0:
                first_runs[name] = round(dt, 4)
            best = min(best, dt)
        timings[name] = round(best, 4)
        if _stream_windows.LAST_RUN_BATCHES:
            stream_batches[name] = dict(_stream_windows.LAST_RUN_BATCHES)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # single-run (first timed lap) numbers kept as a side
                # field for cross-round continuity with pre-r14 artifacts
                "queries_first_run": first_runs,
                "first_run_total_sec": round(sum(first_runs.values()), 4),
                # deterministic micro-batch counts per streaming query
                # (pinned file layouts + maxFilesPerTrigger); a driver
                # swing on these queries with unchanged counts is load,
                # not regression
                "stream_batches": stream_batches,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
