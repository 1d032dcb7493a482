#!/usr/bin/env python
"""Re-time the biggest round-over-round bench deltas on an idle box.

The driver bench runs at the end of a long session on a shared box, so
its per-query numbers carry load noise that reads as regression.  This
helper compares two driver ``BENCH_r*.json`` files (or raw bench.py
JSON lines), picks the top-N worst per-query ratios, and re-times just
those queries with bench.py's exact discipline (warm-up run, then best
of two timed noop-sink runs) so adjudicating a bench delta takes
minutes, not a full bench sweep.

Usage::

    python tools/bench_delta.py BENCH_r10.json BENCH_r11.json [-n 8]

Output: one table row per re-timed query — old, new, idle, and the
verdict column the PERF.md round sections use (``flat`` when idle is
within 25% of old, ``regressed`` when idle confirms the new number,
``load`` when idle lands well under the driver's number).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        j = json.load(f)
    if "queries" in j:
        return j["queries"]
    m = re.search(r'\{"metric".*\}', j.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("-n", type=int, default=8, help="top-N ratios to re-time")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    qa, qb = _load_queries(args.old), _load_queries(args.new)
    shared = sorted(
        ((qb[k] / qa[k], k) for k in qa if k in qb), reverse=True
    )[: args.n]
    names = [k for _, k in shared]

    from rawdata_client_provider_gcs_spark.plans import catalog
    from rawdata_client_provider_gcs_spark.session import get_spark

    spark = get_spark(app_name="rawdata-bench-delta")
    spark.sparkContext.setLogLevel("ERROR")
    bench = catalog.bench_queries()

    warm = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    warm.limit(1000).write.mode("overwrite").format("noop").save()

    print(f"{'query':42s} {'old':>7s} {'new':>7s} {'idle':>7s}  verdict")
    for name in names:
        if name not in bench:
            print(f"{name:42s} {qa[name]:7.2f} {qb[name]:7.2f}    gone  removed")
            continue
        fn = bench[name].fn
        fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        old, new = qa[name], qb[name]
        if best <= old * 1.25:
            verdict = "flat (load/data noise in driver run)"
        elif best >= new * 0.8:
            verdict = "REGRESSED (idle confirms)"
        else:
            verdict = "partial (some load, some real)"
        print(f"{name:42s} {old:7.2f} {new:7.2f} {best:7.2f}  {verdict}")
    spark.stop()


if __name__ == "__main__":
    main()
