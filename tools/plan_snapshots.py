#!/usr/bin/env python
"""Commit-able physical-plan snapshots for the bench query set.

Writes one ``plan_snapshots/<query>.txt`` per ``bench=True`` catalog query
containing the ``explain("formatted")`` output with run-varying tokens
normalized away, so a plan regression (a lost broadcast, a new Exchange, a
filter that stopped pushing down) shows up as a reviewable git diff.

Normalizations (all run-to-run noise, none plan shape):

- expression ids        ``l_orderkey#123L``      -> ``l_orderkey#L``
- plan ids              ``[plan_id=456]``        -> ``[plan_id=N]``
- absolute paths        ``file:/root/testdata/sf0.001/x.parquet`` -> ``<path>``
- in-memory index size  ``InMemoryFileIndex(3 paths)`` -> ``InMemoryFileIndex(<n> paths)``
- cached RDD ids        ``rdd_12_3`` / ``CachedRDDBuilder`` numerics -> stable

Streaming-backed queries (the catalog runs them ``availableNow`` and
returns the drained sink as a batch DataFrame) snapshot that batch plan —
shallow, but still diffs if the sink schema or post-drain projection moves.

Usage::

    python tools/plan_snapshots.py            # writes plan_snapshots/
    python tools/plan_snapshots.py --check    # non-zero exit on any diff

The snapshot scale factor is sf0.001 so the run is seconds, and — because
AQE re-plans from runtime statistics — ``explain`` here shows the *initial*
(pre-AQE) physical plan, which is exactly the stable part worth diffing.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawdata_client_provider_gcs_spark.plans import catalog
from rawdata_client_provider_gcs_spark.session import get_spark

SNAP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plan_snapshots"
)
SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")

_NORMALIZERS = [
    (re.compile(r"#\d+"), "#"),
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"rdd_\d+_\d+"), "rdd_N_N"),
    (re.compile(r"MapPartitionsRDD\[\d+\]"), "MapPartitionsRDD[N]"),
    (re.compile(r"file:[^\s,\]\)]+"), "<path>"),
    (re.compile(r"InMemoryFileIndex\(\d+ paths?\)"), "InMemoryFileIndex(<n> paths)"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(<stats>)"),
    (re.compile(r"memoryUsageBytes=\d+"), "memoryUsageBytes=N"),
    (re.compile(r"StorageLevel\([^)]*\)"), "StorageLevel(<level>)"),
    # RDD creation call-site varies with the py4j invocation path
    # (NativeMethodAccessorImpl.java:0 vs <unknown>:0 across JVMs/runs)
    (re.compile(r"at localCheckpoint at [^,]+,"), "at localCheckpoint at <callsite>,"),
    # lambda variable ids are a session-global counter — the numbering
    # shifts whenever the set of queries run before this one changes
    (re.compile(r"lambda ([A-Za-z]+)_\d+#"), r"lambda \1_#"),
]


def _internal_decontam_fuzzy(spark, sf):
    from pyspark.sql import functions as F

    from rawdata_client_provider_gcs_spark.operators import decontam
    from rawdata_client_provider_gcs_spark.tables import load_table

    d = load_table(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat(F.col("text"), F.lit(" extra probe token")).alias("text"),
    )
    return decontam.fuzzy_contaminated_pairs(
        d, bench, bench_id_col="bench_id", k=3, threshold=0.5,
        materialize=False,
    )


def _internal_ngram_jaccard(spark, sf):
    from rawdata_client_provider_gcs_spark.operators import dedup
    from rawdata_client_provider_gcs_spark.tables import load_table

    d = load_table(spark, sf, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.12, max_doc_freq=1000,
        materialize=False,
    )


#: Operators that eager-checkpoint their results (so the catalog query's
#: own explain shows only `Scan ExistingRDD`): snapshot the LAZY
#: `materialize=False` twin as `<name>_internal.txt` so the real plan —
#: the broadcast, the semi-join, the single corpus explode — stays
#: under git diff audit.  Built from the same construction as the
#: catalog query.
INTERNAL = {
    "q_decontam_fuzzy_internal": _internal_decontam_fuzzy,
    "q_ngram_jaccard_pairs_internal": _internal_ngram_jaccard,
}


#: Queries whose normalized text is session-bistable WITHOUT any plan-
#: shape change; --check reports their drift as a warning, not failure.
#: Keep this list justified — an entry hides real regressions for that
#: query, so only textual-order instability belongs here.
VOLATILE = {
    # The multi-count-distinct rewrite emits Expand's projection
    # branches (and the downstream grouping-key order) from an
    # unordered set; the two orderings alternate between sessions.
    # Shape (Expand -> partial/final HashAggregate -> joins) is
    # identical either way.
    # (q_tpch_q21_waiting left this list in r17: its window rewrite
    # removed the count-distinct Expand that was bistable.)
    "q_decontam_overlap": "count-distinct Expand branch order is bistable",
}


def normalize(plan: str) -> str:
    for pat, rep in _NORMALIZERS:
        plan = pat.sub(rep, plan)
    # strip trailing whitespace per line; formatted explain pads columns
    return "\n".join(ln.rstrip() for ln in plan.splitlines()) + "\n"


def formatted_plan(df) -> str:
    # DataFrame.explain prints to stdout; _sc gives the string directly.
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="diff against committed snapshots")
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-spark-plan-snapshots")
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(SNAP_DIR, exist_ok=True)
    bench = catalog.bench_queries()
    targets = {name: qdef.fn for name, qdef in bench.items()}
    targets.update(INTERNAL)
    drift: list[str] = []
    for name, fn in sorted(targets.items()):
        try:
            df = fn(spark, SF_DIR)
            text = normalize(formatted_plan(df))
        except Exception as exc:  # snapshot the failure; it diffs too
            text = f"<explain failed: {type(exc).__name__}: {exc}>\n"
        path = os.path.join(SNAP_DIR, f"{name}.txt")
        if args.check:
            old = open(path).read() if os.path.exists(path) else "<missing>"
            if old != text:
                if name in VOLATILE:
                    print(f"volatile drift (ok): {name} — {VOLATILE[name]}")
                else:
                    drift.append(name)
        else:
            with open(path, "w") as fh:
                fh.write(text)
            print(f"wrote {path}")

    if args.check:
        if drift:
            print("PLAN DRIFT:", ", ".join(drift))
            return 1
        print(f"all {len(targets)} plans match committed snapshots")
    return 0


if __name__ == "__main__":
    sys.exit(main())
