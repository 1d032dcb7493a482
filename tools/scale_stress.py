#!/usr/bin/env python
"""Scale-stress harness: does each heavy operator's runtime scale ~linearly?

Correctness is proven at sf0.01 against DuckDB; the open question for a
100 TB deployment is *shape*: does runtime grow linearly with fact data,
or does some plan hide a quadratic join / driver bottleneck that only
shows past toy scale?  This harness answers it empirically on one box:

1. Derive an N× dataset (default 10×) from ``$SPARK_GRAFT_SF_DIR``
   (default sf0.1) under ``/tmp``: **fact tables** (lineitem, orders,
   events, documents, embeddings) are unioned N times with their keys
   shifted by a large per-copy offset (joins and groupings stay valid,
   data volume grows N×); **dimension tables** (region, nation, customer,
   supplier, part) are copied unchanged — exactly how a real deployment
   grows (facts scale, dims don't).  Document text gets a per-copy suffix
   token so copies are *near*-duplicates (realistic dedup input) rather
   than byte-identical ones.
2. Run the non-streaming bench queries at 1× and N× (noop sink, one
   warm-up + best of two timed runs each) and report the runtime ratio
   per query next to the data ratio N.

Reading the output: ``ratio ≪ N`` means fixed per-stage overhead still
dominates at 1× (the common case at these sizes — fine); ``ratio ≈ N``
means compute-bound and linear (fine); ``ratio ≫ N`` is a scaling bug —
a pair explosion, a lost broadcast, a driver collect — and must be fixed.

Streaming queries are excluded: their cost at this scale is micro-batch
and state-store machinery, which scales with trigger count and state
size, not input file size; the watermark/append design bounds state by
construction.

Usage::

    python tools/scale_stress.py                 # 10x, all heavy queries
    python tools/scale_stress.py --copies 5 --queries q_ngram_jaccard_pairs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.plans import catalog
from rawdata_client_provider_gcs_spark.session import get_spark
from rawdata_client_provider_gcs_spark.tables import load_table

#: key column(s) to shift per copy so unioned facts keep disjoint ids but
#: join the *same* (unscaled) dimension rows.
_FACT_SHIFTS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_DIMS = ("region", "nation", "customer", "supplier", "part")

#: large enough that shifted ids never collide with real ones, small
#: enough that copy*offset stays far from bigint overflow.
_OFFSET = 10**12

#: bench queries whose input is batch tables (streaming excluded, above).
_DEFAULT_QUERIES = [
    "q_agg_basic",
    "q_join_inner_broadcast",
    "q_join_asof",
    "q_window_ranking",
    "q_window_frames",
    "q_explode_wordcount",
    "q_sessionize_batch",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q10",
    "q_tpch_q18",
    "q_tpch_q9_profit",
    "q_tpch_q21_waiting",
    "q_dedup_exact",
    "q_ngram_jaccard_pairs",
    "q_dedup_components",
    "q_simhash_pairs",
    "q_similarity_bruteforce_topk",
    "q_similarity_ivf_ann",
    "q_curation_pack_sequences",
    "q_decontam_overlap",
    "q_text_bigram_rarity",
    "q_text_dup_substrings",
    "q_decontam_fuzzy",
    "q_events_funnel",
    "q_events_cohort_retention",
    "q_text_dedup_lines",
]


def generate(spark, base_dir: str, out_dir: str, copies: int) -> None:
    for name in _DIMS:
        df = load_table(spark, base_dir, name)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in _FACT_SHIFTS.items():
        base = load_table(spark, base_dir, name)
        parts = []
        for i in range(copies):
            part = base
            for key in keys:
                part = part.withColumn(key, F.col(key) + F.lit(i * _OFFSET))
            if name == "documents" and i > 0:
                # near-duplicate, not identical: real corpora repeat with
                # boilerplate drift, and byte-identical 10x copies would
                # turn the Jaccard pair set into a pure copy artifact
                part = part.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
                )
            parts.append(part)
        scaled = parts[0]
        for part in parts[1:]:
            scaled = scaled.unionByName(part)
        scaled.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


def time_query(spark, name: str, sf_dir: str) -> float:
    fn = catalog.queries()[name]
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def skew_demo(spark, rows: int = 5_000_000, hot_share: float = 0.5) -> dict:
    """Does the explicit salt earn its complexity under real key skew?

    A Zipf-extreme distribution — one key holding ``hot_share`` of all
    rows, the rest uniform over 100k keys — drives both the join and the
    count-distinct path, plain vs salted, with the broadcast threshold
    off (the regime salting exists for: the dim is too big to broadcast
    or the planner can't see it's small).  AQE stays on, as in
    production: AQE's skew splitter can divide an oversized SMJ
    partition, so the join rows measure what AQE already solves; the
    aggregation rows measure the case AQE cannot fix (a single
    key-group feeding countDistinct must meet on one reducer — only the
    two-stage salted rewrite bounds it).  Wall times plus the hot
    partition's row count before/after salting.
    """
    from rawdata_client_provider_gcs_spark.operators import skew as skew_ops

    n_hot = int(rows * hot_share)
    big = (
        spark.range(rows)
        .select(
            F.when(F.col("id") < n_hot, F.lit(0))
            .otherwise((F.xxhash64("id") % 100_000 + 100_000) % 100_000 + 1)
            .alias("k"),
            (F.col("id") % 1_000_003).alias("v"),
        )
        .persist()
    )
    big.count()
    small = spark.range(100_001).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
    )

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = {
            "rows": rows,
            "hot_share": hot_share,
            "join_plain_aqe_s": timed(big.join(small, "k")),
            "join_salted_s": timed(
                skew_ops.salted_join(big, small, "k", salt=32, salt_by=["v"])
            ),
            "cdist_plain_s": timed(
                big.groupBy("k").agg(F.countDistinct("v").alias("nv"))
            ),
            "cdist_salted_s": timed(
                skew_ops.salted_count_distinct(big, "k", "v", salt=32)
            ),
            "hot_key_rows": n_hot,
            "hot_rows_per_salt": n_hot // 32,
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        big.unpersist()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--queries", nargs="*", default=_DEFAULT_QUERIES)
    ap.add_argument("--regen", action="store_true", help="rebuild scaled data")
    ap.add_argument(
        "--skew", action="store_true", help="run the Zipf skew demo instead"
    )
    args = ap.parse_args()

    if args.skew:
        spark = get_spark(app_name="rawdata-spark-skew-demo")
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps({"skew": skew_demo(spark)}))
        spark.stop()
        return 0

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/rawdata-scale-{os.path.basename(base_dir.rstrip('/'))}-x{args.copies}"

    spark = get_spark(app_name="rawdata-spark-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    if args.regen or not os.path.exists(out_dir):
        print(f"generating {args.copies}x dataset at {out_dir}", file=sys.stderr)
        generate(spark, base_dir, out_dir, args.copies)

    results = {}
    for name in args.queries:
        t1 = time_query(spark, name, base_dir)
        tn = time_query(spark, name, out_dir)
        results[name] = {
            "sec_1x": t1,
            f"sec_{args.copies}x": tn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
        print(f"{name}: 1x={t1}s {args.copies}x={tn}s ratio={results[name]['ratio']}",
              file=sys.stderr)

    print(json.dumps({"copies": args.copies, "base": base_dir, "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
