#!/usr/bin/env python
"""Vector-tier scale stress: wall AND recall at 100x-1000x (VERDICT r5 #2).

The relational heavies have 100x rows in SCALE.md; the ANN tier stopped
at 10x where it is still overhead-bound.  This tool scales the
embeddings corpus by jittered near-duplication (each copy adds
deterministic pseudo-noise, cosine ~0.98 to its source, so vectors stay
distinct and the label-cluster structure crowds the IVF cells — the
regime where recall actually degrades), then measures every ANN tier
against the brute-force ground truth at the SAME scale:

  python tools/vector_stress.py --copies 100
  python tools/vector_stress.py --copies 1000 --skip-brute-wall

Reports one JSON document: per-tier wall seconds and recall@k, plus an
IVF (nlist, nprobe) sweep and the cell-crowding stats that drive the
sizing rule recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.operators import similarity as S
from rawdata_client_provider_gcs_spark.session import get_spark
from rawdata_client_provider_gcs_spark.tables import load_table

_OFFSET = 10**12
#: per-component noise amplitude: unit vectors, 64 dims -> noise norm
#: ~0.16, cosine(source, copy) ~0.987 — distinct but same cluster.
_JITTER = 0.04


def generate(spark, base_dir: str, out_dir: str, copies: int) -> None:
    # ONE plan regardless of copy count (a 1000-way union would bloat
    # Catalyst): cross-join the base with a copy range and jitter with
    # deterministic JVM-side pseudo-noise keyed by (vec, dim, copy).
    # copy 0 is kept byte-identical to the base corpus.
    base = load_table(spark, base_dir, "embeddings")
    copies_df = spark.range(copies).select(F.col("id").alias("copy"))
    scaled = (
        base.crossJoin(copies_df)
        .select(
            (F.col("vec_id") + F.col("copy") * _OFFSET).alias("vec_id"),
            F.when(F.col("copy") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + (
                            (
                                F.pmod(
                                    F.xxhash64(
                                        F.col("vec_id"), j, F.col("copy")
                                    ),
                                    F.lit(10007),
                                )
                                / 10007.0
                            )
                            - 0.5
                        )
                        * (2 * _JITTER)
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def recall_at_k(approx_rows, exact_rows) -> float:
    exact: dict[int, set] = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for r in approx_rows:
        if r["neighbor_id"] in exact.get(r["query_id"], set()):
            hit += 1
    tot = sum(len(v) for v in exact.values())
    return round(hit / tot, 4) if tot else 0.0


def timed_collect(df):
    t0 = time.perf_counter()
    rows = df.collect()
    return rows, round(time.perf_counter() - t0, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--keep", action="store_true", help="keep the scaled corpus")
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-vector-stress")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = f"/tmp/rawdata-vec-x{args.copies}"
    path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(path):
        print(f"generating {args.copies}x embeddings at {out_dir}", file=sys.stderr)
        generate(spark, args.base, out_dir, args.copies)

    corpus = spark.read.parquet(path)
    n_corpus = corpus.count()
    queries = corpus.filter(F.col("vec_id") < args.n_queries)
    print(f"corpus={n_corpus} queries={queries.count()}", file=sys.stderr)

    report: dict = {
        "copies": args.copies,
        "n_corpus": n_corpus,
        "k": args.k,
        "tiers": {},
        "ivf_sweep": [],
    }

    # ground truth + exact-tier wall
    exact_rows, brute_s = timed_collect(
        S.brute_force_topk(corpus, queries, k=args.k)
    )
    report["tiers"]["bruteforce"] = {"wall_s": brute_s, "recall": 1.0}
    print(f"bruteforce {brute_s}s", file=sys.stderr)

    # LSH tier
    lsh_rows, lsh_s = timed_collect(
        S.lsh_ann_topk(corpus, queries, k=args.k, dim=64)
    )
    report["tiers"]["lsh"] = {
        "wall_s": lsh_s,
        "recall": recall_at_k(lsh_rows, exact_rows),
    }
    print(f"lsh {lsh_s}s recall={report['tiers']['lsh']['recall']}", file=sys.stderr)

    # IVF sweep: nlist x nprobe, trained quantizer (sampled k-means)
    for nlist in (16, 64, 256):
        t0 = time.perf_counter()
        cents = S.train_centroids_kmeans(
            corpus,
            nlist,
            sample_fraction=min(1.0, 50_000 / n_corpus),
        )
        cents = cents.cache()
        cents.count()
        train_s = round(time.perf_counter() - t0, 2)
        for nprobe in (1, 4, 8):
            rows, wall = timed_collect(
                S.ivf_ann_topk(
                    corpus,
                    queries,
                    k=args.k,
                    nlist=nlist,
                    nprobe=nprobe,
                    centroids=cents,
                )
            )
            entry = {
                "nlist": nlist,
                "nprobe": nprobe,
                "train_s": train_s,
                "wall_s": wall,
                "recall": recall_at_k(rows, exact_rows),
            }
            report["ivf_sweep"].append(entry)
            print(f"ivf {entry}", file=sys.stderr)
        # cell crowding for this nlist
        cell = S.ivf_cell_report(corpus, nlist=nlist, centroids=cents).collect()
        sizes = sorted(r["n_vectors"] for r in cell)
        report.setdefault("cells", {})[str(nlist)] = {
            "n_cells": len(sizes),
            "min": sizes[0] if sizes else 0,
            "p50": sizes[len(sizes) // 2] if sizes else 0,
            "max": sizes[-1] if sizes else 0,
        }
        cents.unpersist()

    # materialized inverted lists: build once, probe many (SCALE.md
    # rule 3) — wall for the one-time build plus two probe batches
    for nlist in (16, 64):
        idx = os.path.join(out_dir, f"ivf-index-{nlist}")
        t0 = time.perf_counter()
        S.build_ivf_index(corpus, idx, nlist=nlist)
        build_s = round(time.perf_counter() - t0, 2)
        rows, probe1 = timed_collect(
            S.ivf_query_index(spark, idx, queries, k=args.k, nprobe=4)
        )
        _, probe2 = timed_collect(
            S.ivf_query_index(spark, idx, queries, k=args.k, nprobe=4)
        )
        report.setdefault("indexed", []).append(
            {
                "nlist": nlist,
                "build_s": build_s,
                "probe_s": min(probe1, probe2),
                "recall": recall_at_k(rows, exact_rows),
            }
        )
        print(f"indexed {report['indexed'][-1]}", file=sys.stderr)

    # IVF-PQ tier at the sweep's best mid config
    pq_rows, pq_s = timed_collect(
        S.ivf_pq_topk(
            corpus, queries, k=args.k, nlist=64, nprobe=8, rerank=5 * args.k
        )
    )
    report["tiers"]["ivf_pq(64,8)"] = {
        "wall_s": pq_s,
        "recall": recall_at_k(pq_rows, exact_rows),
    }
    print(f"ivf_pq {pq_s}s recall={report['tiers']['ivf_pq(64,8)']['recall']}", file=sys.stderr)

    print(json.dumps(report))
    if not args.keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
