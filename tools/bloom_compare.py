#!/usr/bin/env python
"""Seen-filter vs Spark's native BloomFilterAggregate at 2M items.

Round-7 measurement (VERDICT r6 task #4): Spark ships a JVM-side Bloom
filter aggregate (`bloom_filter_agg` / `might_contain`, used by runtime
row-level filtering).  In Spark 4.1 neither function is in the PUBLIC
FunctionRegistry (`UNRESOLVED_ROUTINE` from SQL), but the expression
classes are reachable through the catalyst parser + ExpressionUtils —
internal API, so the comparison is a TOOL, not an engine dependency.

Measures, over the same 2M-long corpus:
  - build wall: operators.seenfilter.build_seen_filter (Arrow-batched
    numpy bitmaps, 16-partition merge) vs BloomFilterAggregate
  - probe wall + FP rate: numpy mark_seen vs might_contain, on a 2M
    disjoint probe set
  - false negatives: both must be zero by construction

Usage: python tools/bloom_compare.py [n_items]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from rawdata_client_provider_gcs_spark.operators import seenfilter  # noqa: E402
from rawdata_client_provider_gcs_spark.session import get_spark  # noqa: E402


def native_bloom_build(spark, df, col: str, n: int, n_bits: int) -> bytes:
    """Aggregate df[col] (long) into a Spark BloomFilterImpl blob via the
    internal BloomFilterAggregate expression."""
    from pyspark.sql.classic.column import Column as CCol

    jvm = spark._jvm
    parser = spark._jsparkSession.sessionState().sqlParser()
    agg = jvm.org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        parser.parseExpression(col),
        parser.parseExpression(f"{n}L"),
        parser.parseExpression(f"{n_bits}L"),
    )
    jcol = jvm.org.apache.spark.sql.classic.ExpressionUtils.column(
        agg.toAggregateExpression()
    )
    row = df.agg(CCol(jcol).alias("f")).collect()[0]
    return bytes(row["f"])


def native_might_contain(spark, df, col: str, blob: bytes, flag: str):
    """df + flag column via the internal BloomFilterMightContain expr."""
    from pyspark.sql.classic.column import Column as CCol

    jvm = spark._jvm
    parser = spark._jsparkSession.sessionState().sqlParser()
    # the filter blob rides a literal (broadcast with the plan)
    lit = jvm.org.apache.spark.sql.catalyst.expressions.Literal.create(
        blob, jvm.org.apache.spark.sql.types.DataTypes.BinaryType
    )
    expr = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        lit, parser.parseExpression(col)
    )
    jcol = jvm.org.apache.spark.sql.classic.ExpressionUtils.column(expr)
    return df.withColumn(flag, CCol(jcol))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    fpp = 0.01
    spark = get_spark(app_name="bloom-compare")
    spark.sparkContext.setLogLevel("ERROR")

    # corpus: n distinct longs; probe set: n DISJOINT longs
    corpus = spark.range(0, n).select(
        F.xxhash64(F.col("id")).alias("v")
    )
    probes = spark.range(n, 2 * n).select(
        F.xxhash64(F.col("id")).alias("v")
    )
    corpus.write.mode("overwrite").format("noop").save()  # warm scan path

    m_bits, k = seenfilter.bloom_params(n, fpp)
    print(f"n={n} fpp={fpp} -> m={m_bits} bits ({m_bits >> 23} MiB), k={k}")

    # -- custom build --------------------------------------------------
    t0 = time.perf_counter()
    blob = seenfilter.build_seen_filter(corpus, "v", n, fpp, hashing="python")
    t_custom_build = time.perf_counter() - t0
    print(f"custom build: {t_custom_build:.2f}s  blob={len(blob)}B")

    # -- shipped RWSF2 path (public stat.bloomFilter + numpy V2 probe) -
    t0 = time.perf_counter()
    blob2 = seenfilter.build_seen_filter(corpus, "v", n, fpp, hashing="spark")
    t_rwsf2_build = time.perf_counter() - t0
    print(f"rwsf2 build: {t_rwsf2_build:.2f}s  blob={len(blob2)}B")
    t0 = time.perf_counter()
    fp2 = (
        seenfilter.mark_seen(probes, "v", blob2)
        .filter(F.col("seen_before"))
        .count()
    )
    t_rwsf2_probe = time.perf_counter() - t0
    fn2 = (
        seenfilter.mark_seen(corpus, "v", blob2)
        .filter(~F.col("seen_before"))
        .count()
    )
    print(
        f"rwsf2 probe: {t_rwsf2_probe:.2f}s  FP={fp2} ({fp2 / n:.4%})  "
        f"FN={fn2}"
    )

    # -- native build --------------------------------------------------
    t0 = time.perf_counter()
    nblob = native_bloom_build(spark, corpus, "v", n, m_bits)
    t_native_build = time.perf_counter() - t0
    print(f"native build: {t_native_build:.2f}s  blob={len(nblob)}B")

    # -- custom probe: FP rate on disjoint set, FN rate on corpus ------
    t0 = time.perf_counter()
    fp = (
        seenfilter.mark_seen(probes, "v", blob)
        .filter(F.col("seen_before"))
        .count()
    )
    t_custom_probe = time.perf_counter() - t0
    fn = (
        seenfilter.mark_seen(corpus, "v", blob)
        .filter(~F.col("seen_before"))
        .count()
    )
    print(
        f"custom probe: {t_custom_probe:.2f}s  FP={fp} ({fp / n:.4%})  FN={fn}"
    )

    # -- native probe --------------------------------------------------
    t0 = time.perf_counter()
    nfp = (
        native_might_contain(spark, probes, "v", nblob, "seen")
        .filter(F.col("seen"))
        .count()
    )
    t_native_probe = time.perf_counter() - t0
    nfn = (
        native_might_contain(spark, corpus, "v", nblob, "seen")
        .filter(~F.col("seen"))
        .count()
    )
    print(
        f"native probe: {t_native_probe:.2f}s  FP={nfp} ({nfp / n:.4%})  "
        f"FN={nfn}"
    )

    import json

    print(
        json.dumps(
            {
                "n": n,
                "custom_build_sec": round(t_custom_build, 3),
                "rwsf2_build_sec": round(t_rwsf2_build, 3),
                "rwsf2_probe_sec": round(t_rwsf2_probe, 3),
                "rwsf2_fp_rate": fp2 / n,
                "rwsf2_fn": fn2,
                "native_build_sec": round(t_native_build, 3),
                "custom_probe_sec": round(t_custom_probe, 3),
                "native_probe_sec": round(t_native_probe, 3),
                "custom_fp_rate": fp / n,
                "native_fp_rate": nfp / n,
                "custom_fn": fn,
                "native_fn": nfn,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
