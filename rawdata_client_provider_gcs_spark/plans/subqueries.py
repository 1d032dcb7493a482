"""Subquery-shaped queries and reshaping operators (pivot/unpivot,
percentiles) — the decorrelation / rewrite surface of the engine.

The reference has no query language at all (SURVEY.md §2A note), so every
shape here is part of the derived §2B surface.  Spark expresses each
subquery as the join Catalyst would decorrelate it to (semi/anti join,
broadcast scalar, pre-aggregated self-join); the oracle states the same
semantics in standard subquery form, so the comparison also checks that
the decorrelation is faithful.

Float parity follows the catalog.py discipline: DECIMAL-exact sums cast
back to double, identical scalar double arithmetic on both sides.
Percentile fractions are limited to binary-exact p ∈ {0.25, 0.5, 0.75} so
Spark's and DuckDB's identical interpolation formulas produce identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DEC2_T = DecimalType(18, 2)

from ..tables import load_table
from .catalog import register
from .relational import dsum2, dsum4, o_sum2, o_sum4

# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@register(
    "q_subquery_exists",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
""",
    tags=("join", "subquery"),
)
def q_subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery as a left-semi join."""
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    l = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q_subquery_scalar",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rich,
       {sum_bal} AS rich_balance
FROM customer
WHERE c_acctbal > (SELECT {avg_bal} / COUNT(*) FROM customer)
GROUP BY c_nationkey
""".format(sum_bal=o_sum2("c_acctbal"), avg_bal=o_sum2("c_acctbal")),
    tags=("aggregation", "subquery"),
)
def q_subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery: customers above the global mean balance.

    The single-row aggregate joins in as a broadcast cross join — the plan
    Catalyst produces for an uncorrelated scalar subquery.
    """
    c = load_table(spark, sf, "customer")
    avg_bal = c.agg(
        (dsum2(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_rich"),
            dsum2(F.col("c_acctbal")).alias("rich_balance"),
        )
    )


@register(
    "q_subquery_correlated",
    oracle="""
SELECT {rev} AS small_qty_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * ({sq} / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""".format(rev=o_sum4("l_extendedprice"), sq=o_sum2("l_quantity")),
    tags=("join", "subquery", "aggregation"),
)
def q_subquery_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery, decorrelated to a
    pre-aggregated self-join on the correlation key."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * (dsum2(F.col("l_quantity")) / F.count(F.lit(1)))).alias(
            "half_avg_qty"
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(dsum4(F.col("l_extendedprice")).alias("small_qty_revenue"))
    )


@register(
    "q_subquery_anti_scalar",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       {sum_bal} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT {avg_pos} / COUNT(*) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_nationkey
""".format(sum_bal=o_sum2("c_acctbal"), avg_pos=o_sum2("c_acctbal")),
    tags=("join", "subquery"),
)
def q_subquery_anti_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join.

    The anti-join leg is "no order above 400k" (every customer in the
    fixture has *some* order, so anti-joining on bare existence would be
    vacuously empty)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    avg_pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((dsum2(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_pos"))
    )
    big = o.filter(F.col("o_totalprice") > 400000)
    return (
        c.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_pos"))
        .join(big, c.c_custkey == big.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum2(F.col("c_acctbal")).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# More TPC-H shapes (filter-agg, conditional agg, ratio, having, OR-blocks)
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q6",
    oracle="""
SELECT {rev} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""".format(rev=o_sum4("l_extendedprice * l_discount")),
    tags=("filter", "aggregation"),
    bench=True,
)
def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change — pure pushed-down filter agg."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum4(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q_tpch_q12",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_linestatus
""",
    tags=("join", "aggregation", "conditional"),
)
def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join + priority-bucketed conditional counts."""
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle="""
SELECT 100.0 * ({promo} / {total}) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""".format(
        promo=o_sum4(
            "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) "
            "ELSE 0 END"
        ),
        total=o_sum4("l_extendedprice * (1 - l_discount)"),
    ),
    tags=("join", "aggregation", "conditional"),
)
def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 promotion-revenue ratio — conditional / total as one
    deterministic double division."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf, "part")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * (dsum4(promo) / dsum4(disc))).alias("promo_revenue"))
    )


@register(
    "q_tpch_q18",
    oracle="""
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       o.o_orderdate, o.o_totalprice,
       {sum_qty} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""".format(sum_qty=o_sum2("l_quantity")),
    tags=("join", "aggregation", "subquery", "topk"),
    bench=True,
)
def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 large-volume orders: IN-subquery over a HAVING aggregate.

    The output's ``sum_qty`` per surviving order IS the HAVING
    aggregate, and the remaining group keys are functionally dependent
    on the order — so the pre-aggregate is joined once as an inner
    (filtering) join and its sum reused, instead of the textbook
    [semi join + second lineitem scan + re-aggregation] plan, which
    read and summed every qualifying lineitem twice (guide §1.2: don't
    compute things twice; A/B median 2.93 s → 1.82 s, rows exact)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum2(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q_tpch_q19",
    oracle="""
SELECT {rev} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "filter", "aggregation"),
)
def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive blocks over a join."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    block = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#20") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(block)
        .agg(
            dsum4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Reshaping: pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "q_pivot_returnflag",
    oracle="""
SELECT l_linestatus,
       {a} AS qty_a, {n} AS qty_n, {r} AS qty_r
FROM lineitem GROUP BY l_linestatus
""".format(
        a=o_sum2("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END"),
        n=o_sum2("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END"),
        r=o_sum2("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END"),
    ),
    tags=("aggregation", "pivot"),
)
def q_pivot_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: return-flag categories become columns (GROUP BY ... PIVOT)."""
    l = load_table(spark, sf, "lineitem")
    piv = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast(DEC2_T)))
    )
    return piv.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0)).cast("double").alias("qty_a"),
        F.coalesce(F.col("N"), F.lit(0)).cast("double").alias("qty_n"),
        F.coalesce(F.col("R"), F.lit(0)).cast("double").alias("qty_r"),
    )


@register(
    "q_unpivot_counts",
    oracle="""
WITH base AS (
  SELECT n_nationkey,
         (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS customers,
         (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS suppliers
  FROM nation
)
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, 'customers' AS entity,
       CAST(customers AS BIGINT) AS n
FROM base
UNION ALL
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, 'suppliers' AS entity,
       CAST(suppliers AS BIGINT) AS n
FROM base
""",
    tags=("set-ops", "unpivot"),
)
def q_unpivot_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt): wide per-nation counts back to long form."""
    n = load_table(spark, sf, "nation")
    c = (
        load_table(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load_table(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    wide = (
        n.join(c, n.n_nationkey == c.k, "left")
        .join(s, n.n_nationkey == s.k, "left")
        .select(
            F.col("n_nationkey").cast("long").alias("n_nationkey"),
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )
    return wide.unpivot(
        ids=["n_nationkey"],
        values=["customers", "suppliers"],
        variableColumnName="entity",
        valueColumnName="n",
    )


# ---------------------------------------------------------------------------
# Exact percentiles
# ---------------------------------------------------------------------------


@register(
    "q_agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.75) AS q75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    tags=("aggregation", "percentile"),
)
def q_agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group.

    p ∈ {0.25, 0.5, 0.75} are binary-exact, quantities are integral
    doubles, and Spark's ``percentile`` and DuckDB's ``quantile_cont``
    share the (n-1)·p linear-interpolation definition — identical doubles.
    """
    l = load_table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )



@register(
    "q_join_lateral_topn",
    oracle="""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(t.l_linenumber AS BIGINT) AS l_linenumber,
       t.l_extendedprice
FROM orders o JOIN LATERAL (
  SELECT l_linenumber, l_extendedprice FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
) t ON TRUE
WHERE o.o_orderkey < 300
""",
    tags=("join", "subquery", "lateral"),
)
def q_join_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT: top-2
    lineitems per order, expressed as the SQL shape users write rather
    than a hand-built window.  Catalyst decorrelates it into exactly the
    right plan — partial+final ``WindowGroupLimit`` on the lineitem side
    and a broadcast join of the filtered orders (verified in
    ``explain``): per-group top-n never ships more than n rows per key.
    The oracle is the identical LATERAL in DuckDB."""
    load_table(spark, sf, "orders").createOrReplaceTempView("v_lat_orders")
    load_table(spark, sf, "lineitem").createOrReplaceTempView("v_lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM v_lat_orders o JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice FROM v_lat_lineitem l
          WHERE l.l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) t
        WHERE o.o_orderkey < 300
        """
    ).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_extendedprice"),
    )
