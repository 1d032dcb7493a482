"""Relational operator queries (SURVEY.md §2B: scan → set ops + scalar fns).

Each query names the §2B row(s) it exercises.  Oracle SQL follows the
float-parity discipline documented in ``catalog.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ..operators.asof import asof_join
from ..tables import load_table
from .catalog import register

DEC2 = DecimalType(18, 2)
DEC4 = DecimalType(18, 4)

# Exact order-independent sums via fixed-point LONG accumulation.
#
# ``round(x·10^s)`` is computed on the identical IEEE double in both
# engines (ties only arise at exactly-representable .5 values, where both
# round away from zero), the integer sum is exact and order-free, and the
# final ``/10^s`` division is one deterministic double op — so Spark and
# DuckDB agree bit-for-bit while the aggregation stays a plain long sum
# (~3× faster than DECIMAL-backed sums, which leave the primitive-long
# path once the sum precision exceeds 18).
#
# Bound: |Σ round(x·10^s)| must stay below 2^63 ≈ 9.2e18 — ample for any
# per-group aggregate of money-scaled values up to petabyte row counts;
# ANSI mode makes an overflow loud, and the DECIMAL(38) form is the
# drop-in replacement beyond that.


def dsum2(col) -> F.Column:
    """Order-independent exact sum of a money-ish double, as double."""
    return (F.sum(F.round(col * 100).cast("long")) / F.lit(100.0)).cast("double")


def dsum4(col) -> F.Column:
    return (F.sum(F.round(col * 10000).cast("long")) / F.lit(10000.0)).cast("double")


def o_sum2(expr: str) -> str:
    return f"(CAST(SUM(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE) / 100.0)"


def o_sum4(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST(round(({expr}) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0)"
    )


# ---------------------------------------------------------------------------
# Projection / filter / scan
# ---------------------------------------------------------------------------


@register(
    "q_projection_compute",
    oracle="""
SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
       CAST(l_linenumber AS BIGINT) AS linenumber,
       l_quantity * l_extendedprice AS gross,
       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge,
       upper(l_returnflag) AS flag
FROM lineitem
WHERE l_orderkey < 100
""",
    tags=("projection", "scan"),
)
def q_projection_compute(spark: SparkSession, sf: str) -> DataFrame:
    """Projection: select / rename / computed columns (§2B Projection)."""
    l = load_table(spark, sf, "lineitem")
    return l.filter(F.col("l_orderkey") < 100).select(
        F.col("l_orderkey").cast("long").alias("orderkey"),
        F.col("l_linenumber").cast("long").alias("linenumber"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("gross"),
        (
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("charge"),
        F.upper("l_returnflag").alias("flag"),
    )


@register(
    "q_filter_predicates",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 1000 AND 50000
  AND o_orderpriority LIKE '1-%'
  AND o_custkey IS NOT NULL
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
""",
    tags=("filter",),
)
def q_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """Filter: IN / BETWEEN / LIKE / null checks / timestamp compare."""
    o = load_table(spark, sf, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q_join_inner_broadcast",
    oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sum_bal} AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""".format(sum_bal=o_sum2("c_acctbal")),
    tags=("join",),
    bench=True,
)
def q_join_inner_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join with an explicitly broadcast dimension (§2B Join)."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum2(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "q_join_left_outer",
    oracle="""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       {sum_price} AS total_spent
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 200
GROUP BY c.c_custkey
""".format(sum_price=o_sum2("o_totalprice")),
    tags=("join",),
)
def q_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join preserving customers without orders."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 200)
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(c.c_custkey.cast("long").alias("c_custkey"))
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            dsum2(F.col("o_totalprice")).alias("total_spent"),
        )
    )


@register(
    "q_join_full_outer",
    oracle="""
WITH c AS (SELECT c_nationkey, COUNT(*) AS c_cnt FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey, COUNT(*) AS s_cnt FROM supplier GROUP BY s_nationkey)
SELECT CAST(COALESCE(c.c_nationkey, s.s_nationkey) AS BIGINT) AS nationkey,
       CAST(COALESCE(c.c_cnt, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(s.s_cnt, 0) AS BIGINT) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey
""",
    tags=("join",),
)
def q_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of per-nation customer/supplier counts."""
    c = (
        load_table(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    s = (
        load_table(spark, sf, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full")
    return j.select(
        F.coalesce(c.c_nationkey, s.s_nationkey).cast("long").alias("nationkey"),
        F.coalesce(F.col("c_cnt"), F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce(F.col("s_cnt"), F.lit(0)).cast("long").alias("n_suppliers"),
    )


@register(
    "q_join_semi_anti",
    oracle="""
SELECT 'with_orders' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'without_orders' AS bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    tags=("join",),
)
def q_join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi and left-anti joins, counted side by side."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("bucket"), "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("bucket"), "n")
    )
    return semi.unionAll(anti)


@register(
    "q_join_theta_range",
    oracle="""
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {rev} AS revenue
FROM part p JOIN lineitem l
  ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
GROUP BY p.p_brand
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "non-equi"),
)
def q_join_theta_range(spark: SparkSession, sf: str) -> DataFrame:
    """Join with a non-equi (theta) component on top of the equi key."""
    p = load_table(spark, sf, "part")
    l = load_table(spark, sf, "lineitem")
    return (
        l.join(
            p,
            (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@register(
    "q_join_range_binned",
    oracle="""
SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(MIN(c.event_id) AS BIGINT) AS first_click_id
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.event_id
""",
    tags=("join", "non-equi", "range"),
)
def q_join_range_binned(spark: SparkSession, sf: str) -> DataFrame:
    """Pure range join (no equi key): clicks attributed to every purchase
    whose 1-hour lookback window contains them.  Executed as a binned
    equi-join (``operators/rangejoin.py``) instead of the nested-loop
    plan Spark would otherwise pick for a bare range predicate."""
    from ..operators.rangejoin import binned_interval_join

    e = load_table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    joined = binned_interval_join(
        clicks,
        purchases,
        point=F.unix_micros(F.col("click_ts").cast("timestamp")),
        start=F.unix_micros(F.col("purchase_ts").cast("timestamp")) - 3_600_000_000,
        end=F.unix_micros(F.col("purchase_ts").cast("timestamp")),
        bin_width=3_600_000_000,
    )
    return joined.groupBy(F.col("purchase_id").cast("long").alias("purchase_id")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min("click_id").cast("long").alias("first_click_id"),
    )


@register(
    "q_join_asof",
    oracle="""
WITH ranked AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         c.ts AS click_ts, c.event_id AS click_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM events p
  JOIN events c ON c.user_id = p.user_id
               AND c.event_type = 'click' AND c.ts <= p.ts
  WHERE p.event_type = 'purchase'
)
SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST(user_id AS BIGINT) AS user_id,
       purchase_ts, click_ts, CAST(click_id AS BIGINT) AS click_id
FROM ranked WHERE rn = 1
""",
    tags=("join", "asof"),
    bench=True,
)
def q_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user (§2B).

    Implemented with the union-sort operator (operators/asof.py) — one
    shuffle, no |L|×|R| blow-up; the oracle states the same semantics as a
    ROW_NUMBER join.  Both sides come from the events table so the time
    domains overlap and the result is fat (≈19 % of events are purchases,
    nearly all preceded by a click — thousands of rows at sf0.01).
    Purchases whose user has no earlier click drop out (inner as-of) to
    keep parity with the join-based oracle.
    """
    e = load_table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_ts",
        right_time="ts",
        right_cols=["click_id"],
        tiebreak_cols=["ts", "click_id"],
    )
    return joined.filter(F.col("ts").isNotNull()).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("purchase_ts"),
        F.col("ts").alias("click_ts"),
        F.col("click_id").cast("long").alias("click_id"),
    )


@register(
    "q_join_asof_tolerance",
    oracle="""
WITH ranked AS (
  SELECT p.event_id AS purchase_id, p.user_id,
         c.ts AS click_ts, c.event_id AS click_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM events p
  JOIN events c ON c.user_id = p.user_id
               AND c.event_type = 'click' AND c.ts <= p.ts
               AND c.ts >= p.ts - INTERVAL 2 HOUR
  WHERE p.event_type = 'purchase'
)
SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST(user_id AS BIGINT) AS user_id,
       click_ts, CAST(click_id AS BIGINT) AS click_id
FROM ranked WHERE rn = 1
""",
    tags=("join", "asof"),
)
def q_join_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a 2-hour lookback tolerance (pandas merge_asof
    semantics): stale matches are discarded.  The bound is also what lets
    a streaming formulation expire its state."""
    e = load_table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_ts",
        right_time="ts",
        right_cols=["click_id"],
        tiebreak_cols=["ts", "click_id"],
        tolerance=F.expr("INTERVAL 2 HOURS"),
    )
    return joined.filter(F.col("ts").isNotNull()).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("click_id").cast("long").alias("click_id"),
    )


@register(
    "q_skew_salted_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
""",
    tags=("aggregation", "skew"),
)
def q_skew_salted_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-stage COUNT(DISTINCT) (`operators/skew.py`) — the
    explicit fallback for hot grouping keys AQE can't split.  The oracle
    is the plain COUNT(DISTINCT): the rewrite must be exactly equal."""
    from ..operators.skew import salted_count_distinct

    e = load_table(spark, sf, "events")
    return salted_count_distinct(e, "event_type", "user_id", salt=16)


@register(
    "q_skew_salted_join",
    oracle="""
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {bal} AS total_bal
FROM customer JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
""".format(bal=o_sum2("c_acctbal")),
    tags=("join", "skew"),
)
def q_skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salted hot-key join (`operators/skew.py`): the small side explodes
    across 8 salts so one hot key fans out over 8 reducers.  Oracle is
    the plain join — the rewrite must be exactly equal."""
    from ..operators.skew import salted_join

    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    joined = salted_join(c, n, on="c_nationkey", salt=8, salt_by=["c_custkey"])
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        dsum2(F.col("c_acctbal")).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "q_agg_basic",
    oracle="""
SELECT l_returnflag, l_linestatus,
       {sum_qty} AS sum_qty,
       {sum_base} AS sum_base_price,
       {sum_disc} AS sum_disc_price,
       {sum_charge} AS sum_charge,
       {sum_qty} / COUNT(*) AS avg_qty,
       {sum_base} / COUNT(*) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".format(
        sum_qty=o_sum2("l_quantity"),
        sum_base=o_sum2("l_extendedprice"),
        sum_disc=o_sum4("l_extendedprice * (1 - l_discount)"),
        sum_charge=o_sum4("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)"),
    ),
    tags=("aggregation",),
    bench=True,
)
def q_agg_basic(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 pricing summary — hash agg with exact decimal sums."""
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum2(F.col("l_quantity")).alias("sum_qty"),
        dsum2(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum4(disc).alias("sum_disc_price"),
        dsum4(charge).alias("sum_charge"),
        (dsum2(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        (dsum2(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregation", "distinct"),
)
def q_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """count-distinct + min/max per group."""
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       TRUE AS within_bound
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregation", "approx"),
)
def q_agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) checked against the exact count.

    The raw HLL estimate is implementation-defined, so it can't be
    hash-compared to another engine.  Instead the query emits the exact
    count plus a ``within_bound`` boolean asserting the estimate is inside
    5× the configured relative standard deviation (rsd 0.02 → ±10%) — the
    oracle expects TRUE for every group, so a broken sketch breaks the
    hash match without faking determinism.
    """
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.count_distinct("o_custkey")
            )
            <= F.count_distinct("o_custkey") * F.lit(0.10)
        ).alias("within_bound"),
    )


@register(
    "q_agg_rollup",
    oracle="""
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {bal} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""".format(bal=o_sum2("c_acctbal")),
    tags=("aggregation", "rollup"),
)
def q_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING flags."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum2(F.col("c_acctbal")).alias("total_bal"),
    ).select("r_name", "n_name", "g_region", "g_nation", "n_customers", "total_bal")


@register(
    "q_agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("aggregation", "cube"),
)
def q_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two dimensions."""
    l = load_table(spark, sf, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       {tp} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""".format(tp=o_sum2("o_totalprice")),
    tags=("aggregation", "grouping-sets"),
)
def q_agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q_agg_stats",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       {s1} AS sum_qty,
       {s2} AS sum_qty_sq,
       ({s2} - {s1} * {s1} / COUNT(*)) / (COUNT(*) - 1) AS var_qty,
       sqrt(({s2} - {s1} * {s1} / COUNT(*)) / (COUNT(*) - 1)) AS stddev_qty
FROM lineitem GROUP BY l_returnflag
""".format(s1=o_sum2("l_quantity"), s2=o_sum4("l_quantity * l_quantity")),
    tags=("aggregation", "stats"),
)
def q_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Sample variance/stddev from exact decimal sums (order-independent,
    unlike the built-in streaming stddev)."""
    l = load_table(spark, sf, "lineitem")
    s1 = dsum2(F.col("l_quantity"))
    s2 = dsum4(F.col("l_quantity") * F.col("l_quantity"))
    n = F.count(F.lit(1))
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("sum_qty"),
        s2.alias("sum_qty_sq"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_window_ranking",
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_totalprice,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window", "ranking"),
    bench=True,
)
def q_window_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile."""
    o = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_window_analytic",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       event_type,
       LAG(event_type) OVER w AS prev_type,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(event_type) OVER w AS first_type,
       CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT) AS us_since_prev
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "analytic"),
)
def q_window_analytic(spark: SparkSession, sf: str) -> DataFrame:
    """lag / lead / first_value + exact event-gap computation (µs)."""
    e = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    return e.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        gap_us.cast("long").alias("us_since_prev"),
    )


@register(
    "q_window_frames",
    oracle="""
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       CAST(COUNT(*)
            OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS orders_last_90d
FROM orders WHERE o_custkey < 100
""",
    tags=("window", "frames"),
    bench=True,
)
def q_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """ROWS and RANGE frames: running total + sliding 90-day count."""
    o = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    epoch_s = F.col("o_orderdate").cast("timestamp").cast("long")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_s)
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.sum(F.col("o_totalprice").cast(DEC2)).over(w_rows).cast("double").alias(
            "running_total"
        ),
        F.count(F.lit(1)).over(w_range).cast("long").alias("orders_last_90d"),
    )


# ---------------------------------------------------------------------------
# Sort / limit, set operations
# ---------------------------------------------------------------------------


@register(
    "q_topk_orders",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("sort", "limit"),
)
def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject) with deterministic tiebreak."""
    o = load_table(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            "o_totalprice",
        )
    )


@register(
    "q_set_ops",
    oracle="""
WITH c_nat AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer WHERE c_acctbal > 9000),
     s_nat AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier WHERE s_acctbal > 5000)
SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c_nat UNION SELECT nationkey FROM s_nat)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c_nat INTERSECT SELECT nationkey FROM s_nat)
UNION ALL
SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c_nat EXCEPT SELECT nationkey FROM s_nat)
""",
    tags=("set-ops",),
)
def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """union distinct / intersect / except over nation-key sets."""
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").cast("long").alias("nationkey"))
        .distinct()
    )
    s = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").cast("long").alias("nationkey"))
        .distinct()
    )
    return (
        c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionAll(c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey"))
        .unionAll(c.exceptAll(s).distinct().select(F.lit("except").alias("op"), "nationkey"))
    )


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@register(
    "q_scalar_strings",
    oracle="""
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 10) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       trim(concat('  ', p_name, '  ')) AS name_trimmed,
       regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
       replace(p_type, ' ', '_') AS type_snake,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
FROM part WHERE p_partkey < 300
""",
    tags=("scalar", "string"),
)
def q_scalar_strings(spark: SparkSession, sf: str) -> DataFrame:
    """String function family (§2B Scalar: string)."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_mon,
       CAST(day(o_orderdate) AS BIGINT) AS order_day,
       CAST(hour(o_orderdate) AS BIGINT) AS order_hour,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
         AS days_since_epoch_start,
       o_orderdate + INTERVAL 30 DAY AS due_date
FROM orders WHERE o_orderkey < 500
""",
    tags=("scalar", "datetime"),
)
def q_scalar_datetime(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time function family (§2B Scalar: date/time)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.hour("o_orderdate").cast("long").alias("order_hour"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).cast("long").alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@register(
    "q_scalar_math",
    oracle="""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       round(l_extendedprice, 1) AS price_round,
       abs(l_discount - 0.05) AS disc_dev,
       floor(l_quantity) AS qty_floor,
       ceil(l_quantity / 7) AS qty_ceil7,
       CAST(CAST(l_quantity AS BIGINT) % 5 AS BIGINT) AS qty_mod5,
       sqrt(l_extendedprice) AS price_sqrt
FROM lineitem WHERE l_orderkey < 200
""",
    tags=("scalar", "math"),
)
def q_scalar_math(spark: SparkSession, sf: str) -> DataFrame:
    """Math function family (§2B Scalar: math)."""
    l = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    return l.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round("l_extendedprice", 1).alias("price_round"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("double").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qty_ceil7"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
    )


@register(
    "q_scalar_json",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
FROM events WHERE event_id < 1000
""",
    tags=("scalar", "json"),
)
def q_scalar_json(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction (§2B Scalar: json)."""
    e = load_table(spark, sf, "events").filter(F.col("event_id") < 1000)
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


@register(
    "q_scalar_hash_binary",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       to_base64(encode(substr(text, 1, 12))) AS prefix_b64,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id < 100
""",
    tags=("scalar", "hash", "binary"),
)
def q_scalar_hash_binary(spark: SparkSession, sf: str) -> DataFrame:
    """Hash + binary function family (§2B Scalar: binary/hash)."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("prefix_b64"),
        F.octet_length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )


@register(
    "q_scalar_conditional",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_bucket,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
       CAST(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT) AS is_positive
FROM customer WHERE c_custkey < 400
""",
    tags=("scalar", "conditional"),
)
def q_scalar_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """CASE / COALESCE / NULLIF."""
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 400)
    return c.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_masked"),
        F.when(F.col("c_acctbal") >= 0, 1).otherwise(0).cast("long").alias(
            "is_positive"
        ),
    )


@register(
    "q_scalar_array_map",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents WHERE doc_id < 50
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       t[1] AS first_token,
       t[-1] AS last_token,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_unique,
       array_to_string(t[1:3], '-') AS first3
FROM toks
""",
    tags=("scalar", "array"),
)
def q_scalar_array_map(spark: SparkSession, sf: str) -> DataFrame:
    """Array ops: size / element_at / distinct / slice+join (§2B array/map)."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
    )


@register(
    "q_explode_wordcount",
    oracle="""
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
) WHERE length(word) >= 4
GROUP BY word
""",
    tags=("scalar", "explode", "aggregation"),
    bench=True,
)
def q_explode_wordcount(spark: SparkSession, sf: str) -> DataFrame:
    """explode + aggregate: corpus word count (the map/array workhorse)."""
    d = load_table(spark, sf, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    return (
        d.select(F.explode(toks).alias("word"))
        .filter(F.length("word") >= 4)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H classics) — the bench headliners
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q3",
    oracle="""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       {rev} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "aggregation", "topk"),
    bench=True,
)
def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + top-k."""
    c = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            "o_orderdate",
            "o_orderpriority",
        )
        .agg(
            dsum4(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_tpch_q5",
    oracle="""
SELECT n_name, {rev} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "aggregation"),
    bench=True,
)
def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: 6-way join."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum4(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q_tpch_q10",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_name, {rev} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "aggregation", "topk"),
    bench=True,
)
def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "c_acctbal",
            "n_name",
        )
        .agg(
            dsum4(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "q_sessionize_batch",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("window", "sessionize"),
    bench=True,
)
def q_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (30-min gap) via lag + running sum — the batch
    analog of streaming session windows."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    with_new = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us >= 1_800_000_000), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = with_new.withColumn("session_id", F.sum("is_new").over(w_run))
    return sessions.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_id").cast("long").alias("session_id"),
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_window_distribution",
    oracle="""
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
       s_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(ntile(10) OVER w AS BIGINT) AS decile
FROM supplier
WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
""",
    tags=("window", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile.

    Both are ratios of exact integer ranks ((r-1)/(n-1), r/n) — one
    deterministic double division, so values hash-match the oracle.
    """
    s = load_table(spark, sf, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
FROM lineitem GROUP BY l_returnflag
""",
    tags=("aggregation", "approx"),
)
def q_agg_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile sketch checked against its own rank-error bound.

    The raw Greenwald-Khanna quantile estimates are implementation-defined,
    so (like the HLL query) the output is the exact group count plus one
    ``pNN_ok`` boolean per requested percentile asserting the estimate's
    *rank* is within 5× the configured bound (accuracy 1000 → rank error
    ≤ n/1000, so the check is |rank(est) − p·n| ≤ 0.005·n + 1).  The
    oracle expects TRUE everywhere, so a broken sketch breaks the hash.
    Scalars only — driver-facing queries never emit array/map columns.
    Single-pass mergeable-quantile path for 100 TB columns; the rank
    check is one extra combinable agg over a broadcast of 3 group rows.
    """
    l = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    est = (
        l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)"
            ).alias("approx_p"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            F.element_at("approx_p", 1).alias("p25"),
            F.element_at("approx_p", 2).alias("p50"),
            F.element_at("approx_p", 3).alias("p75"),
        )
    )
    ranks = l.join(F.broadcast(est), "l_returnflag").groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        F.sum((F.col("l_extendedprice") <= F.col("p25")).cast("long")).alias("r25"),
        F.sum((F.col("l_extendedprice") <= F.col("p50")).cast("long")).alias("r50"),
        F.sum((F.col("l_extendedprice") <= F.col("p75")).cast("long")).alias("r75"),
    )

    def _ok(rank_col: str, frac: float):
        bound = F.col("n") * F.lit(0.005) + F.lit(1.0)
        return F.abs(F.col(rank_col) - F.col("n") * F.lit(frac)) <= bound

    return ranks.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        _ok("r25", 0.25).alias("p25_ok"),
        _ok("r50", 0.50).alias("p50_ok"),
        _ok("r75", 0.75).alias("p75_ok"),
    )


@register(
    "q_scalar_json_struct",
    oracle="""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       to_json(struct_pack(
         k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
         AS reserialized
FROM events WHERE event_id < 500
""",
    tags=("scalar", "json"),
)
def q_scalar_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Structured JSON round-trip: ``from_json`` with an explicit schema,
    then ``to_json`` of a struct (§2B Scalar: json, from_json/to_json).
    Both engines emit compact JSON, so even the serialized form matches.
    """
    e = load_table(spark, sf, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return e.select(
        F.col("event_id").cast("long").alias("event_id"),
        parsed["k"].alias("k"),
        F.to_json(F.struct(parsed["k"].alias("k"))).alias("reserialized"),
    )


def _zorder_oracle() -> str:
    from ..operators.zorder import zorder_key_sql

    key = zorder_key_sql(["s_suppkey", "s_nationkey"], bits=16)
    return f"""
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
       CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST({key} AS BIGINT) AS zkey
FROM supplier
"""


@register(
    "q_zorder_key",
    bench=True,
    oracle=_zorder_oracle(),
    tags=("layout", "zorder"),
)
def q_zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    """Morton (z-order) clustering key, value-checked cross-engine.

    The key that drives multi-dimensional file skipping
    (``operators/zorder.py``; Delta/Iceberg ``OPTIMIZE ZORDER BY``
    shape) is pure integer bit interleaving — the oracle computes the
    identical formula in SQL, so any drift in the shift/mask arithmetic
    breaks the hash.  The locality payoff (per-file bounding boxes
    shrinking in every interleaved dimension) is measured in
    ``tests/test_operators.py::test_zorder_write_locality``.
    """
    from ..operators.zorder import zorder_key

    s = load_table(spark, sf, "supplier")
    return s.select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        zorder_key(["s_suppkey", "s_nationkey"], bits=16).alias("zkey"),
    )


@register(
    "q_scalar_variant",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k,
       CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                       THEN NULL ELSE 1 END) AS BIGINT) AS n_missing_present
FROM events GROUP BY event_type
""",
    tags=("relational", "scalar", "variant"),
)
def q_scalar_variant(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): JSON
    parsed once into the binary variant encoding, fields extracted with
    ``variant_get`` path expressions, absent paths via ``try_variant_get``
    — the modern replacement for repeated ``get_json_object`` string
    re-parsing (one decode, typed access).  The oracle states the same
    extraction with DuckDB's JSON operators."""
    e = load_table(spark, sf, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    return v.groupBy("event_type").agg(
        F.sum(F.expr("variant_get(v, '$.k', 'long')")).cast("long").alias("sum_k"),
        F.max(F.expr("variant_get(v, '$.k', 'long')")).cast("long").alias("max_k"),
        F.count(F.expr("try_variant_get(v, '$.missing', 'string')"))
        .cast("long")
        .alias("n_missing_present"),
    )


@register(
    "q_udtf_tokenize",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(i - 1 AS BIGINT) AS idx,
       t[i] AS token
FROM (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents WHERE doc_id < 40
), unnest(generate_series(1, len(t))) AS u(i)
""",
    tags=("relational", "udtf"),
)
def q_udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``) applied
    with a LATERAL join in SQL — the row-generating UDF surface beside
    the scalar/aggregate/map forms.  The tokenizer itself is trivial on
    purpose (explode could do it); what's exercised is the UDTF
    registration, the SQL lateral correlation, and Arrow row emission —
    the escape hatch for generators that aren't array-expressible.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: long, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(re.findall("[a-z0-9]+", text.lower())):
                yield (i, tok)

    spark.udtf.register("engine_tokenize", Tokenize)
    load_table(spark, sf, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, t.idx, t.token
        FROM docs_udtf d, LATERAL engine_tokenize(d.text) t
        WHERE d.doc_id < 40
        """
    )


@register(
    "q_maparrow_doc_stats",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces
FROM documents WHERE doc_id < 60
""",
    tags=("relational", "udf", "arrow"),
)
def q_maparrow_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow`` kernel (§2B UDF surface): the zero-copy tier below
    pandas — RecordBatches in, RecordBatches out, no pandas conversion
    at all.  The computation is deliberately trivial (byte and space
    counts, both column-expressible); what's exercised is the Arrow
    batch boundary itself, the right tier for kernels that already
    speak Arrow (vectorized codecs, numpy views)."""
    import pyarrow as pa

    d = (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )

    def stats(batches):
        import numpy as np

        for batch in batches:
            texts = batch.column("text").to_pylist()
            enc = [t.encode("utf-8") for t in texts]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array([len(b) for b in enc], pa.int64()),
                    pa.array([b.count(b" ") for b in enc], pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_spaces"],
            )

    return d.mapInArrow(stats, "doc_id long, n_bytes long, n_spaces long")


@register(
    "q_join_asof_forward",
    oracle="""
WITH ranked AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         c.ts AS click_ts, c.event_id AS click_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY c.ts ASC, c.event_id DESC
         ) AS rn
  FROM events p
  JOIN events c ON c.user_id = p.user_id
               AND c.event_type = 'click' AND c.ts >= p.ts
               AND c.ts <= p.ts + INTERVAL 1 DAY
  WHERE p.event_type = 'purchase'
)
SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST(user_id AS BIGINT) AS user_id,
       purchase_ts, click_ts, CAST(click_id AS BIGINT) AS click_id
FROM ranked WHERE rn = 1
""",
    tags=("join", "asof"),
)
def q_join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join with a 1-day lookahead: the next click at-or-
    after each purchase (§2B) — "what did the user do next".  Same
    union-sort single-shuffle plan as the backward direction, time
    order reversed; the oracle restates it as the ascending ROW_NUMBER
    join with the same greatest-id tiebreak."""
    e = load_table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="purchase_ts",
        right_time="ts",
        right_cols=["click_id"],
        tiebreak_cols=["ts", "click_id"],
        tolerance=F.expr("INTERVAL 1 DAY"),
        direction="forward",
    )
    return joined.filter(F.col("ts").isNotNull()).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("purchase_ts"),
        F.col("ts").alias("click_ts"),
        F.col("click_id").cast("long").alias("click_id"),
    )


@register(
    "q_agg_group_samples",
    oracle="""
WITH ranked AS (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5('sample|' || CAST(event_id AS VARCHAR)), event_id
         ) AS rk
  FROM events
)
SELECT event_type, CAST(rk AS BIGINT) AS sample_rank,
       CAST(event_id AS BIGINT) AS event_id
FROM ranked WHERE rk <= 5
""",
    tags=("relational", "sampling"),
)
def q_agg_group_samples(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic K-per-group sampling (§2B): five hash-chosen
    example rows per event type — unbiased, rerun-stable, and bounded.
    The window + rank-filter shape compiles to ``WindowGroupLimit``
    (partial per-task top-k before the shuffle), NOT a
    ``collect_list``-then-slice aggregate whose per-group state would
    be unbounded at scale."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "events").select("event_type", "event_id")
    key = F.md5(
        F.concat(F.lit("sample|"), F.col("event_id").cast("string")).cast(
            "binary"
        )
    )
    w = Window.partitionBy("event_type").orderBy(key, F.col("event_id"))
    return (
        e.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
        .select(
            "event_type",
            F.col("sample_rank").cast("long").alias("sample_rank"),
            F.col("event_id").cast("long").alias("event_id"),
        )
    )
