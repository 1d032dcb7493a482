"""Additional TPC-H query shapes adapted to the driver's pared-down star
schema (no partsupp table, no commit/receipt dates — joins route through
lineitem where TPC-H uses partsupp).

Each covers a distinct plan shape not exercised elsewhere: min-per-group
join-back (Q2), dual-dimension join with role-separated copies of one
table (Q7), derived-profit multi-join (Q9), HAVING against a scalar
aggregate of the same tree (Q11), equality join on an aggregated maximum
(Q15), NOT-IN exclusion + multi-key count-distinct (Q16).

Float discipline per catalog.py (fixed-point sums; deterministic scalar
double ops on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .catalog import register
from .relational import dsum2, dsum4, o_sum2, o_sum4


@register(
    "q_tpch_q2_mincost",
    oracle="""
WITH brand_suppliers AS (
  SELECT DISTINCT p.p_brand, s.s_suppkey, s.s_name, s.s_acctbal
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
), min_bal AS (
  SELECT p_brand, MIN(s_acctbal) AS min_bal
  FROM brand_suppliers GROUP BY p_brand
)
SELECT b.p_brand, CAST(b.s_suppkey AS BIGINT) AS s_suppkey, b.s_name,
       b.s_acctbal
FROM brand_suppliers b JOIN min_bal m
  ON b.p_brand = m.p_brand AND b.s_acctbal = m.min_bal
""",
    tags=("join", "subquery", "aggregation"),
)
def q_tpch_q2_mincost(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum, joined back to recover the
    full row(s) achieving it (min s_acctbal supplier per brand)."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    s = load_table(spark, sf, "supplier")
    bs = (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .select("p_brand", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    mb = bs.groupBy(F.col("p_brand").alias("mb_brand")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        bs.join(
            mb,
            (bs.p_brand == mb.mb_brand) & (bs.s_acctbal == mb.min_bal),
        )
        .select(
            "p_brand",
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "s_acctbal",
        )
    )


@register(
    "q_tpch_q7_trade",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       {rev} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
""".format(rev=o_sum4("l.l_extendedprice * (1 - l.l_discount)")),
    tags=("join", "aggregation"),
)
def q_tpch_q7_trade(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: one dimension table (nation) joined twice in different
    roles — supplier nation vs customer nation — plus year extraction."""
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19"))
        | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    )
    return (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q_tpch_q9_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       {profit} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'PROMO'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
""".format(
        profit=o_sum4(
            "l.l_extendedprice * (1 - l.l_discount)"
            " - 0.6 * p.p_retailprice * l.l_quantity"
        )
    ),
    tags=("join", "aggregation"),
    bench=True,
)
def q_tpch_q9_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit = revenue minus derived cost (0.6 ×
    retailprice standing in for ps_supplycost) across a 5-table join."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    amount = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum4(amount).alias("profit"))
    )


@register(
    "q_tpch_q11_threshold",
    oracle="""
WITH nation_value AS (
  SELECT s_nationkey, {val} AS value
  FROM supplier GROUP BY s_nationkey
)
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, value
FROM nation_value
WHERE value > (SELECT {tot} * 0.1 FROM supplier)
""".format(val=o_sum2("s_acctbal"), tot=o_sum2("s_acctbal")),
    tags=("aggregation", "subquery"),
)
def q_tpch_q11_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: group value compared against a scalar fraction of
    the same aggregation tree (HAVING vs uncorrelated scalar subquery)."""
    s = load_table(spark, sf, "supplier")
    per_nation = s.groupBy("s_nationkey").agg(dsum2(F.col("s_acctbal")).alias("value"))
    total = s.agg((dsum2(F.col("s_acctbal")) * F.lit(0.1)).alias("threshold"))
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("s_nationkey").cast("long").alias("s_nationkey"), "value")
    )


@register(
    "q_tpch_q15_topsupp",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey, {rev} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""".format(rev=o_sum4("l_extendedprice * (1 - l_discount)")),
    tags=("join", "subquery", "aggregation"),
)
def q_tpch_q15_topsupp(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: equality join against the maximum of an aggregated
    derived table (safe on doubles: both engines derive the identical
    fixed-point value, so max and equality agree bit-for-bit)."""
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue",
        )
    )


@register(
    "q_tpch_q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("join", "aggregation", "subquery", "distinct"),
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN exclusion (anti join on a filtered dim)
    plus multi-key count-distinct."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    bad = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q4_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("join", "subquery", "semi"),
)
def q_tpch_q4_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4: priority counts over a correlated EXISTS — a semi join
    whose condition spans both sides (l_shipdate > o_orderdate)."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@register(
    "q_tpch_q8_share",
    oracle="""
WITH rev AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         {nat} AS nation_rev,
         {tot} AS total_rev
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY EXTRACT(year FROM o.o_orderdate)
)
SELECT o_year, nation_rev, total_rev,
       nation_rev / total_rev AS mkt_share
FROM rev
""".format(
        nat=o_sum4(
            "CASE WHEN n.n_name = 'NATION_9' "
            "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
        ),
        tot=o_sum4("l.l_extendedprice * (1 - l.l_discount)"),
    ),
    tags=("join", "aggregation"),
)
def q_tpch_q8_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: market share — a conditional-sum / total-sum ratio
    per year.  Both sums are fixed-point (order-independent), so the
    double ratio is bit-identical across engines."""
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    o = load_table(spark, sf, "orders")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nat_rev = F.when(F.col("n_name") == "NATION_9", rev).otherwise(F.lit(0.0))
    out = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum4(nat_rev).alias("nation_rev"),
            dsum4(rev).alias("total_rev"),
        )
    )
    return out.withColumn(
        "mkt_share", F.col("nation_rev") / F.col("total_rev")
    )


@register(
    "q_tpch_q13_custdist",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
    tags=("join", "aggregation"),
)
def q_tpch_q13_custdist(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: order-count distribution — left outer join with an
    extra join-side predicate, then a double aggregation."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q_tpch_q21_waiting",
    oracle="""
WITH per_order AS (
  SELECT l.l_orderkey,
         COUNT(DISTINCT l.l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
                                  + INTERVAL 60 DAY
                             THEN l.l_suppkey END) AS n_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey
), culprit AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN per_order p ON p.l_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    AND p.n_supp > 1 AND p.n_late = 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM culprit c JOIN supplier s ON s.s_suppkey = c.l_suppkey
GROUP BY s.s_name
""",
    tags=("join", "subquery", "anti"),
    bench=True,
)
def q_tpch_q21_waiting(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (waiting suppliers): the sole late supplier in
    multi-supplier finished orders.  The classic EXISTS / NOT EXISTS
    double-correlation is rewritten as one per-order count-distinct pass
    (n_supp > 1 AND n_late = 1) — same semantics, no repeated correlated
    scans of lineitem."""
    from pyspark.sql import Window

    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    # per-order distinct counts as window collect_set sizes: lineitem⋈orders
    # is shuffled ONCE on l_orderkey instead of [count-distinct Expand agg +
    # join back onto the same rows] (guide §2.4: two operations keyed the
    # same way share one exchange — A/B median 1.29 s → 0.91 s; the sets
    # are bounded by suppliers-per-order, single digits, so the window
    # buffers stay trivially small at any corpus scale)
    w = Window.partitionBy("l_orderkey")
    culprit = (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprit.join(s, s.s_suppkey == culprit.l_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "q_tpch_q20_excess",
    oracle="""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS total_qty
  FROM per_ps GROUP BY l_partkey
)
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominant_parts,
       CAST(SUM(ps.supp_qty) AS BIGINT) AS dominant_qty
FROM per_ps ps
JOIN per_p p ON p.l_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE CAST(ps.supp_qty AS DOUBLE) > 0.2 * CAST(p.total_qty AS DOUBLE)
GROUP BY s.s_name
""",
    tags=("join", "aggregation", "subquery"),
)
def q_tpch_q20_excess(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (excess share): suppliers shipping > 20 % of a
    part's total volume — a two-level aggregate compared within the same
    tree, then joined back to the dimension.  Quantities are integral, so
    the LONG sums and the share comparison are exact on both engines."""
    l = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    per_ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("supp_qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").cast("long").alias("total_qty")
    )
    dominant = per_ps.join(per_p, "l_partkey").filter(
        F.col("supp_qty").cast("double")
        > F.lit(0.2) * F.col("total_qty").cast("double")
    )
    return (
        dominant.join(s, s.s_suppkey == dominant.l_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dominant_parts"),
            F.sum("supp_qty").cast("long").alias("dominant_qty"),
        )
    )


def _pagerank_oracle(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled-CTE PageRank oracle over the customer→supplier graph.

    Generated, not hand-typed: each iteration appends a dangling-mass
    CTE and a rank CTE stating exactly the recurrence the Spark loop in
    ``operators/graph.py`` computes."""
    sql = """WITH edges AS (
  SELECT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
  )
), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
norm AS (SELECT e.src, e.dst, e.w / o.ow AS p FROM edges e JOIN outw o USING (src)),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    for k in range(iters):
        sql += f""",
dang{k} AS (
  SELECT COALESCE(SUM(pr), 0) AS dang FROM r{k}
  WHERE node NOT IN (SELECT src FROM outw)
),
r{k + 1} AS (
  SELECT nd.node,
         (1 - {d}) / (SELECT n FROM nn)
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT dang FROM dang{k}) / (SELECT n FROM nn)) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT nm.dst AS node, SUM(nm.p * r.pr) AS contrib
    FROM norm nm JOIN r{k} r ON r.node = nm.src GROUP BY nm.dst
  ) c USING (node)
)"""
    sql += f"""
SELECT CAST(node AS BIGINT) AS node, pr
FROM r{iters} ORDER BY pr DESC, node LIMIT 50"""
    return sql


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative"),
    bench=True,
)
def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted PageRank over the bipartite customer→supplier order-flow
    graph (edge weight = lineitems shipped), 5 damped iterations with
    dangling-mass redistribution — every supplier is a sink, so the
    dangling term carries all recirculation and skipping it would leak
    rank.  The iterative DataFrame loop (``operators/graph.py``) matches
    the oracle's unrolled CTE recurrence to float equality; top-50 nodes
    by rank with deterministic tie-break."""
    from ..operators import graph

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = graph.pagerank(edges, iters=5, damping=0.85, weight_col="w")
    return (
        ranks.orderBy(F.desc("pr"), F.asc("node"))
        .limit(50)
        .select(F.col("node").cast("long").alias("node"), F.col("pr"))
    )


@register(
    "q_tpch_q17_smallqty",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       {o_sum2('l.l_extendedprice')} / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
  AND l.l_quantity < a.half_avg_qty
GROUP BY p.p_brand
""",
    tags=("tpch", "subquery"),
)
def q_tpch_q17_smallqty(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: per-brand
    yearly revenue from lineitems under half the part's average
    quantity (spec uses 0.2·avg and one brand/container; the driver's
    uniform quantities need 0.5 to keep the predicate selective-but-
    nonempty, and grouping by brand makes the check multi-row).

    Plan shape this pins: correlated scalar aggregate decorrelated into
    a per-key aggregate joined back — the aggregate and the probe scan
    the SAME fact table, the classic self-join-through-agg Q17 plan.
    The per-part average is a combinable agg; part is broadcast.
    """
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#13")
    )
    part_avg = l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy("p_brand")
        .agg(
            (dsum2(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q_tpch_q22_global_sales",
    oracle=f"""
WITH eligible AS (
  SELECT c_nationkey % 10 AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                     WHERE c_acctbal > 0)
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       {o_sum2('c_acctbal')} AS totacctbal
FROM eligible c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY cntrycode
""",
    tags=("tpch", "subquery", "anti-join"),
)
def q_tpch_q22_global_sales(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: well-funded
    customers (balance above the positive-balance average) with no
    URGENT order, counted per country code (the schema has no phone
    column, so ``c_nationkey % 10`` stands in for the phone prefix;
    spec's "no orders at all" is empty on this data — every customer
    orders — so the anti-join keys on urgent orders instead).

    Plan shape this pins: uncorrelated scalar subquery (broadcast
    1-row aggregate) feeding a filter, then a LEFT ANTI join against
    the fact table, then a combinable group-by — Q22's
    exists-free decorrelated plan.
    """
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    eligible = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select(
            (F.col("c_nationkey") % 10).alias("cntrycode"),
            "c_custkey",
            "c_acctbal",
        )
    )
    return (
        eligible.join(
            urgent, eligible.c_custkey == urgent.o_custkey, "left_anti"
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum2(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
