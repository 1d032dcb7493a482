"""Behavioral-analytics queries: funnels and cohort retention.

The event-stream analyses a consumer of the reference's topics runs
downstream (events = the payload the log transports); both are
deterministic, integer-valued, and oracle-stated in full.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import funnel
from ..tables import load_table
from .catalog import register


@register(
    "q_events_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 2 DAY
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL 2 DAY
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
)
""",
    tags=("analytics", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """First-touch funnel view → click → purchase, each step within 2
    days of the previous (§2C behavioral analytics).  One combinable
    conditional-min aggregate per step, user-key equi-joins between —
    see :mod:`...operators.funnel` for the 100 TB shape."""
    e = load_table(spark, sf, "events")
    return funnel.funnel_counts(
        e, ["view", "click", "purchase"], within="2 DAY"
    )


@register(
    "q_events_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, strftime(CAST(date_trunc('week', MIN(ts)) AS DATE), '%Y-%m-%d') AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(datediff('week', CAST(f.cohort_week AS DATE),
                       CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
           AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY cohort_week, week_offset
""",
    tags=("analytics", "cohort"),
)
def q_events_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention matrix (§2C behavioral analytics): users
    cohorted by first-event week; a cell counts the cohort's distinct
    users active in week ``cohort + offset``.  Two combinable aggregates
    plus one user-key join, all JVM-side."""
    e = load_table(spark, sf, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_format(F.date_trunc("week", F.min("ts")), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")),
                    F.to_date("cohort_week"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "q_events_daily_anomaly",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), stats AS (
  -- HUGEINT throughout: dev^2 and n*sxx overflow 64 bits at large
  -- daily counts, and an overflow here would silently diverge from the
  -- engine (which computes the same test in DECIMAL(38,0))
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM daily GROUP BY event_type
)
SELECT d.event_type,
       strftime(d.day, '%Y-%m-%d') AS day,
       d.x AS n_events,
       CAST(s.n * d.x - s.sx AS BIGINT) AS dev_num,
       ((s.n * d.x - s.sx) * (s.n * d.x - s.sx))
         > 4 * (s.n * s.sxx - s.sx * s.sx) AS is_anomaly
FROM daily d JOIN stats s USING (event_type)
WHERE ((s.n * d.x - s.sx) * (s.n * d.x - s.sx))
      > 4 * (s.n * s.sxx - s.sx * s.sx)
""",
    tags=("analytics", "anomaly"),
)
def q_events_daily_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Traffic-spike detection with INTEGER-EXACT statistics (§2C
    behavioral analytics): a day is anomalous when its event count
    deviates from the type's mean by more than two standard deviations
    — but stated entirely in integers, ``(n·x − Σx)² > 4·(n·Σx² −
    (Σx)²)``, which is ``(x − μ)² > 4σ²`` scaled by ``n²``.  No float
    aggregation anywhere, so the result hash-matches an independent
    engine exactly; the shape is two combinable aggregates and one
    broadcast-size join (one stats row per event type)."""
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    dec = "decimal(38,0)"
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    # DECIMAL(38,0) end to end: dev**2 and n*sxx overflow BIGINT once
    # daily counts reach ~1e9 over a year of days — the exactness claim
    # must hold at the scale the plan targets, not just at toy counts
    dev = F.col("n") * F.col("x").cast(dec) - F.col("sx")
    var_n2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        j.withColumn("dev_num", dev.cast("long"))
        .withColumn("is_anomaly", (dev * dev) > 4 * var_n2)
        .filter(F.col("is_anomaly"))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("x").cast("long").alias("n_events"),
            "dev_num",
            "is_anomaly",
        )
    )


@register(
    "q_events_value_drift",
    oracle="""
WITH spans AS (
  SELECT value,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
              THEN 'before' ELSE 'after' END AS span
  FROM events
), bounds AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM spans
), binned AS (
  SELECT span,
         CAST(LEAST(CAST(FLOOR(((value - lo) * 10) / (hi - lo)) AS BIGINT), 9)
              AS BIGINT) AS bin
  FROM spans, bounds
), counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN span = 'before' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_before,
         CAST(SUM(CASE WHEN span = 'after' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_after
  FROM binned GROUP BY bin
), totals AS (
  SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM counts
)
SELECT bin, n_before, n_after,
       (CAST(n_after AS DOUBLE) / ta - CAST(n_before AS DOUBLE) / tb)
         * LN((CAST(n_after AS DOUBLE) / ta)
              / (CAST(n_before AS DOUBLE) / tb)) AS psi_contribution
FROM counts, totals
WHERE n_before > 0 AND n_after > 0
""",
    tags=("analytics", "drift"),
)
def q_events_value_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution drift between two time spans (§2C behavioral
    analytics): the population-stability-index decomposition of the
    ``value`` column, before vs after a cutoff, over 10 equal-width
    bins.  Per-bin counts are integers and each PSI contribution is a
    single scalar expression on that row — no order-dependent float
    aggregation, so the whole drift report hash-matches the oracle.
    Bins empty on either side are omitted (the standard PSI practice;
    their log-ratio is undefined).
    The production use pairs this with time-travel reads: the same
    query over ``dataframe(to_ts_ms=T1)`` vs ``(T1, T2]`` delta spans
    monitors a topic's payload drift release over release."""
    e = load_table(spark, sf, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    spans = e.select(
        "value",
        F.when(F.col("ts") < cutoff, "before").otherwise("after").alias("span"),
    )
    bounds = spans.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = spans.crossJoin(F.broadcast(bounds)).select(
        "span",
        F.least(
            (
                (F.col("value") - F.col("lo"))
                * 10
                / (F.col("hi") - F.col("lo"))
            ).cast("long"),
            F.lit(9),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("span") == "before", 1).otherwise(0))
        .cast("long")
        .alias("n_before"),
        F.sum(F.when(F.col("span") == "after", 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
    )
    totals = counts.agg(
        F.sum("n_before").alias("tb"), F.sum("n_after").alias("ta")
    )
    pb = F.col("n_before").cast("double") / F.col("tb")
    pa = F.col("n_after").cast("double") / F.col("ta")
    return counts.crossJoin(F.broadcast(totals)).filter(
        (F.col("n_before") > 0) & (F.col("n_after") > 0)
    ).select(
        "bin",
        "n_before",
        "n_after",
        ((pa - pb) * F.log(pa / pb)).alias("psi_contribution"),
    )
