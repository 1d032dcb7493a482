"""As-of join: for each left row, the latest right row at-or-before it.

The reference's nearest analog is the position cursor — an as-of lookup of
one position within a time window (AvroRawdataClient.java:84-115).  This
operator generalizes it to a distributed relational join.

Scale design: the naive plan (equi-join on key + time filter + row_number)
explodes to |L|×|R| intermediate rows per key before pruning.  Instead we
use the **union-sort** formulation: one shuffle on the key, one sort by
(time, side), and a running ``last(..., ignorenulls)`` window — O(|L|+|R|)
rows end to end, skew-safe under AQE.  This is the standard streaming/
point-in-time-correct join shape (same idea as Flink temporal joins and
pandas ``merge_asof``), expressed entirely in DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance: Column | int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join, ``direction`` backward or forward (inclusive).

    Backward (default): for every left row, attach the right row with
    the greatest ``right_time <= left_time`` sharing the join key.
    Forward: the SMALLEST ``right_time >= left_time`` — the
    next-event lookup (pandas ``merge_asof(direction='forward')``).
    Both directions are the same union-sort plan with the sort order
    reversed; ties on time are broken by ``tiebreak_cols`` (greatest
    wins) for determinism.  Left rows with no match keep NULLs
    (left-outer semantics).

    ``tolerance`` bounds the lookback/lookahead (pandas ``merge_asof``
    semantics): a match farther than ``tolerance`` from ``left_time``
    is discarded (NULLs).  Pass a number for numeric time columns or an
    INTERVAL Column for timestamps.  Applied post-window, so the plan
    stays O(|L|+|R|) — and in a streaming formulation the same bound is
    what lets state expire.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    tiebreak_cols = tiebreak_cols or []

    carried = [right_time] + [c for c in right_cols if c != right_time]
    out_names = {c: (c if c not in left.columns else c + suffix) for c in carried}

    # carried right columns ride in ONE struct so `last()` always returns a
    # consistent row (per-column last() could mix rows when values are null)
    r_payload = F.struct(*[F.col(c).alias(c) for c in carried])
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        r_payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    null_payload = F.lit(None).cast(
        r.schema["__r"].dataType.simpleString()
    )
    lf = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        null_payload.alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(lf)

    # forward = the same running-last scan over time reversed: sort
    # descending and the most recent non-null right payload is the
    # nearest right_time >= left_time
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    order: list[Column] = [t_order, F.col("__side")]
    # among right rows at the same instant, the greatest tiebreak must be
    # the one `last()` sees most recently
    order += [F.col("__r")[c].asc_nulls_first() for c in tiebreak_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        in_bound = (
            F.col("__match")[right_time] >= F.col("__t") - tol
            if direction == "backward"
            else F.col("__match")[right_time] <= F.col("__t") + tol
        )
        matched = matched.withColumn(
            "__match", F.when(in_bound, F.col("__match"))
        )
    result = matched.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(out_names[c]) for c in carried],
    )
    return result
