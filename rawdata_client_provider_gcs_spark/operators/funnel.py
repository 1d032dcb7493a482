"""Ordered-step funnel progression over an event stream.

The product-analytics staple: of the users who did step 1, how many went
on to do step 2 *after* it, then step 3 after that — optionally within a
horizon of the previous step.  First-touch semantics: each step anchors
on the EARLIEST qualifying occurrence, the standard funnel definition
(and the one that is deterministic and oracle-expressible).

100 TB shape: one conditional min-aggregate per step over the events
scan — every aggregate is combinable (map-side partial min), grouped on
the user key, and consecutive steps join user-to-user (equi-join on the
grouping key, AQE-splittable).  Step count is small and fixed, so the
plan is ``len(steps)`` aggregates + ``len(steps) - 1`` joins, not a
per-user sort or a Python pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Per-user first-touch step timestamps: ``(user, t1, t2, ..., tN)``.

    ``t1`` is the user's earliest ``steps[0]`` event; ``t(k)`` the
    earliest ``steps[k-1]`` event strictly after ``t(k-1)`` (and within
    ``t(k-1) + within`` when a horizon is given, e.g. ``"1 hour"``).
    Users missing a step carry NULL from that step on.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev_t = f"t{k - 1}"
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_ts"))
            .join(cur.select("user", prev_t), "user")
            .filter(F.col("_ts") > F.col(prev_t))
        )
        if within is not None:
            nxt = nxt.filter(
                F.col("_ts") <= F.col(prev_t) + F.expr(f"INTERVAL {within}")
            )
        nxt = nxt.groupBy("user").agg(F.min("_ts").alias(f"t{k}"))
        cur = cur.join(nxt, "user", "left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """The funnel report: ``(step_idx, step, n_users)`` with n_users
    monotonically non-increasing down the funnel."""
    per_user = funnel_steps(events, steps, user_col, type_col, ts_col, within)
    aggs = [
        F.count(F.col(f"t{k}")).cast("long").alias(f"n{k}")
        for k in range(1, len(steps) + 1)
    ]
    row = per_user.agg(*aggs)
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.col(f"n{k}").alias("n_users"),
                    )
                    for k, s in enumerate(steps, start=1)
                ]
            )
        ).alias("r")
    ).select("r.step_idx", "r.step", "r.n_users")
