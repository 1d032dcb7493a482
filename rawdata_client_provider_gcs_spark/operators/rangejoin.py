"""Binned interval (range) join — the scale path for pure range predicates.

A join whose only predicate is a range containment (``start <= point <=
end``, no equi key) is executed by Spark as a broadcast-nested-loop or
cartesian product — O(|P|·|I|) work, the classic 100 TB killer.  The
standard rewrite (range-join binning, as in Databricks' RANGE_JOIN hint
and the interval-join literature) makes it an equi-join:

- each interval explodes to the bins ``[floor(start/w) .. floor(end/w)]``
  it covers (fan-out ≈ interval_length/w + 1);
- each point maps to its single bin ``floor(point/w)``;
- the equi-join on bin meets every qualifying pair (a point's bin is
  always among its containing intervals' bins) exactly once — the point
  has one bin, so no dedup pass is needed — and the exact predicate
  re-filters bin co-residents.

Pick ``bin_width`` near the typical interval length: too small multiplies
interval copies, too large multiplies false bin co-residents; both stay
linear, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point: Column,
    start: Column,
    end: Column,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them via bin equi-join.

    ``point``/``start``/``end`` are long-valued expressions over the
    respective frames (same unit, e.g. epoch seconds).  Column names must
    not collide between the two frames (alias beforehand).  ``how`` may be
    ``inner`` or ``left`` (points kept without a containing interval).
    """
    p = points.withColumn("_bin", F.floor(point / F.lit(bin_width)))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(start / F.lit(bin_width)), F.floor(end / F.lit(bin_width))
            )
        ),
    )
    contained = (point >= start) & (point <= end)
    if how == "inner":
        return p.join(i, "_bin").filter(contained).drop("_bin")
    if how == "left":
        return p.join(i, (p["_bin"] == i["_bin"]) & contained, "left").drop("_bin")
    raise ValueError(f"unsupported how: {how}")
