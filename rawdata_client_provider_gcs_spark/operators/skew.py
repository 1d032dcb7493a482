"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (on by default, ``session.py``) handles most
skew at runtime by splitting oversized shuffle partitions.  Salting is
the explicit fallback for the cases AQE can't fix — a *single* join key
so hot that one key's rows exceed an executor (AQE can split a partition,
not a key-group that must meet a single build row), or skewed
``groupBy`` keys feeding a non-combinable aggregate.

``salted_join``: replicate each small-side row ``salt`` times and give
every big-side row a deterministic salt in ``[0, salt)``, so one hot key
fans out across ``salt`` reducers instead of one.  Cost: small side
× salt (bounded — the small side is small by contract); big side moves
once either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic pseudo-salt: hash of the row's own columns modulo the salt
#: count spreads a hot key's rows evenly without an RNG (reproducible runs).


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key fan-out.

    ``salt_by`` names big-side columns whose hash spreads rows across
    salts (default: all non-key columns); the small side is exploded
    ``salt`` times.  Result equals ``big.join(small, on, how)`` exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    spread_cols = salt_by or [c for c in big.columns if c != on]
    if not spread_cols:
        raise ValueError("need at least one non-key column to derive a salt")
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*spread_cols), F.lit(salt)).cast("int")
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, value_col: str, salt: int = 16
) -> DataFrame:
    """COUNT(DISTINCT value) per group via two shuffles of bounded size.

    A plain ``groupBy(k).agg(countDistinct(v))`` must co-locate every row
    of a hot key on one reducer.  Stage 1 dedups on (k, salt(v), v) —
    distinct is combinable, so each reducer holds one key *shard*; stage 2
    sums shard cardinalities.  Equals the exact distinct count; NULL
    values are excluded to match SQL ``COUNT(DISTINCT v)`` semantics.
    """
    stage1 = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            F.pmod(F.xxhash64(value_col), F.lit(salt)).alias("__salt"),
            F.col(value_col),
        )
        .distinct()
        .groupBy(group_col, "__salt")
        .agg(F.count(F.lit(1)).alias("__part"))
    )
    return stage1.groupBy(group_col).agg(
        F.sum("__part").cast("long").alias("n_distinct")
    )
