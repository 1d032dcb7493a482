"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB, file- and row-group-level min/max pruning is the difference
between scanning terabytes and scanning gigabytes — but a linear sort
only localizes ONE column.  Interleaving the bits of several columns
into a Morton key and range-partition-sorting by it gives every file a
tight bounding box in ALL interleaved dimensions, so predicates on any
subset of them prune (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` shape,
built from plain column expressions — no engine extension needed).

Everything here is deterministic integer bit arithmetic, expressible
identically in any engine — the catalog query's DuckDB oracle runs the
same formula, so the key computation is value-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Columns must already be non-negative integers (use
    :func:`rank_scale` for arbitrary/skewed/non-numeric columns).
    Bit ``i`` of column ``c`` lands at position ``i*n + c`` — one
    constant-folded expression tree of ``bits × n`` shift/mask terms,
    fully inside whole-stage codegen.
    """
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a 64-bit key")
    key = F.lit(0).cast("long")
    for c_idx, col in enumerate(cols):
        c = F.col(col) if isinstance(col, str) else col
        c = c.cast("long")
        for i in range(bits):
            key = key + (
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * n + c_idx,
                )
            )
    return key


def rank_scale(df: DataFrame, col: str, bits: int = 16) -> DataFrame:
    """Add ``<col>__scaled``: the column's rank scaled to ``[0, 2^bits)``.

    Rank-based scaling (percent_rank over a single global sort) makes
    z-ordering robust to skew and arbitrary value ranges; for a
    production-scale corpus, substitute a sampled quantile table
    (``approxQuantile`` → broadcast range lookup) to avoid the global
    window — same key semantics, no single-partition sort.
    """
    from pyspark.sql import Window

    w = Window.orderBy(col)
    return df.withColumn(
        f"{col}__scaled",
        (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("long"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 16,
    max_records_per_file: int | None = None,
    scale: bool = True,
) -> None:
    """Write ``df`` parquet clustered by the Morton key of ``cols``.

    ``repartitionByRange`` on the key gives each output file a
    contiguous z-range — a tight min/max box in every interleaved
    dimension — then an in-partition sort tightens row groups too.

    ``scale=True`` (default) min-max-scales every column to the full
    ``bits`` width first (one cheap stats aggregate).  This is load-
    bearing, not cosmetic: interleaving raw values whose ranges differ
    (say a 4-bit id against a 20-bit key) parks the small dimension in
    the key's LOW bits, so every contiguous z-range cycles through all
    of its values and nothing prunes on it.  Aligning the MSBs is what
    makes the curve fair to every dimension.  Pass ``scale=False``
    only when the columns are already commensurate ``[0, 2^bits)``
    integers.
    """
    if scale:
        stats = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{i}") for i, c in enumerate(cols)],
            *[F.max(c).cast("double").alias(f"mx_{i}") for i, c in enumerate(cols)],
        ).first()
        top = float((1 << bits) - 1)
        key_cols = []
        for i, c in enumerate(cols):
            lo, hi = stats[f"mn_{i}"], stats[f"mx_{i}"]
            span = (hi - lo) or 1.0
            key_cols.append(
                ((F.col(c).cast("double") - F.lit(lo)) * F.lit(top / span))
                .cast("long")
            )
    else:
        key_cols = list(cols)
    keyed = df.withColumn("__zkey", zorder_key(key_cols, bits=bits))
    writer = (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton formula as portable SQL (oracle parity)."""
    n = len(cols)
    terms = []
    for c_idx, col in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(((CAST({col} AS BIGINT) >> {i}) & 1) << {i * n + c_idx})"
            )
    return " + ".join(terms)
