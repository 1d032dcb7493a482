"""Iterative graph analytics over DataFrame edge lists (PageRank).

Near-dup dedup already needs one graph algorithm (connected components,
``operators/dedup.py``); PageRank is the second canonical iterative
workload — ranking entities by weighted link structure (suppliers by
order flow, documents by reference graphs, hosts by crawl links).  Same
execution discipline as the components loop: each iteration is a fixed
set of joins + combinable aggregations, ``localCheckpoint`` truncates
lineage so the plan stays O(1) per round, and nothing corpus-sized ever
reaches the driver (N and the dangling mass travel as broadcast 1-row
aggregates).

The implementation is textbook damped PageRank with proper
dangling-node redistribution (their rank mass is spread uniformly every
iteration) — important for bipartite graphs like customer→supplier,
where EVERY sink node is dangling and skipping the term would leak
rank mass.  Fixed iteration count keeps results exactly reproducible
and lets the DuckDB oracle state the same computation as unrolled CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank; returns ``(node, pr)`` after ``iters`` rounds.

    rank_{k+1}(v) = (1−d)/N + d·(Σ_{u→v} rank_k(u)·w(u,v)/out(u)
                                 + dangling_k/N)

    100 TB shape: the per-iteration work is one equi-join of the
    normalized edge list with the rank vector plus a combinable sum by
    destination — both shuffle on node id and nothing else.  N and the
    dangling mass are broadcast 1-row aggregates (no ``collect``);
    ``localCheckpoint`` per round truncates lineage exactly like the
    connected-components loop.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        w.alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()  # loop-invariant: materialize once, not per round
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    norm = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint()  # ditto — else every iteration replays the
        # upstream edge derivation (join/aggregate over the raw tables)
        # NOTE (measured r8): do NOT pre-repartition norm on src here —
        # the rank vector is broadcast-joined against the checkpointed
        # edges (AQE picks BHJ), so the edges never shuffle per round
        # as-is; a forced hash partition ADDS a shuffle and cost 3.75 →
        # 4.55 s at sf0.1.  At rank-vector sizes past broadcastability
        # the SMJ path would co-locate on src anyway via AQE.
    )
    n_df = nodes.agg(F.count("*").cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    dangling = nodes.join(
        outw.select(F.col("src").alias("node")), "node", "left_anti"
    ).localCheckpoint()
    for _ in range(iters):
        dang = (
            ranks.join(dangling, "node", "left_semi")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang"))
        )
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks
