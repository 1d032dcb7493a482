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
    destination — both shuffle on node id and nothing else.  N is one
    bounded scalar count (an integer, size-independent); the dangling
    mass stays a per-round broadcast 1-row aggregate; nothing
    corpus-sized reaches the driver.  ``localCheckpoint`` per round
    truncates lineage exactly like the connected-components loop.
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
    ).localCheckpoint()
    # ^ the caller's edge derivation (often a join+aggregate over the
    # raw tables) is consumed FOUR times below (nodes, outw, norm,
    # dangling flags); without materializing it here each consumer
    # replayed the whole upstream subtree — measured 2.36 s of the
    # 3.16 s query was this setup replay at sf0.1 (guide §5: reuse →
    # persist; MEMORY_AND_DISK spills, nothing reaches the driver)
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
    # N is one bounded scalar (a node count) — computing it once on the
    # driver replaces the broadcast-exchange job that every round's TWO
    # crossJoin(broadcast(n_df)) instances used to pay (guide §1.2:
    # fewer jobs per round; measured 3.15 s → see OPTIMIZATION_r17.md).
    # It is not a data collect: one integer, independent of corpus size.
    n = float(nodes.count())
    # dangling-ness is loop-invariant — carry it as a flag column in the
    # rank vector instead of a per-round left_semi join against a
    # dangling-node table (one join less per round, identical mass)
    nodes_f = nodes.join(
        outw.select(F.col("src").alias("node")).withColumn(
            "has_out", F.lit(True)
        ),
        "node",
        "left",
    ).select(
        "node", F.coalesce(F.col("has_out"), F.lit(False)).alias("has_out")
    ).localCheckpoint()
    ranks = nodes_f.select(
        "node", "has_out", (F.lit(1.0) / F.lit(n)).alias("pr")
    )
    for _ in range(iters):
        dang = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes_f.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "has_out",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(n)
                    )
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "pr")
