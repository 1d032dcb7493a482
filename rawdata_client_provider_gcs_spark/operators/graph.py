"""Iterative graph analytics over DataFrame edge lists (PageRank).

Near-dup dedup already needs one graph algorithm (connected components,
``operators/dedup.py``); PageRank is the second canonical iterative
workload — ranking entities by weighted link structure (suppliers by
order flow, documents by reference graphs, hosts by crawl links).  Same
execution discipline as the components loop: each iteration is a fixed
set of joins + combinable aggregations, ``localCheckpoint`` truncates
lineage so the plan stays O(1) per round, and nothing corpus-sized ever
reaches the driver (N is one bounded scalar count; the dangling mass
travels as a per-round broadcast 1-row aggregate).

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

#: Truncate the iterative loop's lineage every Nth round instead of every
#: round.  A ``localCheckpoint`` is not free even when lazy: building it
#: forces the segment's AQE shuffle-stage materialization jobs at plan
#: construction time and caches the full rank vector per round.  Lineage
#: depth stays bounded at N rounds (plan growth without truncation is
#: geometric; with N=2 it is a fixed ~2x), so this trades one cached
#: intermediate + one driver sync per round for none, at any scale
#: (optimization guide §1.2: fewer driver-side job round trips).
CHECKPOINT_EVERY = 2


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
    corpus-sized reaches the driver.  ``localCheckpoint`` every
    ``CHECKPOINT_EVERY`` rounds truncates lineage exactly like the
    connected-components loop.

    Note: calling this function runs one eager job (the scalar node
    count for N) — plan construction is not free of actions here.
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
    ).localCheckpoint(eager=False)
    # ^ the caller's edge derivation (often a join+aggregate over the
    # raw tables) is consumed FOUR times below (nodes, outw, norm,
    # dangling flags); without materializing it here each consumer
    # replayed the whole upstream subtree — measured 2.36 s of the
    # 3.16 s query was this setup replay at sf0.1 (guide §5: reuse →
    # persist; MEMORY_AND_DISK spills, nothing reaches the driver)
    # flagged node set in ONE aggregation: a node has outgoing edges iff
    # it appears as a src — max(bool) over the tagged union replaces the
    # old nodes-distinct + left-join-against-outw pair (two shuffles and
    # a checkpoint fewer in setup; dangling-ness rides along as a flag
    # column so the loop needs no per-round semi join)
    nodes_f = (
        e.select(F.col("src").alias("node"), F.lit(True).alias("has_out"))
        .union(
            e.select(F.col("dst").alias("node"), F.lit(False).alias("has_out"))
        )
        .groupBy("node")
        .agg(F.max("has_out").alias("has_out"))
        .localCheckpoint(eager=False)  # loop-invariant; materialized by
        # the N count below (one action), cached for every round
    )
    from pyspark.sql import Window as _W

    norm = (
        # per-src out-weight as a window sum — one shuffle on src, no
        # aggregate+join pair.  At rank-vector sizes past
        # broadcastability the per-round SMJ would co-locate on src via
        # AQE anyway, so this does not change the scale story.
        e.withColumn("ow", F.sum("w").over(_W.partitionBy("src")))
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint(eager=False)  # ditto — else every iteration
        # replays the upstream edge derivation; lazy: the first round's
        # execution materializes it once into the checkpoint cache
    )
    # N is one bounded scalar (a node count) — computing it once on the
    # driver replaces the broadcast-exchange job that every round's TWO
    # crossJoin(broadcast(n_df)) instances used to pay (guide §1.2:
    # fewer jobs per round; measured 3.15 s → see OPTIMIZATION_r17.md).
    # It is not a data collect: one integer, independent of corpus size.
    n = float(nodes_f.count())
    ranks = nodes_f.select(
        "node", "has_out", (F.lit(1.0) / F.lit(n)).alias("pr")
    )
    for it in range(iters):
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
        )
        if (it + 1) % CHECKPOINT_EVERY == 0 or it == iters - 1:
            # lazy (guide §1.2): each eager checkpoint was a dedicated
            # per-round JOB; the lazy form still truncates the SQL plan
            # to a LogicalRDD leaf at build time (plan stays O(1) per
            # CHECKPOINT_EVERY rounds) and caches the rank vector on
            # first use, but the recurrence now executes inside the ONE
            # final action instead of iters driver-side job round trips
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "pr")
