"""Deduplication operators for LLM-corpus pipelines.

Four tiers, all DataFrame-native (SURVEY.md §2B "LLM-pipeline"):

- **exact**: content-hash group-by (one shuffle, map-side combinable)
- **n-gram Jaccard**: exact set-similarity via shared-shingle equi-join —
  the candidate space is bounded by shingle co-occurrence, not |D|²
- **MinHash + LSH**: sketch → band → bucket-join; candidate generation is
  linear in documents × bands, the scale path for 100 TB corpora
- **SimHash**: 64-bit near-dup signature via an Arrow-batched pandas UDF
  (the one genuinely non-relational step — per-token bit voting)

All hashing is deterministic (xxhash64 / md5 / blake2b with fixed seeds) so
results are reproducible run to run.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.text import normalized_text, shingles_expr
from ..tables import scan_parallel

#: Probe the connected-components fixpoint (and truncate lineage) every
#: Nth propagation round.  The label sum is monotone non-increasing, so
#: an unchanged sum across an N-round span proves every round in the
#: span was a no-op — detection stays exact, merely up to N-1 no-op
#: rounds late.  Measured (r18 interleaved A/B at sf0.1): N=2 halves the
#: driver probes but the overshoot adds one full propagation round
#: (jobs 26 → 28, wall a wash) — and at real scale an extra round is a
#: full shuffle of the label table while a probe is a cheap scalar
#: aggregation, so every-round checking is the right trade at every
#: scale.  Kept at 1; the knob documents the measured rejection.
FIXPOINT_CHECK_EVERY = 1

# fixed mixing constants for the MinHash permutation family.  The prime is
# 31-bit (2^31 - 1) so a*x with a,x < p stays under 2^62 — no signed-64
# overflow under ANSI mode, no BigDecimal fallback needed.
_MERSENNE = (1 << 31) - 1


def _permutation_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a·x + b) mod p."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """Group identical (optionally normalized) texts.

    Returns ``(content_hash, n_copies, keep_id)`` with ``keep_id`` the
    smallest id of the group — the canonical survivor.  One hash shuffle
    with map-side partial aggregation; no row explosion.
    """
    content = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(content).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized text (smallest id wins)."""
    keepers = exact_duplicates(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Exploded distinct word-k-shingles: (id, shingle)."""
    return df.select(
        F.col(id_col), F.explode(shingles_expr(text_col, k)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shared-shingle equi-join.

    Plan shape: explode shingles (linear), self equi-join on the shingle
    (bounded by true co-occurrence — documents sharing nothing never meet),
    aggregate intersection counts, then the Jaccard filter.  This is the
    oracle-checkable exact form; use :func:`minhash_lsh_pairs` when the
    corpus is too large for exact intersection counting.

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents *from the representation* (both intersection and set sizes):
    a stop-phrase shingle shared by 10^6 docs would otherwise put 10^12
    pairs on one shuffle key — the classic skew bomb — while carrying
    essentially no Jaccard signal.  Standard MinHash-pipeline practice.

    The exploded shingle table (O(total tokens) rows) is reused by the
    size agg, the hot-shingle agg, and both self-join sides, so it is
    persisted spill-safe (MEMORY_AND_DISK) **for the duration of this
    call only**: the pair result is materialized eagerly via
    ``localCheckpoint`` and the shingle persist is dropped before
    returning — no full-corpus cache outlives the operator to evict
    everything else on a shared cluster.  ``materialize=False`` skips
    both (a lazy plan that recomputes the explode per reference) — for
    plan auditing (``q_ngram_jaccard_pairs_internal.txt``) and lazy
    composition.
    """
    # join on the 64-bit shingle hash, not the string: same intersection
    # counts (collisions within one doc pair are ~|shingles|²/2^64), but the
    # shuffle moves 8-byte keys instead of multi-word strings.
    # scan_parallel: tokenize+explode is the narrow stage above the scan;
    # on a single-row-group input it runs one-task without this (no-op on
    # real multi-split corpora — guide §2.5).
    src = scan_parallel(df.select(F.col(id_col), F.col(text_col)), id_col)
    sh = doc_shingles(src, id_col, text_col, k).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )
    if max_doc_freq is not None:
        # shingles are distinct per doc, so count(*) per sh = doc frequency
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .filter(F.col("doc_freq") > F.lit(max_doc_freq))
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
    from pyspark import StorageLevel

    if materialize:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
        a = sh.select(F.col(id_col).alias("id_a"), "sh")
        b = sh.select(F.col(id_col).alias("id_b"), "sh")
        inter = (
            a.join(b, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sa = sizes.select(
            F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a")
        )
        sb = sizes.select(
            F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b")
        )
        # sizes are one row per document — scale-proportional, so no broadcast
        # hint; the auto threshold / AQE picks broadcast while it actually fits
        pairs = (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
            )
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("id_a", "id_b", "n_common", "jaccard")
        )
        # the action happens here, inside the operator, while the shingle
        # persist is alive; the (small, filtered) pair set is what survives
        return pairs.localCheckpoint(eager=True) if materialize else pairs
    finally:
        if materialize:
            sh.unpersist()


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, minhash[0..num_hashes)) — one aggregation over exploded shingles.

    Shingle → xxhash64 (JVM) → ``num_hashes`` linear permutations, min per
    doc.  All columns are computed in one shuffle-free map plus one
    combinable aggregate; no Python in the loop.
    """
    params = _permutation_params(num_hashes)
    sh = doc_shingles(
        scan_parallel(df.select(F.col(id_col), F.col(text_col)), id_col),
        id_col,
        text_col,
        k,
    )
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
    aggs = [
        F.min(F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, optionally verified.

    rows = bands per doc (constant fan-out), bucket equi-join finds
    candidates, and — when ``verify_threshold`` is set — candidates are
    verified with the exact shingle-intersection Jaccard, restricted to the
    candidate set (so verification cost tracks the number of candidates,
    not |D|²).  The verify stage applies the same ``max_doc_freq``
    hot-shingle cap as :func:`ngram_jaccard_pairs` so both operators
    compute Jaccard over the same document representation.
    """
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
    ).select(id_col, F.col("bucket.band").alias("band"), F.col("bucket.sig").alias("sig"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
    b_side = banded.select(F.col(id_col).alias("id_b"), "band", "sig")
    candidates = (
        a.join(b_side, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return candidates
    sh = doc_shingles(
        scan_parallel(df.select(F.col(id_col), F.col(text_col)), id_col),
        id_col,
        text_col,
        k,
    ).select(F.col(id_col), F.xxhash64("shingle").alias("sh"))
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .filter(F.col("doc_freq") > F.lit(max_doc_freq))
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "sh")
    sb = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(verify_threshold))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF.

    Per-token 64-bit hashes (blake2b, fixed) vote on each bit; the sign of
    each bit-sum forms the signature.  Near-dups differ in few bits
    (Hamming distance) — pair generation can then bucket on signature
    prefixes, mirroring the LSH pattern.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        import hashlib
        import re

        import numpy as np

        tok_re = re.compile(r"[a-z0-9]+")

        def one(text):
            if text is None:
                return 0
            toks = tok_re.findall(text.lower())
            if not toks:
                return 0
            # bit-matrix vote: unpack all token-hash bits at once instead of
            # a per-token 64-iteration Python loop (~100x on long docs).
            # Layout check: unpackbits is MSB-first per byte, digests are
            # big-endian, so matrix column j is hash bit 63-j on both the
            # unpack and the final packbits — bit-identical to the scalar
            # formulation (proven by the duplicate-Hamming-zero test).
            buf = b"".join(
                hashlib.blake2b(t.encode(), digest_size=8).digest() for t in toks
            )
            bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8)).reshape(-1, 64)
            votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
            sig = int.from_bytes(
                np.packbits((votes > 0).astype(np.uint8)).tobytes(), "big"
            )
            # keep in signed-long range for LongType
            return sig - (1 << 64) if sig >= (1 << 63) else sig

        return texts.map(one)

    # parallelize the Python kernel across cores (no-op on real corpora)
    src = scan_parallel(df.select(F.col(id_col), F.col(text_col)), id_col)
    return src.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs whose SimHash Hamming distance <= ``max_hamming``.

    Candidates come from matching any of 4 16-bit signature chunks (by the
    pigeonhole principle any pair within Hamming distance 3 shares at least
    one chunk) — linear blow-up, no |D|² scan.
    """
    # materialize signatures once: both sides of the chunk self-join
    # derive from this subtree, and without a reuse point each side
    # re-ran the full tokenize+hash Python kernel (guide §5 "reuse →
    # persist"; the signature table is one long per doc, tiny next to
    # the text it summarizes)
    sig = simhash_signatures(df, id_col, text_col).localCheckpoint()
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    blocked = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(chunks).alias("c")
    ).select(id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "chunk", "val"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "chunk", "val"
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        # Hamming filter first (codegen bit_count) so the dedup of
        # multi-chunk matches shuffles survivors only, not every random
        # 16-bit chunk collision (~|D|^2/2^16 per chunk).
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "propagation",
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over a pair list.

    Near-dup detection (Jaccard/MinHash/SimHash/embedding pairs) yields
    edges; keep-one-per-cluster dedup needs the transitive closure.  The
    default is min-label propagation: every node starts labeled with
    itself and repeatedly takes the minimum label in its closed
    neighborhood until a fixpoint — the result maps each node to the
    smallest id reachable from it, a canonical component id.

    Scale notes: each iteration is one equi-join + one combinable min-agg
    on node id; ``localCheckpoint`` truncates the growing lineage so plan
    size stays O(1) per round.  Convergence takes O(component diameter)
    iterations — near-dup clusters are shallow (dense blobs around a
    template), so single digits in practice.  Label sums decrease
    monotonically, so fixpoint detection is one cheap scalar comparison
    per round.

    ``algorithm="star"`` selects the alternating large-star/small-star
    contraction (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14): rounds bounded by O(log² n) — in practice
    O(log n) — independent of component diameter, the variant to use on
    adversarially long path/filament graphs where propagation would need
    diameter rounds.  Both variants return the same (node_id,
    component_id) mapping.
    """
    if algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    sym = (
        edges.select(
            F.col(id_a).cast("long").alias("src"),
            F.col(id_b).cast("long").alias("dst"),
        )
        .union(
            edges.select(
                F.col(id_b).cast("long").alias("src"),
                F.col(id_a).cast("long").alias("dst"),
            )
        )
        .distinct()
        .localCheckpoint()
    )
    if algorithm == "star":
        return _cc_star(sym, max_iter)
    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "component_id", F.col("id")
    )
    prev_sum = None
    for it in range(max_iter):
        # closed-neighborhood min in ONE aggregation: union the
        # neighbor-label rows with each node's own label row and take
        # min per node.  Exactly least(own, min(neighbors)) — the
        # [groupBy min + left join back] pair this replaces cost two
        # extra Exchanges of the label table per round (guide §2.4:
        # two operations keyed the same way share one exchange; A/B
        # measured median 2.75 s → 2.61 s on q_dedup_components).
        labels = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(F.col("src").alias("id"), "component_id")
            .union(labels.select("id", "component_id"))
            .groupBy("id")
            .agg(F.min("component_id").alias("component_id"))
        )
        # Fixpoint probe + lineage truncation every FIXPOINT_CHECK_EVERY
        # rounds (default 1 — see the constant's docstring for why the
        # sparser cadence was measured and rejected).  An unchanged
        # monotone sum across the checked span means every round in the
        # span was a no-op — fixpoint, detected exactly.
        if (it + 1) % FIXPOINT_CHECK_EVERY == 0 or it == max_iter - 1:
            # lazy checkpoint: the fixpoint agg right below is the
            # round's ONE action — it materializes (and caches) the new
            # labels as a side effect, so the eager-checkpoint job this
            # loop used to pay per round is folded into the agg
            labels = labels.localCheckpoint(eager=False)
            cur_sum = labels.agg(F.sum("component_id")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return labels.select(F.col("id").alias("node_id"), "component_id")


def _cc_star(sym: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction over a symmetric,
    deduped (src, dst) edge set.

    Each round is two rounds of map-side neighborhood minima:

    - **large-star**: every node links its *larger* neighbors to the
      minimum of its closed neighborhood — long filaments fold in half;
    - **small-star**: every node links its *smaller-or-equal* neighbors
      (and itself) to that minimum — stars flatten onto their center.

    The edge set shrinks toward a star forest (each node → its component
    minimum); fixpoint is an unchanged (count, endpoint-sum) fingerprint.
    Both phases are one groupBy-min plus one equi-join on node id —
    skew-safe shapes — and ``localCheckpoint`` truncates lineage per
    round exactly like the propagation variant.
    """
    nodes = sym.select(F.col("src").alias("id")).distinct().localCheckpoint()
    # canonical orientation large -> small; self-loops already impossible
    # in sym only if input had none, so filter anyway
    edges = (
        sym.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_fp = None
    for _ in range(max_iter):
        # large-star over both directions
        nbr = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbr.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbr.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the canonical (large -> small) orientation
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            oriented.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            # lazy: the fingerprint agg below is the round's one action
            # and materializes the checkpoint (same fold as propagation)
            .localCheckpoint(eager=False)
        )
        fp = tuple(
            edges.agg(
                F.count(F.lit(1)), F.sum("u"), F.sum("v")
            ).first()
        )
        if fp == prev_fp:
            break
        prev_fp = fp
    # converged: a star forest, each edge (node -> its component minimum)
    centers = nodes.join(
        edges.select(F.col("u").alias("id")), "id", "left_anti"
    ).select("id", F.col("id").alias("component_id"))
    members = edges.groupBy("u").agg(F.min("v").alias("component_id")).select(
        F.col("u").alias("id"), "component_id"
    )
    return (
        centers.unionByName(members)
        .groupBy("id")
        .agg(F.min("component_id").alias("component_id"))
        .select(F.col("id").alias("node_id"), "component_id")
    )
