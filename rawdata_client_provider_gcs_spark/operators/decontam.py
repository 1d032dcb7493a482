"""Benchmark decontamination: flag training docs overlapping an eval set.

A training-data pipeline must not ship documents that contain its
evaluation benchmarks (the standard n-gram decontamination step: GPT-3
§C used 13-gram overlap, Llama/PaLM variants use 8–13).  The reference's
payload model carries opaque documents (``data: map<string,bytes>``,
AvroRawdataProducer.java:42-49); this operator family gives the engine
the overlap check those corpora need before training.

Scale shape (the part that matters at 100 TB):

- The BENCHMARK side is small by definition (eval sets are thousands of
  documents, not billions) — its distinct k-gram hashes are broadcast,
  so the training corpus is scanned map-side exactly once, with no
  corpus-sized shuffle for the probe.
- Doc k-grams reduce to 8-byte ``xxhash64`` keys before the join (same
  discipline as the exact Jaccard tier, ``operators/dedup.py``), so the
  only shuffled payload is (doc_id, hash) hits — bounded by true
  contamination volume, not corpus size.
- The per-doc verdict is a combinable group-by (count distinct hashed
  grams), partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_expr
from ..tables import scan_parallel


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, gram_hash) — distinct word-k-gram xxhash64 keys per document.

    ``shingles_expr`` already applies ``array_distinct`` per document, so
    the exploded (id, hash) pairs are unique without a corpus-wide
    ``.distinct()`` shuffle; the rare same-doc hash collision is absorbed
    by the caller's ``countDistinct``.
    """
    return df.select(
        F.col(id_col),
        F.explode(shingles_expr(text_col, k=k)).alias("gram"),
    ).select(F.col(id_col), F.xxhash64("gram").alias("gram_hash"))


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Returns one row per training document sharing at least ``min_hits``
    distinct word ``k``-grams with the benchmark:
    ``(id_col, n_grams_hit, n_bench_docs)`` — how many distinct
    benchmark k-grams the document contains, and how many distinct
    benchmark documents those grams appear in.  Filter the training set
    with an anti-join on the result (:func:`decontaminate`).

    The benchmark's (gram_hash, bench_id) pairs are broadcast — eval
    sets are small by definition; pass a pre-deduped benchmark if yours
    is not.
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col
    bench_grams = _gram_hashes(benchmark, bench_id, bench_text, k).select(
        F.col(bench_id).alias("__bench_id"), "gram_hash"
    )
    # corpus-side gram explode + broadcast probe is the narrow stage
    # above the scan — parallelize it (no-op on multi-split corpora)
    doc_grams = _gram_hashes(
        scan_parallel(docs.select(F.col(id_col), F.col(text_col)), id_col),
        id_col,
        text_col,
        k,
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "gram_hash")
    report = (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct("gram_hash").alias("n_grams_hit"),
            F.countDistinct("__bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_grams_hit") >= min_hits)
    )
    return report


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_hits: int = 1,
    **kwargs,
) -> DataFrame:
    """The training set minus contaminated documents (left-anti join)."""
    bad = contaminated_docs(
        docs, benchmark, id_col=id_col, text_col=text_col, k=k,
        min_hits=min_hits, **kwargs
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def semantic_contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
) -> DataFrame:
    """Embedding-space contamination report against a benchmark corpus.

    The semantic twin of :func:`contaminated_docs`: a paraphrased or
    reformatted benchmark item shares no exact k-grams with its source
    but sits next to it in embedding space.  Returns one row per
    training document whose max cosine against ANY benchmark embedding
    clears ``threshold``: ``(id_col, max_cosine, n_bench_hits)``.

    100 TB shape: the benchmark side is broadcast (eval sets are small
    by definition), the corpus is scanned map-side, and the per-doc
    aggregate is combinable — zero shuffle of corpus rows, exactly the
    broadcast-probe shape of the n-gram path.
    """
    from .similarity import cosine_similarity

    bench_id = bench_id_col or id_col
    bench_vec = bench_vec_col or vec_col
    bench = F.broadcast(
        benchmark.select(
            F.col(bench_id).alias("bench_id"),
            F.col(bench_vec).alias("bench_vec"),
        )
    )
    scored = (
        docs.select(F.col(id_col), F.col(vec_col))
        .crossJoin(bench)
        .withColumn(
            "cosine", cosine_similarity(F.col(vec_col), F.col("bench_vec"))
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max("cosine").alias("max_cosine"),
            # distinct benchmark DOCS above threshold — the same
            # statistic as the n-gram twin's n_bench_docs (countDistinct
            # skips the nulls when() leaves below threshold)
            F.countDistinct(
                F.when(F.col("cosine") >= F.lit(threshold), F.col("bench_id"))
            )
            .cast("long")
            .alias("n_bench_hits"),
        )
        .filter(F.col("max_cosine") >= F.lit(threshold))
    )


def semantic_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """The training set minus semantically contaminated documents."""
    bad = semantic_contaminated_docs(
        docs,
        benchmark,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        **kwargs,
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher/C4-style within-document repetition facts, exact integers.

    Per document: token count, distinct-token count, the most frequent
    word bigram's occurrence count, and total bigram count — the inputs
    to the standard repetition filters ("drop if top-2-gram fraction
    > 0.2", "drop if 1 - distinct/total > 0.7").  All four are BIGINT so
    the oracle comparison is exact; callers derive the ratios.

    Shape: tokens stay inside one JVM projection (no explode for the
    distinct-token side); the bigram top-1 is an explode + two
    combinable aggregations keyed by (doc, bigram) — partial-aggregated
    map-side, no skew beyond a document's own length.
    """
    toks = docs.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("t"),
    )
    base = toks.select(
        F.col(id_col),
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct_tokens"),
        F.expr(
            "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
            "i -> concat_ws(' ', slice(t, i, 2))) ELSE array() END"
        ).alias("bigrams"),
    )
    top = (
        base.select(F.col(id_col), F.explode("bigrams").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").cast("long").alias("top_bigram_count"))
    )
    return (
        base.select(
            F.col(id_col),
            "n_tokens",
            "n_distinct_tokens",
            F.size("bigrams").cast("long").alias("n_bigrams"),
        )
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "n_distinct_tokens",
            "n_bigrams",
            F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        )
    )


def compression_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression facts — the classic "too
    compressible = boilerplate/repetition, incompressible = noise"
    quality signal (used by Gopher-style corpus filters alongside
    :func:`repetition_stats`).

    Returns ``(id, raw_bytes, zlib_bytes, compression_ratio)`` where
    ratio = compressed/raw over the UTF-8 text.  Arrow-batched
    ``mapInPandas``; stdlib zlib at a fixed level is deterministic for
    a given zlib build, so results are stable within an environment but
    not SQL-expressible — the catalog query is rows-only by design with
    the behavior pinned by pytest invariants (repetitive text
    compresses far below prose; ratio bounds hold; empty text is 0/0).
    """

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = []
            comp = []
            for text in pdf[text_col]:
                b = (text or "").encode("utf-8")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, level)) if b else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raw,
                    "zlib_bytes": comp,
                    "compression_ratio": [
                        (c / r) if r else 0.0 for c, r in zip(comp, raw)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} long, raw_bytes long, zlib_bytes long, "
        "compression_ratio double",
    )


def fuzzy_contaminated_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    k: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate contamination: (training doc, benchmark doc) pairs
    whose word-``k``-shingle Jaccard similarity reaches ``threshold``.

    ``materialize=False`` returns the LAZY single-pass plan (no
    persist, no checkpoint) — for plan auditing
    (``tools/plan_snapshots.py`` commits it as
    ``q_decontam_fuzzy_internal.txt``) and for callers composing the
    operator without paying the jobs at construction time; such a lazy
    result recomputes the corpus explode on every reference.

    The fuzzy tier above :func:`contaminated_docs` (exact-gram hits):
    a lightly paraphrased or truncated eval example still matches.  The
    shape mirrors the corpus self-join dedup tier but asymmetric — the
    benchmark side (small by definition) is broadcast, so the corpus
    never shuffles for the candidate join; intersection counts group on
    (doc, bench) keys bounded by true shingle co-occurrence.  Exact
    Jaccard, no sketches: oracle-checkable, and cheap because only the
    benchmark's shingles participate.

    Returns ``(id_col, bench_id, n_common, jaccard)``.
    """
    bench_id = bench_id_col or id_col
    bench_text = bench_text_col or text_col
    from pyspark import StorageLevel

    # The corpus gram table feeds BOTH the intersection join and the
    # candidate-size aggregate; without pinning it, the full corpus
    # explode runs twice (the r7 plan audit showed 12 parquet scans and
    # zero ReusedExchange).  Same scoped-persist discipline as
    # dedup.ngram_jaccard_pairs: spill-safe for the duration of this
    # call, eager-materialized results, unpersisted before return — no
    # corpus-sized cache outlives the operator on a shared cluster.
    doc_grams = _gram_hashes(
        scan_parallel(docs.select(F.col(id_col), F.col(text_col)), id_col),
        id_col,
        text_col,
        k,
    )
    if materialize:
        doc_grams = doc_grams.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        bench_grams = _gram_hashes(benchmark, bench_id, bench_text, k).select(
            F.col(bench_id).alias("bench_id"), "gram_hash"
        )
        bench_sizes = bench_grams.groupBy("bench_id").agg(
            F.count(F.lit(1)).alias("__n_bench")
        )
        # inter is bounded by true shingle co-occurrence with the (small)
        # benchmark — candidate-scale, not corpus-scale — and is used by
        # both the candidate set and the final join, so materialize it
        # once rather than re-running the corpus-side join.  LAZY: the
        # final pairs checkpoint below is this operator's one action and
        # materializes inter as a side effect, folding what used to be a
        # separate eager job into it (guide §1.2; the r18 stage probe
        # measured 11 jobs/197 tasks eager vs 10 jobs/165 tasks lazy,
        # median 1.13 s → 1.02 s, rows identical).  Dropping the
        # checkpoint entirely was another ~0.1 s faster at bench scale
        # but re-runs the broadcast join over the corpus-scale gram
        # persist twice (no ReusedExchange in the plan) — rejected: the
        # extra pass only looks free when the gram cache fits in memory.
        inter = (
            doc_grams.join(F.broadcast(bench_grams), "gram_hash")
            .groupBy(id_col, "bench_id")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        if materialize:
            inter = inter.localCheckpoint(eager=False)
        # denominator sizes are only needed for documents that shared at
        # least one shingle with the benchmark — semi-join the gram table
        # down to those before counting, so the size aggregate shuffles
        # the candidate set, not the whole corpus
        candidates = inter.select(id_col).distinct()
        doc_sizes = (
            doc_grams.join(candidates, id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n_doc"))
        )
        pairs = (
            inter.join(doc_sizes, id_col)
            .join(F.broadcast(bench_sizes), "bench_id")
            .withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (
                    F.col("__n_doc") + F.col("__n_bench") - F.col("n_common")
                ).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select(id_col, "bench_id", "n_common", "jaccard")
        )
        # action inside the operator while the gram persist is alive
        return pairs.localCheckpoint(eager=True) if materialize else pairs
    finally:
        if materialize:
            doc_grams.unpersist()
