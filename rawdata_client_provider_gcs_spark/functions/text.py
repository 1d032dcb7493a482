"""Text-analysis column expressions (JVM-side, whole-stage-codegen friendly).

Everything here is built from ``pyspark.sql.functions`` so the hot path
stays inside Tungsten — no Python UDFs.  Patterns use explicit ASCII
character classes so Java regex (Spark) and RE2 (DuckDB oracle) agree.

These are the engine's analogs of what a large-scale training-data pipeline
needs (BASELINE.json north star): token counting, quality scoring,
language-ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ASCII word pattern — identical semantics in Java regex and RE2.
WORD_RE = "[A-Za-z0-9_]+"
ALPHA_LOWER_RE = "[a-z0-9]+"
PUNCT_RE = "[.,;:!?]"

#: Tiny deterministic stopword marker sets per language for the n-gram
#: heuristic language spotter.  Scores are plain word-boundary counts so the
#: same formula runs as oracle SQL.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "que", "pour"],
    "es": ["el", "los", "las", "es", "una", "que", "por", "para", "con"],
    "no": ["og", "det", "som", "en", "av", "til", "ikke", "med"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace-insensitive ASCII word-token count."""
    return F.regexp_count(_c(col), F.lit(WORD_RE)).cast("long")


def char_count(col: Column | str) -> Column:
    return F.length(_c(col)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars per text char (0 for empty text)."""
    c = _c(col)
    return (
        F.regexp_count(c, F.lit(PUNCT_RE)).cast("double")
        / F.greatest(F.length(c), F.lit(1)).cast("double")
    )


def stopword_count(col: Column | str, words: list[str] | None = None) -> Column:
    words = words or LANG_MARKERS["en"]
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(_c(col)), F.lit(pattern)).cast("long")


def stopword_ratio(col: Column | str, words: list[str] | None = None) -> Column:
    return stopword_count(_c(col), words).cast("double") / F.greatest(
        token_count(_c(col)), F.lit(1)
    ).cast("double")


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic from length, punctuation and
    stopword evidence — the classic cheap pre-filter for LLM corpora."""
    c = _c(col)
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_score = F.least(punct_ratio(c) * F.lit(10.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * F.lit(4.0), F.lit(1.0))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def lang_scores(col: Column | str) -> dict[str, Column]:
    low = F.lower(_c(col))
    out = {}
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(low, F.lit(pattern)).cast("long")
    return out


def detected_lang(col: Column | str) -> Column:
    """Argmax language over marker-word counts; ties resolved by the fixed
    language order (en, de, fr, es, no); 'und' when nothing matched."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alnum → space,
    collapse runs, trim."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalized_text(_c(col)))


def sentence_stats(col: Column | str) -> dict[str, Column]:
    """Sentence-level curation signals (the Gopher-rule family), pure
    Catalyst: split on terminal punctuation runs followed by
    whitespace, drop empty fragments, then count sentences, mean
    words per sentence, and the longest sentence's character length.
    A heuristic splitter by documented design (abbreviations split) —
    the signal a corpus filter thresholds on, not a linguistic parse."""
    c = _c(col)
    sents = F.filter(
        F.split(c, "[.!?]+\\s+"),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n = F.size(sents)
    words = F.transform(
        sents, lambda x: F.size(F.split(F.trim(x), "\\s+"))
    )
    total_words = F.aggregate(words, F.lit(0), lambda a, b: a + b)
    return {
        "n_sentences": n,
        "mean_words_per_sentence": F.when(
            n > 0, F.round(total_words / n, 2)
        ).otherwise(F.lit(0.0)),
        "max_sentence_chars": F.coalesce(
            F.array_max(F.transform(sents, lambda x: F.length(F.trim(x)))),
            F.lit(0),
        ),
    }


def tokens_expr(text_col: str) -> Column:
    """ASCII lowercase token array for a named column."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{ALPHA_LOWER_RE}', 0)")


def shingles_expr(text_col: str, k: int = 3) -> Column:
    """Distinct word k-shingle array for a named column (set semantics).

    The token array is bound to a lambda variable (via the one-element
    ``transform(array(...))`` trick) so the regex scan runs exactly once
    per row — a textual CASE would re-evaluate ``regexp_extract_all`` for
    every reference after projection collapse.
    """
    toks = f"regexp_extract_all(lower({text_col}), '{ALPHA_LOWER_RE}', 0)"
    return F.expr(
        f"array_distinct(flatten(transform(array({toks}), t -> "
        f"CASE WHEN size(t) < {k} "
        f"THEN array(concat_ws(' ', t)) "
        f"ELSE transform(sequence(1, size(t) - {k - 1}), "
        f"i -> concat_ws(' ', slice(t, i, {k}))) END)))"
    )


def _bigram_occurrences(docs, id_col: str, text_col: str):
    """(id, w1, w2) — one row per adjacent token pair, fully codegen'd
    (transform over the token array; no window, no extra shuffle).
    Shared by :func:`bigram_stats` and :func:`bigram_lm_scores` so the
    two documented integer-exact siblings cannot silently diverge."""
    from ..tables import scan_parallel

    docs = scan_parallel(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    toks = docs.select(F.col(id_col), tokens_expr(text_col).alias("t"))
    return (
        toks.filter(F.size("t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select(id_col, "b.w1", "b.w2")
    )


def bigram_stats(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document corpus-bigram rarity statistics (integer-exact).

    For every document, over its token bigram OCCURRENCES (not the
    distinct set): how many bigrams it has, the summed corpus frequency
    of those bigrams, how many are corpus hapax (frequency exactly 1 —
    i.e. the document itself is their only witness), and the mean corpus
    frequency.  Low mean frequency / high hapax share marks unusual text
    — the integer-exact core of an n-gram LM novelty signal (the smoothed
    log-probability variant is :func:`bigram_lm_scores`).

    100 TB shape: tokenize + bigram expansion stay in whole-stage
    codegen (``transform(sequence(...))`` over the token array — no
    window, no second shuffle for adjacency); the corpus frequency table
    is one map-side-combinable ``groupBy(w1, w2)``; the join back is an
    equi-join on the bigram key that AQE can skew-split, and the final
    per-document aggregate is again combinable.
    """
    bi = _bigram_occurrences(docs, id_col, text_col)
    freq = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("freq"))
    return (
        bi.join(freq, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("freq").cast("long").alias("sum_freq"),
            F.sum((F.col("freq") == 1).cast("long")).alias("n_hapax"),
        )
        .withColumn(
            "mean_freq",
            F.col("sum_freq").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def bigram_lm_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
):
    """Per-document mean log2 bigram probability under an add-k smoothed
    corpus bigram LM — the classic cheap perplexity-style quality signal
    (KenLM's job, done with two combinable aggregates and two joins).

    ``P(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)`` with ``V`` the
    corpus vocabulary size.  The mean of per-bigram ``log2 P`` is a
    float sum whose low bits depend on aggregation order, so this is
    validated by invariant pytest (planted-rarity ordering, determinism)
    rather than a value-hash oracle; :func:`bigram_stats` is the
    integer-exact sibling the oracle checks.
    """
    toks = docs.select(F.col(id_col), tokens_expr(text_col).alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    unigram = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.countDistinct("w").alias("v"))
    bi = _bigram_occurrences(docs, id_col, text_col)
    freq = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bi.join(freq, ["w1", "w2"])
        .join(unigram.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log2(
                (F.col("c12") + F.lit(add_k))
                / (F.col("c1") + F.lit(add_k) * F.col("v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("logp").alias("mean_log2_prob"),
    )


def dup_substring_stats(
    docs,
    k: int = 25,
    sample_mod: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document duplicated-substring exposure via character k-grams.

    The exact-substring dedup signal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): a document's distinct
    character ``k``-grams are matched corpus-wide; grams appearing in
    more than one document are "duplicated", and ``dup_fraction`` is the
    share of the document's grams that are.  ``sample_mod > 1`` keeps
    only grams whose hash ≡ 0 (mod ``sample_mod``) — CONTENT-defined
    subsampling, so the same substring selects the same grams in every
    document regardless of its offset (a positional stride would phase-
    shift across documents and miss aligned spans entirely); a
    duplicated span of length ``L`` then meets in expectation when
    ``L - k + 1 >= sample_mod``.

    100 TB shape: gram expansion is codegen'd per row; document
    frequency comes from a COUNT window over ``xxhash64(gram)`` — one
    8-byte-key shuffle serves both the frequency and the carry-back to
    each (doc, gram) row (2× faster than the groupBy + join-back shape,
    which scans the gram set twice and builds a gram-count hash
    relation).  Per-gram partition size is bounded by the number of
    documents sharing the gram.  Gram volume is ``len/sample_mod`` rows
    per document after the map-side hash-mod filter.
    """
    from pyspark.sql import Window

    # a document's grams all originate in its ONE text row, so the
    # per-document dedup happens map-side (array_distinct before the
    # explode) — measured r8: this removes the global (doc, gram)
    # distinct shuffle entirely, leaving two shuffles total (df window
    # by gram hash, final per-doc aggregate)
    from ..tables import scan_parallel

    # parallelize the gram explode above a single-split scan (no-op on
    # real multi-file corpora — guide §2.5 input skew)
    docs = scan_parallel(
        docs.filter(F.length(text_col) >= k).select(
            F.col(id_col), F.col(text_col)
        ),
        id_col,
    )
    grams = (
        docs
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length({text_col}) - {k - 1}),"
                        f" i -> substring({text_col}, i, {k}))"
                    )
                )
            ).alias("gram"),
        )
        .select(id_col, F.xxhash64("gram").alias("gh"))
    )
    if sample_mod > 1:
        grams = grams.filter(F.pmod(F.col("gh"), F.lit(sample_mod)) == 0)
    with_df = grams.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    )
    return (
        with_df.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_fraction",
            F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double"),
        )
    )


def tfidf_top_terms(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-``k`` TF-IDF terms per document (classic corpus weighting).

    TF is the in-document term count; DF counts documents containing the
    term over the WHOLE corpus; IDF uses the smoothed form
    ``ln((N + 1) / (df + 1)) + 1`` so unseen-term division can't blow up.

    100 TB shape: tokenize + explode stays in whole-stage codegen; the
    ``(doc, term)`` count is one map-side-combinable shuffle whose
    output feeds the DF count (``groupBy(term)`` over it), and Spark
    reuses the exchange when both sides see the same input.  When the
    caller filters the reported docs afterward, Catalyst instead pushes
    that predicate into the TF branch and keeps a separate full-corpus
    DF branch — the right trade (a 100× smaller TF subtree beats one
    shared shuffle; see ``plan_snapshots/q_text_tfidf.txt``).  N arrives
    as a broadcast 1-row aggregate, not a driver action; the final
    per-document top-k compiles to partial+final ``WindowGroupLimit``,
    so only k rows per doc cross the last shuffle.  Ties break on term
    text so results are deterministic and oracle-comparable.
    """
    from pyspark.sql import Window

    from ..tables import scan_parallel

    src = scan_parallel(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    toks = src.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "rnk", "score")
    )


def bm25_topk(
    docs,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = None,
):
    """Top-``k`` documents for a term query under BM25 (Robertson/
    Sparck-Jones; the lexical-retrieval baseline every RAG / hard-
    negative-mining pipeline needs next to the ANN tier).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``;
    documents matching no query term are absent (score 0), ties break
    on ``id_col`` for determinism.

    100 TB shape: the token explode is filtered to the QUERY TERMS
    before any shuffle (``isin`` on a literal list — codegen'd, and a
    thousand-term query is still a trivial in-task hash set), so the
    ``(doc, term)`` aggregation shuffles only matching postings, a
    ~|query|/|vocab| sliver of the corpus.  Document length and the
    corpus constants (N, avgdl) come from a zero-shuffle map-side
    ``size(tokens)`` projection and ONE broadcast 1-row aggregate; df
    per query term is a broadcastable ≤|query|-row aggregate.  The
    final top-k is a global ``TakeOrdered`` — no full sort.
    """
    terms = [t.lower() for t in query_terms]
    from ..tables import scan_parallel

    src = scan_parallel(
        docs.select(F.col(id_col), F.col(text_col)), id_col
    )
    # dl rides the exploded row (it is functionally dependent on the
    # doc id, so F.first in the tf aggregate recovers it exactly): the
    # doc-length table join this replaces cost two extra Exchanges —
    # tf re-shuffled by id and the lens table shuffled to meet it
    # (guide §2.4; r18 A/B: 8 → 6 jobs, median 0.96 → 0.78 s, top-k
    # exact at sf0.01 and sf0.1).  The token array is materialized in
    # its own projection BELOW the explode so the regexp tokenizer runs
    # ONCE per document — inlining size(tokens_expr) next to the
    # explode put it in the Project above the Generate, i.e. once per
    # TOKEN row (verified in the plan dump).  size() on the retained
    # array attribute is O(1) per row.  The corpus constants keep their
    # own map-side one-row aggregate over a lengths-only projection —
    # N must count zero-token documents, which never reach the explode.
    toks = src.select(F.col(id_col), tokens_expr(text_col).alias("__toks")).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    lens = src.select(F.size(tokens_expr(text_col)).alias("dl"))
    consts = lens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    matched = toks.filter(F.col("term").isin(terms))
    tf = matched.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    total = scored.groupBy(id_col).agg(
        F.sum("w").alias("score"),
        F.count("*").alias("n_terms_matched"),
    )
    if round_to is not None:
        # quantize BEFORE the top-k cut: float summation order differs
        # across engines/partitionings at the last ulp, and an exact
        # tie must break on id on both sides of an oracle compare
        total = total.withColumn("score", F.round("score", round_to))
    return total.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def dedup_lines(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
):
    """Strip repeated segments WITHIN each document, preserving order.

    The intra-document half of dedup (boilerplate menus, repeated
    paragraphs, scraper stutter): split on ``sep``, keep each
    normalized segment's FIRST occurrence, reassemble.  Returns
    ``(id, n_segments, n_kept, cleaned_text)``.

    100 TB shape: ONE split+explode pass feeds the whole thing — the
    per-(doc, normalized-segment) aggregate carries first position,
    first text, and occurrence count, and the per-doc re-assembly sums
    that count for ``n_segments`` — so the corpus is exploded once and
    shuffled twice on combinable aggregates, with no join back.  No
    Python anywhere.
    """
    if not sep:
        raise ValueError("dedup_lines: sep must be a non-empty string")
    # Spark's split() takes a Java REGEX: quote the separator literally
    # (". " as a pattern would split on ANY char followed by space).
    # \Q...\E alone is not enough — a sep containing the literal
    # sequence \E would terminate the quote early and the remainder
    # would be interpreted as regex (java.util.regex.Pattern.quote
    # handles the same edge the same way: close the quote, emit an
    # escaped backslash-E, reopen).
    sep_pattern = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    segs = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(sep_pattern), -1)
        ).alias("pos", "seg"),
    ).withColumn("norm", normalized_text(F.col("seg"))).filter(
        F.col("norm") != ""
    )
    firsts = segs.groupBy(id_col, "norm").agg(
        F.min("pos").alias("pos"),
        F.min_by("seg", "pos").alias("seg"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    return firsts.groupBy(id_col).agg(
        F.sum("n_occ").cast("long").alias("n_segments"),
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("seg")))
                ),
                lambda s: s["seg"],
            ),
            sep,
        ).alias("cleaned_text"),
    )


def corpus_dedup_segments(
    docs,
    min_doc_freq: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
):
    """Strip CORPUS-level boilerplate segments (the CCNet paragraph-
    dedup move): a segment whose normalized form appears in at least
    ``min_doc_freq`` distinct documents is template chrome ("subscribe
    to our newsletter", cookie banners, copyright footers) and is
    dropped from EVERY document; genuinely document-specific text
    survives.  The cross-corpus complement of :func:`dedup_lines`
    (which strips repeats WITHIN one document).

    Returns ``(id, n_segments, n_kept, cleaned_text)``.

    100 TB shape: one split+posexplode pass; the corpus document
    frequency is a combinable ``count_distinct`` grouped on the 8-byte
    ``xxhash64`` of the normalized segment (map-side partials absorb
    the hot keys).  The carry-back deliberately does NOT join the full
    frequency table: boilerplate keys are by definition the SKEWED keys
    (every copy of "subscribe to our newsletter" would land on one
    reducer), so membership is decided against only the ``df >= K``
    HOT SET — small by nature (template chrome, not unique text), so
    AQE turns the join into a broadcast and the carry-back costs zero
    shuffle and carries zero skew.  Re-assembly is one per-doc
    aggregate.  No Python anywhere.
    """
    if not sep:
        raise ValueError("corpus_dedup_segments: sep must be non-empty")
    sep_pattern = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    segs = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), F.lit(sep_pattern), -1)
            ).alias("pos", "seg"),
        )
        .withColumn("norm", normalized_text(F.col("seg")))
        .filter(F.col("norm") != "")
        .withColumn("nh", F.xxhash64("norm"))
        .drop("norm")
    )
    hot = (
        segs.groupBy("nh")
        .agg(F.count_distinct(F.col(id_col)).alias("seg_df"))
        .filter(F.col("seg_df") >= F.lit(min_doc_freq))
        .select("nh", F.lit(True).alias("is_boiler"))
    )
    kept = segs.join(hot, "nh", "left").withColumn(
        "is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False))
    )
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum((~F.col("is_boiler")).cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_boiler"),
                            F.struct(F.col("pos"), F.col("seg")),
                        )
                    )
                ),
                lambda s: s["seg"],
            ),
            sep,
        ).alias("cleaned_text"),
    )
