"""Dataset-curation operators for training-data pipelines.

The steps between "raw corpus" and "training batches" at 100 TB:
deterministic splits, PII scrubbing, sequence packing, stratified
sampling, and weighted source mixing.  Everything here is:

- **pure ``pyspark.sql.functions``** — whole-stage codegen, no Python in
  the hot path;
- **deterministic** — splits/samples key on ``md5`` of a stable id, not
  ``rand()``, so reruns, retries, and incremental refreshes assign every
  row identically (the property that makes a 1000-executor backfill
  reproducible and lets a DuckDB oracle verify the same expression);
- **shuffle-minimal** — splits/redaction/mixing are map-only; packing and
  stratified sampling shuffle once on their natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key, salt: str = "", *, on_null: str = "error") -> F.Column:
    """Deterministic uniform bucket in hex-string space.

    ``md5(salt || key)`` as a lowercase hex string; its prefix is uniform,
    so lexicographic thresholds carve reproducible fractions.  String
    compare (not int conversion) keeps the expression portable across
    engines.

    A NULL key has no stable bucket: it would silently fall through every
    threshold (landing in ``train`` for splits, dropped for samples/mixes)
    — invisible leakage in leakage-sensitive pipelines.  Default is to
    fail the job on the first NULL key (``on_null="error"``); pass
    ``on_null="null"`` to propagate NULL and handle it explicitly.
    """
    if on_null not in ("error", "null"):
        # a typo like on_null="none" must not silently disable the
        # NULL-leakage guard this parameter exists to enforce
        raise ValueError(f"on_null must be 'error' or 'null', got {on_null!r}")
    k = F.col(key) if isinstance(key, str) else key
    bucket = F.md5(F.concat(F.lit(salt), k.cast("string")).cast("binary"))
    if on_null == "error":
        return F.when(
            k.isNull(),
            F.raise_error(
                F.lit(
                    "hash_bucket: NULL key; filter NULLs or fill the key "
                    "column before deterministic bucketing"
                )
            ),
        ).otherwise(bucket)
    return bucket


def _below_fraction(bucket4: F.Column, fraction: float) -> F.Column:
    """``bucket4 < threshold`` with the threshold quantized to 1/65536.

    A fraction that rounds to 65536 (e.g. 1.0) would format as the 5-char
    string ``"10000"``; under lexicographic compare only buckets starting
    with ``'0'`` (plus ``"1000"``) sort below it, so frac=1.0 silently
    kept ~1/16 of rows instead of all of them — hence >= 1 short-circuits
    to keep-all and <= 0 to keep-none.
    """
    quantized = int(round(fraction * 65536))
    if quantized >= 65536:
        return F.lit(True)
    if quantized <= 0:
        return F.lit(False)
    return bucket4 < F.lit(format(quantized, "04x"))


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    salt: str = "v1",
) -> DataFrame:
    """Map-only deterministic split: adds a ``split`` column.

    Fractions quantize to 1/65536 (4 hex chars).  Keying on a stable id
    (doc id, url, content hash) means a document can never migrate between
    splits across pipeline runs — the leakage guarantee ``rand()`` cannot
    give.  Salt versions the assignment.
    """
    b = F.substring(hash_bucket(key, salt), 1, 4)
    return df.withColumn(
        "split",
        F.when(_below_fraction(b, val_fraction), F.lit("val"))
        .when(_below_fraction(b, val_fraction + test_fraction), F.lit("test"))
        .otherwise(F.lit("train")),
    )


#: Redaction patterns: Java regex and RE2-compatible (no backrefs or
#: lookarounds), so the same pattern string runs in Spark and DuckDB.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b",
    "phone": r"\+[0-9][0-9 .()-]{7,}[0-9]",
}


def redact_pii(
    df: DataFrame, text_col: str, patterns: dict[str, str] | None = None
) -> DataFrame:
    """Map-only PII scrub: replaces matches with ``<TYPE>`` tokens and
    counts hits per category (``n_<name>`` columns) for corpus auditing."""
    pats = patterns or PII_PATTERNS
    out = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(out, F.lit(pat), 0)).cast("long").alias(
                f"n_{name}"
            )
        )
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return df.select("*", *counts).withColumn(f"{text_col}_redacted", out)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    block_tokens: int = 2048,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout).

    Documents are laid end-to-end in ``id_col`` order into one logical
    token stream, then sliced into ``block_tokens`` blocks.  Emits, per
    document: ``pack_id`` (block where it starts), ``pack_offset`` (token
    position inside that block), and ``n_tokens``.  A document longer than
    the remaining block space spills into the next block(s) — exactly how
    training loaders pack, and fully expressible as one window cumsum, so
    an independent engine can verify the layout.

    Scale note: with no ``partition_cols`` the window is a single global
    sort by ``id_col`` — the same shuffle a sorted write would need
    anyway, but still a bottleneck at 100 TB.  Pass ``partition_cols``
    (date, source, shard) to pack independently inside each shard: the
    cumsum parallelizes across shards with no global ordering, and
    ``pack_id`` is then per-shard (emitted alongside the shard columns).
    """
    n_tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("long")
    base = (
        Window.partitionBy(*partition_cols) if partition_cols else Window
    )
    w = base.orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = F.sum(n_tok).over(w) - n_tok
    return df.select(
        *(partition_cols or []),
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.floor(start / block_tokens).cast("long").alias("pack_id"),
        (start % block_tokens).cast("long").alias("pack_offset"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key: str,
    n_per_stratum: int,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic uniform sample of ``n`` rows per stratum.

    Rows rank by ``md5(salt || key)`` inside each stratum — a random but
    reproducible order — and the first ``n`` win.  One shuffle on the
    stratum key; ties are impossible (md5 of distinct keys).
    """
    w = Window.partitionBy(stratum_col).orderBy(hash_bucket(key, salt), key)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def weighted_mix(
    sources: list[tuple[str, DataFrame, float]],
    key: str,
    salt: str = "v1",
) -> DataFrame:
    """Weighted dataset mixing: union of per-source deterministic samples.

    ``sources`` is ``[(name, df, keep_fraction)]`` — each source keeps its
    md5-bucketed ``keep_fraction`` (quantized to 1/65536) and is tagged
    with ``source``.  Map-only per source; the union is free (no shuffle).
    Epoch-style re-mixing = change the salt.
    """
    parts = []
    for name, df, frac in sources:
        parts.append(
            df.filter(
                _below_fraction(
                    F.substring(hash_bucket(key, salt + name), 1, 4), frac
                )
            ).withColumn("source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    salt: str = "shuffle",
    partition_col: str | None = None,
) -> DataFrame:
    """Deterministic per-epoch training order: a reshuffle without RNG.

    Training loops need a different document order every epoch, the same
    order on every rerun/retry of that epoch, and no coordinator holding
    a permutation — so the order IS a hash: sort by
    ``md5(salt || epoch || id)``.  Uniform, stable, and cheap to verify
    cross-engine.  Returns the input plus ``shuffle_rank`` (1-based
    position within the epoch, or within ``partition_col`` when given —
    rank-within-shard is the scale shape: a global total order over
    100 TB is one range shuffle anyway, but shard-local order composes
    with however the reader shards).
    """
    key = F.md5(
        F.concat_ws("|", F.lit(salt), F.lit(int(epoch)), F.col(id_col).cast("string"))
    )
    if partition_col is not None:
        w = Window.partitionBy(partition_col).orderBy(key, F.col(id_col))
    else:
        w = Window.partitionBy().orderBy(key, F.col(id_col))
    return df.withColumn("shuffle_rank", F.row_number().over(w).cast("long"))


def domain_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    max_per_domain: int,
    salt: str = "domaincap",
) -> DataFrame:
    """Cap documents per domain/source, deterministically and unbiased.

    Crawl-derived corpora are dominated by a few giant domains; the
    standard curation step keeps at most N documents from each.  The
    kept subset is chosen by hash order (``md5(salt|id)``), not by
    ingestion or id order — so it is an unbiased fixed-size sample per
    domain, identical on every rerun, with no RNG state.  One shuffle on
    the domain key; the per-domain ranking never materializes more than
    the window machinery needs.

    Returns the input rows that survive the cap (original columns).
    """
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_per_domain)
        .drop("__rk")
    )


def quality_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Composite corpus filter: every gate with its reason, one pass.

    Combines the individually-proven signals (token counts, stopword
    evidence, Gopher-style repetition facts) into the keep/drop decision
    a training pipeline actually materializes — per document, which
    gates fired:

    - ``too_short``      n_tokens < 30
    - ``low_stopword``   4·n_stop < n_tokens (stopword-poor ≈ non-prose)
    - ``repetitive``     top word-bigram occupies > 20 % of bigrams
    - ``low_distinct``   1 − distinct/total tokens > 0.7

    ``keep`` = no gate fired.  All gates are integer comparisons on
    JVM-side counts (no floats, no Python), so the whole verdict is
    oracle-expressible and combinable at any scale.
    """
    from ..functions import text as T
    from . import decontam

    rep = decontam.repetition_stats(docs, id_col, text_col)
    stops = docs.select(
        F.col(id_col), T.stopword_count(text_col).alias("n_stop")
    )
    g = rep.join(stops, id_col)
    return g.select(
        id_col,
        "n_tokens",
        (F.col("n_tokens") < 30).alias("too_short"),
        (F.col("n_stop") * 4 < F.col("n_tokens")).alias("low_stopword"),
        (
            (F.col("top_bigram_count") * 5 > F.col("n_bigrams"))
            & (F.col("n_bigrams") > 0)
        ).alias("repetitive"),
        (
            (F.col("n_tokens") - F.col("n_distinct_tokens")) * 10
            > F.col("n_tokens") * 7
        ).alias("low_distinct"),
    ).withColumn(
        "keep",
        ~(
            F.col("too_short")
            | F.col("low_stopword")
            | F.col("repetitive")
            | F.col("low_distinct")
        ),
    )


def chunk_tokens(
    docs: DataFrame,
    chunk: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap.

    The training-window chunker: token windows of length ``chunk``
    starting every ``stride`` tokens (stride < chunk overlaps, stride ==
    chunk tiles).  Start positions run while they land inside the token
    array, so the final window may be short — droppable downstream via
    ``n_tokens`` if the trainer wants full windows only.

    Output: ``(id, chunk_idx, n_tokens, chunk_hash)`` where
    ``chunk_hash`` is ``md5`` of the space-joined window — a stable
    content key for downstream chunk-level dedup.

    100 TB shape: entirely map-side — tokenize, ``sequence(...)`` start
    grid, ``slice`` windows, ``posexplode`` — one codegen stage, no
    shuffle; output volume is ``~n_tokens/stride`` rows per document.
    """
    if chunk < 1 or stride < 1:
        raise ValueError(f"chunk and stride must be >= 1, got {chunk}, {stride}")
    from ..functions import text as T

    toks = docs.select(F.col(id_col), T.tokens_expr(text_col).alias("t"))
    return (
        toks.filter(F.size("t") >= 1)
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(t), {stride}), "
                    f"s -> slice(t, s, {chunk}))"
                )
            ).alias("chunk_idx", "w"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("w").cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("w")).cast("binary")).alias("chunk_hash"),
        )
    )
