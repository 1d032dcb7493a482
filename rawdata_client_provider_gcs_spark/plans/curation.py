"""Dataset-curation queries: splits, PII scrubbing, packing, sampling, mixing.

Exercises ``operators/curation.py`` over the ``documents`` table.  Every
operator here keys randomness on ``md5`` of a stable id instead of
``rand()``, so each query is fully deterministic and every oracle states
the identical algorithm — the same property that makes the operators
reproducible across reruns/retries on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import curation
from ..tables import load_table
from .catalog import register

# md5(salt || key) in DuckDB; Spark side is curation.hash_bucket
_BUCKET = "md5('{salt}' || CAST({key} AS VARCHAR))"


@register(
    "q_curation_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, substring({_BUCKET.format(salt='v1', key='doc_id')}, 1, 4) AS hx
  FROM documents
), tagged AS (
  SELECT doc_id,
         CASE WHEN hx < '0ccd' THEN 'val'
              WHEN hx < '199a' THEN 'test'
              ELSE 'train' END AS split
  FROM b
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM tagged GROUP BY split
""",
    tags=("curation", "split"),
)
def q_curation_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic md5-keyed train/val/test split (5%/5%) — a document
    can never migrate between splits across runs (leakage guarantee)."""
    d = load_table(spark, sf, "documents")
    split = curation.train_val_test_split(
        d, "doc_id", val_fraction=0.05, test_fraction=0.05, salt="v1"
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
    )


@register(
    "q_curation_redact_pii",
    oracle="""
WITH aug AS (
  -- the synthetic corpus carries no PII, so plant a deterministic
  -- email/ip/phone per doc: redaction must actually fire to stay green
  SELECT doc_id,
         text || ' Contact: user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7, call +1 555 01' || CAST(doc_id % 10 AS VARCHAR)
              || CAST(doc_id % 7 AS VARCHAR) || '.' AS text
  FROM documents WHERE doc_id < 100
), s1 AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           AS t1
  FROM aug
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b'))
           AS n_ipv4,
         regexp_replace(t1, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', '<IPV4>', 'g')
           AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         len(regexp_extract_all(t2, '\\+[0-9][0-9 .()-]{7,}[0-9]')) AS n_phone,
         regexp_replace(t2, '\\+[0-9][0-9 .()-]{7,}[0-9]', '<PHONE>', 'g')
           AS text_redacted
  FROM s2
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_phone AS BIGINT) AS n_phone,
       md5(text_redacted) AS redacted_hash
FROM s3
""",
    tags=("curation", "pii"),
)
def q_curation_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """Map-only PII scrub (email/IPv4/phone) with per-category hit counts;
    output compares the md5 of the redacted text (patterns are Java- and
    RE2-compatible so both engines run the same regex).  PII is planted
    deterministically per doc — the fixture corpus has none, and a
    redaction query that never redacts proves nothing."""
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    planted = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7, call +1 555 01"),
            (F.col("doc_id") % 10).cast("string"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("."),
        ),
    )
    r = curation.redact_pii(planted, "text")
    return r.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_email"),
        F.col("n_ipv4"),
        F.col("n_phone"),
        F.md5(F.col("text_redacted").cast("binary")).alias("redacted_hash"),
    )


@register(
    "q_curation_pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
           AS n_tokens
  FROM documents
), laid AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM toks
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       CAST(FLOOR(start / 2048) AS BIGINT) AS pack_id,
       CAST(start % 2048 AS BIGINT) AS pack_offset
FROM laid
""",
    tags=("curation", "packing"),
    bench=True,
)
def q_curation_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 2048-token blocks — each
    document's block id and offset in the packed token stream."""
    d = load_table(spark, sf, "documents")
    return curation.pack_sequences(
        d, "doc_id", T.token_count("text"), block_tokens=2048
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "n_tokens",
        "pack_id",
        "pack_offset",
    )


@register(
    "q_curation_stratified_sample",
    oracle=f"""
WITH langs AS (
  SELECT doc_id, lang, {_BUCKET.format(salt='v1', key='doc_id')} AS hx
  FROM documents
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rk
  FROM langs
)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id
FROM ranked WHERE rk <= 20
""",
    tags=("curation", "sampling"),
)
def q_curation_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20-per-language stratified sample: rows rank by
    md5(id) within each stratum — random but reproducible."""
    d = load_table(spark, sf, "documents")
    return curation.stratified_sample(
        d, "lang", "doc_id", n_per_stratum=20, salt="v1"
    ).select("lang", F.col("doc_id").cast("long").alias("doc_id"))


@register(
    "q_curation_weighted_mix",
    bench=True,
    oracle=f"""
WITH en AS (
  SELECT doc_id, 'en_heavy' AS source FROM documents
  WHERE lang = 'en'
    AND substring({_BUCKET.format(salt='v1en_heavy', key='doc_id')}, 1, 4)
        < 'cccd'
), rest AS (
  SELECT doc_id, 'other_light' AS source FROM documents
  WHERE lang != 'en'
    AND substring({_BUCKET.format(salt='v1other_light', key='doc_id')}, 1, 4)
        < '3333'
), mixed AS (
  SELECT * FROM en UNION ALL SELECT * FROM rest
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM mixed GROUP BY source
""",
    tags=("curation", "mixing"),
)
def q_curation_weighted_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted source mixing: English docs sampled at 80%, non-English at
    20%, tagged and unioned — the deterministic epoch-mix primitive."""
    d = load_table(spark, sf, "documents")
    mixed = curation.weighted_mix(
        [
            ("en_heavy", d.filter(F.col("lang") == "en"), 0.8),
            ("other_light", d.filter(F.col("lang") != "en"), 0.2),
        ],
        key="doc_id",
        salt="v1",
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@register(
    "q_curation_epoch_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang,
         md5('shuffle|' || 3 || '|' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k, doc_id)
            AS BIGINT) AS shuffle_rank
FROM keyed
""",
    tags=("curation", "shuffle"),
)
def q_curation_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch-3 shuffle order, ranked within language shard
    (§2C curation): the training-order primitive — hash-keyed, RNG-free,
    identical on every rerun, verifiable cross-engine."""
    d = load_table(spark, sf, "documents").select("doc_id", "lang")
    return curation.epoch_shuffle(
        d, "doc_id", epoch=3, partition_col="lang"
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "shuffle_rank",
    )


@register(
    "q_curation_domain_cap",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('domaincap|' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ranked WHERE rk <= 40 GROUP BY source
""",
    tags=("curation", "sampling"),
)
def q_curation_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document cap (§2C curation): keep at most 40 docs per
    source, hash-chosen so the survivors are an unbiased, rerun-stable
    sample — the anti-domination step for crawl corpora.  The oracle
    pins the exact survivor set per source via id aggregates."""
    d = load_table(spark, sf, "documents").select("doc_id", "source")
    capped = curation.domain_cap(d, "source", "doc_id", max_per_domain=40)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


@register(
    "q_curation_filter_pipeline",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
         len(regexp_extract_all(lower(text),
             '\\b(the|and|of|to|in|is|that|for|with)\\b')) AS n_stop
  FROM documents
), base AS (
  SELECT doc_id, source, n_stop, len(t) AS n_tokens,
         len(list_distinct(t)) AS n_distinct_tokens,
         GREATEST(len(t) - 1, 0) AS n_bigrams
  FROM toks
), bg AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM toks WHERE len(t) >= 2
  )
), topbg AS (
  SELECT doc_id, MAX(c) AS top_bigram_count
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
), gates AS (
  SELECT b.source,
         b.n_tokens < 30 AS too_short,
         b.n_stop * 4 < b.n_tokens AS low_stopword,
         COALESCE(t.top_bigram_count, 0) * 5 > b.n_bigrams
           AND b.n_bigrams > 0 AS repetitive,
         (b.n_tokens - b.n_distinct_tokens) * 10 > b.n_tokens * 7
           AS low_distinct
  FROM base b LEFT JOIN topbg t USING (doc_id)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN NOT (too_short OR low_stopword OR repetitive
                               OR low_distinct) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT)
         AS n_too_short,
       CAST(SUM(CASE WHEN low_stopword THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_stopword,
       CAST(SUM(CASE WHEN repetitive THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive,
       CAST(SUM(CASE WHEN low_distinct THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_distinct
FROM gates GROUP BY source
""",
    tags=("llm", "curation", "quality"),
)
def q_curation_filter_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The materialized keep/drop verdict of the corpus filter: per
    source, how many documents survive and which gate dropped the rest
    (§2C curation; combines the proven token/stopword/repetition
    signals via :func:`...operators.curation.quality_filter` — every
    gate an integer comparison, every count combinable)."""
    d = load_table(spark, sf, "documents")
    gates = curation.quality_filter(d).join(
        d.select("doc_id", "source"), "doc_id"
    )
    b = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")
    return gates.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        b("too_short").alias("n_too_short"),
        b("low_stopword").alias("n_low_stopword"),
        b("repetitive").alias("n_repetitive"),
        b("low_distinct").alias("n_low_distinct"),
    )


@register(
    "q_curation_chunk_stride",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents WHERE doc_id < 150
), chunks AS (
  SELECT doc_id,
         CAST((s - 1) / 32 AS BIGINT) AS chunk_idx,
         t[s : LEAST(s + 63, len(t))] AS w
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t), 32)) AS s
    FROM toks WHERE len(t) >= 1
  )
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, chunk_idx,
       CAST(len(w) AS BIGINT) AS n_tokens,
       md5(array_to_string(w, ' ')) AS chunk_hash
FROM chunks
""",
    tags=("llm", "curation", "chunking"),
)
def q_curation_chunk_stride(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping training-window chunking (§2C curation): 64-token
    windows every 32 tokens, content-hashed for chunk-level dedup.
    Entirely map-side — see :func:`...operators.curation.chunk_tokens`.
    """
    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 150)
    return curation.chunk_tokens(d, chunk=64, stride=32).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "chunk_idx",
        "n_tokens",
        "chunk_hash",
    )


@register(
    "q_curation_data_card",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
         len(regexp_extract_all(lower(text),
             '\\b(the|and|of|to|in|is|that|for|with)\\b')) AS n_stop
  FROM documents
), base AS (
  SELECT doc_id, source, text, n_stop, len(t) AS n_tokens,
         len(list_distinct(t)) AS n_distinct_tokens,
         GREATEST(len(t) - 1, 0) AS n_bigrams
  FROM toks
), bg AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM toks WHERE len(t) >= 2
  )
), topbg AS (
  SELECT doc_id, MAX(c) AS top_bigram_count
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
), hashed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS h
  FROM documents
), dupness AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) > 1 AS is_dup
  FROM hashed
), verdict AS (
  SELECT b.doc_id, b.source, b.n_tokens,
         NOT (b.n_tokens < 30
              OR b.n_stop * 4 < b.n_tokens
              OR (COALESCE(t.top_bigram_count, 0) * 5 > b.n_bigrams
                  AND b.n_bigrams > 0)
              OR (b.n_tokens - b.n_distinct_tokens) * 10 > b.n_tokens * 7)
           AS keep,
         length(b.text) AS n_chars
  FROM base b LEFT JOIN topbg t USING (doc_id)
)
SELECT v.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(v.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(v.n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN v.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup_docs
FROM verdict v JOIN dupness d USING (doc_id)
GROUP BY v.source
""",
    tags=("llm", "curation", "reporting"),
)
def q_curation_data_card(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus data card (§2C curation): per source, the accounting a
    training run publishes — volume (docs/tokens/chars), quality-filter
    survivors, and exact-duplicate exposure — composed from the proven
    operators (:func:`...operators.curation.quality_filter`, the exact
    content hash of ``dedup.exact_duplicates``) in one pass per signal.
    Every number is an integer aggregate; the oracle restates the whole
    composition."""
    d = load_table(spark, sf, "documents")
    gates = curation.quality_filter(d)
    hashed = d.select(
        "doc_id",
        "source",
        F.length("text").alias("n_chars"),
        T.fingerprint(F.col("text")).alias("h"),
    )
    dup = hashed.withColumn(
        "is_dup",
        F.count(F.lit(1)).over(Window.partitionBy("h")) > 1,
    )
    g = dup.join(gates.select("doc_id", "n_tokens", "keep"), "doc_id")
    return g.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_dup_docs"),
    )


@register(
    "q_curation_length_buckets",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_tokens
  FROM documents
), bounds AS (
  SELECT MIN(n_tokens) AS lo, MAX(n_tokens) AS hi FROM toks
), bucketed AS (
  SELECT doc_id, n_tokens,
         CAST(((n_tokens - lo) * 8) // (hi - lo + 1) AS BIGINT) AS bucket
  FROM toks, bounds
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT) AS pad_waste
FROM bucketed GROUP BY bucket
""",
    tags=("llm", "curation", "batching"),
)
def q_curation_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence-length bucketing for efficient padded batching (§2C
    curation): 8 equal-width token-length bins group similar-length
    documents so per-batch padding waste (``max_len*n - sum(len)``)
    stays small — the dynamic-batching preprocessing step.  Equal-width
    (not NTILE) is the at-scale shape: bin bounds are one broadcast
    min/max aggregate and assignment is pure integer map-side
    arithmetic, where an exact equal-frequency NTILE would funnel every
    row through a single-partition global sort."""
    d = load_table(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)"
        ).alias("n_tokens"),
    )
    bounds = toks.agg(
        F.min("n_tokens").alias("lo"), F.max("n_tokens").alias("hi")
    )
    bucketed = toks.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr("CAST((n_tokens - lo) * 8 DIV (hi - lo + 1) AS BIGINT)"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.max("n_tokens") * F.count(F.lit(1)) - F.sum("n_tokens"))
        .cast("long")
        .alias("pad_waste"),
    )


@register(
    "q_curation_seen_filter",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_prior,
       CAST(COUNT(*) AS BIGINT) AS n_prior_seen
FROM documents WHERE doc_id % 3 = 0
GROUP BY source
""",
    tags=("curation", "dedup", "incremental"),
)
def q_curation_seen_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental cross-run dedup via the persistent seen-before
    filter (``operators/seenfilter.py``): a prior training corpus
    (every third document) is distilled into a Bloom filter, the FULL
    table is marked against it, and the oracle pins the filter's hard
    guarantee — **zero false negatives**: every prior document must
    come back ``seen_before``, so per source ``n_prior_seen`` equals
    ``n_prior`` exactly.  (The false-positive side is probabilistic by
    design and covered by the FPR-bound pytest, like the other sketch
    tiers.)  This is the "never re-train on what you already trained
    on" gate a growing 100 TB corpus runs on every increment, with the
    filter stored beside the topic in the S15 metadata KV."""
    from ..operators import seenfilter

    d = load_table(spark, sf, "documents")
    prior = d.filter(F.col("doc_id") % 3 == 0)
    blob = seenfilter.build_seen_filter(
        prior.select("text"), "text", expected_items=10_000, fpp=0.01
    )
    marked = seenfilter.mark_seen(d, "text", blob)
    return (
        marked.filter(F.col("doc_id") % 3 == 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_prior"),
            F.sum(F.col("seen_before").cast("long"))
            .cast("long")
            .alias("n_prior_seen"),
        )
    )
