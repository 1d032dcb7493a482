"""Streaming near-duplicate filtering — incremental MinHash-LSH dedup.

A training-data ingest pipeline rarely gets its corpus as one batch: new
crawl shards arrive continuously, and each new document must be admitted
or dropped *online*, against everything already admitted, without
re-scanning the corpus.  The reference's following model (reference
`AvroRawdataConsumer.java:97-111` tails a growing topic) has the same
shape; this module is its LLM-pipeline analogue over Structured
Streaming.

Design — all stages scale-shaped:

1. **Map-side banded signatures.**  Each document's MinHash signature and
   LSH band buckets are computed per-row with JVM expressions (no
   shuffle, no Python): shingle → ``xxhash64`` → ``num_hashes`` linear
   permutations folded with ``array_min`` → ``bands`` bucket hashes.
   The arithmetic is IDENTICAL to the batch tier
   (:func:`..operators.dedup.minhash_signatures` /
   :func:`..operators.dedup.minhash_lsh_pairs` — same permutation
   parameters, same Mersenne modulus, same band hash), so a document
   hashes to the same buckets whether it arrives in a batch backfill or
   on the stream.
2. **Stateful first-seen per bucket.**  ``applyInPandasWithState`` keyed
   by ``(band, sig)`` marks each bucket's first arrival; later documents
   hitting a marked bucket are flagged.  State per key is one boolean —
   O(distinct buckets) total, the same asymptotics as the batch LSH
   join's build side.
3. **Per-document verdict.**  A document is admitted iff *none* of its
   ``bands`` buckets had a prior occupant.  The admitted set is the
   greedy maximal-independent-set of the LSH collision graph in arrival
   order: no two admitted documents are LSH near-duplicate candidates of
   each other.  (A dropped document may chain off another *dropped*
   document — the same conservative transitive semantics as
   connected-components keep-one dedup, incrementally.)

Arrival order inside a micro-batch is made deterministic by sorting each
bucket group on the document id, so a bounded ``availableNow`` run is
exactly reproducible.

State retention: buckets are kept for the life of the query (NoTimeout) —
dedup state is inherently append-only.  A production deployment that only
needs dedup-within-a-horizon can bound it with a processing-time timeout
on the same keyed state; the state layout does not change.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import shingles_expr
from ..operators.dedup import _MERSENNE, _permutation_params
from .windows import run_available_now_update


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table as a bounded file-source stream."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def stream_documents_doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two mtime-ordered copies of documents (ids offset in the second),
    arriving in separate micro-batches — the cross-batch dedup probe:
    every second-batch document is an exact duplicate of a first-batch
    one and must be dropped by bucket state, not within-batch ordering."""
    staged = tempfile.mkdtemp(prefix="rawdata-docs-stream-")
    src = os.path.join(sf_dir, "documents.parquet")
    first = os.path.join(staged, "0-documents.parquet")
    shutil.copy(src, first)
    now = os.stat(first).st_mtime
    os.utime(first, (now, now))
    second = os.path.join(staged, "1-documents-again.parquet")
    shutil.copy(src, second)
    os.utime(second, (now + 1, now + 1))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(staged)
    )
    # offset ids in the duplicate file so the two copies are distinct
    # documents with identical text (10**10 clears every real doc_id)
    return raw.withColumn(
        "doc_id",
        F.when(
            F.input_file_name().contains("again"),
            F.col("doc_id") + F.lit(10**10),
        ).otherwise(F.col("doc_id")),
    )


def banded_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band, sig) — map-side LSH band buckets, batch-identical.

    Works on both batch and streaming DataFrames: every step is a
    per-row expression (shingle array → hash → permutation min fold →
    band hash), so the streaming plan stays shuffle-free up to the
    stateful operator.
    """
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    params = _permutation_params(num_hashes)
    hashed = F.transform(
        shingles_expr(text_col, k),
        lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)),
    )

    def _perm(a: int, b: int):
        # closure factory: F.transform inspects the callable's arity, so
        # the permutation constants cannot ride in as default arguments
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE))

    with_sig = docs.withColumn("_sh", hashed).select(
        F.col(id_col),
        *[
            F.array_min(F.transform(F.col("_sh"), _perm(a, b))).alias(f"mh_{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    return with_sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bucket")
    ).select(
        id_col,
        F.col("bucket.band").alias("band"),
        F.col("bucket.sig").alias("sig"),
    )


def first_seen_flags(
    banded: DataFrame, id_col: str = "doc_id", ttl_hours: float | None = None
) -> DataFrame:
    """(id, band, had_prior) — stateful first-arrival marking per bucket.

    Keyed by ``(band, sig)``; state is a single marker.  Within a
    micro-batch the group's rows are sorted by ``id_col`` so "first" is
    deterministic; across micro-batches the marker in the state store
    decides.  Output mode: update (one verdict row per input row).

    ``ttl_hours`` turns the filter into RECENCY-WINDOWED dedup for
    continuous tails: a marker untouched for longer than the window
    reads as absent, so a recurrence of the bucket is admitted again —
    the sliding-recency contract streaming dedup needs when "duplicate"
    only means "seen recently".  Expiry is lazy (checked on the next
    arrival, stamped with processing time): engine timers
    (ProcessingTimeTimeout) were measured to spin ``availableNow``
    drains indefinitely on this Spark version, so staleness lives in
    the state value instead.  Honest caveat: lazy expiry bounds the
    dedup SEMANTICS but not the physical store — rows for never-again
    -seen buckets persist until a checkpoint compaction or restart;
    SCALE.md's stream-stress rows size that growth.  The default
    (``None``) keeps markers forever — exact global dedup.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("band", LongType()),
            StructField("had_prior", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("seen", LongType()), StructField("last_ms", LongType())]
    )
    ttl_ms = int(ttl_hours * 3600 * 1000) if ttl_hours is not None else None

    def update(key, pdf_iter, state):
        import time as _time

        import pandas as pd

        now_ms = int(_time.time() * 1000)
        seen = False
        if state.exists:
            marker = state.get  # property, not a method
            last_ms = marker[1] if len(marker) > 1 and marker[1] else now_ms
            seen = ttl_ms is None or (now_ms - last_ms) <= ttl_ms
        pdfs = [pdf for pdf in pdf_iter if len(pdf)]
        if not pdfs:
            return
        rows = pd.concat(pdfs).sort_values(id_col)
        flags = []
        for _ in range(len(rows)):
            flags.append(1 if seen else 0)
            seen = True
        state.update((1, now_ms))
        yield pd.DataFrame(
            {
                id_col: rows[id_col].to_numpy(),
                "band": [key[0]] * len(rows),
                "had_prior": flags,
            }
        )

    return (
        banded.groupBy("band", "sig")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def near_dup_admitted(
    spark: SparkSession,
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    query_name: str | None = None,
    ttl_hours: float | None = None,
) -> DataFrame:
    """Run the bounded streaming filter; return admitted document ids.

    The banded + stateful stages run as one ``availableNow`` streaming
    query; the per-document any-band verdict is a batch aggregation over
    the drained verdict stream (in a continuous deployment the same
    aggregation runs per micro-batch inside ``foreachBatch``).
    """
    banded = banded_buckets(
        docs_stream, id_col, text_col, k=k, num_hashes=num_hashes, bands=bands
    )
    flags = run_available_now_update(
        first_seen_flags(banded, id_col, ttl_hours=ttl_hours), query_name
    )
    return (
        flags.groupBy(id_col)
        .agg(F.max("had_prior").alias("dup"))
        .filter(F.col("dup") == 0)
        .select(F.col(id_col).cast("long").alias(id_col))
    )
