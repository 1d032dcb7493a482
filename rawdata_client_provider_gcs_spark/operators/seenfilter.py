"""Persistent seen-before filter: incremental cross-run dedup.

The missing artifact between exact dedup (needs the prior corpus
online) and HLL sketches (count, but no membership test): a corpus
that has already been trained on is distilled into a Bloom filter, and
every NEW crawl increment is marked against it — **no false
negatives** (nothing already trained on sneaks back in), a tunable
false-positive rate (a sliver of genuinely-fresh data discarded, the
safe direction for training dedup), OR-mergeable across increments,
and small enough to broadcast and to store as an S15 metadata value
beside the topic (like the vector indexes).

Scale shape:

- build: hashes are JVM-side (``xxhash64`` twice, Kirsch-Mitzenmacher
  double hashing for the k probes), the bit array is assembled as ONE
  numpy bitmap per partition inside ``mapInPandas`` and OR-merged; the
  partition count for the bitmap stage is capped so the merge sees a
  bounded number of ``m/8``-byte blobs.
- probe: the filter broadcasts via closure capture; per-row work is k
  vectorized bit tests against the shared array — Arrow-batched, the
  documented justified-UDF case (k random probes into a multi-MB bit
  array have no builtin-expression form).

Parameters follow the standard formulas: ``m = -n·ln p / (ln 2)²``
bits, ``k = (m/n)·ln 2`` probes.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"RWSF1\x00"
#: the bitmap-build stage is coalesced to at most this many partitions,
#: bounding the merge to n_parts * m/8 bytes
_MAX_BITMAP_PARTITIONS = 16
#: independent second hash: a fixed salt column for xxhash64 (the
#: golden-ratio constant, expressed as the SIGNED 64-bit value a
#: LongType literal can carry)
_SALT = 0x9E3779B97F4A7C15 - (1 << 64)  # == -7046029254386353131


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for the target capacity and false-positive rate."""
    if expected_items < 1 or not (0.0 < fpp < 1.0):
        raise ValueError("expected_items >= 1 and 0 < fpp < 1 required")
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) & ~63)  # whole 64-bit words
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _hash_cols(col: str):
    return (
        F.xxhash64(F.col(col)).alias("__h1"),
        F.xxhash64(F.col(col), F.lit(_SALT)).alias("__h2"),
    )


def _probe_indexes(h1: np.ndarray, h2: np.ndarray, m: int, k: int):
    """(rows, k) bit indexes via double hashing, matching build+probe."""
    # unsigned 64-bit arithmetic; numpy wraps like the JVM's long
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    idx = np.empty((len(a), k), np.uint64)
    for i in range(k):
        idx[:, i] = (a + np.uint64(i) * b) % np.uint64(m)
    return idx


def build_seen_filter(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
) -> bytes:
    """Distill ``df[col]``'s values into a Bloom filter blob."""
    m, k = bloom_params(expected_items, fpp)
    n_bytes = m // 8

    hashed = df.select(*_hash_cols(col))
    n_parts = hashed.rdd.getNumPartitions()
    if n_parts > _MAX_BITMAP_PARTITIONS:
        hashed = hashed.coalesce(_MAX_BITMAP_PARTITIONS)

    def to_bitmaps(batches):
        import pandas as pd

        bits = np.zeros(n_bytes, np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            idx = _probe_indexes(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m, k
            ).ravel()
            np.bitwise_or.at(
                bits, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
            )
        if any_rows:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    blobs = hashed.mapInPandas(to_bitmaps, "bitmap binary").collect()
    bits = np.zeros(n_bytes, np.uint8)
    for r in blobs:
        bits |= np.frombuffer(bytes(r["bitmap"]), np.uint8)
    return _MAGIC + struct.pack("<QI", m, k) + bits.tobytes()


def _parse(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a seen-filter blob")
    m, k = struct.unpack_from("<QI", blob, len(_MAGIC))
    bits = np.frombuffer(blob, np.uint8, m // 8, len(_MAGIC) + 12)
    return m, k, bits


def merge_seen_filters(*blobs: bytes) -> bytes:
    """OR-merge filters built with identical parameters (increments)."""
    m0, k0, acc = _parse(blobs[0])
    acc = acc.copy()
    for blob in blobs[1:]:
        m, k, bits = _parse(blob)
        if (m, k) != (m0, k0):
            raise ValueError(
                f"cannot merge filters with different params: "
                f"({m0},{k0}) vs ({m},{k})"
            )
        acc |= bits
    return _MAGIC + struct.pack("<QI", m0, k0) + acc.tobytes()


def mark_seen(
    df: DataFrame, col: str, blob: bytes, flag_col: str = "seen_before"
) -> DataFrame:
    """Attach ``flag_col``: True when ``col``'s value might be in the
    filter (guaranteed True for every value it was built from)."""
    m, k, bits = _parse(blob)
    bits = bits.copy()  # own the buffer for pickling into the closure

    hashed = df.select("*", *_hash_cols(col))

    def probe(batches):
        for pdf in batches:
            if len(pdf):
                idx = _probe_indexes(
                    pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m, k
                )
                hit = (
                    bits[(idx >> np.uint64(3)).astype(np.int64)]
                    >> (idx & np.uint64(7)).astype(np.uint8)
                ) & 1
                pdf = pdf.assign(**{flag_col: hit.all(axis=1)})
            else:
                pdf = pdf.assign(**{flag_col: np.array([], bool)})
            yield pdf.drop(columns=["__h1", "__h2"])

    from pyspark.sql.types import BooleanType, StructField, StructType

    # build a FRESH StructType: StructType.add mutates in place, and
    # df.schema hands back the DataFrame's cached schema object — using
    # .add would corrupt df's own schema for every later caller
    out_schema = StructType(
        list(df.schema.fields) + [StructField(flag_col, BooleanType())]
    )
    return hashed.mapInPandas(probe, out_schema)


def filter_unseen(df: DataFrame, col: str, blob: bytes) -> DataFrame:
    """Rows whose value is definitely NOT in the prior corpus."""
    return (
        mark_seen(df, col, blob, "__seen")
        .filter(~F.col("__seen"))
        .drop("__seen")
    )


def save_seen_filter(metadata_client, key: str, blob: bytes):
    """Persist beside the topic (S15 metadata KV), like vector indexes."""
    metadata_client.put(key, blob)
    return metadata_client


def load_seen_filter(metadata_client, key: str) -> bytes:
    blob = metadata_client.get(key)
    if blob is None:
        raise KeyError(f"no seen-filter under metadata key {key!r}")
    _parse(blob)  # validate before handing out
    return blob
