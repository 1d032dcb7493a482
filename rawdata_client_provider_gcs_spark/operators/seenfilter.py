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

Two wire formats, one contract:

- ``RWSF1`` — the original pure-Python filter (xxhash64 double
  hashing, little-endian byte bitmap).  Build and probe are
  Arrow-batched numpy; works on any Spark.
- ``RWSF2`` — Spark's own ``BloomFilterImplV2`` blob (built through
  the PUBLIC sketch API ``df.stat.bloomFilter`` over ``xxhash64(col)``;
  measured 3.7× faster to build than the RWSF1 mapInPandas bitmap at
  2M items — see PERF.md round 7 / ``tools/bloom_compare.py``).  The
  probe replicates the JVM's Murmur3_x86_32 + scatter in vectorized
  numpy, pinned bit-exact against ``BloomFilter.mightContainLong`` by
  pytest, so probing needs no JVM round-trip and a persisted filter
  stays readable by plain ``BloomFilter.readFrom``.

``build_seen_filter(hashing="auto")`` prefers RWSF2 and falls back to
RWSF1 if the sketch bridge is unreachable; every other operation
(:func:`mark_seen`, :func:`merge_seen_filters`, persistence) dispatches
on the blob magic, so increments of either format keep working.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"RWSF1\x00"
_MAGIC2 = b"RWSF2\x00"
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


# -- RWSF2: Spark BloomFilterImplV2 replication ----------------------------


def _mm3_hash_long(v: np.ndarray, seed: np.ndarray | np.uint32) -> np.ndarray:
    """Vectorized Murmur3_x86_32.hashLong (the sketch module's hash):
    the long is mixed as its low then high 32-bit halves, finalized with
    length 8.  Returns uint32; bit-exact vs the JVM (pytest-pinned)."""
    v = v.astype(np.int64).view(np.uint64)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)

    def mix_k1(k1):
        k1 = k1 * c1
        k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
        return k1 * c2

    def mix_h1(h1, k1):
        h1 = h1 ^ k1
        h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
        return h1 * np.uint32(5) + np.uint32(0xE6546B64)

    h1 = mix_h1(
        np.broadcast_to(np.asarray(seed, np.uint32), v.shape).copy(),
        mix_k1(v.astype(np.uint32)),
    )
    h1 = mix_h1(h1, mix_k1((v >> np.uint64(32)).astype(np.uint32)))
    h1 ^= np.uint32(8)  # fmix(h1, 8): 8 bytes hashed
    h1 ^= h1 >> np.uint32(16)
    h1 = h1 * np.uint32(0x85EBCA6B)
    h1 ^= h1 >> np.uint32(13)
    h1 = h1 * np.uint32(0xC2B2AE35)
    h1 ^= h1 >> np.uint32(16)
    return h1


def _parse_spark(blob: bytes) -> tuple[int, int, np.ndarray]:
    """(k, seed, words) from an RWSF2 blob (Spark V2 writeTo layout:
    int32-BE version=2, numHashFunctions, seed, numWords, then
    big-endian long words)."""
    off = len(_MAGIC2)
    ver, k, seed, nwords = struct.unpack_from(">4i", blob, off)
    if ver != 2:
        raise ValueError(f"unsupported Spark bloom-filter version {ver}")
    words = np.frombuffer(blob, ">u8", nwords, off + 16).astype(np.uint64)
    return k, seed, words


def _spark_probe(
    items: np.ndarray, k: int, seed: int, words: np.ndarray
) -> np.ndarray:
    """Vectorized BloomFilterImplV2.mightContainLong: hi/lo Murmur pair,
    then ``acc = hi·Integer.MAX_VALUE; k × {acc += lo; flip-if-negative;
    % bitSize}`` — the JVM's exact scatter (int64 wraparound matches
    Java long arithmetic)."""
    hi = _mm3_hash_long(items, np.uint32(seed)).astype(np.int32)
    lo = _mm3_hash_long(items, hi.view(np.uint32)).astype(np.int32)
    bit_size = np.int64(len(words) * 64)
    acc = hi.astype(np.int64) * np.int64(2147483647)
    lo64 = lo.astype(np.int64)
    hits = np.ones(len(items), bool)
    for _ in range(k):
        acc = acc + lo64
        c = np.where(acc < 0, ~acc, acc)
        idx = c % bit_size
        bit = (
            words[(idx >> np.int64(6)).astype(np.int64)]
            >> (idx.astype(np.uint64) & np.uint64(63))
        ) & np.uint64(1)
        hits &= bit.astype(bool)
    return hits


def _build_spark_filter(
    df: DataFrame, col: str, expected_items: int, m_bits: int
) -> bytes:
    """RWSF2 build through the PUBLIC sketch API: aggregate
    ``xxhash64(col)`` with ``Dataset.stat.bloomFilter`` (JVM-side
    partial aggregation, no Arrow transfer) and serialize with the
    filter's own ``writeTo``."""
    hashed = df.select(F.xxhash64(F.col(col)).alias("__sf_item"))
    jbf = hashed._jdf.stat().bloomFilter("__sf_item", expected_items, m_bits)
    jvm = df.sparkSession._jvm
    baos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(baos)
    return _MAGIC2 + bytes(baos.toByteArray())


def build_seen_filter(
    df: DataFrame,
    col: str,
    expected_items: int,
    fpp: float = 0.01,
    hashing: str = "auto",
) -> bytes:
    """Distill ``df[col]``'s values into a Bloom filter blob.

    ``hashing``: ``"spark"`` builds an RWSF2 blob via the JVM sketch
    aggregate (fastest; default when reachable), ``"python"`` the
    original RWSF1 numpy bitmap, ``"auto"`` tries spark then falls
    back.  Both formats honor the same no-false-negative contract and
    the same ``fpp`` design point.
    """
    m, k = bloom_params(expected_items, fpp)
    if hashing not in ("auto", "spark", "python"):
        raise ValueError(f"unknown hashing {hashing!r}")
    if hashing in ("auto", "spark"):
        try:
            blob = _build_spark_filter(df, col, expected_items, m)
            # validate the wire format INSIDE the try: a Spark build
            # whose sketch serializes a version this module cannot
            # parse (e.g. V1 without the seed field) returns fine but
            # every later mark_seen/merge/extend would reject it — in
            # auto mode that must trigger the RWSF1 fallback now, not
            # poison the persisted filter (ADVICE r7 #3)
            _parse_spark(blob)
            return blob
        except Exception as exc:
            if hashing == "spark":
                raise
            # availability probing is inherently broad (the sketch
            # bridge can fail many ways on exotic deployments), but the
            # fallback must never be silent: the python build is ~2-3x
            # slower and emits the other wire format
            import logging  # noqa: PLC0415

            logging.getLogger(__name__).warning(
                "native sketch build failed (%s: %s); falling back to "
                "the RWSF1 python build",
                type(exc).__name__,
                str(exc)[:200],
            )
    return _build_python_filter(df, col, m, k)


def _build_python_filter(
    df: DataFrame, col: str, m: int, k: int
) -> bytes:
    """The RWSF1 numpy-bitmap build (original path; any-Spark fallback)."""
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


def filter_format(blob: bytes) -> str:
    """``"spark"`` (RWSF2) or ``"python"`` (RWSF1) — the value to pass
    as ``build_seen_filter(hashing=...)`` to produce a merge-compatible
    increment for an existing persisted filter."""
    if blob[: len(_MAGIC2)] == _MAGIC2:
        return "spark"
    if blob[: len(_MAGIC)] == _MAGIC:
        return "python"
    raise ValueError("not a seen-filter blob")


def extend_seen_filter(prior: bytes, df: DataFrame, col: str) -> bytes:
    """Build an increment over ``df[col]`` in ``prior``'s exact format
    AND geometry, and return the OR-merge — the upgrade-safe way to
    grow a persisted filter: an RWSF1 blob stored by an earlier release
    keeps extending as RWSF1 even though fresh builds default to RWSF2.
    """
    if filter_format(prior) == "python":
        m, k, _ = _parse(prior)
        return merge_seen_filters(prior, _build_python_filter(df, col, m, k))
    k, _seed, words = _parse_spark(prior)
    m = len(words) * 64
    # invert Spark's optimalNumOfHashFunctions(n, m) = round(m/n·ln2)
    # so the increment's header (k, numWords) matches the prior's
    n = max(1, round(m * math.log(2) / k))
    inc = _build_spark_filter(df, col, n, m)
    off = len(_MAGIC2)
    if inc[off : off + 16] != prior[off : off + 16]:
        raise ValueError(
            "could not reproduce the prior filter's geometry "
            f"(k={k}, m={m}); rebuild from the full corpus instead"
        )
    return merge_seen_filters(prior, inc)


def _parse(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[: len(_MAGIC2)] == _MAGIC2:
        k, seed, words = _parse_spark(blob)
        return len(words) * 64, k, words
    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a seen-filter blob")
    m, k = struct.unpack_from("<QI", blob, len(_MAGIC))
    bits = np.frombuffer(blob, np.uint8, m // 8, len(_MAGIC) + 12)
    return m, k, bits


def merge_seen_filters(*blobs: bytes) -> bytes:
    """OR-merge filters built with identical parameters (increments).

    Same-format only: RWSF1 merges byte bitmaps, RWSF2 merges the V2
    word arrays (header — version, k, seed, numWords — must match, the
    same rule the JVM's ``mergeInPlace`` enforces); the result stays
    readable by ``BloomFilter.readFrom``."""
    if blobs[0][: len(_MAGIC2)] == _MAGIC2:
        off = len(_MAGIC2)
        hdr0 = blobs[0][off : off + 16]
        _, _, acc = _parse_spark(blobs[0])
        acc = acc.copy()
        for blob in blobs[1:]:
            if blob[: len(_MAGIC2)] != _MAGIC2 or blob[off : off + 16] != hdr0:
                raise ValueError(
                    "cannot merge filters of different formats or different params"
                )
            _, _, words = _parse_spark(blob)
            acc |= words
        return _MAGIC2 + hdr0 + acc.astype(">u8").tobytes()
    m0, k0, acc = _parse(blobs[0])
    acc = acc.copy()
    for blob in blobs[1:]:
        if blob[: len(_MAGIC2)] == _MAGIC2:
            raise ValueError(
                "cannot merge filters of different formats or different params"
            )
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
    filter (guaranteed True for every value it was built from).

    Dispatches on the blob format: RWSF1 probes the xxhash64 double-hash
    bitmap, RWSF2 probes Spark's V2 filter with the numpy Murmur3
    replication — both Arrow-batched, filter broadcast via closure."""
    if blob[: len(_MAGIC2)] == _MAGIC2:
        k, seed, words = _parse_spark(blob)
        words = words.copy()  # own the buffer for pickling
        hashed = df.select("*", F.xxhash64(F.col(col)).alias("__h1"))

        def probe(batches):
            for pdf in batches:
                if len(pdf):
                    hit = _spark_probe(
                        pdf["__h1"].to_numpy(), k, seed, words
                    )
                    pdf = pdf.assign(**{flag_col: hit})
                else:
                    pdf = pdf.assign(**{flag_col: np.array([], bool)})
                yield pdf.drop(columns=["__h1"])

    else:
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
