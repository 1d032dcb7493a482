"""Seen-before Bloom filter: no false negatives, bounded FPR, merge,
KV persistence, and determinism."""

import numpy as np
import pytest

from rawdata_client_provider_gcs_spark.operators import seenfilter as SF


def _docs(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        F.col("id").alias("doc_id"),
    )


def test_no_false_negatives_and_bounded_fpr(spark):
    prior = _docs(spark, 0, 2000)
    blob = SF.build_seen_filter(prior, "text", expected_items=2000, fpp=0.01)

    marked_prior = SF.mark_seen(prior, "text", blob).collect()
    assert all(r["seen_before"] for r in marked_prior)  # NEVER misses

    fresh = _docs(spark, 100_000, 104_000)
    fp = SF.mark_seen(fresh, "text", blob).filter("seen_before").count()
    assert fp / 4000 <= 0.03  # ~3x headroom over the 1% design point

    unseen = SF.filter_unseen(fresh, "text", blob)
    assert unseen.count() == 4000 - fp
    assert "seen_before" not in unseen.columns
    # deterministic: same corpus -> byte-identical filter
    assert blob == SF.build_seen_filter(
        prior, "text", expected_items=2000, fpp=0.01
    )


def test_merge_across_increments(spark):
    a = _docs(spark, 0, 500)
    b = _docs(spark, 500, 1000)
    fa = SF.build_seen_filter(a, "text", expected_items=1000, fpp=0.01)
    fb = SF.build_seen_filter(b, "text", expected_items=1000, fpp=0.01)
    merged = SF.merge_seen_filters(fa, fb)
    both = _docs(spark, 0, 1000)
    assert SF.mark_seen(both, "text", merged).filter("seen_before").count() == 1000
    # merged equals building over the union (pure OR of deterministic bits)
    assert merged == SF.build_seen_filter(
        both, "text", expected_items=1000, fpp=0.01
    )
    with pytest.raises(ValueError, match="different params"):
        SF.merge_seen_filters(
            fa, SF.build_seen_filter(b, "text", expected_items=50, fpp=0.01)
        )


def test_kv_persistence_roundtrip(spark, tmp_path):
    from rawdata_client_provider_gcs_spark import RawdataClient

    client = RawdataClient(spark, str(tmp_path))
    md = client.metadata("corpus-v1")
    blob = SF.build_seen_filter(
        _docs(spark, 0, 100), "text", expected_items=100
    )
    SF.save_seen_filter(md, "engine-seen-filter.v1", blob)
    back = SF.load_seen_filter(md, "engine-seen-filter.v1")
    assert back == blob
    with pytest.raises(KeyError):
        SF.load_seen_filter(md, "engine-seen-filter.v2")
    client.close()


def test_params_and_blob_validation():
    m, k = SF.bloom_params(10_000, 0.01)
    assert m % 64 == 0 and 6 <= k <= 8  # textbook ~9.6 bits/item, k~7
    with pytest.raises(ValueError):
        SF.bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        SF._parse(b"garbage")


# -- RWSF2 (Spark sketch) format -------------------------------------------


def test_spark_probe_matches_jvm_might_contain(spark):
    """The numpy Murmur3 + scatter replication is bit-exact against the
    JVM's BloomFilter.mightContainLong — members AND random non-members
    (VERDICT r6 task #4; any drift here would break the RWSF2
    no-false-negative contract)."""
    blob = SF.build_seen_filter(
        _docs(spark, 0, 500), "text", expected_items=500, fpp=0.01
    )
    assert blob[: len(SF._MAGIC2)] == SF._MAGIC2  # default is RWSF2
    k, seed, words = SF._parse_spark(blob)

    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(
        bytearray(blob[len(SF._MAGIC2):])
    )
    jbf = jvm.org.apache.spark.util.sketch.BloomFilter.readFrom(bais)

    rng = np.random.default_rng(7)
    items = rng.integers(-(2**63), 2**63, 5000, np.int64)
    mine = SF._spark_probe(items, k, seed, words)
    theirs = np.array([jbf.mightContainLong(int(v)) for v in items])
    assert (mine == theirs).all()
    # and the filter's own members all hit through BOTH probes
    member_hashes = np.array(
        [
            r["h"]
            for r in _docs(spark, 0, 500)
            .selectExpr("xxhash64(text) AS h")
            .collect()
        ],
        np.int64,
    )
    assert SF._spark_probe(member_hashes, k, seed, words).all()
    assert all(jbf.mightContainLong(int(v)) for v in member_hashes)


def test_python_format_still_available_and_formats_do_not_merge(spark):
    docs = _docs(spark, 0, 300)
    py_blob = SF.build_seen_filter(
        docs, "text", expected_items=300, hashing="python"
    )
    assert py_blob[: len(SF._MAGIC)] == SF._MAGIC
    sp_blob = SF.build_seen_filter(
        docs, "text", expected_items=300, hashing="spark"
    )
    assert sp_blob[: len(SF._MAGIC2)] == SF._MAGIC2
    # both honor the contract on the same corpus
    for blob in (py_blob, sp_blob):
        assert SF.mark_seen(docs, "text", blob).filter(
            "NOT seen_before"
        ).count() == 0
    with pytest.raises(ValueError, match="different formats"):
        SF.merge_seen_filters(py_blob, sp_blob)
    with pytest.raises(ValueError, match="different formats"):
        SF.merge_seen_filters(sp_blob, py_blob)
    with pytest.raises(ValueError):
        SF.build_seen_filter(docs, "text", 300, hashing="nope")


def test_spark_format_merge_matches_union_build(spark):
    a, b = _docs(spark, 0, 400), _docs(spark, 400, 800)
    fa = SF.build_seen_filter(a, "text", expected_items=800, hashing="spark")
    fb = SF.build_seen_filter(b, "text", expected_items=800, hashing="spark")
    merged = SF.merge_seen_filters(fa, fb)
    union = SF.build_seen_filter(
        _docs(spark, 0, 800), "text", expected_items=800, hashing="spark"
    )
    assert merged == union  # pure OR of deterministic bits
    assert (
        SF.mark_seen(_docs(spark, 0, 800), "text", merged)
        .filter("NOT seen_before")
        .count()
        == 0
    )
    # param mismatch refuses
    small = SF.build_seen_filter(a, "text", expected_items=50, hashing="spark")
    with pytest.raises(ValueError, match="different"):
        SF.merge_seen_filters(fa, small)


@pytest.mark.parametrize(
    "n,fpp", [(50, 0.3), (200, 0.1), (500, 0.01), (300, 0.001)]
)
def test_spark_probe_replication_across_geometries(spark, n, fpp):
    """The numpy V2 scatter must track the JVM across filter GEOMETRIES
    — k ranges ~2..10 over these (n, fpp) combos, exercising different
    probe counts, bit sizes, and wraparound patterns."""
    blob = SF.build_seen_filter(
        _docs(spark, 0, n), "text", expected_items=n, fpp=fpp
    )
    k, seed, words = SF._parse_spark(blob)
    jvm = spark._jvm
    jbf = jvm.org.apache.spark.util.sketch.BloomFilter.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(blob[len(SF._MAGIC2):]))
    )
    rng = np.random.default_rng(n)
    items = rng.integers(-(2**63), 2**63, 1500, np.int64)
    mine = SF._spark_probe(items, k, seed, words)
    theirs = np.array([jbf.mightContainLong(int(v)) for v in items])
    assert (mine == theirs).all(), f"k={k} diverged"


def test_extend_seen_filter_upgrade_path(spark):
    """A persisted RWSF1 filter from an earlier release keeps growing
    as RWSF1 through extend_seen_filter even though fresh builds
    default to RWSF2 — and an RWSF2 prior extends in place too."""
    prior_docs, new_docs = _docs(spark, 0, 300), _docs(spark, 300, 600)
    for fmt in ("python", "spark"):
        prior = SF.build_seen_filter(
            prior_docs, "text", expected_items=600, hashing=fmt
        )
        assert SF.filter_format(prior) == fmt
        grown = SF.extend_seen_filter(prior, new_docs, "text")
        assert SF.filter_format(grown) == fmt
        # the hard contract holds over the union
        assert (
            SF.mark_seen(_docs(spark, 0, 600), "text", grown)
            .filter("NOT seen_before")
            .count()
            == 0
        )
    with pytest.raises(ValueError, match="not a seen-filter"):
        SF.filter_format(b"garbage")


def test_auto_falls_back_when_spark_blob_is_not_v2(spark, monkeypatch):
    """A JVM sketch that serializes a non-V2 wire format must trip the
    RWSF1 fallback in auto mode at BUILD time — not return a blob every
    later mark_seen/merge/extend rejects (ADVICE r7 #3)."""
    import struct

    def fake_v1_build(df, col, expected_items, m_bits):
        # V1 layout: version=1, numHashFunctions, numWords (no seed)
        return SF._MAGIC2 + struct.pack(">3i", 1, 3, 2) + b"\x00" * 16

    monkeypatch.setattr(SF, "_build_spark_filter", fake_v1_build)
    docs = _docs(spark, 0, 50)
    blob = SF.build_seen_filter(docs, "text", expected_items=100, hashing="auto")
    assert SF.filter_format(blob) == "python"  # fell back, usable blob
    seen = SF.mark_seen(docs, "text", blob)
    assert seen.where("seen_before").count() == 50
    # explicit spark mode must still surface the incompatibility loudly
    with pytest.raises(ValueError, match="version"):
        SF.build_seen_filter(docs, "text", expected_items=100, hashing="spark")
