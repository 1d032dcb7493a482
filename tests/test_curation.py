"""Curation-operator properties the oracle can't express: determinism
across runs, subset-stability of hash splits, redaction completeness,
packing layout invariants."""

import pytest
from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.functions import text as T
from rawdata_client_provider_gcs_spark.operators import curation
from rawdata_client_provider_gcs_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    return load_table(spark, sf_smoke_dir, "documents")


def test_split_deterministic_and_subset_stable(spark, docs):
    """Same assignment on rerun AND on any subset — the anti-leakage
    property rand()-based splits can't give."""
    full = {
        r["doc_id"]: r["split"]
        for r in curation.train_val_test_split(docs, "doc_id").collect()
    }
    again = {
        r["doc_id"]: r["split"]
        for r in curation.train_val_test_split(docs, "doc_id").collect()
    }
    assert full == again
    sub = {
        r["doc_id"]: r["split"]
        for r in curation.train_val_test_split(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id"
        ).collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    # 5%/5% within generous tolerance on 500 docs
    n = len(full)
    n_val = sum(1 for v in full.values() if v == "val")
    n_test = sum(1 for v in full.values() if v == "test")
    assert 0.01 <= n_val / n <= 0.12 and 0.01 <= n_test / n <= 0.12


def test_split_salt_reshuffles(spark, docs):
    a = {
        r["doc_id"]: r["split"]
        for r in curation.train_val_test_split(docs, "doc_id", salt="v1").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in curation.train_val_test_split(docs, "doc_id", salt="v2").collect()
    }
    assert a != b  # different epoch/version -> different assignment


def test_redact_pii_scrubs_everything(spark, docs):
    planted = docs.limit(50).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" mail a.b+c@x-y.example.org ip 192.168.0.255 tel +47 (22) 33-44-55 end"),
        ),
    )
    r = curation.redact_pii(planted, "text")
    leftovers = r.filter(
        F.col("text_redacted").rlike(curation.PII_PATTERNS["email"])
        | F.col("text_redacted").rlike(curation.PII_PATTERNS["ipv4"])
        | F.col("text_redacted").rlike(curation.PII_PATTERNS["phone"])
    ).count()
    assert leftovers == 0
    sums = r.agg(
        F.sum("n_email").alias("e"), F.sum("n_ipv4").alias("i"), F.sum("n_phone").alias("p")
    ).first()
    assert sums["e"] >= 50 and sums["i"] >= 50 and sums["p"] >= 50


def test_pack_sequences_layout_invariants(spark, docs):
    packed = curation.pack_sequences(
        docs, "doc_id", T.token_count("text"), block_tokens=512
    ).collect()
    packed.sort(key=lambda r: r["doc_id"])
    stream_pos = 0
    for r in packed:
        assert 0 <= r["pack_offset"] < 512
        assert r["pack_id"] * 512 + r["pack_offset"] == stream_pos
        stream_pos += r["n_tokens"]


def test_stratified_sample_deterministic_counts(spark, docs):
    s1 = curation.stratified_sample(docs, "lang", "doc_id", n_per_stratum=7)
    per = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(v <= 7 for v in per.values())
    s2 = curation.stratified_sample(docs, "lang", "doc_id", n_per_stratum=7)
    assert {r["doc_id"] for r in s1.collect()} == {r["doc_id"] for r in s2.collect()}


def test_weighted_mix_fractions_and_tags(spark, docs):
    mixed = curation.weighted_mix(
        [
            ("heavy", docs.filter(F.col("doc_id") % 2 == 0), 0.9),
            ("light", docs.filter(F.col("doc_id") % 2 == 1), 0.1),
        ],
        key="doc_id",
    )
    got = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    half = docs.count() / 2
    assert got["heavy"] / half > 0.75 and got["light"] / half < 0.25


def test_pack_sequences_per_shard(spark, docs):
    """Sharded packing = independent per-shard layouts, no global sort."""
    packed = curation.pack_sequences(
        docs, "doc_id", T.token_count("text"), block_tokens=512,
        partition_cols=["lang"],
    ).collect()
    by_lang = {}
    for r in sorted(packed, key=lambda r: (r["lang"], r["doc_id"])):
        pos = by_lang.get(r["lang"], 0)
        assert r["pack_id"] * 512 + r["pack_offset"] == pos
        by_lang[r["lang"]] = pos + r["n_tokens"]
    assert len(by_lang) > 1
    # plan partitions by lang, not a single global sort
    plan = curation.pack_sequences(
        docs, "doc_id", T.token_count("text"), block_tokens=512,
        partition_cols=["lang"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(lang" in plan


def test_hash_bucket_rejects_unknown_on_null(spark, docs):
    """A typo like on_null='none' must raise, not silently disable the
    NULL-leakage guard."""
    from rawdata_client_provider_gcs_spark.operators.curation import hash_bucket

    with pytest.raises(ValueError, match="on_null"):
        hash_bucket("doc_id", on_null="none")


def test_epoch_shuffle_deterministic_and_epoch_varying(spark):
    """Same epoch -> identical order across runs; different epochs ->
    different orders; every rank is a 1..n permutation per shard."""
    from rawdata_client_provider_gcs_spark.operators import curation as C

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("shard")
    )
    a1 = C.epoch_shuffle(df, "doc_id", epoch=1, partition_col="shard")
    a2 = C.epoch_shuffle(df, "doc_id", epoch=1, partition_col="shard")
    b = C.epoch_shuffle(df, "doc_id", epoch=2, partition_col="shard")
    key = lambda rows: sorted((r["doc_id"], r["shuffle_rank"]) for r in rows)
    o1, o2, ob = key(a1.collect()), key(a2.collect()), key(b.collect())
    assert o1 == o2          # rerun-stable
    assert o1 != ob          # epoch changes the order
    per_shard = (
        a1.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("shuffle_rank").alias("nd"),
            F.max("shuffle_rank").alias("mx"),
        )
        .collect()
    )
    for r in per_shard:
        assert r["n"] == r["nd"] == r["mx"]  # exact 1..n permutation


def test_domain_cap_unbiased_and_stable(spark):
    """Caps each domain at N, keeps small domains whole, survives reruns
    identically, and the kept set is hash-chosen (not a doc_id prefix)."""
    from rawdata_client_provider_gcs_spark.operators import curation as C

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    kept1 = C.domain_cap(df, "source", "doc_id", max_per_domain=30)
    kept2 = C.domain_cap(df, "source", "doc_id", max_per_domain=30)
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    assert ids1 == sorted(r["doc_id"] for r in kept2.collect())  # stable
    by_src = {r["source"]: r["n"] for r in kept1.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_src == {"big": 30, "small": 20}  # capped vs kept-whole
    big_kept = [i for i in ids1 if i < 80]
    assert big_kept != list(range(30)), "cap must not be an id-order prefix"
    with pytest.raises(ValueError):
        C.domain_cap(df, "source", "doc_id", max_per_domain=0)


def test_quality_filter_gates_discriminate(spark):
    """Planted fixtures: real prose passes, each failure mode trips
    exactly its own gate.  (The synthetic corpus is stopword-free
    keyword soup, so in the catalog query the low_stopword gate fires
    for every document — by construction, not by bug; this test is
    where gate discrimination is proven.)"""
    from rawdata_client_provider_gcs_spark.operators import curation

    prose = (
        "the quick brown fox jumps over the lazy dog and runs off to the "
        "river in the morning light for a long drink of cold water with "
        "friends that wait in the shade of the old willow tree every day"
    )
    docs = spark.createDataFrame(
        [
            (1, prose),  # keeps: long, stopword-rich, varied
            (2, "short text only"),  # too_short
            (3, " ".join(["alpha beta"] * 40)),  # repetitive + low_distinct
            (4, " ".join(f"w{i}" for i in range(60))),  # low_stopword only
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in curation.quality_filter(docs).collect()}
    assert got[1]["keep"] and not any(
        got[1][g] for g in ("too_short", "low_stopword", "repetitive", "low_distinct")
    )
    assert got[2]["too_short"] and not got[2]["keep"]
    assert got[3]["repetitive"] and got[3]["low_distinct"] and not got[3]["keep"]
    assert got[4]["low_stopword"] and not got[4]["too_short"]
    assert not got[4]["repetitive"] and not got[4]["low_distinct"]
