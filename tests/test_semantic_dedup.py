"""SemDeDup invariants: planted duplicate groups keep exactly their
minimum id, distinct groups survive intact, both clustering paths."""

import math

import pytest

from rawdata_client_provider_gcs_spark.operators import similarity


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _fixture(spark):
    """Three well-separated direction groups in R^4; within each group
    the vectors are tiny perturbations (cosine ~0.999), across groups
    cosine <= ~0.7."""
    base = {
        10: [1.0, 0.0, 0.0, 0.0],
        20: [0.0, 1.0, 0.0, 0.0],
        30: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    for gid, b in base.items():
        for j in range(4):  # ids gid, gid+1, gid+2, gid+3 are near-dups
            v = list(b)
            v[(j + 1) % 4] += 0.01 * (j + 1)
            rows.append((gid + j, gid, _unit(v)))
    # one singleton far from every group
    rows.append((99, 99, _unit([1.0, 1.0, 1.0, 1.0])))
    return spark.createDataFrame(
        rows, "vec_id long, group long, embedding array<double>"
    )


def test_blocked_path_keeps_min_id_per_group(spark):
    df = _fixture(spark)
    kept = similarity.semantic_dedup(
        df, threshold=0.95, block_col="group"
    ).toPandas()
    assert sorted(kept["vec_id"]) == [10, 20, 30, 99]


def test_kmeans_path_keeps_min_id_per_group(spark):
    df = _fixture(spark)
    kept = similarity.semantic_dedup(df, threshold=0.95, nlist=4, seed=7)
    got = sorted(kept.toPandas()["vec_id"])
    # k-means with k=4 on three tight direction groups + a singleton
    # must isolate the groups; each keeps its min id.
    assert got == [10, 20, 30, 99]


def test_below_threshold_nothing_dropped(spark):
    df = _fixture(spark)
    kept = similarity.semantic_dedup(df, threshold=0.9999999, block_col="group")
    assert kept.count() == df.count()


def test_survivors_keep_all_columns(spark):
    df = _fixture(spark)
    kept = similarity.semantic_dedup(df, threshold=0.95, block_col="group")
    assert set(kept.columns) == {"vec_id", "group", "embedding"}


def test_precomputed_centroids_path(spark):
    df = _fixture(spark)
    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.5, 0.5, 0.5, 0.5]),
        ],
        "cid int, cvec array<double>",
    )
    kept = similarity.semantic_dedup(df, threshold=0.95, centroids=cents)
    assert sorted(kept.toPandas()["vec_id"]) == [10, 20, 30, 99]


def test_semantic_decontaminate_removes_planted_paraphrase(spark):
    """A corpus vector identical to a benchmark vector (max cosine 1.0)
    must be flagged and removed; orthogonal vectors survive."""
    from rawdata_client_provider_gcs_spark.operators import decontam

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),  # exact plant
            (11, [0.9, 0.1, 0.0]),  # near plant (cos ~0.994)
            (12, [0.0, 0.0, 1.0]),  # orthogonal to the whole benchmark
        ],
        "vec_id long, embedding array<double>",
    )
    hits = decontam.semantic_contaminated_docs(
        docs, bench, threshold=0.9
    ).toPandas()
    assert sorted(hits["vec_id"]) == [10, 11]
    assert hits.set_index("vec_id")["max_cosine"][10] == pytest.approx(1.0)
    kept = decontam.semantic_decontaminate(docs, bench, threshold=0.9)
    assert sorted(kept.toPandas()["vec_id"]) == [12]
    # the benchmark side must be broadcast: corpus rows never shuffle
    plan = decontam.semantic_contaminated_docs(
        docs, bench, threshold=0.9
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_chain_drops_conservatively(spark):
    """a~b and b~c but a!~c: both b and c are dropped (dominated by a
    smaller id) — the documented conservative direction."""
    a = _unit([1.0, 0.0])
    b = _unit([1.0, 0.28])  # cos(a,b) ~ 0.963
    c = _unit([1.0, 0.58])  # cos(b,c) ~ 0.967, cos(a,c) ~ 0.865
    df = spark.createDataFrame(
        [(1, 0, a), (2, 0, b), (3, 0, c)],
        "vec_id long, group long, embedding array<double>",
    )
    kept = similarity.semantic_dedup(df, threshold=0.95, block_col="group")
    assert sorted(kept.toPandas()["vec_id"]) == [1]
