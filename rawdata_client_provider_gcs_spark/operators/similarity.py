"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY.md §2B / BASELINE.json north star):

- **Brute-force cosine top-k** — exact baseline.  The dot product is a
  JVM-side ``aggregate(zip_with(...))`` fold (deterministic element order,
  double precision — bit-identical to an equivalent sequential fold in the
  DuckDB oracle), so even floating-point outputs hash-match.
- **LSH-bucketed ANN** — random-hyperplane (sign) buckets with multi-probe
  by table: query vectors only meet candidates sharing a bucket, the 100 TB
  path.  Recall is tunable via number of tables/planes.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_rows_df

# IVF assignment inlines the quantizer as a literal array when nlist·dim is
# at most this many cells; beyond it the expression tree would bloat codegen
# and the broadcast-join fallback wins.
_MAPSIDE_CENTROID_CELLS = 16384

#: Schema of the ``_centroids`` side table exactly as
#: :func:`build_ivf_index` writes it.  Readers pin it instead of
#: letting ``spark.read.parquet`` re-infer from footers — inference is
#: a driver-side job costing ~100 ms per probe call for a ≤nlist-row
#: table whose schema is a build-time contract (guide §6 metadata cost;
#: measured 0.16 s → 0.02 s per read).
_CENTROIDS_SCHEMA = "cid long, cvec array<double>"

#: Read-back schema of a :func:`build_ivf_index` lists directory, cached
#: per (application, path, freshness stamp) after the first inference:
#: probe calls were re-paying ~0.15 s of footer/partition schema merge
#: per query batch on a layout whose schema only changes when the index
#: is REBUILT.  For local paths the stamp (dir size+mtime_ns) makes a
#: rebuild by ANY process — not just this one — miss the stale entry;
#: :func:`build_ivf_index` additionally invalidates its path's entries
#: eagerly.  For non-local paths (gs://, hdfs://) no cheap stat exists,
#: so the cache relies on the same-process rebuild contract: an index
#: rebuilt at the same remote path by another application with different
#: column TYPES would be read through the stale schema for this
#: application's lifetime.  :func:`append_to_ivf_index` is
#: schema-preserving by contract and never invalidates EXPLICITLY —
#: on local paths an append does change the directory stamp, so the
#: next read re-infers once (a safe, cheap miss) and caches under the
#: new stamp; the superseded entry ages out at the size bound.
_LISTS_SCHEMA_CACHE: dict[tuple, object] = {}


def _lists_stamp(path: str):
    from ..tables import _path_stamp
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return _path_stamp(parsed.path if parsed.scheme == "file" else path)
    return None


def _read_lists(spark, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path, _lists_stamp(path))
    schema = _LISTS_SCHEMA_CACHE.get(key)
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    df = spark.read.parquet(path)
    if len(_LISTS_SCHEMA_CACHE) > 4096:
        # drop the oldest-inserted entry rather than clearing the whole
        # cache (insertion order, so a long-lived hot path CAN be the
        # one dropped — it re-enters on the next read for one extra
        # inference; the point is only that churn never evicts
        # everything at once)
        _LISTS_SCHEMA_CACHE.pop(next(iter(_LISTS_SCHEMA_CACHE)))
    _LISTS_SCHEMA_CACHE[key] = df.schema
    return df


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _constraint_opaque(col: F.Column) -> F.Column:
    """Hide a projected expression from Catalyst constraint inference.

    Equi-joining on an alias of a LARGE expression, when both join
    inputs share scan lineage (corpus vs corpus.filter — the standard
    "queries are a subset of the corpus" ANN call), can make
    ``InferFiltersFromConstraints`` transfer the alias's defining
    expression across the join and place it on the side where the
    source attribute does not exist: execution then dies with
    ``INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND`` (``!Filter f(embedding#22)
    <=> cid#59`` above the probes subtree; reproduced on pyspark 4.1.2,
    flips deterministically with
    ``spark.sql.optimizer.excludedRules=...InferFiltersFromConstraints``).
    Wrapping the alias in an always-true branch on a nondeterministic-
    MARKED (but value-stable) input makes the optimizer skip it when
    collecting Project constraints — the inference that feeds the buggy
    transfer never starts, while the value and codegen are unchanged.
    """
    return F.when(F.spark_partition_id() >= 0, col)


#: brute_force_topk broadcasts the query set to every task; beyond this
#: many query rows the broadcast (and the |queries|×|corpus| score work)
#: is a misuse of the exact tier — fail loud and point at the ANN tiers.
MAX_BRUTE_FORCE_QUERIES = 100_000


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors of every query vector.

    ``queries`` (small) is broadcast against the full embedding corpus —
    a map-only scan per candidate partition; the only shuffle is the
    per-query top-k (TakeOrdered via window + filter).

    The exact tier's contract is a SMALL query set: the guard counts the
    query side (one cheap count on the small input, driver-side) and
    raises when it exceeds ``max_queries`` rather than letting an
    oversized broadcast OOM an executor mid-job — route big query sets
    to :func:`ivf_topk` / :func:`lsh_ann_topk` instead.
    """
    if max_queries is not None:
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"brute_force_topk query side exceeds {max_queries} rows; "
                "the exact tier broadcasts every query to every task — "
                "use ivf_topk/ivf_pq_topk/lsh_ann_topk for large query "
                "sets, or raise max_queries explicitly"
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    from ..tables import scan_parallel

    # the per-candidate cosine fold is the narrow stage above the scan —
    # parallelize it (no-op when the corpus scan is already multi-split)
    cand = scan_parallel(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cand_vec"),
        ),
        "neighbor_id",
    )
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("query_vec"), F.col("cand_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(dim: int, planes: int, tables: int, seed: int = 42):
    rng = random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(planes)]
        for _ in range(tables)
    ]


def _bucket_expr(vec_col, plane_set) -> F.Column:
    """Sign-pattern bucket id for one hash table (JVM-side fold per plane)."""
    bucket = F.lit(0)
    for i, plane in enumerate(plane_set):
        arr = F.array(*[F.lit(w) for w in plane])
        dot = _dot(F.col(vec_col), arr)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
    planes: int = 8,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates limited to shared LSH buckets.

    Each vector lands in ``tables`` buckets (2^planes per table).  The join
    is an equi-join on (table, bucket) — at scale the candidate set per
    query is corpus/2^planes × tables instead of the full corpus.
    """
    if dim is None:
        first = embeddings.select(F.size(vec_col)).first()
        dim = first[0]
    hp = _hyperplanes(dim, planes, tables)

    def bucketed(df, prefix):
        parts = [
            F.struct(
                F.lit(t).alias("table"), _bucket_expr(vec_col, hp[t]).alias("bucket")
            )
            for t in range(tables)
        ]
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(F.array(*parts)).alias("b"),
        ).select(
            f"{prefix}_id",
            f"{prefix}_vec",
            # join keys aliasing generator-output fields: same
            # cross-side constraint-transfer hazard as the IVF cid
            _constraint_opaque(F.col("b.table")).alias("table"),
            _constraint_opaque(F.col("b.bucket")).alias("bucket"),
        )

    q = bucketed(queries, "query")
    c = bucketed(embeddings, "neighbor")
    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("query_vec"), F.col("neighbor_vec")).alias(
                "cosine"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def train_centroids_kmeans(
    embeddings: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Train an IVF coarse quantizer with distributed k-means.

    Returns ``(cid, cvec)`` suitable for :func:`ivf_ann_topk`'s
    ``centroids`` argument.  At 100 TB, train on a sample
    (``sample_fraction``) — k-means converges on a tiny fraction of the
    corpus and the assignment step is what sees every row.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = embeddings
    if sample_fraction:
        train = train.sample(fraction=sample_fraction, seed=seed)
    feats = train.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=nlist, seed=seed).fit(feats)
    spark = embeddings.sparkSession
    centers = local_rows_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, cvec array<double>",
    )
    return centers.select("cid", F.col("cvec").alias("cvec"))


def _centroid_literal(cent_rows) -> F.Column:
    """Quantizer as ONE parsed literal: array<struct<cid,norm,cvec>>.

    Built with a single ``F.expr`` instead of O(nlist·dim) Column
    objects: every ``F.lit``/``F.array``/``F.struct`` call is a py4j
    round-trip, and at nlist·dim ≈ 1k the per-call latency added ~5 s
    of driver-side plan build to every query.  Catalyst constant-folds
    the parsed tree to a single array literal, so codegen sees one
    constant.  ``repr(float)`` round-trips exactly through the SQL
    parser's correctly-rounded double parse, and the Python-side norm
    (sequential fold of squares, then sqrt) is bit-identical to the
    per-row JVM ``aggregate`` fold it replaces.
    """
    parts = []
    for r in cent_rows:
        vec = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in r["cvec"])
        acc = 0.0
        for x in r["cvec"]:
            acc += float(x) * float(x)
        parts.append(
            f"named_struct('cid', CAST({int(r['cid'])} AS BIGINT),"
            f" 'norm', CAST('{math.sqrt(acc)!r}' AS DOUBLE),"
            f" 'cvec', array({vec}))"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def _centroid_scores(cent_arr: F.Column, vec_col_name: str) -> F.Column:
    """array<struct<cos,neg_cid>> of the vector scored vs every centroid.

    Struct field order (cos first, then neg_cid) makes lexicographic
    struct comparison == (max cosine, then lowest cid) — the same
    tie-break as ``max(struct(a_cos, -cid))``.
    """
    a = F.col(vec_col_name)
    norm_a = _norm(a)
    return F.transform(
        cent_arr,
        lambda c: F.struct(
            (_dot(a, c["cvec"]) / (norm_a * c["norm"])).alias("cos"),
            (-c["cid"]).alias("neg_cid"),
        ),
    )


def ivf_cell_report(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Inverted-list health report: per cell, population and cohesion.

    The index-maintenance companion to :func:`ivf_ann_topk`: skewed cell
    sizes mean probe cost varies wildly, and low min-cosine cells mean
    the quantizer no longer fits the data (retrain signal).  Same
    zero-shuffle assignment as the search path (inlined quantizer
    literal, map-side argmax); the only aggregation is one combinable
    ``groupBy(cid)`` with count/min/max — all order-independent, so with
    a deterministic quantizer the report is oracle-exact.
    """
    if centroids is None:
        centroids = embeddings.orderBy(id_col).limit(nlist).select(
            F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("cvec")
        )
    cent_rows = sorted(
        centroids.select("cid", "cvec").collect(), key=lambda r: r["cid"]
    )
    if sum(len(r["cvec"]) for r in cent_rows) <= _MAPSIDE_CENTROID_CELLS:
        best = F.array_max(
            _centroid_scores(_centroid_literal(cent_rows), vec_col)
        )
        assigned = embeddings.select(
            (-best["neg_cid"]).alias("cid"),
            best["cos"].alias("cos_to_centroid"),
        )
    else:
        # same big-quantizer fallback as ivf_ann_topk: above the inlined-
        # literal bound the expression would bloat codegen/driver, so
        # broadcast the centroid table and argmax per vector instead
        cent = F.broadcast(
            local_rows_df(
                centroids.sparkSession,
                [(int(r["cid"]), list(r["cvec"])) for r in cent_rows],
                "cid long, cvec array<double>",
            )
        )
        assigned = (
            embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
            .crossJoin(cent)
            .withColumn("a_cos", cosine_similarity(F.col("v"), F.col("cvec")))
            .groupBy("vid")
            .agg(
                F.max(
                    F.struct(F.col("a_cos"), (-F.col("cid")).alias("neg_cid"))
                ).alias("best")
            )
            .select(
                (-F.col("best.neg_cid")).alias("cid"),
                F.col("best.a_cos").alias("cos_to_centroid"),
            )
        )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("cos_to_centroid").alias("min_cos"),
        F.max("cos_to_centroid").alias("max_cos"),
    )


def _cent_broadcast(cent_rows, spark):
    return F.broadcast(
        local_rows_df(
            spark,
            [(int(r["cid"]), list(r["cvec"])) for r in cent_rows],
            "cid long, cvec array<double>",
        )
    )


def _assign_cells(
    embeddings: DataFrame, cent_rows, id_col: str, vec_col: str
) -> DataFrame:
    """(neighbor_id, cand_vec, cid): each corpus vector's nearest cell.

    Map-side inlined-literal argmax under the codegen bound
    (``_MAPSIDE_CENTROID_CELLS``) — zero shuffle; above it (the huge-
    nlist regime the MATERIALIZED index targets), a broadcast cross
    join with a combinable ``max(struct)`` argmax where the vector
    rides as agg payload, never as a grouping key.  Shared by
    ``ivf_ann_topk``, ``build_ivf_index`` and ``append_to_ivf_index``.
    """
    from ..tables import scan_parallel

    if sum(len(r["cvec"]) for r in cent_rows) <= _MAPSIDE_CENTROID_CELLS:
        cent_arr = _centroid_literal(cent_rows)
        # O(nlist·dim) argmax per row runs in the scan stage —
        # parallelize a single-split scan first (no-op at scale)
        src = scan_parallel(
            embeddings.select(F.col(id_col), F.col(vec_col)), id_col
        )
        return src.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cand_vec"),
            _constraint_opaque(
                -F.array_max(_centroid_scores(cent_arr, vec_col))["neg_cid"]
            ).alias("cid"),
        )
    cent = _cent_broadcast(cent_rows, embeddings.sparkSession)
    return (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cand_vec"),
        )
        .crossJoin(cent)
        .withColumn(
            "a_cos", cosine_similarity(F.col("cand_vec"), F.col("cvec"))
        )
        .groupBy("neighbor_id")
        .agg(
            F.first("cand_vec").alias("cand_vec"),
            F.max(
                F.struct(F.col("a_cos"), (-F.col("cid")).alias("neg_cid"))
            ).alias("best"),
        )
        .select(
            "neighbor_id", "cand_vec", (-F.col("best.neg_cid")).alias("cid")
        )
    )


def _probe_cells(
    queries: DataFrame, cent_rows, id_col: str, vec_col: str, nprobe: int
) -> DataFrame:
    """(query_id, query_vec, cid) — each query's ``nprobe`` nearest cells.

    Extracts the cid INSIDE the array before exploding: exploding the
    struct array and reading ``p.neg_cid`` afterwards trips Spark's
    generator nested-column aliasing on this lambda-heavy expression
    (executor-side INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND binding failure,
    seen on multi-file corpora) — and an array<bigint> explode is
    cheaper anyway.  Above the literal bound, a broadcast cross join +
    window rank over the (small by contract) query side.
    """
    if sum(len(r["cvec"]) for r in cent_rows) <= _MAPSIDE_CENTROID_CELLS:
        cent_arr = _centroid_literal(cent_rows)
        return (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("query_vec"),
                F.transform(
                    F.slice(
                        F.sort_array(
                            _centroid_scores(cent_arr, vec_col), asc=False
                        ),
                        1,
                        nprobe,
                    ),
                    lambda s: -s["neg_cid"],
                ).alias("probe_cids"),
            )
            .select(
                "query_id",
                "query_vec",
                F.explode(F.col("probe_cids")).alias("cid"),
            )
        )
    cent = _cent_broadcast(cent_rows, queries.sparkSession)
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("p_cos").desc(), F.col("cid").asc()
    )
    return (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
        )
        .crossJoin(cent)
        .withColumn(
            "p_cos", cosine_similarity(F.col("query_vec"), F.col("cvec"))
        )
        .withColumn("p_rank", F.row_number().over(probe_w))
        .filter(F.col("p_rank") <= nprobe)
        .select("query_id", "query_vec", "cid")
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: inverted lists under a coarse quantizer.

    The IVF structure (Faiss-style): every corpus vector is assigned to its
    nearest of ``nlist`` centroids; a query probes only its ``nprobe``
    closest lists and scores those candidates exactly.  All stages are
    scale-shaped:

    - centroids are broadcast (``nlist`` ≪ corpus); assignment is a
      map-side cross product + one combinable ``max(struct)`` agg — no
      per-vector shuffle beyond the agg;
    - the candidate join is ``broadcast(queries × nprobe)`` against the
      assigned corpus on ``cid`` — candidates per query ≈ corpus·nprobe/nlist
      instead of the full corpus;
    - per-query top-k is a window over the candidate set only.

    With ``centroids=None`` the quantizer is the ``nlist`` lowest-id
    vectors — deterministic, so the whole query is oracle-checkable
    against an independent engine; pass :func:`train_centroids_kmeans`
    output for a trained quantizer (better recall, non-deterministic).
    Ties in assignment/ranking break on lowest centroid / neighbor id.

    Assignment is **zero-shuffle**: the quantizer is tiny by
    construction, so the centroid table is inlined as an
    ``array<struct<cos,neg_cid>>`` literal and the argmax is a map-side
    ``array_max`` over it — no corpus row (and in particular no
    corpus-sized embedding array) ever rides a shuffle for assignment.
    Above ``_MAPSIDE_CENTROID_CELLS`` (huge ``nlist·dim``, where the
    inlined expression would bloat codegen) it falls back to a broadcast
    cross join with a ``groupBy(neighbor_id)``-only argmax agg — the
    vector appears once as agg payload, never as a grouping key.
    """
    if centroids is None:
        centroids = embeddings.orderBy(id_col).limit(nlist).select(
            F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("cvec")
        )

    cent_rows = sorted(
        centroids.select("cid", "cvec").collect(), key=lambda r: r["cid"]
    )
    assigned = _assign_cells(embeddings, cent_rows, id_col, vec_col)
    probes = _probe_cells(queries, cent_rows, id_col, vec_col, nprobe)

    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("query_vec"), F.col("cand_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 10_000,
    iters: int = 10,
):
    """Train product-quantization codebooks: ``(m, k, dim//m)`` float64.

    Per-subspace Lloyd k-means on a bounded driver-side sample (Faiss
    trains its quantizers on a sample too — training touches thousands
    of rows; *encoding* is what sees the full corpus, and that stays
    distributed).  Fully deterministic across runs: the sample is the
    ``max_train_rows`` lowest rows by ``xxhash64(vec)`` (a TakeOrdered,
    not a full sort — and content-addressed, so it does not depend on
    partition/task order the way a bare ``limit().collect()`` would),
    initial centers are evenly-strided sample rows, and assignment ties
    break on lowest center index (numpy argmin).  ``seed`` is kept for
    API compatibility but no longer consulted.
    """
    import numpy as np

    # Arrow-path driver transfer (guide §6): same TakeOrdered sample,
    # but toPandas() moves the vectors as one Arrow batch instead of
    # row-pickled Rows (collect() measured ~0.3 s vs ~0.05 s here)
    pdf = (
        embeddings.select(F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64("__v").asc())
        .limit(max_train_rows)
        .toPandas()
    )
    x = np.asarray(list(pdf["__v"]), dtype=np.float64)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    xs = x.reshape(n, m, dsub)
    books = np.empty((m, k, dsub))
    for mi in range(m):
        sub = xs[:, mi, :]
        # deterministic spread-out init: evenly strided distinct rows of
        # the hash-ordered sample (hash order ~ uniform shuffle)
        if n >= k:
            stride = np.linspace(0, n - 1, k).astype(int)
            centers = sub[stride].copy()
        else:
            centers = np.resize(sub, (k, dsub))
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ki in range(k):
                mask = assign == ki
                if mask.any():
                    centers[ki] = sub[mask].mean(axis=0)
        books[mi] = centers
    return books


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    codes: int = 16,
    rerank: int = 50,
    codebooks=None,
    centroids: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ approximate top-k — the classic 100 TB ANN memory shape.

    At scale the corpus embeddings themselves are the bottleneck: 100 TB
    of float32 vectors cannot be re-read per query batch.  Product
    quantization stores each vector as ``m`` one-byte codes (here
    64 floats → 8 bytes, a 32× compression) plus one exact norm; query
    scoring is **asymmetric distance computation** — per query an
    ``(m × codes)`` lookup table of subvector dot products, a candidate
    scores as ``sum(LUT[m, code_m]) / (|q|·|x|)`` without touching the
    original vector.  Structure (all stages scale-shaped):

    - the probe batch (driver-bounded BY DESIGN — the un-fused shape
      broadcast it to every executor, the same size assumption) is
      collected once; its probed cells and per-query ADC lookup tables
      are computed in numpy on the driver and ride the kernel closure;
    - ONE map-side Arrow-batched pass assigns every corpus vector to
      its IVF list, PQ-encodes it, AND ADC-scores it against the
      queries probing its cell (broadcast numpy centroids/codebooks/
      LUTs in the UDF closure; no shuffle, no join, codes never leave
      the task) — r18 fused the former encode → broadcast-join → ADC
      pipeline into this single stage, removing two Python stages and
      one Arrow boundary (guide §4.1: control how often columns cross);
    - optional exact **rerank**: the top-``rerank`` PQ candidates per
      query re-score against true vectors (an id-join back to the
      corpus — the only stage that touches full vectors, bounded to
      ``rerank`` rows per query).

    Deterministic for fixed seed; verified by recall-vs-brute-force
    pytest (sketch operator — rows-only in the driver harness, like
    MinHash/SimHash/LSH-ANN).
    """
    import numpy as np
    import pandas as pd

    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, m=m, k=codes, vec_col=vec_col, seed=seed
        )
    books = np.asarray(codebooks, dtype=np.float64)  # (m, codes, dsub)
    if centroids is None:
        cent_df = embeddings.orderBy(id_col).limit(nlist).select(vec_col)
        cents = np.asarray(
            [r[0] for r in cent_df.collect()], dtype=np.float64
        )
    else:
        cents = np.asarray(
            [r["cvec"] for r in centroids.orderBy("cid").collect()],
            dtype=np.float64,
        )
    cent_norms = np.sqrt((cents**2).sum(axis=1))

    m_, k_, dsub = books.shape

    # probe batch, driver-side: the un-fused pipeline shipped the probes
    # to every executor via a broadcast join, so "fits on the driver" was
    # already the operating assumption; collecting them instead lets the
    # probe-cell assignment and the per-query ADC lookup tables ride the
    # kernel closure (guide §4.5 heavyweight init once; §2.4 the
    # broadcast join disappears outright)
    q_rows = queries.select(id_col, vec_col).collect()
    q_vecs = np.asarray([list(r[1]) for r in q_rows], dtype=np.float64)
    q_ids = np.asarray([r[0] for r in q_rows], dtype=np.int64)
    if len(q_rows):
        q_norms = np.sqrt((q_vecs**2).sum(axis=1))
        q_cos = (q_vecs @ cents.T) / np.maximum(
            q_norms[:, None] * cent_norms[None, :], 1e-300
        )
        q_top = np.argsort(-q_cos, axis=1, kind="stable")[:, :nprobe]
        # same per-query LUT expression as the former per-batch ADC stage
        # (bit-identical float path: books @ qvec per query)
        luts = np.stack(
            [
                (books @ qv.reshape(m_, dsub)[:, :, None]).squeeze(-1)
                for qv in q_vecs
            ]
        )  # (Q, m, codes)
        probing = {}  # cid -> int array of query indices probing it
        for qi, cells in enumerate(q_top):
            for c in cells:
                probing.setdefault(int(c), []).append(qi)
        probing = {c: np.asarray(v, dtype=np.int64) for c, v in probing.items()}
    else:
        probing = {}
        q_norms = np.zeros(0, dtype=np.float64)
        luts = np.zeros((0, m_, k_), dtype=np.float64)

    probe_cells = np.asarray(sorted(probing), dtype=np.int64)

    def encode_score(batches):
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n = x.shape[0]
            if not n:
                continue
            # IVF assignment by cosine (ties -> lowest cid, matching ivf_ann)
            xn = np.sqrt((x**2).sum(axis=1))
            cos = (x @ cents.T) / np.maximum(xn[:, None] * cent_norms[None, :], 1e-300)
            cid = cos.argmax(axis=1)
            ids = np.asarray(pdf[id_col], dtype=np.int64)
            # rows whose cell no query probes produce no output — drop
            # them BEFORE the per-subspace PQ encode, the kernel's
            # dominant per-row cost (the unfused pipeline could not skip
            # the encode; the fused one sees the probe set in-closure,
            # and at the intended nlist >> nprobe regime this skips
            # ~(1 - nprobe/nlist) of the heavy work)
            pmask = np.isin(cid, probe_cells)
            if not pmask.any():
                continue
            x, xn, cid, ids = x[pmask], xn[pmask], cid[pmask], ids[pmask]
            n = x.shape[0]
            # PQ codes: per subspace argmin L2 to the codebook
            xs = x.reshape(n, m_, dsub)
            code_cols = np.empty((n, m_), dtype=np.int64)
            for mi in range(m_):
                d2 = (
                    (xs[:, mi, None, :] - books[None, mi, :, :]) ** 2
                ).sum(axis=2)
                code_cols[:, mi] = d2.argmin(axis=1)
            # ADC against the queries probing each row's cell — the same
            # gather+sum+normalize the former join+ADC stage computed,
            # now without the codes ever leaving the task
            out_q, out_n, out_s = [], [], []
            for c in np.unique(cid):
                qidx = probing.get(int(c))
                if qidx is None:
                    continue
                sel = cid == c
                sel_codes = code_cols[sel]  # (n_c, m)
                sel_ids = ids[sel]
                sel_norms = xn[sel]
                for qi in qidx:
                    approx_dot = luts[qi][
                        np.arange(m_)[None, :], sel_codes
                    ].sum(axis=1)
                    scores = approx_dot / np.maximum(
                        q_norms[qi] * sel_norms, 1e-300
                    )
                    keep = sel_ids != q_ids[qi]
                    out_q.append(np.full(keep.sum(), q_ids[qi]))
                    out_n.append(sel_ids[keep])
                    out_s.append(scores[keep])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "pq_cosine": np.concatenate(out_s),
                }
            )

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        encode_score, "query_id long, neighbor_id long, pq_cosine double"
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_cosine").desc(), F.col("neighbor_id").asc()
    )
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.col("pq_cosine").alias("cosine"),
                F.col("rank").cast("long").alias("rank"),
            )
        )

    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cand_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    exact = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("query_vec"), F.col("cand_vec")).alias(
                "cosine"
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    planes: int = 6,
    tables: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine >= threshold — embedding-space near-dup detection.

    With ``block_col`` the self-join is restricted to equal blocks (e.g. a
    coarse cluster/label) — exact within blocks, the shape to use when a
    natural partition exists.

    Without one, the operator **never falls back to an all-pairs cross
    join** (a cartesian on a 100 TB corpus is a non-starter): it
    auto-blocks with random-hyperplane LSH — each vector lands in
    ``tables`` sign-pattern buckets of ``planes`` bits, candidates are
    pairs sharing a (table, bucket), found pairs are deduped.  Emitted
    cosines are exact, so precision is 1; recall follows the standard
    ``1-(1-p^planes)^tables`` curve (p = 1 - angle/pi) — raise ``tables``
    / lower ``planes`` to push it toward 1 for a given threshold.
    """
    left_cols = [F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")]
    right_cols = [F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")]
    if block_col:
        # norms are precomputed PER ROW before the join: inside the
        # join condition each vector's norm fold would re-run once per
        # candidate pair (|block| times) — measured as the dominant
        # cost of the blocked pass.  dot/(norm_a*norm_b) performs the
        # identical double arithmetic, so emitted cosines (and the
        # DuckDB oracle hash) are bit-unchanged.
        from ..tables import scan_parallel

        # the probe side carries the per-pair dot-product work; on a
        # single-row-group fixture scan the whole blocked pass ran on
        # one task (guide §2.5) — spread it; no-op at real multi-split
        # scale, and pure Catalyst arithmetic is partition-independent
        left = scan_parallel(
            embeddings.select(
                *left_cols,
                F.col(block_col).alias("block"),
                _norm(F.col(vec_col)).alias("norm_a"),
            ),
            "id_a",
        )
        right = embeddings.select(
            *right_cols,
            F.col(block_col).alias("block"),
            _norm(F.col(vec_col)).alias("norm_b"),
        )
        joined = left.join(right, on="block")
        return (
            joined.filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "cosine",
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b")),
            )
            .filter(F.col("cosine") >= F.lit(threshold))
            .select("id_a", "id_b", "cosine")
        )

    if dim is None:
        dim = embeddings.select(F.size(vec_col)).first()[0]
    hp = _hyperplanes(dim, planes, tables, seed=seed)

    def sides(prefix: str, cols) -> DataFrame:
        parts = [
            F.struct(
                F.lit(t).alias("table"), _bucket_expr(vec_col, hp[t]).alias("bucket")
            )
            for t in range(tables)
        ]
        return embeddings.select(*cols, F.explode(F.array(*parts)).alias("b")).select(
            *[c for c in (f"id_{prefix}", f"vec_{prefix}")],
            # see _constraint_opaque: these become both join keys of a
            # self-join over one scan lineage
            _constraint_opaque(F.col("b.table")).alias("table"),
            _constraint_opaque(F.col("b.bucket")).alias("bucket"),
        )

    left = sides("a", left_cols)
    right = sides("b", right_cols)
    return (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    centroids: DataFrame | None = None,
    nlist: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    The shape from Abbas et al. 2023 ("SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): partition
    the corpus into semantic clusters, compare only within a cluster,
    and keep one representative from every group of rows whose pairwise
    cosine clears ``threshold``.  Returns the SURVIVING rows of
    ``embeddings`` (all original columns).

    Clustering: pass ``block_col`` when a natural partition exists
    (label, language, domain) — exact within blocks.  Otherwise a
    k-means coarse quantizer is trained (or accepted via ``centroids``
    as ``(cid, cvec)``) and rows are assigned map-side with the same
    zero-shuffle inlined-literal argmax the IVF search path uses.

    Keep policy (deterministic, order-free): a row is dropped iff some
    SMALLER-id row in its cluster is near-dup with it — i.e. the kept
    set is ``ids - {id_b | (id_a < id_b, cos >= t)}``.  On the
    near-clique groups semantic duplicates form this keeps exactly the
    minimum id per group, matching the paper's one-per-group policy
    without an iterative pass; chains (a~b, b~c, a!~c) drop both b and
    c — the conservative direction for dedup.

    100 TB shape: candidate pairs stay inside clusters (never
    all-pairs); the drop set is an id-only distinct, and the final
    left-anti join is left to AQE — broadcast when the drop set is
    small, key-shuffle when dedup bites hard.
    """
    if block_col is not None:
        blocked = embeddings
        bcol = block_col
    else:
        if centroids is None:
            # k-means converges on a sample; the assignment step is what
            # sees every row.  At scale, training wall dominates the
            # whole dedup unless sample_fraction is set (measured 2x+
            # end-to-end at 100k vectors — SCALE.md semantic-dedup row).
            centroids = train_centroids_kmeans(
                embeddings,
                nlist,
                id_col=id_col,
                vec_col=vec_col,
                seed=seed,
                sample_fraction=sample_fraction,
            )
        cent_rows = centroids.collect()  # bounded: nlist rows
        assigned = _assign_cells(embeddings, cent_rows, id_col, vec_col)
        blocked = assigned.select(
            F.col("neighbor_id").alias(id_col),
            F.col("cand_vec").alias(vec_col),
            "cid",
        )
        bcol = "cid"
    pairs = embedding_near_dup_pairs(
        blocked,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        block_col=bcol,
    )
    dominated = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(dominated, id_col, "left_anti")


def quantize_int8(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization of an embedding column.

    The storage-compression companion to IVF-PQ's 8-byte codes: 4×
    smaller vectors (one int8 + a shared scale per vector instead of
    float32s) with bounded reconstruction error ``|x − c·s| ≤ s/2``,
    ``s = max|x|/127``.  Entirely ``pyspark.sql.functions`` — transform/
    aggregate lambda expressions stay in whole-stage codegen, no Python,
    no shuffle (a pure map over the scan) — so it costs one pass at any
    corpus size and the DuckDB oracle can state the identical
    arithmetic.

    Returns ``(id, scale, codes array<int>, max_abs_err, sum_codes)``;
    zero vectors get scale 0 and all-zero codes.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    ) / F.lit(127.0)
    staged = embeddings.select(F.col(id_col), v.alias("v"), scale.alias("scale"))
    codes = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col("v"), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col("v"), lambda x: F.round(x / F.col("scale")).cast("int")
        )
    )
    out = staged.select(id_col, "scale", codes.alias("codes"), F.col("v"))
    err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("codes"),
            lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return out.select(
        id_col,
        "scale",
        "codes",
        err.alias("max_abs_err"),
        F.aggregate(
            F.col("codes"), F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        ).alias("sum_codes"),
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    centroids: DataFrame | None = None,
) -> None:
    """Materialize the IVF inverted lists on disk: the 100 TB shape.

    ``ivf_ann_topk`` recomputes cell assignment per call — one corpus
    pass costing O(nlist·dim) per row, which the 100×/1000× stress
    (SCALE.md round 6) measures as the dominant wall component: at a
    fixed corpus the wall grows ~linearly with nlist and barely moves
    with nprobe.  That is the wrong cost model for query-heavy
    workloads; assignment is an INDEX BUILD and belongs on disk.  This
    writes the assigned corpus as parquet **partitioned by cid** (true
    inverted lists: one directory per cell) plus the quantizer as a
    ``_centroids`` side table (underscore-prefixed, so corpus reads of
    ``path`` skip it).  :func:`ivf_query_index` then probes with STATIC
    partition pruning — a query batch scans only its probed cells,
    corpus·nprobe/nlist rows of IO instead of a full pass.

    With ``centroids=None`` the quantizer is the ``nlist`` lowest-id
    vectors (deterministic, oracle-checkable), mirroring
    :func:`ivf_ann_topk`; pass :func:`train_centroids_kmeans` output
    for a trained quantizer.
    """
    if centroids is None:
        centroids = embeddings.orderBy(id_col).limit(nlist).select(
            F.col(id_col).cast("long").alias("cid"),
            F.col(vec_col).alias("cvec"),
        )
    cent_rows = sorted(
        centroids.select("cid", "cvec").collect(), key=lambda r: r["cid"]
    )
    assigned = _assign_cells(embeddings, cent_rows, id_col, vec_col)
    # cluster by cell before the partitioned write: without it every scan
    # task writes a file into every cid directory (tasks x nlist small
    # files at scale — guide §6 small-files trap) and a single-task scan
    # writes all nlist directories serially.  One hash shuffle on cid
    # gives one writer per cell and one file per inverted list.
    assigned.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(path)
    spark = embeddings.sparkSession
    # a rebuild may change the lists schema (different id/vec column
    # TYPES): drop every cached read-back schema for this path (the
    # freshness stamp in the key usually catches this on its own for
    # local paths; this keeps remote paths honest in-process too)
    for k in [k for k in _LISTS_SCHEMA_CACHE if k[1] == path]:
        _LISTS_SCHEMA_CACHE.pop(k, None)
    _write_centroids(spark, f"{path}/_centroids", cent_rows)


def _write_centroids(spark, cent_path: str, cent_rows) -> None:
    """Persist the ≤nlist-row quantizer side table.

    The rows are DRIVER-BOUNDED metadata (guide §4/§5: don't pay a
    distributed job for driver-sized data): on a local filesystem the
    table is written directly with pyarrow (~5 ms) instead of a Spark
    job whose fixed cost (Python-worker round trip + commit protocol)
    measured 0.3-0.4 s for 16 rows.  Non-local paths (gs://, hdfs://)
    keep the Spark writer, which speaks any Hadoop filesystem.  Both
    writers produce the `_CENTROIDS_SCHEMA` layout the pinned readers
    expect."""
    rows = [
        (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cent_rows
    ]
    from urllib.parse import urlparse

    parsed = urlparse(cent_path)
    if parsed.scheme in ("", "file"):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        local = parsed.path if parsed.scheme == "file" else cent_path
        import shutil

        # build the replacement NEXT TO the target, then swap: a crash
        # mid-write can never leave a half-built _centroids at the
        # final path (the Spark commit protocol's atomicity, manually)
        tmp = f"{local}.__tmp_centroids__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp) if os.path.isdir(tmp) else os.remove(tmp)
        os.makedirs(tmp)
        pq.write_table(
            pa.table(
                {
                    "cid": pa.array([r[0] for r in rows], pa.int64()),
                    "cvec": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float64())
                    ),
                }
            ),
            os.path.join(tmp, "part-00000.parquet"),
        )
        # overwrite semantics like the Spark writer, including a target
        # existing as a plain FILE (corrupted/partial state)
        if os.path.isdir(local):
            shutil.rmtree(local)
        elif os.path.exists(local):
            os.remove(local)
        os.rename(tmp, local)
        return
    # single-slice local relation: a defaultParallelism-sliced one pays a
    # Python round trip per slice on this write (~6 s of pure overhead
    # for 16 rows at 32 cores — measured r17, guide §4)
    local_rows_df(spark, rows, "cid long, cvec array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(cent_path)


def append_to_ivf_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Add vectors to an existing :func:`build_ivf_index` index.

    The growing-corpus operation: new vectors are assigned with the
    index's STORED quantizer (never retrained here — a changed
    quantizer would silently strand the already-indexed vectors in
    stale cells) and appended into their cell partitions.  Cost is one
    pass over the NEW vectors only; existing lists are untouched
    (parquet partition append writes new files into the cid
    directories).  Watch :func:`ivf_cell_report` for drift — when new
    data stops matching the quantizer (cell cohesion drops), rebuild.
    """
    spark = new_embeddings.sparkSession
    cent_rows = sorted(
        spark.read.schema(_CENTROIDS_SCHEMA).parquet(f"{path}/_centroids").collect(),
        key=lambda r: r["cid"],
    )
    assigned = _assign_cells(new_embeddings, cent_rows, id_col, vec_col)
    # same one-writer-per-cell clustering as build_ivf_index
    assigned.repartition("cid").write.mode("append").partitionBy(
        "cid"
    ).parquet(path)


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a :func:`build_ivf_index` index: scan ONLY the probed cells.

    Probe cells are computed map-side from the stored quantizer; their
    union (at most ``nlist`` values, usually far fewer) is collected and
    applied as a LITERAL ``cid IN (...)`` filter, so Spark prunes the
    non-probed partition directories statically — visible as
    ``PartitionFilters: [cid IN ...]`` in the scan node, with only the
    probed cells' files read.  Everything after (candidate equi-join on
    cid, exact rescoring, per-query window top-k) matches
    :func:`ivf_ann_topk`, and for the same corpus/quantizer the results
    are identical (pytest-pinned).
    """
    cent_rows = sorted(
        spark.read.schema(_CENTROIDS_SCHEMA).parquet(f"{path}/_centroids").collect(),
        key=lambda r: r["cid"],
    )
    probes = _probe_cells(queries, cent_rows, id_col, vec_col, nprobe)
    # the query side is broadcast-small by the ANN contract, so the
    # probe assignment collects for free — ONCE: the local rows feed
    # both the literal cid IN (...) filter (<= nlist longs; a literal
    # beats dynamic pruning because the partition filter is visible and
    # guaranteed before the join even plans) and the broadcast join
    # side, instead of running the probe job twice
    probe_rows = probes.collect()
    probed_cells = sorted({int(r["cid"]) for r in probe_rows})
    probes_local = local_rows_df(spark, probe_rows, probes.schema)
    lists = _read_lists(spark, path).filter(F.col("cid").isin(probed_cells))
    scored = (
        lists.join(F.broadcast(probes_local), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(
                F.col("query_vec"), F.col("cand_vec")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_index_report(spark, path: str) -> DataFrame:
    """Cell health from a materialized index — no re-assignment pass.

    :func:`ivf_cell_report` re-runs the argmax assignment over the
    corpus (O(nlist·dim) per row); with the lists already materialized
    the cid is a stored column, so the report is one broadcast
    equi-join (each vector against only ITS OWN centroid) plus a
    combinable group-by — the cheap periodic health check that decides
    when :func:`append_to_ivf_index` drift warrants a rebuild.
    """
    lists = _read_lists(spark, path)
    cent = F.broadcast(
        spark.read.schema(_CENTROIDS_SCHEMA).parquet(f"{path}/_centroids").select(
            F.col("cid"), F.col("cvec")
        )
    )
    return (
        lists.join(cent, "cid")
        .withColumn(
            "cos_to_centroid",
            cosine_similarity(F.col("cand_vec"), F.col("cvec")),
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("cos_to_centroid").alias("min_cos"),
            F.max("cos_to_centroid").alias("max_cos"),
        )
    )


def serialize_vector_index(centroids, codebooks=None) -> bytes:
    """Pack a trained quantizer (IVF centroids, optional PQ codebooks)
    into one self-describing npz blob for the topic metadata KV.

    Training a quantizer costs a corpus pass (`train_centroids_kmeans` /
    `train_pq_codebooks`); production deployments train once and reuse,
    which in the reference's world means storing it beside the topic as
    an opaque metadata value (GCSRawdataMetadataClient.java:21-81 — the
    KV store exists exactly for consumer-side artifacts like this).
    ``centroids`` is the ``(cid, cvec)`` DataFrame the trainers return
    (collected ordered — it is nlist-sized by construction) or a plain
    matrix.
    """
    import io

    import numpy as np

    if isinstance(centroids, DataFrame):
        rows = sorted(
            centroids.select("cid", "cvec").collect(), key=lambda r: r["cid"]
        )
        cids = np.array([r["cid"] for r in rows], np.int64)
        mat = np.array([list(r["cvec"]) for r in rows], np.float64)
    else:
        mat = np.asarray(centroids, np.float64)
        cids = np.arange(len(mat), dtype=np.int64)
    buf = io.BytesIO()
    arrays = {"cids": cids, "centroids": mat}
    if codebooks is not None:
        arrays["codebooks"] = np.asarray(codebooks, np.float64)
    np.savez(buf, **arrays)
    return buf.getvalue()


def deserialize_vector_index(blob: bytes):
    """Inverse of :func:`serialize_vector_index`:
    ``(cids, centroid_matrix, codebooks | None)``."""
    import io

    import numpy as np

    with np.load(io.BytesIO(blob)) as z:
        cids = z["cids"]
        centroids = z["centroids"]
        codebooks = z["codebooks"] if "codebooks" in z.files else None
    return cids, centroids, codebooks


def centroids_dataframe(spark, cids, centroids) -> DataFrame:
    """Rebuild the ``(cid, cvec)`` DataFrame the search tiers take."""
    return local_rows_df(
        spark,
        [
            (int(c), [float(x) for x in vec])
            for c, vec in zip(cids, centroids)
        ],
        "cid int, cvec array<double>",
    )


def save_vector_index(metadata_client, key: str, centroids, codebooks=None):
    """Persist a trained index into a topic's metadata KV (S15)."""
    metadata_client.put(key, serialize_vector_index(centroids, codebooks))
    return metadata_client


def load_vector_index(metadata_client, key: str, spark=None):
    """Load a persisted index from topic metadata.  Returns
    ``(centroids, codebooks | None)`` where ``centroids`` is a
    ``(cid, cvec)`` DataFrame when ``spark`` is given (ready for
    :func:`ivf_ann_topk`) else the raw ``(cids, matrix)`` pair; raises
    ``KeyError`` when the key is absent (a loud miss beats silently
    retraining a different quantizer)."""
    blob = metadata_client.get(key)
    if blob is None:
        raise KeyError(f"no vector index under metadata key {key!r}")
    cids, mat, codebooks = deserialize_vector_index(blob)
    if spark is not None:
        return centroids_dataframe(spark, cids, mat), codebooks
    return (cids, mat), codebooks
