"""SparkSession factory with the engine's scale-oriented defaults.

Two deployment profiles mirror the reference's two providers
(GCSRawdataClientInitializer.java:43-70 vs
FilesystemAvroRawdataClientInitializer.java:32-42): ``filesystem`` needs no
extra conf; ``gcs`` is pure connector configuration (auth keyfile, chunk
size) applied to the same engine code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs the engine needs regardless of who built the session.  All are
#: runtime-settable, so :func:`ensure_engine_confs` can repair a session the
#: harness created without them.
ENGINE_SQL_CONFS = {
    # testdata parquet carries TIMESTAMP(NANOS); read as long, convert in
    # the loader (tables.py) — Spark has no native nanos timestamp reads.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle-partition coalescing + skew-join handling are the
    # 100 TB safety net (SURVEY.md §4).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas UDF / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    for key, value in ENGINE_SQL_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-settable in this build — defaults applied at create
    return spark


def gcs_connector_conf(
    keyfile: str | None = None,
    read_only: bool = False,
    upload_chunk_mb: int = 8,
) -> dict[str, str]:
    """Spark conf for the ``gs://`` provider (reference S17/S18 parity).

    Mirrors GCSRawdataClientInitializer.java:43-82: service-account keyfile
    or compute-engine credentials, read-only scope for consumers vs
    read-write for producers, and the 8 MiB upload chunking of
    GCSRawdataAvroFile.java:52.  Requires the gcs-connector jar on the
    classpath (not shipped in this offline build); every engine code path
    is scheme-agnostic through the Hadoop FileSystem API, so a ``gs://``
    root needs only this conf.
    """
    conf = {
        "spark.hadoop.fs.AbstractFileSystem.gs.impl": (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
        ),
        "spark.hadoop.fs.gs.impl": (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
        ),
        "spark.hadoop.fs.gs.outputstream.upload.chunk.size": str(
            upload_chunk_mb * 1024 * 1024
        ),
    }
    if keyfile:
        conf["spark.hadoop.google.cloud.auth.service.account.enable"] = "true"
        conf["spark.hadoop.google.cloud.auth.service.account.json.keyfile"] = keyfile
    if read_only:
        conf["spark.hadoop.fs.gs.auth.access.token.provider.scope"] = (
            "https://www.googleapis.com/auth/devstorage.read_only"
        )
    return conf


def get_spark(
    app_name: str = "rawdata-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in ENGINE_SQL_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return ensure_engine_confs(spark)


def local_rows_df(spark: SparkSession, rows, schema, slices: int = 1):
    """Driver-local rows as a SINGLE-slice DataFrame (small side tables).

    ``spark.createDataFrame(rows, schema)`` slices local data into
    ``defaultParallelism`` Python partitions; every job over the result
    then pays one Python-worker round trip *per slice* — measured at
    ~0.2 s x 32 slices ≈ 6 s for a 16-row centroid table on a 32-core
    local session (optimization guide §4: every JVM↔Python crossing has
    a fixed cost; here the crossing count was proportional to the core
    count, not the data).  Parallelizing into one slice makes the whole
    relation one Python partition: one round trip, identical rows.

    Only for DRIVER-BOUNDED row sets (collected centroids, probe
    batches, scalar results) — never corpus-sized data.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )
