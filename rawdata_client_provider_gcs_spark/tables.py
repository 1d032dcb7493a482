"""Testdata table loader.

The driver's parquet files carry ``TIMESTAMP(NANOS)`` columns which Spark
cannot read natively; with ``spark.sql.legacy.parquet.nanosAsLong=true``
they surface as LongType nanoseconds.  This loader detects those columns
from the parquet footer (via pyarrow, driver-side — one tiny metadata read,
no data IO) and converts them to ``timestamp_ntz`` truncated to
microseconds, which is exactly what DuckDB's TIMESTAMP view of the same
files yields — keeping the oracle comparison honest.

Scale note: footer inspection reads one footer per table on the driver;
the data path stays a columnar vectorized parquet scan with pushdown.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_timestamp_columns(parquet_path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(parquet_path)
    except Exception:
        return ()
    cols = []
    for field in schema:
        if str(field.type).startswith("timestamp[ns"):
            cols.append(field.name)
    return tuple(cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_engine_confs(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_columns(path):
        # floor-divide nanos → micros, matching DuckDB's ns→us truncation
        df = df.withColumn(
            col,
            F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
