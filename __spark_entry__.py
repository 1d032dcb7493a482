"""Driver contract for the PySpark rawdata engine.

``entry(spark)`` runs the flagship query (TPC-H-style pricing summary) at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full named-query
catalog from ``rawdata_client_provider_gcs_spark.plans.catalog`` —
one entry per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from rawdata_client_provider_gcs_spark.plans import catalog as _catalog
from rawdata_client_provider_gcs_spark.session import ensure_engine_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_engine_confs(spark)
    return _catalog.queries()["q_agg_basic"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = _catalog.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query."""
    return _catalog.oracle_sql()
