"""Named query catalog — the engine's operator inventory as runnable plans.

Every operator from SURVEY.md §2B is exercised by at least one named query.
A query is a ``(spark, sf_dir) -> DataFrame`` callable; oracle-checkable
queries also carry the equivalent ANSI SQL for DuckDB.  ``__spark_entry__``
exposes this registry to the driver.

**Float-parity discipline** (the reason these queries hash-match an
independent engine): every floating-point output is derived from
order-independent exact quantities — fixed-point LONG sums of
``round(x·10^s)`` (see ``relational.dsum2/dsum4``), counts, min/max —
with identical scalar double arithmetic on both sides.  Plain
``SUM(double)`` is never exposed: Spark's partial-aggregation order
differs from DuckDB's sequential order, and the low bits would diverge.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    description: str = "",
):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name,
            fn=fn,
            oracle=oracle,
            bench=bench,
            tags=tags,
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (fn.__doc__ or description)
            else "",
        )
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: d.fn for name, d in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: d.oracle for name, d in REGISTRY.items() if d.oracle}


def bench_queries() -> dict[str, QueryDef]:
    _load_all()
    return {name: d for name, d in REGISTRY.items() if d.bench}


_LOADED = False


def _load_all():
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import (  # noqa: F401
        behavior,
        curation,
        llm,
        messagelog,
        relational,
        streaming_queries,
        subqueries,
        tpch_extra,
    )
