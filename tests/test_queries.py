"""Oracle harness: every catalog query vs DuckDB on the same parquet.

Mirrors the driver's t2 check (row count + schema + order-insensitive
values) at sf0.001 so regressions surface locally in seconds.  Values are
compared after sorting rows by all columns; floats must agree to 1e-9
relative (the catalog's decimal-sum discipline usually makes them
bit-identical).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from rawdata_client_provider_gcs_spark.tables import TABLE_NAMES

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_smoke_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke_dir}/{t}.parquet'"
        )
    return con


def canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if isinstance(value, bytes):
        return value.hex()
    return value


def rows_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(canon(v))) for v in row
    )


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb or abs(fa - fb) <= 1e-9 * max(abs(fa), abs(fb), 1.0)
    return str(canon(a)) == str(canon(b))


def compare(spark_df, duck_rows, duck_cols, name):
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    order = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = [tuple(r[i] for i in order) for r in spark_df.collect()]
    d_rows = [tuple(r[i] for i in d_order) for r in duck_rows]
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    s_rows.sort(key=rows_key)
    d_rows.sort(key=rows_key)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            assert values_equal(sv, dv), (
                f"{name}: row {i} col {sorted(spark_cols)[c]}: "
                f"spark={sv!r} oracle={dv!r}"
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_smoke_dir):
    df = QUERIES[name](spark, sf_smoke_dir)
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    compare(df, duck_rows, duck_cols, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_smoke_dir):
    df = QUERIES[name](spark, sf_smoke_dir)
    assert df.columns
    df.collect()  # must execute without error


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_no_toplevel_array_or_map_outputs(spark, sf_smoke_dir):
    """Catalog rule: driver-facing queries emit scalars only.

    The driver's canonicalizer sorts result columns with pandas, which
    dies on unhashable numpy arrays (the r3 ``q_agg_approx_percentile``
    red row) — so no query may emit a top-level array/map column.
    Schema construction is lazy; streaming queries (which execute on
    build) are covered by the parity tests above plus the full-catalog
    audit, so they're skipped here for speed.
    """
    from pyspark.sql.types import ArrayType, MapType

    offenders = []
    for name, fn in QUERIES.items():
        if name.startswith("q_stream_"):
            continue
        for f in fn(spark, sf_smoke_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
