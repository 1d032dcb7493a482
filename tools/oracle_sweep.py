#!/usr/bin/env python
"""Local oracle sweep — run every oracle-checkable catalog query on Spark
AND DuckDB at sf0.01 and compare values, mimicking the driver's
CORRECTNESS harness (sorted column names, row-sorted values, NaN-safe).

Usage: python tools/oracle_sweep.py [--sf-dir DIR] [--queries q_a q_b ...]
Prints one line per query (OK/MISMATCH/ERROR) and a JSON summary tail.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from rawdata_client_provider_gcs_spark.plans import catalog
from rawdata_client_provider_gcs_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def frames_match(sp: pd.DataFrame, du: pd.DataFrame) -> str | None:
    if sorted(sp.columns) != sorted(du.columns):
        return f"columns {sorted(sp.columns)} vs {sorted(du.columns)}"
    if len(sp) != len(du):
        return f"rows {len(sp)} vs {len(du)}"
    sp, du = canon(sp), canon(du)
    for c in sp.columns:
        av, bv = sp[c].tolist(), du[c].tolist()
        for i, (a, b) in enumerate(zip(av, bv)):
            if (a is None) != (b is None) or (
                a is not None and not values_equal(a, b)
            ):
                return f"col {c} row {i}: {a!r} != {b!r}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-oracle-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    names = args.queries or [n for n in qs if n in oracles]
    ok, bad = [], {}
    for name in names:
        try:
            sp = qs[name](spark, args.sf_dir).toPandas()
            du = con.execute(oracles[name]).df()
            problem = frames_match(sp, du)
        except Exception as exc:  # noqa: BLE001
            problem = f"ERROR {type(exc).__name__}: {exc}"
        if problem:
            bad[name] = problem
            print(f"MISMATCH {name}: {problem}", flush=True)
        else:
            ok.append(name)
            print(f"OK {name}", flush=True)

    print(json.dumps({"ok": len(ok), "bad": bad}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
