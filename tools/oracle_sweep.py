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
        if a.is_integer() and b.is_integer():
            # integral values never get the float escape hatch — an
            # off-by-one count in a double column must fail here the
            # way the driver's exact hash would (r15 verdict ask #8)
            return a == b
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


# DuckDB output types that the driver's hash canonicalization does NOT
# fold into Spark's LONG/DOUBLE — an oracle emitting one of these passes
# the old float-coercing comparator locally but goes red in the driver
# (r15 postmortem: q_multimodal_vp9_pixels SUM(BIGINT) -> HUGEINT).
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_dtype_problem(con, oracle: str) -> str | None:
    desc = con.execute("DESCRIBE " + oracle).df()
    bad = [
        f"{r.column_name}:{r.column_type}"
        for r in desc.itertuples()
        if any(r.column_type.upper().startswith(t) for t in BAD_ORACLE_TYPES)
    ]
    if bad:
        return "oracle dtype not driver-canonical: " + ", ".join(bad)
    return None


def frames_match(sp: pd.DataFrame, du: pd.DataFrame) -> str | None:
    if sorted(sp.columns) != sorted(du.columns):
        return f"columns {sorted(sp.columns)} vs {sorted(du.columns)}"
    if len(sp) != len(du):
        return f"rows {len(sp)} vs {len(du)}"
    sp, du = canon(sp), canon(du)
    for c in sp.columns:
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        # integer-vs-float column divergence with no null-promotion on the
        # float side = a real type mismatch the driver would hash red
        # (int==float compares True per-value, so catch it at dtype level)
        if {ks, kd} == {"i", "f"}:
            fl = sp[c] if ks == "f" else du[c]
            if not fl.isna().any():
                return f"col {c}: dtype {ks} vs {kd} without null-promotion"
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
    ap.add_argument(
        "--full",
        action="store_true",
        help="also run the rows-only (no-oracle) queries and record their "
        "row counts, so ONE sweep re-confirms the whole catalog",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="write a per-query JSON artifact in the driver's CORRECTNESS "
        "shape (rows/schema/hash matches per query)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-oracle-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    if args.queries:
        names = args.queries
    elif args.full:
        names = sorted(qs)  # deterministic all-names order
    else:
        names = [n for n in qs if n in oracles]
    ok, bad = [], {}
    record: dict[str, dict] = {}
    for name in names:
        oracle = oracles.get(name)
        try:
            sp = qs[name](spark, args.sf_dir).toPandas()
            if oracle is None:
                # rows-only by declared design: record a fresh row count
                record[name] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "rows_only": True,
                    "spark_rows": len(sp),
                    "oracle_rows": None,
                    "err": None,
                }
                ok.append(name)
                print(f"OK {name} (rows-only: {len(sp)} rows)", flush=True)
                continue
            du = con.execute(oracle).df()
            problem = oracle_dtype_problem(con, oracle) or frames_match(
                sp, du
            )
            record[name] = {
                "rows_match": len(sp) == len(du),
                "schema_match": sorted(sp.columns) == sorted(du.columns),
                "hash_match": problem is None,
                "spark_rows": len(sp),
                "oracle_rows": len(du),
                "err": problem,
            }
        except Exception as exc:  # noqa: BLE001
            problem = f"ERROR {type(exc).__name__}: {exc}"
            record[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": problem[:500],
            }
        if problem:
            bad[name] = problem
            print(f"MISMATCH {name}: {problem}", flush=True)
        else:
            ok.append(name)
            print(f"OK {name}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"ok": len(ok), "bad": bad}))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
