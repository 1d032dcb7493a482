#!/usr/bin/env python
"""Capture .explain('formatted') for bench queries into a directory.

Usage: python tools/capture_plans_r17.py OUTDIR [SUFFIX] [q_a q_b ...]

Writes OUTDIR/<query>_<SUFFIX>.txt (suffix defaults to "after").  Run
from the repo checkout whose plans you want to capture — the round's
"before" files come from a git worktree of the previous round's tree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawdata_client_provider_gcs_spark.plans import catalog  # noqa: E402
from rawdata_client_provider_gcs_spark.session import get_spark  # noqa: E402


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    names = sys.argv[3:] or None
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plan-capture-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    bench = catalog.bench_queries()
    todo = names or list(bench)
    for name in todo:
        qdef = bench.get(name) or catalog.QUERIES.get(name)
        if qdef is None:
            print(f"SKIP {name}: not in catalog", flush=True)
            continue
        try:
            df = qdef.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture what we can, keep going
            plan = f"ERROR capturing plan: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
