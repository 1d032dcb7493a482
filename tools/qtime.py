#!/usr/bin/env python
"""Time individual catalog queries in isolation (bench methodology:
noop sink, one warm lap, then N timed laps; prints per-lap seconds and
the best).  For A/B measurement of one query without whole-bench noise.

Usage: python tools/qtime.py [-n LAPS] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawdata_client_provider_gcs_spark.plans import catalog  # noqa: E402
from rawdata_client_provider_gcs_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="timed laps per query")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    out = {}
    for name in args.queries:
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        laps = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            laps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"laps": laps, "best": min(laps)}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
