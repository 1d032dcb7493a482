#!/usr/bin/env python
"""Count Spark jobs per catalog-query build+run (driver-overhead probe).

The iterative operators (pagerank, connected components) are bounded by
per-round job/stage fixed overhead at toy scale, not by compute
(optimization guide §1.2); this probe makes "fewer jobs" measurable.
Runs each query once under a dedicated job group and reports how many
job IDs landed in the group plus the wall time.

Usage: python tools/jobcount.py q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawdata_client_provider_gcs_spark.plans import catalog  # noqa: E402
from rawdata_client_provider_gcs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = catalog.queries()
    out = {}
    for name in sys.argv[1:]:
        fn = qs[name]
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {"jobs": len(jobs), "sec": round(dt, 3)}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
