#!/usr/bin/env python
"""Message-log throughput: produce/consume rates for the client surface.

The reference implementation is a message-log client (produce → topic
files on GCS → consume); query operators aside, its unit of performance
is messages/second on one node.  This harness measures ours on the same
axes a reference user would:

- **produce (message API)**: ``RawdataProducer.publish`` in batches —
  the reference's producer loop shape, including ULID assignment,
  buffering, windowed rotation, commit-protocol rename, and the
  manifest sidecar.
- **produce (bulk DataFrame)**: ``publish_dataframe`` — the Spark-native
  distributed path a migration uses for backfills.
- **consume (sequential)**: ``RawdataConsumer.receive`` drain — ordered
  scan with ULID cursor semantics.
- **consume (bulk DataFrame)**: topic → DataFrame → noop sink — the
  Spark-native read path.

Prints one JSON line.  Topics are written to a throwaway tempdir (local
fs stands in for the bucket; the GCS connector path differs only in the
Hadoop FS scheme).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark import (
    RawdataClient,
    RawdataMessage,
    get_spark,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--messages", type=int, default=20000)
    ap.add_argument("--payload-bytes", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1000,
                    help="messages per publish() call in the message-API path")
    args = ap.parse_args()

    spark = get_spark(app_name="rawdata-throughput", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="rawdata-throughput-")
    client = RawdataClient(spark, root)
    payload = b"x" * args.payload_bytes
    n = args.messages
    out: dict[str, float] = {}

    # warm up Spark write/read machinery so the first measured path isn't
    # billed for JVM/codegen/committer startup
    warm = spark.range(100).selectExpr("cast(id as string) position")
    warm.write.mode("overwrite").parquet(os.path.join(root, ".warm"))
    spark.read.parquet(os.path.join(root, ".warm")).write.mode(
        "overwrite"
    ).format("noop").save()

    # -- produce, message API (batched publish calls) ----------------------
    msgs = [
        RawdataMessage(position=f"p-{i:08d}", data={"body": payload})
        for i in range(n)
    ]
    t0 = time.perf_counter()
    with client.producer("t_msg") as p:
        for i in range(0, n, args.batch):
            p.publish(*msgs[i : i + args.batch])
    out["produce_message_api_msgs_per_s"] = round(n / (time.perf_counter() - t0))

    # -- produce, bulk DataFrame -------------------------------------------
    src = spark.range(n).select(
        F.concat(F.lit("p-"), F.lpad(F.col("id").cast("string"), 8, "0")).alias(
            "position"
        ),
        F.lit(payload).alias("body"),
    )
    t0 = time.perf_counter()
    with client.producer("t_bulk") as p:
        p.publish_dataframe(src, position_col="position", data_cols={"body": "body"})
    out["produce_bulk_dataframe_msgs_per_s"] = round(n / (time.perf_counter() - t0))

    # -- consume, sequential message API -----------------------------------
    c = client.consumer("t_msg")
    t0 = time.perf_counter()
    seen = 0
    while c.receive(0.0) is not None:
        seen += 1
    dt = time.perf_counter() - t0
    assert seen == n, (seen, n)
    out["consume_sequential_msgs_per_s"] = round(n / dt)

    # -- consume, bulk DataFrame -------------------------------------------
    t0 = time.perf_counter()
    client.consumer("t_msg").dataframe().write.mode("overwrite").format(
        "noop"
    ).save()
    out["consume_bulk_dataframe_msgs_per_s"] = round(n / (time.perf_counter() - t0))

    print(json.dumps({"messages": n, "payload_bytes": args.payload_bytes, **out}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
