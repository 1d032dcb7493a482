"""Throughput stress for the crawl front door (WARC → HTML → text).

Synthesizes a corpus of WARC files (each holding many HTTP-200 HTML
responses), runs the full ingest composition — ``warc_records``
explode, HTTP filter, ``with_html_columns`` extraction, token stats —
and reports records/s and input MB/s at two scales so linearity is
measured, not assumed.  The file count is the unit of parallelism
(exactly the 100 TB layout: millions of ~1 GB WARCs), so scaling files
at fixed records-per-file is the honest axis.

Usage: python tools/crawl_stress.py [--files 64] [--records 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from rawdata_client_provider_gcs_spark import get_spark  # noqa: E402
from rawdata_client_provider_gcs_spark.functions import html as H  # noqa: E402
from rawdata_client_provider_gcs_spark.sources import warc as W  # noqa: E402


def run(spark, n_files: int, recs_per_file: int, skew_factor: int = 1) -> dict:
    """Full ingest pipeline; ``skew_factor`` makes file 0 carry that
    many times the records — the straggler shape a real crawl has (one
    10 GB WARC among 1 GB peers) pinning one task."""

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for fid in pdf["file_id"]:
                fid = int(fid)
                recs = []
                n_recs = recs_per_file * (skew_factor if fid == 0 else 1)
                for r in range(n_recs):
                    body = (
                        f"<html><head><title>p{fid}-{r}</title>"
                        "<script>var x=1;</script></head><body>"
                        + f"<p>{'lorem ipsum token ' * 40}doc {fid} {r}</p>"
                        + '<a href="https://x/y">l</a> ' * (r % 5)
                        + "</body></html>"
                    ).encode()
                    recs.append(
                        {
                            "warc_type": "response",
                            "target_uri": f"https://h{fid % 97}.example/{r}",
                            "http_status": 200,
                            "body": body,
                        }
                    )
                payloads.append(W.build_warc(recs, gzip_members=True))
            yield pd.DataFrame(
                {"doc_id": pdf["file_id"], "payload": payloads}
            )

    files = (
        spark.range(n_files)
        .withColumnRenamed("id", "file_id")
        .repartition(min(n_files, 32))
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )
    total_bytes = files.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"]
    t0 = time.perf_counter()
    out = (
        W.warc_records(files)
        .filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select("doc_id", F.col("body").cast("string").alias("html"))
    )
    stats = (
        H.with_html_columns(out, "html")
        .agg(
            F.count(F.lit(1)).alias("pages"),
            F.sum("html_text_len").alias("chars"),
            F.sum("html_n_links").alias("links"),
        )
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    expect = recs_per_file * (n_files - 1 + skew_factor)
    assert stats["pages"] == expect, stats
    return {
        "files": n_files,
        "skew_factor": skew_factor,
        "records": stats["pages"],
        "input_mb": round(total_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "records_per_sec": round(stats["pages"] / wall),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def run_archive(spark, n_files: int, members_per_file: int, fmt: str) -> dict:
    """archive_members explode throughput (zip-deflate or tar)."""
    from rawdata_client_provider_gcs_spark.sources import archive as A

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for fid in pdf["file_id"]:
                fid = int(fid)
                members = [
                    (
                        f"d{fid}/f{m:05d}.txt",
                        (f"member {fid} {m} " * 50).encode(),
                    )
                    for m in range(members_per_file)
                ]
                payloads.append(
                    A.build_zip(members)
                    if fmt == "zip"
                    else A.build_tar(members)
                )
            yield pd.DataFrame({"doc_id": pdf["file_id"], "payload": payloads})

    files = (
        spark.range(n_files)
        .withColumnRenamed("id", "file_id")
        .repartition(min(n_files, 32))
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )
    total_bytes = files.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"]
    t0 = time.perf_counter()
    n = (
        A.archive_members(files)
        .filter(F.col("error").isNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("payload")).alias("out_b"),
        )
        .collect()
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    assert n[0]["n"] == n_files * members_per_file
    return {
        "format": fmt,
        "files": n_files,
        "members": n[0]["n"],
        "input_mb": round(total_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "members_per_sec": round(n[0]["n"] / wall),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def run_wrapped_bytes(
    spark, n_files: int, mb_per_file: int, wrapper: str
) -> dict:
    """Wrapped-archive peel throughput at real byte weight: each file
    is a tar of text-ish members totaling ``mb_per_file`` MB, wrapped
    in lz4 (pure-Python decode), gzip (stdlib zlib, the rewrap
    recommendation's fast path), or zst (pure-Python RFC 8878 decode;
    fixtures come from the system zstd CLI at level 3 so the measured
    path is real entropy-coded frames, not raw blocks).  Reports
    decompressed bytes/s for the
    whole box and per core — the number the 6–9 MB/s/core PERF.md
    budget extrapolates from, measured instead at GB scale."""
    import gzip

    from rawdata_client_provider_gcs_spark.sources import archive as A
    from rawdata_client_provider_gcs_spark.sources import compression as C

    member_bytes = 1 << 20

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for fid in pdf["file_id"]:
                fid = int(fid)
                members = []
                for m in range(mb_per_file):
                    # text-ish with a per-row counter: ~6-8x compression
                    # ratio like real text, so both the literal and
                    # match-copy decode paths run at realistic mix
                    rows = []
                    r = 0
                    size = 0
                    while size < member_bytes:
                        line = (
                            f"file {fid} member {m} row {r:08d} "
                            f"lorem ipsum dolor sit amet {r * 2654435761 % 997}\n"
                        ).encode()
                        rows.append(line)
                        size += len(line)
                        r += 1
                    body = b"".join(rows)[:member_bytes]
                    members.append((f"d{fid}/m{m:03d}.txt", body))
                tar = A.build_tar(members)
                if wrapper == "lz4":
                    payloads.append(C.lz4_compress(tar))
                elif wrapper == "zst":
                    import shutil
                    import subprocess

                    zbin = shutil.which("zstd") or "/root/miniconda/bin/zstd"
                    payloads.append(
                        subprocess.run(
                            [zbin, "-q", "-3", "-c"], input=tar,
                            capture_output=True, check=True,
                        ).stdout
                    )
                else:
                    payloads.append(gzip.compress(tar, 1))
            yield pd.DataFrame({"doc_id": pdf["file_id"], "payload": payloads})

    files = (
        spark.range(n_files)
        .withColumnRenamed("id", "file_id")
        .repartition(min(n_files, 32))
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )
    comp_bytes = files.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"]
    cores = spark.sparkContext.defaultParallelism
    t0 = time.perf_counter()
    n = (
        A.archive_members(files)
        .filter(F.col("error").isNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("payload")).alias("out_b"),
        )
        .collect()
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    assert n[0]["n"] == n_files * mb_per_file, n[0]["n"]
    out_b = n[0]["out_b"]
    return {
        "wrapper": wrapper,
        "files": n_files,
        "decompressed_gb": round(out_b / 1e9, 2),
        "compressed_mb": round(comp_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "mb_per_sec_box": round(out_b / 1e6 / wall, 1),
        "mb_per_sec_core": round(out_b / 1e6 / wall / cores, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--records", type=int, default=300)
    ap.add_argument("--members", type=int, default=400)
    ap.add_argument(
        "--wrapped-gb",
        action="store_true",
        help="only the GB-scale wrapped-archive rows (lz4 vs gzip)",
    )
    args = ap.parse_args()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if args.wrapped_gb:
        out = {
            "lz4_1gb": run_wrapped_bytes(spark, args.files, 16, "lz4"),
            "gzip_1gb": run_wrapped_bytes(spark, args.files, 16, "gzip"),
            "zst_1gb": run_wrapped_bytes(spark, args.files, 16, "zst"),
        }
        print(json.dumps(out))
        spark.stop()
        return
    small = run(spark, args.files, args.records)
    big = run(spark, args.files * 4, args.records)
    out = {
        "small": small,
        "big": big,
        "scale_ratio": round(
            big["wall_sec"] / max(small["wall_sec"], 1e-9), 2
        ),
        "skew_balanced": run(spark, 32, args.records * 2, 1),
        "skew_10x": run(spark, 32, args.records * 2, 10),
        "skew_40x": run(spark, 32, args.records * 2, 40),
        "zip_small": run_archive(spark, args.files, args.members, "zip"),
        "zip_big": run_archive(spark, args.files * 4, args.members, "zip"),
        "tar_small": run_archive(spark, args.files, args.members, "tar"),
        "tar_big": run_archive(spark, args.files * 4, args.members, "tar"),
    }
    out["zip_scale_ratio"] = round(
        out["zip_big"]["wall_sec"] / max(out["zip_small"]["wall_sec"], 1e-9), 2
    )
    out["tar_scale_ratio"] = round(
        out["tar_big"]["wall_sec"] / max(out["tar_small"]["wall_sec"], 1e-9), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
