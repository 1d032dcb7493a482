"""Throughput stress for the document-format ingest tiers (PDF, ZIP, TAR).

Synthesizes a corpus of multi-page PDFs and multi-member archives, runs
the full explode/extract compositions (``multimodal.pdf_text``,
``sources/archive.archive_members``) and reports documents/s, member
or page rows/s, and input MB/s at two scales so linearity is measured,
not assumed.  The document payload is the unit of parallelism — the
100 TB layout is billions of independent files fanned out one Arrow
task per batch, with no shuffle until aggregation.

Usage: python tools/docformat_stress.py [--docs 2000] [--pages 6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from rawdata_client_provider_gcs_spark import get_spark  # noqa: E402
from rawdata_client_provider_gcs_spark.operators import multimodal  # noqa: E402
from rawdata_client_provider_gcs_spark.sources import archive  # noqa: E402

LINE = "lorem ipsum dolor sit amet consectetur adipiscing elit token "


def _pdf_corpus(spark, n_docs: int, n_pages: int):
    def make(batches):
        import pandas as pd

        from rawdata_client_provider_gcs_spark.operators import rawpdf

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                pages = [
                    [f"{LINE}{did}-{p}-{ln}" for ln in range(12)]
                    for p in range(n_pages)
                ]
                enc = rawpdf.encode_pdf if did % 2 == 0 else rawpdf.encode_pdf_modern
                payloads.append(enc(pages))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )


def run_pdf(spark, n_docs: int, n_pages: int) -> dict:
    files = _pdf_corpus(spark, n_docs, n_pages)
    total_bytes = files.agg(F.sum(F.octet_length("payload")).alias("b")).collect()[
        0
    ]["b"]
    t0 = time.perf_counter()
    stats = (
        multimodal.pdf_text(files)
        .agg(
            F.count(F.lit(1)).alias("pages"),
            F.sum(F.length("page_text")).alias("chars"),
            F.count("error").alias("errors"),
        )
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    assert stats["pages"] == n_docs * n_pages and stats["errors"] == 0, stats
    return {
        "docs": n_docs,
        "pages": stats["pages"],
        "input_mb": round(total_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall),
        "pages_per_sec": round(stats["pages"] / wall),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def run_archive(spark, n_docs: int, n_members: int) -> dict:
    body = (LINE * 20).encode()

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                members = [
                    (f"doc/{did}/m{j}.txt", body + str(j).encode())
                    for j in range(n_members)
                ]
                if did % 2 == 0:
                    payloads.append(
                        archive.build_zip(
                            members,
                            method="deflate" if did % 4 == 0 else "store",
                        )
                    )
                else:
                    payloads.append(archive.build_tar(members))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    files = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )
    total_bytes = files.agg(F.sum(F.octet_length("payload")).alias("b")).collect()[
        0
    ]["b"]
    t0 = time.perf_counter()
    stats = (
        archive.archive_members(files)
        .agg(
            F.count(F.lit(1)).alias("members"),
            F.sum("size").alias("bytes_out"),
            F.count("error").alias("errors"),
        )
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    assert stats["members"] == n_docs * n_members and stats["errors"] == 0, stats
    return {
        "archives": n_docs,
        "members": stats["members"],
        "input_mb": round(total_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "archives_per_sec": round(n_docs / wall),
        "members_per_sec": round(stats["members"] / wall),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def run_office(spark, n_docs: int, n_paras: int) -> dict:
    """office_text throughput over a docx/epub/odt rotation (round 11):
    ZIP walk + OPF navigation Python-side, text extraction
    Catalyst-side."""
    from rawdata_client_provider_gcs_spark.sources import office

    paras = [LINE * 12 + str(j) for j in range(n_paras)]

    def make(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                v = did % 3
                if v == 0:
                    payloads.append(office.build_docx(paras))
                elif v == 1:
                    payloads.append(office.build_epub(paras, title=""))
                else:
                    payloads.append(office.build_odt(paras))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    files = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .repartition(32)
        .mapInPandas(make, "doc_id long, payload binary")
        .persist()
    )
    total_bytes = files.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"]
    t0 = time.perf_counter()
    stats = (
        office.office_text(files)
        .agg(
            F.count(F.lit(1)).alias("parts"),
            F.sum(F.length("text")).alias("chars_out"),
            F.count("error").alias("errors"),
        )
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    files.unpersist()
    assert stats["errors"] == 0, stats
    return {
        "docs": n_docs,
        "parts": stats["parts"],
        "input_mb": round(total_bytes / 1e6, 1),
        "text_mb_out": round((stats["chars_out"] or 0) / 1e6, 1),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall),
        "mb_per_sec": round(total_bytes / 1e6 / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--pages", type=int, default=6)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--paras", type=int, default=40)
    args = ap.parse_args()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "pdf_small": run_pdf(spark, args.docs, args.pages),
        "pdf_big": run_pdf(spark, args.docs * 4, args.pages),
        "archive_small": run_archive(spark, args.docs, args.members),
        "archive_big": run_archive(spark, args.docs * 4, args.members),
        "office_small": run_office(spark, args.docs, args.paras),
        "office_big": run_office(spark, args.docs * 4, args.paras),
    }
    out["pdf_scale_ratio"] = round(
        out["pdf_big"]["wall_sec"] / max(out["pdf_small"]["wall_sec"], 1e-9), 2
    )
    out["archive_scale_ratio"] = round(
        out["archive_big"]["wall_sec"]
        / max(out["archive_small"]["wall_sec"], 1e-9),
        2,
    )
    out["office_scale_ratio"] = round(
        out["office_big"]["wall_sec"]
        / max(out["office_small"]["wall_sec"], 1e-9),
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
