"""SVG metadata tier (functions/svg.py) — extraction semantics,
Catalyst-only plan, hostile-markup timing bar, multimodal boundary."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.functions import svg as S


def _meta(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, svg string")
    return S.svg_meta(df, "svg").collect()[0].asDict()


def test_basic_extraction(spark):
    m = _meta(
        spark,
        '<?xml version="1.0"?><svg xmlns="http://www.w3.org/2000/svg" '
        'width="120" height="80" viewBox="0 0 240 160">'
        "<title>Logo</title>"
        '<path d="M0 0"/><path d="M1 1"/>'
        '<image href="a.png"/>'
        '<text x="1">hi <tspan>there</tspan></text></svg>',
    )
    assert m["width"] == 120.0 and m["height"] == 80.0  # attr wins
    assert m["n_paths"] == 2 and m["n_images"] == 1 and m["n_texts"] == 1
    assert m["title"] == "Logo"
    assert m["text_content"] == "hi there"
    assert not m["has_script"]


def test_viewbox_fallback_and_units(spark):
    m = _meta(spark, '<svg viewBox="0 0 640 480"><path d="M0 0"/></svg>')
    assert m["width"] == 640.0 and m["height"] == 480.0
    m = _meta(spark, '<svg width="12.5px" height="7em"></svg>')
    assert m["width"] == 12.5 and m["height"] == 7.0  # numeric prefix
    m = _meta(spark, "<svg width='33' height='44'></svg>")  # single quotes
    assert m["width"] == 33.0 and m["height"] == 44.0
    # comma-separated viewBox, negative origin
    m = _meta(spark, '<svg viewBox="-10,-5, 100, 50"></svg>')
    assert m["width"] == 100.0 and m["height"] == 50.0
    # no dimensions at all -> NULL, not 0
    m = _meta(spark, "<svg><path d='M0 0'/></svg>")
    assert m["width"] is None and m["height"] is None
    # malformed viewBox (3 numbers) -> NULL
    m = _meta(spark, '<svg viewBox="0 0 10"></svg>')
    assert m["width"] is None


def test_element_census_is_boundary_aware(spark):
    # <pathological> is not a <path>; <textarea> is not a <text>
    m = _meta(
        spark,
        "<svg><pathological/><path/><textarea/>"
        "<text>x</text><use href='#a'/><script>f()</script></svg>",
    )
    assert m["n_paths"] == 1 and m["n_texts"] == 1 and m["n_uses"] == 1
    assert m["has_script"]


def test_nested_rect_width_not_mistaken_for_root(spark):
    m = _meta(spark, '<svg viewBox="0 0 9 9"><rect width="500"/></svg>')
    assert m["width"] == 9.0  # root has no width attr; rect's must not leak


def test_stays_in_codegen(spark):
    df = spark.createDataFrame([(1, "<svg/>")], "doc_id long, svg string")
    plan = (
        S.svg_meta(df, "svg")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_hostile_markup_linear_time(spark):
    """A flood of unterminated '<svg ' openers and unclosed '<text'
    spans must extract in linear time — same bar as functions.html."""
    hostile = [
        ("<svg " * 60_000) + ">",                     # opener flood, one >
        "<svg " + ("x" * 500_000),                     # no > at all
        '<svg viewBox="0 0 1 1">' + ("<text " * 60_000),  # unclosed texts
        ('<text>y</text>' * 30_000),                   # many closed spans
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hostile)], "doc_id long, svg string"
    ).repartition(1)
    t0 = time.perf_counter()
    S.svg_meta(df, "svg").collect()
    assert time.perf_counter() - t0 < 30.0


def test_multimodal_boundary(spark):
    from rawdata_client_provider_gcs_spark.operators import multimodal as M

    svg = b'<?xml version="1.0"?><svg width="1" height="1"></svg>'
    rows = [(1, bytearray(svg)), (2, bytearray(b"PNG-not-svg" * 4))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r["doc_id"]: r["error"]
        for r in M.extract_features(
            M.with_media_columns(df, "content", "image/svg+xml", "doc_id")
        ).collect()
    }
    assert out[1].startswith("UnsupportedCodecError")  # rasterization
    assert out[2].startswith("MediaDecodeError")       # declared svg, isn't
    # fake mode keeps the stub pipeline alive
    ok = M.extract_features(
        M.with_media_columns(
            df.filter(F.col("doc_id") == 1), "content", "image/svg+xml",
            "doc_id",
        ),
        fake=True,
    ).collect()
    assert ok[0]["error"] is None and len(ok[0]["features"]) == 8
