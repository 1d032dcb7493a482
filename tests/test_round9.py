"""Round-9 additions: HTML numeric character references, ZIP64,
lossy-WebP (VP8 key-frame intra) decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- html


def test_html_numeric_char_refs(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = (
        "<p>&#8220;Hi&#8221; it&#x2019;s &#8211; no, &#8212; em&#8230;</p>"
        "<p>A&#160;B &#xA0; C&#0160;D</p>"
        "<p>&#60;tag&#62; &#34;q&#34; &#X27;s &amp;#38;</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    out = df.select(H.html_visible_text(F.col("page")).alias("v")).collect()
    assert out[0]["v"] == (
        "“Hi” it’s – no, — em… "
        "A B C D <tag> \"q\" 's &#38;"
    )


def test_html_numeric_refs_stay_codegen(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    df = spark.createDataFrame([(1, "<p>&#8217;</p>")], "doc_id long, page string")
    plan = (
        df.select(H.html_visible_text(F.col("page")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_html_numeric_refs_in_table_cells(spark):
    from rawdata_client_provider_gcs_spark.functions import html as H

    page = "<table><tr><td>it&#8217;s</td><td>5&#160;kg</td></tr></table>"
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    out = H.html_tables(df, "page").collect()
    assert list(out[0]["cells"]) == ["it’s", "5 kg"]
