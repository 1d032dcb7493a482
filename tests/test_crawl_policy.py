"""Crawl-policy tiers: robots.txt evaluation and RSS/Atom feeds —
semantics matrix, hostile input, Catalyst-only plans."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from rawdata_client_provider_gcs_spark.functions import feeds as FD
from rawdata_client_provider_gcs_spark.functions import robots as R

ROBOTS = """# fetched 2026-01-01
User-agent: googlebot
Disallow: /private/
Allow: /private/ok.html

User-agent: *
Disallow: /tmp/
Disallow: /*.pdf$
Allow: /tmp/keep
Crawl-delay: 2.5
Sitemap: https://ex.com/sitemap.xml
Sitemap: https://ex.com/sitemap2.xml
"""


def _verdict(spark, robots: str, path: str, agent: str) -> bool:
    df = spark.createDataFrame([(robots, path)], "robots string, path string")
    return R.with_robots_verdict(df, "robots", "path", agent=agent).collect()[
        0
    ]["robots_allowed"]


def test_robots_semantics_matrix(spark):
    cases = [
        ("*", "/index.html", True),
        ("*", "/tmp/x", False),
        ("*", "/tmp/keep/file", True),      # longer allow wins
        ("*", "/docs/a.pdf", False),         # wildcard + $ anchor
        ("*", "/docs/a.pdf.html", True),     # anchor not at end
        ("googlebot", "/private/x", False),  # named group chosen
        ("googlebot", "/private/ok.html", True),
        ("googlebot", "/tmp/x", True),       # '*' ignored for named UA
        ("GoogleBot", "/private/x", False),  # case-insensitive UA
    ]
    for agent, path, expected in cases:
        assert _verdict(spark, ROBOTS, path, agent) == expected, (agent, path)

    # empty / comment-only robots allow everything; garbage is inert
    for txt in ("", "# nothing here\n", "<html>soft 404</html>"):
        assert _verdict(spark, txt, "/anything", "*")

    df = spark.createDataFrame([(ROBOTS,)], "robots string")
    row = df.select(
        R.robots_crawl_delay(F.col("robots")).alias("d"),
        R.robots_sitemaps(F.col("robots")).alias("s"),
    ).collect()[0]
    assert row["d"] == 2.5 and len(row["s"]) == 2

    # consecutive user-agent lines share one group
    multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert not _verdict(spark, multi, "/x/1", "b")
    assert _verdict(spark, multi, "/x/1", "c")  # no * group -> allowed


def test_robots_stays_codegen_and_bounded(spark):
    hostile = [
        ("User-agent: *\n" * 20_000) + "Disallow: /\n",
        "Disallow: " + "*" * 5_000 + "\nUser-agent: *\n",
        "\n".join(f"Disallow: /p{i}" for i in range(20_000)),
    ]
    df = spark.createDataFrame(
        [(i, "User-agent: *\n" + h, "/p9999/x") for i, h in enumerate(hostile)],
        "doc_id long, robots string, path string",
    ).repartition(1)
    t0 = time.perf_counter()
    R.with_robots_verdict(df, "robots", "path").collect()
    assert time.perf_counter() - t0 < 30.0
    plan = (
        R.with_robots_verdict(df, "robots", "path")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_feed_items_and_meta(spark):
    rss = (
        '<?xml version="1.0"?><rss version="2.0"><channel>'
        "<title>My Blog</title>"
        "<item><title><![CDATA[Post One]]></title>"
        "<link>https://b.ex/1</link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
        "<guid>g1</guid></item>"
        "<item><title>Post 2</title><link>https://b.ex/2</link></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>AtomFeed</title>'
        '<entry><title>E1</title><link rel="self" href="https://a.ex/s"/>'
        '<link rel="alternate" href="https://a.ex/e1"/>'
        "<published>2024-01-01T00:00:00Z</published><id>t1</id></entry>"
        '<entry><title>E2</title><link href="https://a.ex/e2"/>'
        "<updated>2024-02-01T00:00:00Z</updated><id>t2</id></entry></feed>"
    )
    df = spark.createDataFrame(
        [(1, rss), (2, atom), (3, "<html>not a feed</html>")],
        "doc_id long, xml string",
    )
    items = {
        (r["doc_id"], r["item_idx"]): r
        for r in FD.feed_items(df, "xml").collect()
    }
    assert items[(1, 0)]["title"] == "Post One"  # CDATA unwrapped
    assert items[(1, 0)]["link"] == "https://b.ex/1"
    assert items[(2, 0)]["link"] == "https://a.ex/e1"  # alternate wins
    assert items[(2, 1)]["published"] == "2024-02-01T00:00:00Z"  # updated
    assert not [k for k in items if k[0] == 3]

    meta = {r["doc_id"]: r for r in FD.feed_meta(df, "xml").collect()}
    assert meta[1]["feed_title"] == "My Blog" and meta[1]["n_items"] == 2
    assert meta[2]["kind"] == "atom"
    assert meta[3]["kind"] == "unknown" and meta[3]["n_items"] == 0


def test_feed_hostile_linear(spark):
    hostile = [
        ("<item " * 50_000),
        "<rss>" + ("<![CDATA[" * 30_000) + "</rss>",
        "<feed>" + ("<entry><title>" * 20_000),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hostile)], "doc_id long, xml string"
    ).repartition(1)
    t0 = time.perf_counter()
    FD.feed_items(df, "xml").count()
    FD.feed_meta(df, "xml").count()
    assert time.perf_counter() - t0 < 30.0


def test_robots_review_fixes(spark):
    """Round-10 review pins: /$ homepage idiom, UA prefix matching,
    side-by-side verdicts."""
    homepage_only = "User-agent: *\nAllow: /$\nDisallow: /\n"
    assert _verdict(spark, homepage_only, "/", "*")
    assert not _verdict(spark, homepage_only, "/private/", "*")
    assert not _verdict(spark, homepage_only, "/a.html", "*")

    # longest-prefix product-token group selection (Google semantics)
    named = "User-agent: googlebot\nDisallow: /x/\n"
    assert not _verdict(spark, named, "/x/1", "googlebot-news")
    assert not _verdict(spark, named, "/x/1", "Googlebot/2.1")
    assert _verdict(spark, named, "/x/1", "bingbot")  # no group -> allow
    two = (
        "User-agent: google\nDisallow: /a/\n\n"
        "User-agent: googlebot-news\nDisallow: /b/\n"
    )
    # the LONGEST matching token governs: news group, not google
    assert _verdict(spark, two, "/a/x", "googlebot-news")
    assert not _verdict(spark, two, "/b/x", "googlebot-news")

    # two agents side by side do not clobber each other's delay
    df = spark.createDataFrame(
        [(ROBOTS, "/tmp/x")], "robots string, path string"
    )
    both = R.with_robots_verdict(
        R.with_robots_verdict(df, "robots", "path", agent="*"),
        "robots", "path", agent="googlebot", out_col="google_allowed",
    )
    row = both.collect()[0]
    assert row["robots_allowed"] is False and row["google_allowed"] is True
    assert row["crawl_delay_s"] == 2.5
    assert row["google_allowed_delay_s"] is None


def test_mp4_and_ts_sniff_review_fixes(spark):
    from rawdata_client_provider_gcs_spark.operators import (
        multimodal as M,
        rawmp4,
        rawts,
    )

    # bare .m4s reaches the mp4 boundary through dispatch now
    seg = rawmp4.build_m4s()
    assert rawmp4.sniff_mp4(seg)
    df = spark.createDataFrame(
        [(1, bytearray(seg))], "doc_id long, content binary"
    )
    out = M.extract_features(
        M.with_media_columns(df, "content", "video/mp4", "doc_id")
    ).collect()
    assert out[0]["error"].startswith("UnsupportedCodecError")

    # audio/mp2t TS segments sample as recognized containers
    ts = rawts.build_ts(streams=((0x0F, 0x101),))
    df2 = spark.createDataFrame(
        [(1, bytearray(ts))], "doc_id long, content binary"
    )
    fr = M.sample_frames(
        M.with_media_columns(df2, "content", "audio/mp2t", "doc_id"),
        fake=True,
    ).collect()
    assert fr and all(r["error"] is None for r in fr)

    # 'G'-leading text no longer sniffs as TS
    assert not rawts.sniff_ts(b"GET /index.html HTTP/1.1\r\n" + b" " * 400)


def test_sitemap_urls(spark):
    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://e.x/a</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://e.x/b</loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://e.x/m1.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<html>nope</html>")],
        "doc_id long, xml string",
    )
    rows = {
        (r["doc_id"], r["url_idx"]): r
        for r in FD.sitemap_urls(df, "xml").collect()
    }
    assert rows[(1, 0)]["loc"] == "https://e.x/a"
    assert rows[(1, 0)]["lastmod"] == "2024-01-01"
    assert rows[(1, 1)]["lastmod"] == ""
    assert rows[(1, 0)]["kind"] == "urlset"
    assert rows[(2, 0)]["kind"] == "index"
    assert rows[(2, 0)]["loc"] == "https://e.x/m1.xml"
    assert not [k for k in rows if k[0] == 3]
