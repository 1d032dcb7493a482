"""RSS / Atom feed parsing — pure Catalyst expressions.

Feeds are how a crawl discovers fresh documents: an RSS ``<item>`` or
Atom ``<entry>`` census with titles, links and timestamps is the
ingest frontier's work list.  Both formats are XML text, so item
explosion and field extraction run entirely in
``pyspark.sql.functions`` with the same linear hostile-markup
discipline as :mod:`.html` (split-by-closer spans, attribute regexes
only on bounded tag bodies).

Handled: RSS 2.0 (``<channel><item>``: title/link/pubDate/guid) and
Atom (``<feed><entry>``: title, ``<link href>`` incl. rel="alternate"
preference, updated/published, id).  CDATA-wrapped titles unwrap; a
document with neither kind of block yields zero rows, not an error.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); feed
handling belongs to this repo's derived curation tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import memo_columns
from .html import _between_tags, _tag_bodies


def _inner(block: Column, tag: str) -> Column:
    """First ``<tag>...</tag>`` content inside ONE bounded item block
    (CDATA unwrapped, inner tags stripped, whitespace collapsed).
    Documented consequence of strip-after-unwrap: angle-bracket runs
    that CDATA was protecting (``<![CDATA[x <1>]]>``) strip like tags —
    the cleaned-text trade, consistent with html_visible_text."""
    spans = _between_tags(
        block, f"(?i)<{tag}(?=[\\s/>])", f"(?is)</{tag}\\s*>"
    )
    raw = F.coalesce(F.try_element_at(spans, F.lit(1)), F.lit(""))
    # CDATA unwrap as LITERAL marker strips (linear; a lazy
    # (?s)<!\[CDATA\[(.*?)\]\]> regex is quadratic on marker floods)
    uncdata = F.replace(
        F.replace(raw, F.lit("<![CDATA[")), F.lit("]]>")
    )
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(uncdata, "<[^>]+>", " "), "\\s+", " "
        )
    )


def _atom_link(block: Column) -> Column:
    """Atom ``<link href>``: prefer rel="alternate" (or no rel), fall
    back to the first link."""
    links = _tag_bodies(block, "link")
    alt = F.filter(
        links,
        lambda t: ~t.rlike("(?i)\\brel\\s*=")
        | t.rlike("(?i)\\brel\\s*=\\s*[\"']alternate[\"']"),
    )
    pick = F.coalesce(
        F.try_element_at(alt, F.lit(1)), F.try_element_at(links, F.lit(1))
    )
    return F.coalesce(
        F.regexp_extract(pick, "(?i)\\bhref\\s*=\\s*[\"']([^\"']*)", 1),
        F.lit(""),
    )


def feed_kind(col: Column) -> Column:
    """``rss`` / ``atom`` / ``unknown`` from the root element."""
    head = F.lower(F.substr(col, F.lit(1), F.lit(2048)))
    return (
        F.when(F.instr(head, "<rss") > 0, F.lit("rss"))
        .when(F.instr(head, "<feed") > 0, F.lit("atom"))
        .otherwise(F.lit("unknown"))
    )


def feed_items(
    df: DataFrame, xml_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Explode a feed document into one row per item/entry:
    ``(id, kind, item_idx, title, link, published, item_id)``.

    RSS items and Atom entries are extracted by the same bounded
    split-by-closer pass; per-item fields by per-block regexes.  The
    ``published`` column is the raw timestamp text (pubDate /
    published / updated) — crawl feeds use every date dialect, so
    normalization belongs to the caller's curation step.
    """
    exploded = df.select(*_feed_explode_cols(xml_col, id_col))
    return exploded.select(*_feed_field_cols(id_col))


# The two Column tuples below depend only on column NAMES, so the deep
# expression trees (hundreds of py4j calls) are built once per process
# and reused across query builds (guide §7.3; see tables.memo_columns).
@memo_columns
def _feed_explode_cols(xml_col: str, id_col: str) -> tuple:
    c = F.col(xml_col)
    kind = feed_kind(c)
    rss_items = _between_tags(c, "(?i)<item(?=[\\s/>])", "(?is)</item\\s*>")
    atom_items = _between_tags(
        c, "(?i)<entry(?=[\\s/>])", "(?is)</entry\\s*>"
    )
    blocks = (
        F.when(kind == "rss", rss_items)
        .when(kind == "atom", atom_items)
        .otherwise(F.array().cast("array<string>"))
    )
    return (
        F.col(id_col), kind.alias("kind"),
        F.posexplode(blocks).alias("item_idx", "__block"),
    )


@memo_columns
def _feed_field_cols(id_col: str) -> tuple:
    b = F.col("__block")
    is_rss = F.col("kind") == "rss"
    return (
        F.col(id_col),
        F.col("kind"),
        F.col("item_idx").cast("long").alias("item_idx"),
        _inner(b, "title").alias("title"),
        F.when(is_rss, _inner(b, "link"))
        .otherwise(_atom_link(b))
        .alias("link"),
        F.when(is_rss, _inner(b, "pubDate"))
        .otherwise(
            F.when(_inner(b, "published") != "", _inner(b, "published"))
            .otherwise(_inner(b, "updated"))
        )
        .alias("published"),
        F.when(is_rss, _inner(b, "guid"))
        .otherwise(_inner(b, "id"))
        .alias("item_id"),
    )


def feed_meta(
    df: DataFrame, xml_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-feed census: ``(id, kind, feed_title, n_items)``."""
    c = F.col(xml_col)
    kind = feed_kind(c)
    n = (
        F.when(
            kind == "rss",
            F.size(
                _between_tags(c, "(?i)<item(?=[\\s/>])", "(?is)</item\\s*>")
            ),
        )
        .when(
            kind == "atom",
            F.size(
                _between_tags(
                    c, "(?i)<entry(?=[\\s/>])", "(?is)</entry\\s*>"
                )
            ),
        )
        .otherwise(F.lit(0))
    )
    # the channel/feed title is the FIRST <title> in the document —
    # both formats put it before any item
    return df.select(
        F.col(id_col),
        kind.alias("kind"),
        _inner(c, "title").alias("feed_title"),
        n.cast("long").alias("n_items"),
    )


def sitemap_urls(
    df: DataFrame, xml_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Explode a sitemap.xml into one row per URL:
    ``(id, kind, url_idx, loc, lastmod)``.

    Handles both document kinds a crawler meets behind robots.txt's
    ``Sitemap:`` lines: ``<urlset><url>`` leaves and
    ``<sitemapindex><sitemap>`` index nodes (``kind`` tells which, so
    the frontier knows whether a row is a page to fetch or another
    sitemap to expand).  Same linear split-by-closer passes as the
    feed parser.
    """
    exploded = df.select(*_sitemap_explode_cols(xml_col, id_col))
    return exploded.select(*_sitemap_field_cols(id_col))


@memo_columns
def _sitemap_explode_cols(xml_col: str, id_col: str) -> tuple:
    c = F.col(xml_col)
    head = F.lower(F.substr(c, F.lit(1), F.lit(2048)))
    kind = (
        F.when(F.instr(head, "<sitemapindex") > 0, F.lit("index"))
        .when(F.instr(head, "<urlset") > 0, F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )
    url_blocks = _between_tags(c, "(?i)<url(?=[\\s/>])", "(?is)</url\\s*>")
    map_blocks = _between_tags(
        c, "(?i)<sitemap(?=[\\s/>])", "(?is)</sitemap\\s*>"
    )
    blocks = (
        F.when(kind == "urlset", url_blocks)
        .when(kind == "index", map_blocks)
        .otherwise(F.array().cast("array<string>"))
    )
    return (
        F.col(id_col), kind.alias("kind"),
        F.posexplode(blocks).alias("url_idx", "__block"),
    )


@memo_columns
def _sitemap_field_cols(id_col: str) -> tuple:
    b = F.col("__block")
    return (
        F.col(id_col),
        F.col("kind"),
        F.col("url_idx").cast("long").alias("url_idx"),
        _inner(b, "loc").alias("loc"),
        _inner(b, "lastmod").alias("lastmod"),
    )
