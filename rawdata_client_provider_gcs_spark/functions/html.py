"""HTML → text extraction for crawl-scale curation (pure built-ins).

The first step of every web-crawl training-data pipeline is turning
raw HTML into visible text plus lightweight structure signals (title,
link density, tag density) — the inputs the quality/curation tiers
(``functions/text.py``, ``operators/curation.py``) consume.  Everything
here is Catalyst expressions (``regexp_replace``/``regexp_extract``/
``replace``/``length``), so extraction runs inside whole-stage codegen
with zero Python in the hot path — at 100 TB this tier is pure
map-side scan work with full column pruning.

Scope: deterministic rule-based extraction (drop ``script``/``style``
subtrees, strip tags, decode the common entities, collapse
whitespace), not a browser. Malformed markup degrades gracefully —
an unclosed tag strips to the next ``>``; leftover angle brackets
simply stay in the text, mirroring what lenient crawl parsers do.

Reference behavioral parity: the reference transport stores documents
as opaque named byte arrays (RawdataMessage.java:15-60); HTML
handling belongs to this repo's derived curation tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import memo_columns

#: named entities decoded after tag stripping — the half-dozen that
#: dominate real crawl text.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must come LAST so "&amp;lt;" decodes to "&lt;"
]

#: numeric character references for the high-frequency dozen (curly
#: quotes, dashes, ellipsis, nbsp, the ASCII five) — each decoded by
#: ONE case-insensitive fixed-alternation ``regexp_replace`` (linear,
#: no lazy quantifiers, stays in whole-stage codegen).  Decoding is a
#: fixed table, not a general ``&#N;`` evaluator: arbitrary code
#: points would need a per-match int parse that Catalyst can't express
#: without Python.  Sequential-replace semantics, documented: the
#: numeric passes run BEFORE the named table, so ``&amp;#38;`` decodes
#: to ``&#38;`` (matching a browser's single pass), while ``&#38;amp;``
#: decodes all the way to ``&`` (a browser leaves ``&amp;``) — later
#: passes can re-decode earlier passes' output.  The DuckDB oracles
#: restate the identical chain (``plans.llm._sql_entity_chain`` derives
#: the SQL from these tables).
_NUMERIC_REFS = [
    ("(?i)&#(0*8216|x0*2018);", "‘"),
    ("(?i)&#(0*8217|x0*2019);", "’"),
    ("(?i)&#(0*8220|x0*201c);", "“"),
    ("(?i)&#(0*8221|x0*201d);", "”"),
    ("(?i)&#(0*8211|x0*2013);", "–"),
    ("(?i)&#(0*8212|x0*2014);", "—"),
    ("(?i)&#(0*8230|x0*2026);", "…"),
    ("(?i)&#(0*160|x0*a0);", " "),
    ("(?i)&#(0*34|x0*22);", '"'),
    ("(?i)&#(0*39|x0*27);", "'"),
    ("(?i)&#(0*60|x0*3c);", "<"),
    ("(?i)&#(0*62|x0*3e);", ">"),
    ("(?i)&#(0*38|x0*26);", "&"),
]


def _decode_entities(col: Column) -> Column:
    """Numeric refs (fixed table, regexp passes) then named entities
    (literal replaces, ``&amp;`` last)."""
    for pat, ch in _NUMERIC_REFS:
        col = F.regexp_replace(col, pat, ch)
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via the length trick (stays
    in codegen; no regex engine involved)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


#: the DuckDB oracles state subtree dropping as the single lazy
#: alternation ``(?is)<script[^>]*>.*?</script\s*>|<style...|<title...``;
#: the Spark implementation computes the same function with linear
#: split passes (see ``_drop_subtrees``) because the lazy form is
#: quadratic on hostile unclosed-opener markup.


def html_title(col: Column) -> Column:
    """Contents of the first ``<title>`` element (empty when absent;
    case-insensitive — legacy crawl HTML shouts ``<TITLE>``)."""
    return F.regexp_extract(col, "(?is)<title[^>]*>([^<]*)</title>", 1)


def _drop_subtrees(col: Column, tag: str) -> Column:
    """Remove ``<tag ...> .. </tag>`` spans — LINEAR in input size.

    Split by the closing tag (one pass), keep each segment's content
    before its FIRST opener (the span from opener to closer is the
    dropped subtree), and keep the tail segment whole.  The opener is
    matched as a zero-width-bounded literal prefix
    ``<tag(?=[\\s/>])`` — NOT ``<tag[^>]*>``, whose ``[^>]*`` scan is
    itself quadratic on a flood of unterminated openers (``'<tag ' *
    100k`` with one closer: each prefix re-scans to segment end).
    Behavioral deltas vs the lazy regex, both only on malformed
    markup: an unterminated opener inside a closed segment now drops
    the rest of that segment (the regex kept it as garbled visible
    text — dropping script-ish garbage is the better curation
    outcome), and a sloppy ``<tagx>`` no longer reads as an opener.
    Segments re-join with a space, matching the regex's ``' '``
    replacement after whitespace collapse.
    """
    open_re = f"(?i)<{tag}(?=[\\s/>])"
    close_re = f"(?is)</{tag}\\s*>"
    segs = F.split(col, close_re)
    n = F.size(segs)
    kept = F.transform(
        segs,
        lambda s, i: F.when(i < n - 1, F.element_at(F.split(s, open_re), 1))
        .otherwise(s),
    )
    return F.array_join(kept, " ")


def html_visible_text(col: Column) -> Column:
    """Visible text: drop script/style/title subtrees (title is head
    metadata, not body text), strip tags, decode common entities,
    collapse whitespace.  Subtree drops run as sequential linear passes
    (see :func:`_drop_subtrees`); on well-formed markup the result is
    identical to the single alternation regex the DuckDB oracles state,
    and hostile unclosed-opener pages cost linear, not quadratic, time."""
    no_sub = col
    for tag in ("script", "style", "title"):
        no_sub = _drop_subtrees(no_sub, tag)
    no_tags = F.regexp_replace(no_sub, "<[^>]+>", " ")
    return F.trim(F.regexp_replace(_decode_entities(no_tags), "\\s+", " "))


def _clean_cell(cell: Column) -> Column:
    """One table cell's inner HTML → trimmed visible text (same rules
    as ``html_visible_text``, minus subtree drops — script/style inside
    a cell is pathological and strips as tags anyway)."""
    no_tags = F.regexp_replace(cell, "<[^>]+>", " ")
    return F.trim(F.regexp_replace(_decode_entities(no_tags), "\\s+", " "))


def _between_tags(col: Column, open_prefix_re: str, close_re: str) -> Column:
    """Array of the contents between each ``<tag ...>`` and its nearest
    following closer — LINEAR in input size.

    The obvious ``regexp_extract_all('<t[^>]*>(.*?)</t>')`` form is
    quadratic on hostile crawl markup, twice over: each unclosed
    opener's ``.*?`` lazily scans to end-of-input (measured 22 s for
    828 KB of ``<table>`` openers), and even the opener's own
    ``[^>]*>`` re-scans to segment end for every unterminated
    ``'<table '`` in a flood.  Instead: split by the closing tag, drop
    the tail segment (no closer follows it), keep what follows the
    LAST opener PREFIX in each segment (matched zero-width-bounded,
    ``<tag(?=[\\s/>])``), then skip through the opener's first ``>``
    — every character is visited O(1) times.

    Known semantics vs a browser, documented not accidental: closers
    are REQUIRED (HTML5's omitted optional ``</tr>``/``</td>`` end
    tags extract nothing), and under nested same-tag markup the
    innermost span wins (the outer table's own rows are not
    recovered).  A tag-soup tree builder is out of scope for this
    tier; well-formed tables — the overwhelming crawl case —
    extract exactly.
    """
    segs = F.split(col, close_re)
    body_segs = F.slice(segs, F.lit(1), F.greatest(F.size(segs) - 1, F.lit(0)))
    parts = F.transform(body_segs, lambda s: F.split(s, open_prefix_re))
    bodies = F.transform(
        parts,
        lambda p: F.when(
            F.size(p) > 1,
            # the last part starts mid-attribute-list: content begins
            # after the opener's '>' (absent '>' = malformed opener =
            # no match, like the regex)
            F.when(
                F.instr(F.element_at(p, -1), ">") > 0,
                F.substr(
                    F.element_at(p, -1),
                    F.instr(F.element_at(p, -1), ">") + 1,
                ),
            ),
        ),
    )
    return F.filter(bodies, lambda b: b.isNotNull())


def html_tables(
    df: DataFrame, html_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Explode ``<table>`` markup into structured rows, Catalyst-only.

    Output: ``(id, table_idx, row_idx, n_cells, cells array<string>)``
    — one row per ``<tr>``, cells covering both ``<td>`` and ``<th>``
    with tags stripped and entities decoded.  Tables are the densest
    structured data a crawl page carries (statistics, specs, listings)
    and most pipelines either linearize them badly or drop them; this
    keeps them queryable.  Everything is split/``transform`` expression
    work inside whole-stage codegen (see :func:`_between_tags` for why
    splits, not lazy regexes) — at 100 TB this stays map-side scan
    work like the rest of the module, no Python, no shuffle until the
    caller aggregates.
    """
    t = df.select(*_table_explode_cols(html_col, id_col))
    rows = t.select(*_row_explode_cols(id_col))
    return rows.select(*_cell_cols(id_col))


# name-keyed memoized builders: the nested explode/clean trees are
# hundreds of py4j calls, reused across query builds (guide §7.3)
@memo_columns
def _table_explode_cols(html_col: str, id_col: str) -> tuple:
    tables = _between_tags(
        F.col(html_col), "(?i)<table(?=[\\s/>])", "(?is)</table\\s*>"
    )
    return (
        F.col(id_col),
        F.posexplode(tables).alias("table_idx", "__tbody"),
    )


@memo_columns
def _row_explode_cols(id_col: str) -> tuple:
    return (
        F.col(id_col),
        F.col("table_idx"),
        F.posexplode(
            _between_tags(
                F.col("__tbody"), "(?i)<tr(?=[\\s/>])", "(?is)</tr\\s*>"
            )
        ).alias("row_idx", "__row"),
    )


@memo_columns
def _cell_cols(id_col: str) -> tuple:
    cells_raw = _between_tags(
        F.col("__row"), "(?i)<t[dh](?=[\\s/>])", "(?is)</t[dh]\\s*>"
    )
    cells = F.transform(cells_raw, _clean_cell)
    return (
        F.col(id_col),
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.size(cells).cast("long").alias("n_cells"),
        cells.alias("cells"),
    )


def with_html_columns(
    df: DataFrame, html_col: str, prefix: str = "html_"
) -> DataFrame:
    """Attach extraction columns: ``{prefix}title``, ``{prefix}text``,
    ``{prefix}n_links``, ``{prefix}n_tags``, ``{prefix}text_len``,
    ``{prefix}link_density`` (links per kilobyte of visible text — the
    classic boilerplate signal)."""
    c = F.col(html_col)
    text = html_visible_text(c)
    # count on the lowercased column: `<A HREF=...>` is ordinary legacy
    # markup and must not read as zero link density
    n_links = _count_occurrences(F.lower(c), "<a ")
    return (
        df.withColumn(prefix + "title", html_title(c))
        .withColumn(prefix + "text", text)
        .withColumn(prefix + "n_links", n_links)
        .withColumn(prefix + "n_tags", _count_occurrences(c, "<"))
        .withColumn(prefix + "text_len", F.length(text).cast("long"))
        .withColumn(
            prefix + "link_density",
            (n_links * F.lit(1000.0))
            / F.greatest(F.length(text).cast("double"), F.lit(1.0)),
        )
    )


def _tag_bodies(col: Column, tag: str) -> Column:
    """Array of each ``<tag ...`` open tag's attribute text (up to its
    ``>``) — LINEAR: split on the zero-width-bounded opener, bound each
    segment at its first ``>`` via instr+substr (no ``[^>]*`` scans
    over unbounded input; an unterminated opener contributes NULL)."""
    segs = F.split(col, f"(?i)<{tag}(?=[\\s/>])")
    after = F.slice(segs, F.lit(2), F.greatest(F.size(segs) - 1, F.lit(0)))
    return F.filter(
        F.transform(
            after,
            lambda s: F.when(
                F.instr(s, ">") > 0, F.substr(s, F.lit(1), F.instr(s, ">") - 1)
            ),
        ),
        lambda t: t.isNotNull(),
    )


def _attr_of(tag_body: Column, attr: str) -> Column:
    """An attribute's quoted value from ONE bounded tag-body string."""
    return F.regexp_extract(
        tag_body, f"(?i)\\b{attr}\\s*=\\s*[\"']([^\"']*)", 1
    )


def _meta_content(metas: Column, key_attr: str, key: str) -> Column:
    """``content`` of the first ``<meta {key_attr}="{key}" ...>``
    (attribute order free; empty string when absent)."""
    hit = F.filter(
        metas,
        lambda t: t.rlike(f"(?i)\\b{key_attr}\\s*=\\s*[\"']{key}[\"']"),
    )
    return F.coalesce(
        _attr_of(F.try_element_at(hit, F.lit(1)), "content"), F.lit("")
    )


def html_page_meta(df: DataFrame, html_col: str, id_col: str = "doc_id"):
    """Page-level curation metadata — one Catalyst projection, zero
    Python: OpenGraph title/image/description, the meta description,
    robots directives, the canonical link, the root ``lang`` attribute,
    and the ``@type`` of the first JSON-LD block (recognized by its
    ``@context`` key inside a ``<script>`` span; the type attribute is
    not re-associated — documented approximation).  These are the
    fields a web-corpus pipeline filters and joins on (dedup by
    canonical URL, robots=noindex drops, language routing) before any
    text processing.

    All extraction passes are linear on hostile markup: open tags are
    isolated by split-on-opener + bound-at-first-``>`` (see
    :func:`_tag_bodies`), attribute regexes run on those bounded
    strings only, and JSON-LD spans reuse the split-by-closer pass.
    """
    return df.select(*_page_meta_cols(html_col, id_col))


@memo_columns
def _page_meta_cols(html_col: str, id_col: str) -> tuple:
    c = F.col(html_col)
    metas = _tag_bodies(c, "meta")
    links = _tag_bodies(c, "link")
    canonical = F.filter(
        links, lambda t: t.rlike("(?i)\\brel\\s*=\\s*[\"']canonical[\"']")
    )
    html_root = F.try_element_at(_tag_bodies(c, "html"), F.lit(1))
    scripts = _between_tags(
        c, "(?i)<script(?=[\\s/>])", "(?is)</script\\s*>"
    )
    ld = F.try_element_at(
        F.filter(
            scripts,
            lambda s: s.contains("@context")
            & (F.regexp_extract(s, "(?i)\"@type\"\\s*:\\s*\"([^\"]*)\"", 1)
               != ""),
        ),
        F.lit(1),
    )
    return (
        F.col(id_col),
        _meta_content(metas, "property", "og:title").alias("og_title"),
        _meta_content(metas, "property", "og:image").alias("og_image"),
        _meta_content(metas, "property", "og:description").alias(
            "og_description"
        ),
        _meta_content(metas, "name", "description").alias(
            "meta_description"
        ),
        _meta_content(metas, "name", "robots").alias("robots"),
        F.coalesce(
            _attr_of(F.try_element_at(canonical, F.lit(1)), "href"),
            F.lit(""),
        ).alias("canonical_url"),
        F.coalesce(_attr_of(html_root, "lang"), F.lit("")).alias("lang"),
        F.coalesce(
            F.regexp_extract(
                ld, "(?i)\"@type\"\\s*:\\s*\"([^\"]*)\"", 1
            ),
            F.lit(""),
        ).alias("jsonld_type"),
        F.size(metas).cast("long").alias("n_meta_tags"),
    )
