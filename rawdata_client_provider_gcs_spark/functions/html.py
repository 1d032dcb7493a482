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

#: entities decoded after tag stripping — the half-dozen that dominate
#: real crawl text; numeric references are left as-is (rare, and
#: decoding them portably would push the tier out of codegen).
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must come LAST so "&amp;lt;" decodes to "&lt;"
]


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring, via the length trick (stays
    in codegen; no regex engine involved)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


#: subtree-dropping pattern: one alternation PER TAG (not independent
#: open/close alternations — `<script>` must not be "closed" by a
#: `</title>` inside a string literal, which would leak script code
#: into visible text).  Deliberately backreference-free so the DuckDB
#: oracles can state the identical RE2-compatible pattern.
_SUBTREE_RE = "(?is)" + "|".join(
    f"<{t}[^>]*>.*?</{t}\\s*>" for t in ("script", "style", "title")
)


def html_title(col: Column) -> Column:
    """Contents of the first ``<title>`` element (empty when absent;
    case-insensitive — legacy crawl HTML shouts ``<TITLE>``)."""
    return F.regexp_extract(col, "(?is)<title[^>]*>([^<]*)</title>", 1)


def html_visible_text(col: Column) -> Column:
    """Visible text: drop script/style/title subtrees (title is head
    metadata, not body text), strip tags, decode common entities,
    collapse whitespace."""
    no_sub = F.regexp_replace(col, _SUBTREE_RE, " ")
    no_tags = F.regexp_replace(no_sub, "<[^>]+>", " ")
    decoded = no_tags
    for ent, ch in _ENTITIES:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(decoded, "\\s+", " "))


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
