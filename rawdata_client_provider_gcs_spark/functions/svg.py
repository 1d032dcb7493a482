"""SVG metadata extraction — pure Catalyst expressions, zero Python.

SVG is the web's vector image format and ships as XML TEXT, so unlike
the binary raster tiers its curation metadata — intrinsic dimensions,
element census, embedded-raster and script presence, title and visible
text — extracts entirely with ``pyspark.sql.functions`` (whole-stage
codegen, no UDF).  Rasterization needs a renderer and stays the loud
per-row boundary in the multimodal tier (:mod:`..operators.multimodal`
raises :class:`~..operators.rawavi.UnsupportedCodecError` for
``image/svg+xml`` pixel decode).

Hostile-markup discipline follows :mod:`.html`: no lazy ``.*?`` across
tags and no ``<tag[^>]*>`` opener scans over unbounded input — the
root tag is isolated with one ``instr`` + bounded ``split``, element
counts use zero-width-bounded lookaheads, and text spans reuse the
linear split-by-closer passes from :mod:`.html`.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .html import _between_tags, html_title


def sniff_svg_expr(col: Column) -> Column:
    """True when the payload text looks like an SVG document (an
    ``<svg`` root, optionally after an XML prologue / DOCTYPE /
    comments) — a bounded prefix check, not a parse."""
    head = F.substr(col, F.lit(1), F.lit(1024))
    return F.instr(F.lower(head), "<svg") > 0


def _root_tag(col: Column) -> Column:
    """The ``<svg ...`` root open tag up to (not including) its ``>`` —
    linear: one case-folded ``instr`` locates the opener, one
    limit-2 ``split`` stops at the first ``>``.  A hostile document
    with no ``>`` degrades to one linear regex scan of the tail."""
    at = F.instr(F.lower(col), "<svg")
    after = F.when(at > 0, F.substr(col, at))
    return F.element_at(F.split(after, ">", 2), 1)


_NUM = "([0-9]+(?:\\.[0-9]+)?)"


def _root_attr_num(col: Column, attr: str) -> Column:
    """Numeric prefix of a root-tag attribute (``width="120px"`` →
    120.0); NULL when the attribute is absent or non-numeric."""
    raw = F.regexp_extract(
        _root_tag(col), f"(?i)\\s{attr}\\s*=\\s*[\"']?{_NUM}", 1
    )
    return F.when(raw != "", raw.cast("double"))


def svg_viewbox(col: Column) -> Column:
    """The four viewBox numbers as ``array<double>`` (empty when the
    attribute is absent or malformed)."""
    raw = F.regexp_extract(
        _root_tag(col), "(?i)\\sviewBox\\s*=\\s*[\"']([^\"']*)", 1
    )
    nums = F.filter(
        F.split(F.trim(raw), "[\\s,]+"),
        lambda s: s.rlike("^[0-9.+-]+$"),
    )
    return F.when(F.size(nums) == 4, F.transform(
        nums, lambda s: s.cast("double")
    )).otherwise(F.array().cast("array<double>"))


def svg_width(col: Column) -> Column:
    """Intrinsic width: the root ``width`` attribute's numeric prefix,
    else the viewBox width (CSS's replaced-element fallback), else
    NULL."""
    return F.coalesce(
        _root_attr_num(col, "width"), F.try_element_at(svg_viewbox(col), F.lit(3))
    )


def svg_height(col: Column) -> Column:
    """Intrinsic height (same fallback chain as :func:`svg_width`)."""
    return F.coalesce(
        _root_attr_num(col, "height"), F.try_element_at(svg_viewbox(col), F.lit(4))
    )


def count_elements(col: Column, tag: str) -> Column:
    """Occurrences of ``<tag``-as-an-element (zero-width-bounded: a
    ``<pathological>`` tag does not count as ``<path``)."""
    return F.regexp_count(col, F.lit(f"(?i)<{tag}(?=[\\s/>])"))


def svg_title(col: Column) -> Column:
    """Contents of the first ``<title>`` element — same grammar as an
    HTML title, so this IS :func:`.html.html_title`."""
    return html_title(col)


def svg_text_content(col: Column) -> Column:
    """Visible ``<text>`` contents, space-joined, inner tags (tspan)
    stripped, whitespace collapsed — the linear split-by-closer pass
    from :mod:`.html`."""
    spans = _between_tags(col, "(?i)<text(?=[\\s/>])", "(?is)</text\\s*>")
    joined = F.array_join(
        F.transform(
            spans, lambda s: F.regexp_replace(s, "<[^>]+>", " ")
        ),
        " ",
    )
    return F.trim(F.regexp_replace(joined, "\\s+", " "))


def svg_meta(df, text_col: str, id_col: str = "doc_id"):
    """Attach the SVG curation columns to ``df[text_col]`` — one
    Catalyst projection: dimensions (attribute-else-viewBox), element
    census (paths / embedded rasters / text / use), script presence
    (sanitization signal), title, and visible text."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        svg_width(c).alias("width"),
        svg_height(c).alias("height"),
        count_elements(c, "path").alias("n_paths"),
        count_elements(c, "image").alias("n_images"),
        count_elements(c, "text").alias("n_texts"),
        count_elements(c, "use").alias("n_uses"),
        (count_elements(c, "script") > 0).alias("has_script"),
        svg_title(c).alias("title"),
        svg_text_content(c).alias("text_content"),
    )
