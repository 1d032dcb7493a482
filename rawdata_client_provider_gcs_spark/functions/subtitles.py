"""Subtitle parsing (SRT / WebVTT) — pure Catalyst expressions.

Subtitle files are the time-aligned dialogue layer of video corpora —
exactly the text a multimodal training pipeline pairs with sampled
frames — and both formats are line-structured text, so cue extraction
(index, start/end milliseconds, visible text) runs entirely in
``pyspark.sql.functions``: whole-stage codegen, zero Python, linear
passes (split on blank lines; per-cue regexes run on one bounded cue
block each).

Handled: SRT (``HH:MM:SS,mmm``) and WebVTT (``WEBVTT`` header,
``HH:MM:SS.mmm`` and the hourless ``MM:SS.mmm`` form, cue settings
after the arrow, optional cue identifiers, NOTE/STYLE blocks skipped
because a cue is recognized by its ``-->`` line), inline markup
(``<i>``, ``<c.class>``) stripped from the text.

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); media
handling belongs to this repo's derived multimodal tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import memo_columns

#: one cue timestamp: optional hours, minutes, seconds, millis —
#: SRT writes a comma, WebVTT a dot
_TS = "(?:(\\d{1,2}):)?(\\d{1,2}):(\\d{2})[.,](\\d{3})"
_ARROW = f"{_TS}\\s*-->\\s*{_TS}"


def _ts_ms(block: Column, group_base: int) -> Column:
    """Milliseconds from the arrow line's capture groups (1-4 start,
    5-8 end); absent hours read as 0."""

    def g(i: int) -> Column:
        raw = F.regexp_extract(block, _ARROW, group_base + i)
        return F.when(raw == "", F.lit(0)).otherwise(raw.cast("long"))

    return (
        g(0) * 3_600_000 + g(1) * 60_000 + g(2) * 1_000 + g(3)
    )


def subtitle_cues(
    df: DataFrame, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Explode a subtitle document into one row per cue:
    ``(id, cue_idx, start_ms, end_ms, cue_text)``.

    ``cue_idx`` is the 0-based position among RECOGNIZED cues (blocks
    carrying a ``-->`` line) — SRT's own numbering lines are cosmetic
    and frequently wrong in crawl data, so they are ignored.  Text is
    every line after the arrow line, tag-stripped, whitespace-
    collapsed.  Malformed blocks (no arrow) are skipped, not errors:
    a NOTE block and a corrupt cue are indistinguishable and neither
    is worth failing a document over.
    """
    exploded = df.select(*_cue_explode_cols(text_col, id_col))
    return exploded.select(*_cue_field_cols(id_col))


# name-keyed memoized builders (guide §7.3; tables.memo_columns)
@memo_columns
def _cue_explode_cols(text_col: str, id_col: str) -> tuple:
    c = F.regexp_replace(F.col(text_col), "\\r\\n?", "\n")
    blocks = F.filter(
        F.split(c, "\\n{2,}"), lambda b: b.rlike(_ARROW)
    )
    return (
        F.col(id_col), F.posexplode(blocks).alias("cue_idx", "__block")
    )


@memo_columns
def _cue_field_cols(id_col: str) -> tuple:
    b = F.col("__block")
    # text = everything after the arrow LINE: split once on the first
    # newline following the arrow match — linear (instr on the bounded
    # remainder), no multiline lazy regex
    after_arrow = F.element_at(
        F.split(b, _ARROW + "[^\\n]*\\n?", 2), 2
    )
    cue_text = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(after_arrow, F.lit("")), "<[^>]+>", " "
            ),
            "\\s+",
            " ",
        )
    )
    return (
        F.col(id_col),
        F.col("cue_idx").cast("long").alias("cue_idx"),
        _ts_ms(b, 1).alias("start_ms"),
        _ts_ms(b, 5).alias("end_ms"),
        cue_text.alias("cue_text"),
    )


def subtitle_stats(
    df: DataFrame, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document cue census: ``(id, n_cues, total_ms, n_chars)`` —
    the join key a pipeline uses to pair subtitle docs with their
    video rows before any per-cue work."""
    cues = subtitle_cues(df, text_col, id_col)
    return cues.groupBy(id_col).agg(
        F.count("*").alias("n_cues"),
        F.sum(F.col("end_ms") - F.col("start_ms")).alias("total_ms"),
        F.sum(F.length("cue_text")).alias("n_chars"),
    )
