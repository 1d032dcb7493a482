"""robots.txt evaluation — pure Catalyst expressions (RFC 9309).

A crawl-curation pipeline joins every fetched URL against its host's
robots.txt: group selection (the most specific user-agent group wins;
``*`` only when no named group matches), longest-match rule precedence
with allow-beats-disallow on ties, ``*`` wildcards and the ``$``
anchor, plus crawl-delay and sitemap extraction.  robots files are
small line-structured text, so the whole evaluation — including the
group state machine — runs as ``F.aggregate`` folds inside one
Catalyst projection: zero Python, and the URL table never shuffles
(the verdict is a map-side expression against a joined robots
column).

Documented approximation (the crawl-corpus trade): for
wildcard-plus-anchor patterns the final literal must sit at the
path's end AND after the in-order middles, but the end occurrence is
not re-verified to be reachable when a literal self-overlaps its own
suffix (``a*bb$`` vs a path ending ``...bbb``) — plain anchored
patterns (``/$``) are exact.  Rule specificity is pattern length and
user-agent groups are chosen by longest-prefix product-token match
(both Google semantics).

Reference behavioral parity: the reference transport stores opaque
named byte arrays per message (RawdataMessage.java:15-60); crawl
policy belongs to this repo's derived curation tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import memo_columns

_RULE = "struct<allow:boolean,path:string>"
_ACC = f"struct<active:boolean,building:boolean,rules:array<{_RULE}>>"


def _parsed_lines(col: Column) -> Column:
    """``array<struct<key,value>>``: trimmed, comment-stripped,
    lowercase keys; non-directive lines keep key '' (state no-ops)."""
    lines = F.split(F.regexp_replace(col, "\\r\\n?", "\n"), "\n")
    return F.transform(
        lines,
        lambda ln: F.struct(
            F.lower(
                F.trim(F.element_at(F.split(F.element_at(
                    F.split(ln, "#", 2), 1), ":", 2), 1))
            ).alias("key"),
            F.trim(
                F.coalesce(
                    F.try_element_at(
                        F.split(F.element_at(F.split(ln, "#", 2), 1),
                                ":", 2),
                        F.lit(2),
                    ),
                    F.lit(""),
                )
            ).alias("value"),
        ),
    )


def _chosen_token(parsed: Column, agent: str) -> Column:
    """RFC 9309 / Google group selection: the LONGEST user-agent token
    in the file that is a case-insensitive PREFIX of the crawler's
    product name ('googlebot' governs 'googlebot-news'); empty string
    when none matches (the ``*`` groups then apply)."""
    agent_lc = agent.lower()
    toks = F.transform(
        F.filter(parsed, lambda p: p["key"] == "user-agent"),
        lambda p: F.lower(p["value"]),
    )
    matching = F.filter(
        toks, lambda t: (t != "*") & F.lit(agent_lc).startswith(t)
    )
    return F.aggregate(
        matching,
        F.lit(""),
        lambda acc, t: F.when(F.length(t) > F.length(acc), t).otherwise(acc),
    )


def _group_rules(col: Column, agent: str) -> Column:
    """The chosen group's rules as ``array<struct<allow,path>>``.

    Group selection per :func:`_chosen_token`; when a named token
    governs, the ``*`` groups are ignored.  Consecutive user-agent
    lines share one group (``building`` tracks the run); any directive
    line ends the run.
    """
    parsed = _parsed_lines(col)
    chosen = _chosen_token(parsed, agent)
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("building"),
        F.array().cast(f"array<{_RULE}>").alias("rules"),
    )

    def step(acc, p):
        is_ua = p["key"] == "user-agent"
        matches = F.when(
            chosen != "", F.lower(p["value"]) == chosen
        ).otherwise(p["value"] == "*")
        active_ua = F.when(
            acc["building"], acc["active"] | matches
        ).otherwise(matches)
        is_rule = (
            p["key"].isin("allow", "disallow") & (p["value"] != "")
        )
        new_rules = F.when(
            is_rule & acc["active"],
            F.array_append(
                acc["rules"],
                F.struct(
                    (p["key"] == "allow").alias("allow"),
                    p["value"].alias("path"),
                ),
            ),
        ).otherwise(acc["rules"])
        directive = p["key"].isin(
            "allow", "disallow", "crawl-delay", "sitemap"
        )
        return F.when(
            is_ua,
            F.struct(
                active_ua.alias("active"),
                F.lit(True).alias("building"),
                acc["rules"].alias("rules"),
            ),
        ).otherwise(
            F.struct(
                acc["active"].alias("active"),
                (acc["building"] & ~directive).alias("building"),
                new_rules.alias("rules"),
            )
        )

    return F.aggregate(parsed, init, step)["rules"]


def _matches(path: Column, pattern: Column) -> Column:
    """One robots pattern against one path: prefix anchor, ``*``
    wildcards (in-order segment containment via position folds),
    ``$`` end anchor.  A no-wildcard anchored pattern is exact
    equality (``/$`` matches only ``/``); a wildcard-anchored pattern
    requires its final literal segment to sit at the path's END and
    AFTER the in-order middles (the residual approximation: the end
    occurrence is not re-verified to be the same one the fold could
    reach when literals self-overlap — see the module docstring)."""
    anchored = F.endswith(pattern, F.lit("$"))
    pat = F.when(anchored, F.substr(
        pattern, F.lit(1), F.length(pattern) - 1
    )).otherwise(pattern)
    parts = F.split(pat, "\\*", -1)
    n = F.size(parts)
    head = F.element_at(parts, 1)
    # when anchored, the LAST segment is handled by the end check, so
    # the in-order fold walks only the middles
    mids = F.slice(
        parts,
        F.lit(2),
        F.greatest(n - F.when(anchored, F.lit(2)).otherwise(F.lit(1)),
                   F.lit(0)),
    )
    start_ok = path.startswith(head)
    fold = F.aggregate(
        mids,
        F.struct(
            (F.length(head) + 1).cast("int").alias("pos"),
            F.lit(True).alias("ok"),
        ),
        lambda acc, part: F.struct(
            F.when(
                part == "", acc["pos"]
            ).otherwise(
                (F.position(part, path, acc["pos"]) + F.length(part))
                .cast("int")
            ).alias("pos"),
            (
                acc["ok"]
                & ((part == "") | (F.position(part, path, acc["pos"]) > 0))
            ).alias("ok"),
        ),
    )
    tail = F.element_at(parts, -1)
    end_pos = (F.length(path) - F.length(tail) + 1).cast("int")
    end_ok = F.when(~anchored, F.lit(True)).otherwise(
        F.when(n == 1, F.length(path) == F.length(head)).otherwise(
            path.endswith(tail) & (end_pos >= fold["pos"])
        )
    )
    return start_ok & fold["ok"] & end_ok


def robots_allowed(
    robots: Column, path: Column, agent: str = "*"
) -> Column:
    """True when ``path`` may be fetched under ``robots`` for
    ``agent``: longest matching rule wins, allow beats disallow on
    equal length, no matching rule allows."""
    rules = _group_rules(robots, agent)
    matching = F.filter(rules, lambda r: _matches(path, r["path"]))
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).cast("int").alias("len"),
            F.lit(True).alias("allow"),
        ),
        lambda acc, r: F.when(
            F.length(r["path"]).cast("int") > acc["len"],
            F.struct(
                F.length(r["path"]).cast("int").alias("len"),
                r["allow"].alias("allow"),
            ),
        )
        .when(
            (F.length(r["path"]).cast("int") == acc["len"]) & r["allow"],
            F.struct(acc["len"].alias("len"), F.lit(True).alias("allow")),
        )
        .otherwise(acc),
    )
    return best["allow"]


def robots_crawl_delay(robots: Column, agent: str = "*") -> Column:
    """The chosen group's crawl-delay seconds (NULL when absent)."""
    parsed = _parsed_lines(robots)
    chosen = _chosen_token(parsed, agent)
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("building"),
        F.lit(None).cast("double").alias("delay"),
    )

    def step(acc, p):
        is_ua = p["key"] == "user-agent"
        matches = F.when(
            chosen != "", F.lower(p["value"]) == chosen
        ).otherwise(p["value"] == "*")
        active_ua = F.when(
            acc["building"], acc["active"] | matches
        ).otherwise(matches)
        new_delay = F.when(
            (p["key"] == "crawl-delay") & acc["active"]
            & acc["delay"].isNull(),
            p["value"].try_cast("double"),
        ).otherwise(acc["delay"])
        directive = p["key"].isin(
            "allow", "disallow", "crawl-delay", "sitemap"
        )
        return F.when(
            is_ua,
            F.struct(
                active_ua.alias("active"),
                F.lit(True).alias("building"),
                acc["delay"].alias("delay"),
            ),
        ).otherwise(
            F.struct(
                acc["active"].alias("active"),
                (acc["building"] & ~directive).alias("building"),
                new_delay.alias("delay"),
            )
        )

    return F.aggregate(parsed, init, step)["delay"]


def robots_sitemaps(robots: Column) -> Column:
    """All ``Sitemap:`` URLs (group-independent per RFC 9309)."""
    parsed = _parsed_lines(robots)
    return F.transform(
        F.filter(parsed, lambda p: p["key"] == "sitemap"),
        lambda p: p["value"],
    )


@memo_columns
def robots_sitemaps_of(robots_col: str) -> Column:
    """:func:`robots_sitemaps` over a NAMED column, expression tree
    memoized per process (guide §7.3; see ``tables.memo_columns``)."""
    return robots_sitemaps(F.col(robots_col))


# the verdict + delay trees are ~300 py4j calls each; name-keyed and
# reused across query builds (guide §7.3)
@memo_columns
def _verdict_cols(
    robots_col: str, path_col: str, agent: str
) -> tuple:
    return (
        robots_allowed(F.col(robots_col), F.col(path_col), agent),
        robots_crawl_delay(F.col(robots_col), agent),
    )


def with_robots_verdict(
    df: DataFrame,
    robots_col: str,
    path_col: str,
    agent: str = "*",
    out_col: str = "robots_allowed",
    delay_col: str | None = None,
) -> DataFrame:
    """Attach the fetch verdict (plus crawl delay) for each
    ``(robots, path)`` row — the shape after joining a URL table to
    its per-host robots.txt column.  Map-side only: no shuffle.
    ``delay_col`` defaults to ``crawl_delay_s`` for the default
    verdict column and ``{out_col}_delay_s`` otherwise, so two
    agents' verdicts can sit side by side without clobbering."""
    if delay_col is None:
        delay_col = (
            "crawl_delay_s"
            if out_col == "robots_allowed"
            else f"{out_col}_delay_s"
        )
    allowed, delay = _verdict_cols(robots_col, path_col, agent)
    return df.withColumns({out_col: allowed, delay_col: delay})
