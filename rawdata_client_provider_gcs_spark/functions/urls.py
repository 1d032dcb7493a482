"""URL parsing/normalization for crawl curation (pure built-ins).

Per-domain caps, host-level dedup, and source mixing all key on URL
structure — scheme, host, registered domain, path depth, query arity.
Like :mod:`html`, everything here is Catalyst expressions (regexp +
array functions), so the tier runs inside whole-stage codegen and the
extraction is engine-portable: the DuckDB oracles restate the exact
same patterns, which is why these columns can be value-checked.

``registered_domain`` uses the pragmatic two-level heuristic (last two
labels, or last three when the second-level label is a well-known
multi-part TLD like ``co``/``ac``/``gov``) — the right trade at crawl
scale where shipping the full public-suffix list is a join against a
broadcast table, kept out of scope here (the heuristic covers the
overwhelming bulk of hosts and is deterministic for the oracle).

Reference behavioral parity: the reference stores opaque payloads
(RawdataMessage.java:15-60); URL structure belongs to the derived
curation tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: second-level labels that commonly form two-part public suffixes
MULTIPART_SLDS = ("co", "ac", "gov", "edu", "org", "net", "com")

_SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
# skip optional user:pass@ userinfo so per-domain keys never group
# under a bogus "user" host; stop the host at port/path/query/fragment
_HOST_RE = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
# the '?' must come BEFORE any '#' — a '?' inside the fragment is not
# a query string
_QUERY_RE = "^[^#]*?\\?([^#]*)"


def url_scheme(col: Column) -> Column:
    return F.regexp_extract(F.lower(col), _SCHEME_RE, 1)


def url_host(col: Column) -> Column:
    return F.regexp_extract(F.lower(col), _HOST_RE, 1)


def url_path(col: Column) -> Column:
    return F.regexp_extract(F.lower(col), _PATH_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last-two-labels heuristic with the multi-part-TLD exception."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    sld = F.element_at(labels, -2)
    three = F.concat_ws(".", F.slice(labels, n - 2, 3))
    two = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    return F.when(
        (n >= 3) & sld.isin(*MULTIPART_SLDS), three
    ).otherwise(two)


def with_url_columns(
    df: DataFrame, url_col: str, prefix: str = "url_"
) -> DataFrame:
    """Attach ``{prefix}scheme``, ``{prefix}host``, ``{prefix}domain``,
    ``{prefix}path_depth`` (non-empty path segments) and
    ``{prefix}n_params`` (query-string ``&``-separated arity)."""
    c = F.col(url_col)
    host = url_host(c)
    path = url_path(c)
    query = F.regexp_extract(c, _QUERY_RE, 1)
    return (
        df.withColumn(prefix + "scheme", url_scheme(c))
        .withColumn(prefix + "host", host)
        .withColumn(prefix + "domain", registered_domain(host))
        .withColumn(
            prefix + "path_depth",
            F.size(F.filter(F.split(path, "/"), lambda s: s != "")).cast(
                "long"
            ),
        )
        .withColumn(
            prefix + "n_params",
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("long"),
        )
    )
