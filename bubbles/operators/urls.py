"""URL canonicalization — the crawl-dedup step that runs BEFORE any
content fetch or text dedup: the same page reached via tracking
parameters, fragments, case-varied hosts or default ports must
collapse to one canonical key, or the crawler refetches it and the
corpus double-counts it.

``canonicalize_urls`` normalizes ``scheme://authority/path?query#frag``
URLs entirely with JVM-side column expressions (RE2-portable regexes —
no lookahead/backreferences — so the DuckDB twin applies the identical
grammar):

- scheme and host lowercase (RFC 3986 §6.2.2.1 case normalization);
- default ports dropped (``:80`` for http, ``:443`` for https),
  other ports kept;
- fragment dropped (never sent to the server);
- tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``) and the remaining query parameters SORTED
  (param order is almost never semantic; sorting collapses
  permutations) — dropped entirely when none survive;
- empty path becomes ``/``.

Zero shuffles: pure projection at scan speed — the canonical key then
feeds whatever dedup the pipeline runs next (exact_dedup on the key,
or a per-host rollup). Non-URL rows (no ``scheme://`` prefix) pass
through with ``canonical_url = NULL`` so callers can quarantine them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def canonical_url_expr(url):
    """Column expression: the canonical form of ``url`` (see module
    docstring), or NULL when the value does not look like a URL."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    return F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            F.when(path == "", F.lit("/")).otherwise(path),
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        )
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canonical_url`` and ``host`` columns (NULL for non-URL
    rows). Pure projection — zero shuffles at any scale."""
    url = F.col(url_col)
    canon = canonical_url_expr(url)
    host = F.when(
        canon.isNotNull(),
        F.lower(
            F.regexp_extract(
                F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
                r"^([^:]*)",
                1,
            )
        ),
    )
    return df.withColumn("canonical_url", canon).withColumn("host", host)
