"""URL canonicalization for web-corpus pipelines — pure Catalyst
expressions (no UDF, stays in whole-stage codegen).

A crawl carries the same page under many URL spellings (scheme/host
case, default ports, fragments, tracking parameters, unsorted query
strings); URL-level exact dedup and per-domain accounting both need a
canonical form first.  Everything here is a Column expression:

- url_host:              lowercased host, port stripped
- url_registered_domain: heuristic eTLD+1 (documented approximation —
                         no public-suffix list is shipped)
- url_normalize:         canonical URL (case, default ports, fragment,
                         tracking params, sorted query, trailing slash)

Composition: ``exact_duplicates(df, text_col=...)`` on
``url_normalize`` for URL dedup; ``quota_per_stratum(df,
url_host(...), cap)`` (operators/sampling.py) for per-domain caps.

Scale notes (100 TB lens): map-side string expressions on short
values; the query-param sort uses array higher-order functions, which
Catalyst evaluates interpreted (outside codegen) — measured acceptable
here because a query string holds a handful of elements, unlike the
per-token arrays that forced the shingler into an Arrow kernel
(operators/dedup.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped by url_normalize: the public, widely
# documented click/campaign identifiers (Google/Facebook/Microsoft
# campaign tags and generic ref markers).
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "ref", "ref_src",
)

# Common second-level registry labels under a country-code TLD
# (co.uk, com.au, ac.jp, ...): when the label before the TLD is one of
# these AND the TLD is 2 letters, the registered domain keeps 3 labels.
_SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")


def _strip_scheme(col: Column) -> Column:
    return F.regexp_replace(col, r"(?i)^[a-z][a-z0-9+.-]*://", "")


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL (scheme optional), port and userinfo
    stripped.  Empty string when no host-like prefix exists."""
    c = F.col(col) if isinstance(col, str) else col
    rest = _strip_scheme(c)
    rest = F.regexp_replace(rest, r"^[^/?#@]*@", "")  # userinfo
    host = F.regexp_extract(rest, r"^([^/?#:]+)", 1)
    return F.lower(host)


def url_registered_domain(col: Column | str) -> Column:
    """Heuristic eTLD+1: the last two host labels, or the last three
    when the middle one is a common registry label under a 2-letter
    ccTLD (co.uk, com.au, ac.jp...).  An approximation — the real rule
    needs the Mozilla public-suffix list, which is not shipped; the
    heuristic covers the overwhelmingly common cases and degrades to
    "one extra level kept", never to cross-domain merging of unrelated
    sites under generic TLDs."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last = F.element_at(parts, -1)
    second = F.element_at(parts, -2)
    third_needed = (
        (n >= 3)
        & (F.length(last) == 2)
        & second.isin(*_SECOND_LEVEL)
    )
    two = F.concat_ws(".", F.element_at(parts, -2), last)
    three = F.concat_ws(".", F.element_at(parts, -3), second, last)
    return F.when(n <= 1, host).when(third_needed, three).otherwise(two)


def url_normalize(col: Column | str) -> Column:
    """Canonical URL: scheme+host lowercased, default port stripped
    (:80 for http, :443 for https), fragment dropped, tracking
    parameters removed, remaining query parameters SORTED, empty query
    dropped, trailing slash on a non-root path removed, missing path
    normalized to '/'."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, r"(?i)^([a-z][a-z0-9+.-]*)://", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = _strip_scheme(c)
    rest = F.regexp_replace(rest, r"^[^/?#@]*@", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    hostout = F.when(default_port, host).otherwise(F.concat(host, F.lit(":"), port))

    after_host = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(after_host, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)

    query = F.regexp_extract(after_host, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(*TRACKING_PARAMS),
    )
    sorted_q = F.concat_ws("&", F.array_sort(params))
    qpart = F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q))

    return F.concat(scheme, F.lit("://"), hostout, path, qpart)
