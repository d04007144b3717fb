"""Web-corpus operators: URL canonicalization, URL-keyed dedup, and
per-domain corpus stats.

Web-crawl training pipelines dedup by URL *before* content dedup
(the same page is fetched many times under trivially-different URLs)
and aggregate per registered domain for mixing / blocklisting.  All
expressions are native Catalyst (regexp/array ops) — scan-local,
zero Python, engine-portable (mirrored 1:1 by the DuckDB oracle).

Canonical form (RFC 3986-style normalization + crawl conventions):
- fragment dropped;
- scheme and host lowercased;
- leading ``www.`` and default ports ``:80``/``:443`` stripped;
- trailing slashes stripped from the path (empty path → ``/``;
  path CASE IS PRESERVED — paths are case-sensitive);
- tracking query params removed (utm_*, fbclid, gclid, msclkid,
  igshid, mc_eid, ref) and the remainder sorted byte-wise.

Scale: canonicalization is a pure projection (no shuffle);
``url_dedup`` is ONE map-side-combined aggregation keyed on the
canonical URL; ``domain_stats`` one aggregation keyed on the
registered domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "url_host",
    "registered_domain",
    "url_dedup",
    "domain_stats",
]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_eid|ref)="

# second-level public suffixes where the registered domain needs THREE
# labels (gov.uk etc.) — the common short list, not the full PSL
_SECOND_LEVEL = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.kr", "com.br", "com.mx", "co.in",
    "com.cn", "com.tw", "co.za", "com.sg",
)


def _no_fragment(url: Column) -> Column:
    return F.regexp_replace(url, "#.*$", "")


def url_host(url: Column) -> Column:
    """Lowercased host with ``www.`` prefix and default port stripped."""
    hostport = F.lower(F.regexp_extract(_no_fragment(url), _HOST_RE, 1))
    return F.regexp_replace(F.regexp_replace(hostport, ":(80|443)$", ""), "^www\\.", "")


def canonical_url(url: Column) -> Column:
    nf = _no_fragment(url)
    scheme = F.lower(F.regexp_extract(nf, _SCHEME_RE, 1))
    host = url_host(url)
    path_raw = F.regexp_extract(nf, _PATH_RE, 1)
    path_stripped = F.regexp_replace(path_raw, "/+$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    qs = F.regexp_extract(nf, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != F.lit("")) & (~p.rlike(_TRACKING_RE)),
        )
    )
    tail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, tail)


def registered_domain(url: Column) -> Column:
    """Registered (pay-level) domain of the host: last two labels, or
    three when the two-label suffix is a common second-level public
    suffix (co.uk, com.au, ...)."""
    host = url_host(url)
    parts = F.split(host, "\\.")
    two = F.concat_ws(".", F.slice(parts, -2, 2))
    three = F.concat_ws(".", F.slice(parts, -3, 3))
    return F.when(
        two.isin(*_SECOND_LEVEL) & (F.size(parts) >= 3), three
    ).otherwise(two)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: the kept (minimum) id and the
    duplicate count — first-occurrence-wins URL dedup as one
    map-side-combined aggregation."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Docs and distinct canonical URLs per registered domain — the
    input to domain-level mixing weights and blocklist review."""
    return (
        df.select(
            F.col(id_col),
            registered_domain(F.col(url_col)).alias("domain"),
            canonical_url(F.col(url_col)).alias("canon_url"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canon_url").alias("n_urls"),
        )
    )
