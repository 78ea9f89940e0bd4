"""URL canonicalization for web-crawl curation.

A crawl-scale corpus keys on URLs: exact-URL dedup, per-domain quotas,
and blocklists all require a *canonical* form first (the same page
arrives as ``HTTP://WWW.Ex.com:80/a/?utm_source=x&b=1#frag`` and
``http://ex.com/a?b=1``).  This module provides the canonicalizer as
pure Catalyst column expressions — no UDFs, so the whole pipeline stays
inside whole-stage codegen and runs as a map over the scan (zero
shuffles; the natural first stage of a 100 TB crawl ingest).

Rules applied (the common-denominator of crawler canonicalizers):

1. scheme and host lowercased;
2. leading ``www.`` stripped from the host;
3. default ports dropped (``:80`` for http, ``:443`` for https);
   non-default ports kept;
4. fragment dropped;
5. tracking query params removed (``utm_*``, ``fbclid``, ``gclid``),
   remaining params sorted bytewise for order-independence;
6. trailing slash stripped from non-root paths; empty path → ``/``.

``registered_domain`` uses a last-N-label heuristic with a small
two-label public-suffix list — a stand-in for the full PSL, which is a
data file, not an algorithm (swap ``TWO_LABEL_SUFFIXES`` for the real
list in production).

Everything here is paired 1:1 with DuckDB SQL in
``plans/catalog_batch22.py`` for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking params dropped during canonicalization (regex on the key).
TRACKING_KEY_RX = "^(utm_[a-z]+|fbclid|gclid)$"

# Two-label public suffixes recognized by the registered-domain
# heuristic (PSL stand-in; extend with the real list in production).
TWO_LABEL_SUFFIXES = ["co.uk", "com.au", "co.jp"]

_AUTH_RX = r"^[a-zA-Z]+://([^/?#]*)"
_SCHEME_RX = r"^([a-zA-Z]+)://"
_PATH_RX = r"^[a-zA-Z]+://[^/?#]*([^?#]*)"
_QUERY_RX = r"\?([^#]*)"


def scheme(url: Column) -> Column:
    """Lowercased scheme."""
    return F.lower(F.regexp_extract(url, _SCHEME_RX, 1))


def host(url: Column) -> Column:
    """Lowercased host with any ``www.`` prefix and port stripped."""
    auth = F.lower(F.regexp_extract(url, _AUTH_RX, 1))
    no_port = F.regexp_replace(auth, r":\d+$", "")
    return F.regexp_replace(no_port, r"^www\.", "")


def port(url: Column) -> Column:
    """Explicit port as a string, '' when absent."""
    auth = F.regexp_extract(url, _AUTH_RX, 1)
    return F.regexp_extract(auth, r":(\d+)$", 1)


def norm_path(url: Column) -> Column:
    """Path with ALL trailing slashes stripped (so the canonical form
    is a fixed point: '/a//' and '/a/' key identically); empty → '/'."""
    p = F.regexp_extract(url, _PATH_RX, 1)
    stripped = F.regexp_replace(p, "/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def clean_params(url: Column) -> Column:
    """Sorted array of non-tracking ``k=v`` query params.  The fragment
    is cut FIRST — a '?' inside a fragment ('/a#f?z=1') is fragment
    content, not a query."""
    q = F.regexp_extract(F.regexp_replace(url, "#.*", ""), _QUERY_RX, 1)
    parts = F.filter(F.split(q, "&"), lambda kv: kv != "")
    kept = F.filter(
        parts,
        lambda kv: ~F.split(kv, "=")[0].rlike(TRACKING_KEY_RX),
    )
    return F.array_sort(kept)


def registered_domain(host_col: Column) -> Column:
    """Last-2-label domain, or last-3 when the host ends with a known
    two-label public suffix (``co.uk`` etc.)."""
    labels = F.split(host_col, r"\.")
    n = F.size(labels)
    is_two = F.lit(False)
    for suf in TWO_LABEL_SUFFIXES:
        is_two = is_two | host_col.endswith("." + suf)
    take = F.when(is_two & (n >= 3), F.lit(3)).otherwise(F.lit(2))
    take = F.least(take, n)  # 0/1-label hosts: keep the host whole
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


def with_canonical(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``scheme/host/port/path/params/canonical_url/
    registered_domain`` columns derived from ``url_col``.

    Pure projection: no shuffle, stays in whole-stage codegen, safe as
    the first map stage over a crawl scan.
    """
    url = F.col(url_col)
    df = (
        df.withColumn("scheme", scheme(url))
        .withColumn("host", host(url))
        .withColumn("port", port(url))
        .withColumn("path", norm_path(url))
        .withColumn("params", clean_params(url))
    )
    keep_port = F.when(
        (F.col("port") == "")
        | ((F.col("scheme") == "http") & (F.col("port") == "80"))
        | ((F.col("scheme") == "https") & (F.col("port") == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), F.col("port")))
    qs = F.when(
        F.size("params") > 0,
        F.concat(F.lit("?"), F.array_join("params", "&")),
    ).otherwise(F.lit(""))
    df = df.withColumn(
        "canonical_url",
        # malformed input (no scheme/authority) canonicalizes to NULL —
        # a crawl pipeline filters these, it must not invent keys
        F.when(
            (F.col("scheme") == "") | (F.col("host") == ""),
            F.lit(None).cast("string"),
        ).otherwise(
            F.concat(
                F.col("scheme"), F.lit("://"), F.col("host"), keep_port,
                F.col("path"), qs,
            )
        ),
    )
    return df.withColumn(
        "registered_domain", registered_domain(F.col("host"))
    )
