"""URL canonicalization — Spark column expressions + an identical Python twin.

Canonical form (deterministic; mirrors the reference's normalization
behavior — lowercase host + ``www.`` strip at
/root/reference/utils/url_utils.py:26-29, relative→absolute fixups at
/root/reference/services/apis/google_news_crawler.py:118-135,213 — extended
with the usual crawl-frontier rules so dirty variants of one URL collapse
to one frontier entry):

1. scheme lowercased
2. host lowercased, leading ``www.`` stripped, default ports ``:80``/``:443``
   stripped
3. path: trailing slashes stripped (``/a/`` == ``/a``; root collapses to "")
4. query: ``utm_*`` params dropped (case-insensitive), remaining params
   sorted lexicographically
5. fragment dropped

The Spark side is pure built-ins (parse_url + regexp/array functions) so it
stays inside whole-stage codegen; the Python twin is used by the sequential
oracle and must produce byte-identical strings.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_py(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    port = parts.port
    netloc = host if port in (None, 80, 443) else f"{host}:{port}"
    path = parts.path.rstrip("/")
    params = [p for p in parts.query.split("&") if p and not p.lower().startswith("utm_")]
    query = "&".join(sorted(params))
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


def canonical_host_py(url: str) -> str:
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower()
    return host[4:] if host.startswith("www.") else host


def canonical_host_col(url: Column) -> Column:
    """Lowercased, www-stripped, port-stripped host — all built-ins."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":\d+$", "")


def canonicalize_col(url: Column) -> Column:
    """Spark-native canonicalization; byte-identical to canonicalize_py."""
    url = F.trim(url)
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    raw_host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(raw_host, r"^www\.", "")
    # parse_url(HOST) may or may not carry the port depending on URL shape;
    # normalize by re-extracting it from the authority when non-default.
    authority = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    netloc = F.when(
        (port == "") | port.isin("80", "443"), host
    ).otherwise(F.concat(host, F.lit(":"), port))
    path = F.regexp_replace(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", "")
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~F.lower(p).startswith("utm_"),
    )
    sorted_query = F.array_join(F.array_sort(params), "&")
    base = F.concat(scheme, F.lit("://"), netloc, path)
    return F.when(sorted_query == "", base).otherwise(
        F.concat(base, F.lit("?"), sorted_query)
    )


def with_url_identity(df, url_col: str = "url", bucket_count: int = 128):
    """Append canonical_url, host, url_hash, host_hash, bucket columns.

    ``bucket = pmod(host_hash, B)`` is the partitioning key for every crawl
    table (frontier/seen/store/host_state): all joins between them are
    bucket-co-located, and B is sized ≥ 4×max-cores so an N→4N rescale
    still has ≥1 bucket per core (SURVEY.md §4).
    """
    c = canonicalize_col(F.col(url_col))
    df = df.withColumn("canonical_url", c)
    df = df.withColumn("host", canonical_host_col(F.col(url_col)))
    df = df.withColumn("url_hash", F.xxhash64(F.col("canonical_url")))
    df = df.withColumn("host_hash", F.xxhash64(F.col("host")))
    return df.withColumn("bucket", F.pmod(F.col("host_hash"), F.lit(bucket_count)).cast("int"))
