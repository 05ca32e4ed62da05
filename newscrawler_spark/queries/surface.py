"""The reference's read-side query surface as plain DataFrame functions.

Each function mirrors one endpoint/script of the reference (file:line cited)
and is expressed entirely with Catalyst built-ins — filters and column
pruning reach the parquet scan, ordering+limit compiles to distributed
top-k, pagination uses offset+limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ilike_contains, keyword_predicate


def search(
    df: DataFrame,
    keywords: list[str],
    cols: list[str],
    min_content_len: int = 800,
    content_col: str = "content",
    order_col: str = "published_at",
    offset: int = 0,
    limit: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """GET /search (/root/reference/main.py:257-327): whole-word multi-
    keyword AND-of-ORs + min-length admission + order/offset/limit."""
    out = df.filter(keyword_predicate(keywords, cols)).filter(
        F.length(content_col) >= min_content_len
    )
    order = [F.desc(order_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    return out.orderBy(*order).offset(offset).limit(limit)


def search_count(
    df: DataFrame, keywords: list[str], cols: list[str], min_content_len: int = 800,
    content_col: str = "content",
) -> DataFrame:
    """Pagination-metadata count (main.py:323-327)."""
    return (
        df.filter(keyword_predicate(keywords, cols))
        .filter(F.length(content_col) >= min_content_len)
        .agg(F.count("*").alias("total"))
    )


def ilike_search(df: DataFrame, col: str, q: str) -> DataFrame:
    """db_manage.py:149-157 ILIKE '%q%' search."""
    return df.filter(ilike_contains(F.col(col), q))


def paginate(df: DataFrame, order_col: str, offset: int, limit: int, tiebreak: str) -> DataFrame:
    """order_by desc + offset + limit (main.py:296,476)."""
    return df.orderBy(F.desc(order_col), F.asc(tiebreak)).offset(offset).limit(limit)


def stats_by_source(df: DataFrame, source_col: str = "source_api") -> DataFrame:
    """scripts/db_manage.py:31-36 group-by-source counts."""
    return df.groupBy(source_col).agg(F.count("*").alias("n")).orderBy(source_col)


def recent_and_content_counts(
    df: DataFrame, ts_col: str, cutoff, content_col: str, min_len: int = 1
) -> DataFrame:
    """db_manage.py:38-51 conditional aggregates in one pass."""
    return df.agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col(ts_col) >= F.lit(cutoff), 1)).alias("recent"),
        F.count(
            F.when(
                F.col(content_col).isNotNull() & (F.length(content_col) >= min_len), 1
            )
        ).alias("with_content"),
    )


def headline_groups(
    df: DataFrame,
    cluster_col: str,
    title_col: str,
    min_title_len: int = 10,
    max_groups: int = 10,
) -> DataFrame:
    """google_news_crawler.py:388-440: per-cluster distinct titles,
    min-length filter, capped group count; plus the sum-of-sizes total
    (main.py:359)."""
    g = (
        df.filter(F.length(title_col) > min_title_len)
        .groupBy(cluster_col)
        .agg(
            F.array_sort(F.collect_set(title_col)).alias("titles"),
            F.countDistinct(title_col).alias("n_titles"),
        )
        .orderBy(F.desc("n_titles"), F.asc(cluster_col))
        .limit(max_groups)
    )
    return g


def cleanup_old(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """scripts/db_manage.py:62-90 predicate delete — returns survivors."""
    return df.filter(F.col(ts_col) >= F.lit(cutoff))


def backfill_domain(df: DataFrame, url_col: str, domain_col: str) -> DataFrame:
    """scripts/populate_domains.py:23-78: fill domain from url where null."""
    from ..functions.text import domain_of

    return df.withColumn(
        domain_col,
        F.coalesce(F.col(domain_col), domain_of(F.col(url_col))),
    )


def source_selection(requested: list[str], available: list[str]) -> list[str]:
    """news_service.py:42-48: requested ∩ available, fallback to all."""
    picked = [s for s in requested if s in available]
    return picked or list(available)
