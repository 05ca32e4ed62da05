"""Read-side query surface tests over the driver testdata (sf0.001)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.queries import surface as Q

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_search_whole_word_and_of_ors(spark, docs):
    out = Q.search(
        docs, ["spark", "data"], ["text"], min_content_len=100,
        content_col="text", order_col="n_chars", limit=10, tiebreak="doc_id",
    ).collect()
    assert 0 < len(out) <= 10
    for r in out:
        t = r["text"].lower()
        assert " spark " in f" {t} " or t.startswith("spark") or t.endswith("spark")
        assert len(r["text"]) >= 100
    # ordered by n_chars desc
    lens = [r["n_chars"] for r in out]
    assert lens == sorted(lens, reverse=True)


def test_search_count_matches_filter(spark, docs):
    n = Q.search_count(docs, ["spark"], ["text"], 100, "text").first()["total"]
    manual = docs.filter(F.col("text").rlike(r"(?i)\bspark\b")).filter(
        F.length("text") >= 100
    ).count()
    assert n == manual


def test_paginate_disjoint_pages(spark, orders):
    p1 = Q.paginate(orders, "o_orderdate", 0, 10, "o_orderkey").collect()
    p2 = Q.paginate(orders, "o_orderdate", 10, 10, "o_orderkey").collect()
    k1 = {r["o_orderkey"] for r in p1}
    k2 = {r["o_orderkey"] for r in p2}
    assert len(k1) == 10 and len(k2) == 10 and not (k1 & k2)


def test_stats_and_conditional_counts(spark, docs, orders):
    s = Q.stats_by_source(docs, "source").collect()
    assert sum(r["n"] for r in s) == docs.count()
    c = Q.recent_and_content_counts(
        orders, "o_orderdate", dt.datetime(1998, 1, 1), "o_orderstatus"
    ).first()
    assert c["total"] == orders.count()
    assert 0 < c["recent"] < c["total"]


def test_headline_groups_shape(spark, docs):
    g = Q.headline_groups(docs, "lang", "text", min_title_len=50, max_groups=3).collect()
    assert len(g) == 3
    assert all(r["n_titles"] == len(r["titles"]) for r in g)


def test_cleanup_and_backfill(spark, orders):
    cutoff = dt.datetime(1998, 1, 1)
    kept = Q.cleanup_old(orders, "o_orderdate", cutoff)
    assert kept.filter(F.col("o_orderdate") < F.lit(cutoff)).count() == 0

    df = orders.sparkSession.createDataFrame(
        [("https://www.X.com/a", None), ("https://b.org/c", "have.com")],
        "url string, domain string",
    )
    out = {r["url"]: r["domain"] for r in Q.backfill_domain(df, "url", "domain").collect()}
    assert out["https://www.X.com/a"] == "x.com"
    assert out["https://b.org/c"] == "have.com"


def test_source_selection_fallback():
    assert Q.source_selection(["a", "zz"], ["a", "b"]) == ["a"]
    assert Q.source_selection(["zz"], ["a", "b"]) == ["a", "b"]
