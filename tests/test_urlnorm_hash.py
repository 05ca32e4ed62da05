"""Spark-vs-Python parity for canonicalization and xxhash64."""

from pyspark.sql import functions as F

from newscrawler_spark.urlnorm import (
    canonical_host_col,
    canonical_host_py,
    canonicalize_col,
    canonicalize_py,
)
from newscrawler_spark.xxh64 import xxh64_long, xxh64_str

URLS = [
    "https://example.com/a/1",
    "HTTPS://WWW.Example.com:443/a/1/",
    "http://news.site.org:8080/path/x?b=2&a=1&utm_source=feed#frag",
    "https://host.io/",
    "https://host.io",
    "https://sub.www-like.net/a?utm_campaign=x&UTM_medium=y&z=1",
    "http://a.b.c:80/q?x=1&x=0",
    "https://host0001.example1.com/a/42?utm_source=feed&utm_medium=rss",
    "https://host0001.example1.com/a/42#section-1",
]


def test_canonicalize_spark_equals_python(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    rows = df.select(
        "url",
        canonicalize_col(F.col("url")).alias("c"),
        canonical_host_col(F.col("url")).alias("h"),
    ).collect()
    for r in rows:
        assert r["c"] == canonicalize_py(r["url"]), r["url"]
        assert r["h"] == canonical_host_py(r["url"]), r["url"]


def test_dirty_variants_collapse():
    base = "https://host0001.example1.com/a/42"
    variants = [
        base,
        base + "/",
        base + "?utm_source=feed&utm_medium=rss",
        base + "#section-1",
        "HTTPS://WWW.host0001.example1.com:443/a/42",
    ]
    assert len({canonicalize_py(v) for v in variants}) == 1


def test_xxh64_matches_spark_strings(spark):
    vals = ["", "a", "hello world", "https://example.com/a/1", "x" * 100, "ünïcødé ⚡"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64_str(r["s"]) == r["h"], repr(r["s"])


def test_xxh64_matches_spark_longs(spark):
    vals = [0, 1, -1, 42, 2**62, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).select(
        "v", F.xxhash64("v").alias("h")
    )
    for r in df.collect():
        assert xxh64_long(r["v"]) == r["h"], r["v"]
