"""Bloom seen-prefilter: soundness (never drops a truly-new URL),
equivalence with the plain exact anti-join, and per-bucket sizing."""

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.engine import seenfilter as SF
from newscrawler_spark.engine.seenfilter import (
    BLOOM_DDL,
    DEFAULT_M_BITS,
    SeenBloom,
    _m_for,
    bloom_probe,
)
from newscrawler_spark.tablelib import Catalog

SEEN_DDL = "url_hash long, bucket int"


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "cat"))


def _mk(spark, cat):
    seen = cat.table("seen", SEEN_DDL)
    seen.append(
        spark.range(0, 5000).select(
            F.xxhash64("id").alias("url_hash"),
            F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("bucket"),
        )
    )
    bloom = SeenBloom(cat.table("seen_bloom", BLOOM_DDL, partitioned=False))
    bloom.rebuild_buckets(spark, seen, list(range(8)))
    return seen, bloom


def test_split_new_equals_exact_anti_join(spark, cat):
    seen, bloom = _mk(spark, cat)
    # candidates: half overlap seen (ids 0..99), half new (ids 10000..)
    cand = spark.range(0, 100).union(spark.range(10_000, 10_100)).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("bucket"),
    )
    via_bloom = {r["url_hash"] for r in bloom.split_new(spark, cand, seen).collect()}
    exact = {
        r["url_hash"]
        for r in cand.join(
            seen.read(spark).select("url_hash"), on="url_hash", how="left_anti"
        ).collect()
    }
    assert via_bloom == exact
    assert len(exact) == 100  # exactly the new half survives


def test_bloom_has_no_false_negatives(spark, cat):
    seen, bloom = _mk(spark, cat)
    blooms = bloom.table.read(spark).select("bucket", "words", "m")
    probed = (
        seen.read(spark)
        .join(blooms, on="bucket")
        .filter(~bloom_probe(F.col("words"), F.col("url_hash"), F.col("m")))
    )
    assert probed.count() == 0  # every seen hash is flagged maybe-seen


def test_bloom_filters_most_new_keys(spark, cat):
    """FP rate sanity: most definitely-new keys skip the exact join."""
    seen, bloom = _mk(spark, cat)
    fresh = spark.range(50_000, 60_000).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("bucket"),
    )
    blooms = bloom.table.read(spark).select("bucket", "words", "m")
    hits = (
        fresh.join(F.broadcast(blooms), on="bucket")
        .filter(bloom_probe(F.col("words"), F.col("url_hash"), F.col("m")))
        .count()
    )
    assert hits / 10_000 < 0.05  # sized m keeps fpp low


def test_bloom_sized_from_item_count_keeps_fpp_low_at_1m_keys(spark, cat):
    """VERDICT r01 perf #3: a bucket with 10^6 keys must get a larger bitmap
    (not the 2^17-bit floor, which would saturate) and keep fpp < 5%."""
    n = 1_000_000
    seen = cat.table("seen", SEEN_DDL)
    seen.append(
        spark.range(0, n).select(
            F.xxhash64("id").alias("url_hash"),
            F.lit(0).cast("int").alias("bucket"),
        )
    )
    bloom = SeenBloom(cat.table("seen_bloom", BLOOM_DDL, partitioned=False))
    bloom.rebuild_buckets(spark, seen, [0])
    row = bloom.table.read(spark).first()
    assert row["n_items"] == n
    # built with growth headroom: sized for BUILD_HEADROOM x current keys
    assert row["m"] == _m_for(SF.BUILD_HEADROOM * n) > _m_for(n) > DEFAULT_M_BITS
    fresh = spark.range(10 * n, 10 * n + 100_000).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    blooms = bloom.table.read(spark).select("bucket", "words", "m")
    fp = (
        fresh.join(F.broadcast(blooms), on="bucket")
        .filter(bloom_probe(F.col("words"), F.col("url_hash"), F.col("m")))
        .count()
    )
    assert fp / 100_000 < 0.05, f"fpp {fp / 100_000:.3f}"


def test_empty_bloom_falls_back_to_exact(spark, cat):
    seen = cat.table("seen", SEEN_DDL)
    seen.append(
        spark.range(0, 10).select(
            F.xxhash64("id").alias("url_hash"),
            F.lit(0).cast("int").alias("bucket"),
        )
    )
    bloom = SeenBloom(cat.table("seen_bloom", BLOOM_DDL, partitioned=False))
    cand = spark.range(5, 15).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    out = bloom.split_new(spark, cand, seen)
    assert out.count() == 5


def test_split_new_shuffle_path_equals_exact(spark, cat, monkeypatch):
    """Past the broadcast byte threshold split_new must shuffle the probe
    join on bucket and still return exactly the exact-anti-join answer
    (VERDICT r03 wrong #1). Threshold forced to 0 so the shuffle path runs
    at test scale; auto-broadcast disabled so the plan genuinely exercises
    the non-broadcast join."""
    monkeypatch.setattr(SF, "BROADCAST_BLOOM_BYTES", 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seen, bloom = _mk(spark, cat)
        cand = spark.range(0, 100).union(spark.range(10_000, 10_100)).select(
            F.xxhash64("id").alias("url_hash"),
            F.pmod(F.xxhash64("id"), F.lit(8)).cast("int").alias("bucket"),
        )
        out = bloom.split_new(spark, cand, seen)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        got = {r["url_hash"] for r in out.collect()}
        exact = {
            r["url_hash"]
            for r in cand.join(
                seen.read(spark).select("url_hash"), on="url_hash", how="left_anti"
            ).collect()
        }
        assert got == exact
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_sizing_guard_at_design_point():
    """10^10 seen URLs at the 128-bucket default saturates the m-cap
    (7.8e7 keys/bucket -> fpp ~0.75); required_bucket_count returns a
    power-of-two sizing at which every bucket's headroom-sized bitmap fits
    under MAX_M_BITS and worst-case fpp (bucket grown to its full 4x
    headroom, load k*n/m = ln2) stays well under 10%."""
    n_total = 10**10
    per_bucket_default = n_total // 128
    assert SF.check_bucket_sizing({0: per_bucket_default}) == [0]
    # the capped bitmap really is useless at that load
    assert SF.estimated_fpp(per_bucket_default, SF.MAX_M_BITS) > 0.5
    rb = SF.required_bucket_count(n_total)
    assert rb & (rb - 1) == 0 and rb >= 1024
    n_bucket = -(-n_total // rb)  # ceil
    assert SF.check_bucket_sizing({0: n_bucket}) == []
    m = SF._m_for(SF.BUILD_HEADROOM * n_bucket)
    assert m <= SF.MAX_M_BITS
    # worst case: bucket has consumed its whole growth headroom
    assert SF.estimated_fpp(SF.BUILD_HEADROOM * n_bucket, m) < 0.10


def test_fpp_under_10pct_at_full_headroom_load(spark, cat):
    """Empirical twin of the design-point math at scaled-down m: grow a
    bucket via add_keys to just below its resize threshold (the worst load
    the sizing ever allows, k*n/m -> ln2) and measure fpp < 10%."""
    seen = cat.table("seen", SEEN_DDL)
    base = spark.range(0, 4000).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    seen.append(base)
    bloom = SeenBloom(cat.table("b", BLOOM_DDL, partitioned=False))
    bloom.rebuild_buckets(spark, seen, [0])
    m0 = bloom.table.read(spark).first()["m"]
    # fill to the densest state add_keys permits at this bitmap size
    n_max = 18_000
    assert SF._m_for(n_max) <= m0 < SF._m_for(SF.BUILD_HEADROOM * n_max)
    delta = spark.range(100_000, 100_000 + n_max - 4000).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    seen.append(delta)
    assert bloom.add_keys(spark, delta) == []
    fresh = spark.range(10**7, 10**7 + 20_000).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    blooms = bloom.table.read(spark).select("bucket", "words", "m")
    fp = (
        fresh.join(F.broadcast(blooms), on="bucket")
        .filter(bloom_probe(F.col("words"), F.col("url_hash"), F.col("m")))
        .count()
    )
    assert fp / 20_000 < 0.10, f"fpp {fp / 20_000:.3f}"


def test_incremental_add_keys_bit_identical_to_rebuild(spark, cat):
    """Bloom bits are an OR over keys: add_keys(delta) at unchanged m must
    produce the exact bitmap of a full rebuild over base ∪ delta."""
    seen = cat.table("seen", SEEN_DDL)
    base = spark.range(0, 3000).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(4)).cast("int").alias("bucket"),
    )
    seen.append(base)
    inc = SeenBloom(cat.table("b_inc", BLOOM_DDL, partitioned=False))
    inc.rebuild_buckets(spark, seen, [0, 1, 2, 3])
    delta = spark.range(3000, 4000).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(4)).cast("int").alias("bucket"),
    )
    seen.append(delta)
    resize = inc.add_keys(spark, delta)
    assert resize == []  # 4k keys still fit the floor-sized bitmap
    full = SeenBloom(cat.table("b_full", BLOOM_DDL, partitioned=False))
    full.rebuild_buckets(spark, seen, [0, 1, 2, 3])
    a = {r["bucket"]: (r["words"], r["m"], r["n_items"]) for r in inc.table.read(spark).collect()}
    b = {r["bucket"]: (r["words"], r["m"], r["n_items"]) for r in full.table.read(spark).collect()}
    assert a == b


def test_add_keys_flags_outgrown_buckets_for_resize(spark, cat):
    """A delta that pushes a bucket past its bitmap's sizing target is not
    OR-ed in silently — the bucket is returned for a resize-rebuild."""
    from newscrawler_spark.engine import seenfilter as SF

    seen = cat.table("seen", SEEN_DDL)
    small = spark.range(0, 100).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    seen.append(small)
    bloom = SeenBloom(cat.table("b", BLOOM_DDL, partitioned=False))
    bloom.rebuild_buckets(spark, seen, [0])
    m0 = bloom.table.read(spark).first()["m"]
    assert m0 == SF.DEFAULT_M_BITS
    # a delta big enough that _m_for(n) exceeds the floor bitmap
    n_big = 40_000
    big = spark.range(1000, 1000 + n_big).select(
        F.xxhash64("id").alias("url_hash"), F.lit(0).cast("int").alias("bucket")
    )
    seen.append(big)
    assert SF._m_for(100 + n_big) > m0
    resize = bloom.add_keys(spark, big)
    assert resize == [0]
    bloom.rebuild_buckets(spark, seen, resize)
    row = bloom.table.read(spark).first()
    assert row["m"] == SF._m_for(SF.BUILD_HEADROOM * (100 + n_big))
    assert row["n_items"] == 100 + n_big
