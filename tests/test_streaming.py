"""Structured Streaming: seed ingestion, stateful politeness, windowed aggs."""

import datetime as dt
import os

import numpy as np
import pytest

from newscrawler_spark import datagen
from newscrawler_spark.engine.crawl import CrawlEngine
from newscrawler_spark.streaming import drain_stream as DS


@pytest.fixture()
def seeds_dir(spark, small_cfg, tmp_path):
    d = tmp_path / "seeds_in"
    d.mkdir()
    pdf = datagen.gen_seeds_pdf(np.arange(200), small_cfg.seed, small_cfg.n_hosts)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d / "wave1"))
    return d


def test_stream_seed_ingest_dedups_into_frontier(spark, small_cfg, tmp_path, seeds_dir):
    eng = CrawlEngine(spark, str(tmp_path / "cat"), small_cfg)
    q = DS.stream_seed_ingest(
        spark, str(seeds_dir / "*"), eng, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    n1 = eng.frontier.read(spark).count()
    assert n1 > 0
    seen1 = {r["url_hash"] for r in eng.seen.read(spark).collect()}
    assert len(seen1) == n1  # every frontier row is in seen, exactly once

    # second wave: overlapping URLs must not re-enter the frontier
    pdf = datagen.gen_seeds_pdf(np.arange(150, 350), small_cfg.seed, small_cfg.n_hosts)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(seeds_dir / "wave2"))
    q2 = DS.stream_seed_ingest(
        spark, str(seeds_dir / "*"), eng, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    n2 = eng.frontier.read(spark).count()
    seen2 = {r["url_hash"] for r in eng.seen.read(spark).collect()}
    assert n2 > n1
    assert len(seen2) == n2
    # frontier still unique on url_hash
    assert eng.frontier.read(spark).select("url_hash").distinct().count() == n2


def test_politeness_clock_stream(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a.com", base + dt.timedelta(seconds=s)) for s in (0, 1, 2, 3, 10)
    ] + [("b.com", base + dt.timedelta(seconds=s)) for s in (0, 5)]
    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(rows, "host string, ts timestamp").coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema("host string, ts timestamp").parquet(
        str(src / "*")
    )
    gated = DS.politeness_clock_stream(stream, min_interval_s=2.0)
    out = (
        gated.writeStream.format("memory")
        .queryName("polite_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    res = {
        (r["host"], r["ts"].second): r["admitted"]
        for r in spark.sql("select * from polite_out").collect()
    }
    # a.com: 0 ok, 1 blocked (<2s), 2 ok, 3 blocked, 10 ok
    assert res[("a.com", 0)] is True
    assert res[("a.com", 1)] is False
    assert res[("a.com", 2)] is True
    assert res[("a.com", 3)] is False
    assert res[("a.com", 10)] is True
    assert res[("b.com", 0)] is True and res[("b.com", 5)] is True


def test_windowed_fetch_metrics(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [("a.com", base + dt.timedelta(seconds=s)) for s in (0, 10, 70)] + [
        ("b.com", base + dt.timedelta(seconds=5))
    ]
    src = tmp_path / "ev2"
    src.mkdir()
    spark.createDataFrame(rows, "host string, ts timestamp").coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema("host string, ts timestamp").parquet(
        str(src / "*")
    )
    agg = DS.windowed_fetch_metrics(stream)
    # complete mode: a finite availableNow source never advances the
    # watermark past the last window, so append would emit nothing
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["start"].minute): r["n_fetches"]
        for r in spark.sql("select * from win_out").collect()
    }
    assert got[("a.com", 0)] == 2
    assert got[("a.com", 1)] == 1
    assert got[("b.com", 0)] == 1


def test_stream_ingest_durable_and_bloom_safe(spark, small_cfg, tmp_path, seeds_dir):
    """ADVICE r01: streamed seeds must (a) mark their buckets bloom-dirty so
    stale blooms can't re-admit them, and (b) be checkpointed so a resume
    does not roll the frontier/seen pointers back past the appends."""
    eng = CrawlEngine(spark, str(tmp_path / "cat"), small_cfg)
    # simulate an engine with built blooms + an existing checkpoint
    eng.bootstrap(
        datagen.gen_seeds_spark(spark, 50, small_cfg.seed, small_cfg.n_hosts)
    )
    assert not eng._bloom_dirty
    q = DS.stream_seed_ingest(spark, str(seeds_dir / "*"), eng, str(tmp_path / "ck"))
    q.awaitTermination(120)
    n_frontier = eng.frontier.read(spark).count()
    n_seen = eng.seen.read(spark).count()
    assert eng._bloom_dirty, "streamed buckets not marked stale"
    ck = eng.catalog.last_checkpoint()
    assert ck["snapshots"]["frontier"] == eng.frontier.current_snapshot_id()
    assert ck["snapshots"]["seen"] == eng.seen.current_snapshot_id()
    assert set(ck["bloom_dirty"]) == eng._bloom_dirty

    # process death + resume: streamed seeds survive
    eng2 = CrawlEngine(spark, str(tmp_path / "cat"), small_cfg)
    eng2.resume_epoch()
    assert eng2.frontier.read(spark).count() == n_frontier
    assert eng2.seen.read(spark).count() == n_seen
    assert eng2._bloom_dirty == set(ck["bloom_dirty"])


def test_politeness_stream_equals_batch_clock(spark, tmp_path):
    """VERDICT r03 next #7 — T2's two implementations tied together: the
    applyInPandasWithState stream, processed across MULTIPLE micro-batches
    (maxFilesPerTrigger=1, time-split files so state must carry over), must
    admit exactly the same events as the batch clock over the full
    history."""
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    hosts = [f"h{i}.test" for i in range(6)]
    rows = []
    used = set()
    for h in hosts:
        for _ in range(40):
            s = rng.randrange(0, 120)
            if (h, s) in used:   # unique ts per host: admission order defined
                continue
            used.add((h, s))
            rows.append((h, base + dt.timedelta(seconds=s)))
    early = [r for r in rows if r[1].second < 60 and r[1].minute == 0]
    late = [r for r in rows if r not in early]
    src = tmp_path / "events2"
    src.mkdir()
    ddl = "host string, ts timestamp"
    spark.createDataFrame(early, ddl).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(late, ddl).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        DS.politeness_clock_stream(stream, min_interval_s=7.0)
        .writeStream.format("memory")
        .queryName("polite_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["host"], r["ts"], r["admitted"])
        for r in spark.sql("select * from polite_eq").collect()
    }
    ev = spark.createDataFrame(rows, ddl)
    got_batch = {
        (r["host"], r["ts"], r["admitted"])
        for r in DS.politeness_clock_batch(ev, min_interval_s=7.0).collect()
    }
    assert len(got_stream) == len(rows)
    assert got_stream == got_batch
    assert any(not adm for _, _, adm in got_batch)  # the gate actually bites


def test_stream_drain_matches_oracle(spark, small_cfg, seed_rows, tmp_path):
    """End-to-end streaming drain: a tick-driven foreachBatch query runs
    the engine one epoch per micro-batch and must produce the SAME crawl
    order, seen set, and store as the sequential oracle — the identical
    gate the batch drain passes in tests/test_crawl.py (VERDICT r04 #7)."""
    from newscrawler_spark.oracle import OracleCrawl

    n_epochs = 4
    eng = CrawlEngine(spark, str(tmp_path / "cat"), small_cfg)
    eng.bootstrap(
        datagen.gen_seeds_spark(
            spark, small_cfg.n_seed_urls, small_cfg.seed, small_cfg.n_hosts
        )
    )
    ticks = tmp_path / "ticks"
    DS.write_epoch_ticks(spark, str(ticks), n_epochs)
    q = DS.stream_drain(spark, eng, str(ticks), str(tmp_path / "ckpt_drain"))
    q.awaitTermination(600)

    orc = OracleCrawl(small_cfg)
    orc.bootstrap(seed_rows)
    for e in range(n_epochs):
        orc.run_epoch(e)

    got = sorted(
        (r["epoch"], r["seq"], r["url_hash"])
        for r in eng.crawl_order_with_seq().collect()
    )
    assert got == sorted(orc.res.order)
    assert len(got) > 100
    seen_eng = {r["url_hash"] for r in eng.seen.read(spark).collect()}
    assert seen_eng == orc.res.seen
    store_eng = {
        r["url_hash"]: (r["image_id"], r["caption"], r["phash"])
        for r in eng.store.read(spark).collect()
    }
    store_orc = {
        k: (v["image_id"], v["caption"], v["phash"])
        for k, v in orc.res.store.items()
    }
    assert store_eng == store_orc
