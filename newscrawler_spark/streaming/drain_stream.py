"""Structured Streaming front-end for the crawl engine.

The reference's crawl loop is a request-driven micro-batch pipeline
(/root/reference/main.py:163-255); the batch engine models it as epochs.
This module adds the streaming-native ingress:

- ``stream_seed_ingest``: seed lists arrive as parquet files in a watched
  directory; ``readStream`` → canonicalize → within-batch dedup →
  ``foreachBatch`` anti-joins the persistent seen table and appends new
  rows to the frontier — exactly the bootstrap path, but continuous.
  ``Trigger.AvailableNow`` drains whatever is present and stops (testable,
  deterministic); on a cluster the same query runs with a processing-time
  trigger.

- ``politeness_clock_stream``: the per-host politeness clock
  (article_extractor.py:77-108) as a *custom stateful streaming operator*
  via ``applyInPandasWithState`` — keyed by host, state = last admitted
  fetch time; a fetch event is admitted iff >= min_interval since the
  stored clock, which then advances. This is the streaming twin of the
  batch engine's quota window and demonstrates exactly-once keyed state.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..engine.crawl import FRONTIER_DDL, CrawlEngine
from ..urlnorm import with_url_identity

SEED_SCHEMA = (
    "url string, priority double, discovered_at timestamp, "
    "category string, language string"
)


def stream_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    engine: CrawlEngine,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous seed ingestion into the frontier (file-source stream)."""
    cfg = engine.cfg
    stream = (
        spark.readStream.schema(SEED_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(seeds_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        s = with_url_identity(batch_df, "url", cfg.bucket_count)
        s = s.join(engine._gated_dim(), on="host", how="left_anti")
        w = Window.partitionBy("url_hash").orderBy(
            F.col("discovered_at").asc(), F.col("url").asc()
        )
        s = (
            s.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("retry_count", F.lit(0))
            .withColumn("not_before", F.lit(0))
            .select(*[c.strip().split(" ")[0] for c in FRONTIER_DDL.split(",")])
        )
        seen_df = engine.seen.read(batch_df.sparkSession).select("url_hash")
        new_rows = s.join(seen_df, on="url_hash", how="left_anti").cache()
        n_new = new_rows.count()
        if n_new:
            fid = engine.frontier.append(
                new_rows, {"stream_batch": batch_id}, pack_rows=int(n_new)
            )
            sid = engine.seen.append(
                new_rows.select("url_hash", "bucket"), pack_rows=int(n_new)
            )
            # the appended buckets' blooms are now stale: mark them dirty so
            # split_new routes them through the exact join (ADVICE r01 (a) —
            # otherwise a stale bloom could re-admit a streamed URL)
            touched = {
                r[0] for r in new_rows.select("bucket").distinct().collect()
            }
            # generation-bumping mark (ADVICE r06 high): survives any clear
            # token held by an in-flight deferred add_keys job, whose delta
            # does not contain these streamed keys
            engine._mark_bloom_dirty(touched)
            if engine._frontier_est is not None:
                engine._frontier_est += int(n_new)
            if engine._seen_rows_est is not None:
                engine._seen_rows_est += int(n_new)
            # durable hand-off to the batch engine: without a catalog
            # checkpoint, the next resume would roll the frontier/seen
            # pointers back past these appends while Spark's own stream
            # checkpoint has already consumed the input files — losing the
            # seeds permanently (ADVICE r01 (b))
            ck = engine.catalog.last_checkpoint()
            snaps = dict(ck["snapshots"]) if ck else {}
            snaps["frontier"] = fid
            snaps["seen"] = sid
            engine._checkpoint(ck["epoch"] if ck else -1, snaps)
        new_rows.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_epoch_ticks(spark: SparkSession, ticks_dir: str, n: int) -> None:
    """Materialize ``n`` one-row parquet tick files (one file per epoch).

    With ``maxFilesPerTrigger=1`` each file becomes exactly one micro-batch
    of :func:`stream_drain`. On a cluster the tick source would be a rate
    or Kafka stream; files keep the test deterministic and replayable."""
    for i in range(n):
        spark.createDataFrame([(i,)], "tick int").coalesce(1).write.parquet(
            f"{ticks_dir}/tick-{i:05d}"
        )


def stream_drain(
    spark: SparkSession,
    engine: CrawlEngine,
    ticks_dir: str,
    checkpoint_dir: str,
):
    """Run the crawl drain as a Structured Streaming query (T1 twin).

    The reference's crawl loop is already a micro-batch semantic — one
    politeness-bounded batch per loop iteration
    (/root/reference/main.py:163-255) — so mapping it onto Spark's native
    micro-batch runtime needs no re-modeling: a tick stream drives one
    engine epoch per micro-batch through ``foreachBatch``. Fault tolerance
    composes from the two checkpoint layers: Spark's stream checkpoint
    delivers each tick at-least-once across restarts, and the engine's own
    catalog checkpoint makes a replayed tick idempotent —
    ``resume_epoch()`` rolls a torn epoch back and skips past a completed
    one (the exact recovery contract tests/test_crawl.py proves for the
    batch drain). The tick payload itself is ignored; the engine's
    checkpoint is the authority on which epoch runs next, so duplicate or
    lost ticks can only cause an extra (empty/no-op) epoch, never a skipped
    or double-applied one.
    """
    stream = (
        spark.readStream.schema("tick int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{ticks_dir}/*")
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        e = engine.resume_epoch()
        engine.run_epoch(e)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


POLITE_OUT_SCHEMA = "host string, ts timestamp, admitted boolean"
POLITE_STATE_SCHEMA = "last_ts timestamp"


def _admit_seq(host: str, ts_values, last, min_interval_s: float):
    """The one greedy clock: admit iff >= min_interval since the last
    admitted fetch, which then advances. Shared by the streaming operator
    and its batch twin so their equivalence test gates exactly the
    cross-micro-batch state handling, not two divergent reimplementations."""
    rows = []
    for ts in ts_values:
        t = ts.to_pydatetime()
        ok = last is None or (t - last).total_seconds() >= min_interval_s
        if ok:
            last = t
        rows.append((host, t, ok))
    return rows, last


def _politeness_fn(min_interval_s: float):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last = state.get[0] if state.exists else None
        events = pd.concat(list(pdfs)).sort_values("ts")
        rows, last = _admit_seq(host, events["ts"], last, min_interval_s)
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(rows, columns=["host", "ts", "admitted"])

    return fn


def politeness_clock_stream(
    events: DataFrame, min_interval_s: float = 2.0
) -> DataFrame:
    """applyInPandasWithState politeness gate over a (host, ts) stream."""
    return events.groupBy("host").applyInPandasWithState(
        _politeness_fn(min_interval_s),
        outputStructType=POLITE_OUT_SCHEMA,
        stateStructType=POLITE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def politeness_clock_batch(
    events: DataFrame, min_interval_s: float = 2.0
) -> DataFrame:
    """Batch twin of :func:`politeness_clock_stream`: the same greedy
    per-host clock over the full event history in one pass (one shuffle on
    host, Arrow-grouped). Ties T2's two implementations together — the
    equivalence test runs the stream in multiple micro-batches so any
    state-carry bug between batches would diverge from this twin."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        rows, _ = _admit_seq(pdf["host"].iat[0], pdf["ts"], None, min_interval_s)
        return pd.DataFrame(rows, columns=["host", "ts", "admitted"])

    return events.groupBy("host").applyInPandas(fn, POLITE_OUT_SCHEMA)


def windowed_fetch_metrics(events: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked windowed fetch-rate aggregation (late data tolerated).

    The streaming analog of the fetch_log lineage: fetches per host per
    window with a 2-minute watermark.
    """
    return (
        events.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", window).alias("win"), F.col("host"))
        .agg(F.count("*").alias("n_fetches"))
        .select("win.start", "win.end", "host", "n_fetches")
    )
