"""Sessionization + tumbling window: batch ≡ native session_window ≡ stream."""

import datetime as dt
import shutil

import duckdb
from pyspark.sql import functions as F

from newscrawler_spark.functions import sessions as SESS

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_sessionize_gap_boundary_is_strict_ge(spark):
    """A gap of exactly gap_s starts a NEW session; gap_s - 1µs does not —
    the session_window closure rule ([start, last+gap) stays open only for
    events strictly inside the gap)."""
    base = dt.datetime(2024, 1, 1)
    gap = 60
    rows = [
        (1, 100, base),
        (1, 101, base + dt.timedelta(seconds=gap, microseconds=-1)),  # same
        (1, 102, base + dt.timedelta(seconds=2 * gap, microseconds=-1)),  # new: +gap
        (2, 200, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in SESS.sessionize(df, gap_s=gap).collect()
    }
    assert got[(1, 100)] == 1
    assert got[(1, 101)] == 1
    assert got[(1, 102)] == 2
    assert got[(2, 200)] == 1


def test_session_stats_equals_native_session_window(spark):
    """The window-function sessionizer (exact ANSI-oracle path) and Spark's
    native session_window operator (streaming execution path) produce the
    identical set of (user, n_events, start, end) sessions on real data."""
    ev = _events(spark)
    a = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in SESS.session_stats(ev, gap_s=6 * 3600).collect()
    }
    b = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in SESS.session_window_stats(ev, gap_s=6 * 3600).collect()
    }
    assert a == b
    assert len(a) > len({u for (u, *_rest) in a})  # multiple sessions per user


def test_sessionize_matches_duckdb_window_oracle(spark):
    """Bit-identical to the ANSI window-function formulation (the driver
    gate's oracle) including the epoch-µs gap comparison."""
    got = sorted(
        (r["user_id"], r["session_seq"], r["n_events"])
        for r in SESS.session_stats(_events(spark), gap_s=6 * 3600).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
        WITH lagged AS (
          SELECT user_id, event_id, ts,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
          FROM events),
        labeled AS (
          SELECT user_id, ts,
                 CAST(sum(CASE WHEN prev_us IS NULL
                               OR epoch_us(ts) - prev_us >= 21600000000
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_seq
          FROM lagged)
        SELECT user_id, session_seq, count(*) AS n_events
        FROM labeled GROUP BY 1, 2 ORDER BY 1, 2
        """
        ).fetchall()
    )
    assert got == want


def test_session_window_streaming_equals_batch(spark, tmp_path):
    """The same session_window plan run as a Structured Streaming query
    (availableNow over a file source, complete mode) emits the identical
    sessions as the batch run — the stream/batch unification the engine's
    drain relies on."""
    src = tmp_path / "ev_sess"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")
    ev = _events(spark)
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    agg = SESS.session_window_stats(stream, gap_s=6 * 3600)
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in spark.sql("select * from sess_out").collect()
    }
    want = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"])
        for r in SESS.session_window_stats(ev, gap_s=6 * 3600).collect()
    }
    assert got == want


def test_tumbling_agg_counts_and_cents(spark):
    """Bucket totals sum to the table totals; cents are floor(x*100+0.5)."""
    ev = _events(spark)
    out = SESS.tumbling_agg(ev).collect()
    assert sum(r["n_events"] for r in out) == ev.count()
    want_cents = ev.select(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
    ).first()[0]
    assert sum(r["sum_value_cents"] for r in out) == want_cents
    # every bucket start is hour-aligned
    assert all(
        r["win_start"].minute == 0 and r["win_start"].second == 0 for r in out
    )
