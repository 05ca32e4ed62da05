"""Event sessionization + tumbling-window aggregation (batch & streaming).

Large-scale training-data pipelines segment event/interaction logs into
sessions (gap-based) and time buckets before downstream sampling; the
reference's crawl-log analytics (fetch metrics per window) are the same
shape. Everything here is pure built-in window/agg expressions — one
shuffle on the partition key, whole-stage codegen, no Python in the plan.

Scale notes (100 TB):
- ``sessionize`` shuffles once on ``user_col`` (the window partition key);
  session assignment and the subsequent per-session aggregate reuse that
  partitioning, so the whole job is a single exchange. Skewed power users
  bound a partition at their own event count, which per-user logs keep
  small (bot-like hyper-users should be pre-filtered at admission, the
  same way the crawl engine's host-quota caps hot hosts).
- ``tumbling_agg`` is a plain partial-aggregated groupBy: map-side combine
  shrinks each task's output to |buckets × types| rows before the exchange.
- The streaming twin of ``sessionize`` is Spark's native
  ``session_window`` (same gap semantics, proven equal by
  tests/test_sessions.py); of ``tumbling_agg`` it is
  ``streaming.drain_stream.windowed_fetch_metrics`` (watermarked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 6 * 3600,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user ``session_seq`` (1-based) by the gap rule.

    A new session starts at the first event and whenever the time since
    the previous event is >= ``gap_s`` — exactly Spark's
    ``session_window`` closure rule (a session stays open while the next
    event lands strictly inside the gap), so the batch labels match the
    streaming operator's windows one-for-one.

    Comparison is on epoch MICROseconds (``unix_micros``) so the rule is
    bit-identical across engines — second-truncated casts disagree with
    DuckDB's ``date_diff`` on sub-second boundaries.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    # parquet naive timestamps arrive as TIMESTAMP_NTZ in Spark 4;
    # unix_micros needs TIMESTAMP — the UTC-session cast is deterministic
    # and only differences are compared, so the epoch offset cancels
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_sess = (
        F.when(prev_us.isNull() | (us - prev_us >= gap_s * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 6 * 3600,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: event count + start/end timestamps.

    One logical shuffle: the groupBy key prefix (user) is the window
    partition key, so Catalyst reuses the sessionize exchange.
    """
    return (
        sessionize(df, user_col, ts_col, gap_s, tiebreak_col)
        .groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def session_window_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 6 * 3600,
) -> DataFrame:
    """The same rollup via Spark's native ``session_window`` operator.

    Works identically in batch and Structured Streaming (with a watermark
    upstream); tests assert its per-session counts equal
    :func:`session_stats`. Kept as the streaming execution path — the
    window-function form above exists because it also yields the per-EVENT
    label and has an exact ANSI oracle.
    """
    return (
        df.groupBy(user_col, F.session_window(ts_col, f"{gap_s} seconds"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("win_start"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    by_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Tumbling-window aggregate: events and value-cents per (bucket, type).

    ``date_trunc`` IS the tumbling window for calendar-aligned widths and,
    unlike ``F.window``, has a byte-identical twin in every ANSI engine.
    Money-like sums are emitted as integer cents with half-up floor
    rounding (``floor(x*100 + 0.5)``) — the only double→integer rounding
    both Spark and DuckDB agree on bit-for-bit (see docs/oracle notes).
    """
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    return (
        df.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("win_start"),
            F.col(by_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
        )
    )
