"""SparkSession factory.

One place to own the configuration that the scale story depends on:
Arrow-vectorized Python interop, AQE (incl. skew-join splitting), UTC
session time (the reference stores naive-UTC timestamps,
/root/reference/database.py:20-22), and a shuffle-partition count sized to
the core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry multi-MB image payloads through pandas UDFs; cap rows
# per batch so a batch stays well under executor memory even at 128x128 RGB.
ARROW_MAX_RECORDS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "newscrawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession with the engine's standard config.

    ``cores`` pins ``local[N]`` — used by the bench to run the identical job
    at two parallelism levels (local[8] vs local[32]) for the scaling-
    efficiency evidence. If a session already exists it is returned as-is
    (Spark cannot change master in-process), so benches must stop() between
    levels.
    """
    n = cores or default_parallelism()
    master = os.environ.get("SPARK_MASTER", f"local[{n}]")
    # Deployment rule (BENCH.md §2): multi-executor masters (local-cluster /
    # standalone / YARN) need >= 4x total cores of shuffle partitions or the
    # expand/commit window starves (measured: store merge queued 123s -> 3s).
    # Single-JVM local[N] is fastest near 1x cores (per-task overhead wins at
    # sf0.1), so only the multi-executor default changes.
    sp_default = max(n, 8) if master.startswith("local[") else max(4 * n, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(
                shuffle_partitions
                or int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "0"))
                or sp_default
            ),
        )
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        # only meaningful under a multi-executor master (local-cluster /
        # standalone / YARN); local[N] ignores it
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "4g"))
        # executor python workers must find this package when the master
        # forks real executor JVMs (local-cluster / standalone) — the
        # in-process sys.path hack only covers the driver. Equivalent to
        # spark-submit --py-files for an installed checkout.
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p for p in (
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                ) if p
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # Scheduler mode (BENCH.md §2.4c A/B): FAIR was hypothesized to help the
    # six concurrent commit jobs share slots, but the interleaved 8-leg A/B
    # measured it 9–13% SLOWER end-to-end (mean 909.6 vs 998.8 URLs/s), with
    # the loss concentrated in the long decode/fetch stage — FIFO stays the
    # default; SPARK_GRAFT_SCHEDULER=FAIR remains available as an override.
    sched = os.environ.get("SPARK_GRAFT_SCHEDULER", "").upper()
    if sched in ("FAIR", "FIFO"):
        builder = builder.config("spark.scheduler.mode", sched)
    # spark.locality.wait=0 is the default: Spark's 3 s wait idles free
    # slots waiting for a cache-local executor — a real cost for the
    # expand window and commit tail's many tiny cached-input jobs (the same
    # A/B measured locality.wait=0 at mean 1,046.8 vs 998.8 URLs/s with the
    # expand phase at 61.2 vs 75.2 s). On the deployment side the scan
    # source is an object store (no data locality to wait for), which is
    # the standard setting for S3/GCS-backed clusters; HDFS-local
    # deployments can restore the wait via SPARK_GRAFT_LOCALITY_WAIT=3s.
    lw = os.environ.get("SPARK_GRAFT_LOCALITY_WAIT", "") or "0"
    builder = builder.config("spark.locality.wait", lw)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
