"""Seen-set + bloom validation at real size (VERDICT r04 next-step #5).

The bloom design's 10^10 claims (`engine/seenfilter.py`: per-bucket sizing,
BUILD_HEADROOM amortization, broadcast-vs-shuffle probe crossover) were
previously exercised only at toy scale. This harness synthesizes a
structural seen set of N hash-derived keys (no external data), then
measures the four design-point numbers:

1. full bloom build time at N keys (`rebuild_buckets`, all buckets)
2. incremental `add_keys` time filling the bitmaps to FULL headroom
   (3N more keys — the worst legal load before a resize-rebuild)
3. empirical probe fpp at full headroom vs the analytic
   `estimated_fpp` for each bucket's (n_items, m)
4. `split_new` wall time on BOTH probe paths — bloom-broadcast and
   one-sided bucket shuffle — plus which path the default 128 MiB
   threshold picks at this size

Usage: python scripts/bench_seen_scale.py [n_keys] [out_json]
Defaults: n_keys=100_000_000 (the 10^8 validation point), out written
beside the repo root. tests/test_seen_scale.py runs the same `run()` at
10^7 as a pytest `slow`-marked gate with hard assertions.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from newscrawler_spark.engine import seenfilter as SF  # noqa: E402
from newscrawler_spark.engine.seenfilter import (  # noqa: E402
    BLOOM_DDL,
    SeenBloom,
    bloom_probe,
)
from newscrawler_spark.tablelib import Catalog  # noqa: E402


def _keys(spark, lo: int, hi: int, bucket_count: int):
    """Structural keys: url_hash = xxhash64(id), bucket uniform on hash.

    The engine's real bucket is pmod(host_hash, B); for the bloom math only
    the (url_hash, bucket) pair matters and host-skew handling is gated by
    its own tests (salting / cap_bucket_members), so uniform buckets give
    the cleanest sizing measurement."""
    return spark.range(lo, hi).select(
        F.xxhash64("id").alias("url_hash"),
        F.pmod(F.xxhash64("id"), F.lit(bucket_count)).cast("int").alias("bucket"),
    )


def _measured_fpp(spark, bloom: SeenBloom, probes, n_probe: int) -> float:
    """Fraction of definitely-novel probe keys the bloom calls 'maybe'."""
    blooms = F.broadcast(bloom.table.read(spark).select("bucket", "words", "m"))
    probed = probes.join(blooms, on="bucket", how="left")
    hits = probed.filter(
        F.col("words").isNotNull()
        & bloom_probe(F.col("words"), F.col("url_hash"), F.col("m"))
    ).count()
    return hits / n_probe


def run(
    spark,
    root: str,
    n_keys: int,
    bucket_count: int | None = None,
    n_probe: int = 1_000_000,
    fill_headroom: bool = True,
) -> dict:
    B = bucket_count or max(128, SF.required_bucket_count(n_keys))
    cat = Catalog(root)
    seen = cat.table("seen", "url_hash long, bucket int")
    t0 = time.time()
    seen.append(_keys(spark, 0, n_keys, B))
    t_seen_write = time.time() - t0

    bloom = SeenBloom(cat.table("seen_bloom", BLOOM_DDL, partitioned=False))
    t0 = time.time()
    bloom.rebuild_buckets(spark, seen, list(range(B)))
    t_build = time.time() - t0

    t_fill = None
    resize_after_fill: list[int] = []
    if fill_headroom:
        # BUILD_HEADROOM=4: bitmaps were sized for 4x the build count, so
        # 3N more keys is the densest state add_keys may reach without
        # flagging a resize — the worst-case legal fpp.
        extra = _keys(spark, n_keys, SF.BUILD_HEADROOM * n_keys, B)
        t0 = time.time()
        seen.append(extra)
        resize_after_fill = bloom.add_keys(spark, extra)
        t_fill = time.time() - t0

    meta = bloom.table.read(spark).select("bucket", "m", "n_items").collect()
    total_bloom_bytes = sum(int(r["m"]) // 8 for r in meta)
    # probes uniform over buckets -> unweighted mean of per-bucket fpp
    analytic_fpp = sum(
        SF.estimated_fpp(int(r["n_items"]), int(r["m"])) for r in meta
    ) / len(meta)

    probe_lo = 10 * SF.BUILD_HEADROOM * n_keys
    probes = _keys(spark, probe_lo, probe_lo + n_probe, B).cache()
    probes.count()
    fpp = _measured_fpp(spark, bloom, probes, n_probe)

    # split_new on both physical probe paths (same rows must come back:
    # every probe key is novel, and the exact join keeps exactness)
    orig = SF.BROADCAST_BLOOM_BYTES
    try:
        SF.BROADCAST_BLOOM_BYTES = 1 << 50
        t0 = time.time()
        n_bcast = bloom.split_new(spark, probes, seen).count()
        t_split_bcast = time.time() - t0
        SF.BROADCAST_BLOOM_BYTES = 0
        t0 = time.time()
        n_shuf = bloom.split_new(spark, probes, seen).count()
        t_split_shuffle = time.time() - t0
    finally:
        SF.BROADCAST_BLOOM_BYTES = orig
    probes.unpersist()

    return {
        "n_keys_built": n_keys,
        "n_keys_final": SF.BUILD_HEADROOM * n_keys if fill_headroom else n_keys,
        "bucket_count": B,
        "required_bucket_count": SF.required_bucket_count(n_keys),
        "seen_write_sec": round(t_seen_write, 1),
        "bloom_build_sec": round(t_build, 1),
        "bloom_fill_to_headroom_sec": round(t_fill, 1) if t_fill else None,
        "resize_after_fill": resize_after_fill,
        "total_bloom_mib": round(total_bloom_bytes / (1 << 20), 1),
        "default_path": (
            "broadcast" if total_bloom_bytes <= orig else "shuffle"
        ),
        "n_probe": n_probe,
        "fpp_measured": round(fpp, 5),
        "fpp_analytic": round(analytic_fpp, 5),
        "split_new_broadcast_sec": round(t_split_bcast, 1),
        "split_new_shuffle_sec": round(t_split_shuffle, 1),
        "split_counts_equal": n_bcast == n_shuf == n_probe,
    }


def main() -> None:
    n_keys = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "seen_scale_result.json"
    )
    from newscrawler_spark.session import get_spark

    # same-window bare-kernel probe (no Spark) BEFORE the run, so the
    # recorded timings carry their window's hardware context like every
    # scaling pair does (VERDICT r05 next-step #6: the r5 numbers were
    # measured at loadavg 28 with no probe beside them)
    probe = None
    try:
        sys.path.insert(0, HERE)
        os.environ.setdefault("SPARK_GRAFT_IMG_SIZES", "256")
        from bench_kernel import run_level

        probe = {
            "kernel_rows_per_sec": {
                "8": max(round(run_level(600, 8), 1) for _ in range(2)),
                "32": max(round(run_level(600, 32), 1) for _ in range(2)),
            },
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }
        probe["kernel_ceiling_eff_8_to_32"] = round(
            probe["kernel_rows_per_sec"]["32"]
            / (4 * probe["kernel_rows_per_sec"]["8"]), 3,
        )
    except Exception:
        pass

    spark = get_spark(app_name="seen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="seen_scale_")
    try:
        res = run(spark, root, n_keys)
        res["window_probe"] = probe
        res["host_loadavg"] = [round(x, 2) for x in os.getloadavg()]
        with open(out_path, "w") as f:
            json.dump(res, f, indent=2)
        print(json.dumps(res))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
