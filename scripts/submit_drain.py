"""spark-submit entry point for the frontier drain.

Cluster usage (the north-rule deployment shape)::

    zip -r newscrawler_spark.zip newscrawler_spark/
    spark-submit \
        --py-files newscrawler_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        scripts/submit_drain.py \
        --root /data/crawl_catalog --seeds 1000000 --epochs 10 \
        --batch-size 500000 --buckets 512

On a real cluster the SparkSession comes from spark-submit's master; this
script never hardcodes local[*]. The catalog root should be shared storage
(HDFS/S3 path via a mounted fs, or swap tablelib for Iceberg — see
docs/iceberg.sql). Resume is automatic: if the catalog already has a
checkpoint, the drain continues from the next epoch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="catalog root directory")
    ap.add_argument("--seeds", type=int, default=100_000)
    ap.add_argument("--payload", type=int, default=10_000)
    ap.add_argument("--hosts", type=int, default=5_000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=50_000)
    ap.add_argument("--buckets", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from newscrawler_spark import datagen
    from newscrawler_spark.engine.crawl import CrawlConfig, CrawlEngine

    # In spark-submit the builder picks up the submitted master/conf; the
    # local get_spark() factory is only for tests and benches.
    spark = (
        SparkSession.builder.appName("newscrawler-drain")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    cfg = CrawlConfig(
        seed=args.seed,
        n_hosts=args.hosts,
        n_payload=args.payload,
        n_seed_urls=args.seeds,
        batch_size=args.batch_size,
        bucket_count=args.buckets,
    )
    eng = CrawlEngine(spark, args.root, cfg)
    start = eng.resume_epoch()
    if start == 0:
        eng.bootstrap(
            datagen.gen_seeds_spark(spark, cfg.n_seed_urls, cfg.seed, cfg.n_hosts)
        )
    t0 = time.time()
    fetched = 0
    for e in range(start, start + args.epochs):
        st = eng.run_epoch(e)
        fetched += st["fetched"]
        print(json.dumps(st), flush=True)
        if st.get("done"):
            break
    # deferred bloom maintenance of the last epoch lands inside the timer
    eng._await_bloom()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "resumed_from_epoch": start,
                "fetched": fetched,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(fetched / wall, 2) if wall else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
