"""Engine ≡ oracle on a REAL multi-executor topology (local-cluster).

local[N] runs every task in the driver JVM; `local-cluster[2,2,mem]` forks
two executor JVMs with their own heaps, python workers, and real
shuffle/broadcast transport — the closest sandbox analog of spark-submit
on a cluster. A crawl order that only matches in local mode could hide
closure-serialization or partitioning bugs; this gate proves the
correctness invariants survive real executors.

Runs in a subprocess because one python process can hold only one Spark
master; the session fixture is local[8].
"""

import json
import os
import subprocess
import sys

import numpy as np

from newscrawler_spark import datagen
from newscrawler_spark.engine.crawl import CrawlConfig
from newscrawler_spark.oracle import OracleCrawl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys, tempfile
from newscrawler_spark import datagen
from newscrawler_spark.engine.crawl import CrawlConfig, CrawlEngine
from newscrawler_spark.session import get_spark

spark = get_spark(app_name="lc-oracle", cores=4, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
assert spark.sparkContext.master.startswith("local-cluster"), spark.sparkContext.master
cfg = CrawlConfig(seed=42, n_hosts=20, n_payload=200, n_seed_urls=300,
                  batch_size=50, host_quota=5, bucket_count=32, salt_buckets=4)
eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="lc-"), cfg)
eng.bootstrap(datagen.gen_seeds_spark(spark, cfg.n_seed_urls, cfg.seed, cfg.n_hosts))
for e in range(3):
    eng.run_epoch(e)
order = sorted((r["epoch"], r["seq"], r["url_hash"])
               for r in eng.crawl_order_with_seq().collect())
seen = sorted(r["url_hash"] for r in eng.seen.read(spark).collect())
print("RESULT " + json.dumps({"order": order, "seen": seen}))
spark.stop()
"""


def test_crawl_order_and_seen_match_oracle_on_real_executors():
    cfg = CrawlConfig(
        seed=42, n_hosts=20, n_payload=200, n_seed_urls=300,
        batch_size=50, host_quota=5, bucket_count=32, salt_buckets=4,
    )
    env = dict(os.environ)
    env["SPARK_MASTER"] = "local-cluster[2,2,3072]"
    env["SPARK_EXECUTOR_MEMORY"] = "2g"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env,
        capture_output=True, text=True, timeout=600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, f"no RESULT line; stderr tail: {out.stderr[-2000:]}"
    got = json.loads(line[0][len("RESULT "):])

    orc = OracleCrawl(cfg)
    orc.bootstrap(
        [tuple(r) for r in datagen.gen_seeds_pdf(
            np.arange(cfg.n_seed_urls), cfg.seed, cfg.n_hosts
        ).itertuples(index=False)]
    )
    for e in range(3):
        orc.run_epoch(e)

    assert [tuple(t) for t in got["order"]] == sorted(orc.res.order)
    assert got["seen"] == sorted(orc.res.seen)
    assert len(got["order"]) > 50
