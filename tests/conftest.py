import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newscrawler_spark import datagen  # noqa: E402
from newscrawler_spark.engine.crawl import CrawlConfig  # noqa: E402
from newscrawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="newscrawler-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_cfg():
    return CrawlConfig(
        seed=42,
        n_hosts=20,
        n_payload=200,
        n_seed_urls=300,
        batch_size=50,
        host_quota=5,
        bucket_count=32,
        salt_buckets=4,
    )


@pytest.fixture(scope="session")
def seed_rows(small_cfg):
    return [
        tuple(r)
        for r in datagen.gen_seeds_pdf(
            np.arange(small_cfg.n_seed_urls), small_cfg.seed, small_cfg.n_hosts
        ).itertuples(index=False)
    ]
