"""Measure session cold-start attribution: time E.queries() construction
(where the one-time warmup now runs) and then each headline query exactly
the way the frozen bench.py does (build + .count()), in bench order, on a
FRESH session. Compares the first-query penalty with/without warmup via
SPARK_GRAFT_NO_WARM.

Usage: python scripts/bench_coldstart.py [n_queries]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newscrawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ORDER = [
    "search_keywords", "window_drain", "group_agg_decimal",
    "broadcast_dim_join", "anti_join_seen", "dedup_exact", "minhash_md5",
    "lang_id", "quality_features", "cosine_topk", "simhash_pairs",
    "decode_features", "sessionize", "windowed_agg",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else len(ORDER)
    t_sess = time.time()
    spark = get_spark(app_name="bench-coldstart", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sess_s = round(time.time() - t_sess, 3)

    import __spark_entry__ as E

    t_q = time.time()
    qs = E.queries()  # warmup (if enabled) runs here — untimed by bench.py
    queries_s = round(time.time() - t_q, 3)

    out: dict[str, float] = {}
    for name in ORDER[:k]:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({
        "warm_disabled": bool(os.environ.get("SPARK_GRAFT_NO_WARM")),
        "session_sec": sess_s,
        "queries_construct_sec": queries_s,
        "queries": out,
        "sum": round(sum(out.values()), 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
