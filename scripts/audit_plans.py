"""Physical-plan audit: assert the plans we designed for are the plans we get.

Checks (and dumps to PLANS.md):
- parquet scans carry PushedFilters + pruned ReadSchema (predicate pushdown
  and column pruning reach the scan)
- small-dim joins are BroadcastHashJoin, not SortMergeJoin
- global top-k compiles to TakeOrderedAndProject, not a full Sort+Limit
- the whole-stage-codegen spans cover the scalar-function pipeline
- the crawl batch ranking uses window + distributed TakeOrdered

Run: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from newscrawler_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = old
    return buf.getvalue()


def main() -> int:
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    report = ["# Physical-plan audit\n"]
    failures = []

    # 1. pushdown + pruning
    q1 = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    p1 = plan_of(q1)
    ok1 = "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in p1
    ok1b = "l_orderkey" in p1.split("ReadSchema")[-1] and "l_comment" not in p1
    report.append(f"## scan pushdown+pruning: {'OK' if ok1 and ok1b else 'FAIL'}\n```\n{p1}\n```\n")
    if not (ok1 and ok1b):
        failures.append("pushdown")

    # 2. broadcast join for small dim
    q2 = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).groupBy(
        "p_brand"
    ).count()
    p2 = plan_of(q2)
    ok2 = "BroadcastHashJoin" in p2
    report.append(f"## broadcast dim join: {'OK' if ok2 else 'FAIL'}\n```\n{p2}\n```\n")
    if not ok2:
        failures.append("broadcast")

    # 3. distributed top-k
    q3 = ev.orderBy(F.desc("value")).limit(100)
    p3 = plan_of(q3)
    ok3 = "TakeOrderedAndProject" in p3
    report.append(f"## top-k = TakeOrderedAndProject: {'OK' if ok3 else 'FAIL'}\n```\n{p3}\n```\n")
    if not ok3:
        failures.append("topk")

    # 4. codegen span over scalar pipeline
    q4 = ev.select(
        F.regexp_replace(F.lower("event_type"), "e", "E").alias("a"),
        (F.col("value") * 2 + 1).alias("b"),
    ).filter(F.col("b") > 10)
    p4 = plan_of(q4)
    # Spark 4 formatted plans mark codegen stages with a '*' node prefix
    ok4 = "WholeStageCodegen" in p4 or "\n* " in p4 or "+- * " in p4
    report.append(f"## codegen span: {'OK' if ok4 else 'FAIL'}\n```\n{p4}\n```\n")
    if not ok4:
        failures.append("codegen")

    # 5. crawl ranking plan (window + TakeOrdered, no global sort)
    from newscrawler_spark import datagen
    from newscrawler_spark.engine.crawl import CrawlConfig, CrawlEngine
    import tempfile

    cfg = CrawlConfig(n_seed_urls=2000, n_hosts=50, n_payload=200, batch_size=500,
                      bucket_count=16, salt_min_rows=0)
    root = tempfile.mkdtemp(prefix="audit-")
    eng = CrawlEngine(spark, root, cfg)
    eng.bootstrap(datagen.gen_seeds_spark(spark, cfg.n_seed_urls, cfg.seed, cfg.n_hosts))
    p5 = plan_of(eng.select_batch(0))
    ok5 = "TakeOrderedAndProject" in p5 and "Window" in p5
    report.append(
        f"## crawl batch ranking (salted window + TakeOrdered): {'OK' if ok5 else 'FAIL'}\n```\n{p5}\n```\n"
    )
    if not ok5:
        failures.append("crawl-rank")

    # 6. input_hint invariant: the fetch path has exactly ONE Python eval —
    # the Arrow-batched decode UDF. Everything else is JVM expressions.
    p6 = plan_of(eng.fetch_batch(eng.select_batch(0)))
    # formatted plans print each node twice (tree + detail); "Name (" is the
    # tree form. MapInPandas here is the synthetic payload *generator*
    # (datagen), not part of the fetch path on a real deployment.
    n_arrow = p6.count("ArrowEvalPython (")
    n_rowpy = p6.count("BatchEvalPython (")  # row-at-a-time Python = forbidden
    ok6 = n_arrow == 1 and n_rowpy == 0
    report.append(
        f"## fetch path: 1 Arrow UDF, 0 row-Python: {'OK' if ok6 else 'FAIL'} "
        f"(ArrowEvalPython={n_arrow}, BatchEvalPython={n_rowpy})\n```\n{p6}\n```\n"
    )
    if not ok6:
        failures.append("fetch-python")

    # 7. large-batch (cluster-scale) select path: NO TakeOrderedAndProject
    # driver merge — quantile prefilter + executor-side exact rank; and the
    # payload join must not broadcast the batch side.
    import dataclasses

    cfg_big = dataclasses.replace(cfg, distributed_batch_threshold=0)
    eng_big = CrawlEngine(spark, root, cfg_big)  # same catalog, new config
    big_batch = eng_big.select_batch(0)
    p7 = plan_of(big_batch)
    # What matters at 10^10 rows: (a) the global rank's input is the
    # quantile-PREFILTERED candidate set (a Filter feeds the Window), never
    # the raw frontier; (b) the result stays distributed — the plan tops
    # out in an Exchange (repartition by bucket), not a driver collect.
    # Spark's LimitPushDownThroughWindow may re-introduce a bounded
    # TakeOrderedAndProject over the prefiltered set — harmless, its input
    # is O(k), and asserting its absence would fight the optimizer.
    head = p7.split("InMemoryTableScan")[0]  # the post-prefilter shape
    ok7 = (
        "Window" in head
        and "Exchange" in head.splitlines()[2]  # top op under AdaptiveSparkPlan
        and "Filter" in head
    )
    report.append(
        f"## large-batch select: prefiltered executor-side rank, "
        f"distributed result: {'OK' if ok7 else 'FAIL'}\n```\n{p7}\n```\n"
    )
    if not ok7:
        failures.append("large-batch-select")

    # 8. frontier MOR read: after a tombstone commit the scan applies the
    # equality deletes via a join (no table rewrite happened), and the
    # tombstone side is small enough to hash/broadcast-join.
    eng.run_epoch(0)  # produces a MOR commit (tombstones + inserts)
    assert eng.frontier.snapshot().deletes, "expected MOR tombstones"
    p8 = plan_of(eng.frontier.read(spark))
    ok8 = ("BroadcastHashJoin" in p8 or "SortMergeJoin" in p8) and (
        "_tmax" in p8 or "max(_seq)" in p8
    )
    report.append(
        f"## frontier merge-on-read scan (tombstone join applied): "
        f"{'OK' if ok8 else 'FAIL'}\n```\n{p8}\n```\n"
    )
    if not ok8:
        failures.append("mor-read")

    # 9. link expansion is pure JVM: hash-chain expressions + dim joins,
    # zero Python evals of any kind in its plan.
    hashes = spark.range(0, 100).select(F.xxhash64("id").alias("url_hash"))
    p9 = plan_of(eng.expand_jvm(hashes))
    ok9 = "ArrowEvalPython" not in p9 and "BatchEvalPython" not in p9
    report.append(
        f"## link expansion: zero Python evals (hash chains + dim joins): "
        f"{'OK' if ok9 else 'FAIL'}\n```\n{p9}\n```\n"
    )
    if not ok9:
        failures.append("expand-python")

    # 10. sessionization: the per-session rollup reuses the sessionize
    # window's hashpartitioning(user_id) — ONE exchange end-to-end (the
    # groupBy key prefix is the window partition key), and zero Python.
    from newscrawler_spark.functions import sessions as SESS

    p10 = plan_of(SESS.session_stats(ev, gap_s=6 * 3600))
    n_exch = p10.count("Exchange (")
    ok10 = (
        n_exch == 1
        and "hashpartitioning(user_id" in p10
        and "ArrowEvalPython" not in p10
        and "BatchEvalPython" not in p10
    )
    report.append(
        f"## sessionize + per-session rollup: one exchange, zero Python: "
        f"{'OK' if ok10 else 'FAIL'} (Exchange={n_exch})\n```\n{p10}\n```\n"
    )
    if not ok10:
        failures.append("sessionize-exchange")

    # 11. IVF ANN over the persisted index: the probe filter compiles to
    # scan-level PartitionFilters on _cid — a query reads nprobe partition
    # dirs, never the full index (the Iceberg PARTITIONED BY (_cid) analog).
    from newscrawler_spark.functions import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = SIM.ivf_train(emb, "embedding", n_centroids=16, seed=42)
    ivf_dir = tempfile.mkdtemp(prefix="audit-ivf-")
    SIM.ivf_write_index(SIM.ivf_index(emb, "embedding", cents), ivf_dir)
    qvec = list(emb.filter("vec_id = 0").first()["embedding"])
    q11 = SIM.ivf_topk(
        SIM.ivf_read_index(spark, ivf_dir), "embedding", cents, qvec, k=10, nprobe=4
    )
    p11 = plan_of(q11)
    after = p11.split("PartitionFilters", 1)
    ok11 = len(after) == 2 and "_cid" in after[1][:250]
    report.append(
        f"## IVF query: _cid probe list in PartitionFilters (scan prunes to "
        f"nprobe dirs): {'OK' if ok11 else 'FAIL'}\n```\n{p11}\n```\n"
    )
    if not ok11:
        failures.append("ivf-partition-pruning")

    # 12. image near-dup over a parquet-backed payload table: the phash
    # pair join must prune the scan to (image_id, phash) — the bytes
    # column (the table's mass at 100 TB) never leaves the reader.
    from newscrawler_spark import datagen
    from newscrawler_spark.functions import multimodal as MM

    pay_dir = tempfile.mkdtemp(prefix="audit-payload-")
    datagen.gen_payload_spark(spark, 200, 42).write.mode("overwrite").parquet(pay_dir)
    q12 = MM.phash_near_pairs(spark.read.parquet(pay_dir), max_hamming=6)
    p12 = plan_of(q12)
    scans = [s for s in p12.split("ReadSchema")[1:]]
    ok12 = bool(scans) and all(
        "phash" in s[:200] and "bytes" not in s[:200] and "caption" not in s[:200]
        for s in scans
    )
    report.append(
        f"## phash near-dup: payload scan pruned to (image_id, phash), no "
        f"bytes/caption: {'OK' if ok12 else 'FAIL'}\n```\n{p12}\n```\n"
    )
    if not ok12:
        failures.append("phash-column-pruning")

    with open("PLANS.md", "w") as f:
        f.write("\n".join(report))
    print("audit:", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
