"""The crawl frontier + fetch scheduler — the heart of the engine.

One drain epoch re-expresses one `/crawlnews` request of the reference
(/root/reference/main.py:163-255) as a deterministic micro-batch dataflow:

    eligible  = frontier WHERE not_before <= epoch
    survivors = per-host politeness quota via SALTED two-phase window rank
    batch     = global top-K of survivors (priority desc, discovered_at asc,
                url_hash asc — fully deterministic tie-breaks)
    fetch     = simulated HTTP status + payload join + decode/validate in a
                single vectorized pandas UDF (Arrow batches, no per-row
                Python outside the UDF)
    commit    = store MERGE, seen append, frontier delete+insert, host_state
                MERGE, fetch_log append (per-bucket lineage) — one atomic
                checkpoint per epoch, resumable from any checkpoint.

Determinism contract (shared with tests/oracle.py): every scheduling choice
is a pure function of the committed state, so a parallel run at any
partitioning and the sequential oracle emit the *same crawl order* and end
with the *same seen set* — the correctness gates of BASELINE.json.

Politeness model: the reference's DomainRateLimiter enforces ≥2 s between
same-host hits inside a 60 s sliding window
(/root/reference/utils/article_extractor.py:77-108, scraping_config.py:8).
An epoch models one 60 s window, so a host may be fetched at most
floor(60/2)=30 times per epoch — same sustained per-host rate, expressed as
a per-epoch quota that a dataflow engine can enforce with a window rank
instead of a wall clock.

Skew: hosts are Zipfian, so Window.partitionBy(host) alone would put a hot
host's millions of frontier rows in one task. The quota rank therefore runs
in two phases — phase 1 ranks within (host, salt) where
salt = pmod(url_hash, S) and keeps only rank<=quota (a sound
overapproximation, <= S*quota rows per host survive), phase 2 ranks those
few survivors exactly per host. Identical result, bounded task size.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import codecs, datagen
from ..tablelib import Catalog
from ..urlnorm import with_url_identity
from .seenfilter import BLOOM_DDL, SeenBloom

FRONTIER_DDL = (
    "url string, canonical_url string, host string, url_hash long, host_hash long, "
    "bucket int, priority double, discovered_at timestamp, category string, "
    "language string, retry_count int, not_before int"
)
SEEN_DDL = "url_hash long, bucket int"
STORE_DDL = (
    "url_hash long, bucket int, host string, image_id string, caption string, "
    "phash long, w int, h int, fmt string, psnr double, first_epoch int, last_epoch int"
)
HOST_STATE_DDL = (
    "host string, host_hash long, bucket int, last_epoch int, fetch_count long, "
    "robots_allowed boolean"
)
FETCH_LOG_DDL = (
    "epoch int, bucket int, n_fetched long, n_cached long, n_stored long, "
    "n_rejected long, n_invalid long, n_retry long, n_dead long, "
    "n_discovered long, n_new_frontier long"
)  # PER-BUCKET; n_fetched counts scheduled contacts, n_cached of those were
# served from the store without HTTP/decode (cache-aside path)
# crawl_order persists the ranking *keys* (plus host, so politeness can be
# audited offline); seq is derived at read time (crawl_order_with_seq) so
# the hot loop never runs a single-task global row_number over the batch
ORDER_DDL = (
    "epoch int, url_hash long, bucket int, host string, "
    "priority double, discovered_at timestamp"
)

def _epoch_discovery_ts(epoch: int):
    """discovered_at stamped on URLs found during ``epoch`` (deterministic)."""
    import datetime as _dt

    return datagen.EPOCH + _dt.timedelta(
        seconds=(epoch + 1) * datagen.POLITENESS["batch_interval_s"]
    )


def rank_keys():
    """The crawl priority order with fully deterministic tie-breaks."""
    return [
        F.col("priority").desc(),
        F.col("discovered_at").asc(),
        F.col("url_hash").asc(),
    ]


@dataclass
class CrawlConfig:
    seed: int = 42
    n_hosts: int = 100
    n_payload: int = 1000
    n_seed_urls: int = 1000      # seed-list size (link expansion references it)
    bucket_count: int = 128      # >= 4 x max cores: N->4N keeps >=1 bucket/core
    batch_size: int = 2000       # global fetches per epoch
    host_quota: int = field(default_factory=datagen.host_quota)  # 30/epoch
    salt_buckets: int = 8        # S for the two-phase skew-safe host rank
    salt_min_rows: int = 100_000  # skip phase 1 below this frontier size
    max_retries: int = 3
    expand: bool = True          # full-coverage link expansion on/off
    min_caption_len: int = 1000  # crawl admission filter (main.py:183-184)
    cache_aside: bool = True     # skip fetch+decode for already-stored URLs
    parallel_commit: bool = True  # overlap the 6 independent table commits
    # above this batch size the epoch switches to the cluster-scale shape:
    # no TakeOrderedAndProject driver merge in select_batch and no broadcast
    # of the batch into the payload join (VERDICT r01 perf #2)
    distributed_batch_threshold: int = 500_000
    use_bloom: bool = True       # bloom prefilter in front of the seen anti-join
    # zone-map pruning of the per-epoch frontier scan via manifest stats
    # (batch-identical by construction; see _frontier_scan_buckets)
    prune_frontier_scan: bool = True


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cfg: CrawlConfig | None = None,
        catalog: Catalog | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        # storage backend seam: any Catalog implementing the tablelib
        # surface works — the parquet+manifest twin (default) or
        # iceberg_backend.IcebergCatalog on a cluster with the runtime jar
        self.catalog = catalog if catalog is not None else Catalog(root)
        # not_before/priority zone maps ride the manifest so select_batch
        # can skip buckets that cannot contribute to this epoch's batch
        self.frontier = self.catalog.table(
            "frontier", FRONTIER_DDL, stats_cols=["not_before", "priority"]
        )
        self.seen = self.catalog.table("seen", SEEN_DDL)
        self.store = self.catalog.table("store", STORE_DDL)
        # host_state/lineage tables are small: no bucket dirs, no
        # shuffle-per-commit
        self.host_state = self.catalog.table("host_state", HOST_STATE_DDL, partitioned=False)
        self.fetch_log = self.catalog.table("fetch_log", FETCH_LOG_DDL, partitioned=False)
        self.crawl_order = self.catalog.table("crawl_order", ORDER_DDL, partitioned=False)
        self.seen_bloom = SeenBloom(
            self.catalog.table("seen_bloom", BLOOM_DDL, partitioned=False)
        )
        # url_hashes re-queued for force-refresh and not yet drained — the
        # ONLY keys that can produce store cache-hits (seen-set invariant),
        # so the cache-aside split is bounded by this small table and
        # disappears entirely once it empties, instead of scanning the
        # store every epoch forever after one requeue
        self.requeue_pending = self.catalog.table(
            "requeue_pending", SEEN_DDL, partitioned=False
        )
        self._payload: DataFrame | None = None
        self._frontier_est: int | None = None  # driver-side size estimate
        # driver-side UPPER bounds on table sizes, used only to decide
        # packed (single-file) commits for small deltas/tables; None means
        # unknown (resume on an existing root) and disables packing there
        self._seen_rows_est: int | None = None
        self._store_rows_bound: int | None = None
        # buckets whose seen-set grew since their bloom was last rebuilt;
        # probed via the exact join until the next amortized rebuild.
        # Mutated by the epoch thread, the deferred bloom-maintenance thread
        # (_bloom_maintain) and streaming ingest — always under _bloom_lock,
        # and _checkpoint reads (bloom pointer, dirty set) under the same
        # lock so every recorded pair is conservative-consistent
        self._bloom_dirty: set[int] = set()
        # per-bucket generation of the LATEST dirty mark (ADVICE r06 high):
        # every marker bumps the generation under _bloom_lock; a clear
        # removes a bucket only while its generation matches the clearer's
        # token, so a concurrent mark (streaming ingest, resize fallback)
        # always survives — add_keys can never wipe a mark it doesn't own
        self._bloom_mark_gen: dict[int, int] = {}
        self._bloom_gen_counter = 0
        import threading as _threading

        self._bloom_lock = _threading.Lock()
        # deferred bloom maintenance: epoch E's add_keys/rebuild runs on this
        # background thread DURING epoch E+1's fetch phase (it is only needed
        # by E+1's split_new, which awaits it) — taking the single largest
        # commit-tail item (measured 11.6-13.7 s at the 4x4-core scaling leg)
        # off the epoch's critical path. Until the job lands, its buckets are
        # bloom-dirty, so probes route through the exact join: a crash, a
        # rollback, or any interleaving degrades to the exact path, never to
        # a false negative.
        self._bloom_future = None
        self._bloom_tmp: DataFrame | None = None  # cached delta the job reads
        self._bloom_exec = None  # lazily-created single worker
        self._epoch_tmp: DataFrame | None = None  # large-path survivors cache

    # ------------------------------------------------------------ payload

    def payload_df(self) -> DataFrame:
        """The image+caption table, with its row index for pmod addressing."""
        if self._payload is None:
            pdf = datagen.gen_payload_spark(self.spark, self.cfg.n_payload, self.cfg.seed)
            self._payload = pdf.withColumn(
                "payload_idx", F.regexp_extract("image_id", r"(\d+)", 1).cast("long")
            ).cache()
        return self._payload

    def set_payload(self, df: DataFrame) -> None:
        self._payload = df

    # ---------------------------------------------------------- bootstrap

    def _blocklist_df(self) -> DataFrame:
        """The static excluded-domain list (reference url_utils.py:18-34) as
        a tiny indexed broadcast dim — O(8) rows regardless of n_hosts (a
        real blocklist is a bounded config file, the one fixture that may
        legitimately ship from the driver). ``bi`` is the pick index for
        expand_jvm's blocked-child draw."""
        if getattr(self, "_blocklist", None) is None:
            blocked = datagen.blocklist_hosts(self.cfg.seed, self.cfg.n_hosts)
            self._blocklist = self.spark.createDataFrame(
                list(enumerate(blocked)), "bi int, bhost string"
            ).cache()
        return self._blocklist

    def _gated_hosts_df(self) -> DataFrame:
        """Hosts a crawler must never enqueue: the static excluded-domain
        list (reference url_utils.py:18-34) plus robots.txt-disallowed hosts
        (verdict resolved deterministically at first contact, see
        datagen.robots_denied_rank). Derived DISTRIBUTED — the denied set is
        a JVM expression over spark.range, never a driver list, so the dim
        scales to the 10^8-host regime (~10^7 rows there: the admission
        anti-join is left unhinted so AQE broadcasts it while small and
        shuffle-joins it when it isn't). At cluster scale this is the
        per-host robots cache. Memoized: (seed, n_hosts) are fixed."""
        if getattr(self, "_gated_hosts", None) is None:
            cfg = self.cfg
            denied = (
                self.spark.range(1, cfg.n_hosts + 1)
                .select(F.col("id").cast("int").alias("rank"))
                .filter(datagen.robots_denied_col(F.col("rank"), cfg.seed))
                .select(datagen.host_name_col(F.col("rank")).alias("host"))
            )
            bl = self._blocklist_df().select(F.col("bhost").alias("host"))
            self._gated_hosts = denied.unionByName(bl).distinct().cache()
        return self._gated_hosts

    def _gated_dim(self) -> DataFrame:
        """The gated-host dim for admission anti-joins, broadcast-hinted
        while PROVABLY small (~n_hosts/10 rows, known driver-side from the
        config — no size estimation needed). Beyond ~2e6 hosts the dim
        outgrows a sane broadcast and the unhinted plan (AQE broadcast or
        shuffle join on host against the robots cache) is the right one."""
        g = self._gated_hosts_df()
        return F.broadcast(g) if self.cfg.n_hosts <= 2_000_000 else g

    def bootstrap(self, seeds: DataFrame) -> None:
        """Ingest the seed list: canonicalize, blocklist+robots gate,
        first-wins dedup.

        Reference analog: seen_urls seeding + excluded-domain gate
        (google_news_crawler.py:269, main.py:200-203). First occurrence of a
        canonical URL wins (earliest discovered_at, url tie-break), matching
        the reference's set-guard insertion order. Also seeds host_state
        with the per-host robots verdict so the gate survives resume.
        """
        cfg = self.cfg
        s = with_url_identity(seeds, "url", cfg.bucket_count)
        s = s.join(self._gated_dim(), on="host", how="left_anti")
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
        # the seed list size bounds both writes (dedup+gate only shrink it):
        # a small bootstrap packs to one file instead of one per bucket
        fid = self.frontier.overwrite(
            s, {"rows": "bootstrap"}, pack_rows=cfg.n_seed_urls
        )
        sid = self.seen.overwrite(
            s.select("url_hash", "bucket"), pack_rows=cfg.n_seed_urls
        )
        self._seen_rows_est = cfg.n_seed_urls  # upper bound, see seen_task
        self._store_rows_bound = 0  # fresh root: store starts empty
        # persist per-host robots verdicts (host_state is the robots cache).
        # Fully DISTRIBUTED: host universe from spark.range + the JVM
        # host-name expression, verdicts from the JVM robots_denied_col
        # twin — NOTHING host-shaped ships from the driver (the only
        # createDataFrame is the O(8) blocklist config dim), so this
        # scales to the 10^8-host regime.
        bl = self._blocklist_df().select(F.col("bhost").alias("host"))
        hosts = (
            self.spark.range(1, cfg.n_hosts + 1)
            .select(
                F.col("id").cast("int").alias("rank"),
                datagen.host_name_col(F.col("id").cast("int")).alias("host"),
            )
            # statically excluded hosts are never contacted at all
            .join(F.broadcast(bl), on="host", how="left_anti")
            .select(
                "host",
                F.xxhash64("host").alias("host_hash"),
                F.pmod(F.xxhash64("host"), F.lit(cfg.bucket_count))
                .cast("int")
                .alias("bucket"),
                F.lit(-1).alias("last_epoch"),
                F.lit(0).cast("long").alias("fetch_count"),
                (~datagen.robots_denied_col(F.col("rank"), cfg.seed)).alias(
                    "robots_allowed"
                ),
            )
        )
        self.host_state.overwrite(
            hosts, {"rows": "robots_bootstrap"}, pack_rows=cfg.n_hosts
        )
        # warm the expansion's one-off config dims here with the other
        # admission dims (robots cache above, blocklist): they are pure
        # functions of the config, every epoch needs them, and building
        # them lazily put a ~2-3 s one-time dim build inside the first
        # epoch's expand phase instead of the bootstrap it belongs to
        if self.cfg.expand:
            self._seed_dim_gated_df().count()
            self._permille_df().count()
        bloom_id = (
            self.seen_bloom.rebuild_buckets(
                self.spark, self.seen, list(range(cfg.bucket_count))
            )
            if cfg.use_bloom
            else self.seen_bloom.table.current_snapshot_id()
        )
        self._checkpoint(
            -1,
            {
                "frontier": fid,
                "seen": sid,
                "seen_bloom": bloom_id,
                "store": self.store.current_snapshot_id(),
                "host_state": self.host_state.current_snapshot_id(),
                "fetch_log": self.fetch_log.current_snapshot_id(),
                "crawl_order": self.crawl_order.current_snapshot_id(),
                "requeue_pending": self.requeue_pending.current_snapshot_id(),
            },
        )

    def _checkpoint(self, epoch: int, snapshots: dict) -> None:
        """Every checkpoint carries the bloom-dirty set: a resume must know
        which blooms are stale, or a bloom false negative after restart
        would re-admit a seen URL (ADVICE r01: the empty-batch checkpoint
        used to drop it).

        The (bloom snapshot id, dirty set) pair is read together under
        _bloom_lock: the deferred maintenance job flips the bloom pointer
        strictly BEFORE it clears the matching dirty marks (also under the
        lock), so any pair this records is either exact or marks-superset —
        a resume can only fall back to the exact join, never skip it."""
        with self._bloom_lock:
            snapshots = {
                **snapshots,
                "seen_bloom": self.seen_bloom.table.current_snapshot_id(),
            }
            dirty = sorted(self._bloom_dirty)
        self.catalog.checkpoint(epoch, snapshots, extra={"bloom_dirty": dirty})

    # ------------------------------------------- deferred bloom maintenance

    def _mark_bloom_dirty(
        self, buckets, own_only: bool = False
    ) -> dict[int, int]:
        """Mark ``buckets`` bloom-stale; return a clear token {bucket: gen}.

        A later :meth:`_clear_bloom_dirty` with this token removes a bucket
        only while its generation is unchanged — i.e. only if no OTHER
        marker (streaming ingest, a resize fallback) touched it in between.
        ``own_only=True`` (the epoch-delta path) additionally withholds the
        token for buckets that were ALREADY dirty before this call: their
        staleness predates this marker's keys, so only the rebuild pass
        (which re-reads seen) may clear them.
        """
        with self._bloom_lock:
            self._bloom_gen_counter += 1
            g = self._bloom_gen_counter
            token: dict[int, int] = {}
            for b in buckets:
                fresh = b not in self._bloom_dirty
                self._bloom_dirty.add(b)
                self._bloom_mark_gen[b] = g
                if fresh or not own_only:
                    token[b] = g
            return token

    def _clear_bloom_dirty(self, token: dict[int, int]) -> None:
        """Clear marks the caller owns (generation-checked; see above)."""
        with self._bloom_lock:
            for b, g in token.items():
                if b in self._bloom_dirty and self._bloom_mark_gen.get(b) == g:
                    self._bloom_dirty.discard(b)

    def _submit_bloom(
        self,
        delta: DataFrame | None,
        counts: dict[int, int],
        own_token: dict[int, int] | None = None,
    ) -> None:
        """Launch this epoch's bloom add_keys (+ any pending rebuilds) on the
        background worker. Caller must have already marked ``counts``'
        buckets dirty and checkpointed; ``delta`` must be a cached DataFrame
        of (url_hash, bucket) this object may hold until _await_bloom."""
        if not self.cfg.use_bloom:
            return
        with self._bloom_lock:
            any_dirty = bool(self._bloom_dirty)
        if delta is None and not any_dirty:
            return
        if self._bloom_exec is None:
            from concurrent.futures import ThreadPoolExecutor

            self._bloom_exec = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="bloom-maintain"
            )
        self._bloom_tmp = delta
        self._bloom_future = self._bloom_exec.submit(
            self._bloom_maintain, delta, counts, own_token
        )

    def _bloom_maintain(
        self,
        delta: DataFrame | None,
        counts: dict[int, int],
        own_token: dict[int, int] | None = None,
    ) -> None:
        """Background half of the seen/bloom commit: OR the epoch delta into
        the per-bucket bitmaps, then rebuild whatever is still dirty (resize
        fallbacks, stream-ingest buckets, resume carryover). Runs between
        epoch E's checkpoint and epoch E+1's split_new — overlapped with
        E+1's select+fetch. Dirty marks are cleared only AFTER the table
        commit that makes them fresh, so every interleaving with _checkpoint
        or a concurrent reader is conservative."""
        import time as _time

        spark = self.spark
        profile = bool(__import__("os").environ.get("CRAWL_PROFILE"))
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "bloom-maintain")
        try:
            if delta is not None and counts:
                t0 = _time.time()
                resize = self.seen_bloom.add_keys(
                    spark, delta.select("url_hash", "bucket"), counts=counts
                )
                # ownership-aware clear (ADVICE r06 high): only the marks
                # this epoch's delta-marking created may be cleared here —
                # a stream-ingest mark on the same bucket carries a newer
                # generation (or predates the epoch marking, in which case
                # no token was issued) and survives to the rebuild pass,
                # whose seen rescan is what actually covers its keys.
                rs = set(resize)
                self._clear_bloom_dirty(
                    {b: g for b, g in (own_token or {}).items() if b not in rs}
                )
                if profile:
                    print(
                        f"[profile] deferred bloom add_keys: "
                        f"{_time.time() - t0:.2f}s",
                        flush=True,
                    )
            with self._bloom_lock:
                # snapshot marks WITH their generations: the rebuild below
                # re-reads seen, so it covers every mark set before this
                # point (markers commit their seen append before marking);
                # a mark arriving DURING the rebuild bumps the generation
                # and the token-checked clear leaves it dirty
                token = {
                    b: self._bloom_mark_gen.get(b, 0) for b in self._bloom_dirty
                }
            dirty = sorted(token)
            if dirty:
                t0 = _time.time()
                self.seen_bloom.rebuild_buckets(spark, self.seen, dirty)
                self._clear_bloom_dirty(token)
                if profile:
                    print(
                        f"[profile] deferred bloom rebuild({len(dirty)}): "
                        f"{_time.time() - t0:.2f}s",
                        flush=True,
                    )
        finally:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    def _await_bloom(self) -> None:
        """Land the in-flight bloom-maintenance job (if any). Called before
        anything reads the bloom (split_new), before an epoch's 'done'
        checkpoint, and at the end of drain(); re-raises the job's error."""
        fut, self._bloom_future = self._bloom_future, None
        tmp, self._bloom_tmp = self._bloom_tmp, None
        try:
            if fut is not None:
                fut.result()
        finally:
            if tmp is not None:
                tmp.unpersist()

    # ------------------------------------------------------------- requeue

    def requeue(self, urls: DataFrame, not_before: int = 0) -> int:
        """Force-refresh: re-insert already-seen URLs into the frontier.

        Reference analog: a repeat /crawlnews request for URLs the store
        already holds — the extractor then serves them from its DB cache
        instead of re-fetching (/root/reference/utils/article_extractor.py:
        412-479, cache check :419-433). ``urls`` needs (url, priority,
        discovered_at, category, language). Rows already pending in the
        frontier are skipped (their scheduled fetch stands); the seen set is
        unchanged (these URLs are seen by definition). Returns #inserted.
        """
        cfg = self.cfg
        s = with_url_identity(urls, "url", cfg.bucket_count)
        s = s.join(self._gated_dim(), on="host", how="left_anti")
        w = Window.partitionBy("url_hash").orderBy(
            F.col("discovered_at").asc(), F.col("url").asc()
        )
        s = (
            s.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("retry_count", F.lit(0))
            .withColumn("not_before", F.lit(not_before))
            .select(*[c.strip().split(" ")[0] for c in FRONTIER_DDL.split(",")])
        )
        if not self.frontier.is_empty():
            pending = self.frontier.read(self.spark).select("url_hash")
            s = s.join(pending, on="url_hash", how="left_anti")
        s = s.cache()
        n = s.count()
        if n:
            self.frontier.append(s, {"op": "requeue"}, pack_rows=int(n))
            # record the re-queued keys: they are the only keys that can be
            # cache hits, and the epoch's split is bounded by this table
            self.requeue_pending.append(
                s.select("url_hash", "bucket"), pack_rows=int(n)
            )
            if self._frontier_est is not None:
                self._frontier_est += n
            ck = self.catalog.last_checkpoint()
            if ck:  # make the requeue durable for resume
                snaps = dict(ck["snapshots"])
                snaps["frontier"] = self.frontier.current_snapshot_id()
                snaps["requeue_pending"] = self.requeue_pending.current_snapshot_id()
                self._checkpoint(ck["epoch"], snaps)
        s.unpersist()
        return int(n)

    # ------------------------------------------------------------ ranking

    def _frontier_scan_buckets(self, epoch: int) -> list[int] | None:
        """Manifest zone-map pruning for select_batch: the buckets worth
        scanning this epoch, or None for "scan everything" (stats absent).

        Two sound rules — the pruned scan is batch-IDENTICAL by
        construction (gated by test_frontier_scan_pruning_batch_identical):

        1. A bucket whose min(not_before) exceeds the epoch holds no
           eligible row (the scan filter would drop every row anyway).
        2. Bucket B cannot reach the batch when the buckets that strictly
           dominate it (their min priority > B's max priority, so every
           row outranks every row of B under rank_keys regardless of
           tie-breaks) are guaranteed to supply >= batch_size
           quota-surviving rows. Each dominating bucket C is credited
           min(live_rows(C), host_quota) survivors — the per-host quota
           keeps at least that many of C's rows even if one host owns the
           whole bucket; live_rows = data - tombstones is itself a lower
           bound under merge-on-read.

        At the 10^10-row design point this is the difference between a
        full-frontier window shuffle per epoch and scanning only the few
        buckets whose zone maps say they can matter (VERDICT r03 wrong #2).
        """
        import bisect

        stats = self.frontier.bucket_stats()
        if stats is None:
            return None
        cfg = self.cfg
        elig: dict[int, dict] = {}
        for b, s in stats.items():
            if s["n"] == 0 or not s["lo"]:
                continue  # no rows at all: prune
            if s["lo"]["not_before"] > epoch:
                continue  # rule 1
            elig[b] = s
        if not elig:
            return []
        # rule 2: prefix-sum credits over buckets ordered by min-priority
        # desc, then for each bucket count the strictly-dominating prefix
        order = sorted(elig.values(), key=lambda s: -s["lo"]["priority"])
        neg_mins = [-s["lo"]["priority"] for s in order]
        credit = [min(max(s["n"] - s["tomb"], 0), cfg.host_quota) for s in order]
        prefix = [0]
        for c in credit:
            prefix.append(prefix[-1] + c)
        kept = []
        for b, s in elig.items():
            dominating = bisect.bisect_left(neg_mins, -s["hi"]["priority"])
            if prefix[dominating] < cfg.batch_size:
                kept.append(b)
        return sorted(kept)

    def select_batch(self, epoch: int) -> DataFrame:
        """Politeness-gated, priority-ranked fetch batch for this epoch."""
        cfg = self.cfg
        if self.frontier.is_empty():
            return self.spark.createDataFrame([], FRONTIER_DDL)
        scan = self._frontier_scan_buckets(epoch) if cfg.prune_frontier_scan else None
        self._last_scan_buckets = scan  # observability + test hook
        if scan == []:
            return self.spark.createDataFrame([], FRONTIER_DDL)
        eligible = self.frontier.read(self.spark, buckets=scan).filter(
            F.col("not_before") <= epoch
        )

        if self._frontier_est is None:
            stats = self.frontier.bucket_stats()
            self._frontier_est = (
                sum(max(s["n"] - s["tomb"], 0) for s in stats.values())
                if stats is not None
                else self.frontier.read(self.spark).count()
            )

        # Phase 1: skew-safe overapproximation within (host, salt) — worth
        # its extra shuffle only once the frontier is big enough for a hot
        # host to dominate a task (semantics identical either way; phase 2
        # is the exact quota).
        if cfg.salt_buckets > 1 and self._frontier_est >= cfg.salt_min_rows:
            salt = F.pmod(F.col("url_hash"), F.lit(cfg.salt_buckets))
            w1 = Window.partitionBy("host", salt).orderBy(*rank_keys())
            cand = (
                eligible.withColumn("_lr", F.row_number().over(w1))
                .filter(F.col("_lr") <= cfg.host_quota)
                .drop("_lr")
            )
        else:
            cand = eligible
        # Phase 2: exact per-host quota on the <= S*quota survivors.
        w2 = Window.partitionBy("host").orderBy(*rank_keys())
        survivors = (
            cand.withColumn("_hr", F.row_number().over(w2))
            .filter(F.col("_hr") <= cfg.host_quota)
            .drop("_hr")
        )
        # Global top-K. Small batches: TakeOrderedAndProject (distributed
        # per-partition top-K + driver merge of K rows) — fastest, but the
        # driver materializes the batch. Large batches (multi-million-row
        # epochs at the 10^10-frontier regime): quantile-prefiltered exact
        # rank that never touches the driver and keeps the batch a
        # distributed DataFrame.
        if cfg.batch_size <= cfg.distributed_batch_threshold:
            return survivors.orderBy(*rank_keys()).limit(cfg.batch_size)
        return self._topk_distributed(survivors, cfg.batch_size)

    def _topk_distributed(self, survivors: DataFrame, k: int) -> DataFrame:
        """Exact global top-K with no driver merge and bounded task input.

        1. approxQuantile finds a priority cutoff t with slack such that
           ~1.5k rows have priority >= t (one pass over survivors);
        2. the >=t filter reduces the rank input from |survivors| to O(k)
           WITHOUT changing the answer (the true top-k all have
           priority >= t because >=k rows do);
        3. an exact row_number over the filtered set picks the identical
           batch the small path would. The single-task window sees only the
           ~1.5k candidate rows — executor-side and bounded, never the
           10^10-row frontier; the result is immediately repartitioned by
           bucket for the downstream joins.

        When the cutoff degenerates (priority ties keep > 4k rows), step 3
        switches to a bounded tournament rank — see the inline comment.
        """
        survivors = survivors.cache()
        self._epoch_tmp = survivors  # unpersisted by run_epoch after the batch materializes
        total = survivors.count()
        if total <= k:
            self._last_topk_path = "all"
            return survivors.repartition(F.col("bucket"))
        frac = min(1.0, (1.5 * k) / total)
        t = survivors.stat.approxQuantile("priority", [max(0.0, 1.0 - frac)], 0.001)[0]
        cand = survivors.filter(F.col("priority") >= t)
        n_cand = cand.count()
        if n_cand < k:  # quantile undershot: any superset stays exact
            cand, n_cand = survivors, total
        if n_cand > 4 * k:
            # Tie-degenerate cutoff (VERDICT r02 perf #2 / ADVICE r02): with
            # heavily tied or constant priorities the >=t filter retains
            # ~|survivors| rows and the single-task window below would see
            # the whole frontier. Tournament top-K instead: cap per bucket
            # (url_hash-uniform, no skew), then fold groups with fan-in 4 —
            # every task sorts <= max(per-bucket candidates, 4k) rows, and
            # each round's per-group top-K provably contains the global
            # top-K (rank_keys is a total order: url_hash is unique in the
            # deduped frontier).
            self._last_topk_path = "tree"
            fan = 4
            n_groups = self.cfg.bucket_count
            cand = cand.withColumn("_g", F.col("bucket").cast("int"))
            while True:
                wg = Window.partitionBy("_g").orderBy(*rank_keys())
                cand = (
                    cand.withColumn("_gr", F.row_number().over(wg))
                    .filter(F.col("_gr") <= k)
                    .drop("_gr")
                )
                if n_groups == 1:
                    break
                n_groups = max(1, n_groups // fan)
                cand = cand.withColumn("_g", F.pmod(F.col("_g"), F.lit(n_groups)))
            return cand.drop("_g").repartition(F.col("bucket"))
        self._last_topk_path = "window"
        w = Window.orderBy(*rank_keys())
        return (
            cand.withColumn("_gr", F.row_number().over(w))
            .filter(F.col("_gr") <= k)
            .drop("_gr")
            .repartition(F.col("bucket"))
        )

    # -------------------------------------------------------------- fetch

    def _decode_validate_udf(self):
        """Scalar pandas UDF: decode+validate one Arrow batch of payloads.

        Checks per BASELINE.json input_hint: decoded-pixel allclose vs the
        regenerated source (exact for lossless ppm/bmp; PSNR>=40 dB for the
        lossy qpng), dims match, phash match. Never throws — failures land
        in the `reason` field (error contract of the reference extractor,
        article_extractor.py:361-410).

        A *scalar* UDF (not mapInPandas) so only its input columns — bytes
        and small metadata — cross the Arrow boundary; captions and frontier
        columns stay JVM-side.
        """
        seed = self.cfg.seed

        @F.pandas_udf("struct<valid:boolean, reason:string, psnr:double>")
        def decode_udf(
            data: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series,
            phash: pd.Series, payload_idx: pd.Series,
        ) -> pd.DataFrame:
            n = len(data)
            valid = np.zeros(n, dtype=bool)
            reason = np.full(n, "", dtype=object)
            psnr_v = np.full(n, float("inf"))
            for i in range(n):
                try:
                    arr = codecs.decode(data.iat[i], fmt.iat[i])
                except Exception as e:  # decode failure -> row error
                    reason[i] = f"decode_error:{type(e).__name__}"
                    continue
                ah, aw = arr.shape[:2]
                if aw != w.iat[i] or ah != h.iat[i]:
                    reason[i] = "dim_mismatch"
                    continue
                expected = datagen.expected_pixels(int(payload_idx.iat[i]), seed)
                if fmt.iat[i] == "qpng":
                    p = codecs.psnr(expected, arr)
                    psnr_v[i] = p
                    if p < 40.0:
                        reason[i] = "psnr_below_40"
                        continue
                elif not np.array_equal(expected, arr):
                    reason[i] = "pixel_mismatch"
                    continue
                if codecs.average_phash(arr) != phash.iat[i]:
                    reason[i] = "phash_mismatch"
                    continue
                valid[i] = True
            return pd.DataFrame({"valid": valid, "reason": reason, "psnr": psnr_v})

        return decode_udf

    # ----------------------------------------------------------- expansion

    def _seed_dim_df(self) -> DataFrame:
        if getattr(self, "_seed_dim", None) is None:
            self._seed_dim = datagen.seed_url_dim_spark(
                self.spark, self.cfg.n_seed_urls, self.cfg.seed, self.cfg.n_hosts
            ).cache()
        return self._seed_dim

    def _seed_dim_gated_df(self) -> DataFrame:
        """The seed-URL dim minus rows whose CANONICAL host is gated
        (blocklist or robots-denied) — the same predicate the admission
        anti-join applies, evaluated ONCE at dim-build time instead of over
        every epoch's raw expansion. The gate join moves from the epoch's
        biggest intermediate (O(links/epoch), a real shuffle once the robots
        cache outgrows broadcast at the 10^8-host regime) to a one-time
        O(seed-list) join, cached thereafter."""
        if getattr(self, "_seed_dim_gated", None) is None:
            d = with_url_identity(
                self._seed_dim_df().withColumn("url", F.col("seed_url")),
                "url", self.cfg.bucket_count,
            )
            self._seed_dim_gated = (
                d.join(self._gated_dim(), on="host", how="left_anti")
                .select("idx", "seed_url")
                .cache()
            )
        return self._seed_dim_gated

    def _permille_df(self) -> DataFrame:
        if getattr(self, "_permille", None) is None:
            self._permille = self.spark.createDataFrame(
                datagen.permille_rank_rows(self.cfg.n_hosts), "p int, rank int"
            ).cache()
        return self._permille

    def expand_jvm(self, ok_hashes: DataFrame, pregated: bool = False) -> DataFrame:
        """Link expansion entirely JVM-side — the twin of
        datagen.expand_links (the Python version drives the oracle only).

        Every draw is a chained ``xxhash64(lit(k), col)`` expression; the
        two non-expressible lookups (numpy-RNG seed URLs, the Zipf host
        rank) become dim-table joins: seed_url_dim (the seed list — a real
        table at 10^10 scale, auto-broadcast when small) and a 10k-row
        permille→rank broadcast. No Python touches the hot path; the only
        ArrowEvalPython in the epoch's QUERY path is the decode UDF (the
        bloom commit task additionally runs seenfilter._dense_scatter, a
        vectorized per-bucket bitmap scatter in the maintenance path).

        ``pregated=True`` (the epoch path) FUSES the blocklist+robots
        admission gate into generation instead of anti-joining the raw
        expansion afterwards: blocked children are never emitted (they are
        gated by construction), fresh children carry their host rank so the
        robots verdict is the same inline codegen predicate bootstrap uses
        (datagen.robots_denied_col) plus an 8-literal blocklist-rank isin,
        and the seed dim is pre-filtered once by canonical host
        (_seed_dim_gated_df). Equivalent to generate-then-gate row for row
        (tests/test_crawl.py::test_pregated_expansion_equals_gate_after);
        at the 10^8-host regime it removes the epoch's only admission join
        over the raw expansion — the largest intermediate in the epoch.
        """
        cfg = self.cfg
        e = ok_hashes.withColumn(
            "h0",
            F.xxhash64(F.lit(datagen._expand_k0(cfg.seed)).cast("long"), F.col("url_hash")),
        )
        e = e.withColumn("n_out", F.pmod(F.col("h0").bitwiseAND(F.lit(7)), F.lit(6)))
        e = e.withColumn(
            "k", F.explode(F.sequence(F.lit(0), F.lit(datagen.MAX_CHILDREN - 1)))
        ).filter(F.col("k") < F.col("n_out"))
        e = e.withColumn(
            "hk",
            F.xxhash64((F.col("k") + 1000).cast("long"), F.col("h0")).bitwiseAND(
                F.lit(0x7FFFFFFFFFFFFFFF)
            ),
        ).withColumn("sel", F.pmod(F.col("hk"), F.lit(100)))
        n_blocked = len(datagen.blocklist_hosts(cfg.seed, cfg.n_hosts))
        seed_cond = (
            (F.col("sel") < 30) if cfg.n_seed_urls > 0 else F.lit(False)
        )
        seed_part = (
            e.filter(seed_cond)
            .withColumn("idx", F.pmod(F.col("hk"), F.lit(cfg.n_seed_urls or 1)))
            .join(
                self._seed_dim_gated_df() if pregated else self._seed_dim_df(),
                on="idx",
            )
            .select(F.col("seed_url").alias("url"))
        )
        fresh = e.filter(F.col("sel") >= 32).withColumn(
            "p", F.pmod(F.col("hk"), F.lit(10_000)).cast("int")
        ).join(F.broadcast(self._permille_df()), on="p")
        if pregated:
            # inline admission: robots verdict as a codegen predicate over
            # the host rank + the bounded-config blocklist ranks as literals
            fresh = fresh.filter(
                ~datagen.robots_denied_col(F.col("rank"), cfg.seed)
                & ~F.col("rank").isin(datagen.blocklist_ranks(cfg.seed, cfg.n_hosts))
            )
        fresh_part = fresh.select(
            F.concat(
                F.lit("https://"),
                datagen.host_name_col(F.col("rank")),
                F.lit("/d/"),
                F.pmod(F.col("hk"), F.lit(1_000_000_007)).cast("string"),
            ).alias("url")
        )
        if pregated:
            # blocked children are gated by construction — never generated
            return seed_part.unionByName(fresh_part)
        # blocked-child pick: broadcast dim join (like _permille_df) rather
        # than a plan-embedded literal array
        blocked_part = (
            e.filter(~seed_cond & (F.col("sel") < 32))
            .withColumn("bi", F.pmod(F.col("hk"), F.lit(n_blocked)).cast("int"))
            .join(F.broadcast(self._blocklist_df()), on="bi")
            .select(
                F.concat(
                    F.lit("https://"),
                    F.col("bhost"),
                    F.lit("/x/"),
                    F.pmod(F.col("hk"), F.lit(10_000)).cast("string"),
                ).alias("url")
            )
        )
        return seed_part.unionByName(blocked_part).unionByName(fresh_part)

    RESULT_COLS = [
        "url_hash", "bucket", "host", "status", "retry_count",
        "image_id", "caption", "phash", "w", "h", "fmt",
        "valid", "reason", "psnr", "caption_len",
    ]

    def fetch_batch(self, batch: DataFrame) -> DataFrame:
        """Simulated fetch: status from url_hash, payload by pmod address.

        Failed (non-200) fetches never enter the payload join or the decode
        UDF; their rows union straight through with an error reason.
        """
        cfg = self.cfg
        b = batch.withColumn(
            "status", datagen.fetch_status_col(F.col("url_hash"), cfg.seed)
        ).withColumn(
            "payload_idx", F.pmod(F.col("url_hash"), F.lit(cfg.n_payload)).cast("long")
        )
        # small batch: broadcast it so the payload scan joins without a
        # shuffle. Large (cluster-scale) batch: broadcasting the BATCH would
        # hit the 8 GB/driver wall, but a shuffle join is worse in a subtler
        # way — AQE coalesces the post-join stage by its shuffle-INPUT size
        # (payload + keys, ~MBs) while the join's real output expands by the
        # payload bytes attached per URL, so the decode stage collapses to a
        # handful of tasks (measured: 4-executor mult=8 leg fell to 60
        # URLs/s/core). Broadcast the payload dim instead: it is config-
        # bounded (n_payload rows — the synthetic stand-in for the fetch
        # response; a real deployment fetches bytes inside the UDF and has
        # no join here at all), and the join output then inherits the
        # batch's host-bucket partitioning, giving decode one task per
        # bucket exactly like the real fetch would.
        ok = b.filter(F.col("status") == 200)
        if cfg.batch_size <= cfg.distributed_batch_threshold:
            joined = self.payload_df().join(
                F.broadcast(ok), on="payload_idx", how="inner"
            )
        else:
            # Decode-stage balance: the batch arrives hash-partitioned on
            # bucket, but hashing ~bucket_count distinct values into
            # shuffle.partitions slots is Poisson-lumpy (at 16 cores /
            # 128 buckets some slots draw ~2x the rows of others), and the
            # decode wave runs at the pace of its fattest task — measured
            # as decode scaling 200 -> 121 URLs/s/core on the 1->4-executor
            # pair at mult=32. url_hash is uniform, so an explicit
            # fine-grained repartition makes every decode task the same
            # size. Pre-join rows are small (no payload bytes yet) so the
            # shuffle is cheap, and an explicit-N repartition is exempt
            # from AQE coalescing (the r3 collapse can't re-appear).
            n_parts = max(self.spark.sparkContext.defaultParallelism * 4, 64)
            joined = ok.repartition(n_parts, "url_hash").join(
                F.broadcast(self.payload_df()), on="payload_idx", how="inner"
            )
        decode_udf = self._decode_validate_udf()
        ok = joined.withColumn(
            "_v", decode_udf("bytes", "fmt", "w", "h", "phash", "payload_idx")
        ).select(
            "url_hash", "bucket", "host", "status", "retry_count",
            "image_id", "caption", "phash", "w", "h", "fmt",
            F.col("_v.valid").alias("valid"),
            F.col("_v.reason").alias("reason"),
            F.col("_v.psnr").alias("psnr"),
            F.length(F.coalesce(F.col("caption"), F.lit(""))).cast("int").alias("caption_len"),
        )
        failed = (
            b.filter(F.col("status") != 200)
            .select(
                "url_hash", "bucket", "host", "status", "retry_count",
                F.lit(None).cast("string").alias("image_id"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("int").alias("w"),
                F.lit(None).cast("int").alias("h"),
                F.lit(None).cast("string").alias("fmt"),
                F.lit(False).alias("valid"),
                F.concat(F.lit("http_"), F.col("status")).alias("reason"),
                F.lit(None).cast("double").alias("psnr"),
                F.lit(0).alias("caption_len"),
            )
        )
        return ok.unionByName(failed)

    # -------------------------------------------------------------- epoch

    def run_epoch(self, epoch: int) -> dict:
        import os
        import time as _time

        profile = bool(os.environ.get("CRAWL_PROFILE"))
        marks: list[tuple[str, float]] = []
        _t = _time.time()

        def mark(name: str) -> None:
            # always recorded (one clock read per phase): run_epoch exposes
            # the split via _last_epoch_marks so the bench can report which
            # phase a regression lives in; printing stays CRAWL_PROFILE-gated
            nonlocal _t
            now = _time.time()
            marks.append((name, round(now - _t, 2)))
            _t = now

        cfg = self.cfg
        spark = self.spark
        batch = self.select_batch(epoch).cache()
        n_batch = batch.count()
        if self._epoch_tmp is not None:
            self._epoch_tmp.unpersist()
            self._epoch_tmp = None
        mark("select_batch")
        if n_batch == 0:
            # nothing eligible this epoch; pending retries may unlock later.
            # The manifest row bound skips the full-frontier count unless it
            # reaches 0 — then the exact count confirms "done" (the bound is
            # a lower bound under merge-on-read, never an upper one).
            self._await_bloom()  # settle the deferred job before 'done'
            stats = self.frontier.bucket_stats()
            n_left = (
                sum(max(s["n"] - s["tomb"], 0) for s in stats.values())
                if stats is not None
                else None
            )
            if not n_left:
                n_left = 0 if self.frontier.is_empty() else self.frontier.read(spark).count()
            ck = self.catalog.last_checkpoint()
            self._checkpoint(epoch, ck["snapshots"] if ck else {})
            self._last_epoch_marks = marks
            return {"epoch": epoch, "fetched": 0, "done": n_left == 0}

        # cache-aside split (reference article_extractor.py:412-479): batch
        # URLs already in the store are served from it — no HTTP, no decode.
        # Possible only for re-queued keys (the seen-set invariant keeps
        # stored URLs out of the frontier otherwise), so the split is
        # bounded by the small requeue_pending table and costs nothing once
        # it drains — never a standing per-epoch store scan.
        hits: DataFrame | None = None
        touched_pend: DataFrame | None = None
        n_pend = 0
        cached_counts: dict[int, int] = {}
        fetch_input = batch
        if (
            cfg.cache_aside
            and not self.requeue_pending.is_empty()
            and not self.store.is_empty()
        ):
            pend = self.requeue_pending.read(spark).select("url_hash")
            touched_pend = batch.join(pend, on="url_hash", how="left_semi").cache()
            n_pend = touched_pend.count()
            if n_pend:
                store_keys = self.store.read(spark).select("url_hash")
                hits = touched_pend.join(
                    store_keys, on="url_hash", how="left_semi"
                ).cache()
                cached_counts = {
                    r["bucket"]: int(r["n"])
                    for r in hits.groupBy("bucket")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            if cached_counts:
                fetch_input = batch.join(
                    hits.select("url_hash"), on="url_hash", how="left_anti"
                )
            elif hits is not None:
                hits.unpersist()
                hits = None
        results = self.fetch_batch(fetch_input).cache()

        # per-bucket lineage metrics in ONE aggregation pass over results;
        # also materializes the results cache and hands every downstream
        # commit its touched-bucket list for free
        failed_c = F.col("status") != 200
        log_rows = (
            results.groupBy("bucket")
            .agg(
                F.count("*").alias("n_fetched"),
                F.sum(
                    (F.col("valid") & (F.col("caption_len") >= cfg.min_caption_len)).cast("long")
                ).alias("n_stored"),
                F.sum(
                    (F.col("valid") & (F.col("caption_len") < cfg.min_caption_len)).cast("long")
                ).alias("n_rejected"),
                F.sum(
                    (~F.col("valid") & (F.col("status") == 200)).cast("long")
                ).alias("n_invalid"),
                F.sum(
                    (failed_c & (F.col("retry_count") < cfg.max_retries)).cast("long")
                ).alias("n_retry"),
                F.sum(
                    (failed_c & (F.col("retry_count") >= cfg.max_retries)).cast("long")
                ).alias("n_dead"),
            )
            .collect()
        )
        mark("fetch+log_agg")
        # land the previous epoch's deferred bloom maintenance — it has been
        # running concurrently with this epoch's select+fetch (its result is
        # first needed by split_new below); on a healthy run this is a no-op
        # wait, the job is minutes done by the time fetch+decode finishes
        self._await_bloom()
        store_buckets = sorted(
            {r["bucket"] for r in log_rows if r["n_stored"] > 0} | set(cached_counts)
        )
        n_dead = sum(r["n_dead"] for r in log_rows)
        n_retry = sum(r["n_retry"] for r in log_rows)
        n_stored_total = sum(r["n_stored"] for r in log_rows)
        n_cached_total = sum(cached_counts.values())

        # --- store MERGE: valid + admission filter (caption >= 1000 chars);
        # first_epoch preserved for re-stored rows inside the merge itself
        # (upsert-update keeps created_at, main.py:214-227)
        stored = (
            results.filter(F.col("valid") & (F.col("caption_len") >= cfg.min_caption_len))
            .select(
                "url_hash", "bucket", "host", "image_id", "caption", "phash",
                "w", "h", "fmt", "psnr",
                F.lit(epoch).alias("first_epoch"),
                F.lit(epoch).alias("last_epoch"),
            )
        )
        if hits is not None and cached_counts:
            # cache hits: refresh last_epoch from the stored row — no decode
            refreshed = (
                self.store.read(spark)
                .join(hits.select("url_hash"), on="url_hash", how="left_semi")
                .withColumn("last_epoch", F.lit(epoch))
                .select(*stored.columns)
            )
            stored = stored.unionByName(refreshed)

        # The six per-epoch table commits write six DIFFERENT tables, so
        # their Spark jobs are independent; running them sequentially left
        # a flat ~8 s of commit latency per epoch that crushed N->4N scaling
        # (VERDICT r01 perf #1). They are submitted from worker threads —
        # Spark schedules concurrent jobs from one driver — with the only
        # true ordering kept: seen append before the bloom rebuild that
        # reads it, expansion before frontier/seen/log (their inputs).
        from concurrent.futures import ThreadPoolExecutor

        def store_task():
            # packed-commit bound on the rewrite output: every row already
            # in the touched buckets (<= the running stored total) plus
            # this epoch's stored delta; None (resume on an unknown root)
            # keeps the per-bucket layout
            bound = (
                self._store_rows_bound + n_stored_total + n_cached_total
                if self._store_rows_bound is not None
                else None
            )
            return self.store.merge_upsert(
                spark, stored, "url_hash",
                touched=store_buckets, preserve_cols=["first_epoch"],
                pack_rows=bound,
            )

        def host_task():
            host_delta = (
                batch.groupBy("host", "host_hash", "bucket")
                .agg(F.count("*").alias("_n"))
                .withColumn("last_epoch", F.lit(epoch))
            )
            if not self.host_state.is_empty():
                prev = self.host_state.read(spark).select(
                    "host", F.col("fetch_count").alias("_prev")
                )
                host_delta = (
                    host_delta.join(prev, on="host", how="left")
                    .withColumn(
                        "fetch_count", F.coalesce("_prev", F.lit(0)) + F.col("_n")
                    )
                    .drop("_prev", "_n")
                )
            else:
                host_delta = host_delta.withColumn(
                    "fetch_count", F.col("_n").cast("long")
                ).drop("_n")
            host_delta = host_delta.select(
                "host", "host_hash", "bucket", "last_epoch", "fetch_count",
                F.lit(True).alias("robots_allowed"),  # fetched => was admitted
            )
            return self.host_state.merge_upsert(
                spark, host_delta, "host", pack_rows=cfg.n_hosts
            )

        def order_task():
            return self.crawl_order.append(
                batch.select(
                    F.lit(epoch).alias("epoch"), "url_hash", "bucket", "host",
                    "priority", "discovered_at",
                ),
                pack_rows=int(n_batch),
            )

        pool = ThreadPoolExecutor(max_workers=8) if cfg.parallel_commit else None
        f_tomb = None
        try:
            if pool:
                _t0_commit = _time.time()

                def _timed_early(name, fn):
                    def run():
                        t0 = _time.time()
                        # each commit job gets its own scheduler pool so FAIR
                        # mode (SPARK_GRAFT_SCHEDULER=FAIR) shares task slots
                        # across the concurrent commits instead of FIFO-queueing
                        # them behind the first-submitted job; a pure no-op
                        # under the default FIFO scheduler
                        spark.sparkContext.setLocalProperty(
                            "spark.scheduler.pool", f"commit-{name}"
                        )
                        try:
                            return fn()
                        finally:
                            spark.sparkContext.setLocalProperty(
                                "spark.scheduler.pool", None
                            )
                            if profile:
                                print(
                                    f"[profile] commit task {name}: "
                                    f"{_time.time() - t0:.2f}s "
                                    f"(t+{t0 - _t0_commit:.2f})",
                                    flush=True,
                                )

                    return run

                f_store = pool.submit(_timed_early("store", store_task))
                f_host = pool.submit(_timed_early("host", host_task))
                f_order = pool.submit(_timed_early("order", order_task))
                # the frontier MOR tombstone needs only the batch keys — write
                # its files now, overlapped with link expansion, so the commit
                # tail keeps just the insert write + manifest flip (the dirs
                # are inert until the manifest references them; a failed epoch
                # leaves orphans for the compaction GC)
                if hasattr(self.frontier, "prepare_tombstone"):
                    f_tomb = pool.submit(
                        _timed_early(
                            "tombstone",
                            lambda: self.frontier.prepare_tombstone(
                                batch.select("url_hash", "bucket"), "url_hash",
                                pack_rows=int(n_batch),
                            ),
                        )
                    )
                else:  # storage backend without the pre-write seam
                    f_tomb = None

            # --- retries / dead letters (403/429 backoff re-queue, T4)
            failures = results.filter(F.col("status") != 200).select("url_hash", "status")
            fr = batch.join(failures, on="url_hash", how="inner")
            retry = fr.filter(F.col("retry_count") < cfg.max_retries)
            backoff = F.element_at(
                F.array(*[F.lit(b) for b in datagen.POLITENESS["backoff_batches"]]),
                F.least(F.col("retry_count") + 1, F.lit(len(datagen.POLITENESS["backoff_batches"]))),
            )
            retry_rows = (
                retry.withColumn("not_before", (F.lit(epoch) + backoff).cast("int"))
                .withColumn("retry_count", F.col("retry_count") + 1)
                .select(*[c.strip().split(" ")[0] for c in FRONTIER_DDL.split(",")])
            )

            # --- link expansion -> canonicalize -> blocklist -> anti-join seen
            if cfg.expand:
                ok_hashes = results.filter(F.col("status") == 200).select("url_hash")
                # admission gate FUSED into generation (pregated): blocked
                # children never emitted, robots verdict inline on the host
                # rank, seed dim pre-filtered once — no anti-join over the
                # raw expansion, the epoch's largest intermediate
                disc = self.expand_jvm(ok_hashes, pregated=True)
                disc = with_url_identity(disc, "url", cfg.bucket_count)
                # dedup discovered URLs on identity hash, keeping the
                # lexicographically-smallest raw url as the representative
                # (same pick as a row_number-over-(url asc) window, which
                # this replaced): min_by is a partial aggregate, so the
                # expansion's heavy duplication collapses map-side before
                # the shuffle and nothing is sorted — the window variant
                # shuffled every duplicate then sorted each hash group.
                _rest = [c for c in disc.columns if c != "url_hash"]
                disc = (
                    disc.groupBy("url_hash")
                    .agg(F.min_by(F.struct(*_rest), F.col("url")).alias("_r"))
                    .select("url_hash", "_r.*")
                )
                if cfg.use_bloom:
                    # partitioned bloom prefilter; exact anti-join remains the
                    # authority for the maybe-seen slice AND for stale buckets
                    # (snapshot under the lock: streaming ingest may add marks
                    # concurrently, and split_new iterates the set)
                    with self._bloom_lock:
                        stale = set(self._bloom_dirty)
                    new_urls = self.seen_bloom.split_new(
                        spark, disc, self.seen, stale_buckets=stale
                    )
                else:
                    seen_df = self.seen.read(spark).select("url_hash")
                    new_urls = disc.join(seen_df, on="url_hash", how="left_anti")
                discovered = (
                    new_urls.withColumn(
                        "priority",
                        (F.pmod(F.col("url_hash"), F.lit(1_000_000)) / 1_000_000.0),
                    )
                    .withColumn("discovered_at", F.lit(_epoch_discovery_ts(epoch)))
                    .withColumn("category", F.lit("general"))
                    .withColumn("language", F.lit("en"))
                    .withColumn("retry_count", F.lit(0))
                    .withColumn("not_before", F.lit(epoch + 1))
                    .select(*[c.strip().split(" ")[0] for c in FRONTIER_DDL.split(",")])
                ).cache()
                disc_stats = discovered.groupBy("bucket").agg(F.count("*").alias("n")).collect()
                n_discovered = sum(r["n"] for r in disc_stats)
            else:
                discovered = spark.createDataFrame([], FRONTIER_DDL)
                disc_stats = []
                n_discovered = 0

            mark("expand")

            # --- commit: frontier delete+insert, seen append (+ amortized bloom
            #     rebuild), lineage append — independent tables, same pool.
            def frontier_task():
                # merge-on-read: the epoch's frontier update appends O(delta)
                # rows + a tombstone key file instead of rewriting every touched
                # bucket — at a 10^10-row frontier a COW rewrite per epoch is
                # the commit-path bottleneck (measured ~15 s/epoch flat in the
                # sandbox); tombstones are folded in by the periodic compact.
                # The tombstone files were pre-written during link expansion
                # (f_tomb) so only the insert write + manifest stay here.
                inserts = retry_rows.unionByName(discovered)
                tomb_dirs = f_tomb.result() if f_tomb is not None else None
                return self.frontier.merge_delta(
                    spark,
                    None if tomb_dirs is not None else batch.select("url_hash", "bucket"),
                    inserts, "url_hash",
                    {"epoch": epoch}, mode="mor", tombstone_dirs=tomb_dirs,
                    pack_rows=int(n_retry) + int(n_discovered),
                    tombstone_pack_rows=int(n_batch),
                )

            def seen_task():
                # seen append only: the bloom OR-in (add_keys) + rebuild are
                # DEFERRED to a background thread submitted at the end of this
                # epoch (_submit_bloom) and landed before the next epoch's
                # split_new — the bloom's first reader. That takes the largest
                # commit-tail item (11.6-13.7 s measured at the 4x4-core
                # scaling leg) off the critical path; until the job lands the
                # delta buckets are bloom-dirty, so probes exact-join.
                return (
                    self.seen.append(
                        discovered.select("url_hash", "bucket"),
                        pack_rows=int(n_discovered),
                    )
                    if n_discovered
                    else self.seen.current_snapshot_id()
                )

            def log_task():
                # lineage is PER-BUCKET: discoveries counted in the bucket they
                # land in, new-frontier = that bucket's retry re-inserts +
                # discoveries (ADVICE r01: global totals were stamped per row)
                disc_by_bucket = (
                    {r["bucket"]: int(r["n"]) for r in disc_stats} if cfg.expand else {}
                )
                log_by_bucket = {r["bucket"]: r for r in log_rows}
                log = spark.createDataFrame(
                    [
                        (
                            epoch, b,
                            (int(r["n_fetched"]) if r else 0) + cached_counts.get(b, 0),
                            cached_counts.get(b, 0),
                            int(r["n_stored"]) if r else 0,
                            int(r["n_rejected"]) if r else 0,
                            int(r["n_invalid"]) if r else 0,
                            int(r["n_retry"]) if r else 0,
                            int(r["n_dead"]) if r else 0,
                            disc_by_bucket.get(b, 0),
                            (int(r["n_retry"]) if r else 0) + disc_by_bucket.get(b, 0),
                        )
                        for b in sorted(
                            set(log_by_bucket) | set(disc_by_bucket) | set(cached_counts)
                        )
                        for r in [log_by_bucket.get(b)]
                    ],
                    FETCH_LOG_DDL,
                )
                return self.fetch_log.append(
                    log,
                    pack_rows=len(
                        set(log_by_bucket) | set(disc_by_bucket) | set(cached_counts)
                    ),
                )

            def pending_task():
                # scheduled re-queued keys leave the pending table whether they
                # were cache hits or misses (misses were actually fetched)
                if touched_pend is None or not n_pend:
                    return self.requeue_pending.current_snapshot_id()
                remaining = self.requeue_pending.read(spark).join(
                    touched_pend.select("url_hash"), on="url_hash", how="left_anti"
                )
                return self.requeue_pending.overwrite(remaining, {"epoch": epoch})

            task_secs: dict[str, float] = {}

            def timed(name, fn):
                def run():
                    t0 = _time.time()
                    spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", f"commit-{name}"
                    )
                    try:
                        return fn()
                    finally:
                        spark.sparkContext.setLocalProperty(
                            "spark.scheduler.pool", None
                        )
                        task_secs[name] = round(_time.time() - t0, 2)

                return run

            if pool:
                f_frontier = pool.submit(timed("frontier", frontier_task))
                f_seen = pool.submit(timed("seen", seen_task))
                f_log = pool.submit(timed("log", log_task))
                f_pend = pool.submit(timed("pending", pending_task))
                store_id = f_store.result()
                host_id = f_host.result()
                order_id = f_order.result()
                frontier_id = f_frontier.result()
                seen_id = f_seen.result()
                log_id = f_log.result()
                pend_id = f_pend.result()
            else:
                store_id = timed("store", store_task)()
                host_id = timed("host", host_task)()
                order_id = timed("order", order_task)()
                frontier_id = timed("frontier", frontier_task)()
                seen_id = timed("seen", seen_task)()
                log_id = timed("log", log_task)()
                pend_id = timed("pending", pending_task)()
        finally:
            # on any failure in scheduling, expansion, or a commit
            # task, wait out in-flight commit threads before
            # unwinding — otherwise background threads keep flipping
            # table pointers while the epoch is already recovering
            # (ADVICE r02: the pool used to be guarded only from the
            # second submit wave onward)
            if pool:
                pool.shutdown(wait=True)
        if profile and task_secs:
            print(f"[profile] commit tasks: {task_secs}", flush=True)
        mark("parallel_commit")
        # advance the packed-commit size bounds past this epoch's appends
        if self._seen_rows_est is not None:
            self._seen_rows_est += int(n_discovered)
        if self._store_rows_bound is not None:
            self._store_rows_bound += int(n_stored_total)
        # the seen table now holds this epoch's keys but the bloom does not:
        # mark the delta buckets stale BEFORE checkpointing so a resume from
        # this checkpoint exact-joins them until the deferred job (or the
        # next engine's first maintenance pass) refreshes them
        disc_counts = {r["bucket"]: int(r["n"]) for r in disc_stats}
        own_token: dict[int, int] = {}
        if cfg.use_bloom and disc_counts:
            # own_only: buckets already dirty (stream marks, carryover) get
            # no clear token — add_keys may only clear marks it caused
            own_token = self._mark_bloom_dirty(disc_counts, own_only=True)
        self._checkpoint(
            epoch,
            {
                "frontier": frontier_id,
                "seen": seen_id,
                "store": store_id,
                "host_state": host_id,
                "fetch_log": log_id,
                "crawl_order": order_id,
                "requeue_pending": pend_id,
            },
        )
        # launch the deferred bloom maintenance AFTER the checkpoint (so the
        # recorded (bloom pointer, dirty set) pair stays conservative) but
        # BEFORE the compactions below: there is no data dependency
        # (frontier.compact does not touch seen, and a seen.compact is
        # snapshot-isolated from the rebuild's pinned read — expire keeps
        # the last 8 snapshots' files), so submitting first lets add_keys
        # overlap the compaction wall time instead of queueing behind it —
        # which is the whole epoch tail when the drain ends here and the
        # caller's _await_bloom() is the very next thing that runs. It
        # otherwise overlaps the NEXT epoch's select+fetch and is awaited
        # before split_new reads the bloom. `discovered` stays cached until
        # the job lands (_await_bloom unpersists it).
        handed_off = False
        if cfg.use_bloom and (disc_counts or self._bloom_dirty):
            self._submit_bloom(
                discovered if n_discovered else None, disc_counts, own_token
            )
            handed_off = n_discovered > 0
        if cfg.expand and not handed_off:
            discovered.unpersist()

        # bound read amplification on the append-only seen table and fold
        # the frontier's MOR tombstones back into data files; after a
        # compaction, GC manifests + unreferenced data dirs so a long drain
        # doesn't grow disk without bound (the checkpointed snapshot is
        # always in the kept window, so torn-epoch rollback still works).
        # The two tables are independent — compact them as concurrent jobs
        # (guide §2.6: overlap independent jobs to back-fill the tail).
        compact_seen = self.seen.max_dirs_per_bucket() > 6
        compact_frontier = self.frontier.max_dirs_per_bucket() > 6
        if compact_seen and compact_frontier:
            from concurrent.futures import ThreadPoolExecutor as _TPE

            with _TPE(max_workers=2, thread_name_prefix="compact") as cp:
                fs = cp.submit(
                    self.seen.compact, spark, {"epoch": epoch},
                    pack_rows=self._seen_rows_est,
                )
                ff = cp.submit(self.frontier.compact, spark, {"epoch": epoch})
                fs.result(), ff.result()
            self.seen.expire_snapshots(keep_last=8)
            self.frontier.expire_snapshots(keep_last=8)
        elif compact_seen:
            self.seen.compact(
                spark, {"epoch": epoch}, pack_rows=self._seen_rows_est
            )
            self.seen.expire_snapshots(keep_last=8)
        elif compact_frontier:
            self.frontier.compact(spark, {"epoch": epoch})
            self.frontier.expire_snapshots(keep_last=8)

        # advance the driver-side frontier size estimate (exact: the epoch
        # removed the batch and re-inserted retries + discoveries)
        if self._frontier_est is not None:
            self._frontier_est += n_retry + n_discovered - int(n_batch)

        if profile:
            print(f"[profile] epoch {epoch}: " + ", ".join(f"{n}={s}s" for n, s in marks), flush=True)
        self._last_epoch_marks = marks
        from .. import tablelib as _tl

        stats = {
            "epoch": epoch,
            "fetched": int(n_batch),
            "cached": int(n_cached_total),
            "stored": int(n_stored_total),
            "discovered": int(n_discovered),
            "dead": int(n_dead),
            # driver-resident commit-protocol time this epoch (manifest
            # fsyncs + pointer flips + checkpoint) — the non-distributable
            # part of the commit path; design target < 1 s
            "driver_commit_s": round(_tl.take_driver_commit_seconds(), 3),
            "done": False,
        }
        batch.unpersist()
        results.unpersist()
        if hits is not None:
            hits.unpersist()
        if touched_pend is not None:
            touched_pend.unpersist()
        return stats

    # -------------------------------------------------------------- drive

    def crawl_order_with_seq(self) -> DataFrame:
        """(epoch, seq, url_hash, bucket): seq derived from the persisted
        ranking keys — identical to the order the batch was drained in."""
        w = Window.partitionBy("epoch").orderBy(*rank_keys())
        return (
            self.crawl_order.read(self.spark)
            .withColumn("seq", F.row_number().over(w).cast("long"))
            .select("epoch", "seq", "url_hash", "bucket", "host")
        )

    def resume_epoch(self) -> int:
        """Next epoch to run, after rolling tables back to the checkpoint."""
        # settle any in-flight deferred bloom job FIRST: rolling the bloom
        # pointer back under a live maintenance commit (e.g. the streaming
        # drain's per-tick resume) would interleave two writers
        self._await_bloom()
        epoch = self.catalog.restore_latest()
        ck = self.catalog.last_checkpoint() or {}
        with self._bloom_lock:
            self._bloom_gen_counter += 1
            g = self._bloom_gen_counter
            self._bloom_dirty = set(ck.get("bloom_dirty", []))
            self._bloom_mark_gen = {b: g for b in self._bloom_dirty}
        return epoch + 1

    def drain(self, max_epochs: int = 100) -> list[dict]:
        start = self.resume_epoch()
        out = []
        try:
            for e in range(start, start + max_epochs):
                st = self.run_epoch(e)
                out.append(st)
                if st.get("done"):
                    break
        finally:
            # land the last epoch's deferred bloom job before returning so
            # callers observe settled table state (and no thread outlives us)
            self._await_bloom()
        return out
