"""Deterministic synthetic corpus generator (no external data).

Generates the fixtures from FIXTURES.md:

1. ``payload`` — the authoritative image+caption table, schema exactly
   ``(image_id:string, bytes:binary, w:int, h:int, fmt:string,
   caption:string, phash:long)`` per BASELINE.json input_hint.
2. ``seeds`` — seed URL list with Zipfian host skew, dirty URL variants,
   and ~10% duplicate URLs (reference analogs: category scrape output at
   /root/reference/services/apis/google_news_crawler.py:239-252; dirty
   variants exercise utils/url_utils.py:26-29 semantics).
3. ``expand_links`` — the deterministic link-expansion function (the
   "Full Coverage" analog, google_news_crawler.py:273-326), shared by the
   engine's fetch UDF and the sequential oracle.
4. ``blocklist_hosts`` — excluded-domain gate fixture
   (config_template.py:29-35 analog), includes a hot host.

Every row is a **pure function of (seed, row index)** — generation through
``mapInPandas`` is partitioning-invariant and bit-identical to the local
pandas twin used by the oracle. The 10^10-URL frontier is represented
structurally: URLs are hash-derived strings referencing payload rows by
``pmod(url_hash, n_payload)``, so frontier scale is decoupled from stored
image bytes.
"""

from __future__ import annotations

import datetime as dt
import os
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd

from . import codecs
from .xxh64 import xxh64_long

EPOCH = dt.datetime(2024, 1, 1)
CATEGORIES = [  # the reference's 8 default categories (main.py:177-178)
    "general", "world", "business", "technology",
    "entertainment", "sports", "science", "health",
]
# image side lengths; override via env for scale benches with heavier
# payloads (workers inherit the env in local mode, so generation stays
# deterministic for a given setting)
SIZES = np.array(
    [int(x) for x in os.environ.get("SPARK_GRAFT_IMG_SIZES", "16,32,64,128").split(",")]
)
FMTS = ["ppm", "bmp", "qpng"]
ZIPF_S = 1.2
VOCAB = (
    "news report world market update story analysis government policy economy "
    "science research health sports match team player season technology data "
    "cloud model energy climate city council vote election leader summit trade "
    "growth price index bank rate media film music award festival travel storm "
    "coast rescue study school university court ruling law reform deal merger"
).split()

PAYLOAD_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)
SEEDS_SCHEMA = (
    "url string, priority double, discovered_at timestamp, category string, language string"
)


# ------------------------------------------------------------------ hosts


@lru_cache(maxsize=64)
def _zipf_cdf(n_hosts: int) -> np.ndarray:
    """Memoized: expand_links calls this once per fetched URL inside the
    expand UDF — recomputing a 15k-element cumsum per call was a measured
    serial drag on the drain. Callers only read the array."""
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(w / w.sum())


def host_name(rank: int) -> str:
    return f"host{rank:04d}.example{rank % 7}.com"


@lru_cache(maxsize=64)
def blocklist_ranks(seed: int, n_hosts: int) -> list[int]:
    """Host ranks of the ~8 excluded hosts (always including the hot rank
    1). Bounded config — the one gating input that may legitimately live
    driver-side as literals (the reference ships it as a code-level list,
    url_utils.py:18-34)."""
    rng = np.random.default_rng((seed, 9))
    return sorted({1} | {int(r) for r in rng.integers(2, max(3, n_hosts), size=7)})


@lru_cache(maxsize=64)
def blocklist_hosts(seed: int, n_hosts: int) -> list[str]:
    """~8 excluded hosts, always including a hot one (rank 1). Memoized —
    expand_links consults it per blocklisted child link."""
    return sorted(host_name(r) for r in blocklist_ranks(seed, n_hosts))


def _robots_k(seed: int) -> int:
    return 13 + (seed & 0xFFFF)


def robots_denied_rank(rank: int, seed: int) -> bool:
    """Deterministic per-host robots.txt verdict: ~10% of hosts disallow.

    Models the robots fetch a crawler performs on first host contact
    (north rule "robots gate"). The verdict is a chained Spark-style
    xxhash64 of the host rank, so the ENGINE evaluates it as a pure JVM
    column (:func:`robots_denied_col`) over ``spark.range`` — no
    driver-materialized host list at the 10^8-host regime — while this
    byte-identical Python twin drives the sequential oracle. Rank 1 (the
    hot host) stays allowed so politeness skew pressure is preserved;
    rank 2 is always denied so small-n test fixtures have a live gate.
    """
    if rank == 1:
        return False
    if rank == 2:
        return True
    h = xxh64_long(rank, xxh64_long(_robots_k(seed)) & _U64) & 0x7FFFFFFFFFFFFFFF
    return h % 10 == 0


def robots_denied_col(rank_col, seed: int):
    """JVM twin of :func:`robots_denied_rank` (boolean Column over a host
    rank column) — ``xxhash64(lit(k), rank) ≡ xxh64_long(rank, xxh64(k))``."""
    from pyspark.sql import functions as F

    h = F.xxhash64(
        F.lit(_robots_k(seed)).cast("long"), rank_col.cast("long")
    ).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
    return (rank_col == 2) | (
        (rank_col > 2) & (F.pmod(h, F.lit(10)) == 0)
    )


@lru_cache(maxsize=64)
def robots_denied_hosts(seed: int, n_hosts: int) -> list[str]:
    """Materialized denied-host list — TEST/ORACLE SCALE ONLY (O(n_hosts)
    driver work). The engine derives the same verdicts distributed via
    :func:`robots_denied_col`."""
    return sorted(
        host_name(r) for r in range(1, n_hosts + 1) if robots_denied_rank(r, seed)
    )


# ----------------------------------------------------------------- payload


def _pixels(i: int, w: int, h: int, rng: np.random.Generator) -> np.ndarray:
    x = np.arange(w, dtype=np.int32)
    y = np.arange(h, dtype=np.int32)
    base = (x[None, :] * 3 + y[:, None] * 5 + i) % 256
    off = np.array([0, 85, 170], dtype=np.int32)
    # accumulate in place into the noise buffer — same values mod 256, no
    # int32 broadcast temporaries (this runs once per validated URL via
    # expected_pixels, so its DRAM traffic bounds decode-phase scaling)
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.int32)
    noise += base[:, :, None]
    noise += off[None, None, :]
    noise %= 256
    return noise.astype(np.uint8)


def payload_row(i: int, seed: int) -> tuple:
    rng = np.random.default_rng((seed, 0, i))
    w = int(SIZES[rng.integers(0, len(SIZES))])
    h = int(SIZES[rng.integers(0, len(SIZES))])
    fmt = FMTS[int(rng.integers(0, len(FMTS)))]
    arr = _pixels(i, w, h, rng)
    data = codecs.encode(arr, fmt)
    target = int(rng.integers(50, 2001))
    words: list[str] = []
    ln = -1
    while ln < target:
        words.append(VOCAB[int(rng.integers(0, len(VOCAB)))])
        ln += len(words[-1]) + 1
    caption = " ".join(words)
    phash = codecs.average_phash(codecs.decode(data, fmt))
    return (f"img-{i:012d}", data, w, h, fmt, caption, phash)


def expected_pixels(i: int, seed: int) -> np.ndarray:
    """Re-derive the source pixels for payload row i (validation oracle)."""
    rng = np.random.default_rng((seed, 0, i))
    w = int(SIZES[rng.integers(0, len(SIZES))])
    h = int(SIZES[rng.integers(0, len(SIZES))])
    _ = rng.integers(0, len(FMTS))
    return _pixels(i, w, h, rng)


def gen_payload_pdf(indices: np.ndarray, seed: int) -> pd.DataFrame:
    rows = [payload_row(int(i), seed) for i in indices]
    return pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )


def gen_payload_spark(spark, n: int, seed: int = 42):
    """Distributed payload generation: range → mapInPandas (scales linearly).

    Partition count targets >= 4x cores once n can feed it — the fetch
    stage's decode UDF inherits this partitioning through the broadcast
    join, so an under-partitioned LARGE payload table would serialize the
    decode regardless of executor count — but is floored at ~128 rows per
    task: each Python stage task costs a measured ~0.1 s of fixed overhead
    (worker checkout + Arrow stream setup), so slicing a small table into
    4x-cores slivers pays 100+ task overheads for milliseconds of work
    (decode_features at n=200 measured 3.3 s warm at 128 parts vs 0.6 s at
    8). Generation is a pure function of (seed, row index) — partitioning
    never changes content, only speed.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_payload_pdf(pdf["id"].to_numpy(), seed)

    cores = spark.sparkContext.defaultParallelism
    parts = min(
        max(4 * cores, n // 512 or 1), 1024, max(n, 1), max(1, n // 128 or 1)
    )
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, PAYLOAD_SCHEMA)


# ------------------------------------------------------------------- seeds


def base_url(i: int, seed: int, n_hosts: int, cdf: np.ndarray | None = None) -> str:
    rng = np.random.default_rng((seed, 2, i))
    if cdf is None:
        cdf = _zipf_cdf(n_hosts)
    rank = int(np.searchsorted(cdf, rng.random())) + 1
    return f"https://{host_name(rank)}/a/{i}"


def _dirty(url: str, rng: np.random.Generator) -> str:
    v = int(rng.integers(0, 5))
    if v == 0:
        return url.replace("https://", "HTTPS://WWW.")
    if v == 1:
        return url.replace(".com/", ".com:443/")
    if v == 2:
        return url + "/"
    if v == 3:
        return url + "?utm_source=feed&utm_medium=rss"
    return url + "#section-1"


def seed_row(i: int, seed: int, n_hosts: int, cdf: np.ndarray) -> tuple:
    rng = np.random.default_rng((seed, 1, i))
    if i > 0 and rng.random() < 0.10:  # ~10% duplicates of an earlier URL
        j = int(rng.integers(0, i))
        url = base_url(j, seed, n_hosts, cdf)
    else:
        url = base_url(i, seed, n_hosts, cdf)
    if rng.random() < 0.05:
        url = _dirty(url, rng)
    priority = float(rng.random())
    discovered_at = EPOCH + dt.timedelta(seconds=i)
    category = CATEGORIES[int(rng.integers(0, len(CATEGORIES)))]
    return (url, priority, discovered_at, category, "en")


def gen_seeds_pdf(indices: np.ndarray, seed: int, n_hosts: int) -> pd.DataFrame:
    cdf = _zipf_cdf(n_hosts)
    rows = [seed_row(int(i), seed, n_hosts, cdf) for i in indices]
    return pd.DataFrame(
        rows, columns=["url", "priority", "discovered_at", "category", "language"]
    )


def gen_seeds_spark(spark, n: int, seed: int = 42, n_hosts: int = 100):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_seeds_pdf(pdf["id"].to_numpy(), seed, n_hosts)

    parts = max(8, min(256, n // 512 or 1))
    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, SEEDS_SCHEMA)


# ----------------------------------------------------------- link expansion


_U64 = (1 << 64) - 1
MAX_CHILDREN = 5


def _expand_k0(seed: int) -> int:
    return 11 + (seed & 0xFFFF)


def expand_links(url_hash: int, seed: int, n_hosts: int, n_seed_urls: int) -> list[str]:
    """Deterministic discovered-URL expansion for a fetched page.

    Pure function of (url_hash, seed): ~30% of children point at existing
    seed URLs (already-seen pressure), ~2% at blocklisted hosts, the rest
    are fresh hash-derived URLs. Every hash is a Spark-style chained
    xxhash64 (``xxhash64(lit(k), col)`` ≡ ``xxh64(col, seed=xxh64(k))``),
    so the ENGINE evaluates the whole expansion JVM-side (no Python in the
    hot path, see CrawlEngine.expand_jvm) while this byte-identical Python
    twin drives the sequential oracle.
    """
    h0 = xxh64_long(url_hash, xxh64_long(_expand_k0(seed)) & _U64)
    n_out = (h0 & 0x7) % 6  # 0..5 children
    out: list[str] = []
    cdf = _zipf_cdf(n_hosts)
    for k in range(n_out):
        hk = xxh64_long(h0, xxh64_long(1000 + k) & _U64) & 0x7FFFFFFFFFFFFFFF
        sel = hk % 100
        if sel < 30 and n_seed_urls > 0:
            out.append(base_url(hk % n_seed_urls, seed, n_hosts, cdf))
        elif sel < 32:
            blocked = blocklist_hosts(seed, n_hosts)
            out.append(f"https://{blocked[hk % len(blocked)]}/x/{hk % 10_000}")
        else:
            rank = int(np.searchsorted(cdf, (hk % 10_000) / 10_000.0)) + 1
            out.append(f"https://{host_name(rank)}/d/{hk % 1_000_000_007}")
    return out


def seed_url_dim_spark(spark, n_seed_urls: int, seed: int = 42, n_hosts: int = 100):
    """(idx long, seed_url string) — the seed-URL lookup table the JVM link
    expansion joins for its already-seen children (base_url is numpy-RNG
    derived, so it lives in a dim table rather than an expression)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cdf = _zipf_cdf(n_hosts)
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "idx": idx,
                    "seed_url": [base_url(int(i), seed, n_hosts, cdf) for i in idx],
                }
            )

    parts = max(8, min(256, n_seed_urls // 2048 or 1))
    return spark.range(0, n_seed_urls, numPartitions=parts).mapInPandas(
        gen, "idx long, seed_url string"
    )


def permille_rank_rows(n_hosts: int) -> list[tuple[int, int]]:
    """(p, rank) for p in 0..9999: the fresh-URL host-rank lookup —
    rank = searchsorted(zipf_cdf, p/10000) + 1, precomputed once so the
    expansion's Zipf draw is a broadcast-join instead of a Python call."""
    cdf = _zipf_cdf(n_hosts)
    ranks = np.searchsorted(cdf, np.arange(10_000) / 10_000.0) + 1
    return [(int(p), int(r)) for p, r in enumerate(ranks)]


def host_name_col(rank_col):
    """JVM twin of :func:`host_name` (f'host{rank:04d}.example{rank%7}.com')."""
    from pyspark.sql import functions as F

    s = rank_col.cast("string")
    # NB: Spark lpad TRUNCATES strings longer than the target length,
    # python's {:04d} does not — guard for rank >= 10000
    padded = F.when(F.length(s) < 4, F.lpad(s, 4, "0")).otherwise(s)
    return F.concat(
        F.lit("host"),
        padded,
        F.lit(".example"),
        F.pmod(rank_col, F.lit(7)).cast("string"),
        F.lit(".com"),
    )


# --------------------------------------------------------- fetch simulation


def fetch_status(url_hash: int, seed: int) -> int:
    """Deterministic simulated HTTP status: ~1.5% 403, ~1.5% 429, else 200.

    Mirrors the reference's failure-handling paths
    (/root/reference/utils/article_extractor.py:361-369) with failures
    derived from url_hash so engine and oracle see identical outcomes.

    Defined as Spark's chained ``xxhash64(lit(k), url_hash)`` (first hash
    seeds the second) so the engine evaluates it entirely JVM-side
    (``fetch_status_col``) while the oracle runs this byte-identical
    Python twin.
    """
    k = 7 + (seed & 0xFFFF)
    import struct

    from .xxh64 import xxh64

    s1 = xxh64(struct.pack("<q", k))  # seed 42, like Spark's first arg
    h = xxh64(struct.pack("<q", url_hash), s1 & ((1 << 64) - 1))
    m = h % 1000  # python % == Spark pmod (non-negative)
    if m < 15:
        return 403
    if m < 30:
        return 429
    return 200


def fetch_status_col(url_hash_col, seed: int):
    """JVM-side twin of fetch_status — no Python in the fetch hot path."""
    from pyspark.sql import functions as F

    k = 7 + (seed & 0xFFFF)
    m = F.pmod(F.xxhash64(F.lit(k).cast("long"), url_hash_col), F.lit(1000))
    return (
        F.when(m < 15, F.lit(403)).when(m < 30, F.lit(429)).otherwise(F.lit(200))
    ).cast("int")


POLITENESS = {
    # reference constants: scraping_config.py:6-16
    "min_interval_s": 2.0,      # domain_rate_limit
    "batch_interval_s": 60.0,   # the 60s sliding window -> one epoch
    "max_retries": 3,
    "backoff_batches": [1, 2, 4],  # 403/429 penalty, in epochs
}


def host_quota() -> int:
    """Fetches allowed per host per epoch = floor(window / min_interval)."""
    return int(POLITENESS["batch_interval_s"] / POLITENESS["min_interval_s"])
