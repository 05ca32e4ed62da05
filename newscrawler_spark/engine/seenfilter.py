"""Partitioned bloom URL-seen prefilter (north rule: "partitioned
bloom/cuckoo seen-filter").

The exact anti-join against `seen` is the authority — a bloom false
positive must never drop a URL the reference would crawl (SURVEY.md J1).
The bloom's job is to keep the *join input* small: at 10^10 seen URLs,
most discovered links are either definitely new (bloom miss → skip the
join entirely) or duplicates (exact join confirms). Split:

    maybe = disc WHERE bloom_probe(words[bucket], url_hash)
    new   = (disc − maybe)  ∪  (maybe LEFT ANTI JOIN seen ON url_hash)

One bloom per host-hash bucket, persisted as (bucket, words array<long>,
n_items) in a snapshot table — the filter rides the same commit/rollback
protocol as the data and is rebuilt only for buckets whose seen-set
changed (COW granularity).

Spark 4.1 does not expose ``bloom_filter_agg``/``might_contain`` as SQL
functions (they are internal to runtime join filters), so the filter is
built from public primitives and stays entirely inside codegen:

    build: k bit positions per key  = pmod(xxhash64(i, url_hash), m)
           word or-accumulation     = bit_or(shiftleft(1L, pos % 64))
                                      grouped by (bucket, pos div 64)
           dense bitmap             = transform(sequence(...), w -> map[w])
    probe: AND over i of (shiftright(words[pos div 64], pos % 64) & 1) = 1

The probe is a scalar expression evaluated after a broadcast join on
bucket — no shuffle of the discovered side.
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tablelib import SnapshotTable

BLOOM_DDL = "bucket int, words array<long>, m int, n_items long"
K_HASHES = 5
# bits per bucket bloom; 2^17 bits = 16 KiB/bucket. fpp ≈ (1-e^(-kn/m))^k:
# at n=25k keys/bucket this is ~2%; resize per deployment at 10^10 scale.
DEFAULT_M_BITS = 1 << 17


def _positions(url_hash: Column, m: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(F.lit(i).cast("long"), url_hash), F.lit(m))
        for i in range(K_HASHES)
    ]


def bloom_probe(words: Column, url_hash: Column, m: int) -> Column:
    """True iff all k bit positions for url_hash are set in the bitmap."""
    tests = []
    for pos in _positions(url_hash, m):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        # python F.shiftright only takes a literal count; the SQL function
        # accepts an expression — call it directly
        bit = F.call_function(
            "shiftright", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1))
        tests.append(bit == 1)
    return reduce(and_, tests)


class SeenBloom:
    def __init__(self, table: SnapshotTable, m_bits: int = DEFAULT_M_BITS):
        self.table = table
        self.m = m_bits
        self.n_words = m_bits // 64

    def rebuild_buckets(
        self, spark: SparkSession, seen: SnapshotTable, buckets: list[int]
    ) -> int:
        """Recompute blooms for the buckets whose seen-set changed."""
        if not buckets:
            return self.table.current_snapshot_id()
        rows = seen.read(spark, buckets=buckets)
        pos = rows.select(
            "bucket",
            F.explode(F.array(*_positions(F.col("url_hash"), self.m))).alias("pos"),
        )
        words = (
            pos.select(
                "bucket",
                (F.col("pos") / 64).cast("int").alias("word_idx"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
                ).alias("bit"),
            )
            .groupBy("bucket", "word_idx")
            .agg(F.bit_or("bit").alias("word"))
        )
        counts = rows.groupBy("bucket").agg(F.count("*").alias("n_items"))
        wm = words.groupBy("bucket").agg(
            F.map_from_arrays(
                F.collect_list("word_idx"), F.collect_list("word")
            ).alias("wm")
        )
        dense = wm.join(counts, on="bucket").select(
            "bucket",
            F.transform(
                F.sequence(F.lit(0), F.lit(self.n_words - 1)),
                lambda w: F.coalesce(
                    F.element_at(F.col("wm"), w), F.lit(0).cast("long")
                ),
            ).alias("words"),
            F.lit(self.m).alias("m"),
            "n_items",
        )
        return self.table.merge_upsert(spark, dense, "bucket", set_pointer=True)

    def split_new(
        self,
        spark: SparkSession,
        disc: DataFrame,
        seen: SnapshotTable,
        stale_buckets: set[int] | None = None,
    ) -> DataFrame:
        """Return the definitely-new rows of ``disc`` (exactness preserved).

        disc must carry (url_hash, bucket). Rows in buckets with no bloom
        yet — or whose bloom is stale (``stale_buckets``, i.e. seen grew
        since the last rebuild) — go straight to the exact join: a stale
        bloom could miss a recently-seen hash, so it must not be allowed
        to declare "definitely new". This is what lets rebuilds be
        amortized across epochs without giving up exactness.
        """
        if self.table.is_empty():
            return disc.join(
                seen.read(spark).select("url_hash"), on="url_hash", how="left_anti"
            )
        blooms = self.table.read(spark).select("bucket", "words")
        if stale_buckets:
            blooms = blooms.filter(~F.col("bucket").isin(list(stale_buckets)))
        probed = disc.join(F.broadcast(blooms), on="bucket", how="left")
        hit = bloom_probe(F.col("words"), F.col("url_hash"), self.m)
        definitely_new = probed.filter(F.col("words").isNotNull() & ~hit).drop("words")
        maybe = probed.filter(F.col("words").isNull() | hit).drop("words")
        checked = maybe.join(
            seen.read(spark).select("url_hash"), on="url_hash", how="left_anti"
        )
        return definitely_new.unionByName(checked)
