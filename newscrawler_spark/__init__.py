"""newscrawler_spark — a brand-new PySpark-native crawl frontier + fetch scheduler.

Re-expresses the query and data-processing semantics of the reference crawler
(`shiningsun/newscrawler`, a single-process FastAPI/requests/Postgres news
crawler) as idiomatic Spark dataflow:

- frontier / seen / store / host_state / fetch_log as bucketed parquet tables
  with Iceberg-style snapshot manifests (``tablelib``),
- URL canonicalization + ``xxhash64`` identity (``urlnorm``),
- per-host politeness + blocklist gate via window quotas over salted keys
  (``engine.politeness``),
- priority queue as a window-ranked DataFrame drained in micro-batches
  (``engine.drain``),
- image+caption payload decode/validation entirely in vectorized
  pandas/Arrow UDFs (``engine.fetch``, ``codecs``),
- the reference's read-side query surface (search / pagination / stats /
  headline grouping) as plain DataFrame queries (``queries``),
- training-data pipeline operators (dedup, similarity search, text analysis)
  over the generic document/embedding tables (``functions``).

Everything here derives from public knowledge only: the Apache Spark API and
the observable behavior of the reference repo.
"""

__version__ = "0.1.0"
