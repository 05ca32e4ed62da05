-- Real-cluster table definitions: what tablelib.SnapshotTable maps to when
-- an Iceberg catalog is available (no Iceberg runtime jar can be fetched in
-- this sandbox; tablelib provides the same contract — per-bucket COW MERGE,
-- snapshot-per-commit, time travel — on parquet + JSON manifests).
--
-- spark-submit ... \
--   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
--   --conf spark.sql.catalog.crawl=org.apache.iceberg.spark.SparkCatalog \
--   --conf spark.sql.catalog.crawl.type=hadoop \
--   --conf spark.sql.catalog.crawl.warehouse=s3://bucket/warehouse
--
-- B (bucket count) >= 4 x max executor cores, so an N -> 4N rescale still
-- has >= 1 bucket per core; all five tables share the bucket function over
-- host_hash so frontier<->seen anti-joins and store MERGEs are
-- storage-partitioned joins (no shuffle).

CREATE TABLE crawl.frontier (
    url            string,
    canonical_url  string,
    host           string,
    url_hash       bigint,
    host_hash      bigint,
    bucket         int,
    priority       double,
    discovered_at  timestamp,
    category       string,
    language       string,
    retry_count    int,
    not_before     int
) USING iceberg
PARTITIONED BY (bucket(128, host_hash))
TBLPROPERTIES (
    'write.parquet.bloom-filter-enabled.column.url_hash' = 'true',
    'write.distribution-mode' = 'hash',
    'write.merge.mode' = 'copy-on-write'
);

CREATE TABLE crawl.seen (
    url_hash  bigint,
    bucket    int
) USING iceberg
PARTITIONED BY (bucket(128, url_hash))
TBLPROPERTIES (
    'write.parquet.bloom-filter-enabled.column.url_hash' = 'true'
);

CREATE TABLE crawl.store (
    url_hash    bigint,
    bucket      int,
    host        string,
    image_id    string,
    caption     string,
    phash       bigint,
    w           int,
    h           int,
    fmt         string,
    psnr        double,
    first_epoch int,
    last_epoch  int
) USING iceberg
PARTITIONED BY (bucket(128, host_hash))
TBLPROPERTIES (
    'write.parquet.bloom-filter-enabled.column.url_hash' = 'true',
    'write.merge.mode' = 'copy-on-write'
);

CREATE TABLE crawl.host_state (
    host        string,
    host_hash   bigint,
    bucket      int,
    last_epoch  int,
    fetch_count bigint
) USING iceberg;

CREATE TABLE crawl.fetch_log (
    epoch          int,
    bucket         int,
    n_fetched      bigint,
    n_stored       bigint,
    n_rejected     bigint,
    n_invalid      bigint,
    n_retry        bigint,
    n_dead         bigint,
    n_discovered   bigint,
    n_new_frontier bigint
) USING iceberg
PARTITIONED BY (epoch);

CREATE TABLE crawl.crawl_order (
    epoch         int,
    url_hash      bigint,
    bucket        int,
    priority      double,
    discovered_at timestamp
) USING iceberg
PARTITIONED BY (epoch);

-- The per-epoch commits map to:
--   store:    MERGE INTO crawl.store t USING batch b ON t.url_hash = b.url_hash
--             WHEN MATCHED THEN UPDATE SET ... (first_epoch preserved)
--             WHEN NOT MATCHED THEN INSERT *
--   frontier: MERGE INTO crawl.frontier t USING delta d ON t.url_hash = d.url_hash
--             WHEN MATCHED THEN DELETE           -- fetched rows leave
--             WHEN NOT MATCHED THEN INSERT *     -- retries + discoveries
--   seen:     INSERT INTO crawl.seen SELECT url_hash, bucket FROM discovered
--   epoch checkpoint = recording each table's snapshot id after the commit
--   (Catalog.checkpoint); resume = time-travel every table back to the last
--   fully-recorded epoch (Catalog.restore_latest / VERSION AS OF).
