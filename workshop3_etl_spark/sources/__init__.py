"""Sources & sinks: parquet star-schema loaders, harmonized CSV ingest
(the reference's 5-schema World-Happiness ETL), Kafka JSON source/sink
builders, and the idempotent JDBC/SQLite upsert sink."""
