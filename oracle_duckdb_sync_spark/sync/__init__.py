"""Sync pipelines: full / test / incremental ETL into the Parquet
warehouse, with durable watermark state and retry/timeout guards."""
