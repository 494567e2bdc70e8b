"""Sources and sinks: Parquet warehouse catalog, JDBC ingest, state store."""
