"""SparkSession factory.

The reference opens one DuckDB connection per process
(database/duckdb_source.py:10-17); here the analog is one SparkSession
configured for columnar scale: AQE (runtime re-planning + skew-join
handling), Arrow-based pandas interop, and a UTC session timezone so
time-bucket boundaries are reproducible across deployments.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .config import EngineConfig


def build_session(config: EngineConfig | None = None) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    Scale notes: ``spark.sql.adaptive.enabled`` lets AQE coalesce
    post-shuffle partitions and split skewed ones at 100 TB;
    ``autoBroadcastJoinThreshold`` keeps dimension joins shuffle-free;
    shuffle partitions default to 32 for local[32] and should be raised to
    ~2-3x total executor cores on a real cluster.
    """
    cfg = config or EngineConfig()
    builder = (
        SparkSession.builder.appName(cfg.app_name)
        .master(cfg.master)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", str(cfg.adaptive_enabled).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce to the advisory partition size, not the cluster
        # parallelism: tiny shuffles collapse to few tasks (cuts the
        # per-query scheduling floor) while 100 TB shuffles still split
        # by size — the production-recommended setting
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", cfg.broadcast_threshold)
        .config("spark.sql.files.maxPartitionBytes", cfg.max_partition_bytes)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", cfg.session_timezone)
        .config("spark.sql.parquet.compression.codec", "snappy")
        # cost-based optimizer: inert until a table carries statistics
        # (Catalog.analyze), then join trees over analyzed tables reorder
        # by estimated cardinality — the fix for ad-hoc user queries that
        # don't hand-tune their join order the way the registry plans do
        .config("spark.sql.cbo.enabled", str(cfg.cbo_enabled).lower())
        .config("spark.sql.cbo.joinReorder.enabled", str(cfg.cbo_enabled).lower())
    )
    return builder.getOrCreate()
