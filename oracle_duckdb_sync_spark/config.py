"""Engine configuration and tuning constants.

Mirrors the observable defaults of the reference implementation
(jwleepro/oracle-duckdb-sync: config/config.py:29-49 and
config/query_constants.py:16-28) while adding Spark-scale knobs the
reference has no equivalent for (shuffle partitions, broadcast threshold,
AQE). Everything is overridable via environment or constructor.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


# --- reference-parity constants -------------------------------------------
# config/query_constants.py:16-17
DEFAULT_QUERY_LIMIT = 100
# config/query_constants.py:27-28
DEFAULT_AGGREGATION_INTERVAL = "10 minutes"
# config/query_constants.py:20-24 (sampled type-inference vote)
TYPE_CONVERSION_THRESHOLD = 0.9
SAMPLE_SIZE_FOR_TYPE_DETECTION = 1000
# config/config.py:32-33
SYNC_BATCH_SIZE = 10_000
# config/config.py:34
SYNC_MAX_DURATION_SECONDS = 3600
# config/config.py:48-49
SYNC_MAX_ITERATIONS = 10_000
# config/config.py:35
TEST_SYNC_DEFAULT_ROW_LIMIT = 100_000
# config/config.py:45-46
SYNC_RETRY_ATTEMPTS = 3
SYNC_RETRY_DELAY_SECONDS = 0.1
# ui/visualization.py:414-415
LTTB_THRESHOLD = 5000
# state/sync_state.py (lock staleness takeover)
LOCK_STALE_SECONDS = 3600


@dataclass
class EngineConfig:
    """Runtime configuration for the Spark engine.

    ``warehouse_dir`` is the root directory of the Parquet warehouse (the
    Spark replacement for the reference's single DuckDB file at
    database/duckdb_source.py:17).
    """

    app_name: str = "oracle-duckdb-sync-spark"
    master: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
        )
    )
    warehouse_dir: str = field(
        default_factory=lambda: os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/ods_warehouse")
    )
    state_dir: str = field(
        default_factory=lambda: os.environ.get("SPARK_STATE_DIR", "/tmp/ods_state")
    )
    # Spark-scale knobs (no reference equivalent; sized for local[32] tests,
    # raise shuffle_partitions to ~2-3x total cores on a real cluster).
    shuffle_partitions: int = field(default_factory=lambda: _env_int("SPARK_SHUFFLE_PARTITIONS", 32))
    max_partition_bytes: str = "128m"
    broadcast_threshold: str = "64m"
    session_timezone: str = "UTC"
    adaptive_enabled: bool = True
    cbo_enabled: bool = True

    # reference-parity knobs
    default_query_limit: int = DEFAULT_QUERY_LIMIT
    default_aggregation_interval: str = DEFAULT_AGGREGATION_INTERVAL
    type_threshold: float = TYPE_CONVERSION_THRESHOLD
    type_sample_size: int = SAMPLE_SIZE_FOR_TYPE_DETECTION
    sync_batch_size: int = SYNC_BATCH_SIZE
    sync_max_duration_seconds: float = SYNC_MAX_DURATION_SECONDS
    sync_max_iterations: int = SYNC_MAX_ITERATIONS
    sync_retry_attempts: int = SYNC_RETRY_ATTEMPTS
    sync_retry_delay_seconds: float = SYNC_RETRY_DELAY_SECONDS
    test_sync_default_row_limit: int = TEST_SYNC_DEFAULT_ROW_LIMIT
    lttb_threshold: int = LTTB_THRESHOLD
