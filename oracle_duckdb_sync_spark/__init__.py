"""oracle_duckdb_sync_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jwleepro/oracle-duckdb-sync.

The reference is an Oracle→DuckDB sync + analytics system; this package
re-expresses every capability Spark-first: DataFrame/SQL logical plans
optimized by Catalyst, Parquet columnar storage, watermark incremental
loads, time-bucket aggregation, type inference, LTTB downsampling,
metadata repositories — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.
"""

from .config import EngineConfig
from .errors import (
    EngineError,
    InvalidIntervalError,
    LockHeldError,
    SyncError,
    TableNotFoundError,
)
from .session import build_session

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "EngineError",
    "InvalidIntervalError",
    "LockHeldError",
    "SyncError",
    "TableNotFoundError",
    "build_session",
    "__version__",
]
