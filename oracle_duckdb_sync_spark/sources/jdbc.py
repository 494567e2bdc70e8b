"""Oracle JDBC source (reference A1-A6, J10).

The reference drives a thick/thin ``oracledb`` client with a hand-rolled
batched cursor (database/oracle_source.py:100-237). Spark's JDBC source
replaces all of it:

- batched fetch        → ``fetchsize`` (A2/A3; cursor batching lives in
  the connector, default 10 000 matching SYNC_BATCH_SIZE)
- parallelism          → ``partitionColumn/lowerBound/upperBound/
  numPartitions`` — N concurrent range-partitioned cursors, where the
  reference is a single serial cursor
- watermark predicate  → plain ``WHERE`` pushed into the dbtable subquery
- schema introspection → JDBC metadata (A5); :func:`oracle_schema_to_spark`
  keeps the reference's 4-rule type mapping for declared-schema flows

No Oracle server exists in the test environment, so this module is
exercised through its pure parts; the read path is standard
``spark.read.format("jdbc")`` wiring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import SYNC_BATCH_SIZE


def map_oracle_type(oracle_type: str):
    """Oracle type name → Spark type (J10, database/sync_engine.py:19-43).

    NUMBER* → DOUBLE (deliberately drops decimal exactness, SURVEY
    §4.3-4), VARCHAR*/CHAR* → STRING, DATE/TIMESTAMP* → TIMESTAMP,
    anything else → STRING fallback.
    """
    t = (oracle_type or "").upper()
    if t.startswith("NUMBER"):
        return DoubleType()
    if "VARCHAR" in t or t.startswith("CHAR"):
        return StringType()
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return TimestampType()
    return StringType()


def oracle_schema_to_spark(columns: list[tuple[str, str]]) -> StructType:
    """``[(col, oracle_type)]`` (A5 dictionary order) → StructType."""
    return StructType(
        [StructField(name, map_oracle_type(t), nullable=True) for name, t in columns]
    )


@dataclass
class JdbcSourceConfig:
    """Connection + parallelism settings for a JDBC source."""

    url: str  # jdbc:oracle:thin:@//host:1521/service
    user: str
    password: str
    driver: str = "oracle.jdbc.OracleDriver"
    fetchsize: int = SYNC_BATCH_SIZE
    partition_column: str | None = None
    num_partitions: int = 8

    def base_options(self) -> dict[str, Any]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
        }


def read_query(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    query: str,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
) -> DataFrame:
    """Partitioned JDBC read of an arbitrary query (A1/A3).

    With ``partition_column`` + bounds: ``num_partitions`` concurrent
    range cursors. Without: single cursor (the reference's shape).
    """
    reader = spark.read.format("jdbc").options(**cfg.base_options())
    reader = reader.option("dbtable", f"({query}) src")
    if cfg.partition_column and lower_bound is not None and upper_bound is not None:
        reader = (
            reader.option("partitionColumn", cfg.partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(cfg.num_partitions))
        )
    return reader.load()


def read_table(spark: SparkSession, cfg: JdbcSourceConfig, table: str, **kw) -> DataFrame:
    return read_query(spark, cfg, f"SELECT * FROM {table}", **kw)


def read_incremental(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    table: str,
    time_col: str,
    last_value: str | None,
    **kw,
) -> DataFrame:
    """Watermark query pushed into Oracle (A1+B3,
    database/oracle_source.py:239-240): exclusive ``>`` bound, ascending
    order — executed inside Oracle, only new rows cross the wire."""
    q = f"SELECT * FROM {table}"
    if last_value is not None:
        q += f" WHERE {time_col} > TO_TIMESTAMP('{last_value}', 'YYYY-MM-DD HH24:MI:SS.FF')"
    q += f" ORDER BY {time_col} ASC"
    return read_query(spark, cfg, q, **kw)
