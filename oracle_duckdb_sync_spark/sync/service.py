"""Sync orchestration service (reference application/sync_service.py).

Flow parity with §3.1: validate → acquire :class:`SyncLock` → choose
sync type (target missing ⇒ full; exists ⇒ incremental from saved
watermark) → spawn :class:`SyncWorker` daemon thread → engine runs the
distributed write → audit row in ``sync_logs`` → lock released when the
worker finishes. Progress flows worker → queue → poller (UI/agent).
"""

from __future__ import annotations

import uuid
from typing import Any

from pyspark.sql import SparkSession

from ..config import EngineConfig
from ..errors import LockHeldError
from ..meta.repos import SyncLogRepository
from ..sources.catalog import Catalog
from ..sources.state import SyncLock, SyncStateStore
from .engine import SyncEngine, SyncResult, SyncSource
from .worker import SyncWorker


class SyncService:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        state: SyncStateStore,
        config: EngineConfig | None = None,
        sync_logs: SyncLogRepository | None = None,
        lock: SyncLock | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.state = state
        self.config = config or EngineConfig()
        self.sync_logs = sync_logs
        self.lock = lock or SyncLock(state.state_dir)
        self.worker: SyncWorker | None = None

    # -- type resolution (ui/handlers.py:206-226) ---------------------------

    def resolve_sync_type(self, table: str) -> tuple[str, Any]:
        """Missing target ⇒ full; existing ⇒ incremental from saved
        watermark (or the configured default start)."""
        if not self.catalog.table_exists(table):
            return "full", None
        return "incremental", self.state.load_state(table)

    # -- lifecycle -----------------------------------------------------------

    def start_sync(
        self,
        source: SyncSource,
        table: str,
        sync_type: str | None = None,
        primary_key: str | None = None,
        time_column: str | None = None,
        row_limit: int | None = None,
    ) -> SyncWorker:
        if self.worker is not None and self.worker.is_alive():
            raise LockHeldError("a sync is already running in this service")
        if not self.lock.acquire():
            raise LockHeldError("sync lock is held by another process")

        resolved_type = sync_type
        last_value = None
        if resolved_type is None:
            resolved_type, last_value = self.resolve_sync_type(table)

        sync_id = uuid.uuid4().hex[:12]
        log_id = (
            self.sync_logs.log_start(sync_id, table, resolved_type)
            if self.sync_logs
            else None
        )

        def task(progress_cb, **_kw) -> SyncResult:
            engine = SyncEngine(
                spark=self.spark,
                catalog=self.catalog,
                state=self.state,
                config=self.config,
                progress_callback=lambda d: progress_cb(
                    rows_done=d.get("rows"),
                    message=d.get("error", "") or ("done" if d.get("done") else ""),
                    **{k: v for k, v in d.items()
                       if k not in ("rows", "error", "done")},
                ),
            )
            try:
                if resolved_type == "full":
                    res = engine.full_sync(
                        source, table,
                        primary_key=primary_key, time_column=time_column,
                    )
                elif resolved_type == "test":
                    res = engine.test_sync(source, table, row_limit=row_limit)
                elif resolved_type == "incremental":
                    res = engine.incremental_sync(
                        source, table, time_column, last_value=last_value
                    )
                else:
                    raise ValueError(f"unknown sync type: {resolved_type}")
                if self.sync_logs and log_id is not None:
                    self.sync_logs.log_end(
                        log_id,
                        "completed" if res.success else "failed",
                        total_rows=res.rows,
                        error_message=res.error,
                    )
                return res
            except Exception as e:
                if self.sync_logs and log_id is not None:
                    self.sync_logs.log_end(log_id, "failed", error_message=str(e))
                raise
            finally:
                self.lock.release()

        self.worker = SyncWorker(target=task)
        self.worker.start()
        return self.worker

    def get_status(self) -> dict:
        """L5 get_sync_status shape."""
        if self.worker is None:
            return {"state": "idle", "result": None, "error": None}
        return self.worker.snapshot()

    def wait(self, timeout: float | None = None) -> dict:
        if self.worker is not None:
            self.worker.join(timeout)
        return self.get_status()
