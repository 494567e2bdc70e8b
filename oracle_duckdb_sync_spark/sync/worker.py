"""Background sync worker + progress stream (reference H10).

Reference parity (scheduler/sync_worker.py:12-222,
application/sync_service.py:30-196):
- daemon worker thread dispatching to the sync engine
- status machine: idle → running → (paused ⇄ running) → completed | error
- pause / resume / stop events honored between progress ticks
- progress queue carrying rows/s + ETA dicts to the UI/poller

Spark mapping: the "batches" the reference pumps by hand are Spark
tasks; the worker thread is *driver-side orchestration only* — it
launches one distributed write and relays engine progress callbacks.
Pause/stop between Spark jobs (not mid-job) mirrors the reference's
between-batches granularity; a hard cancel would call
``spark.sparkContext.cancelJobGroup`` (left to the caller's policy).
"""

from __future__ import annotations

import logging
import threading
import time
import uuid
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Any, Callable

# progress/error lines also flow to the package logger, so a ring
# handler installed via log.install_ring_handler() captures the live
# stream (reference: SyncWorker logging into LogStreamHandler's queue)
logger = logging.getLogger(__name__)

IDLE = "idle"
RUNNING = "running"
PAUSED = "paused"
COMPLETED = "completed"
ERROR = "error"
STOPPED = "stopped"


@dataclass
class WorkerProgress:
    """One progress tick (rows/s + ETA, sync_worker.py:174-210)."""

    sync_id: str
    status: str
    rows_done: int = 0
    rows_total: int | None = None
    rows_per_second: float = 0.0
    eta_seconds: float | None = None
    message: str = ""
    extra: dict = field(default_factory=dict)


class SyncWorker:
    """Daemon thread running one sync job with a progress channel."""

    def __init__(
        self,
        target: Callable[..., Any],
        kwargs: dict | None = None,
        progress_queue: Queue | None = None,
    ):
        self.sync_id = uuid.uuid4().hex[:12]
        self._target = target
        self._kwargs = kwargs or {}
        self.progress_queue = progress_queue or Queue()
        self._thread: threading.Thread | None = None
        self._pause_evt = threading.Event()
        self._stop_evt = threading.Event()
        self._lock = threading.Lock()
        self.status = IDLE
        self.result: Any = None
        self.error: str | None = None
        self._started_at: float | None = None
        self._rows_done = 0
        self._rows_total: int | None = None

    # -- control -------------------------------------------------------------

    def start(self) -> None:
        with self._lock:
            if self.status == RUNNING:
                raise RuntimeError("worker already running")
            self.status = RUNNING
        self._started_at = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def pause(self) -> None:
        if self.status == RUNNING:
            self._pause_evt.set()
            self.status = PAUSED
            self._emit(message="paused")

    def resume(self) -> None:
        if self.status == PAUSED:
            self._pause_evt.clear()
            self.status = RUNNING
            self._emit(message="resumed")

    def stop(self) -> None:
        self._stop_evt.set()
        self._pause_evt.clear()

    def join(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)

    def is_alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    # -- progress ------------------------------------------------------------

    def _emit(self, message: str = "", **extra) -> None:
        elapsed = max(time.monotonic() - (self._started_at or 0), 1e-9)
        rate = self._rows_done / elapsed
        eta = None
        if self._rows_total and rate > 0:
            eta = max(self._rows_total - self._rows_done, 0) / rate
        self.progress_queue.put(
            WorkerProgress(
                sync_id=self.sync_id,
                status=self.status,
                rows_done=self._rows_done,
                rows_total=self._rows_total,
                rows_per_second=round(rate, 2),
                eta_seconds=eta,
                message=message,
                extra=extra,
            )
        )
        if message:
            log = logger.error if self.status == ERROR else logger.info
            log("[%s] %s: %s (%d rows)",
                self.sync_id, self.status, message, self._rows_done)

    def on_progress(self, **kw) -> None:
        """Engine progress callback (SyncEngine.progress_cb shape).

        Blocks while paused and raises to abort when stopped — the
        engine calls this between driver-side steps, giving the same
        between-batches control points the reference has.
        """
        rows = kw.get("rows_done")
        if rows is not None:
            self._rows_done = int(rows)
        if kw.get("rows_total") is not None:
            self._rows_total = int(kw["rows_total"])
        while self._pause_evt.is_set() and not self._stop_evt.is_set():
            time.sleep(0.05)
        if self._stop_evt.is_set():
            raise InterruptedError("sync stopped")
        self._emit(message=kw.get("message", ""), **{
            k: v for k, v in kw.items()
            if k not in ("rows_done", "rows_total", "message")
        })

    # -- run loop ------------------------------------------------------------

    def _run(self) -> None:
        try:
            self._emit(message="started")
            self.result = self._target(
                progress_cb=self.on_progress, **self._kwargs
            )
            self.status = STOPPED if self._stop_evt.is_set() else COMPLETED
            self._emit(message="done")
        except InterruptedError:
            self.status = STOPPED
            self._emit(message="stopped")
        except Exception as e:  # noqa: BLE001 — worker boundary
            self.status = ERROR
            self.error = str(e)
            self._emit(message=f"error: {e}")

    def drain_progress(self, max_items: int = 1000) -> list[WorkerProgress]:
        out = []
        try:
            for _ in range(max_items):
                out.append(self.progress_queue.get_nowait())
        except Empty:
            pass
        return out

    def snapshot(self) -> dict:
        """Agent/UI status dict (L5 get_sync_status shape)."""
        return {
            "sync_id": self.sync_id,
            "state": self.status,
            "rows_done": self._rows_done,
            "rows_total": self._rows_total,
            "result": getattr(self.result, "__dict__", self.result),
            "error": self.error,
        }
