"""In-memory log ring buffer for live UI/agent inspection.

Reference parity (log/log_stream.py:49-147): a ``logging.Handler``
holding the most recent records in a ``deque(maxlen)`` so a dashboard
or the agent's status tool can show a sync job's recent log lines
without tailing files — old entries evict automatically, memory stays
bounded no matter how long the process runs.

Spark note: this is driver-side only by design. Executor logs belong to
the cluster manager (YARN/K8s log aggregation, the Spark UI); what the
reference streams to its UI — engine/worker orchestration messages —
all originates on the driver, which is exactly what lands here via the
package loggers (``SyncWorker`` progress and errors log to
``oracle_duckdb_sync_spark.sync.worker``).

Thread safety: emit() runs under the handler's own lock (the logging
framework acquires it around handle()); snapshot readers take the same
lock, so a reader never sees a half-applied eviction even while worker
threads are logging.
"""

from __future__ import annotations

import logging
import threading
from collections import deque
from dataclasses import dataclass
from datetime import datetime
from typing import Optional


@dataclass
class LogEntry:
    """One captured record (reference LogEntry, log/log_stream.py:15-46)."""

    timestamp: datetime
    level: str
    source: str
    message: str
    details: Optional[dict] = None

    def to_dict(self) -> dict:
        return {
            "timestamp": self.timestamp.strftime("%Y-%m-%d %H:%M:%S"),
            "level": self.level,
            "source": self.source,
            "message": self.message,
            "details": self.details,
        }

    def __str__(self) -> str:
        return (
            f"[{self.timestamp.strftime('%H:%M:%S')}] "
            f"[{self.level}] {self.source}: {self.message}"
        )


class LogRingHandler(logging.Handler):
    """Bounded ring of recent log records with snapshot accessors
    (reference LogStreamHandler, log/log_stream.py:49-147)."""

    def __init__(self, max_size: int = 100, level: int = logging.INFO):
        super().__init__(level)
        self.max_size = max_size
        self._ring: deque[LogEntry] = deque(maxlen=max_size)

    def emit(self, record: logging.LogRecord) -> None:
        try:
            entry = LogEntry(
                timestamp=datetime.fromtimestamp(record.created),
                level=record.levelname,
                source=record.name,
                message=self.format(record),
                details=(
                    {
                        "pathname": record.pathname,
                        "lineno": record.lineno,
                        "funcName": record.funcName,
                    }
                    if record.exc_info
                    else None
                ),
            )
            # the logging framework holds self.lock around emit(); the
            # deque append is the only mutation, so readers taking the
            # same lock always see whole entries
            self._ring.append(entry)
        except Exception:  # never let the log path take down the job
            self.handleError(record)

    # -- snapshot accessors (thread-safe) ---------------------------------
    def get_logs(
        self, count: int | None = None, level: str | None = None
    ) -> list[LogEntry]:
        """Recent entries, oldest first; optionally the last ``count``
        after filtering to one level name."""
        with self.lock:
            logs = list(self._ring)
        if level:
            logs = [e for e in logs if e.level == level]
        if count:
            logs = logs[-count:]
        return logs

    def get_latest(self, count: int = 10) -> list[LogEntry]:
        with self.lock:
            return list(self._ring)[-count:]

    def get_count(self) -> int:
        with self.lock:
            return len(self._ring)

    def clear(self) -> None:
        with self.lock:
            self._ring.clear()


_singleton_lock = threading.Lock()
_singleton: LogRingHandler | None = None


def get_log_ring_handler(max_size: int = 100) -> LogRingHandler:
    """Process-wide shared handler (reference get_log_stream_handler,
    log/log_stream.py:152-175): every caller sees one ring, so the UI
    poller and the agent's status tool read the same stream.
    ``max_size`` applies on first creation only."""
    global _singleton
    with _singleton_lock:
        if _singleton is None:
            _singleton = LogRingHandler(max_size=max_size)
        return _singleton


def install_ring_handler(
    max_size: int = 100, logger_name: str = "oracle_duckdb_sync_spark"
) -> LogRingHandler:
    """Attach the shared ring to the package logger (idempotent) and
    return it — after this, SyncWorker/engine log lines are readable
    via ``get_logs()``."""
    handler = get_log_ring_handler(max_size)
    logger = logging.getLogger(logger_name)
    if handler not in logger.handlers:
        logger.addHandler(handler)
    if logger.level == logging.NOTSET or logger.level > handler.level:
        logger.setLevel(handler.level)
    return handler
