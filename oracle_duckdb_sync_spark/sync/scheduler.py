"""Cron-style scheduler with non-reentrant job wrapping (reference H9).

Reference parity (scheduler/scheduler.py:13-46): APScheduler
``CronTrigger(hour, minute)`` firing a job that first tries the sync
lock and skips the run if one is already active. APScheduler is not
shipped here; a stdlib thread with the same observable contract
replaces it (daily hour:minute schedule, explicit ``run_pending`` for
deterministic tests, lock-guarded non-reentrancy).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

from ..sources.state import SyncLock


@dataclass
class ScheduledJob:
    name: str
    hour: int
    minute: int
    fn: Callable[[], None]
    last_run: datetime | None = None
    next_due: datetime | None = None
    runs: int = 0
    skipped: int = 0
    errors: list[str] = field(default_factory=list)

    def next_fire(self, now: datetime) -> datetime:
        target = now.replace(hour=self.hour, minute=self.minute, second=0, microsecond=0)
        if target <= now:
            target += timedelta(days=1)
        return target

    def initial_due(self, now: datetime) -> datetime:
        """First due time: today's slot while we're still inside its
        minute, else the next occurrence."""
        target = now.replace(hour=self.hour, minute=self.minute, second=0, microsecond=0)
        if now >= target + timedelta(minutes=1):
            target += timedelta(days=1)
        return target


class CronScheduler:
    """Daily hour:minute scheduler; jobs are lock-guarded (no overlap
    with a running sync — the reference skips instead of queueing)."""

    def __init__(self, lock: SyncLock | None = None, poll_seconds: float = 10.0):
        self.lock = lock
        self.poll_seconds = poll_seconds
        self.jobs: dict[str, ScheduledJob] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def add_job(self, name: str, hour: int, minute: int, fn: Callable[[], None]) -> ScheduledJob:
        job = ScheduledJob(name=name, hour=hour, minute=minute, fn=fn)
        self.jobs[name] = job
        return job

    def remove_job(self, name: str) -> None:
        self.jobs.pop(name, None)

    def _should_fire(self, job: ScheduledJob, now: datetime) -> bool:
        # due-time comparison, not exact hour:minute equality: if a long
        # sync blocks the poll loop past another job's minute, that job
        # fires (late) on the next poll instead of silently missing its
        # daily slot — APScheduler-style misfire grace.
        if job.next_due is None:
            job.next_due = job.initial_due(now)
        return now >= job.next_due

    def _execute(self, job: ScheduledJob, now: datetime) -> None:
        job.last_run = now
        job.next_due = job.next_fire(now)
        if self.lock is not None and not self.lock.acquire():
            job.skipped += 1  # non-reentrant: a sync is already running
            return
        try:
            job.fn()
            job.runs += 1
        except Exception as e:  # noqa: BLE001 — scheduler boundary
            job.errors.append(str(e))
        finally:
            if self.lock is not None:
                self.lock.release()

    def run_pending(self, now: datetime | None = None) -> int:
        """Fire every due job once; returns number fired (test hook —
        the thread loop calls this every poll)."""
        now = now or datetime.now()
        fired = 0
        for job in list(self.jobs.values()):
            if self._should_fire(job, now):
                self._execute(job, now)
                fired += 1
        return fired

    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.is_set():
                self.run_pending()
                self._stop.wait(self.poll_seconds)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
