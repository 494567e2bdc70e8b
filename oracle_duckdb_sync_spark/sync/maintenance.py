"""Warehouse maintenance pass: compaction + staging GC over a catalog.

The reference never needs this (DuckDB stores a table as one file and
transactions clean up after themselves); a parquet warehouse fed by
incremental syncs needs BOTH jobs on a schedule:

- :func:`sinks.compact` — merge the one-file-per-task-per-batch
  accumulation back to ``target_file_bytes``-sized files;
- :func:`sinks.vacuum_orphans` — remove swap-staging dirs a crashed
  upsert/compact left behind (age-gated).

`run_maintenance` runs both over every table of a
:class:`sources.catalog.Catalog` and returns one report row per table —
the shape a scheduled job logs. `schedule_maintenance` registers it on
the repo's :class:`sync.scheduler.CronScheduler`, reusing the sync
lock so maintenance never overlaps a running sync (the same
non-reentrancy contract the reference's scheduler has for syncs).
"""

from __future__ import annotations

from typing import Sequence

from ..sources import sinks
from ..sources.catalog import Catalog


def run_maintenance(
    catalog: Catalog,
    tables: Sequence[str] | None = None,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
    vacuum_min_age_seconds: float = 24 * 3600.0,
) -> list[dict]:
    """Compact + vacuum every (or the named) catalog table; one report
    dict per table: name, partitions_compacted, files_before/after,
    orphans_removed. Unpartitioned tables only — partitioned tables in
    this engine live behind explicit paths, where callers invoke
    ``sinks.compact(path, partition_cols=...)`` with their layout."""
    report: list[dict] = []
    for name in tables if tables is not None else catalog.list_tables():
        path = catalog.table_path(name)
        stats = sinks.compact(
            catalog.spark,
            path,
            target_file_bytes=target_file_bytes,
            min_files=min_files,
        )
        removed = sinks.vacuum_orphans(path, vacuum_min_age_seconds)
        report.append({"table": name, **stats, "orphans_removed": len(removed)})
    return report


def schedule_maintenance(
    scheduler,
    catalog: Catalog,
    hour: int = 3,
    minute: int = 30,
    **kwargs,
):
    """Register the maintenance pass as a daily lock-guarded cron job
    (runs at ``hour:minute``; skipped, not queued, while a sync holds
    the lock). Returns the ScheduledJob; the latest report is stored on
    ``job.last_report`` for observability."""

    def job_fn() -> None:
        job.last_report = run_maintenance(catalog, **kwargs)

    job = scheduler.add_job("warehouse_maintenance", hour, minute, job_fn)
    job.last_report = None
    return job
