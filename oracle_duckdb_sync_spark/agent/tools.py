"""Agent tool registry over the Spark-backed services (reference L1-L5).

Reference parity:
- ``BaseTool``/``ToolResult`` ABC + function-calling schema
  (agent/tools/base.py:10-57)
- ``ToolRegistry`` dynamic dispatch (agent/tools/registry.py:13-59)
- L1 list_tables, L2 get_table_stats, L3 query_table
  (agent/tools/query_tools.py:9-139)
- L4 start_sync, L5 get_sync_status — lock-guarded
  (agent/tools/sync_tools.py:9-110)

Tools return JSON-safe dicts (the LLM sees serialized results); the
heavy lifting stays in the catalog/services, so a tool call is one
Spark action at most.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ToolResult:
    success: bool
    data: dict = field(default_factory=dict)
    error: str | None = None

    def to_dict(self) -> dict:
        return {"success": self.success, "data": self.data, "error": self.error}


class BaseTool(abc.ABC):
    name: str = "tool"
    description: str = ""
    parameters: dict = {"type": "object", "properties": {}, "required": []}

    @abc.abstractmethod
    def execute(self, **kwargs: Any) -> ToolResult: ...

    def schema(self) -> dict:
        """OpenAI-style function-calling schema (agent/tools/base.py:35-57)."""
        return {
            "type": "function",
            "function": {
                "name": self.name,
                "description": self.description,
                "parameters": self.parameters,
            },
        }


class ToolRegistry:
    """Name → tool dispatch with schema listing (registry.py:13-59)."""

    def __init__(self) -> None:
        self._tools: dict[str, BaseTool] = {}

    def register(self, tool: BaseTool) -> None:
        self._tools[tool.name] = tool

    def get(self, name: str) -> BaseTool | None:
        return self._tools.get(name)

    def schemas(self) -> list[dict]:
        return [t.schema() for t in self._tools.values()]

    def execute(self, name: str, **kwargs: Any) -> ToolResult:
        tool = self._tools.get(name)
        if tool is None:
            return ToolResult(False, error=f"unknown tool: {name}")
        try:
            return tool.execute(**kwargs)
        except Exception as e:  # noqa: BLE001 — tool boundary
            return ToolResult(False, error=str(e))

    def names(self) -> list[str]:
        return sorted(self._tools)


class ListTablesTool(BaseTool):
    """L1: () → {tables, count}."""

    name = "list_tables"
    description = "List all tables available in the analytics warehouse."

    def __init__(self, catalog):
        self.catalog = catalog

    def execute(self, **_kw) -> ToolResult:
        tables = self.catalog.list_tables()
        return ToolResult(True, {"tables": tables, "count": len(tables)})


class GetTableStatsTool(BaseTool):
    """L2: (table_name) → {row_count}."""

    name = "get_table_stats"
    description = "Get row count statistics for one table."
    parameters = {
        "type": "object",
        "properties": {"table_name": {"type": "string"}},
        "required": ["table_name"],
    }

    def __init__(self, catalog):
        self.catalog = catalog

    def execute(self, table_name: str = "", **_kw) -> ToolResult:
        if not self.catalog.table_exists(table_name):
            return ToolResult(False, error=f"table not found: {table_name}")
        return ToolResult(
            True,
            {"table_name": table_name, "row_count": self.catalog.row_count(table_name)},
        )


class QueryTableTool(BaseTool):
    """L3: (table_name, limit=10) → {columns, row_count, sample[:5]}."""

    name = "query_table"
    description = "Read a limited sample of rows from a table."
    parameters = {
        "type": "object",
        "properties": {
            "table_name": {"type": "string"},
            "limit": {"type": "integer", "default": 10},
        },
        "required": ["table_name"],
    }

    def __init__(self, catalog):
        self.catalog = catalog

    def execute(self, table_name: str = "", limit: int = 10, **_kw) -> ToolResult:
        if not self.catalog.table_exists(table_name):
            return ToolResult(False, error=f"table not found: {table_name}")
        df = self.catalog.table(table_name).limit(int(limit))
        rows = [r.asDict(recursive=True) for r in df.collect()]
        return ToolResult(
            True,
            {
                "table_name": table_name,
                "columns": df.columns,
                "row_count": len(rows),
                "sample": [
                    {k: str(v) for k, v in r.items()} for r in rows[:5]
                ],
            },
        )


class StartSyncTool(BaseTool):
    """L4: (table_name, row_limit?) → started (lock-guarded)."""

    name = "start_sync"
    description = "Start a background sync of one table into the warehouse."
    parameters = {
        "type": "object",
        "properties": {
            "table_name": {"type": "string"},
            "row_limit": {"type": "integer"},
        },
        "required": ["table_name"],
    }

    def __init__(self, sync_service, source_factory):
        self.sync_service = sync_service
        self.source_factory = source_factory  # table_name -> SyncSource

    def execute(self, table_name: str = "", row_limit: int | None = None, **_kw) -> ToolResult:
        source = self.source_factory(table_name)
        worker = self.sync_service.start_sync(
            source,
            table_name,
            sync_type="test" if row_limit else None,
            row_limit=row_limit,
        )
        return ToolResult(True, {"started": True, "sync_id": worker.sync_id})


class GetSyncStatusTool(BaseTool):
    """L5: () → {state, progress, result, error}."""

    name = "get_sync_status"
    description = "Get the status of the currently running or last sync."

    def __init__(self, sync_service):
        self.sync_service = sync_service

    def execute(self, **_kw) -> ToolResult:
        status = self.sync_service.get_status()
        return ToolResult(True, {k: str(v) for k, v in status.items()})


def build_default_registry(catalog, sync_service=None, source_factory=None) -> ToolRegistry:
    reg = ToolRegistry()
    reg.register(ListTablesTool(catalog))
    reg.register(GetTableStatsTool(catalog))
    reg.register(QueryTableTool(catalog))
    if sync_service is not None and source_factory is not None:
        reg.register(StartSyncTool(sync_service, source_factory))
        reg.register(GetSyncStatusTool(sync_service))
    return reg
