from .core import Agent, Conversation
from .tools import (
    BaseTool,
    GetSyncStatusTool,
    GetTableStatsTool,
    ListTablesTool,
    QueryTableTool,
    StartSyncTool,
    ToolRegistry,
    ToolResult,
)

__all__ = [
    "Agent",
    "BaseTool",
    "Conversation",
    "GetSyncStatusTool",
    "GetTableStatsTool",
    "ListTablesTool",
    "QueryTableTool",
    "StartSyncTool",
    "ToolRegistry",
    "ToolResult",
]
