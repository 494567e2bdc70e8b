from .core import (
    Agent,
    AgentChunk,
    Conversation,
    LlmReply,
    LlmStreamEvent,
    ToolCall,
)
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
    "AgentChunk",
    "LlmReply",
    "LlmStreamEvent",
    "ToolCall",
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
