"""ReAct agent loop with a pluggable LLM client (reference agent/core/).

Reference parity:
- ReAct loop: LLM → tool calls → tool results → LLM ... → final answer
  (agent/core/agent.py:70-143)
- Conversation history with 50-message truncation
  (agent/core/conversation.py:20-102)
- LLM client boundary (agent/core/llm_client.py) — here a plain
  callable ``llm(messages, tools) -> LlmReply`` so the engine carries
  no vendor SDK dependency; production plugs an OpenAI/other client in,
  tests use a scripted fake.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Protocol

from .tools import ToolRegistry

MAX_HISTORY_MESSAGES = 50  # agent/core/conversation.py truncation
MAX_TOOL_ITERATIONS = 8


@dataclass
class ToolCall:
    name: str
    arguments: dict
    call_id: str = ""


@dataclass
class LlmReply:
    """One model turn: either final content or tool calls."""

    content: str | None = None
    tool_calls: list[ToolCall] = field(default_factory=list)


class LlmClient(Protocol):
    def __call__(self, messages: list[dict], tools: list[dict]) -> LlmReply: ...


class Conversation:
    """Rolling message history, truncated to the newest 50 entries with
    the system prompt always preserved at index 0."""

    def __init__(self, system_prompt: str = ""):
        self.system_prompt = system_prompt
        self.messages: list[dict] = []
        if system_prompt:
            self.messages.append({"role": "system", "content": system_prompt})

    def add(self, role: str, content: str, **extra) -> None:
        self.messages.append({"role": role, "content": content, **extra})
        self._truncate()

    def _truncate(self) -> None:
        if len(self.messages) <= MAX_HISTORY_MESSAGES:
            return
        head = self.messages[:1] if self.system_prompt else []
        keep = MAX_HISTORY_MESSAGES - len(head)
        self.messages = head + self.messages[-keep:]

    def history(self) -> list[dict]:
        return list(self.messages)


class Agent:
    """Tool-calling loop: ask the LLM, run requested tools, feed results
    back, stop at a final text answer or the iteration cap."""

    def __init__(
        self,
        llm: LlmClient,
        registry: ToolRegistry,
        system_prompt: str = "You are a data-engineering assistant for a Spark analytics warehouse.",
        max_iterations: int = MAX_TOOL_ITERATIONS,
        on_step: Callable[[str, dict], None] | None = None,
    ):
        self.llm = llm
        self.registry = registry
        self.conversation = Conversation(system_prompt)
        self.max_iterations = max_iterations
        self.on_step = on_step or (lambda kind, payload: None)

    def run(self, user_message: str) -> str:
        self.conversation.add("user", user_message)
        for _ in range(self.max_iterations):
            reply = self.llm(self.conversation.history(), self.registry.schemas())
            if not reply.tool_calls:
                final = reply.content or ""
                self.conversation.add("assistant", final)
                return final
            # record the assistant tool-call turn, then execute each call
            self.conversation.add(
                "assistant",
                reply.content or "",
                tool_calls=[
                    {"name": c.name, "arguments": c.arguments, "id": c.call_id}
                    for c in reply.tool_calls
                ],
            )
            for call in reply.tool_calls:
                self.on_step("tool_call", {"name": call.name, "args": call.arguments})
                result = self.registry.execute(call.name, **call.arguments)
                self.on_step("tool_result", result.to_dict())
                self.conversation.add(
                    "tool",
                    json.dumps(result.to_dict(), default=str),
                    name=call.name,
                    tool_call_id=call.call_id,
                )
        return "Stopped: reached the tool-iteration limit without a final answer."
