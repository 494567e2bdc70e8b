"""ReAct agent loop with a pluggable LLM client (reference agent/core/).

Reference parity:
- ReAct loop: LLM → tool calls → tool results → LLM ... → final answer
  (agent/core/agent.py:70-143)
- Streaming loop: incremental text/tool-status/tool-result/error/done
  chunks with tool-call argument deltas reassembled mid-stream
  (agent/core/agent.py:166-280, ``process_message_stream`` +
  ``_stream_llm_response``; chunk shape ``StreamingAgentChunk``
  agent/core/agent.py:29-36)
- Conversation history with 50-message truncation
  (agent/core/conversation.py:20-102)
- LLM client boundary (agent/core/llm_client.py) — here a plain
  callable ``llm(messages, tools) -> LlmReply`` (batch) or
  ``llm(messages, tools) -> Iterator[LlmStreamEvent]`` (streaming) so
  the engine carries no vendor SDK dependency; production plugs an
  OpenAI/other client in, tests use a scripted fake.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Iterator, Protocol

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


@dataclass
class LlmStreamEvent:
    """One low-level event from a streaming LLM client — the vendor-free
    shape of an SSE delta (reference llm_client chunk types, consumed by
    agent/core/agent.py:202-280):

    - ``content``: a text delta (``content`` set)
    - ``tool_call_start``: a tool call opens (``tool_call_index``,
      ``tool_call_id``, ``tool_name`` set; arguments follow as deltas)
    - ``tool_call_delta``: an argument-JSON fragment for the call at
      ``tool_call_index``
    - ``done``: the model turn ended; ``finish_reason`` is
      ``"tool_calls"`` when buffered calls must now run
    """

    type: str
    content: str | None = None
    tool_call_index: int = 0
    tool_call_id: str = ""
    tool_name: str | None = None
    tool_arguments_delta: str | None = None
    finish_reason: str | None = None


class StreamingLlmClient(Protocol):
    def __call__(
        self, messages: list[dict], tools: list[dict]
    ) -> Iterator[LlmStreamEvent]: ...


@dataclass
class AgentChunk:
    """One user-facing chunk yielded by :meth:`Agent.run_stream`
    (reference ``StreamingAgentChunk``, agent/core/agent.py:29-36):
    type ∈ {"text", "tool_status", "tool_result", "error", "done"}."""

    type: str
    content: str | None = None
    tool_name: str | None = None
    tool_result: dict | None = None
    error: str | None = None


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
        llm_stream: StreamingLlmClient | None = None,
    ):
        self.llm = llm
        self.registry = registry
        self.conversation = Conversation(system_prompt)
        self.max_iterations = max_iterations
        self.on_step = on_step or (lambda kind, payload: None)
        self.llm_stream = llm_stream

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

    def run_stream(self, user_message: str) -> Iterator[AgentChunk]:
        """Streaming variant of :meth:`run` (reference
        ``process_message_stream`` + ``_stream_llm_response``,
        agent/core/agent.py:166-280): yields text deltas as they
        arrive, a ``tool_status`` chunk when a call opens and again
        when it executes, the ``tool_result`` after each tool, an
        ``error`` chunk on any failure, and a final ``done`` chunk
        carrying the assembled answer. Same conversation/truncation
        contract as :meth:`run`; the reference's recursion is a loop
        here so the existing ``max_iterations`` cap bounds it.

        Tool-call argument JSON arrives as ``tool_call_delta``
        fragments and is reassembled per ``tool_call_index`` before
        dispatch — unparseable argument JSON fails that ONE call (an
        unsuccessful tool result the model sees next round), not the
        whole stream."""
        if self.llm_stream is None:
            raise ValueError("Agent was built without a streaming LLM client")
        try:
            self.conversation.add("user", user_message)
            for _ in range(self.max_iterations):
                content_buf = ""
                calls_buf: dict[int, dict] = {}
                finish: str | None = None
                for ev in self.llm_stream(
                    self.conversation.history(), self.registry.schemas()
                ):
                    if ev.type == "content" and ev.content:
                        content_buf += ev.content
                        yield AgentChunk("text", content=ev.content)
                    elif ev.type == "tool_call_start":
                        yield AgentChunk(
                            "tool_status",
                            content=f"calling: {ev.tool_name}",
                            tool_name=ev.tool_name,
                        )
                        calls_buf[ev.tool_call_index] = {
                            "id": ev.tool_call_id,
                            "name": ev.tool_name,
                            "arguments": "",
                        }
                    elif ev.type == "tool_call_delta":
                        if ev.tool_call_index in calls_buf:
                            calls_buf[ev.tool_call_index]["arguments"] += (
                                ev.tool_arguments_delta or ""
                            )
                    elif ev.type == "done":
                        finish = ev.finish_reason
                        break
                if finish == "tool_calls" and calls_buf:
                    tool_calls = [calls_buf[i] for i in sorted(calls_buf)]
                    self.conversation.add(
                        "assistant", content_buf, tool_calls=tool_calls
                    )
                    for tc in tool_calls:
                        yield AgentChunk(
                            "tool_status",
                            content=f"running: {tc['name']}",
                            tool_name=tc["name"],
                        )
                        result = self._dispatch_buffered_call(tc)
                        yield AgentChunk(
                            "tool_result",
                            tool_name=tc["name"],
                            tool_result=result,
                        )
                        self.conversation.add(
                            "tool",
                            json.dumps(result, default=str),
                            name=tc["name"],
                            tool_call_id=tc["id"],
                        )
                    continue  # model sees the results next round
                self.conversation.add("assistant", content_buf)
                yield AgentChunk("done", content=content_buf)
                return
            yield AgentChunk(
                "error",
                error="reached the tool-iteration limit without a final answer",
            )
        except Exception as e:  # the stream must end loudly, not mid-air
            yield AgentChunk("error", error=str(e))

    def _dispatch_buffered_call(self, tc: dict) -> dict:
        """Parse a reassembled streaming tool call and execute it; a bad
        argument payload becomes an unsuccessful tool RESULT (the model
        can recover next round) rather than a stream-wide error."""
        try:
            args = json.loads(tc["arguments"]) if tc["arguments"] else {}
            if not isinstance(args, dict):
                raise ValueError("tool arguments must be a JSON object")
        except (json.JSONDecodeError, ValueError) as e:
            return {
                "success": False,
                "data": None,
                "error": f"invalid tool arguments: {e}",
            }
        self.on_step("tool_call", {"name": tc["name"], "args": args})
        result = self.registry.execute(tc["name"], **args).to_dict()
        self.on_step("tool_result", result)
        return result
