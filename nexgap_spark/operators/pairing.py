"""J4 — ordered tool-call ↔ tool-result pairing (SURVEY §2.3; behavioral
parity with reference convert_spans_to_chatcompletion.py:1386-1509).

Not a join: the matching is order-sensitive *within one record's message
array* — assistant tool_calls push pending (id, name); each subsequent
"Tool execution results:" user message pops by name first, else FIFO;
unmatched results synthesize an id. Row-local state ⇒ a pandas UDF applies it
per record, embarrassingly parallel across records.
"""

from __future__ import annotations

from typing import Any

from nexgap_spark.functions.xml_tools import IdGen, deterministic_id_gen, iter_tool_results

TOOL_RESULT_PREFIX = "Tool execution results:"
FALLBACK_TOOL_NAME = "unknown_tool"


def pair_tool_results(
    messages: list[dict[str, Any]],
    next_id: IdGen | None = None,
    *,
    scope: str = "record",
) -> list[dict[str, Any]]:
    """Rewrite user-role tool-result messages into tool-role messages with the
    matching tool_call_id. Invariants (property-tested):
      * call count is conserved: every pending id is used at most once;
      * name-first matching beats FIFO;
      * unmatched results get fresh synthesized ids.
    """
    next_id = next_id or deterministic_id_gen(scope)
    out: list[dict[str, Any]] = []
    pending: list[dict[str, str | None]] = []

    def pop_match(tool_name: str) -> dict[str, str | None]:
        for i, info in enumerate(pending):
            if info.get("name") and info["name"] == tool_name:
                return pending.pop(i)
        if pending:
            return pending.pop(0)
        return {"id": next_id(), "name": tool_name}

    for msg in messages:
        role = msg.get("role")
        if role == "assistant" and isinstance(msg.get("tool_calls"), list):
            for call in msg["tool_calls"]:
                if not isinstance(call, dict):
                    continue
                if not call.get("id"):
                    call["id"] = next_id()
                fn = call.get("function")
                pending.append(
                    {"id": call["id"], "name": fn.get("name") if isinstance(fn, dict) else None}
                )
            out.append(msg)
            continue

        content = msg.get("content") or ""
        if role == "user" and content.startswith(TOOL_RESULT_PREFIX):
            results = list(iter_tool_results(content))
            for tool_name, result in results:
                info = pop_match(tool_name)
                out.append(
                    {
                        "role": "tool",
                        "tool_call_id": info.get("id") or next_id(),
                        "name": tool_name,
                        "content": result.strip(),
                    }
                )
            if not results and content.strip():
                info = pop_match(FALLBACK_TOOL_NAME)
                out.append(
                    {
                        "role": "tool",
                        "tool_call_id": info.get("id") or next_id(),
                        "name": FALLBACK_TOOL_NAME,
                        # replace-ALL, faithfully: the reference strips every
                        # occurrence (:1499-1501), so a body quoting the
                        # marker text loses those too — that is the wire
                        # semantic parity is measured against, not a bug to fix
                        "content": content.replace(TOOL_RESULT_PREFIX, "").strip(),
                    }
                )
            continue

        out.append(msg)
    return out
