"""System-prompt cleanup and tool-definition synthesis (SURVEY F9, F10, J5;
behavioral parity with reference convert_spans_to_chatcompletion.py:553-748).
Pure functions; the agent→tools map is built driver-side and broadcast.
"""

from __future__ import annotations

import re
from typing import Any

# F9 — three pattern families, sentinel or markdown-heading variants
# (reference :590-627). First matching pattern per family wins.
TOOL_SECTION_PATTERNS = (
    r"<TOOL_DEFINITIONS_START>.*?<TOOL_DEFINITIONS_END>",
    r"## Available Tools\s*\n.*?(?=## Available Sub-Agents|## Available Sub-agents|$)",
)
SUB_AGENT_SECTION_PATTERNS = (
    r"<SUB_AGENTS_DEFINITIONS_START>.*?<SUB_AGENTS_DEFINITIONS_END>",
    r"## Available Sub-Agents.*?(?=\nWhen you use tools|\nFor parallel execution|\nFor batch processing|$)",
)
USAGE_SECTION_PATTERNS = (
    r"<TOOL_USAGE_INSTRUCTIONS_START>.*?<TOOL_USAGE_INSTRUCTIONS_END>",
    r"\nWhen you use tools or sub-agents.*?(?=\n\n[A-Z]|\n\nIMPORTANT:|$)",
)


def clean_system_prompt(content: str) -> str:
    """Remove tool-definition, sub-agent, and usage-instruction sections from
    a system prompt (they are re-expressed as structured `tools`)."""
    out = content
    for family in (TOOL_SECTION_PATTERNS, SUB_AGENT_SECTION_PATTERNS, USAGE_SECTION_PATTERNS):
        for pattern in family:
            if re.search(pattern, out, re.DOTALL):
                out = re.sub(pattern, "", out, flags=re.DOTALL)
                break
    return out


def sub_agent_tool_definition(agent_name: str, description: str | None = None) -> dict[str, Any]:
    """J5/J6: a callable sub-agent exposed as an OpenAI tool definition
    (reference :655-678). `parameters` is kept as a dict here; the Spark
    schema stores it JSON-encoded (schemas.TOOL_DEFINITION_TYPE)."""
    return {
        "type": "function",
        "function": {
            "name": f"{agent_name}_sub_agent",
            "description": description or f"Specialized agent for {agent_name}-related tasks",
            "parameters": {
                "type": "object",
                "properties": {
                    "message": {
                        "type": "string",
                        "description": "Task description or message to send to the sub-agent",
                    }
                },
                "required": ["message"],
            },
        },
    }


# F10 — tool-definition synthesis from free-text description
# (reference :680-748): parse a `Usage: <tool_use>…` block for parameter
# names, `(required)` markers, and `type: X` annotations.
RE_USAGE_BLOCK = re.compile(r"Usage:\s*<tool_use>(.*?)</tool_use>", re.DOTALL)
RE_PARAM_LINE = re.compile(r"<(\w+)>(.*?)</\1>", re.DOTALL)
RE_TYPE_NOTE = re.compile(r"type:\s*(\w+)", re.IGNORECASE)


def tool_definition_from_description(tool_name: str, description: str) -> dict[str, Any]:
    """Synthesize a JSON-Schema tool definition from descriptive text. Falls
    back to a single free-form 'content' parameter when no usage block is
    present."""
    properties: dict[str, Any] = {}
    required: list[str] = []
    usage = RE_USAGE_BLOCK.search(description)
    if usage:
        params_m = re.search(r"<parameter>(.*?)</parameter>", usage.group(1), re.DOTALL)
        body = params_m.group(1) if params_m else usage.group(1)
        for name, note in RE_PARAM_LINE.findall(body):
            if name in ("tool_name",):
                continue
            type_m = RE_TYPE_NOTE.search(note)
            properties[name] = {
                "type": (type_m.group(1).lower() if type_m else "string"),
                "description": note.strip(),
            }
            if "(required" in note.lower():
                required.append(name)
    if not properties:
        properties["content"] = {"type": "string", "description": "Tool input"}
    params: dict[str, Any] = {"type": "object", "properties": properties}
    if required:
        params["required"] = required
    return {
        "type": "function",
        "function": {
            "name": tool_name,
            "description": re.sub(RE_USAGE_BLOCK, "", description).strip(),
            "parameters": params,
        },
    }


def agent_tools_map(
    agents: list[dict[str, Any]],
    tools_by_agent: dict[str, list[dict[str, Any]]],
    workflow_edges: list[tuple[str, str]] | None = None,
) -> dict[str, list[dict[str, Any]]]:
    """J5+J6: agent_name → [tool definitions], where workflow successors
    become callable sub-agent tools (reference :119-258, :174-198). Built
    once driver-side, broadcast to executors."""
    descriptions = {a["agent_name"]: a.get("description") for a in agents}
    successors: dict[str, list[str]] = {}
    for frm, to in workflow_edges or []:
        successors.setdefault(frm, []).append(to)
    out: dict[str, list[dict[str, Any]]] = {}
    for a in agents:
        name = a["agent_name"]
        defs = list(tools_by_agent.get(name, []))
        for succ in successors.get(name, []):
            defs.append(sub_agent_tool_definition(succ, descriptions.get(succ)))
        out[name] = defs
    return out


def agent_tools_map_from_config(cfg: dict[str, Any]) -> dict[str, list[dict[str, Any]]]:
    """S12 → J5/J6 wiring: validate a framework config (sources.config_schema,
    mirroring the reference's pydantic gate at
    converter/schema/framework_config_schema.py:131-141) and ONLY THEN build
    the broadcastable agent→tools map from it — a bad config fails on the
    driver at plan time, not as executor-side KeyErrors.

    Tool definitions are synthesized from the declared tool descriptions
    (F10); workflow edges between agent-typed nodes become callable
    sub-agent tools (J6, reference :174-198)."""
    from nexgap_spark.sources.config_schema import require_valid_framework_config

    require_valid_framework_config(cfg)
    tool_defs = {
        t["tool_name"]: tool_definition_from_description(t["tool_name"], t["description"])
        for t in cfg.get("tools") or []
    }
    tools_by_agent = {
        a["agent_name"]: [tool_defs[ref] for ref in a.get("tools", []) if ref in tool_defs]
        for a in cfg["agents"]
    }
    workflow = cfg.get("workflow") or {}
    agent_nodes = {n["id"] for n in workflow.get("nodes") or [] if n.get("type") == "agent"}
    # accept the same 'from'/'from_' key aliases the validator does (the
    # reference's pydantic model uses from_ with alias 'from')
    edges = []
    for e in workflow.get("edges") or []:
        frm = e.get("from", e.get("from_"))
        if frm in agent_nodes and e.get("to") in agent_nodes:
            edges.append((frm, e["to"]))
    return agent_tools_map(cfg["agents"], tools_by_agent, workflow_edges=edges)
