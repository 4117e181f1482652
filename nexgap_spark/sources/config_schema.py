"""S12 (validation half): framework-config schema validation, mirroring the
reference's pydantic models (converter/schema/framework_config_schema.py:
29-142) as a dependency-free driver-side validator, plus the resolution
checks the reference leaves implicit (workflow edge endpoints must be
declared nodes; every agent's llm_config must name a declared config).

The reference validates the config BEFORE anything consumes it
(framework_config_schema.py:131-141 rejects empty agents/llm_configs). The
engine's analog: call ``require_valid_framework_config`` before building /
broadcasting the agent→tools map (functions/prompts.agent_tools_map) — a
bad config must fail on the driver, at plan time, not as a thousand
executor-side KeyErrors mid-job.
"""

from __future__ import annotations

import re
from typing import Any

_NODE_TYPES = ("agent", "tool", "mcp")


def _require_str(errors: list[str], obj: dict, key: str, where: str) -> str | None:
    val = obj.get(key)
    if not isinstance(val, str) or not val.strip():
        errors.append(f"{where}: missing required field {key!r}")
        return None
    return val


def _check_range(errors: list[str], obj: dict, key: str, lo: float, hi: float, where: str) -> None:
    if key in obj and obj[key] is not None:
        try:
            v = float(obj[key])
        except (TypeError, ValueError):
            errors.append(f"{where}: {key} must be numeric, got {obj[key]!r}")
            return
        if not lo <= v <= hi:
            errors.append(f"{where}: {key}={v} outside [{lo}, {hi}]")


def validate_framework_config(cfg: dict[str, Any]) -> list[str]:
    """All violations, not just the first — the reference's pydantic model
    also reports per-field. Empty list = valid. Extra keys are allowed
    (the reference sets extra='allow', :128)."""
    errors: list[str] = []
    if not isinstance(cfg, dict):
        return ["framework config must be a mapping"]

    # agents — required, non-empty (:131-135)
    agents = cfg.get("agents")
    agent_names: list[str] = []
    if not isinstance(agents, list) or not agents:
        errors.append("agents: at least one agent definition is required")
        agents = []
    for i, a in enumerate(agents):
        where = f"agents[{i}]"
        if not isinstance(a, dict):
            errors.append(f"{where}: must be a mapping")
            continue
        name = _require_str(errors, a, "agent_name", where)
        _require_str(errors, a, "sysprompt_path", where)
        _require_str(errors, a, "llm_config", where)
        if name is not None:
            if name in agent_names:
                errors.append(f"{where}: duplicate agent_name {name!r}")
            agent_names.append(name)
        if "tools" in a and not isinstance(a.get("tools"), list):
            errors.append(f"{where}: tools must be a list of tool names")

    # llm_configs — required, non-empty, bounded fields (:29-46, :137-141)
    llm_configs = cfg.get("llm_configs")
    llm_names: set[str] = set()
    if not isinstance(llm_configs, list) or not llm_configs:
        errors.append("llm_configs: at least one LLM config is required")
        llm_configs = []
    for i, c in enumerate(llm_configs):
        where = f"llm_configs[{i}]"
        if not isinstance(c, dict):
            errors.append(f"{where}: must be a mapping")
            continue
        name = _require_str(errors, c, "llm_name", where)
        _require_str(errors, c, "provider", where)
        _require_str(errors, c, "model", where)
        _check_range(errors, c, "max_tokens", 1, 200_000, where)
        _check_range(errors, c, "temperature", 0.0, 2.0, where)
        _check_range(errors, c, "timeout", 1, 300, where)
        if name is not None:
            if name in llm_names:
                errors.append(f"{where}: duplicate llm_name {name!r}")
            llm_names.add(name)

    # tools — optional (:64-74)
    tools = cfg.get("tools")
    tool_names: set[str] = set()
    if tools is not None:
        if not isinstance(tools, list):
            errors.append("tools: must be a list")
            tools = []
        for i, tdef in enumerate(tools):
            where = f"tools[{i}]"
            if not isinstance(tdef, dict):
                errors.append(f"{where}: must be a mapping")
                continue
            name = _require_str(errors, tdef, "tool_name", where)
            _require_str(errors, tdef, "description", where)
            _require_str(errors, tdef, "config_path", where)
            _require_str(errors, tdef, "binding", where)
            if name is not None:
                tool_names.add(name)

    # workflow — optional; nodes typed, ids unique, edges resolve (:77-101)
    workflow = cfg.get("workflow")
    if workflow is not None:
        if not isinstance(workflow, dict):
            errors.append("workflow: must be a mapping")
        else:
            _require_str(errors, workflow, "name", "workflow")
            node_ids: set[str] = set()
            for i, n in enumerate(workflow.get("nodes") or []):
                where = f"workflow.nodes[{i}]"
                if not isinstance(n, dict):
                    errors.append(f"{where}: must be a mapping")
                    continue
                nid = _require_str(errors, n, "id", where)
                if n.get("type") not in _NODE_TYPES:
                    errors.append(
                        f"{where}: type must be one of {list(_NODE_TYPES)}, got {n.get('type')!r}"
                    )
                if nid is not None:
                    if nid in node_ids:
                        errors.append(f"{where}: duplicate node id {nid!r}")
                    node_ids.add(nid)
            for i, e in enumerate(workflow.get("edges") or []):
                where = f"workflow.edges[{i}]"
                if not isinstance(e, dict):
                    errors.append(f"{where}: must be a mapping")
                    continue
                frm = e.get("from") or e.get("from_")
                to = e.get("to")
                for label, endpoint in (("from", frm), ("to", to)):
                    if not isinstance(endpoint, str) or not endpoint:
                        errors.append(f"{where}: missing required field {label!r}")
                    elif endpoint not in node_ids:
                        errors.append(
                            f"{where}: {label}={endpoint!r} is not a declared workflow node"
                        )

    # mcp_servers — optional (:104-111)
    mcp_servers = cfg.get("mcp_servers")
    if mcp_servers is not None:
        if not isinstance(mcp_servers, list):
            errors.append("mcp_servers: must be a list")
            mcp_servers = []
        for i, s in enumerate(mcp_servers):
            where = f"mcp_servers[{i}]"
            if not isinstance(s, dict):
                errors.append(f"{where}: must be a mapping")
                continue
            _require_str(errors, s, "name", where)
            _require_str(errors, s, "type", where)
            _require_str(errors, s, "url", where)

    # resolution checks — an agent referencing an undeclared llm_config or
    # tool is the executor-side KeyError this validator exists to pre-empt.
    # Per the reference model (framework_config_schema.py:56-61), an
    # agent's `tools` entries reference the `tools` SECTION (MCP tools ride
    # the separate per-agent `mcp_servers` field), so a ref that doesn't
    # resolve is dangling even when the section is absent entirely — that
    # case would otherwise drop the agent's tools silently downstream.
    for i, a in enumerate(agents):
        if not isinstance(a, dict):
            continue
        where = f"agents[{i}]"
        ref = a.get("llm_config")
        if isinstance(ref, str) and ref and llm_names and ref not in llm_names:
            errors.append(f"{where}: llm_config {ref!r} does not resolve to a declared llm_name")
        if isinstance(a.get("tools"), list):
            for tref in a["tools"]:
                if isinstance(tref, str) and tref and tref not in tool_names:
                    errors.append(
                        f"{where}: tool {tref!r} does not resolve to a declared tool_name"
                    )
    return errors


def require_valid_framework_config(cfg: dict[str, Any]) -> dict[str, Any]:
    """Raise ValueError listing every violation; return the config unchanged
    when valid. Call this before agent_tools_map / broadcast."""
    errors = validate_framework_config(cfg)
    if errors:
        raise ValueError(
            "invalid framework config:\n  " + "\n  ".join(errors)
        )
    return cfg


# ---------------------------------------------------------------------------
# NexAU runtime config validation — the twin of validate_framework_config
# for the OTHER config format the reference ships (per-agent NexAU runtime
# configs, converter/schema/nexau_config_schema.py:29-123): LLM generation-
# parameter ranges, tool binding format "module.path:function_name",
# unique tool / sub-agent names, and recursive sub-agent config
# validation. Unlike the framework config (extra='allow'), the reference's
# NexauConfig sets extra='forbid' at the TOP level — unknown keys are
# violations (nested models keep pydantic's default tolerance).
# ---------------------------------------------------------------------------

_NEXAU_TOP_KEYS = frozenset(
    {
        "name",
        "max_context",
        "max_running_subagents",
        "system_prompt",
        "system_prompt_type",
        "llm_config",
        "tools",
        "sub_agents",
    }
)

_PROMPT_TYPES = ("string", "file", "jinja")

# module.path:function_name — dotted importable path, colon, identifier
# (nexau_config_schema.py:61-63 documents the format; the reference's
# runtime importlib-resolves it, so a malformed binding is a guaranteed
# executor-side ImportError/AttributeError later)
_BINDING_RE = re.compile(
    r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*:[A-Za-z_][A-Za-z0-9_]*$"
)


def _check_int_min(errors: list[str], obj: dict, key: str, lo: int, where: str) -> None:
    if key in obj and obj[key] is not None:
        v = obj[key]
        if isinstance(v, bool) or not isinstance(v, int):
            errors.append(f"{where}: {key} must be an integer, got {v!r}")
        elif v < lo:
            errors.append(f"{where}: {key}={v} below minimum {lo}")


def validate_nexau_config(
    cfg: dict[str, Any],
    *,
    load_sub_agent: Any | None = None,
    _seen: frozenset[str] = frozenset(),
) -> list[str]:
    """All violations, not just the first. Empty list = valid.

    ``load_sub_agent``: optional callable ``config_path -> dict`` that
    resolves a sub-agent's config for RECURSIVE validation (the reference's
    NexauSubAgent.config_path points at another nexau config). Cycles are
    reported, not followed — ``_seen`` carries the path chain.
    """
    errors: list[str] = []
    if not isinstance(cfg, dict):
        return ["nexau config must be a mapping"]

    # extra='forbid' (nexau_config_schema.py:98-100)
    for k in cfg:
        if k not in _NEXAU_TOP_KEYS:
            errors.append(f"unknown top-level field {k!r} (nexau config forbids extras)")

    # required non-blank strings (:78, :84 + the two field_validators)
    _require_str(errors, cfg, "name", "nexau")
    _require_str(errors, cfg, "system_prompt", "nexau")

    _check_int_min(errors, cfg, "max_context", 1, "nexau")
    _check_int_min(errors, cfg, "max_running_subagents", 1, "nexau")

    spt = cfg.get("system_prompt_type")
    if spt is not None and spt not in _PROMPT_TYPES:
        errors.append(
            f"nexau: system_prompt_type must be one of {list(_PROMPT_TYPES)}, got {spt!r}"
        )

    # llm_config — optional mapping, bounded generation params (:29-55)
    llm = cfg.get("llm_config")
    if llm is not None:
        if not isinstance(llm, dict):
            errors.append("llm_config: must be a mapping")
        else:
            where = "llm_config"
            _check_range(errors, llm, "temperature", 0.0, 2.0, where)
            _check_range(errors, llm, "top_p", 0.0, 1.0, where)
            _check_range(errors, llm, "frequency_penalty", -2.0, 2.0, where)
            _check_range(errors, llm, "presence_penalty", -2.0, 2.0, where)
            _check_int_min(errors, llm, "max_tokens", 1, where)
            _check_int_min(errors, llm, "max_retries", 0, where)
            if llm.get("timeout") is not None:
                try:
                    if float(llm["timeout"]) <= 0:
                        errors.append(f"{where}: timeout={llm['timeout']} must be > 0")
                except (TypeError, ValueError):
                    errors.append(f"{where}: timeout must be numeric, got {llm['timeout']!r}")
            if "debug" in llm and not isinstance(llm.get("debug"), bool):
                errors.append(f"{where}: debug must be a boolean, got {llm['debug']!r}")

    # tools — name/yaml_path/binding all required, names unique, binding
    # format module.path:function_name (:58-64, :113-118)
    tools = cfg.get("tools")
    if tools is not None:
        if not isinstance(tools, list):
            errors.append("tools: must be a list")
            tools = []
        tool_names: set[str] = set()
        for i, tdef in enumerate(tools):
            where = f"tools[{i}]"
            if not isinstance(tdef, dict):
                errors.append(f"{where}: must be a mapping")
                continue
            name = _require_str(errors, tdef, "name", where)
            _require_str(errors, tdef, "yaml_path", where)
            binding = _require_str(errors, tdef, "binding", where)
            if binding is not None and not _BINDING_RE.match(binding):
                errors.append(
                    f"{where}: binding {binding!r} is not module.path:function_name"
                )
            if name is not None:
                if name in tool_names:
                    errors.append(f"{where}: duplicate tool name {name!r}")
                tool_names.add(name)

    # sub_agents — name/config_path required, names unique (:67-71,
    # :120-125), recursion via load_sub_agent
    subs = cfg.get("sub_agents")
    if subs is not None:
        if not isinstance(subs, list):
            errors.append("sub_agents: must be a list")
            subs = []
        sub_names: set[str] = set()
        for i, s in enumerate(subs):
            where = f"sub_agents[{i}]"
            if not isinstance(s, dict):
                errors.append(f"{where}: must be a mapping")
                continue
            name = _require_str(errors, s, "name", where)
            path = _require_str(errors, s, "config_path", where)
            if name is not None:
                if name in sub_names:
                    errors.append(f"{where}: duplicate sub-agent name {name!r}")
                sub_names.add(name)
            if path is not None and load_sub_agent is not None:
                if path in _seen:
                    errors.append(f"{where}: sub-agent cycle via {path!r}")
                    continue
                try:
                    sub_cfg = load_sub_agent(path)
                except Exception as exc:  # noqa: BLE001 — a violation, not a crash
                    errors.append(f"{where}: config_path {path!r} failed to load: {exc}")
                    continue
                for sub_err in validate_nexau_config(
                    sub_cfg, load_sub_agent=load_sub_agent, _seen=_seen | {path}
                ):
                    errors.append(f"{where} ({path}): {sub_err}")
    return errors


def require_valid_nexau_config(
    cfg: dict[str, Any], *, load_sub_agent: Any | None = None
) -> dict[str, Any]:
    """Raise ValueError listing every violation; return the config unchanged
    when valid. Call this before the nexau convert path consumes/broadcasts
    anything derived from the config."""
    errors = validate_nexau_config(cfg, load_sub_agent=load_sub_agent)
    if errors:
        raise ValueError("invalid nexau config:\n  " + "\n  ".join(errors))
    return cfg
