"""XML-structure validators V1-V6 (SURVEY §2.9; behavioral parity with the
reference's XMLValidator, converter/trace/filter_xml_errors.py:28-498) plus
the Spark-side P7 filter.

Two modes: 'a4a' (all five block validators) and 'nexau' (tool_use /
parallel_tool_calls / batch_agent only; `agent:`-prefixed tools must carry a
<message>). Pure functions → applied per assistant message via a pandas UDF,
then filtered with forall().
"""

from __future__ import annotations

import re
from collections.abc import Callable

# V1 tag grammar: letters, digits, underscore, CJK, hyphen, colon; optional
# attributes; self-closing slash (reference :74-76).
RE_TAG = re.compile(r"<(/?)([a-zA-Z一-鿿][\w一-鿿:-]*)(?:\s+[^>]*)?\s*(/?)>")
RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
HTML_VOID_TAGS = frozenset({"br", "img", "hr", "input", "meta", "link"})

MODES = ("a4a", "nexau")


def _is_agent_tool(tool_name: str | None) -> bool:
    return bool(tool_name) and tool_name.strip().startswith("agent:")


def balanced_tags(text: str) -> tuple[bool, list[str]]:
    """V1 (reference :63-116): stack-based open/close matching. HTML comments
    stripped first; explicit self-closing and HTML void tags exempt; CJK tag
    names participate."""
    errors: list[str] = []
    stack: list[tuple[str, int]] = []
    for m in RE_TAG.finditer(RE_COMMENT.sub("", text)):
        closing, name, self_close = m.group(1) == "/", m.group(2), m.group(3) == "/"
        pos = m.start()
        if self_close:
            continue
        if name.lower() in HTML_VOID_TAGS and not closing:
            continue
        if not closing:
            stack.append((name, pos))
        elif not stack:
            errors.append(f"Unmatched closing tag </{name}> at position {pos}")
        else:
            top, top_pos = stack.pop()
            if top != name:
                errors.append(
                    f"Tag mismatch: <{top}> (position {top_pos}) vs </{name}> (position {pos})"
                )
    errors.extend(f"Unclosed tag <{name}> at position {pos}" for name, pos in stack)
    return not errors, errors


def _check_tool_body(
    body: str, pos: int, desc: str, errors: list[str], *, mode: str
) -> None:
    """Shared tool-invocation checks: tool_name present, parameter present and
    internally balanced; nexau agent: tools need <message> (V2 core)."""
    name_m = re.search(r"<tool_name>(.*?)</tool_name>", body, re.DOTALL)
    if not name_m:
        errors.append(f"{desc} (position {pos}) missing <tool_name>...</tool_name>")
    param_m = re.search(r"<parameter>(.*?)</parameter>", body, re.DOTALL)
    if not param_m:
        errors.append(f"{desc} (position {pos}) missing <parameter>...</parameter>")
        return
    ok, suberrors = balanced_tags(param_m.group(1))
    if not ok:
        errors.append(f"{desc} (position {pos}) parameter internal tag mismatch")
        errors.extend(f"  └─ {e}" for e in suberrors)
    if mode == "nexau" and name_m and _is_agent_tool(name_m.group(1)):
        if not re.search(r"<message>.*?</message>", param_m.group(1), re.DOTALL):
            errors.append(f"{desc} (position {pos}) agent call missing <message>...</message>")


def validate_tool_use(content: str, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """V2 (reference :118-172)."""
    errors: list[str] = []
    blocks = list(re.finditer(r"<tool_use>(.*?)</tool_use>", content, re.DOTALL))
    if not blocks:
        if "<tool_use>" in content:
            errors.append("Found unclosed <tool_use> tag")
        return not errors, errors
    for i, m in enumerate(blocks, 1):
        _check_tool_body(m.group(1), m.start(), f"tool_use block #{i}", errors, mode=mode)
    return not errors, errors


def validate_parallel_tool_calls(content: str, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """V3 (reference :174-250): each block needs ≥1 well-formed
    <parallel_tool>; unclosed members detected by open/closed count."""
    errors: list[str] = []
    blocks = list(
        re.finditer(r"<use_parallel_tool_calls>(.*?)</use_parallel_tool_calls>", content, re.DOTALL)
    )
    if not blocks:
        if "<use_parallel_tool_calls>" in content:
            errors.append("Found unclosed <use_parallel_tool_calls> tag")
        return not errors, errors
    for i, bm in enumerate(blocks, 1):
        body, bpos = bm.group(1), bm.start()
        tools = list(re.finditer(r"<parallel_tool>(.*?)</parallel_tool>", body, re.DOTALL))
        if not tools:
            errors.append(
                f"use_parallel_tool_calls block #{i} (position {bpos}) missing <parallel_tool>...</parallel_tool>"
            )
            continue
        if len(re.findall(r"<parallel_tool>", body)) > len(tools):
            errors.append(
                f"use_parallel_tool_calls block #{i} (position {bpos}) has unclosed <parallel_tool> tag"
            )
        for j, tm in enumerate(tools, 1):
            _check_tool_body(
                tm.group(1), bpos + tm.start(), f"parallel_tool #{j}", errors, mode=mode
            )
    return not errors, errors


def _check_history_cdata(body: str, pos: int, desc: str, errors: list[str]) -> None:
    hist = re.search(r"<history>(.*?)</history>", body, re.DOTALL)
    if hist and ("<![CDATA[" not in hist.group(1) or "]]>" not in hist.group(1)):
        errors.append(f"{desc} (position {pos}) history not wrapped in <![CDATA[...]]>")


def validate_parallel_sub_agents(content: str, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """V4 (reference :252-355): agents need agent_name+message with
    CDATA-wrapped history; embedded tools checked per V2 core."""
    errors: list[str] = []
    blocks = list(
        re.finditer(r"<use_parallel_sub_agents>(.*?)</use_parallel_sub_agents>", content, re.DOTALL)
    )
    if not blocks:
        if "<use_parallel_sub_agents>" in content:
            errors.append("Found unclosed <use_parallel_sub_agents> tag")
        return not errors, errors
    for i, bm in enumerate(blocks, 1):
        body, bpos = bm.group(1), bm.start()
        agents = list(re.finditer(r"<parallel_agent>(.*?)</parallel_agent>", body, re.DOTALL))
        tools = list(re.finditer(r"<parallel_tool>(.*?)</parallel_tool>", body, re.DOTALL))
        if not agents and not tools:
            errors.append(
                f"use_parallel_sub_agents block #{i} (position {bpos}) missing parallel_agent/parallel_tool sub-blocks"
            )
        if len(re.findall(r"<parallel_agent>", body)) > len(agents):
            errors.append(
                f"use_parallel_sub_agents block #{i} (position {bpos}) has unclosed <parallel_agent> tag"
            )
        if len(re.findall(r"<parallel_tool>", body)) > len(tools):
            errors.append(
                f"use_parallel_sub_agents block #{i} (position {bpos}) has unclosed <parallel_tool> tag"
            )
        for j, am in enumerate(agents, 1):
            abody, apos = am.group(1), bpos + am.start()
            if not re.search(r"<agent_name>.*?</agent_name>", abody, re.DOTALL):
                errors.append(
                    f"parallel_agent #{j} (position {apos}) missing <agent_name>...</agent_name>"
                )
            if not re.search(r"<message>.*?</message>", abody, re.DOTALL):
                errors.append(
                    f"parallel_agent #{j} (position {apos}) missing <message>...</message>"
                )
            _check_history_cdata(abody, apos, f"parallel_agent #{j}", errors)
        for j, tm in enumerate(tools, 1):
            # embedded tools: same checks, but no nexau message requirement
            _check_tool_body(
                tm.group(1), bpos + tm.start(), f"parallel_tool #{j}", errors, mode="a4a"
            )
    return not errors, errors


def validate_sub_agent(content: str, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """V5 (reference :357-393)."""
    errors: list[str] = []
    blocks = list(re.finditer(r"<sub-agent>(.*?)</sub-agent>", content, re.DOTALL))
    if not blocks:
        if "<sub-agent>" in content:
            errors.append("Found unclosed <sub-agent> tag")
        return not errors, errors
    for i, bm in enumerate(blocks, 1):
        body, pos = bm.group(1), bm.start()
        if not re.search(r"<agent_name>.*?</agent_name>", body, re.DOTALL):
            errors.append(
                f"sub-agent block #{i} (position {pos}) missing <agent_name>...</agent_name>"
            )
        if not re.search(r"<message>.*?</message>", body, re.DOTALL):
            errors.append(f"sub-agent block #{i} (position {pos}) missing <message>...</message>")
        _check_history_cdata(body, pos, f"sub-agent block #{i}", errors)
    return not errors, errors


def validate_batch_agent(content: str, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """V6 (reference :395-460): a4a wants <agent_name>, nexau wants an
    `agent:`-prefixed <tool_name>; both want input_data_source with
    file_name+format, and a message."""
    errors: list[str] = []
    blocks = list(re.finditer(r"<use_batch_agent>(.*?)</use_batch_agent>", content, re.DOTALL))
    if not blocks:
        if "<use_batch_agent>" in content:
            errors.append("Found unclosed <use_batch_agent> tag")
        return not errors, errors
    for i, bm in enumerate(blocks, 1):
        body, pos = bm.group(1), bm.start()
        if mode == "nexau":
            name_m = re.search(r"<tool_name>(.*?)</tool_name>", body, re.DOTALL)
            if not name_m:
                errors.append(
                    f"use_batch_agent block #{i} (position {pos}) missing <tool_name>...</tool_name>"
                )
            elif not _is_agent_tool(name_m.group(1)):
                errors.append(
                    f"use_batch_agent block #{i} (position {pos}) tool_name needs agent: prefix"
                )
        elif not re.search(r"<agent_name>.*?</agent_name>", body, re.DOTALL):
            errors.append(
                f"use_batch_agent block #{i} (position {pos}) missing <agent_name>...</agent_name>"
            )
        input_m = re.search(r"<input_data_source>(.*?)</input_data_source>", body, re.DOTALL)
        if not input_m:
            errors.append(
                f"use_batch_agent block #{i} (position {pos}) missing <input_data_source>...</input_data_source>"
            )
        else:
            if not re.search(r"<file_name>.*?</file_name>", input_m.group(1), re.DOTALL):
                errors.append(
                    f"use_batch_agent block #{i} (position {pos}) input_data_source missing <file_name>"
                )
            if not re.search(r"<format>.*?</format>", input_m.group(1), re.DOTALL):
                errors.append(
                    f"use_batch_agent block #{i} (position {pos}) input_data_source missing <format>"
                )
        if not re.search(r"<message>.*?</message>", body, re.DOTALL):
            errors.append(f"use_batch_agent block #{i} (position {pos}) missing <message>...</message>")
    return not errors, errors


_A4A_VALIDATORS: tuple[Callable, ...] = (
    validate_tool_use,
    validate_sub_agent,
    validate_parallel_tool_calls,
    validate_parallel_sub_agents,
    validate_batch_agent,
)
_NEXAU_VALIDATORS: tuple[Callable, ...] = (
    validate_tool_use,
    validate_parallel_tool_calls,
    validate_batch_agent,
)


def validate_message(content: str | None, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """Run the mode's validator chain over one message (reference :481-498);
    tag-free content passes trivially."""
    if mode not in MODES:
        raise ValueError(f"Unsupported mode: {mode}")
    if not content or not isinstance(content, str) or "<" not in content:
        return True, []
    all_errors: list[str] = []
    chain = _A4A_VALIDATORS if mode == "a4a" else _NEXAU_VALIDATORS
    for v in chain:
        ok, errs = v(content, mode=mode)
        if not ok:
            all_errors.extend(errs)
    return not all_errors, all_errors


def record_is_valid(messages: list[dict] | None, *, mode: str = "a4a") -> tuple[bool, list[str]]:
    """P7 (reference :501-573): a training record is valid iff every
    assistant message's content validates."""
    if not messages:
        return True, []
    errors: list[str] = []
    for i, msg in enumerate(messages):
        if (msg or {}).get("role") != "assistant":
            continue
        ok, errs = validate_message(msg.get("content"), mode=mode)
        if not ok:
            errors.extend(f"message[{i}]: {e}" for e in errs)
    return not errors, errors
