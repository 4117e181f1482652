"""Prompt-template fill (SURVEY F17; reference
Gyrfalcon/llm_interface/query_generator.py:438-548).

Named ``{placeholders}`` plus conditional blocks that disappear when their
variable is absent: ``{?name}...{name}...{/name}`` keeps the section only if
``name`` is provided and non-empty. Pure string function + a Spark column
builder for distributed prompt assembly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_COND = re.compile(r"\{\?(\w+)\}(.*?)\{/\1\}", re.DOTALL)
_PLACEHOLDER = re.compile(r"\{(\w+)\}")


def fill_template(template: str, values: dict[str, str | None]) -> str:
    """Resolve conditional blocks, then substitute placeholders. Unknown
    placeholders resolve to '' (the reference's prompts tolerate missing
    optional context the same way)."""

    def cond(m: re.Match) -> str:
        return m.group(2) if values.get(m.group(1)) else ""

    resolved = _COND.sub(cond, template)
    return _PLACEHOLDER.sub(lambda m: str(values.get(m.group(1)) or ""), resolved)


def template_column(template: str, **cols: Column) -> Column:
    """Distributed prompt assembly: the template compiles to a concat of
    literals and columns (JVM-side; no UDF). Conditional blocks are resolved
    with when()/otherwise on the gating column."""

    def build(text: str) -> list[Column]:
        parts: list[Column] = []
        last = 0
        for m in _PLACEHOLDER.finditer(text):
            if m.start() > last:
                parts.append(F.lit(text[last : m.start()]))
            name = m.group(1)
            # coalesce: F.concat null-propagates, so one NULL column would
            # turn the WHOLE prompt NULL — fill_template substitutes '' for
            # None, and the column builder must match that contract
            parts.append(
                F.coalesce(cols[name], F.lit("")) if name in cols else F.lit("")
            )
            last = m.end()
        if last < len(text):
            parts.append(F.lit(text[last:]))
        return parts

    segments: list[Column] = []
    last = 0
    for m in _COND.finditer(template):
        if m.start() > last:
            segments.extend(build(template[last : m.start()]))
        name, body = m.group(1), m.group(2)
        gate = cols.get(name)
        inner = F.concat(*build(body)) if build(body) else F.lit("")
        if gate is not None:
            segments.append(
                F.when(gate.isNotNull() & (gate != ""), inner).otherwise(F.lit(""))
            )
        last = m.end()
    if last < len(template):
        segments.extend(build(template[last:]))
    return F.concat(*segments) if segments else F.lit("")
