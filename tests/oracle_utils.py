"""Order-insensitive Spark-vs-DuckDB result comparison, mirroring the
driver's correctness gate (row count + schema + value hash with columns
sorted by name)."""

from __future__ import annotations

import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float noise below the rounding we apply in queries
        return round(v + 0.0, 9)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    # Decimal and other numerics → float-ish string
    if type(v).__name__ == "Decimal":
        return round(float(v), 9)
    return v


def rows_to_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
    if ms != md:
        only_s = [k for k in ms if ms[k] != md.get(k, 0)][:3]
        only_d = [k for k in md if md[k] != ms.get(k, 0)][:3]
        return False, f"value mismatch; spark-side sample={only_s} duck-side sample={only_d}"
    return True, "ok"
