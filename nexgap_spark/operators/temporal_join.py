"""As-of and range joins (beyond-reference operators the guide calls out as
Spark gaps; standard primitives for event/feature pipelines).

As-of join — for each left row, the latest right row with
right.ts <= left.ts within the same key — is implemented with the
union-and-window trick: tag both sides, union, window-sort once per key, and
carry the last-seen right row forward. One shuffle on the key, no per-key
loops, no `pd.merge_asof` driver trips — this scales exactly like any other
partitioned window.

Range join — left ⋈ right where right.ts ∈ [left.ts - window, left.ts) —
uses time-bucketization: equi-join on (key, bucket) for the two buckets that
can contain matches, then an exact filter. Turns an inequality join (which
Spark would plan as a broadcast nested loop) into two hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .timeutil import as_timestamp, epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row at-or-before its
    timestamp, per key. Right-side value columns come back suffixed.

    Tie rule: a right row at exactly left.ts matches (<=). When several right
    rows share a timestamp the one latest in (ts, tiebreak-order) wins —
    deterministic because the union window orders by (ts, side-tag).
    """
    # dtype-tolerant: normalize NTZ on both sides so the tagged-union struct
    # types line up and the tolerance arithmetic has a TIMESTAMP input
    left = as_timestamp(left, left_ts)
    right = as_timestamp(right, right_ts)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows at equal ts → "<=" semantics
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        F.col(on),
        "_ts",
        "_side",
        "_l",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in right_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_r_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        within = (epoch_us("_ts") - epoch_us("_r_ts")) <= int(
            tolerance_s * 1_000_000
        )
        out = out.withColumns(
            {f"_rv_{c}": F.when(within, F.col(f"_rv_{c}")) for c in right_cols}
        ).withColumn("_r_ts", F.when(within, F.col("_r_ts")))
    sel = [F.col("_l")[c].alias(c) for c in left.columns]
    sel += [F.col(f"_rv_{c}").alias(f"{c}{suffix}") for c in right_cols]
    sel += [F.col("_r_ts").alias(f"{right_ts}{suffix}")]
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_s: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """left ⋈ right on key where right.ts ∈ [left.ts - window_s, left.ts).

    Bucketized: right rows land in floor(ts/window) buckets; each left row
    probes its own bucket and the previous one — every qualifying pair is in
    one of the two — then the exact range predicate filters. Two hash joins
    instead of a nested loop."""
    # same dtype guard as asof_join: normalize NTZ, reject bigint loudly —
    # epoch_us on a raw nanos-as-long column would silently reinterpret
    # nanoseconds as seconds and the range predicate would match nothing
    left = as_timestamp(left, left_ts)
    right = as_timestamp(right, right_ts)
    win_us = int(window_s * 1_000_000)
    l = left.select(
        *left.columns,
        epoch_us(left_ts).alias("_l_us"),
        (epoch_us(left_ts) / win_us).cast("long").alias("_bkt"),
    )
    r = right.select(
        F.col(on).alias("_r_on"),
        epoch_us(right_ts).alias("_r_us"),
        (epoch_us(right_ts) / win_us).cast("long").alias("_r_bkt"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    probes = l.withColumn("_probe", F.explode(F.array(F.col("_bkt"), F.col("_bkt") - 1)))
    joined = probes.join(
        r,
        (probes["_probe"] == r["_r_bkt"]) & (probes[on] == r["_r_on"]),
    )
    in_range = (F.col("_r_us") >= F.col("_l_us") - win_us) & (
        F.col("_r_us") < F.col("_l_us")
    )
    drop = ["_l_us", "_bkt", "_probe", "_r_on", "_r_us", "_r_bkt"]
    return joined.filter(in_range).drop(*drop)
