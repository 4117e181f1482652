"""Change-data-capture apply: merge a change stream into a base snapshot
(upsert + delete), latest-version-wins — the batch half of a lakehouse
MERGE INTO, expressed engine-natively.

Scale shape: union base+changes (no join!), one per-key window keyed the
same way a MERGE shuffle would be. With the base bucketed on the key
(sources/bucketed.write_bucketed) the shuffle of the big side disappears
entirely and only the (small) change set moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DELETE_OP = "D"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: list[str],
    version_col: str,
    op_col: str | None = None,
) -> DataFrame:
    """Apply upserts (and deletes, if ``op_col`` is given with 'D' markers)
    to ``base``. The base is treated as version 0 of every key; the change
    set carries ``version_col`` > 0. For each key the row with the highest
    (version, is-change) wins; winners marked delete are dropped.

    Deterministic: ties on version resolve toward the change side (an
    explicit side marker — base and change rows both carry op='U', so the
    op column alone cannot express it), then toward 'U' over 'D', then by
    a payload hash so even duplicate change rows pick a stable winner.
    """
    if op_col is None:
        changes = changes.withColumn("_op", F.lit("U"))
        op_col = "_op"
    b = (
        base.withColumn(version_col, F.lit(0).cast("long"))
        .withColumn(op_col, F.lit("U"))
        .withColumn("_src", F.lit(0))
    )
    cols = b.columns
    merged = b.select(cols).unionByName(
        changes.withColumn(version_col, F.col(version_col).cast("long"))
        .withColumn("_src", F.lit(1))
        .select(cols)
    )
    payload = [c for c in cols if c not in (*key_cols, version_col, op_col, "_src")]
    # hashable_cols: a map-typed payload column (e.g. events.props) would
    # make the raw xxhash64 an analysis error
    from nexgap_spark.operators.skew import hashable_cols

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.col("_src").desc(),
        F.col(op_col).desc(),
        F.xxhash64(*hashable_cols(merged, payload)) if payload else F.lit(0),
    )
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col(op_col) != DELETE_OP))
        .drop("_rk", op_col, "_src")
    )
