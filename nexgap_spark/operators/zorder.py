"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

Parquet scans prune row groups / files by the footer min-max of the
predicate columns, but a layout can only be tight on ONE sort key: sorting
by `ts` makes `user_id` spans in every file as wide as the table. Z-order
interleaves the bits of several columns' bucket ranks into one integer and
range-partitions + sorts on THAT, so every output file covers a small
hyper-rectangle of the key space and predicates on ANY of the clustered
columns skip most files. This is the standard lakehouse layout optimization
(Delta/Iceberg `OPTIMIZE ... ZORDER BY`), re-expressed with plain DataFrame
ops: an agg for the value ranges, a codegen'd bit-interleave projection, a
`repartitionByRange` + `sortWithinPartitions` write. No UDF anywhere.

At 100 TB the knobs are `bits` (curve resolution — 8 bits/column = 256
buckets is plenty for file-level skipping) and `n_files` (file granularity;
skipping works per row group as well, so oversizing files still prunes).
The range computation is one cheap min/max agg; buckets are LINEAR between
the observed min/max — rank-based bucketing (quantiles) would equalize
bucket mass under heavy skew at the cost of a sampled quantile pass, and
can be layered on by pre-mapping the column. See SCALE.md (round 13) for
the measured file-span and selective-scan effect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["linear_bucket", "zvalue", "zorder_frame", "zorder_write", "file_spans"]


def linear_bucket(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map ``col`` to an integer bucket in [0, 2**bits) linearly between
    ``vmin`` and ``vmax`` (inclusive). NULLs and degenerate ranges
    (vmax == vmin) go to bucket 0; values are clamped, so rows outside a
    stale range still bucket validly (incremental writers reuse ranges).

    Pure integer/double arithmetic — identical semantics are expressible
    in ANSI SQL, which keeps the whole curve oracle-checkable."""
    n = F.lit(1 << bits)
    span = vmax.cast("double") - vmin.cast("double")
    raw = F.floor((col.cast("double") - vmin.cast("double")) / span * n.cast("double"))
    clamped = F.least(F.greatest(raw, F.lit(0)), n - F.lit(1))
    return (
        F.when(col.isNull() | (span <= F.lit(0.0)), F.lit(0))
        .otherwise(clamped)
        .cast("long")
    )


def zvalue(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each bucket column into one Morton code
    (column 0 owns the least-significant interleaved bit). k columns ×
    b bits emit k·b output bits — keep k·b ≤ 62 for a long. The expression
    is a flat sum of shift/mask terms, fully inside whole-stage codegen."""
    k = len(buckets)
    if k * bits > 62:
        raise ValueError(f"z-value would need {k * bits} bits; max 62")
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """(min, max) of each column as doubles, from ONE agg — the range
    convention every curve consumer shares (zorder_frame and the q114
    oracle-pinned catalog query both call this, so they cannot drift)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
    row = df.agg(*aggs).first()
    return {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 8,
    ranges: dict[str, tuple] | None = None,
    z_col: str = "_z",
) -> DataFrame:
    """Attach the Morton code of ``cols`` as ``z_col``. ``ranges`` maps
    column → (min, max); when omitted they come from one min/max agg over
    ``df`` (a single cheap scan — at 100 TB, pass catalog-kept ranges in).
    Timestamp/date columns participate via their numeric cast. A ``z_col``
    name already present in ``df`` is rejected rather than silently
    overwritten (r13 review — same class as the fingerprint temp-column
    shadowing fix)."""
    if z_col in df.columns:
        raise ValueError(
            f"z_col {z_col!r} already exists in the input; pass a different z_col"
        )
    if ranges is None:
        ranges = column_ranges(df, cols)
    buckets = [
        linear_bucket(
            F.col(c).cast("double"),
            F.lit(ranges[c][0]),
            F.lit(ranges[c][1]),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(z_col, zvalue(buckets, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 32,
    ranges: dict[str, tuple] | None = None,
    z_col: str = "_z",
) -> None:
    """Write ``df`` to ``path`` clustered on the Z-curve of ``cols``:
    range-partition by z (each file owns a contiguous curve segment — a
    small hyper-rectangle of the key space) and sort within partitions so
    row-group stats are tight too. The z column itself is dropped; the
    layout IS the index. ``z_col`` only needs changing when the default
    temp name collides with a data column (zorder_frame raises then)."""
    zdf = zorder_frame(df, cols, bits=bits, ranges=ranges, z_col=z_col)
    (
        zdf.repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
        .drop(z_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_spans(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max spans of ``cols`` read from the parquet footers —
    the exact statistics a scan prunes with. Returns one row per data file
    with ``<c>_min`` / ``<c>_max`` for each requested column; the
    normalized mean span (vs the global range) is the clustering-quality
    metric asserted in tests and SCALE.md. Footer-only: no row data read.

    The result schema is built from the table's own parquet schema (not
    inferred from the collected rows), so an empty directory or a column
    with statistics disabled in every file returns typed NULL spans
    instead of crashing schema inference (r13 review).

    r14 review hardening: (a) pyarrow surfaces string/binary column stats
    as ``bytes`` — those are decoded to ``str`` for StringType fields
    BEFORE any cross-row-group min/max comparison, so mixed bytes/str never
    reach the comparison or createDataFrame; (b) the listing walks the
    directory RECURSIVELY, so hive-partitioned layouts (``key=value/``
    subdirectories) report their files instead of returning no rows — the
    ``file`` column holds the path relative to ``path``. Hive PARTITION
    columns themselves exist only in directory names, not footers —
    partition discovery puts them in the TABLE schema (so the
    not-in-parquet-schema check passes), but no footer carries their
    stats, and the contract is typed all-NULL spans for them (asserted in
    test_file_spans_hive_partitioned_layout); spans of a partition column
    are the partition values, which the caller can read off the ``file``
    paths."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    table_schema = spark.read.parquet(path).schema
    dtypes = {f.name: f.dataType for f in table_schema.fields}
    fields = [StructField("file", StringType()), StructField("n_rows", LongType())]
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"column {c!r} not in parquet schema at {path}")
        fields.append(StructField(f"{c}_min", dtypes[c]))
        fields.append(StructField(f"{c}_max", dtypes[c]))
    schema = StructType(fields)

    def _norm(v, spark_type):
        # pyarrow stats for BYTE_ARRAY columns come back as bytes even when
        # the logical type is UTF8; decode for string fields so min/max
        # folds compare like types and createDataFrame gets a str
        if isinstance(v, bytes) and isinstance(spark_type, StringType):
            return v.decode("utf-8", "replace")
        return v

    data_files = []
    for dirpath, _dirs, names in os.walk(path):
        for name in names:
            if name.endswith(".parquet"):
                full = os.path.join(dirpath, name)
                data_files.append((os.path.relpath(full, path), full))
    rows = []
    for rel, full in sorted(data_files):
        md = pq.ParquetFile(full).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec = [rel, md.num_rows]
        for c in cols:
            if c not in idx:
                # column absent from THIS file's footer (schema-evolved
                # part): typed NULL span, same as stats-disabled
                rec.extend([None, None])
                continue
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = _norm(st.min, dtypes[c]), _norm(st.max, dtypes[c])
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            rec.extend([lo, hi])
        rows.append(tuple(rec))
    return spark.createDataFrame(rows, schema)
