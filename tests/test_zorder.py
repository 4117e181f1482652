"""Z-order clustering: interleave correctness vs a Python reference, the
write path's file-span tightness (the data-skipping contract), and edge
cases (NULLs, degenerate ranges, clamping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexgap_spark.operators import zorder


def _py_z(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 7, 128, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder.zvalue([F.col("a"), F.col("b")], 8).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_z([a, b], 8), (a, b)


def test_zvalue_three_columns_and_width_guard(spark):
    df = spark.createDataFrame([(5, 2, 7)], "a long, b long, c long")
    (z,) = df.select(
        zorder.zvalue([F.col("a"), F.col("b"), F.col("c")], 4).alias("z")
    ).first()
    assert z == _py_z([5, 2, 7], 4)
    with pytest.raises(ValueError):
        zorder.zvalue([F.col("a"), F.col("b")], 32)  # 64 bits > 62


def test_linear_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,), (None,)], "x double"
    )
    out = df.select(
        zorder.linear_bucket(F.col("x"), F.lit(0.0), F.lit(100.0), 8).alias("b")
    ).collect()
    got = [r.b for r in out]
    # min -> 0, mid -> 128, max clamps to 255, out-of-range clamps, NULL -> 0
    assert got == [0, 128, 255, 0, 255, 0]
    # degenerate range: everything buckets to 0
    same = df.select(
        zorder.linear_bucket(F.col("x"), F.lit(7.0), F.lit(7.0), 8).alias("b")
    ).collect()
    assert all(r.b == 0 for r in same)


def test_zorder_frame_computes_ranges(spark):
    df = spark.range(256).select(
        F.col("id").alias("x"), (255 - F.col("id")).alias("y")
    )
    zdf = zorder.zorder_frame(df, ["x", "y"], bits=8)
    rows = zdf.collect()
    for r in rows:
        assert r._z == _py_z([r.x, r.y], 8)


def test_zorder_write_balances_file_spans(spark, tmp_path):
    # the z layout's contract is BALANCED per-dimension spans: a 1-D ts
    # sort leaves every file's user span at full width (no predicate on
    # user can skip anything), while the Morton layout bounds BOTH dims'
    # mean normalized span well below 1 (per-file area is ~1/n_files for
    # either layout — the curve trades a little ts tightness for user
    # tightness, which is the point)
    n, files = 20_000, 16
    df = spark.range(n).select(
        (F.col("id") % 997).alias("user_id"),
        (F.xxhash64("id") % 100_000).alias("tsk"),
    )
    base, zpath = str(tmp_path / "by_ts"), str(tmp_path / "zord")
    df.repartitionByRange(files, "tsk").sortWithinPartitions("tsk").write.parquet(base)
    zorder.zorder_write(df, zpath, ["user_id", "tsk"], bits=8, n_files=files)

    def mean_spans(path):
        spans = zorder.file_spans(spark, path, ["user_id", "tsk"]).collect()
        u = sum((r.user_id_max - r.user_id_min) / 996.0 for r in spans) / len(spans)
        t = sum((r.tsk_max - r.tsk_min) / 200_000.0 for r in spans) / len(spans)
        return u, t

    u_base, _ = mean_spans(base)
    u_z, t_z = mean_spans(zpath)
    assert u_base > 0.9, u_base  # 1-D sort: user spans the full range
    assert u_z < 0.5 and t_z < 0.5, (u_z, t_z)  # curve: both dims bounded
    # and the rewrite is lossless
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("user_id")).first()[0] == df.agg(F.sum("user_id")).first()[0]


def test_zorder_write_prunes_selective_scan(spark, tmp_path):
    # the actual skipping effect: a conjunctive box predicate on BOTH dims
    # must read fewer files from the z layout than a single-dim sort gives
    # it on the non-sorted dim (file-level pruning via footer min/max)
    n, files = 20_000, 16
    df = spark.range(n).select(
        (F.col("id") % 997).alias("user_id"),
        (F.xxhash64("id") % 100_000).alias("tsk"),
    )
    zpath = str(tmp_path / "zb")
    zorder.zorder_write(df, zpath, ["user_id", "tsk"], bits=8, n_files=files)
    spans = zorder.file_spans(spark, zpath, ["user_id", "tsk"]).collect()
    # count files whose footer range intersects the box — what a reader prunes with
    lo_u, hi_u, lo_t, hi_t = 100, 200, -50_000, -30_000
    touched = [
        r
        for r in spans
        if not (r.user_id_max < lo_u or r.user_id_min > hi_u)
        and not (r.tsk_max < lo_t or r.tsk_min > hi_t)
    ]
    assert len(touched) <= len(spans) // 2, (len(touched), len(spans))
    # correctness of the pruned answer vs the full scan
    got = (
        spark.read.parquet(zpath)
        .where(
            (F.col("user_id").between(lo_u, hi_u))
            & (F.col("tsk").between(lo_t, hi_t))
        )
        .count()
    )
    want = df.where(
        (F.col("user_id").between(lo_u, hi_u)) & (F.col("tsk").between(lo_t, hi_t))
    ).count()
    assert got == want


def test_zvalue_is_bijective_on_bucket_space(spark):
    # every (a, b) pair in the 4-bit bucket space maps to a UNIQUE z value
    # covering exactly [0, 2^8): the interleave loses nothing, so z-range
    # pruning can always be translated back to bucket rectangles
    df = spark.range(16).select(F.col("id").alias("a")).crossJoin(
        spark.range(16).select(F.col("id").alias("b"))
    )
    zs = [r.z for r in df.select(zorder.zvalue([F.col("a"), F.col("b")], 4).alias("z")).collect()]
    assert sorted(zs) == list(range(256))


def test_zorder_randomized_against_python_reference(spark):
    # batched randomized sweep: 300 random (value, range) cases through
    # linear_bucket + zvalue on ONE DataFrame, cross-checked against a
    # pure-Python mirror of the same IEEE-double arithmetic (identical
    # ops => identical rounding on both sides)
    import random

    rng = random.Random(13)
    rows = []
    for i in range(300):
        mn = rng.uniform(-1e6, 1e6)
        mx = mn + rng.choice([0.0, rng.uniform(1e-3, 1e6)])
        x = rng.choice(
            [mn, mx, rng.uniform(mn - 10, mx + 10), rng.uniform(-1e7, 1e7), None]
        )
        y = rng.uniform(-1e3, 1e3)
        rows.append((i, x, mn, mx, y))
    df = spark.createDataFrame(
        rows, "i long, x double, mn double, mx double, y double"
    )
    bits = 6
    bx = zorder.linear_bucket(F.col("x"), F.col("mn"), F.col("mx"), bits)
    by = zorder.linear_bucket(F.col("y"), F.lit(-1e3), F.lit(1e3), bits)
    got = {
        r.i: (r.bx, r.by, r.z)
        for r in df.select(
            "i", bx.alias("bx"), by.alias("by"),
            zorder.zvalue([bx, by], bits).alias("z"),
        ).collect()
    }

    def ref_bucket(x, mn, mx):
        n = 1 << bits
        span = mx - mn
        if x is None or span <= 0.0:
            return 0
        import math

        raw = math.floor((x - mn) / span * n)
        return int(min(max(raw, 0), n - 1))

    for i, x, mn, mx, y in rows:
        ebx, eby = ref_bucket(x, mn, mx), ref_bucket(y, -1e3, 1e3)
        assert got[i] == (ebx, eby, _py_z([ebx, eby], bits)), (i, x, mn, mx)


def test_zvalue_prefix_locality_pure_python():
    # Morton property: two points share a z-prefix of 2k bits iff they
    # agree on the top k bits of BOTH dimensions — the fact that makes a
    # z-range scan translate back to a bucket hyper-rectangle
    import random

    rng = random.Random(7)
    bits = 8
    for _ in range(2000):
        a1, b1, a2, b2 = (rng.randrange(256) for _ in range(4))
        for k in (1, 2, 4):
            same_prefix = (_py_z([a1, b1], bits) >> (2 * (bits - k))) == (
                _py_z([a2, b2], bits) >> (2 * (bits - k))
            )
            expect = (a1 >> (bits - k)) == (a2 >> (bits - k)) and (
                b1 >> (bits - k)
            ) == (b2 >> (bits - k))
            assert same_prefix == expect, (a1, b1, a2, b2, k)


def test_file_spans_string_stats_decoded(spark, tmp_path):
    """r14 review: pyarrow surfaces string-column stats as bytes; file_spans
    must decode them so StringType min/max are str (and comparable)."""
    from nexgap_spark.operators.zorder import file_spans

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("alpha", 1), ("omega", 2), ("mid", 3)], "s string, v long"
    ).repartition(2).write.parquet(path)
    spans = file_spans(spark, path, ["s", "v"]).collect()
    assert spans
    for r in spans:
        if r["s_min"] is not None:
            assert isinstance(r["s_min"], str)
            assert isinstance(r["s_max"], str)
            assert r["s_min"] <= r["s_max"]


def test_file_spans_hive_partitioned_layout(spark, tmp_path):
    """r14 review: hive-partitioned (key=value subdirectory) layouts must
    report their files recursively instead of returning zero rows."""
    from nexgap_spark.operators.zorder import file_spans

    path = str(tmp_path / "hive")
    spark.createDataFrame(
        [(i, i % 2, f"s{i}") for i in range(20)], "v long, p int, s string"
    ).write.partitionBy("p").parquet(path)
    spans = file_spans(spark, path, ["v"])
    rows = spans.collect()
    assert rows, "hive layout returned no rows"
    assert any("p=0" in r["file"] or "p=1" in r["file"] for r in rows)
    assert sum(r["n_rows"] for r in rows) == 20
    # a PARTITION column exists only in directory names, not footers: the
    # contract is typed NULL spans (same as stats-disabled), not a crash
    out = file_spans(spark, path, ["p"]).collect()
    assert out and all(r["p_min"] is None and r["p_max"] is None for r in out)
