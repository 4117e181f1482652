"""JSONL scan with corrupt-record side channel + idempotent-ingest ledger."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexgap_spark.sources import jsonl, ledger

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def test_corrupt_record_side_channel(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "name": "b"}\n'
        '{"id": 3 "name": "c"}\n'  # malformed
    )
    df = jsonl.read_jsonl(spark, str(p), SCHEMA)
    good, bad = jsonl.split_corrupt(df)
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 2
    assert jsonl.CORRUPT_COL not in good.columns


def test_jsonl_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "x"), (2, "y")], schema=SCHEMA)
    jsonl.write_jsonl(df, out)
    back = spark.read.schema(SCHEMA).json(out)
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}


def test_ledger_anti_join(spark, tmp_path):
    lpath = str(tmp_path / "ledger")
    cands = spark.createDataFrame([("t1",), ("t2",), ("t3",)], "trace_id string")
    led = ledger.read_ledger(spark, lpath, "trace_id")
    fresh = ledger.anti_join_processed(cands, led, "trace_id")
    assert fresh.count() == 3

    ledger.mark_processed(fresh.filter(F.col("trace_id") != "t3"), lpath, "trace_id")
    led2 = ledger.read_ledger(spark, lpath, "trace_id")
    fresh2 = ledger.anti_join_processed(cands, led2, "trace_id")
    assert {r.trace_id for r in fresh2.collect()} == {"t3"}

    # idempotent: re-marking the same keys doesn't change the outcome
    ledger.mark_processed(cands.limit(2), lpath, "trace_id")
    fresh3 = ledger.anti_join_processed(cands, ledger.read_ledger(spark, lpath, "trace_id"), "trace_id")
    assert {r.trace_id for r in fresh3.collect()} == {"t3"}


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    from nexgap_spark.session import load_table
    from nexgap_spark.sources.parquet_sink import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "ev_part")
    write_partitioned_parquet(ev, out, partition_cols=["event_type"])
    back = read_partitioned_parquet(spark, out)
    assert back.count() == ev.count()
    one = back.filter(F.col("event_type") == "view")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the filter prunes directories instead of being a data filter
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert one.count() == ev.filter(F.col("event_type") == "view").count()


def test_clustered_parquet_files_have_disjoint_ranges(spark, tmp_path):
    # range clustering must yield files whose cluster-key [min, max]
    # footer stats are disjoint — the property that lets a point/range
    # filter skip whole files at scan time
    import glob

    import pyarrow.parquet as pq

    from nexgap_spark.session import load_table
    from nexgap_spark.sources.parquet_sink import write_clustered_parquet
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "clustered")
    write_clustered_parquet(ev, out, cluster_cols=["user_id"], num_files=4)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("user_id")
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    # round-trip intact
    back = spark.read.parquet(out)
    assert back.count() == ev.count()


def test_csv_corrupt_side_channel(spark, tmp_path):
    from pyspark.sql import types as T

    from nexgap_spark.sources import csv_source
    from nexgap_spark.sources.jsonl import split_corrupt

    p = tmp_path / "rows.csv"
    p.write_text("k,v\n1,alpha\nnot_an_int,beta\n3,gamma\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = csv_source.read_csv(spark, str(p), schema)
    good, bad = split_corrupt(df)
    assert {r.k for r in good.collect()} == {1, 3}
    assert bad.count() == 1
    assert "not_an_int" in bad.collect()[0]._corrupt_record


def test_csv_roundtrip(spark, tmp_path):
    from pyspark.sql import types as T

    from nexgap_spark.sources import csv_source

    out = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "a,b"), (2, 'q"uote')], "k long, v string")
    csv_source.write_csv(df, out, single_file=True)
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = csv_source.read_csv(spark, out, schema, keep_corrupt_column=False)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a,b"), (2, 'q"uote')]


def test_schema_evolution_merge(spark, tmp_path):
    from nexgap_spark.sources.parquet_sink import read_with_schema_evolution

    v1 = str(tmp_path / "t" / "v1")
    v2 = str(tmp_path / "t" / "v2")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(v1)
    spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double").write.parquet(v2)
    df = read_with_schema_evolution(spark, v1, v2)
    assert set(df.columns) == {"k", "v", "score"}
    rows = {r.k: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob

    from nexgap_spark.sources.parquet_sink import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # simulate micro-batch fragmentation: 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 64
    n = compact_parquet(spark, src, dst, target_rows_per_file=5_000)
    assert n == 2
    assert len(glob.glob(f"{dst}/part-*")) == 2
    assert spark.read.parquet(dst).count() == 10_000


def test_compact_parquet_clustered_ranges_stay_disjoint(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob

    from nexgap_spark.sources.parquet_sink import compact_parquet

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(10_000).withColumnRenamed("id", "k").repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_rows_per_file=2_500, sort_cols=["k"])
    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        ranges.append(
            (md.row_group(0).column(0).statistics.min,
             md.row_group(md.num_row_groups - 1).column(0).statistics.max)
        )
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint → point/range filters skip whole files


def test_compact_parquet_dir(spark, tmp_path):
    from nexgap_spark.sources.parquet_sink import compact_parquet_dir

    src = str(tmp_path / "shards")
    # the incremental-ingest failure mode: 64 milli-files
    spark.range(64_000).repartition(64).write.parquet(src)
    out = str(tmp_path / "compacted")
    stats = compact_parquet_dir(spark, src, out, target_mb=256)
    assert stats["files_before"] >= 64
    assert stats["files_after"] < stats["files_before"] / 8
    assert stats["rows"] == 64_000
    got = spark.read.parquet(out)
    assert got.count() == 64_000
    assert got.selectExpr("sum(id)").first()[0] == 64_000 * 63_999 // 2
