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
