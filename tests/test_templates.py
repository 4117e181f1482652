"""F17 template fill: pure + column forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexgap_spark.functions.templates import fill_template, template_column


def test_simple_fill():
    assert fill_template("Hello {name}!", {"name": "world"}) == "Hello world!"


def test_missing_placeholder_empty():
    assert fill_template("A{missing}B", {}) == "AB"


def test_conditional_block_kept_and_dropped():
    t = "Task: {task}.{?ctx} Context: {ctx}.{/ctx} Go."
    assert fill_template(t, {"task": "x", "ctx": "y"}) == "Task: x. Context: y. Go."
    assert fill_template(t, {"task": "x"}) == "Task: x. Go."
    assert fill_template(t, {"task": "x", "ctx": ""}) == "Task: x. Go."


def test_template_column(spark):
    df = spark.createDataFrame(
        [("alpha", "c1"), ("beta", None)], "task string, ctx string"
    )
    col = template_column(
        "Task: {task}.{?ctx} Context: {ctx}.{/ctx} Go.",
        task=F.col("task"),
        ctx=F.col("ctx"),
    )
    got = {r.task: r.prompt for r in df.withColumn("prompt", col).collect()}
    assert got["alpha"] == "Task: alpha. Context: c1. Go."
    assert got["beta"] == "Task: beta. Go."
