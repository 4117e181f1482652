"""Taxonomy explode + sampling operators (Spark-backed, determinism-pinned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexgap_spark.operators import sampling, taxonomy
from tests.fixtures_tree import EXPECTED_PATH_IDS, TREE


def test_explode_tree_pure():
    rows = taxonomy.explode_tree(TREE, framework="medical")
    assert {r["path_id"] for r in rows} == EXPECTED_PATH_IDS
    by_id = {r["path_id"]: r for r in rows}
    assert by_id["root→health→exercise→cardio"]["depth"] == 4
    assert by_id["root→finance→tax"]["zh_labels"] == ["咨询", "金融", "税务"]


def test_paths_df_and_label_string(spark):
    df = taxonomy.paths_df(spark, TREE, framework="medical")
    labeled = taxonomy.label_string(df, language="chinese")
    row = labeled.filter(F.col("path_id") == "root→finance→tax").first()
    assert row.path_string == "咨询 → 金融 → 税务"


def test_tree_stats(spark):
    df = taxonomy.paths_df(spark, TREE, framework="medical")
    s = taxonomy.tree_stats(df).first()
    assert s.total_paths == 4
    assert s.total_nodes == 8
    assert s.max_depth == 4 and s.min_depth == 3


def test_join_counts_and_record_samples(spark):
    paths = taxonomy.paths_df(spark, TREE, framework="medical")
    counts = taxonomy.empty_counts(spark)
    joined = taxonomy.join_counts(paths, counts)
    assert joined.filter(F.col("cnt") != 0).count() == 0

    sampled = paths.select("framework", "path_id").limit(2)
    counts2 = taxonomy.record_samples(counts, sampled)
    assert counts2.count() == 2
    # second round accumulates
    counts3 = taxonomy.record_samples(counts2, sampled)
    assert {r.cnt for r in counts3.collect()} == {2}


def test_inverse_frequency_weights(spark):
    counts = spark.createDataFrame(
        [("medical", "a", 0), ("medical", "b", 9)], "framework string, path_id string, cnt long"
    )
    w = sampling.inverse_frequency_weights(counts).collect()
    probs = {r.path_id: r.prob for r in w}
    # 1/(0+1)^1.5 = 1 vs 1/(10)^1.5 ≈ 0.0316 → a dominates
    assert probs["a"] > 0.95 and abs(sum(probs.values()) - 1.0) < 1e-9


def test_weighted_sample_deterministic_and_biased(spark):
    counts = spark.createDataFrame(
        [("a", 0), ("b", 50)], "path_id string, cnt long"
    )
    weighted = sampling.inverse_frequency_weights(counts)
    s1 = sampling.weighted_sample(weighted, n=50, key_col="path_id", seed=7).collect()
    s2 = sampling.weighted_sample(weighted, n=50, key_col="path_id", seed=7).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    picks = [r.path_id for r in s1]
    assert picks.count("a") > 45  # inverse-frequency bias
    assert len(picks) == 50


def test_truncate_trace(spark):
    paths = taxonomy.paths_df(spark, TREE, framework="medical")
    t = sampling.truncate_trace(paths, seed=3)
    for r in t.collect():
        assert 2 <= len(r.truncated_nodes) <= len(r.node_ids)
        assert r.problem_type == r.truncated_nodes[-1]
        assert r.node_ids[: len(r.truncated_nodes)] == r.truncated_nodes


def test_pick_by_distribution(spark):
    df = spark.range(1000)
    out = sampling.pick_by_distribution(
        df, distribution={"easy": 0.2, "medium": 0.5, "hard": 0.3}, seed=11
    )
    dist = {r.difficulty: r.cnt for r in out.groupBy("difficulty").agg(F.count("*").alias("cnt")).collect()}
    assert 120 < dist["easy"] < 280
    assert 400 < dist["medium"] < 600
    assert 200 < dist["hard"] < 400


def test_expand_tree_round(spark):
    paths = taxonomy.paths_df(spark, TREE, framework="medical")
    proposals = spark.createDataFrame(
        [
            ("medical", "root→health→diet", "vegan", "Vegan", "素食"),  # valid
            ("medical", "root→nope", "x", "X", "X"),  # unknown parent → dropped
        ],
        "framework string, parent_path_id string, new_id string, new_en string, new_zh string",
    )
    expanded = taxonomy.expand_tree_round(paths, proposals)
    assert expanded.count() == 5
    new = expanded.filter(F.col("path_id").contains("vegan")).first()
    assert new.path_id == "root→health→diet→diet_vegan"
    assert new.en_labels[-1] == "Vegan"
    assert new.depth == 4
    # same proposal again → sibling collision → no growth
    expanded2 = taxonomy.expand_tree_round(expanded, proposals)
    assert expanded2.count() == 5


def test_merge_histogram(spark):
    prior = spark.createDataFrame([("f", "p1", 5)], "framework string, path_id string, cnt long")
    delta = spark.createDataFrame(
        [("f", "p1", 2), ("f", "p2", 1)], "framework string, path_id string, cnt long"
    )
    merged = sampling.merge_histogram(prior, delta, key_cols=["framework", "path_id"])
    got = {r.path_id: r.cnt for r in merged.collect()}
    assert got == {"p1": 7, "p2": 1}


def test_expand_tree_round_batch_dupes_and_sibling_scope(spark):
    from nexgap_spark.operators import taxonomy

    paths = spark.createDataFrame(
        [
            ("fw", "root/a", ["root", "a"], ["r", "a"], ["r", "a"], 2),
            ("fw", "root/b", ["root", "b"], ["r", "b"], ["r", "b"], 2),
            ("fw", "root/a/a_x", ["root", "a", "a_x"], ["r", "a", "x"], ["r", "a", "x"], 3),
        ],
        "framework string, path_id string, node_ids array<string>, "
        "en_labels array<string>, zh_labels array<string>, depth int",
    )
    proposals = spark.createDataFrame(
        [
            ("fw", "root/a", "x", "x-en", "x-zh"),   # collides with existing sibling a_x
            ("fw", "root/b", "y", "y-en", "y-zh"),   # valid
            ("fw", "root/b", "y", "y-en", "y-zh"),   # intra-batch duplicate
        ],
        "framework string, parent_path_id string, new_id string, new_en string, new_zh string",
    )
    out = taxonomy.expand_tree_round(paths, proposals, min_parent_depth=2)
    new = {r.path_id for r in out.collect()} - {r.path_id for r in paths.collect()}
    # exactly one new path: the duplicate proposal collapsed, the sibling
    # collision dropped (path ids join with the operator's PATH_SEP)
    assert new == {taxonomy.PATH_SEP.join(["root", "b", "b_y"])}


def test_write_tree_html(spark, tmp_path):
    # S10: self-contained HTML render of the taxonomy + stats
    paths = taxonomy.paths_df(spark, TREE, framework="medical")
    counts = paths.select(
        "framework", "path_id", F.lit(3).alias("n_samples")
    ).limit(1)
    out = taxonomy.write_tree_html(
        paths, str(tmp_path / "viz" / "tree.html"), counts=counts
    )
    html = open(out, encoding="utf-8").read()
    assert html.startswith("<!doctype html>")
    # every node label appears, escaped; stats table carries the framework
    for r in paths.collect():
        for lab in r["en_labels"]:
            assert lab in html
    assert "medical" in html and "<table>" in html
    assert "(3)" in html  # the counts badge
    # no external resources: the artifact must work air-gapped
    assert "http" not in html.lower().replace("htttp", "")
    # chinese labels render under language="chinese"
    out_zh = taxonomy.write_tree_html(
        paths, str(tmp_path / "tree_zh.html"), language="chinese"
    )
    html_zh = open(out_zh, encoding="utf-8").read()
    zh = {lab for r in paths.collect() for lab in r["zh_labels"]}
    assert all(z in html_zh for z in zh)
    # cap errors loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_paths"):
        taxonomy.write_tree_html(paths, str(tmp_path / "x.html"), max_paths=1)
