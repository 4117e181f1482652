"""Taxonomy-tree operators (SURVEY §1.1d, S14, J7, A3, A7, R5).

The reference keeps a recursive bilingual tree in memory and walks it per
sample (tree_manager.py:39-92, :60-71). Spark-first: the tree is exploded
ONCE driver-side into a flat paths table (root→leaf paths with id/label
arrays), and every downstream operation — weighted sampling, counting,
statistics, expansion — is a DataFrame op over that table. The tree is a
versioned DataFrame: expansion rounds append rows, no file locks (the
reference's flock dance at file_lock.py:109-160 disappears into union +
re-aggregate).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.schemas import SAMPLING_COUNTS_SCHEMA, TAXONOMY_PATHS_SCHEMA

PATH_SEP = "→"  # reference tree_manager.py:217-219


def explode_tree(
    tree: dict[str, Any], *, framework: str
) -> list[dict[str, Any]]:
    """S14: recursive {id,en,zh,children} JSON → flat root→leaf path rows
    (driver-side recursion — trees are a few hundred nodes; the DataFrame is
    the scaled artifact, not the recursion)."""
    paths: list[dict[str, Any]] = []

    def walk(node: dict[str, Any], ids: list[str], ens: list[str], zhs: list[str]) -> None:
        ids = ids + [node["id"]]
        ens = ens + [node["en"]]
        zhs = zhs + [node["zh"]]
        children = node.get("children") or []
        if not children:
            paths.append(
                {
                    "framework": framework,
                    "path_id": PATH_SEP.join(ids),
                    "node_ids": ids,
                    "en_labels": ens,
                    "zh_labels": zhs,
                    "depth": len(ids),
                }
            )
            return
        for child in children:
            walk(child, ids, ens, zhs)

    walk(tree, [], [], [])
    return paths


def paths_df(spark: SparkSession, tree: dict[str, Any], *, framework: str) -> DataFrame:
    return spark.createDataFrame(
        explode_tree(tree, framework=framework), schema=TAXONOMY_PATHS_SCHEMA
    )


def label_string(df: DataFrame, *, language: str = "english") -> DataFrame:
    """F19: 'A → B → C' label join (reference tree_manager.py:109-111)."""
    col = "zh_labels" if language.lower() in ("chinese", "zh", "zh-cn") else "en_labels"
    return df.withColumn("path_string", F.array_join(F.col(col), f" {PATH_SEP} "))


def join_counts(paths: DataFrame, counts: DataFrame) -> DataFrame:
    """J7: weight candidate paths by historical sample counts; unseen paths
    count 0 (reference tree_manager.py:188-215 + sampling_manager.py:192-228).
    The counts table is a histogram ⇒ broadcast side."""
    return paths.join(
        F.broadcast(counts.select("framework", "path_id", "cnt")),
        ["framework", "path_id"],
        "left",
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))


def empty_counts(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=SAMPLING_COUNTS_SCHEMA)


def record_samples(counts: DataFrame, sampled: DataFrame) -> DataFrame:
    """A3 round-merge: add this round's sampled path_ids into the histogram
    (union + re-aggregate; commutative, lock-free)."""
    delta = sampled.groupBy("framework", "path_id").agg(F.count("*").alias("cnt"))
    return (
        counts.unionByName(delta)
        .groupBy("framework", "path_id")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def tree_stats(paths: DataFrame) -> DataFrame:
    """A7 (reference tree_manager.py:281-295): per-framework tree statistics —
    total nodes (distinct across paths), total paths, depth min/max/avg."""
    path_stats = paths.groupBy("framework").agg(
        F.count("*").alias("total_paths"),
        F.max("depth").alias("max_depth"),
        F.min("depth").alias("min_depth"),
        F.avg("depth").alias("avg_depth"),
    )
    node_counts = (
        paths.select("framework", F.explode("node_ids").alias("node_id"))
        .groupBy("framework")
        .agg(F.countDistinct("node_id").alias("total_nodes"))
    )
    return path_stats.join(node_counts, "framework")


def expand_tree_round(
    paths: DataFrame,
    proposals: DataFrame,
    *,
    min_parent_depth: int = 1,
) -> DataFrame:
    """R5 batch form (reference tree_manager.py:376-486 re-planned): a round
    of taxonomy expansion. ``proposals`` carries (framework, parent_path_id,
    new_id, new_en, new_zh); invalid parents and ids colliding with an
    existing sibling are dropped; survivors append as new leaf paths whose
    node id is parent-prefixed (reference id-prefix rule).

    The reference locks the tree file and mutates in place per sample; here
    the tree is immutable per round and expansion is a validated union —
    the same semantics the reference's every-10-samples flush already
    approximates."""
    parents = paths.select(
        "framework",
        F.col("path_id").alias("parent_path_id"),
        F.col("node_ids").alias("p_ids"),
        F.col("en_labels").alias("p_ens"),
        F.col("zh_labels").alias("p_zhs"),
        F.col("depth").alias("p_depth"),
    ).filter(F.col("p_depth") >= min_parent_depth)
    # intra-batch dedupe first: two identical proposals in one round (LLM
    # batches repeat themselves) must yield ONE new path, not duplicate
    # path_id rows that downstream counts would double
    proposals = proposals.dropDuplicates(["framework", "parent_path_id", "new_id"])
    valid = proposals.join(parents, ["framework", "parent_path_id"])
    prefixed = valid.withColumn(
        "child_id", F.concat(F.element_at("p_ids", -1), F.lit("_"), F.col("new_id"))
    )
    # drop collisions with existing SIBLINGS — keyed by (framework, parent
    # node list, child id). Keying on child_id alone would also drop valid
    # proposals under different parents whose last node ids coincide (node
    # ids are only unique per level, not globally).
    existing = paths.filter(F.size("node_ids") >= 2).select(
        "framework",
        F.expr("slice(node_ids, 1, size(node_ids) - 1)").alias("p_ids"),
        F.element_at("node_ids", -1).alias("child_id"),
    )
    fresh = prefixed.join(existing, ["framework", "p_ids", "child_id"], "left_anti")
    new_paths = fresh.select(
        "framework",
        F.concat_ws(PATH_SEP, F.concat(F.col("p_ids"), F.array(F.col("child_id")))).alias(
            "path_id"
        ),
        F.concat(F.col("p_ids"), F.array(F.col("child_id"))).alias("node_ids"),
        F.concat(F.col("p_ens"), F.array(F.col("new_en"))).alias("en_labels"),
        F.concat(F.col("p_zhs"), F.array(F.col("new_zh"))).alias("zh_labels"),
        (F.col("p_depth") + 1).cast("int").alias("depth"),
    )
    return paths.unionByName(new_paths)


def write_tree_html(
    paths: DataFrame,
    out_path: str,
    *,
    language: str = "english",
    counts: DataFrame | None = None,
    max_paths: int = 100_000,
) -> str:
    """S10 (reference problem_type_tree/visualizer.py:37-74): render the
    taxonomy tree + statistics to ONE self-contained HTML file. The
    reference collects the in-memory tree and emits a D3 page; here the
    paths TABLE is the tree, so the sink re-nests the (capped) collected
    paths driver-side and renders a dependency-free collapsible tree —
    no CDN scripts, so the artifact works air-gapped. Driver-side by
    contract (single output file, like S8); the explicit cap turns an
    accidental huge collect into an error. Returns ``out_path``."""
    import html as _html
    from pathlib import Path

    label_col = (
        "zh_labels" if language.lower() in ("chinese", "zh", "zh-cn") else "en_labels"
    )
    rows = paths.select(
        "framework", "path_id", "node_ids", label_col, "depth"
    ).limit(max_paths + 1).collect()
    if len(rows) > max_paths:
        raise ValueError(
            f"write_tree_html: tree exceeds max_paths={max_paths}; "
            "a taxonomy this size needs a paged/sharded render, not one file"
        )
    count_map: dict[tuple[str, str], int] = {}
    if counts is not None:
        # same driver-OOM guard as the paths side: a counts table can't be
        # bigger than the rendered tree, so the same cap applies
        crows = counts.select("framework", "path_id", "n_samples").limit(
            max_paths + 1
        ).collect()
        if len(crows) > max_paths:
            raise ValueError(
                f"write_tree_html: counts exceed max_paths={max_paths}; "
                "aggregate or filter the counts to the rendered tree first"
            )
        count_map = {(r["framework"], r["path_id"]): r["n_samples"] for r in crows}

    # re-nest: per framework, a trie keyed by node id carrying its label
    trees: dict[str, dict] = {}
    for r in rows:
        node = trees.setdefault(r["framework"], {"label": r["framework"], "kids": {}})
        for nid, lab in zip(r["node_ids"], r[label_col]):
            node = node["kids"].setdefault(nid, {"label": lab, "kids": {}})
        node["n_samples"] = count_map.get((r["framework"], r["path_id"]))

    def render(node: dict, depth: int) -> str:
        lab = _html.escape(str(node["label"]))
        badge = (
            f' <span class="n">({node["n_samples"]})</span>'
            if node.get("n_samples") is not None
            else ""
        )
        if not node["kids"]:
            return f"<li><span class='leaf'>{lab}</span>{badge}</li>"
        inner = "".join(
            render(k, depth + 1) for _, k in sorted(node["kids"].items())
        )
        op = " open" if depth < 2 else ""
        return (
            f"<li><details{op}><summary>{lab}{badge}</summary>"
            f"<ul>{inner}</ul></details></li>"
        )

    # statistics block — same figures as tree_stats (A7), computed from the
    # already-collected rows (no second job)
    stat_rows = []
    for fw in sorted(trees):
        fw_rows = [r for r in rows if r["framework"] == fw]
        depths = [r["depth"] for r in fw_rows]
        nodes = {nid for r in fw_rows for nid in r["node_ids"]}
        stat_rows.append(
            f"<tr><td>{_html.escape(fw)}</td><td>{len(nodes)}</td>"
            f"<td>{len(fw_rows)}</td><td>{min(depths)}</td><td>{max(depths)}</td>"
            f"<td>{sum(depths)/len(depths):.2f}</td></tr>"
        )
    body = "".join(
        f"<h2>{_html.escape(fw)}</h2><ul class='tree'>{render(t, 0)}</ul>"
        for fw, t in sorted(trees.items())
    )
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>Problem type taxonomy</title><style>"
        "body{font-family:sans-serif;margin:2em}ul.tree,ul.tree ul{list-style:none;"
        "padding-left:1.2em}summary{cursor:pointer}.leaf{color:#333}"
        ".n{color:#888;font-size:smaller}table{border-collapse:collapse}"
        "td,th{border:1px solid #ccc;padding:2px 8px}</style></head><body>"
        "<h1>Problem type taxonomy</h1>"
        "<table><tr><th>framework</th><th>nodes</th><th>paths</th>"
        "<th>min depth</th><th>max depth</th><th>avg depth</th></tr>"
        + "".join(stat_rows)
        + "</table>"
        + body
        + "</body></html>"
    )
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(doc, encoding="utf-8")
    return str(p)
