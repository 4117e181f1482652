"""Physical-plan regression audits (SCALE.md): pushdown reaches the scan,
dims broadcast, top-k uses rank pushdown, windows are partitioned. These
guard the *shape* of the plan — the thing that matters at 100 TB — against
refactors that silently degrade it."""

from __future__ import annotations

import pytest

from nexgap_spark.plans import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str, execute: bool = False) -> str:
    import contextlib
    import io

    df = QUERIES[name](spark, SF_DIR)
    if execute:
        # AQE finalizes the physical plan (and its codegen stages) only on
        # execution; pre-execution formatted plans show isFinalPlan=false.
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q01_column_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the 7 needed columns, not all 11
    assert "l_orderkey" not in scan_schema and "l_partkey" not in scan_schema
    assert "l_quantity" in scan_schema


def test_q02_dims_broadcast(spark):
    plan = plan_of(spark, "q02_regional_revenue")
    assert "BroadcastHashJoin" in plan
    # the only exchange on the fact side is the lineitem⋈orders hash join
    assert plan.count("BroadcastExchange") >= 1


def test_q03_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "q03_top_orders")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 10


def test_q06_multiple_pushed_filters(spark):
    plan = plan_of(spark, "q06_revenue_filter")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan


def test_q07_window_group_limit(spark):
    plan = plan_of(spark, "q07_topk_parts_per_brand")
    assert "WindowGroupLimit" in plan  # rank pushdown truncates state


def test_q08_window_is_partitioned(spark):
    plan = plan_of(spark, "q08_last_event_per_user")
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert "hashpartitioning(user_id" in plan


def test_q22_parent_join_broadcasts(spark):
    plan = plan_of(spark, "q22_span_parent_join")
    assert "BroadcastHashJoin" in plan


def test_q41_asof_no_nested_loop(spark):
    # union-and-window as-of join: one shuffle, never a nested loop
    plan = plan_of(spark, "q41_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan


def test_q42_range_join_is_hash_join(spark):
    # bucketization turns the inequality predicate into equi-joins
    plan = plan_of(spark, "q42_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_active(spark):
    # formatted explain marks codegen'd operators with "[codegen id : N]"
    plan = plan_of(spark, "q01_pricing_summary", execute=True)
    assert "codegen id" in plan


def test_q44_membership_broadcasts(spark):
    # the dedup filter must broadcast group membership, not shuffle the corpus
    plan = plan_of(spark, "q44_dedup_corpus")
    assert "BroadcastHashJoin" in plan


def test_dedup_corpus_join_modes(spark):
    # both sides of the broadcast-threshold fallback: under the cap the
    # membership side broadcasts; above it the plan degrades gracefully to a
    # (AQE-planned) shuffle join instead of forcing an oversized broadcast
    from pyspark.sql import functions as F

    from nexgap_spark.operators.dedup import dedup_corpus_join

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    membership = spark.range(0, 100, 2).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 10).alias("group_id"),
        F.lit(5).cast("long").alias("group_size"),
    )
    small = dedup_corpus_join(docs, membership, max_broadcast_rows=1000)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    # above the cap the broadcast HINT must be absent (AQE may still pick a
    # broadcast at runtime from actual sizes — that's its call, not a forced
    # oversized broadcast)
    big = dedup_corpus_join(docs, membership, max_broadcast_rows=10)
    assert "ResolvedHint" not in big._jdf.queryExecution().analyzed().toString()
    # results identical in both modes
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_q45_bucket_join_is_hash_join(spark):
    plan = plan_of(spark, "q45_hyperplane_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(bucket" in plan or "bucket" in plan


def test_q46_cube_is_single_pass(spark):
    # CUBE = one Expand + one partial-aggregated shuffle, not 2^k scans
    plan = plan_of(spark, "q46_cube_sales")
    assert "Expand" in plan
    # one scan detail block => the table is read exactly once
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_q03_topk_no_global_sort(spark):
    # LIMIT-after-ORDER must be a TakeOrderedAndProject (per-partition
    # top-k + merge), never a global sort of all rows
    plan = plan_of(spark, "q03_top_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q48_pivot_single_shuffle(spark):
    # conditional-agg pivot: exactly one exchange (on user_id); the
    # .pivot() form would plan two
    plan = plan_of(spark, "q48_pivot_event_matrix")
    assert plan.count("(") and "Exchange" in plan
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) == 1, exchanges


def test_q50_grouping_sets_single_scan(spark):
    # GROUPING SETS = one Expand over one scan, not one scan per set
    plan = plan_of(spark, "q50_grouping_sets")
    assert "Expand" in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_q55_exists_becomes_semi_and_anti_join(spark):
    # correlated EXISTS / NOT EXISTS must decorrelate to hash joins —
    # never a per-row subquery or nested loop
    plan = plan_of(spark, "q55_exists_subquery")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q56_gap_fill_broadcasts_fact(spark):
    # the aggregated fact side broadcasts into the dense grid (left-outer
    # keeps the grid rows, so the build side must be the right/fact side)
    plan = plan_of(spark, "q56_monthly_gap_fill")
    assert "BroadcastHashJoin" in plan


def test_q54_windows_share_one_shuffle(spark):
    # rank + per-stratum count reuse one hashpartitioning(c_mktsegment);
    # the downstream groupBy on the same key adds no exchange
    plan = plan_of(spark, "q54_stratified_sample")
    assert plan.count("hashpartitioning(c_mktsegment") >= 1
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(exchanges) <= 1, exchanges


def test_q59_topk_take_ordered(spark):
    plan = plan_of(spark, "q59_top_terms")
    assert "TakeOrderedAndProject" in plan


def test_q61_centroids_broadcast_and_take_ordered(spark):
    # centroid table broadcasts back onto the exploded fact; final top-k
    # is a TakeOrderedAndProject, not a global sort
    plan = plan_of(spark, "q61_centroid_outliers")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_q66_unpivot_adds_no_shuffle(spark):
    # stack() is a generator projection over q48's aggregate — still
    # exactly one exchange in the whole plan
    plan = plan_of(spark, "q66_unpivot_matrix")
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) == 1, exchanges


def test_q67_moment_aggs_single_shuffle(spark):
    # corr/covar/var are algebraic (mergeable moments): one partial +
    # one final aggregate around a single exchange
    plan = plan_of(spark, "q67_corr_stats")
    exchanges = [l for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l]
    assert len(exchanges) == 1, exchanges


def test_no_unbounded_nested_loops_anywhere(spark):
    """Catalog-wide physical-plan sweep: CartesianProduct must appear in NO
    registered query, and BroadcastNestedLoopJoin only where one side is
    bounded by construction (1-row aggregates or a pre-aggregated spine ×
    dims grid) — the shapes that stay O(rows) at any corpus size. A new
    query that accidentally plans an unbounded cross/NLJ fails here before
    it ever reaches a cluster."""
    from nexgap_spark.plans import QUERIES
    from tests.conftest import SF_SMOKE

    # every entry documents WHY its nested-loop side is bounded
    BNLJ_OK = {
        "q56_monthly_gap_fill",      # month spine × distinct dims (both pre-aggregated)
        "q62_tfidf_top_terms",       # 1-row corpus doc-count broadcast
        "q64_funnel_conversions",    # two 1-row aggregates cross-joined
        "q77_rolling_active_users",  # 1-row (min,max) date-bounds broadcast
        "q79_rebalance_domains",     # 1-row min-group-size broadcast
        "q99_incremental_dedup",     # two 1-row aggregates cross-joined
        "q75_column_profile",        # 1-row scalar-agg broadcast × k distinct rows
        "q75b_column_profile_approx",  # same scalar-row shape (audit side)
        "q117_expectations",         # 1-row metrics agg × k rule rows + 1-row totals
        # r16 window-free CDF rewrite (commit 76c29a3, keyed_running_sum +
        # normalize_weights in operators/sampling.py): BOTH nested-loop
        # sides verified 1-row by construction — normalize_weights cross-
        # joins a broadcast ONE-ROW sum total (sampling.py:52), and
        # keyed_running_sum's packed CDF is a groupBy().agg() ONE-ROW
        # collect_list fold (sampling.py:83) whose posexplode output is
        # histogram-sized; same 1-row-broadcast shape as q62/q79, never
        # rows-scale (plan re-read r17 against the shipped rewrite)
        "q19_sampling_weights",
        "q20_inverse_cdf_pick",
    }
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    offenders = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert not offenders, offenders


def test_driver_window_is_valid():
    """The driver records only the first 50 registry entries; the rotation
    list must stay exactly 50 resolvable, duplicate-free names, and the
    registry must actually begin with it — silent drift here would quietly
    un-check queries the round claims to prove."""
    from nexgap_spark.plans import QUERIES
    from nexgap_spark.plans import _DRIVER_WINDOW

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert [n for n in _DRIVER_WINDOW if n not in QUERIES] == []
    assert list(QUERIES)[:50] == _DRIVER_WINDOW


def test_q88_suitability_is_pure_jvm(spark):
    # the X3 parse is a string-containment expression — it must stay in
    # whole-stage codegen, with no Python evaluation node anywhere
    plan = plan_of(spark, "q88_persona_suitability")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q87_q90_single_arrow_stage(spark):
    # agent parse / URL validation each run as exactly ONE Arrow-batched
    # stage (mapInPandas), never a row-at-a-time Python UDF
    import re

    for name in ("q87_fuzzifier_contract", "q90_url_validate"):
        plan = plan_of(spark, name)
        # formatted explain lists each physical node once in the tree and
        # once in the detail section — count the "(N) MapInPandas" headers
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, name
        assert "BatchEvalPython" not in plan, name


def test_q98_argmax_no_window_sort(spark):
    # representative selection must be a hash-aggregate argmax (max_by),
    # never a per-group window sort
    plan = plan_of(spark, "q98_keep_best_per_group")
    assert "Window" not in plan
    assert "LeftSemi" in plan


def test_q106_indexed_scan_prunes_partitions(spark):
    # The persisted-IVF path's whole point: the corpus scan must carry a
    # PartitionFilters entry on centroid_id (probed clusters only) so
    # unprobed clusters' files are never read.
    plan = plan_of(spark, "q106_ivf_indexed")
    assert "ivf_index" in plan, "IVF corpus scan missing from plan"
    # formatted mode puts PartitionFilters on its own line within the scan
    # block; the only partitioned source in this plan is the IVF corpus
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, "no partition-filtered scan in plan"
    assert any("centroid_id" in l and "IN" in l for l in pf)


def test_q105_workflow_is_single_map_stage(spark):
    # The composed synthesis workflow must stay one row-local Arrow stage:
    # exactly one Python-worker operator before the final aggregate, and no
    # join/shuffle other than the aggregate's own exchange.
    plan = plan_of(spark, "q105_synthesis_workflow")
    import re

    # formatted explain names each operator once in the tree and once in
    # the numbered detail block — count the detail headers
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Join" not in plan


def test_q107_execution_is_single_map_stage(spark):
    # the subprocess harness must stay one row-local Arrow stage before
    # the final aggregate — no joins, no extra Python boundaries
    import re

    plan = plan_of(spark, "q107_agent_execution")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Join" not in plan


def test_q108_repeated_spans_join_is_broadcast(spark):
    # the repeated-gram table joins back by broadcast under the explicit
    # cap — the gram stream must NOT shuffle for the join-back
    plan = plan_of(spark, "q108_repeated_spans", execute=True)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_capped_broadcast_fallback_fires(spark):
    # the membership-join policy's BOTH branches, observed in executed
    # plans (VERDICT r7: "observed firing, not just asserted"): under the
    # cap the corpus join is a BroadcastHashJoin; over it, the broadcast
    # hint is withheld and AQE plans a shuffle join instead
    import contextlib
    import io

    from pyspark.sql import functions as F

    from nexgap_spark.operators.dedup import dedup_corpus_join

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    membership = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 2).alias("group_id"),
        F.lit(2).alias("group_size"),
    )

    def executed_plan(df):
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # at test scale (500 rows ≈ 1 MB) AQE's own size threshold would
    # re-choose broadcast even without the hint — which is the RIGHT
    # runtime call, but hides the policy. Turn auto-broadcast off so the
    # plan shape is decided solely by capped_broadcast's hint-or-not.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under = executed_plan(
            dedup_corpus_join(docs, membership, max_broadcast_rows=1_000)
        )
        # the explicit hint fires even with auto-broadcast disabled
        assert "BroadcastHashJoin" in under, under

        over = executed_plan(
            dedup_corpus_join(docs, membership, max_broadcast_rows=100)
        )
        # no hint → the join shuffles both sides on the key (formatted
        # explain lists Exchange and its hashpartitioning args on
        # separate lines, so assert them independently)
        assert "BroadcastHashJoin" not in over, over
        assert "SortMergeJoin" in over or "ShuffledHashJoin" in over, over
        assert "Exchange" in over and "hashpartitioning(doc_id" in over, over
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q110_jpeg_is_two_map_stages_no_shuffle_before_agg(spark):
    # synth + decode are row-local Arrow stages over the scan; the only
    # exchange is the final small groupBy
    import re

    plan = plan_of(spark, "q110_jpeg_features")
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    assert "Join" not in plan


def test_span_parent_join_cap_both_branches(spark):
    # the span-family twin of test_capped_broadcast_fallback_fires: the
    # parent join's build side broadcasts under the cap and degrades to an
    # AQE shuffle join above it (VERDICT r8 item 1: the converter family's
    # 100 TB story must be observed, not argued)
    import contextlib
    import io

    from pyspark.sql import functions as F

    from nexgap_spark.operators.span_tree import join_parent

    spans = spark.range(3000).select(
        F.concat(F.lit("s"), F.col("id")).alias("span_id"),
        F.when(
            F.col("id") % 10 == 0, F.lit(None).cast("string")
        ).otherwise(F.concat(F.lit("s"), F.col("id") - F.col("id") % 10)).alias(
            "parentObservationId"
        ),
        F.concat(F.lit("agent"), F.col("id") % 7).alias("span_name"),
    )

    def executed_plan(df):
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under = executed_plan(
            join_parent(spans, max_broadcast_parent_rows=10_000)
        )
        assert "BroadcastHashJoin" in under, under

        over = executed_plan(join_parent(spans, max_broadcast_parent_rows=100))
        assert "BroadcastHashJoin" not in over, over
        assert "SortMergeJoin" in over or "ShuffledHashJoin" in over, over
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _spans_fixture(spark, tmp_path, n=400):
    # parquet-backed so plan assertions see attribute refs, not the
    # inlined generator expressions projection-collapse would substitute
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.concat(F.lit("s"), F.col("id")).alias("span_id"),
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") / 4).cast("int") * 4))
        .alias("parentObservationId"),
        F.when(F.col("id") % 4 == 0, F.concat(F.lit("agent"), F.col("id") % 3))
        .otherwise(F.concat(F.lit("step"), F.col("id")))
        .alias("span_name"),
    )
    path = str(tmp_path / "spans_fixture.parquet")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_resolver_hops_join_only_unresolved_rows(spark, tmp_path):
    # VERDICT r9 item 1(b): resolved rows must EXIT the resolver loops.
    # Every hop join's probe side now carries an explicit
    # isnotnull(_cursor) filter, so rows that matched an agent or ran out
    # of ancestors never enter another join — and in the over-cap SHUFFLE
    # branch never enter the exchange, where every null cursor would hash
    # to the same partition (skew exactly in the branch built for the
    # biggest data). Pin the guard in the executed plan of both resolvers,
    # in the shuffle branch specifically.
    import contextlib
    import io
    import re

    from nexgap_spark.operators.span_tree import resolve_agent_name, resolve_root

    spans = _spans_fixture(spark, tmp_path)

    def executed_plan(df):
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    resolved = resolve_agent_name(
        spans, ["agent0", "agent1", "agent2"], broadcast_parents=False, max_hops=3
    )
    plan = executed_plan(resolved)
    # exited rows come back through a Union; every hop join's probe side
    # carries a non-null-cursor guard (hop 0's cursor is the raw parent
    # column; later hops' cursor derives from _p_parent — projection
    # collapse inlines the alias, so assert on the underlying attributes)
    assert "Union" in plan, plan
    # hop 0's guard filters the raw parent column; later hops' guard
    # (isnotnull on the CASE over _p_parent) gets pushed THROUGH the
    # previous hop's join into the parent-side scan by Catalyst — both
    # land as isnotnull(parentObservationId) filters, one per hop branch
    assert len(re.findall(r"isnotnull\(parentObservationId", plan)) >= 2, plan
    # exited rows still resolve correctly (roots keep their own name rule:
    # null cursor at hop 0 → no fallback; children resolve to the root agent)
    rows = {r["span_id"]: r["agent_name"] for r in resolved.collect()}
    assert rows["s1"] == "agent0" and rows["s5"] == "agent1"

    rooted = resolve_root(spans, broadcast_parents=False, max_hops=3)
    plan = executed_plan(rooted)
    assert "Union" in plan, plan
    assert len(re.findall(r"isnotnull\(parentObservationId", plan)) >= 2, plan
    roots = {r["span_id"]: r["root_id"] for r in rooted.collect()}
    assert roots["s0"] == "s0" and roots["s5"] == "s4" and roots["s17"] == "s16"


def test_parent_side_checkpoints_only_after_cap_passes(spark, tmp_path):
    # VERDICT r9 item 1(a) + r17 revisions. The ORIGINAL sin was an eager
    # localCheckpoint of the corpus-sized projection BEFORE the cap
    # check — q22's whole constant factor at spans ×100; that must stay
    # gone (the count runs over the original scan+project plan). The
    # r9-era second half ("hops re-scan the original plan and Spark's
    # ReusedExchange dedupes the builds") proved empirically FALSE on
    # Spark 4.1 + AQE for the bench queries (q37 executed plan: 12
    # builds / 4 reused / 18 scans), so the ≤cap projection IS
    # materialized once the check passes — and for MULTI-HOP resolvers
    # materialized TO A FILE (prefer_file), because a localCheckpoint
    # build (Scan ExistingRDD) is invisible to AQE's broadcast-stage
    # cache too: it stopped the per-hop source re-scans but still built
    # the hash relation once per hop. A FileScan build canonicalizes by
    # location, so the hops share ONE build via ReusedExchange. The
    # single-join caller (join_parent) keeps the cheaper localCheckpoint
    # — nothing reuses a single build (q22 A/B: file flavor +0.2 s).
    # The PROBE side must still scan the original source (it is never
    # materialized here).
    import contextlib
    import io
    import re as _re

    from nexgap_spark.operators.span_tree import join_parent, resolve_root

    spans = _spans_fixture(spark, tmp_path)

    def plan_text(df, execute=False):
        if execute:
            df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    single = plan_text(join_parent(spans))
    # single join: the build side is the one checkpointed copy
    # (ExistingRDD — no file round-trip, nothing would reuse it); the
    # probe still scans the original plan (a materialized PROBE would be
    # the r9 regression)
    assert "ExistingRDD" in single, single
    assert "spans_fixture.parquet" in single, single
    assert "nexgap_mat_" not in single, single

    multi = plan_text(resolve_root(spans), execute=True)
    assert "nexgap_mat_" in multi, multi
    assert "spans_fixture.parquet" in multi, multi
    # the original source feeds only the probe: at most the probe (+ its
    # union twin) scans the source — no per-hop rebuild scans
    src_scan_ids = {
        m.group(1)
        for m in _re.finditer(r"\((\d+)\) Scan parquet[^\n]*spans_fixture", multi)
    }
    # formatted output names the source in the node line or the details
    # block; fall back to counting Location lines that name the fixture
    n_src = len(src_scan_ids) or multi.count("spans_fixture.parquet")
    assert n_src <= 2, multi
    # the per-hop builds collapse onto one file-backed build: the
    # executed (AQE-final) plan must carry at least one ReusedExchange
    # and exactly one scan of the materialized copy
    assert "ReusedExchange" in multi, multi
    n_mat_scans = multi.count("nexgap_mat_")
    assert n_mat_scans >= 1, multi


@pytest.mark.parametrize("pipeline", ["a4a", "nexau"])
def test_converter_python_stage_fans_out_past_aqe_coalescing(spark, pipeline):
    # The converter's mapInPandas is CPU-bound per record, but its input
    # exchange (the A1 window) looks tiny in bytes, and the session's
    # parallelismFirst=false lets AQE coalesce it — at docs ×100 the whole
    # 500 k-record Python stage ran on ONE partition. The fix is an
    # explicit numbered repartition (REPARTITION_BY_NUM origin, exempt
    # from AQE coalescing); pin both the plan shape and the observed
    # partition spread of the executed Arrow stage, for BOTH converter
    # pipelines.
    import contextlib
    import io

    from pyspark.sql import functions as F

    from nexgap_spark.operators.converter import convert_spans, convert_spans_nexau
    from nexgap_spark.schemas import SPAN_SCHEMA
    from tests.fixtures_spans import CONFIG_AGENTS, build_spans

    rows = []
    for rep in range(40):
        for s in build_spans():
            s = dict(s)
            if isinstance(s["output"], dict):
                s["output"] = [s["output"]]
            s["trace_id"] = f"{s['trace_id']}_r{rep}"
            s["span_id"] = f"{s['span_id']}_r{rep}"
            if s.get("parentObservationId"):
                s["parentObservationId"] = f"{s['parentObservationId']}_r{rep}"
            rows.append(s)
    # worst case: everything arrives in one split
    spans = spark.createDataFrame(rows, schema=SPAN_SCHEMA).coalesce(1)

    if pipeline == "a4a":
        out = convert_spans(spans, config_agents=CONFIG_AGENTS)
    else:
        out = convert_spans_nexau(spans)
    rows_out = out.select(F.spark_partition_id().alias("pid")).collect()
    pids = {r.pid for r in rows_out}
    par = spark.sparkContext.defaultParallelism
    # N output records over `par` round-robin partitions: near-full spread
    assert len(rows_out) >= 80, len(rows_out)
    assert len(pids) >= min(par, len(rows_out)) // 2, pids

    # Plan-shape contract, asserted on the PRE-checkpoint frame: the
    # resolver may materialize the window output (expensive-lineage guard),
    # which hides the keyed exchange behind ExistingRDD in the final plan —
    # so explain the narrowed→window subplan directly, where the
    # AQE-coalesce-exempt keyed repartition must appear regardless of any
    # later checkpoint. (The runtime partition-spread assertion above stays
    # the executed-plan contract.)
    from nexgap_spark.operators import span_tree

    cheap = span_tree._ensure_cheap(spans)
    narrowed = span_tree.filter_nonempty_input(
        span_tree.filter_generation_spans(cheap)
    )
    windowed = span_tree.last_generation_per_group(narrowed, pre_partition=par)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        windowed.explain("formatted")
    plan = buf.getvalue()
    assert "REPARTITION_BY_NUM" in plan, plan
