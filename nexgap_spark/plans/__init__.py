"""Query catalog: every operator from SURVEY.md §2 (plus the scale
extensions) exposed as a named (spark, sf_dir) -> DataFrame callable with a
matching DuckDB oracle SQL string where the semantics are SQL-expressible.

``__spark_entry__.py`` and ``bench.py`` both consume this registry.
"""

from nexgap_spark.plans.registry import ORACLES, QUERIES  # noqa: F401

# Importing the modules populates the registry.
from nexgap_spark.plans import relational  # noqa: F401, E402
from nexgap_spark.plans import spans_rel  # noqa: F401, E402
from nexgap_spark.plans import textops  # noqa: F401, E402
from nexgap_spark.plans import similarity  # noqa: F401, E402
from nexgap_spark.plans import document_pipeline  # noqa: F401, E402
from nexgap_spark.plans import temporal  # noqa: F401, E402
from nexgap_spark.plans import analytics  # noqa: F401, E402
from nexgap_spark.plans import curation  # noqa: F401, E402
from nexgap_spark.plans import advanced  # noqa: F401, E402
from nexgap_spark.plans import agents  # noqa: F401, E402

# The driver's per-round correctness gate records only the FIRST 50 entries
# of the registry (observed: CORRECTNESS_r01..r05 each hold exactly the
# first 50 keys in registration order). Every oracle is equally checked
# locally (tests/test_oracle_queries.py runs all of them through the same
# rows+schema+value-hash compare), so the driver window is purely about
# which results get an externally-recorded row. Round 6 rotates the window
# (VERDICT r5 item 7) to: (a) the queries whose last external green row is
# r01–r04 — after r05 rotated away from them — so every catalog query stays
# within two rounds of an externally recorded check; (b) everything new
# this round (q87–q94 agent cores); (c) the queries whose operators this
# round's fixes touched (q16 timeutil, q27 exact_dedup, q43 dup_groups,
# q44 corpus, q45 hyperplane cap, q86 chunk_text). Queries moved past
# position 50 all have green r05 rows on record.
_DRIVER_WINDOW = [
    # (c) operators changed this round — prove the fixes externally
    "q16_sessionize_events",
    "q27_exact_dedup_stats",
    "q43_dup_groups",
    "q44_dedup_corpus",
    "q45_hyperplane_lsh",
    "q86_chunk_text",
    # (b) new this round: X3–X10 agent pure cores
    "q87_fuzzifier_contract",
    "q88_persona_suitability",
    "q89_url_extraction",
    "q90_url_validate",
    "q91_url_repair_loop",
    "q92_file_requirement",
    "q93_file_plan",
    "q94_url_rewrite",
    "q95_new_tag_parse",
    "q96_url_pipeline",
    "q97_wav_features",
    "q98_keep_best_per_group",
    "q99_incremental_dedup",
    "q100_incremental_minhash",
    "q101_png_features",
    # (a) last external green row is r01–r04 (q02 cedes its slot — the
    # driver's entry() smoke exercises it every round anyway; q46 ceded
    # to the new q97–q99)
    "q03_top_orders",
    "q04_priority_semi_join",
    "q05_customers_no_orders",
    "q06_revenue_filter",
    "q07_topk_parts_per_brand",
    "q09_cumulative_revenue",
    "q10_event_type_stats",
    "q11_rollup_sales",
    "q12_distinct_counts",
    "q13_string_functions",
    "q14_monthly_orders",
    "q15_nation_set_ops",
    "q18_json_extraction",
    "q19_sampling_weights",
    "q20_inverse_cdf_pick",
    "q22_span_parent_join",
    "q24_text_stats",
    "q25_quality_features",
    "q26_language_id",
    "q28_doc_fingerprints",
    "q29_ngram_jaccard_topk",
    "q30_minhash_signatures",
    "q32_simhash",
    "q33_binary_payloads",
    "q36_embedding_near_dup",
    "q39_emit_qwen",
    "q40_media_features",
    "q59_top_terms",
    "q60_length_zscore",
    # q61/q62 cede their slots to q100/q101 (new this round; both stay
    # hash-checked locally every round and rotate back next round)
]
_ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW if n in QUERIES}
for _n, _f in list(QUERIES.items()):
    _ordered.setdefault(_n, _f)
QUERIES.clear()
QUERIES.update(_ordered)
