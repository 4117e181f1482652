"""Query catalog: every operator from SURVEY.md §2 (plus the scale
extensions) exposed as a named (spark, sf_dir) -> DataFrame callable with a
matching DuckDB oracle SQL string where the semantics are SQL-expressible.

``__spark_entry__.py`` and ``bench.py`` both consume this registry.
"""

from nexgap_spark.plans.registry import (  # noqa: F401
    BASELINE_QUERIES,
    ORACLES,
    QUERIES,
)

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
# of the registry (observed: CORRECTNESS_r01..r15 each hold exactly the
# first 50 keys in registration order). Every oracle is equally checked
# locally (tests/test_oracle_queries.py, and selfcheck.py writes the full
# CORRECTNESS_LOCAL.json artifact each round), so the driver window is
# purely about which results get an externally-recorded row. Round 17
# rotates oldest-external-green first (VERDICT r16 item 5):
# (a) the 20 r16-deferred queries whose last external row is r14 (the
#     named r16 deferrals: q39, q80, q81, q85-q95, q97-q99, q104, q110,
#     q113);
# (b) the r17-code-touched families, r15-green: the shared-shingle/gate
#     set (q31, q43, q44, q100, q116, q118), the LZW rewrite (q119), and
#     the span parent-materialize family (q21-q23, q37);
# (c) r15-green rotation fill up to 50 in catalog order (q01-q15,
#     q18-q20, q46). Deferred to r18 (all r15-green, re-pinned locally
#     every round by selfcheck + the oracle test sweep): q28, q47-q56,
#     q58, q75, q75b, q82-q84, q108, q114, q120.
# NOTE on baseline_ ordering: the two declared-quadratic `baseline_`
# queries sort last in the catalog ONLY while they are outside this
# window (r14 deliberately put them in the window for external rows under
# the new names; r15+ return them to the tail). Consumers that must
# exclude them key off registry.BASELINE_QUERIES / the name prefix, never
# off catalog position — test_baseline_namespace_segregation asserts the
# tail ordering whenever no baseline is window-listed.
_DRIVER_WINDOW = [
    # (a) r16 deferrals — last external green r14
    "q39_emit_qwen",
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
    # (b) r17 code-touched families — last external green r15
    "q31_minhash_lsh_pairs",
    "q43_dup_groups",
    "q44_dedup_corpus",
    "q100_incremental_minhash",
    "q116_leakage_safe_split",
    "q118_corpus_pipeline",
    "q119_gif_animation",
    "q21_span_last_per_group",
    "q22_span_parent_join",
    "q23_span_root_walk",
    "q37_convert_pipeline",
    # (c) r15-green rotation fill (19 of 39; deferral list in the header)
    "q01_pricing_summary",
    "q02_regional_revenue",
    "q03_top_orders",
    "q04_priority_semi_join",
    "q05_customers_no_orders",
    "q06_revenue_filter",
    "q07_topk_parts_per_brand",
    "q08_last_event_per_user",
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
    "q46_cube_sales",
]
_ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW if n in QUERIES}
for _n, _f in list(QUERIES.items()):
    if _n not in BASELINE_QUERIES:
        _ordered.setdefault(_n, _f)
for _n, _f in list(QUERIES.items()):
    # declared-quadratic baselines sort LAST for every consumer that walks
    # the catalog in order (r14 segregation); window membership above is
    # the one deliberate exception (external row under the new name)
    _ordered.setdefault(_n, _f)
QUERIES.clear()
QUERIES.update(_ordered)
