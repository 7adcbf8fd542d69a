"""Aggregates every query family into the single registry that
``__spark_entry__`` exposes to the driver.

Import order is load order; name collisions are a bug and raise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_globalretail_spark.plans import queries as _relational

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ALL_ORACLE: dict[str, str] = {}


def _merge(qs: dict, oracle: dict) -> None:
    for name in qs:
        if name in ALL_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
    ALL_QUERIES.update(qs)
    ALL_ORACLE.update(oracle)


_merge(_relational.QUERIES, _relational.ORACLE)

for _mod in ("operators.dedup", "operators.similarity", "operators.text",
             "operators.multimodal", "operators.skew", "operators.components",
             "operators.sampling", "operators.profiling", "operators.asof",
             "operators.joins", "sources.pyds", "sources.catalog",
             "operators.corpus", "sources.formats",
             "operators.clustering", "operators.quality",
             "plans.star_schema", "plans.analytics", "plans.tpch", "plans.scd",
             "streaming.windows", "streaming.stateful",
             "functions.tablefuncs"):
    try:
        _m = __import__(f"etl_globalretail_spark.{_mod}", fromlist=["QUERIES", "ORACLE"])
        _merge(_m.QUERIES, _m.ORACLE)
    except ImportError:
        pass  # family not built yet (round-incremental)


# ---------------------------------------------------------------------------
# Rotated iteration order (round 7). The driver's differential snapshot
# examines the registry in ITERATION order and records a 50-entry prefix,
# so the prefix is ROTATED each round to put never-yet-sampled queries on
# the driver's correctness gate (VERDICT r6 item 1): rounds 1–6 sampled
# 226 distinct names, leaving 80 never sampled (77 oracle-paired + 3
# rows-only). This prefix is `scripts/rotate_gate.py`'s suggestion — the
# 50 numerically-highest never-sampled oracle-paired names: the 12 new
# round-6 queries q295–q306 (VERDICT r6's priority names) plus 38
# q169–q239 stragglers. Round-8 plan (precomputed per VERDICT r6 item
# 1): rotate the remaining 27 oracle-paired + 3 rows-only never-sampled
# names PLUS the round-7 additions q307–q316 — 40 names, fitting one
# prefix with slots to spare (`scripts/rotate_gate.py` recomputes the
# exact set from CORRECTNESS_r01–r07 at round start).
# Membership and implementations are untouched: every query stays
# registered and oracle-paired; this is a reordering only.
# ---------------------------------------------------------------------------

_SHOWCASE = [
    # q169–q239 never-sampled stragglers (sessionization, stats tests,
    # drift, allocation, graph, text-scoring tiers)
    "q169_seasonality_index", "q171_session_paths", "q172_length_drift",
    "q173_length_ks_test", "q174_benford_audit", "q175_revenue_gini",
    "q176_customer_skyline", "q177_twap_per_user", "q183_orderkey_islands",
    "q184_welch_t_test", "q185_span_scrub", "q187_template_prefixes",
    "q188_merge_with_deletes", "q189_vocab_coverage",
    "q191_entity_resolution", "q192_linear_attribution",
    "q193_daily_gap_fill", "q194_streaming_dedup_exact",
    "q206_latency_histogram", "q213_rollup_rank", "q214_fifo_allocation",
    "q215_bom_explosion", "q217_spearman_corr", "q218_kendall_tau",
    "q220_cohort_ltv", "q221_source_drift_matrix", "q222_group_mode",
    "q223_audience_overlap", "q224_cuped_uplift", "q225_decayed_popularity",
    "q226_keyword_search", "q232_bigram_lm_score", "q233_cusum_changepoint",
    "q234_embedding_gram", "q236_label_propagation", "q237_rrf_fusion",
    "q238_bootstrap_ci", "q239_dup_span_coverage",
    # round-6 additions, never driver-gated (VERDICT r6 item 1 priority)
    "q295_pq_codebook", "q296_t_closeness", "q297_pq_adc_search",
    "q298_image_dhash_neardup", "q299_audio_frame_features",
    "q300_video_frame_sample", "q301_unigram_viterbi",
    "q302_ivf_adc_search", "q303_streaming_full_outer_join_exact",
    "q304_pit_feature_join", "q305_negative_sampling", "q306_image_resize",
]

assert set(_SHOWCASE) <= set(ALL_QUERIES), sorted(
    set(_SHOWCASE) - set(ALL_QUERIES)
)
assert len(_SHOWCASE) == len(set(_SHOWCASE)), "duplicate showcase entry"

ALL_QUERIES = {
    **{k: ALL_QUERIES[k] for k in _SHOWCASE},
    **{k: v for k, v in ALL_QUERIES.items() if k not in set(_SHOWCASE)},
}
