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
# Rotated iteration order (round 8). The driver's differential snapshot
# examines the registry in ITERATION order and records a 50-entry prefix,
# so the prefix is ROTATED each round to put never-yet-sampled queries on
# the driver's correctness gate (VERDICT r7 item 1): rounds 1–7 sampled
# 276 distinct names, leaving 40 never sampled — 37 oracle-paired (the
# q131–q167 stragglers plus all ten round-7 additions q307–q316) and the
# 3 rows-only-by-design names (q50/q74/q235, deliberately kept OFF the
# gate so they don't emit `err: no_oracle` rows — VERDICT r7 item 2).
# This prefix = those 37 (exactly `scripts/rotate_gate.py`'s output)
# padded to 50 with the FOUR round-8 additions (q317–q320, so new
# queries land on the gate the round they ship) and 9 RE-SAMPLES of the
# heaviest oracle-paired queries (per VERDICT r7 item 1: the streaming
# replays, the pair-graph/closure family this round memoizes, and the
# adaptive-blocking similarity tiers), so after r8 every oracle-paired
# query has a driver-green row.
# Membership and implementations are untouched: every query stays
# registered and oracle-paired; this is a reordering only.
# ---------------------------------------------------------------------------

_SHOWCASE = [
    # the final 37 never-driver-sampled oracle-paired names
    "q131_sentence_stats", "q132_incremental_neardup",
    "q133_streaming_sliding_exact", "q134_rank_with_ties",
    "q135_moving_average", "q136_semantic_text_dedup",
    "q137_quality_keeper_dedup", "q138_yoy_growth",
    "q139_dup_span_fraction", "q140_bpe_pair_counts",
    "q145_revenue_trend_ols", "q146_mad_outliers",
    "q147_copurchase_pairs", "q148_event_transitions",
    "q149_range_boundaries", "q150_burst_collapse",
    "q152_table_fingerprint", "q153_sliding_distinct_users",
    "q157_weighted_median_udaf", "q158_shipmode_priority",
    "q159_embedding_dim_stats", "q160_winsorized_totals",
    "q162_type_weekday_contingency", "q163_discount_quantity_corr",
    "q164_feature_hashing", "q165_median_imputation", "q167_group_auc",
    # all ten round-7 additions
    "q307_unigram_em_train", "q308_quality_classifier",
    "q309_streaming_right_outer_join_exact",
    "q310_streaming_session_join_exact", "q311_hard_negatives_lsh",
    "q312_fuzzy_decontamination", "q313_wordpiece_merges",
    "q314_louvain_move", "q315_ann_multiprobe", "q316_wordpiece_encode",
    # the twelve round-8 additions — on the gate the round they ship
    "q317_unigram_trained_viterbi", "q318_hard_negatives_multiprobe",
    "q319_louvain_contract", "q320_streaming_rollup_exact",
    "q321_streaming_join_rollup_exact", "q322_unigram_vocab_prune",
    "q323_video_scene_cuts", "q324_streaming_dedup_rollup_exact",
    "q325_audio_activity_segments", "q326_louvain_level2",
    "q327_lm_score_filter", "q328_bloom_membership",
    # 1 heavy re-sample padding the prefix to 50: q191 re-proves this
    # round's closure-memoization change hash-neutral on the driver
    # gate itself (q156's materialize change is value-identical and
    # covered by the round's two full sweeps)
    "q191_entity_resolution",
]
# The second- and third-session round-8 additions (q329-q363) do NOT
# fit the 50-slot prefix without evicting either the 37 never-sampled
# names (the explicit r8 done-criterion) or the first-session
# additions; they are verified by this round's full sf0.01 sweeps
# (342/342 green incl. q329-q350; q351-q363 hash-verified per-add) +
# per-query pytests and LEAD the r9 rotation: q329-q363 first (35
# names), then hash-neutrality re-samples of queries whose shared
# pipelines changed this round (q308/q350 trainer refactor, q343
# closure rewrite, q156/q191 from session one), freshest-green last.

assert set(_SHOWCASE) <= set(ALL_QUERIES), sorted(
    set(_SHOWCASE) - set(ALL_QUERIES)
)
assert len(_SHOWCASE) == len(set(_SHOWCASE)), "duplicate showcase entry"

ALL_QUERIES = {
    **{k: ALL_QUERIES[k] for k in _SHOWCASE},
    **{k: v for k, v in ALL_QUERIES.items() if k not in set(_SHOWCASE)},
}
