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
# Rotated iteration order (round 4). The driver's differential snapshot
# examines the registry in ITERATION order and records a 50-entry prefix,
# so the prefix is ROTATED each round to put never-yet-sampled queries on
# the driver's correctness gate (VERDICT r3 item 1): rounds 1–3 sampled
# 126 distinct names; this prefix is the 50 numerically-lowest of the 152
# queries absent from r01∪r02∪r03, restricted to oracle-paired entries so
# every slot gets the strong hash-equality check (the rows-only tier and
# the remaining ~102 rotate in over rounds 5–6). Membership and
# implementations are untouched: every query stays registered and
# oracle-paired; this is a reordering only.
# ---------------------------------------------------------------------------

_SHOWCASE = [
    # windows / sessions / merge staples (never driver-sampled)
    "q35_sliding_windows", "q49_corpus_profile", "q51_asof_attribution",
    "q52_range_join", "q54_rollup_revenue", "q55_semi_anti_customers",
    "q56_interevent_gaps", "q57_event_type_pivot",
    "q58_order_value_percentiles", "q59_cohort_set_ops",
    # TPC-H analytics tier (Q12/Q10/Q8-shaped)
    "q60_volume_shipping", "q61_returned_items", "q62_market_share",
    "q63_local_supplier_volume",
    # running windows / SCD / incremental maintenance
    "q68_running_revenue", "q69_revenue_share", "q70_scd2_merge",
    "q71_upsert_merge", "q75_funnel", "q76_dq_expectations",
    "q77_retention_matrix", "q78_json_extraction", "q79_snapshot_diff",
    "q81_incremental_agg",
    # corpus / multimodal / profiling
    "q91_event_outliers", "q94_multimodal_digest", "q95_multimodal_frames",
    "q97_custdist", "q98_trailing_window_avg",
    # q100–q130 TPC-H tail + surfaces
    "q100_incremental_join", "q101_inverted_index",
    "q102_idle_rich_customers", "q103_cube_revenue", "q104_skew_profile",
    "q105_value_positions", "q106_latest_order_profile",
    "q107_nation_rollcall", "q109_order_priority", "q110_important_parts",
    "q111_promo_share", "q113_supplier_cnt", "q114_small_qty_revenue",
    "q115_large_orders", "q117_dominant_suppliers",
    "q121_quality_percentile_filter", "q124_grouping_sets",
    "q125_bag_set_ops", "q127_pricing_summary", "q129_order_lifecycle",
    "q130_product_profit",
]

assert set(_SHOWCASE) <= set(ALL_QUERIES), sorted(
    set(_SHOWCASE) - set(ALL_QUERIES)
)
assert len(_SHOWCASE) == len(set(_SHOWCASE)), "duplicate showcase entry"

ALL_QUERIES = {
    **{k: ALL_QUERIES[k] for k in _SHOWCASE},
    **{k: v for k, v in ALL_QUERIES.items() if k not in set(_SHOWCASE)},
}
