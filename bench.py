"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method: each query is executed to completion through the noop sink (full
computation, no driver-side collect cost) TWICE, and the per-query time is
the min of the two wall-clock runs — steady-state throughput, insulated
from transient host-load spikes and JVM GC pauses (observed 3× swings on
identical code in this shared-host container). A session warmup query and
a Python-worker-pool warmup run first. The headline set covers every
operator family: star joins, window dedup/top-N, date cleansing, events
windows, the full fact ETL, text dedup tiers, sampling, and embedding
search.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q01_revenue_by_region",
    "q04_orders_by_segment",
    "q05_supplier_star",
    "q06_avg_price_per_part",
    "q08_composite_dedup",
    "q10_top_customers_per_region",
    "q12_dirty_date_parse",
    "q15_dim_tempo",
    "q16_events_hourly",
    "q17_user_profile",
    "q18_dedup_exact",
    "q19_quality_scores",
    "q21_lang_id",
    "q24_minhash_neardup",
    "q27_ann_bruteforce",
    "q32_fato_vendas",
    "q34_sessions",
    "q35_sliding_windows",
    "q39_promo_fact",
    "q41_multimodal_pipeline",
    "q42_salted_agg",
    "q43_dedup_clusters",
    "q47_hash_split",
    "q48_source_quota",
    "q49_corpus_profile",
    "q50_sketch_profile",
    "q51_asof_attribution",
    "q52_range_join",
    "q53_null_audit",
    "q54_rollup_revenue",
    "q55_semi_anti_customers",
    "q56_interevent_gaps",
    "q57_event_type_pivot",
    "q58_order_value_percentiles",
    "q59_cohort_set_ops",
    "q60_volume_shipping",
    "q61_returned_items",
    "q62_market_share",
    "q63_local_supplier_volume",
    "q64_stratified_sample",
    "q68_running_revenue",
    "q69_revenue_share",
    "q70_scd2_merge",
    "q71_upsert_merge",
    "q72_top_tokens",
    "q73_value_histogram",
    "q75_funnel",
    "q76_dq_expectations",
    "q77_retention_matrix",
    "q78_json_extraction",
    "q79_snapshot_diff",
    "q80_fuzzy_name_pairs",
    "q81_incremental_agg",
    "q82_ann_lsh_exact",
    "q83_document_chunks",
    "q84_sequence_packing",
    "q85_pii_redaction",
    "q88_weighted_sample",
    "q89_rarity_bands",
    "q90_repetition_filter",
    "q91_event_outliers",
    "q92_tfidf_terms",
    "q93_normalized_dedup",
    "q94_multimodal_digest",
    "q95_multimodal_frames",
    "q96_late_supplier_blame",
    "q97_custdist",
    "q98_trailing_window_avg",
    "q99_countmin_tokens",
    "q100_incremental_join",
    "q101_inverted_index",
    "q102_idle_rich_customers",
    "q103_cube_revenue",
    "q104_skew_profile",
    "q105_value_positions",
    "q106_latest_order_profile",
    "q107_nation_rollcall",
    "q108_min_cost_supplier",
    "q109_order_priority",
    "q110_important_parts",
    "q111_promo_share",
    "q112_top_supplier",
    "q113_supplier_cnt",
    "q114_small_qty_revenue",
    "q115_large_orders",
    "q116_disjunctive_filter",
    "q117_dominant_suppliers",
    "q118_shipping_priority",
    "q119_discount_revenue",
    "q120_ann_recall",
    "q121_quality_percentile_filter",
    "q122_kmeans_exact",
    "q123_ann_ivf_exact",
    "q124_grouping_sets",
    "q125_bag_set_ops",
    "q126_temperature_mixture",
    "q127_pricing_summary",
    "q128_streaming_hourly_exact",
    "q129_order_lifecycle",
    "q130_product_profit",
    "q131_sentence_stats",
    "q132_incremental_neardup",
    "q133_streaming_sliding_exact",
    "q134_rank_with_ties",
    "q135_moving_average",
    "q136_semantic_text_dedup",
    "q137_quality_keeper_dedup",
    "q138_yoy_growth",
    "q139_dup_span_fraction",
    "q140_bpe_pair_counts",
    "q141_zorder_layout",
    "q142_int8_quantization",
    "q143_streaming_sessions_exact",
    "q144_bloom_join_reduction",
    "q145_revenue_trend_ols",
    "q146_mad_outliers",
    "q147_copurchase_pairs",
    "q148_event_transitions",
    "q149_range_boundaries",
    "q150_burst_collapse",
    "q151_python_datasource",
    "q152_table_fingerprint",
    "q153_sliding_distinct_users",
    "q154_triangle_count",
    "q155_user_activity_features",
    "q156_prefix_filter_join",
    "q157_weighted_median_udaf",
    "q158_shipmode_priority",
    "q159_embedding_dim_stats",
    "q160_winsorized_totals",
    "q161_sql_front_door",
    "q162_type_weekday_contingency",
    "q163_discount_quantity_corr",
    "q164_feature_hashing",
    "q165_median_imputation",
    "q166_streaming_sink_exact",
    "q167_group_auc",
    "q168_association_rules",
    "q169_seasonality_index",
    "q170_clustering_coefficient",
    "q171_session_paths",
    "q172_length_drift",
    "q173_length_ks_test",
    "q174_benford_audit",
    "q175_revenue_gini",
    "q176_customer_skyline",
    "q177_twap_per_user",
    "q178_dedup_tier_overlap",
    "q179_pagerank",
    "q180_hll_users_exact",
    "q181_ewma_recursive",
    "q182_shard_manifest",
    "q183_orderkey_islands",
    "q184_welch_t_test",
    "q185_span_scrub",
    "q186_bfs_hops",
    "q187_template_prefixes",
    "q188_merge_with_deletes",
    "q189_vocab_coverage",
    "q190_global_index",
    "q191_entity_resolution",
    "q192_linear_attribution",
    "q193_daily_gap_fill",
    "q194_streaming_dedup_exact",
    "q195_cogroup_asof",
    "q196_null_safe_join",
    "q197_sql_udf_revenue",
    "q198_decision_stump",
    "q199_calibration_table",
    "q200_curation_pipeline",
    "q201_cumulative_users",
    "q202_business_day_latency",
    "q203_order_reconciliation",
    "q204_diversified_topk",
    "q205_funnel_latency",
    "q206_latency_histogram",
    "q207_containment_pairs",
    "q208_source_overlap_matrix",
    "q209_weighted_pagerank",
    "q210_degree_assortativity",
    "q211_peak_concurrency",
    "q212_kcore_peeling",
    "q213_rollup_rank",
    "q214_fifo_allocation",
    "q215_bom_explosion",
    "q216_budget_apportionment",
    "q217_spearman_corr",
    "q218_kendall_tau",
    "q219_session_depth",
    "q220_cohort_ltv",
    "q221_source_drift_matrix",
    "q222_group_mode",
    "q223_audience_overlap",
    "q224_cuped_uplift",
    "q225_decayed_popularity",
    "q226_keyword_search",
    "q227_weighted_shortest_path",
    "q228_interpolated_median",
]


def main() -> None:
    from etl_globalretail_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warmup: JVM + codegen + parquet footer caches.
    qs["q01_revenue_by_region"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    # Warmup 2: spawn the Python worker pool (reused afterwards), so the
    # first mapInPandas query in the headline set isn't charged ~1s/worker
    # of process startup that a long-lived cluster pays once.
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    # n_queries/mean: the headline set GROWS round over round as operator
    # coverage widens — compare totals only at equal coverage; the
    # per-query mean is the stable cross-round throughput signal.
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                "mean_sec_per_query": round(total / len(timings), 3),
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
