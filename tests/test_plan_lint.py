"""Engine-wide physical-plan lint: no query in the registry may plan a
Cartesian product or nested-loop join — the two shapes that are always
fatal at 100 TB — except the documented broadcast-tiny cases.

This is the sweep version of the per-query plan tests: every registered
query's physical plan is built (and, for the handful of eager queries,
executed at sf0.001) and scanned for forbidden operators.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Intentional cross-join shapes — every one is a broadcast of a ≤k-row
# frame (cluster centroids / probe cells), where the "nested loop" is k
# comparisons per row, i.e. the argmin scan k-means and IVF are DEFINED as.
INTENTIONAL_CROSS = {
    "q36_ann_ivf",   # ivf_assign: broadcast centroid table (k ≤ 10 rows)
    # (q74_kmeans no longer whitelisted: round-3 map-only assignment
    # folds the centroids in as literals — no join of any kind)
    "q33_embedding_neardup",  # the exact O(N²) dedup tier BY DEFINITION —
    # broadcast pair generation is its documented shape; corpora past
    # broadcast size use the LSH/IVF tiers (q28/q36) with the same verifier
    "q136_semantic_text_dedup",  # composes q33's pair tier (above) and
    # inherits its broadcast pair generation; the Jaccard annotation it
    # adds is |pairs|-sized equi-joins only
    "q41_multimodal_pipeline",  # attaches a broadcast 1-row global
    # aggregate to the per-mime rows — bounded by construction
    "q89_rarity_bands",  # attaches the broadcast 1-row corpus-max
    # bit-length to occurrence rows — bounded by construction
    "q95_multimodal_frames",  # joins two broadcast 1-row global
    # aggregates (resize totals × frame totals) — bounded by construction
    "q110_important_parts",  # attaches the broadcast 1-row national total
    # to the per-part aggregate (TPC-H Q11 scalar subquery) — bounded
    "q112_top_supplier",  # attaches the broadcast 1-row MAX(revenue)
    # scalar to the per-supplier aggregate (TPC-H Q15) — bounded
    "q162_type_weekday_contingency",  # attaches the broadcast 1-row grand
    # total N to the |types|×|days| cell frame — bounded by construction
    "q221_source_drift_matrix",  # crosses the two per-source TOTALS frames
    # (|sources|² pairs — broadcast-class by construction); the value-keyed
    # inner join carries all data-sized work
    "q223_audience_overlap",  # crosses the two per-type cohort-SIZE frames
    # (|event types|² pairs — bounded); intersections ride the user-keyed
    # equi-join
    "q225_decayed_popularity",  # attaches the broadcast 1-row week-span
    # scalar to the (type, week) grid — bounded by construction
    "q282_serpentine_pack_plan",  # attaches the broadcast 1-row total-load
    # scalar to the ≤R-row reducer census — bounded by construction
    "q226_keyword_search",  # attaches the broadcast 1-row corpus-max
    # bit-length to the |query|-row term frame — bounded by construction
    "q237_rrf_fusion",  # composes q226 (above) and inherits its broadcast
    # 1-row corpus-max scalar attach; everything the fusion adds is
    # rank-10-bounded equi-joins
    "q169_seasonality_index",  # attaches the broadcast 1-row annual total
    # to the 12-row monthly frame — bounded by construction
    "q174_benford_audit",  # attaches the broadcast 1-row grand total to
    # the 9-row digit frame — bounded by construction
    "q245_mixture_plan",  # attaches two broadcast 1-row global totals
    # (budget, then post-cap headroom) to the |sources|-row inventory —
    # bounded by construction
    "q252_hits_scores",  # four broadcast 1-row MAX attaches (the
    # max-norm half-steps) on |nodes|-grain score frames — bounded by
    # construction
    "q258_collocation_lift",  # attaches the broadcast 1-row bigram
    # total N to the |V|²-bounded pair matrix — bounded by construction
    "q259_dataset_card",  # composes three 1-row aggregate legs by
    # broadcast crosses — bounded by construction
    "q289_local_heavy_hitters",  # attaches the broadcast 1-row grand
    # total N to the ≤K·S-row candidate frame — bounded by construction
    "q262_hll_set_algebra",  # |event types|² pair enumeration over the
    # 5-row type list (inequality join) — bounded by construction; all
    # register/user work rides equi-joins
}

FORBIDDEN = ("CartesianProduct",)
FORBIDDEN_UNLESS_INTENTIONAL = ("BroadcastNestedLoopJoin", "CartesianProduct")


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_no_unbounded_join_shapes(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = (
        FORBIDDEN if name in INTENTIONAL_CROSS else FORBIDDEN_UNLESS_INTENTIONAL
    )
    for op in bad:
        assert op not in plan, f"{name} plans {op}:\n{plan[:2000]}"
