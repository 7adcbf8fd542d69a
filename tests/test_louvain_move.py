"""q314 Louvain local-move: cross-query consistency with q246 (the
"before" column must equal the measurement query bit-for-bit — same
partition, same exact-integer modularity scale) and non-degeneracy (the
move round actually moves vertices and the gain rule actually helped on
this corpus — not asserted as a law, synchronous moves may interfere,
but pinned on the fixed test corpus where it holds)."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q314_before_matches_q246(spark, sf_dir):
    mv = ALL_QUERIES["q314_louvain_move"](spark, sf_dir).collect()[0]
    q246 = ALL_QUERIES["q246_modularity"](spark, sf_dir).collect()[0]
    assert mv["q_before_millionths"] == q246["q_millionths"]
    assert mv["n_comm_before"] == q246["n_communities"]


def test_q314_moves_and_improves_on_test_corpus(spark, sf_dir):
    mv = ALL_QUERIES["q314_louvain_move"](spark, sf_dir).collect()[0]
    assert 0 < mv["n_moved"] <= mv["n_vertices"]
    assert mv["q_after_millionths"] > mv["q_before_millionths"]
