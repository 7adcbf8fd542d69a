"""q326 Louvain level 2: pure-Python recompute (the phase-2 helper
applied one level up), Q-monotonicity at the second level, and the
composition law tying level 2's 'before' to q319's 'after'."""

from __future__ import annotations

import test_louvain_contract as lc

from etl_globalretail_spark.plans.analytics import (
    co_purchase_edges,
    louvain_level2_labels,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q326_matches_python_level2(spark, sf_dir):
    edges = [
        (r["u"], r["v"])
        for r in co_purchase_edges(spark, sf_dir).collect()
    ]
    flat5 = louvain_level2_labels(spark, sf_dir).collect()
    want = lc._python_phase2(edges, flat5)
    got = ALL_QUERIES["q326_louvain_level2"](
        spark, sf_dir
    ).collect()[0].asDict()
    assert got == want


def test_q326_q_monotone_and_composes_q319(spark, sf_dir):
    """Each multi-level step must not decrease modularity, and level
    2's 'before' audit is exactly q319's 'after' (the second
    contraction starts from the first round's flat partition)."""
    r19 = ALL_QUERIES["q319_louvain_contract"](spark, sf_dir).collect()[0]
    r26 = ALL_QUERIES["q326_louvain_level2"](spark, sf_dir).collect()[0]
    assert r26["q_before_millionths"] == r19["q_after_millionths"]
    assert r26["n_comm_before"] == r19["n_comm_after"]
    assert r26["q_after_millionths"] >= r26["q_before_millionths"]
    assert r26["n_comm_after"] <= r26["n_comm_before"]
    assert r26["n_super_vertices"] == r26["n_comm_before"]
    # levels coarsen monotonically
    assert r26["n_super_vertices"] <= r19["n_super_vertices"]
