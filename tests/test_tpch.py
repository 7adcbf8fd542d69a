"""Plan-shape assertions for the TPC-H-shaped family: the physical plans
must be the ones we'd want at 100 TB — dims broadcast, selective filters
pushed into the parquet scans, top-k ranked after aggregation."""

from __future__ import annotations

from etl_globalretail_spark.plans.tpch import QUERIES


def _plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_volume_shipping_broadcasts_dims(spark, sf_dir):
    """supplier and both nation roles broadcast; no nested-loop join."""
    plan = _plan(QUERIES["q60_volume_shipping"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_returned_items_filter_pushed(spark, sf_dir):
    """The returnflag predicate reaches the lineitem parquet scan, and the
    global rank runs over the post-aggregate frame (a Window above the
    HashAggregate, never a sort of raw lineitem)."""
    plan = _plan(QUERIES["q61_returned_items"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_returnflag" in ln and "R" in ln for ln in pushed), plan
    assert plan.index("Window") < plan.index("Scan parquet"), (
        "rank must sit above (before, in top-down print) the scans"
    )


def test_market_share_prunes_before_fact_shuffle(spark, sf_dir):
    """p_type filter is pushed to the part scan; every dimension join is a
    broadcast (the only exchanges shuffle fact-side keys)."""
    df = QUERIES["q62_market_share"](spark, sf_dir)
    plan = _plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_type" in ln and "ECONOMY" in ln for ln in pushed), plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    rows = {r.ano: r.share for r in df.collect()}
    assert all(0.0 <= s <= 1.0 for s in rows.values())


def test_local_supplier_equality_join(spark, sf_dir):
    """The two-FK nation equality adds no extra shuffle: same exchange
    count as the plain star join (nation/supplier broadcast)."""
    plan = _plan(QUERIES["q63_local_supplier_volume"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
