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


# ---------------------------------------------------------------------------
# Round-2 widening (q108–q119): each asserts the physical property that
# motivates the query's shape.
# ---------------------------------------------------------------------------


def test_min_cost_supplier_prunes_then_ranks(spark, sf_dir):
    """p_size filter reaches the part scan; argmin is a window above the
    (part, supplier) aggregate, never a sort of raw lineitem."""
    plan = _plan(QUERIES["q108_min_cost_supplier"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_size" in ln for ln in pushed), plan
    assert plan.index("Window") < plan.index("Scan parquet"), plan


def test_order_priority_semi_join_with_residual(spark, sf_dir):
    """EXISTS compiles to one LeftSemi join whose residual carries the
    late-ship inequality; date range pushed to the orders scan."""
    plan = _plan(QUERIES["q109_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), plan


def test_important_parts_single_fact_pass(spark, sf_dir):
    """The scalar national total re-aggregates the CACHED per-part frame —
    both consumers read the persisted aggregate (InMemoryTableScan), so
    the lineitem parquet materializes it once."""
    plan = _plan(QUERIES["q110_important_parts"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") == 2, plan


def test_top_supplier_single_fact_pass(spark, sf_dir):
    """Q15's scalar MAX reuses the CACHED per-supplier aggregate (both
    branches are InMemoryTableScans over one materialization); quarter
    filter pushed to the scan that fills the cache."""
    plan = _plan(QUERIES["q112_top_supplier"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") == 2, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), plan


def test_supplier_cnt_anti_join(spark, sf_dir):
    """NOT IN blacklist compiles to LeftAnti; part predicates reach the
    part scan."""
    plan = _plan(QUERIES["q113_supplier_cnt"](spark, sf_dir))
    assert "LeftAnti" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("p_brand" in ln for ln in pushed), plan


def test_disjunctive_filter_factored_pushdown(spark, sf_dir):
    """Catalyst factors the OR-of-ANDs: the part-only disjunct reaches the
    part scan AND the quantity-only disjunct reaches the lineitem scan."""
    plan = _plan(QUERIES["q116_disjunctive_filter"](spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "DataFilters" in ln]
    assert any("p_brand" in ln and "part.parquet" in ln for ln in pushed), plan
    assert any(
        "l_quantity" in ln and "lineitem.parquet" in ln for ln in pushed
    ), plan


def test_dominant_suppliers_reaggregates_grain(spark, sf_dir):
    """Per-part totals derive from the CACHED (part, supplier) grain (two
    InMemoryTableScans over one materialization), not a second lineitem
    scan; ship-year filter pushed."""
    plan = _plan(QUERIES["q117_dominant_suppliers"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") == 2, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), plan


def test_discount_revenue_all_predicates_pushed(spark, sf_dir):
    """Q6 probe: every predicate appears in the lineitem scan's pushed
    filters and only the needed columns are read."""
    plan = _plan(QUERIES["q119_discount_revenue"](spark, sf_dir))
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan, scan
    assert "l_extendedprice" in scan and "l_orderkey" not in scan, scan
