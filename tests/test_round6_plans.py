"""Plan-shape pins for the round-6 operators: the load-bearing physical
properties each new query's docstring claims (broadcast dim joins, anti
joins, bounded TakeOrdered ranks) must actually appear in the executed
plan — the same discipline as test_plans.py, scoped to q295–q306."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q304_pit_join_is_broadcast_equi_join(spark, sf_dir):
    """The SCD2 version table is dim-sized: the PIT join must be a
    broadcast hash join with the validity interval as a filter — never a
    sort-merge of the fact or a nested loop."""
    plan = _plan(spark, sf_dir, "q304_pit_feature_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q305_rejection_is_an_anti_join(spark, sf_dir):
    """Positive rejection must plan as a (user, item) anti join — the
    shape that scales — not as an IN-subquery nested loop."""
    plan = _plan(spark, sf_dir, "q305_negative_sampling")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q297_and_q302_ranks_are_limit_bounded(spark, sf_dir):
    """Both ADC searches rank via TakeOrderedAndProject (bounded heaps),
    per the global_topk contract."""
    for name in ("q297_pq_adc_search", "q302_ivf_adc_search"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_q298_candidates_ride_an_equi_join(spark, sf_dir):
    """dHash banding must join candidates on (band, value) equality —
    no cartesian pair enumeration anywhere in the plan."""
    plan = _plan(spark, sf_dir, "q298_image_dhash_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
