"""operators.ranks: the two-phase distributed replacements for
partition-less windows must be HASH-IDENTICAL to the single-window forms
they replace (VERDICT r5 item 2) — asserted here value-by-value on a
skewed synthetic frame that spans several range partitions, plus plan
shape (every window partitioned by the range id; top-k plans
TakeOrderedAndProject)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.operators.ranks import (
    global_lead,
    global_prefix_agg,
    global_prefix_sums,
    global_row_number,
    global_topk,
)


def _frame(spark):
    # skewed, with ties on the leading sort key (tie-break on id is the
    # callers' contract) and an empty-range-prone domain
    return spark.range(0, 500).select(
        F.col("id"),
        ((F.col("id") * 37) % 50).alias("a"),
        ((F.col("id") * 13) % 7).alias("b"),
    )


def test_global_row_number_matches_single_window(spark):
    df = _frame(spark)
    order = [("a", "desc"), ("b", "asc"), ("id", "asc")]
    got, n = global_row_number(df, order, out="rn", n_ranges=8)
    assert n == 500
    w = Window.orderBy(F.desc("a"), F.asc("b"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_global_row_number_partitions_every_window(spark):
    df = _frame(spark)
    got, _ = global_row_number(df, [("id", "asc")], out="rn", n_ranges=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*: ").strip()
        if s.startswith("Window "):
            assert "__rk_pid" in s.split("windowspecdefinition")[1][:80], s


def test_global_prefix_agg_matches_exclusive_running_max(spark):
    df = _frame(spark).select("a", "b", "id").distinct()
    order = [("a", "desc"), ("id", "asc")]
    got = global_prefix_agg(df, order, "b", agg="max", out="pm", n_ranges=8)
    w = (
        Window.orderBy(F.desc("a"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("pm", F.max("b").over(w))
    norm = lambda rows: sorted(  # noqa: E731
        (tuple(None if v is None else int(v) for v in r) for r in rows)
    )
    assert norm(got.collect()) == norm(want.collect())


def test_global_prefix_agg_min_first_row_null(spark):
    df = _frame(spark)
    got = global_prefix_agg(
        df, [("id", "asc")], "a", agg="min", out="pm", n_ranges=4
    )
    first = got.filter(F.col("id") == 0).collect()[0]
    assert first["pm"] is None  # exclusive frame: global first row sees none


def test_global_prefix_sums_matches_inclusive_running_sums(spark):
    df = _frame(spark)
    got, totals = global_prefix_sums(
        df, [("a", "asc"), ("id", "asc")], ["b", "id"], n_ranges=8
    )
    w = (
        Window.orderBy(F.asc("a"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "id", "a", "b",
        F.sum("b").over(w).cast("long").alias("b_cum"),
        F.sum("id").over(w).cast("long").alias("id_cum"),
    )
    assert sorted(map(tuple, got.select(*want.columns).collect())) == sorted(
        map(tuple, want.collect())
    )
    assert totals["b"] == df.agg(F.sum("b")).collect()[0][0]
    assert totals["id"] == df.agg(F.sum("id")).collect()[0][0]


def test_global_lead_matches_single_window(spark):
    df = _frame(spark).select((F.col("id") * 3).alias("k"), "a")
    got = global_lead(df, [("k", "asc")], "k", out="nx", n_ranges=8)
    w = Window.orderBy("k")
    want = df.withColumn("nx", F.lead("k").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.filter(F.col("nx").isNull()).count() == 1  # global last row


def test_global_topk_matches_rank_filter_and_plans_take_ordered(spark):
    df = _frame(spark)
    order = [("a", "desc"), ("id", "asc")]
    got = global_topk(df, order, 25, out="rnk")
    w = Window.orderBy(F.desc("a"), F.asc("id"))
    want = (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 25)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_helpers_invariant_to_range_count(spark):
    """The composition must be identical no matter where the sampled
    range boundaries fall — the q190 boundary-invariance proof extended
    to every ranks helper (n_ranges 1 degenerates to the single window;
    3 forces uneven boundaries; 16 is the default)."""
    df = _frame(spark)
    order = [("a", "desc"), ("id", "asc")]
    ref_rn = None
    ref_pm = None
    ref_sums = None
    ref_lead = None
    for n in (1, 3, 16):
        rn, total = global_row_number(df, order, out="rn", n_ranges=n)
        assert total == 500
        rn_rows = sorted(map(tuple, rn.collect()))
        pm_rows = sorted(
            (tuple(None if v is None else int(v) for v in r))
            for r in global_prefix_agg(
                df, order, "b", agg="max", out="pm", n_ranges=n
            ).collect()
        )
        sums_df, totals = global_prefix_sums(df, order, ["b"], n_ranges=n)
        sums_rows = sorted(map(tuple, sums_df.collect()))
        lead_rows = sorted(
            map(tuple, global_lead(
                df.select((F.col("id") * 2).alias("k")),
                [("k", "asc")], "k", out="nx", n_ranges=n,
            ).collect())
        )
        if ref_rn is None:
            ref_rn, ref_pm, ref_sums, ref_lead = (
                rn_rows, pm_rows, sums_rows, lead_rows
            )
        else:
            assert rn_rows == ref_rn, f"row_number differs at n_ranges={n}"
            assert pm_rows == ref_pm, f"prefix_agg differs at n_ranges={n}"
            assert sums_rows == ref_sums, f"prefix_sums differ at n_ranges={n}"
            assert lead_rows == ref_lead, f"lead differs at n_ranges={n}"
        assert totals == {"b": df.agg(F.sum("b")).collect()[0][0]}


def test_global_lead_raises_on_null_value_col(spark):
    """The two-phase carry (min/max per partition) skips NULLs, so a NULL
    leading value would silently shift the stitched boundary lead — the
    contract is enforced in the per-partition scalar job (ADVICE r6)."""
    import pytest

    df = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("k")
    )
    with pytest.raises(ValueError, match="NULL"):
        global_lead(df, [("k", "asc")], "k", out="nx", n_ranges=8)
