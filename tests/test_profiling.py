"""Sketch-profile error bounds: the approximate profile must track the
exact one within its configured guarantees (with slack for small-sample
variance at fixture scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.profiling import exact_profile, sketch_profile
from etl_globalretail_spark.sources.readers import load_table


def test_sketch_cardinality_within_bound(spark, sf_dir):
    e = load_table(spark, "events", sf_dir)
    exact = {
        r.event_type: r.n_distinct_ids
        for r in exact_profile(e, "event_type", "user_id", "value").collect()
    }
    approx = {
        r.event_type: r.approx_distinct_ids
        for r in sketch_profile(e, "event_type", "user_id", "value").collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        # 2% rsd → 10% is a ≥5-sigma envelope even at fixture cardinalities
        assert abs(approx[et] - n) <= max(0.10 * n, 2), (et, n, approx[et])


def test_sketch_quantiles_bracket_exact(spark, sf_dir):
    e = load_table(spark, "events", sf_dir)
    rows = sketch_profile(e, "event_type", "user_id", "value").collect()
    exact = {
        r.event_type: (r.min_value, r.max_value)
        for r in exact_profile(e, "event_type", "user_id", "value").collect()
    }
    for r in rows:
        q50, q95, q99 = r.value_quantiles
        lo, hi = exact[r.event_type]
        assert lo <= q50 <= q95 <= q99 <= hi, (r.event_type, r.value_quantiles)


def test_null_audit_single_scan(spark, sf_dir):
    """The audit reads the table once — one aggregate, no per-column scans
    or unions of scans."""
    from etl_globalretail_spark.operators.profiling import null_audit

    df = null_audit(
        load_table(spark, "customer", sf_dir), ["c_name", "c_acctbal"]
    )
    rows = {r.column_name: (r.n_rows, r.n_missing) for r in df.collect()}
    assert set(rows) == {"c_name", "c_acctbal"}
    assert all(n == rows["c_name"][0] for n, _ in rows.values())
    # AQE's toString appends an "Initial Plan" section that duplicates
    # every node — count only the final plan.
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Scan parquet") == 1, plan


def test_sketch_profile_single_shuffle(spark, sf_dir):
    """The whole sketch profile is one partial/final aggregate pair — one
    exchange of sketch states, nothing resembling a distinct expansion."""
    df = sketch_profile(
        load_table(spark, "events", sf_dir), "event_type", "user_id", "value"
    )
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the exact profile's countDistinct needs a second expand/aggregate pass
    exact = exact_profile(
        load_table(spark, "events", sf_dir), "event_type", "user_id", "value"
    )
    exact.write.format("noop").mode("overwrite").save()
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    assert exact_plan.count("HashAggregate") > plan.count("HashAggregate")


def test_hll_partials_merge_across_batches_and_groups(spark, sf_dir):
    """Sketch states built on disjoint halves merge to the same estimate
    as a single-pass sketch, the global re-grain needs only the sketch
    rows, and estimates sit within HLL error of exact counts."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.profiling import (
        hll_merge,
        hll_partial,
    )

    e = load_table(spark, "events", sf_dir)
    half_a = e.filter(F.col("event_id") % 2 == 0)
    half_b = e.filter(F.col("event_id") % 2 == 1)

    # two "daily batches" → sketch rows; merged per event_type
    partials = hll_partial(half_a, ["event_type"], "user_id").unionByName(
        hll_partial(half_b, ["event_type"], "user_id")
    )
    merged = {
        r.event_type: (r.distinct_estimate, r.n_rows)
        for r in hll_merge(partials, ["event_type"]).collect()
    }
    exact = {
        r.event_type: (r.d, r.n)
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(merged) == set(exact)
    for et, (est, n_rows) in merged.items():
        d, n = exact[et]
        assert n_rows == n  # row counts are exact, additive
        assert abs(est - d) <= max(3, 0.05 * d), (et, est, d)

    # global rollup from the SAME sketch rows (no rescan)
    g = hll_merge(partials, []).collect()[0]
    exact_global = e.select("user_id").distinct().count()
    assert abs(g.distinct_estimate - exact_global) <= max(
        3, 0.05 * exact_global
    )
    assert g.n_rows == e.count()


def test_fixed_histogram_tiles_and_clamps(spark, sf_dir):
    """Bin counts sum to the row count; out-of-range values land in the
    edge bins rather than vanishing."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.profiling import fixed_histogram

    e = load_table(spark, "events", sf_dir)
    h = fixed_histogram(e, "value", 0.0, 500.0, 20, ["event_type"])
    assert sum(r.n for r in h.collect()) == e.count()

    oob = spark.createDataFrame(
        [(-5.0,), (0.0,), (999.0,)], "v double"
    )
    got = {r.bin: r.n for r in fixed_histogram(oob, "v", 0.0, 100.0, 10).collect()}
    assert got == {0: 2, 9: 1}  # -5 and 0 clamp low, 999 clamps high


def test_countmin_never_underestimates_and_merges(spark, sf_dir):
    """CMS invariants: (a) estimate ≥ exact for every probed key; (b) a
    sketch built on the full data equals the element-wise cell sum of
    sketches built on disjoint halves (mergeability — the reason a
    fixed-size sketch beats an exact vocabulary aggregate at 100 TB)."""
    from etl_globalretail_spark.operators.profiling import (
        countmin_build,
        countmin_estimate,
    )
    from etl_globalretail_spark.operators.text import tokens
    from etl_globalretail_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, "documents", sf_dir)
    occ = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))

    sketch = countmin_build(occ, "token")
    exact = occ.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    probes = exact.orderBy(F.desc("n"), "token").limit(20).select("token", "n")
    est = countmin_estimate(sketch, probes.select("token"), "token")
    joined = probes.join(est, "token").collect()
    assert len(joined) == 20
    assert all(r.cms_estimate >= r.n for r in joined)

    halves = [occ.filter(f"doc_id % 2 = {i}") for i in (0, 1)]
    merged = (
        countmin_build(halves[0], "token")
        .unionByName(countmin_build(halves[1], "token"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.row, r.bucket): r.cnt for r in sketch.collect()}
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == full
