"""The r7 low-cardinality-window rewrites must be VALUE-IDENTICAL to the
single-window forms they replaced, on a synthetic frame engineered to
cross every boundary the devices introduce: q98's ghost-row day
bucketing (rows exactly at, just inside, and just outside the 1-hour
frame across day boundaries; duplicate timestamps) and q228's
value-grid order statistics (even/odd group sizes, heavy ties)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _events(spark):
    # Per type: 200 pseudo-random rows over a 3-day span PLUS, for each
    # of the 3 UTC-day boundaries in that span, rows planted exactly ON
    # the boundary, exactly 1h before it, and 1µs inside/outside both —
    # the positions where a ghost-filter off-by-one (> vs >=) or a frame
    # off-by-one would show. day0 is grid-aligned (base − base % day) so
    # "boundary" means a REAL bucket boundary; duplicate timestamps are
    # included (range frames include ties).
    day, hour = 86_400_000_000, 3_600_000_000
    base = 1_700_000_000_000_000
    day0 = base - (base % day)
    rows = []
    for t in ("a", "b"):
        for i in range(200):
            us = day0 + (i * 13_777_000_000) % (3 * day)
            rows.append((t, us, float(i % 7)))
            rows.append((t, us, float(i % 5)))  # duplicate ts
        for k in (1, 2, 3):
            b = day0 + k * day
            for us in (b - hour - 1, b - hour, b - hour + 1,
                       b - 1, b, b + 1):
                rows.append((t, us, float(k)))
    return spark.createDataFrame(
        rows, "event_type string, us long, value double"
    )


def test_ghost_row_bucketing_matches_single_window(spark):
    e = _events(spark)
    hour, day = 3_600_000_000, 86_400_000_000

    # single-window reference (the pre-r7 q98 shape)
    w_ref = (
        Window.partitionBy("event_type").orderBy("us")
        .rangeBetween(-hour, 0)
    )
    ref = e.select(
        "event_type", "us", "value",
        F.count(F.lit(1)).over(w_ref).alias("n_trailing"),
        (F.sum(F.col("value").cast("decimal(27,6)")).over(w_ref)
         .cast("double") / F.count(F.lit(1)).over(w_ref))
        .alias("avg_trailing"),
    )

    # ghost-row day-bucketed form (the q98 device)
    base = e.select(
        "event_type", "us", "value",
        (F.col("us") - (F.col("us") % day)).alias("bstart"),
    )
    native = base.withColumn("ghost", F.lit(False))
    ghosts = base.filter(
        F.col("us") >= F.col("bstart") + (day - hour)
    ).select(
        "event_type", "us", "value",
        (F.col("bstart") + day).alias("bstart"),
        F.lit(True).alias("ghost"),
    )
    w = (
        Window.partitionBy("event_type", "bstart").orderBy("us")
        .rangeBetween(-hour, 0)
    )
    got = (
        native.unionAll(ghosts)
        .select(
            "event_type", "us", "value", "ghost",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            (F.sum(F.col("value").cast("decimal(27,6)")).over(w)
             .cast("double") / F.count(F.lit(1)).over(w))
            .alias("avg_trailing"),
        )
        .filter(~F.col("ghost"))
        .drop("ghost")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_grid_order_statistics_match_row_ranks(spark):
    # heavy ties + both parities of n per group
    rows = [("g1", v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]] + [
        ("g2", v) for v in [2, 7, 1, 8, 2, 8]
    ] + [("g3", v) for v in [4]]
    df = spark.createDataFrame(rows, "g string, x long")

    wp = Window.partitionBy("g")
    ranked = df.select(
        "g", "x",
        F.row_number().over(wp.orderBy("x")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_r = F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("x")))
    hi_r = F.max(F.when(F.col("rn") == F.expr("(n + 2) div 2"), F.col("x")))
    ref = {
        r["g"]: (r["lo"], r["hi"])
        for r in ranked.groupBy("g")
        .agg(lo_r.alias("lo"), hi_r.alias("hi"))
        .collect()
    }

    grid = df.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    wg = Window.partitionBy("g").orderBy("x")
    wn = Window.partitionBy("g")
    g = grid.select(
        "g", "x",
        F.sum("c").over(wg).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    lo_g = F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("x")))
    hi_g = F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"), F.col("x")))
    got = {
        r["g"]: (r["lo"], r["hi"])
        for r in g.groupBy("g").agg(lo_g.alias("lo"), hi_g.alias("hi"))
        .collect()
    }
    assert got == ref


def test_q98_persists_shared_base(spark, sf_dir):
    """q98's base projection feeds both union legs — the persist must
    show as InMemoryTableScan on BOTH (the CLAUDE.md consumed-twice
    rule), or the events scan runs twice."""
    from etl_globalretail_spark.plans.analytics import QUERIES as AQ

    plan = (
        AQ["q98_trailing_window_avg"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("InMemoryTableScan") >= 2, plan
