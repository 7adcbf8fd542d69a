"""As-of join semantics on micro-fixtures + the scale-critical plan shape."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.asof import as_of_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00"), 100.0),
            (2, "a", _ts("2024-01-01T12:00:00"), 200.0),
            (3, "b", _ts("2024-01-01T09:00:00"), 300.0),  # before any right
            (4, "c", _ts("2024-01-01T09:00:00"), 400.0),  # key with no right rows
        ],
        "id long, k string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30:00"), 1.0),
            ("a", _ts("2024-01-01T11:00:00"), 2.0),
            ("a", _ts("2024-01-01T12:00:00"), 3.0),  # tie with left id=2
            ("b", _ts("2024-01-01T09:30:00"), 4.0),
        ],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_matches_latest_at_or_before(spark):
    left, right = _fixture(spark)
    got = {
        r.id: (r.asof_ts, r.asof_rv)
        for r in as_of_join(left, right, on="k", ts_col="ts").collect()
    }
    assert got[1] == (_ts("2024-01-01T09:30:00"), 1.0)  # latest ≤ 10:00
    assert got[2] == (_ts("2024-01-01T12:00:00"), 3.0)  # tie: ts == matches
    assert got[3] == (None, None)  # right rows exist but all later
    assert got[4] == (None, None)  # no right rows for key
    assert set(got) == {1, 2, 3, 4}  # left-preserving


def test_asof_payload_from_single_right_row(spark):
    """All payload columns must come from the SAME matched right row."""
    left, right = _fixture(spark)
    r2 = right.withColumn("tag", F.concat(F.lit("t"), F.col("rv").cast("int")))
    row = {
        r.id: (r.asof_rv, r.asof_tag)
        for r in as_of_join(left, r2, on="k", ts_col="ts").collect()
    }
    for _id, (rv, tag) in row.items():
        if rv is not None:
            assert tag == f"t{int(rv)}", (rv, tag)


def test_range_join_boundaries_and_bin_straddle(spark):
    from etl_globalretail_spark.operators.asof import range_join

    # interval straddles many 30-day bins; points probe both boundaries
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # == start: in (inclusive)
            (2, _ts("2024-03-15T12:00:00")),  # interior, different bin
            (3, _ts("2024-06-01T00:00:00")),  # == end: out (exclusive)
            (4, _ts("2023-12-31T23:59:59")),  # just before start
        ],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [("w", _ts("2024-01-01T00:00:00"), _ts("2024-06-01T00:00:00"))],
        "name string, t_start timestamp, t_end timestamp",
    )
    got = sorted(
        r.id for r in range_join(left, "ts", right, "t_start", "t_end").collect()
    )
    assert got == [1, 2]


def test_range_join_no_pair_duplicates(spark):
    from etl_globalretail_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(i, _ts(f"2024-02-0{d}T00:00:00")) for i, d in enumerate([1, 2, 3], 1)],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [("w", _ts("2024-01-01T00:00:00"), _ts("2024-12-31T00:00:00"))],
        "name string, t_start timestamp, t_end timestamp",
    )
    out = range_join(left, "ts", right, "t_start", "t_end", bin_days=7)
    assert out.count() == 3  # long interval × small bins: still one row per pair


def test_range_join_is_equi_join(spark):
    from etl_globalretail_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("w", _ts("2024-01-01T00:00:00"), _ts("2024-02-01T00:00:00"))],
        "name string, t_start timestamp, t_end timestamp",
    )
    plan = (
        range_join(left, "ts", right, "t_start", "t_end")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_plan_single_shuffle_no_crossjoin(spark):
    left, right = _fixture(spark)
    df = as_of_join(left, right, on="k", ts_col="ts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
