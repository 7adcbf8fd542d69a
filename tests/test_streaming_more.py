"""Streaming join-matrix laws (q303 full outer)."""

from __future__ import annotations


def test_q303_row_classes_partition_and_reconcile(spark, sf_dir):
    """Full-outer census laws: within every window the three row classes
    partition n_rows; across windows the matched count equals the batch
    inner join's, and left/right null totals equal the batch-side
    unmatched counts below their pinned boundaries."""
    import datetime

    from pyspark.sql import functions as F

    from etl_globalretail_spark.sources.readers import load_table
    from etl_globalretail_spark.streaming.windows import QUERIES

    rows = QUERIES["q303_streaming_full_outer_join_exact"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r["n_rows"] == (
            r["n_matched"] + r["n_left_null"] + r["n_right_null"]
        ), r

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("cu"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    inner = p.join(c, cond).count()
    assert sum(r["n_matched"] for r in rows) == inner
    wm = min(
        p.agg(F.max("p_ts")).collect()[0][0],
        c.agg(F.max("c_ts")).collect()[0][0],
    ) - datetime.timedelta(minutes=10)
    lnull = (
        p.join(c, cond, "left_anti")
        .filter(F.col("p_ts") < F.lit(wm))
        .count()
    )
    rnull = (
        c.join(p, cond, "left_anti")
        .filter(F.col("c_ts") < F.lit(wm - datetime.timedelta(hours=1)))
        .count()
    )
    assert sum(r["n_left_null"] for r in rows) == lnull
    assert sum(r["n_right_null"] for r in rows) == rnull
