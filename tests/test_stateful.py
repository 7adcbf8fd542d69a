"""applyInPandasWithState: state must survive micro-batch boundaries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.streaming.stateful import running_user_totals


def test_running_totals_across_microbatches(spark, sf_dir, tmp_path):
    events = load_table(spark, "events", sf_dir)

    # Two parquet files + maxFilesPerTrigger=1 → two micro-batches. Split by
    # EVENT id parity so every user has rows in both batches — the
    # accumulator provably carries per-user state across the batch boundary.
    src = f"{tmp_path}/stream_src"
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch

    # "update" emits one row per user per batch it appears in; the LAST
    # emission per user is the final state.
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("user_totals_test").collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, s) in want.items():
        gn, gs = got[uid]
        assert gn == n
        assert math.isclose(gs, s, rel_tol=1e-9, abs_tol=1e-9)


def test_running_totals_tws_parity(spark, sf_dir, tmp_path):
    """transformWithStateInPandas twin: same two-micro-batch drive, same
    batch ground truth, so both arbitrary-state APIs are held to identical
    semantics. TWS requires the RocksDB state store provider AND the
    protobuf runtime (its state server speaks proto to the JVM) — absent
    protobuf (this container), the operator is still importable/plannable
    and the test skips."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state server requires protobuf, "
        "not installed in this container",
    )
    from etl_globalretail_spark.streaming.stateful import running_user_totals_tws

    events = load_table(spark, "events", sf_dir)
    src = f"{tmp_path}/stream_src_tws"
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("user_totals_tws_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.lastProgress["batchId"] >= 1
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.table("user_totals_tws_test").collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, s) in want.items():
        gn, gs = got[uid]
        assert gn == n
        assert math.isclose(gs, s, rel_tol=1e-9, abs_tol=1e-9)
