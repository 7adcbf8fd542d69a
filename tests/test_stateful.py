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
