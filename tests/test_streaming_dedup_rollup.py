"""q324 dedup→window multi-stateful chain: the boundary probe that
pins the third row of the cookbook's watermark-delay matrix
(dropDuplicatesWithinWatermark adds NO delay; the downstream window
emits iff window_end ≤ W non-strict), the dedup-bites law, and
stream-equals-batch on the events table."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.streaming.windows import run_to_memory_sink

_SEQ = [0]


def _run_chain(spark, max_ts):
    """Plant 00:30–03:30 events DELIVERED TWICE plus a max row; run
    dedup → hourly window; return {(end): n}."""
    rows = []
    for eid, h in enumerate(range(4)):
        rows.append((eid, f"2024-01-01 0{h}:30:00"))
        rows.append((eid, f"2024-01-01 0{h}:30:00"))
    rows.append((99, max_ts))
    df = (
        spark.createDataFrame(rows, "event_id long, tss string")
        .select("event_id", F.to_timestamp("tss").alias("ts"))
    )
    work = tempfile.mkdtemp(prefix="t324_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w0")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    _SEQ[0] += 1
    sink = f"t324_probe_{_SEQ[0]}"
    run_to_memory_sink(agg, sink, mode="append", n_rows=len(rows))
    out = {
        str(r["w"]["end"]): r["n"] for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_dedup_rollup_boundary_nonstrict_and_bites(spark):
    """max 04:30 → W = 04:00: the window ending exactly AT W emits
    (non-strict, NO dedup-induced delay) and every planted duplicate
    pair collapses to one row."""
    out = _run_chain(spark, "2024-01-01 04:30:00")
    assert out == {
        "2024-01-01 01:00:00": 1,
        "2024-01-01 02:00:00": 1,
        "2024-01-01 03:00:00": 1,
        "2024-01-01 04:00:00": 1,
    }


def test_dedup_rollup_withholds_past_watermark(spark):
    """max 04:29:59 → W = 03:59:59: the [03:00, 04:00) window (end
    just past W) is withheld."""
    out = _run_chain(spark, "2024-01-01 04:29:59")
    assert out == {
        "2024-01-01 01:00:00": 1,
        "2024-01-01 02:00:00": 1,
        "2024-01-01 03:00:00": 1,
    }


def test_q324_stream_equals_batch(spark, sf_dir):
    """The replayed census equals the each-event-once batch recompute
    at the pinned boundary — the doubled delivery must vanish."""
    e = load_table(spark, "events", sf_dir)
    mx = e.agg(F.max("ts")).collect()[0][0]
    wm_ms = int(mx.timestamp() * 1000) - 600000
    want = {
        tuple(r)
        for r in e.groupBy(
            F.date_trunc("hour", "ts").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("id_sum"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long")
            .alias("value_cents"),
        )
        .filter((F.unix_timestamp("w") + 3600) * 1000 <= F.lit(wm_ms))
        .withColumn("w", F.col("w").cast("string"))
        .collect()
    }
    got = {
        tuple(r)
        for r in ALL_QUERIES["q324_streaming_dedup_rollup_exact"](
            spark, sf_dir
        )
        .withColumn("window_start", F.col("window_start").cast("string"))
        .collect()
    }
    assert got == want
