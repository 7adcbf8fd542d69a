"""q320 chained tumbling→tumbling rollup: the emission-boundary probe
that pins the CLAUDE.md cookbook rule (both tiers emit iff window_end
≤ W, NON-strict — chained aggregation adds no watermark delay, unlike
an op downstream of a stream-stream join), plus the stream-equals-
batch law on the events table."""

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


def _run_rollup(spark, rows):
    """Plant (event_id, ts-string) rows, run the chained 1h→3h rollup
    through a real single-wave replay, return {(start, end): n}."""
    df = (
        spark.createDataFrame(rows, "event_id long, tss string")
        .select(
            "event_id",
            F.lit("t").alias("event_type"),
            F.to_timestamp("tss").alias("ts"),
            F.lit(1.0).alias("value"),
        )
    )
    work = tempfile.mkdtemp(prefix="t320_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w0")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    inner = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rollup = (
        inner.groupBy(F.window(F.window_time("w"), "3 hours").alias("w3"))
        .agg(F.sum("n").cast("long").alias("n"))
    )
    _SEQ[0] += 1
    sink = f"t320_probe_{_SEQ[0]}"
    run_to_memory_sink(rollup, sink, mode="append", n_rows=len(rows))
    out = {
        (str(r["w3"]["start"]), str(r["w3"]["end"])): r["n"]
        for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_rollup_boundary_nonstrict_no_delay(spark):
    """One event per hour 00:30–05:30 plus a max row at 06:30 → W =
    06:00:00 exactly, ON the 3 h boundary. The rollup window ending
    exactly AT W must EMIT (non-strict ≤), and its 3 cells prove the
    inner tier's own end-≤-W cells all reached it — i.e. chained
    aggregation adds NO join-style watermark delay (a delayed-by-1h
    rule would have withheld the [03:00, 06:00) window entirely)."""
    rows = [(i, f"2024-01-01 0{h}:30:00") for i, h in enumerate(range(6))]
    rows.append((99, "2024-01-01 06:30:00"))
    out = _run_rollup(spark, rows)
    assert out == {
        ("2024-01-01 00:00:00", "2024-01-01 03:00:00"): 3,
        ("2024-01-01 03:00:00", "2024-01-01 06:00:00"): 3,
    }


def test_rollup_withholds_past_watermark(spark):
    """Same plant with the max row at 05:59 → W = 05:29: the [03:00,
    06:00) rollup window (end 06:00 > W) is withheld even though its
    first inner cells were emittable; only [00:00, 03:00) emits."""
    rows = [(i, f"2024-01-01 0{h}:30:00") for i, h in enumerate(range(6))]
    rows.append((99, "2024-01-01 05:59:00"))
    out = _run_rollup(spark, rows)
    assert out == {("2024-01-01 00:00:00", "2024-01-01 03:00:00"): 3}


def test_q320_stream_equals_batch(spark, sf_dir):
    """The replayed rollup equals the batch recompute of the pinned
    arithmetic (kept = ¬wave2, both tiers end ≤ W) on the real table."""
    e = load_table(spark, "events", sf_dir)
    mx = e.agg(F.max("ts")).collect()[0][0]
    got = {
        (str(r["window_start"]), r["n_cells"], r["n_events"],
         round(r["sum_value"], 6))
        for r in ALL_QUERIES["q320_streaming_rollup_exact"](
            spark, sf_dir
        ).collect()
    }
    wm_ms = int(mx.timestamp() * 1000) - 30 * 60 * 1000
    kept = e.filter(
        ~((F.col("event_id") % 8 == 0) & (F.col("ts") != F.lit(mx)))
    )
    cells = (
        kept.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(27,6)")).alias("sv"))
        .filter(
            (F.unix_timestamp("h") + 3600) * 1000 <= F.lit(wm_ms)
        )
    )
    want = {
        (str(r["w3"]), r["n_cells"], r["n_events"],
         round(r["sum_value"], 6))
        for r in cells.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("h") / 10800).cast("long") * 10800
            ).alias("w3")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cells"),
             F.sum("n").cast("long").alias("n_events"),
             F.sum("sv").cast("double").alias("sum_value"))
        .filter(
            (F.unix_timestamp("w3") + 10800) * 1000 <= F.lit(wm_ms)
        )
        .collect()
    }
    assert got == want
