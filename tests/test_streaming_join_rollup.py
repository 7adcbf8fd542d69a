"""q321 join→tumbling-window multi-stateful query: the boundary probe
that pins the window-kind-independence of the join's output-watermark
delay (a tumbling window downstream of a stream-stream join emits iff
window_end < W − horizon STRICT, exactly like q310's session), plus
stream-equals-batch on the events table."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.streaming.windows import (
    purchases_with_recent_click,
    run_to_memory_sink,
)

_SEQ = [0]


def _run_join_rollup(spark, max_ts):
    """Plant hourly purchase/click pairs at 00:30/00:25 … 03:30/03:25
    plus a max purchase+click at ``max_ts``; run join → 1h window
    through a real replay; return {(start, end): n_pairs}."""
    rows = []
    eid = 0
    for h in range(4):
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00", 1.0))
        eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:25:00", 0.0))
        eid += 1
    rows.append((98, "purchase", max_ts, 1.0))
    rows.append((99, "click", max_ts, 0.0))
    df = (
        spark.createDataFrame(
            rows, "event_id long, event_type string, tss string, value double"
        )
        .select(
            "event_id", "event_type",
            F.to_timestamp("tss").alias("ts"), "value",
            F.lit(0).cast("long").alias("user_id"),
        )
    )
    work = tempfile.mkdtemp(prefix="t321_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w0")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    pairs = purchases_with_recent_click(stream, how="inner")
    agg = (
        pairs.groupBy(F.window("p_ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    _SEQ[0] += 1
    sink = f"t321_probe_{_SEQ[0]}"
    run_to_memory_sink(agg, sink, mode="append", n_rows=len(rows))
    out = {
        (str(r["w"]["start"]), str(r["w"]["end"])): r["n_pairs"]
        for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_join_rollup_boundary_strict(spark):
    """max 04:10 → W = 04:00, W − horizon = 03:00: the [02:00, 03:00)
    window ending exactly AT the delayed watermark is WITHHELD — the
    join-downstream rule is strict for tumbling windows exactly as q310
    pinned it for sessions (window-kind independent)."""
    out = _run_join_rollup(spark, "2024-01-01 04:10:00")
    assert out == {
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"): 1,
        ("2024-01-01 01:00:00", "2024-01-01 02:00:00"): 1,
    }


def test_join_rollup_boundary_below(spark):
    """max 05:10 → boundary 04:00: [02:00, 03:00) (end strictly below)
    emits; [03:00, 04:00) (end exactly AT) is withheld."""
    out = _run_join_rollup(spark, "2024-01-01 05:10:00")
    assert out == {
        ("2024-01-01 00:00:00", "2024-01-01 01:00:00"): 1,
        ("2024-01-01 01:00:00", "2024-01-01 02:00:00"): 1,
        ("2024-01-01 02:00:00", "2024-01-01 03:00:00"): 1,
    }


def test_q321_stream_equals_batch(spark, sf_dir):
    """The replayed rollup equals the batch interval join grouped hourly
    and filtered to the pinned strict boundary."""
    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"), "value",
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts"),
    )
    wm_ms = min(
        int(p.agg(F.max("p_ts")).collect()[0][0].timestamp() * 1000),
        int(c.agg(F.max("c_ts")).collect()[0][0].timestamp() * 1000),
    ) - 600000
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    want = {
        tuple(r)
        for r in pairs.groupBy(
            F.date_trunc("hour", "p_ts").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("purchase_id").cast("long").alias("n_purchases"),
            F.sum("click_id").cast("long").alias("click_checksum"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long")
            .alias("value_cents"),
        )
        .filter(
            (F.unix_timestamp("w") + 3600) * 1000 < F.lit(wm_ms - 3600000)
        )
        .withColumn("w", F.col("w").cast("string"))
        .collect()
    }
    got = {
        tuple(r)
        for r in ALL_QUERIES["q321_streaming_join_rollup_exact"](
            spark, sf_dir
        )
        .withColumn("window_start", F.col("window_start").cast("string"))
        .collect()
    }
    assert got == want
