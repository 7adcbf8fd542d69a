"""q375 union-of-streams watermark: probes pinning that a query with
TWO withWatermark nodes combines them with MIN (default
multipleWatermarkPolicy), each branch's watermark is its OWN
max − its OWN delay, the union adds no delay (non-strict end ≤ W),
and the slow branch gates the whole union."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

_SEQ = [0]


def _run(spark, extra_click, extra_purchase):
    """Plant 1 click + 1 purchase per hour for hours 00-04, plus one
    extra click and one extra purchase at the given timestamps (the
    branch maxima); run the 10-min-click ∪ 90-min-purchase hourly
    census; return {window_start: (n_clicks, n_purchases)}."""
    rows = []
    eid = 0
    for h in range(5):
        rows.append((eid, "click", f"2024-01-01 0{h}:10:00")); eid += 1
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00")); eid += 1
    rows.append((98, "click", extra_click))
    rows.append((99, "purchase", extra_purchase))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, tss string"
    ).select("event_id", "event_type", F.to_timestamp("tss").alias("ts"))
    work = tempfile.mkdtemp(prefix="t375_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", "10 minutes"
    )
    purchases = stream.filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", "90 minutes")
    agg = clicks.unionByName(purchases).groupBy(
        F.window("ts", "1 hour").alias("w")
    ).agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("nc"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("np"),
    )
    _SEQ[0] += 1
    sink = f"t375_probe_{_SEQ[0]}"
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName(sink).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = {
        str(r["w"]["start"]): (r["nc"], r["np"])
        for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_union_min_policy_and_non_strict_boundary(spark):
    """Click max 07:10 → W_click 07:00; purchase max 06:30 → W_purchase
    05:00. MIN → W = 05:00: hours 00-04 emit — hour 4 ends exactly AT W
    (a strict rule would withhold it) and hours 5/6 are withheld (a MAX
    policy would emit through 07:00, including hour 6 where the extra
    purchase lands)."""
    out = _run(spark, "2024-01-01 07:10:00", "2024-01-01 06:30:00")
    assert out == {f"2024-01-01 0{h}:00:00": (1, 1) for h in range(5)}


def test_union_slow_branch_gates_fast_branch(spark):
    """Purchase max 05:20 → W_purchase 03:50 < W_click 07:00: only hours
    00-02 emit (hour 3 ends 04:00 > 03:50) — the 90-minute branch holds
    back windows the click branch alone would have released (the
    mixed-delay ops cost the block comment documents)."""
    out = _run(spark, "2024-01-01 07:10:00", "2024-01-01 05:20:00")
    assert out == {f"2024-01-01 0{h}:00:00": (1, 1) for h in range(3)}
