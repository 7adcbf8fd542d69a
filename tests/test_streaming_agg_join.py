"""q371 join-of-two-windowed-aggregates: the boundary probe pinning
that a window-EQUALITY equi-join of two completed aggregates adds NO
watermark delay — the window ending exactly AT W is EMITTED
(non-strict end ≤ W), where every time-interval-join composition in
the matrix is strict at end < W − horizon."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

_SEQ = [0]


def _run(spark, max_ts):
    """Plant 2 clicks + 1 purchase per hour for 5 hours plus a max
    click+purchase at ``max_ts``; run the agg ⋈ agg chain; return
    {window_start: (n_clicks, n_purchases)}."""
    rows = []
    eid = 0
    for h in range(5):
        rows.append((eid, "click", f"2024-01-01 0{h}:10:00")); eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:20:00")); eid += 1
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00")); eid += 1
    rows.append((98, "click", max_ts))
    rows.append((99, "purchase", max_ts))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, tss string"
    ).select("event_id", "event_type", F.to_timestamp("tss").alias("ts"))
    work = tempfile.mkdtemp(prefix="t371_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)

    def census(etype, out):
        return (
            stream.filter(F.col("event_type") == etype)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    joined = census("click", "n_clicks").join(
        census("purchase", "n_purchases"), "w"
    )
    _SEQ[0] += 1
    sink = f"t371_probe_{_SEQ[0]}"
    q = (
        joined.writeStream.outputMode("append").format("memory")
        .queryName(sink).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = {
        str(r["w"]["start"]): (r["n_clicks"], r["n_purchases"])
        for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_agg_join_boundary_non_strict(spark):
    """max 05:10 → W = 05:00: the [04:00, 05:00) window ending exactly
    AT W is EMITTED — the equi-join on windows adds zero delay (a
    strict rule would withhold it; the time-interval-join rows of the
    matrix all would)."""
    out = _run(spark, "2024-01-01 05:10:00")
    assert out == {
        f"2024-01-01 0{h}:00:00": (2, 1) for h in range(5)
    }


def test_agg_join_boundary_withholds_past_watermark(spark):
    """max 04:50 → W = 04:40: the [04:00, 05:00) window (end 05:00 > W)
    is withheld, earlier hours emit — the boundary is the watermark,
    not source exhaustion."""
    out = _run(spark, "2024-01-01 04:50:00")
    assert out == {
        f"2024-01-01 0{h}:00:00": (2, 1) for h in range(4)
    }
