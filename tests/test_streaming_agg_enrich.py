"""q377 windowed-agg → stream-enrichment join: probes pinning that a
stream-stream join REQUIRES an equality predicate, that the horizon
can be folded into an event-time-DERIVED key (prev-hour equality), and
that pairs emit at the census's OWN non-strict boundary (the agg's
zero delay propagates through the equi-join unchanged)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

_SEQ = [0]


def _streams(spark, rows, work):
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, tss string"
    ).select("event_id", "event_type", F.to_timestamp("tss").alias("ts"))
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    census = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .select(F.col("w.start").alias("cw_start"),
                F.window_time("w").alias("wt"), "n_clicks")
    )
    purch = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    ).withWatermark("p_ts", "10 minutes")
    return census, purch


def _plant(max_click_ts):
    """Clicks in hours 0-5 (planted max 05:20), purchases in hours 0-6
    (purchase-branch watermark 06:20 — never the global min here); the
    extra click at ``max_click_ts`` (> 05:20) sets the click-branch
    watermark, which is the query-global MIN."""
    rows = []
    eid = 0
    for h in range(6):
        rows.append((eid, "click", f"2024-01-01 0{h}:10:00")); eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:20:00")); eid += 1
    for h in range(7):
        rows.append((100 + h, "purchase", f"2024-01-01 0{h}:30:00"))
    rows.append((99, "click", max_click_ts))
    return rows


def _run(spark, rows):
    work = tempfile.mkdtemp(prefix="t377_probe_")
    census, purch = _streams(spark, rows, work)
    j = purch.join(
        census,
        (
            F.date_trunc("hour", F.col("p_ts")) - F.expr("INTERVAL 1 HOUR")
            == F.col("cw_start")
        )
        & (F.col("p_ts") > F.col("wt"))
        & (F.col("p_ts") <= F.col("wt") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    _SEQ[0] += 1
    sink = f"t377_probe_{_SEQ[0]}"
    q = (
        j.writeStream.outputMode("append").format("memory")
        .queryName(sink).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = sorted(
        (r["purchase_id"], str(r["cw_start"]))
        for r in spark.table(sink).collect()
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_pure_range_join_is_rejected(spark):
    """Without an equality predicate the stream-stream join is refused
    at runtime — the rule that forces the derived-key design."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    work = tempfile.mkdtemp(prefix="t377_rej_")
    census, purch = _streams(spark, _plant("2024-01-01 06:20:00"), work)
    j = purch.join(
        census,
        (F.col("p_ts") > F.col("wt"))
        & (F.col("p_ts") <= F.col("wt") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    _SEQ[0] += 1
    q = (
        j.writeStream.outputMode("append").format("memory")
        .queryName(f"t377_rej_{_SEQ[0]}").trigger(availableNow=True).start()
    )
    with pytest.raises(StreamingQueryException, match="equality"):
        q.awaitTermination()
    shutil.rmtree(work, ignore_errors=True)


def test_enrich_boundary_non_strict_at_census_rule(spark):
    """Click max 06:10 → W = min(06:00, 06:20) = 06:00: the hour-5
    census ends exactly AT W, emits (non-strict), and purchase 106
    (06:30) pairs with it — the agg's zero delay survives the
    derived-key equi-join; hour-0's purchase never pairs (no previous
    census: inner)."""
    out = _run(spark, _plant("2024-01-01 06:10:00"))
    assert out == [
        (100 + h, f"2024-01-01 0{h - 1}:00:00") for h in range(1, 7)
    ]


def test_enrich_census_past_watermark_withheld(spark):
    """Click max 05:50 → W = 05:40: the hour-5 census (end 06:00 > W) is
    withheld, so purchase 106 has no partner yet; hours 1-5 pair (a
    strict-delay rule would also withhold hour 5's census partner,
    ending 05:00 < 05:40 — it pairs, so the delay is zero)."""
    out = _run(spark, _plant("2024-01-01 05:50:00"))
    assert out == [
        (100 + h, f"2024-01-01 0{h - 1}:00:00") for h in range(1, 6)
    ]
