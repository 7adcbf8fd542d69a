"""q376 left-semi stream-stream interval join: probes pinning the
once-only output contract — a left row with MANY simultaneous matches
emits exactly once; a left row whose ONLY match arrives in a later
wave emits then (state retained until the watermark clears it); a
duplicate late click re-matching an already-emitted purchase does NOT
re-emit; unmatched rows never emit."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

_SEQ = [0]

_SCHEMA = "event_id long, event_type string, user_id long, tss string"


def _run(spark, waves):
    work = tempfile.mkdtemp(prefix="t376_semi_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    schema = None
    for i, rows in enumerate(waves):
        df = spark.createDataFrame(rows, _SCHEMA).select(
            "event_id", "event_type", "user_id",
            F.to_timestamp("tss").alias("ts"),
        )
        schema = df.schema
        tmp = os.path.join(work, f"w{i}")
        df.coalesce(1).write.parquet(tmp)
        dst = os.path.join(sdir, f"wave_{i}.parquet")
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
    )
    p = stream.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "10 minutes")
    c = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    ).withWatermark("c_ts", "10 minutes")
    semi = p.join(
        c,
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    _SEQ[0] += 1
    sink = f"t376_semi_{_SEQ[0]}"
    q = (
        semi.writeStream.outputMode("append").format("memory")
        .queryName(sink).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = sorted(r["purchase_id"] for r in spark.table(sink).collect())
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_semi_join_once_only_and_late_match(spark):
    """P1: one wave-0 match + a duplicate wave-1 match → once.
    P2: TWO simultaneous wave-0 matches → once (an inner join emits 2).
    P3: only match arrives in wave 1 → emits (state survived the wave).
    P4: no match in the window (click 2h earlier) → never emits."""
    w0 = [
        (1, "purchase", 1, "2024-01-01 01:00:00"),
        (2, "purchase", 2, "2024-01-01 02:00:00"),
        (3, "purchase", 3, "2024-01-01 05:00:00"),
        (4, "purchase", 4, "2024-01-01 05:30:00"),
        (10, "click", 1, "2024-01-01 00:40:00"),
        (11, "click", 2, "2024-01-01 01:50:00"),
        (12, "click", 2, "2024-01-01 01:55:00"),
        (13, "click", 4, "2024-01-01 03:20:00"),  # 2h10m before P4: outside
        (99, "click", 9, "2024-01-01 06:00:00"),  # advances the click max
    ]
    w1 = [
        (14, "click", 3, "2024-01-01 04:40:00"),  # P3's only match
        (15, "click", 1, "2024-01-01 00:50:00"),  # P1's duplicate match
    ]
    assert _run(spark, [w0, w1]) == [1, 2, 3]


def test_semi_join_single_wave_equals_exists(spark):
    """One wave (the q376 gate discipline): output = the EXISTS set."""
    w0 = [
        (1, "purchase", 1, "2024-01-01 01:00:00"),
        (2, "purchase", 2, "2024-01-01 02:00:00"),
        (10, "click", 1, "2024-01-01 00:30:00"),
        (11, "click", 2, "2024-01-01 00:30:00"),  # 1.5h before P2: outside
    ]
    assert _run(spark, [w0]) == [1]
