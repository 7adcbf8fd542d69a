"""q333 join→dedup→window 3-stateful chain: the boundary probe pinning
that the join's output-watermark delay PROPAGATES THROUGH an interposed
dropDuplicatesWithinWatermark unchanged (strict end < W − horizon), and
that the dedup collapses the join's multi-click fanout."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.streaming.windows import (
    purchases_with_recent_click,
    run_to_memory_sink,
)

_SEQ = [0]


def _run_chain(spark, max_ts):
    """Plant hourly purchases at 0h:30 with TWO clicks each (0h:25,
    0h:20 — join fanout 2) plus a max purchase+click at ``max_ts``;
    run join → dedup → 1h window; return {start: n_purchases}."""
    rows = []
    eid = 0
    for h in range(4):
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00", 1.0))
        eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:25:00", 0.0))
        eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:20:00", 0.0))
        eid += 1
    rows.append((98, "purchase", max_ts, 1.0))
    rows.append((99, "click", max_ts, 0.0))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, tss string, value double"
    ).select(
        "event_id", "event_type",
        F.to_timestamp("tss").alias("ts"), "value",
        F.lit(0).cast("long").alias("user_id"),
    )
    work = tempfile.mkdtemp(prefix="t333_probe_")
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
    dd = pairs.select(
        "purchase_id", "p_ts", "purchase_value"
    ).dropDuplicatesWithinWatermark(["purchase_id"])
    agg = dd.groupBy(F.window("p_ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    _SEQ[0] += 1
    sink = f"t333_probe_{_SEQ[0]}"
    run_to_memory_sink(agg, sink, mode="append", n_rows=len(rows))
    out = {
        str(r["w"]["start"]): r["n"] for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_join_dedup_boundary_strict_and_fanout_collapsed(spark):
    """max 04:10 → W = 04:00, W − horizon = 03:00: [02:00, 03:00)
    ending exactly AT the delayed boundary is WITHHELD (the dedup adds
    no delay but does not erase the join's), and every emitted count is
    1 despite the fanout-2 clicks."""
    out = _run_chain(spark, "2024-01-01 04:10:00")
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 1,
    }


def test_join_dedup_boundary_below(spark):
    out = _run_chain(spark, "2024-01-01 05:10:00")
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 1,
        "2024-01-01 02:00:00": 1,
    }


def test_q333_stream_equals_batch(spark, sf_dir):
    """The replayed chain equals the batch DISTINCT-purchase census of
    the interval join, filtered to the pinned strict boundary."""
    from etl_globalretail_spark.plans.registry import ALL_QUERIES
    from etl_globalretail_spark.sources.readers import load_table

    got = {
        (str(r["window_start"]), r["n_purchases"], r["id_checksum"],
         r["value_cents"])
        for r in ALL_QUERIES["q333_streaming_join_dedup_rollup_exact"](
            spark, sf_dir
        ).collect()
    }
    e = load_table(spark, "events", sf_dir)
    pairs = purchases_with_recent_click(e, how="inner")
    wm = (
        e.filter(F.col("event_type") == "purchase")
        .agg(F.max("ts"))
        .crossJoin(
            e.filter(F.col("event_type") == "click").agg(
                F.max("ts").alias("mc")
            )
        )
        .first()
    )
    wm_ms = min(
        int(wm[0].timestamp() * 1000), int(wm["mc"].timestamp() * 1000)
    ) - 600_000
    exp = {
        (str(r["ws"]), r["n"], r["ids"], r["cents"])
        for r in (
            pairs.select("purchase_id", "p_ts", "purchase_value")
            .distinct()
            .groupBy(
                F.date_trunc("hour", "p_ts").alias("ws")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("purchase_id").cast("long").alias("ids"),
                F.sum(F.floor(F.col("purchase_value") * 100).cast("long"))
                .cast("long").alias("cents"),
            )
            .filter(
                (F.unix_timestamp(F.col("ws")) + 3600) * 1000
                < wm_ms - 3_600_000
            )
            .collect()
        )
    }
    assert got == exp
