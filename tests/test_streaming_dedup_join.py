"""q362 dedup→join→window: probes pinning (a) the strict
end < W − horizon boundary with the NO-DELAY dedup upstream of the
join (the reverse composition of q333), and (b) that the dup collapse
is load-bearing — doubled clicks would double every count without it."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.streaming.windows import run_to_memory_sink

_SEQ = [0]


def _run(spark, max_ts, dedup=True):
    rows = []
    eid = 0
    for h in range(4):
        rows.append((eid, "click", f"2024-01-01 0{h}:25:00")); eid += 1
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00")); eid += 1
    rows += [(98, "click", max_ts), (99, "purchase", max_ts)]
    df = (
        spark.createDataFrame(
            rows, "event_id long, event_type string, tss string"
        )
        .select(
            "event_id", "event_type",
            F.to_timestamp("tss").alias("ts"),
            F.lit(0).cast("long").alias("user_id"),
        )
    )
    work = tempfile.mkdtemp(prefix="t362_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w0")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )

    def stream():
        return spark.readStream.schema(df.schema).parquet(sdir)

    doubled = stream().unionAll(stream())
    clicks = (
        doubled.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    if dedup:
        clicks = clicks.dropDuplicatesWithinWatermark(["click_id"])
    purchases = (
        stream().filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    agg = pairs.groupBy(F.window("p_ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    _SEQ[0] += 1
    sink = f"t362_probe_{_SEQ[0]}"
    run_to_memory_sink(agg, sink, mode="append", n_rows=len(rows))
    out = {
        str(r["w"]["start"]): r["n"] for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_dedup_join_boundary_strict_no_dedup_delay(spark):
    """max 04:10 → W = 04:00, boundary W − 1h = 03:00 STRICT: the
    [02:00, 03:00) window ending exactly AT it is withheld — the
    upstream dedup added NO delay (a delaying dedup would have moved
    the boundary to 02:50 or earlier and withheld [01:00, 02:00))."""
    out = _run(spark, "2024-01-01 04:10:00")
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 1,
    }


def test_dedup_collapse_is_load_bearing(spark):
    """Same plant WITHOUT the dedup: every pair count doubles (the
    doubled click stream joins twice)."""
    out = _run(spark, "2024-01-01 04:10:00", dedup=False)
    assert out == {
        "2024-01-01 00:00:00": 2,
        "2024-01-01 01:00:00": 2,
    }


def test_q362_nondegenerate(spark, sf_dir):
    rows = ALL_QUERIES["q362_streaming_dedup_join_rollup_exact"](
        spark, sf_dir
    ).collect()
    assert rows
    assert all(r["n_pairs"] >= 1 for r in rows)
