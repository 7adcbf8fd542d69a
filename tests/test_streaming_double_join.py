"""q344 double stream-stream join: the boundary probes that pin the
ADDITIVE composition of join output-watermark delays (a window below
join → join emits iff window_end < W − (h1 + h2) STRICT — probe max
05:40 discriminates the sum rule from a max-horizon rule), plus a
non-degeneracy check on the gate query."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.streaming.windows import run_to_memory_sink

_SEQ = [0]


def _run_double_join(spark, max_ts):
    """Plant hourly view/click/purchase trios at h:20/h:25/h:30 for
    h = 0..3 plus a trio at ``max_ts``; run click⋈view (30 min) →
    purchase⋈cv (1 h) → 1 h window; return {start: n}."""
    rows = []
    eid = 0
    for h in range(4):
        rows.append((eid, "view", f"2024-01-01 0{h}:20:00")); eid += 1
        rows.append((eid, "click", f"2024-01-01 0{h}:25:00")); eid += 1
        rows.append((eid, "purchase", f"2024-01-01 0{h}:30:00")); eid += 1
    rows += [(97, "view", max_ts), (98, "click", max_ts),
             (99, "purchase", max_ts)]
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
    work = tempfile.mkdtemp(prefix="t344_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    tmp = os.path.join(work, "w0")
    df.coalesce(1).write.parquet(tmp)
    shutil.move(
        glob.glob(tmp + "/part-*.parquet")[0],
        os.path.join(sdir, "wave_0.parquet"),
    )
    stream = spark.readStream.schema(df.schema).parquet(sdir)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("vu"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    cv = clicks.join(
        views,
        (F.col("cu") == F.col("vu"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 30 MINUTES")),
    )
    pcv = purchases.join(
        cv,
        (F.col("user_id") == F.col("cu"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    agg = pcv.groupBy(F.window("p_ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    _SEQ[0] += 1
    sink = f"t344_probe_{_SEQ[0]}"
    run_to_memory_sink(agg, sink, mode="append", n_rows=len(rows))
    out = {
        str(r["w"]["start"]): r["n"] for r in spark.table(sink).collect()
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def test_double_join_delay_is_sum_not_max(spark):
    """max 05:40 → W = 05:30. Sum rule boundary 05:30 − 1:30 = 04:00:
    [03:00, 04:00) ends exactly AT it → withheld (strict). A
    max-horizon rule (− 1:00, boundary 04:30) would have emitted it."""
    out = _run_double_join(spark, "2024-01-01 05:40:00")
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 1,
        "2024-01-01 02:00:00": 1,
    }


def test_double_join_boundary_below(spark):
    """max 06:10 → W = 06:00, boundary 04:30: [03:00, 04:00) (end
    strictly below) emits."""
    out = _run_double_join(spark, "2024-01-01 06:10:00")
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-01 01:00:00": 1,
        "2024-01-01 02:00:00": 1,
        "2024-01-01 03:00:00": 1,
    }


def test_q344_nondegenerate_and_consistent(spark, sf_dir):
    rows = ALL_QUERIES["q344_streaming_double_join_exact"](
        spark, sf_dir
    ).collect()
    assert rows, "triple-join census must not be empty at gate SFs"
    assert all(r["n_triples"] >= 1 for r in rows)
    # checksums are sums of positive ids over n_triples rows
    assert all(
        r["purchase_checksum"] >= r["n_triples"] for r in rows
    )
