"""q366 non-key-determined dedup-after-join probe: pins WHY the
cookbook's "safe iff the deduped projection is key-determined" rule is
necessary. The same two arrival waves staged in both orders make the
SURVIVING click_id flip (dropDuplicatesWithinWatermark keeps the
first-seen row per key), while the survivor-invariant face — the
surviving purchase-key set — is identical either way. A column not
determined by the dedup key is therefore arrival-order luck and can
never sit on a hash gate; q333/q362 project it away first."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from etl_globalretail_spark.streaming.windows import (
    QUERIES,
    purchases_with_recent_click,
    run_to_memory_sink,
)

_SEQ = [0]


def _stage(df, sdir, wave):
    work = tempfile.mkdtemp(prefix="t366_w_")
    out = os.path.join(work, "w")
    df.coalesce(1).write.parquet(out)
    dst = os.path.join(sdir, f"wave_{wave}.parquet")
    shutil.move(glob.glob(out + "/part-*.parquet")[0], dst)
    os.utime(dst, (1_000_000_000 + wave * 100,) * 2)
    shutil.rmtree(work, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, tss string"
    ).select(
        "event_id", "event_type",
        F.to_timestamp("tss").alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit(0).cast("long").alias("user_id"),
    )


def _run(spark, first_click, second_click):
    """Purchase 100 at 02:00 has TWO candidate clicks (10 at 01:30, 20
    at 01:40). ``first_click`` arrives in wave 0 with the purchase;
    ``second_click`` in wave 1. Returns (survivor click_id for purchase
    100, sorted surviving purchase ids)."""
    clicks = {10: "2024-01-01 01:30:00", 20: "2024-01-01 01:40:00"}
    wave0 = _mk(spark, [
        (100, "purchase", "2024-01-01 02:00:00"),
        (first_click, "click", clicks[first_click]),
    ])
    wave1 = _mk(spark, [
        (second_click, "click", clicks[second_click]),
        (98, "purchase", "2024-01-01 06:00:00"),
        (99, "click", "2024-01-01 06:00:00"),
    ])
    work = tempfile.mkdtemp(prefix="t366_probe_")
    sdir = os.path.join(work, "s")
    os.makedirs(sdir)
    _stage(wave0, sdir, 0)
    _stage(wave1, sdir, 1)
    stream = (
        spark.readStream.schema(wave0.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
    )
    pairs = purchases_with_recent_click(stream, how="inner")
    # the probe projection: click_id is NOT determined by purchase_id
    dd = pairs.select(
        "purchase_id", "p_ts", "click_id"
    ).dropDuplicatesWithinWatermark(["purchase_id"])
    _SEQ[0] += 1
    sink = f"t366_probe_{_SEQ[0]}"
    run_to_memory_sink(dd, sink, mode="append", n_rows=5)
    rows = spark.table(sink).collect()
    survivors = {r["purchase_id"]: r["click_id"] for r in rows}
    shutil.rmtree(work, ignore_errors=True)
    return survivors.get(100), sorted(survivors)


def test_nonkey_column_is_arrival_order_luck(spark):
    """Swapping which click arrives first flips the surviving click_id
    while the surviving KEY SET (the q366 gate face) is unchanged —
    the failure mode the key-determined rule excludes."""
    click_a, keys_a = _run(spark, first_click=10, second_click=20)
    click_b, keys_b = _run(spark, first_click=20, second_click=10)
    assert keys_a == keys_b == [98, 100]  # invariant face
    assert click_a == 10 and click_b == 20  # first arrival wins
    assert click_a != click_b  # the luck the rule excludes


def test_gate_face_has_real_luck_mass(spark):
    """At the gate fixture the excluded mass is non-zero: some purchases
    have ≥2 distinct 12 h-window clicks, so the non-key-determined
    projection's survivor is genuinely unpinned there (not a
    hypothetical)."""
    out = QUERIES["q366_streaming_dedup_nonkey_probe"](
        spark, "/root/testdata/sf0.001"
    )
    tot = out.agg(
        F.sum("n_multi_purchases").alias("m"),
        F.sum("fanout_excess").alias("x"),
    ).collect()[0]
    assert tot["m"] > 0 and tot["x"] >= tot["m"]
