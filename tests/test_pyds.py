"""Tests for the Python Data Source connector (sources/pyds.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.sources.pyds import (
    _payload,
    read_synthetic_events,
)


def test_synthetic_source_complete_and_deterministic(spark):
    """Exactly n rows, indices 0..n-1 once each, payloads matching the
    driver-side hash recipe; re-reading yields the identical dataset."""
    df = read_synthetic_events(spark, 1000, partitions=7)
    rows = {r["i"]: (r["bucket"], r["val"]) for r in df.collect()}
    assert set(rows) == set(range(1000))
    for i in (0, 1, 500, 999):
        assert rows[i] == _payload(i)
    again = {r["i"]: (r["bucket"], r["val"]) for r in df.collect()}
    assert again == rows


def test_synthetic_source_parallel_splits(spark):
    """The declared partition count reaches the physical scan (rows carry
    P distinct spark_partition_ids, each a contiguous index range)."""
    df = read_synthetic_events(spark, 800, partitions=4)
    got = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("i").alias("lo"), F.max("i").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(got) == 4
    spans = sorted((r["lo"], r["hi"], r["n"]) for r in got)
    assert spans == [(0, 199, 200), (200, 399, 200),
                     (400, 599, 200), (600, 799, 200)]


def test_synthetic_source_ragged_tail(spark):
    """n not divisible by partitions: the tail split is short, nothing is
    lost or duplicated."""
    df = read_synthetic_events(spark, 103, partitions=4)
    assert df.count() == 103
    assert df.select(F.sum("i")).collect()[0][0] == 103 * 102 // 2


def test_jsonl_sink_roundtrip_and_commit(spark, tmp_path):
    """The Python writer path: parallel part files, a commit marker with
    the total row count, and content that round-trips."""
    import json
    import os

    from etl_globalretail_spark.sources.pyds import register_jsonl_sink

    register_jsonl_sink(spark)
    df = spark.range(0, 500, 1, 4).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "jsonl_out")
    df.write.format("jsonl_py").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert open(os.path.join(out, "_SUCCESS")).read().strip() == "500"
    parts = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(parts) == 4
    rows = []
    for f in parts:
        with open(os.path.join(out, f)) as fh:
            rows.extend(json.loads(line) for line in fh)
    assert sorted((r["id"], r["v"]) for r in rows) == [
        (i, 2 * i) for i in range(500)
    ]
