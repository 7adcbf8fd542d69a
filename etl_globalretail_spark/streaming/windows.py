"""Structured Streaming surface: windowed aggregations over the events
stream, sharing one transformation definition with the batch path.

The reference has no streaming (SURVEY.md §2.7); the events table is our
mandate to expose time-window analytics. Design rule: the *transformation*
is a function DataFrame → DataFrame that works identically on a batch frame
and a streaming frame — only the source/sink differ. q16_events_hourly is
the batch face (oracle-checked); the tests run the same aggregation through
``readStream`` + memory sink and assert parity with the batch result.

Watermarking: 10 minutes. In batch mode ``withWatermark`` is a no-op, so the
shared function can apply it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.schemas import TESTDATA_SCHEMAS


def hourly_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour windows: counts + value sums per event type.

    Streaming-legal aggregation set only (no countDistinct — not supported
    in update-mode streaming; the batch-only q16 adds it separately).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_avg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding windows — each event lands in window/slide overlapping frames."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet data.

    FileStreamSource requires a *directory* basePath; the testdata ships a
    single ``events.parquet`` file, so point the stream at the parent
    directory with a pathGlobFilter selecting just that file.

    The testdata stores ts as parquet TIMESTAMP(NANOS) (no native Spark
    type): declare it LongType under the nanos-as-long legacy conf and
    convert — the same coercion the batch reader does.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = TESTDATA_SCHEMAS["events"]
    fields = [
        f"{f.name} LONG" if f.name == "ts" else f"{f.name} {f.dataType.simpleString()}"
        for f in base.fields
    ]
    reader = spark.readStream.schema(", ".join(fields)).format("parquet")
    if path.endswith(".parquet"):
        parent, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = parent
    raw = reader.load(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, mode: str = "complete"
):
    """Drive a streaming aggregation into an in-memory table and block until
    the source is drained — the test/demo harness for stream/batch parity.
    """
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
