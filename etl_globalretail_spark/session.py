"""SparkSession factory.

One place to encode the engine's execution posture:

- AQE on (runtime shuffle coalescing, auto broadcast switch, skew-join
  splitting) — at 100 TB skewed keys and mis-estimated shuffle widths are the
  norm, and AQE repairs both without manual hints.
- UTC session timezone — parquet timestamps must compare bit-stable against
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
- shuffle partitions sized to the machine for local runs; on a real cluster
  leave the default and let AQE coalesce (set ``shuffle_partitions=None``).
- Arrow enabled — every pandas_udf / mapInPandas operator in this repo moves
  columns in Arrow batches, never row-at-a-time pickles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-globalretail-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    On the test/bench box this is ``local[$SPARK_GRAFT_CPUS]``; the same
    configuration minus ``master`` is what a cluster deployment would use.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # See plans/queries.pin_generate_posture: the inferred generator
        # filter clones expensive explode inputs 3x per row.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply this engine's runtime-settable posture to an externally provided
    session (the driver hands us one in ``__spark_entry__``); static conf like
    driver memory cannot be changed here and is left alone.
    """
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    from etl_globalretail_spark.plans.queries import pin_generate_posture

    pin_generate_posture(spark)
    return spark
