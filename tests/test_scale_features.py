"""Scale-machinery proofs: the optimizer features the 100 TB story leans
on, demonstrated live and plan-asserted (not just cited in PLANS.md).

- Dynamic partition pruning (DPP): a selective dimension filter prunes
  FACT partitions at runtime through the join — the star-schema scan
  killer at warehouse scale.
- AQE skew-join mitigation: a pathologically skewed build side is split
  into subpartitions at runtime (no manual salting) once the skew
  thresholds are crossed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.sources.formats import write_partitioned
from etl_globalretail_spark.sources.readers import load_table


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Join a year-partitioned fact to a dimension filtered on a
    non-partition column: the fact scan must carry a dynamicpruning
    subquery (runtime partition filter), and the result must match the
    statically-filtered equivalent."""
    o = load_table(spark, "orders", sf_dir).withColumn(
        "ano", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_part")
    write_partitioned(o, p, ["ano"])
    fact = spark.read.parquet(p)

    dim = spark.createDataFrame(
        [(1995, "target"), (1996, "other")], "ano int, tag string"
    ).filter(F.col("tag") == "target")

    joined = fact.join(dim, "ano").select("o_orderkey", "ano")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    want = fact.filter(F.col("ano") == 1995).count()
    assert joined.count() == want


def test_aqe_skew_join_splits_partitions(spark, sf_dir):
    """A 90%-one-key skewed side joined to a uniform side: with the skew
    thresholds lowered to fixture scale, AQE marks the sort-merge join
    skew-handling (isSkew=true / skew=true in the final plan) and the
    result is still exact."""
    n = 200_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    uniform = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        joined = skewed.join(uniform, "k")
        # collect() executes THIS frame's QueryExecution, finalizing its
        # adaptive plan (count() would plan a separate query and leave
        # isFinalPlan=false here)
        total = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "isSkew=true" in plan, plan[:3000]

        # exactness under the split: every skewed row with k in [0,100)
        # matches exactly one uniform row
        assert total == n
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime row-level Bloom pruning (the non-partitioned complement
    of DPP): a selective filter on one join side injects a
    bloom_filter_agg / might_contain pair so the BIG side drops
    non-joinable rows at scan time instead of shipping them through the
    shuffle — at 100 TB this is the difference between shuffling the
    fact table and shuffling ~its matching slice. Result must equal the
    plain join's."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 2_000_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        sel = spark.range(0, 2_000_000).select(
            F.col("id").alias("k")
        ).filter(F.col("k") % 1000 == 7)
        j = big.join(sel, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, (
            plan[:2000]
        )
        assert j.count() == 2_000_000 // 1000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
