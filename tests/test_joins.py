"""Unit tests for operators/joins.py — Bloom-filter join pre-reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.joins import (
    bloom_bits_for,
    bloom_prefilter,
    build_bloom,
    q144_bloom_join_reduction,
)
from etl_globalretail_spark.sources.readers import load_table


def test_bloom_no_false_negatives(spark):
    """Every key that went into the bitmap passes the filter — the property
    the exact join result depends on."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bitmap = build_bloom(keys, "k", bloom_bits_for(500))
    kept = bloom_prefilter(keys, "k", bitmap)
    assert kept.count() == 500


def test_bloom_false_positive_rate_bounded(spark):
    """Disjoint probe keys are almost all rejected (~sub-percent fp at 16
    bits/key, k=3; assert a loose 5% bound to stay flake-free)."""
    build = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = build_bloom(build, "k", bloom_bits_for(1000))
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, "k", bitmap).count()
    assert fp < 0.05 * 20_000, fp


def test_bloom_prefilter_is_shuffle_free(spark):
    """The membership filter adds no Exchange — it must run map-side."""
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    bitmap = build_bloom(df, "k", 1024)
    plan = bloom_prefilter(df, "k", bitmap)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bloom_join_transparent_vs_plain_join(spark, sf_dir):
    """q144's pre-filtered join ≡ the plain join, row for row."""
    got = {
        r["o_orderpriority"]: (r["n_items"], round(r["revenue"], 4))
        for r in q144_bloom_join_reduction(spark, sf_dir).collect()
    }
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 470000.0)
    li = load_table(spark, "lineitem", sf_dir)
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(27,6)")).cast("double").alias("revenue"),
        )
    )
    want = {
        r["o_orderpriority"]: (r["n_items"], round(r["revenue"], 4))
        for r in plain.collect()
    }
    assert got == want


def test_bloom_reduction_actually_drops_rows(spark, sf_dir):
    """The pre-filter passes far fewer lineitem rows than the full scan —
    the shuffle-volume claim, measured."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 470000.0)
    hot = o.select("o_orderkey")
    n_hot = hot.count()
    bitmap = build_bloom(hot, "o_orderkey", bloom_bits_for(n_hot))
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    total = li.count()
    kept = bloom_prefilter(li, "l_orderkey", bitmap).count()
    true_match = li.join(hot, li.l_orderkey == hot.o_orderkey, "left_semi").count()
    assert kept >= true_match                      # no false negatives
    assert kept <= true_match + 0.05 * total       # few false positives
    assert kept < 0.6 * total                      # real reduction
