"""Salting must be invisible in results: salted plans equal unsalted ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    with_salt,
)
from etl_globalretail_spark.sources.readers import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salt_distribution(spark, sf_dir):
    """Hot keys actually spread: lineitem has ~9 (flag,status) keys; after
    salting, each key covers many salt buckets."""
    l = load_table(spark, "lineitem", sf_dir)
    spread = (
        with_salt(l, 16)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("__salt").alias("n_salts"))
        .collect()
    )
    assert all(r.n_salts >= 12 for r in spread)


def test_salted_aggregate_equals_plain(spark, sf_dir):
    l = load_table(spark, "lineitem", sf_dir)
    plain = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"),
        F.min("l_shipdate").alias("first_ship"),
    )
    salted = salted_aggregate(
        l,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "q": (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")),
                F.sum("q").cast("decimal(27,6)"),
            ),
            "first_ship": (F.min("l_shipdate"), F.min("first_ship")),
        },
    )
    cols = ["l_returnflag", "n", "q", "first_ship"]
    assert _rows(plain, cols) == _rows(salted, cols)


def test_salted_inner_join_equals_plain(spark, sf_dir):
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    plain = l.join(o, ["l_orderkey"])
    salted = salted_join(l, o, ["l_orderkey"])
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = ["l_orderkey", "l_quantity", "o_custkey"]
    assert _rows(plain, cols) == _rows(salted, cols)


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    """Left-join shape: unmatched big-side rows survive exactly once."""
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_linenumber")
    # A small side covering only even orderkeys → odd ones are unmatched.
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    )
    plain = l.join(o, ["l_orderkey"], "left")
    salted = salted_join(l, o, ["l_orderkey"], how="left")
    cols = ["l_orderkey", "l_linenumber", "o_custkey"]
    assert _rows(plain, cols) == _rows(salted, cols)
