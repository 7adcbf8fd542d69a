"""Plan-introspection API (plans/introspect.py) against known plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.introspect import (
    assert_map_only,
    assert_scan_width,
    codegen_span_count,
    exchange_count,
    scan_report,
)
from etl_globalretail_spark.sources.readers import load_table


def test_scan_report_sees_pushdown_and_pruning(spark, sf_dir):
    """q119's contract, through the API: all three predicates pushed, two
    payload columns read."""
    li = load_table(spark, "lineitem", sf_dir)
    df = li.filter(
        (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).select(
        F.sum((F.col("l_extendedprice") * F.col("l_discount"))
              .cast("decimal(27,6)")).alias("rev")
    )
    reps = scan_report(df)
    assert len(reps) == 1
    rep = reps[0]
    assert any("l_discount" in f for f in rep["pushed_filters"])
    assert any("l_quantity" in f for f in rep["pushed_filters"])
    assert set(rep["read_columns"]) <= {
        "l_quantity", "l_extendedprice", "l_discount"
    }
    assert_scan_width(df, 3)
    with pytest.raises(AssertionError):
        assert_scan_width(df, 2)


def test_map_only_assertion(spark, sf_dir):
    """A pure filter/project is map-only; a groupBy is not."""
    li = load_table(spark, "lineitem", sf_dir)
    assert_map_only(li.filter("l_quantity > 10").select("l_orderkey"))
    agg = li.groupBy("l_returnflag").count()
    assert exchange_count(agg) >= 1
    with pytest.raises(AssertionError):
        assert_map_only(agg)


def test_codegen_spans_positive(spark, sf_dir):
    df = load_table(spark, "orders", sf_dir).groupBy("o_orderpriority").count()
    assert codegen_span_count(df) >= 1
