"""Catalog layer: DDL runner, dialect rewrite, bootstrap, SQL front door."""

from __future__ import annotations

import pytest

from etl_globalretail_spark.sources.catalog import (
    bootstrap_database,
    register_views,
    rewrite_dialect,
    run_sql_script,
    split_statements,
)


def test_rewrite_dialect_strips_mysqlisms():
    s = "SET FOREIGN_KEY_CHECKS=0;\nINSERT INTO t VALUE (1, 'a;b');\n"
    out = rewrite_dialect(s)
    assert "FOREIGN_KEY_CHECKS" not in out
    assert "VALUES (1, 'a;b')" in out


def test_split_statements_quote_aware():
    stmts = split_statements(
        "CREATE TABLE x (s STRING); -- comment\n"
        "INSERT INTO x VALUES ('semi;colon'); SELECT 1"
    )
    assert len(stmts) == 3
    assert "semi;colon" in stmts[1]


def test_run_sql_script_log_and_continue(spark):
    res = run_sql_script(
        spark,
        """
        CREATE OR REPLACE TEMP VIEW _cat_t AS SELECT 1 AS a;
        SELECT definitely_not_a_function(1);
        SELECT a FROM _cat_t;
        """,
    )
    assert res["ok"] == 2
    assert len(res["failed"]) == 1
    with pytest.raises(Exception):
        run_sql_script(spark, "SELECT nope()", stop_on_error=True)


def test_bootstrap_database_and_table_roundtrip(spark, tmp_path):
    bootstrap_database(spark, "dw_test", location=f"file://{tmp_path}/dw")
    res = run_sql_script(
        spark,
        """
        CREATE TABLE dw_test.dim_smoke (sk BIGINT, nome STRING) USING parquet;
        INSERT INTO dw_test.dim_smoke VALUES (1, 'a'), (2, 'b');
        """,
        stop_on_error=True,
    )
    assert res["ok"] == 2
    assert spark.table("dw_test.dim_smoke").count() == 2
    bootstrap_database(spark, "dw_test")  # drop CASCADE + recreate
    assert not spark.catalog.tableExists("dw_test.dim_smoke")
    spark.sql("DROP DATABASE IF EXISTS dw_test CASCADE")


def test_register_views_sql_front_door(spark, sf_dir):
    register_views(spark, sf_dir, names=("region", "nation"))
    got = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM region "
        "JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name"
    ).count()
    assert got == 5


def test_append_new_keys_incremental_idempotent(spark, sf_dir, tmp_path):
    """Incremental ON CONFLICT DO NOTHING: overlapping batches append only
    novel keys; replaying a batch is a no-op; keys stay unique."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.sources.readers import append_new_keys, load_table

    sink = str(tmp_path / "cust_sink")
    c = load_table(spark, "customer", sf_dir)
    first = c.filter(F.col("c_custkey") <= 100)
    second = c.filter((F.col("c_custkey") >= 50) & (F.col("c_custkey") <= 150))

    n1 = append_new_keys(first, sink, ["c_custkey"])
    assert n1 == first.count()
    n2 = append_new_keys(second, sink, ["c_custkey"])
    assert n2 == second.filter(F.col("c_custkey") > 100).count()
    n3 = append_new_keys(second, sink, ["c_custkey"])  # replay
    assert n3 == 0

    out = spark.read.parquet(sink)
    assert out.count() == out.select("c_custkey").distinct().count()
    assert out.count() == c.filter(F.col("c_custkey") <= 150).count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key sort-merge-join with ZERO
    exchanges: the write-time shuffle is the only one ever paid (PLANS.md
    star-join section's bucketing claim, exercised)."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.sources.catalog import bootstrap_database
    from etl_globalretail_spark.sources.readers import load_table, write_bucketed

    bootstrap_database(spark, "bkt_test", location=f"file://{tmp_path}/bkt")
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    write_bucketed(l, "bkt_test.lineitem_b", 8, ["l_orderkey"], ["l_orderkey"])
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bkt_test.orders_b", 8, ["l_orderkey"], ["l_orderkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the assertion is about bucketing,
        # not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("bkt_test.lineitem_b")
            .join(spark.table("bkt_test.orders_b"), "l_orderkey")
            .groupBy("o_custkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        n = joined.count()
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the ONLY exchange allowed is the final groupBy's — the join itself
        # must read co-located buckets. o_custkey is not the bucket key, so
        # isolate: the join-only plan must be exchange-free.
        join_only = spark.table("bkt_test.lineitem_b").join(
            spark.table("bkt_test.orders_b"), "l_orderkey"
        )
        join_only.write.format("noop").mode("overwrite").save()
        jp = join_only._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in jp
        assert "Exchange" not in jp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bkt_test CASCADE")
