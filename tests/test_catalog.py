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
