"""DQ expectation checks catch injected violations of every kind."""

from __future__ import annotations

from etl_globalretail_spark.operators.quality import (
    check_fk,
    check_not_null,
    check_range,
    check_unique,
    dq_report,
)


def test_checks_catch_injected_violations(spark):
    child = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, -1.0), (2, 99, 3.0), (3, None, None)],
        "id long, ref long, v double",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")

    report = {
        r.check_name: (r.n_rows, r.n_violations)
        for r in dq_report(
            [
                check_unique(child, ["id"]),
                check_not_null(child, ["ref"]),
                check_range(child, "v", 0.0, 10.0),
                check_fk(child, "ref", parent, "pid"),
            ]
        ).collect()
    }
    assert report["unique(id)"] == (4, 1)        # id=1 twice → 1 surplus
    assert report["not_null(ref)"] == (4, 1)     # one null ref
    assert report["range(v)"] == (4, 1)          # -1.0 out; NULL passes
    assert report["fk(ref)"] == (4, 1)           # ref=99 orphan; NULL skipped


def test_clean_data_reports_zero(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    rows = dq_report(
        [check_unique(df, ["id"]), check_range(df, "v", 0.0, 5.0)]
    ).collect()
    assert all(r.n_violations == 0 for r in rows)


def test_redact_pii_replaces_all_matches(spark):
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.quality import redact_pii

    df = spark.createDataFrame(
        [
            ("mail a@b.co and c.d+x@e-f.org, call 555-123-4567",),
            ("clean text with no pii at all",),
        ],
        "t string",
    )
    out = [r.o for r in df.select(redact_pii(F.col("t")).alias("o")).collect()]
    assert out[0] == "mail [EMAIL] and [EMAIL], call [PHONE]"
    assert out[1] == "clean text with no pii at all"
