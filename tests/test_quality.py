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


def test_quality_percentile_filter_quartile_cut(spark, sf_dir):
    """q121 keeps exactly ⌈n/4⌉ docs per language, and the kept sum matches
    the top quartile by (lexical diversity desc, doc_id) recomputed
    driver-side."""
    import math

    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.text import (
        QUERIES as TQ,
        tokens,
    )
    from etl_globalretail_spark.sources.readers import load_table

    rows = TQ["q121_quality_percentile_filter"](spark, sf_dir).collect()
    d = load_table(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    feats = d.select(
        "doc_id", "lang",
        (F.size(F.array_distinct(tok)).cast("double") / F.size(tok)).alias("ld"),
    ).collect()
    by_lang: dict = {}
    for r in feats:
        by_lang.setdefault(r.lang, []).append((-r.ld, r.doc_id))
    for out in rows:
        ordered = sorted(by_lang[out.lang])
        n = len(ordered)
        k = math.ceil(n * 0.25)
        assert out.n_docs == n
        assert out.n_kept == k
        assert out.sum_kept_ids == sum(doc for _, doc in ordered[:k])


def test_observe_quality_rides_the_action(spark, sf_dir):
    """Metrics arrive from the SAME action that consumed the frame — no
    second job — and match an independent recount."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.quality import observe_quality
    from etl_globalretail_spark.sources.readers import load_table

    l = load_table(spark, "lineitem", sf_dir)
    observed, obs = observe_quality(
        l, "li", not_null_cols=("l_shipdate",), positive_cols=("l_quantity",)
    )
    n_out = observed.filter(F.col("l_discount") >= 0).count()  # the action
    m = obs.get
    assert m["n_rows"] == l.count() == n_out
    assert m["null_l_shipdate"] == 0
    assert m["nonpos_l_quantity"] == l.filter(F.col("l_quantity") <= 0).count()


def test_fingerprint_partition_invariant_and_sensitive(spark):
    """Identical content under different partitionings digests identically;
    flipping ONE field changes exactly the affected buckets."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.quality import table_fingerprint

    rows = [(i, f"v{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "k long, v string").repartition(3)
    b = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(11)
    rep = F.concat_ws("|", F.col("k").cast("string"), F.col("v"))

    def digest(df):
        return {
            r["bucket"]: (r["n_rows"], r["xor_hash"], r["sum_hash"])
            for r in table_fingerprint(df, rep).collect()
        }

    da, db = digest(a), digest(b)
    assert da == db

    mutated = [(i, f"v{i}" if i != 250 else "CORRUPT") for i in range(500)]
    dm = digest(spark.createDataFrame(mutated, "k long, v string"))
    diff = {bkt for bkt in set(da) | set(dm) if da.get(bkt) != dm.get(bkt)}
    assert 1 <= len(diff) <= 2  # old row's bucket and/or new row's bucket
