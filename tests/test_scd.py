"""SCD lifecycle tests: multi-batch Type 2 versioning, point-in-time
snapshots, and the Type 1 file-level merge."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.scd import (
    merge_upsert,
    scd2_apply,
    scd2_snapshot,
    upsert_frame,
)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "id long, city string, valid_from date, valid_to date"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "id long, city string")


def test_scd2_two_batches_and_snapshots(spark):
    d = datetime.date
    cur = _dim(spark, [(1, "porto", d(1995, 1, 1), None),
                       (2, "lisboa", d(1995, 1, 1), None)])

    # batch 1: key 1 moves, key 2 no-op update, key 3 appears
    v2 = scd2_apply(
        cur,
        _upd(spark, [(1, "braga"), (2, "lisboa"), (3, "faro")]),
        "id", ["city"], "1996-06-01",
    )
    rows = {(r.id, r.valid_from, r.valid_to): r.city for r in v2.collect()}
    assert rows == {
        (1, d(1995, 1, 1), d(1996, 6, 1)): "porto",   # closed
        (1, d(1996, 6, 1), None): "braga",            # new version
        (2, d(1995, 1, 1), None): "lisboa",           # untouched (no-op)
        (3, d(1996, 6, 1), None): "faro",             # first version
    }

    # batch 2: key 1 moves again — closed history must pass through intact
    v3 = scd2_apply(
        v2, _upd(spark, [(1, "evora")]), "id", ["city"], "1997-01-01"
    )
    assert v3.count() == 5
    open_rows = {r.id: r.city for r in v3.filter("valid_to IS NULL").collect()}
    assert open_rows == {1: "evora", 2: "lisboa", 3: "faro"}

    # point-in-time: each key resolves to exactly its version at that date
    snap96 = {r.id: r.city for r in scd2_snapshot(v3, "1996-08-01").collect()}
    assert snap96 == {1: "braga", 2: "lisboa", 3: "faro"}
    snap95 = {r.id: r.city for r in scd2_snapshot(v3, "1995-06-01").collect()}
    assert snap95 == {1: "porto", 2: "lisboa"}
    # boundary: valid_from inclusive, valid_to exclusive
    snap_eff = {r.id: r.city for r in scd2_snapshot(v3, "1996-06-01").collect()}
    assert snap_eff[1] == "braga"


def test_scd2_null_attr_transitions_are_changes(spark):
    d = datetime.date
    cur = _dim(spark, [(1, None, d(1995, 1, 1), None),
                       (2, "lisboa", d(1995, 1, 1), None)])
    out = scd2_apply(
        cur, _upd(spark, [(1, "porto"), (2, None)]), "id", ["city"],
        "1996-01-01",
    )
    # NULL→value and value→NULL both versioned (eqNullSafe comparison)
    assert out.filter("valid_to IS NOT NULL").count() == 2
    assert out.count() == 4


def test_merge_upsert_file_level(spark, tmp_path):
    p = str(tmp_path / "dim_sink")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    merge_upsert(spark, base, p, ["id"])
    delta = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    merge_upsert(spark, delta, p, ["id"])
    got = {r.id: r.v for r in spark.read.parquet(p).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # replay is idempotent
    merge_upsert(spark, delta, p, ["id"])
    assert {r.id: r.v for r in spark.read.parquet(p).collect()} == got


def test_upsert_frame_dedupes_delta(spark):
    cur = spark.createDataFrame([(1, "a")], "id long, v string")
    delta = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
    out = upsert_frame(cur, delta, ["id"])
    assert out.count() == 1  # one winner per key, not a dup explosion


def test_snapshot_diff_classes(spark):
    from etl_globalretail_spark.plans.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "d")], "id long, v string"
    )
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    assert got == {1: "deleted", 2: "changed", 4: "inserted"}  # 3 unchanged


def test_incremental_join_refresh_equals_recompute(spark, sf_dir):
    """Delta-rule refresh must equal the from-scratch join under any
    base/delta partition of the inputs — including deltas that join rows
    already in the base (the cross terms)."""
    from etl_globalretail_spark.plans.scd import incremental_join_refresh
    from etl_globalretail_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    l = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_linenumber")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    out_cols = ["o_orderkey", "o_orderdate", "l_linenumber"]
    # split on unrelated keys so cross-batch matches are guaranteed
    a_old, delta_a = o.filter("o_orderkey % 3 != 0"), o.filter("o_orderkey % 3 = 0")
    b_old, delta_b = l.filter("l_linenumber % 2 = 0"), l.filter("l_linenumber % 2 = 1")
    view_old = a_old.join(b_old, ["o_orderkey"]).select(*out_cols)
    refreshed = incremental_join_refresh(
        view_old, a_old, b_old, delta_a, delta_b, ["o_orderkey"], out_cols
    )
    full = o.join(l, ["o_orderkey"]).select(*out_cols)
    sig = lambda df: sorted(map(tuple, df.collect()))
    assert sig(refreshed) == sig(full)


def test_q304_pit_join_is_exactly_one_version_per_order(spark, sf_dir):
    """PIT correctness laws: the validity intervals tile, so every order
    matches exactly ONE version (totals reconcile with the raw orders
    count and revenue), and the is_current=false rows are precisely the
    pre-boundary orders of CHANGED keys — the leakage a naive
    current-version join would mislabel."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.plans.scd import _EFFECTIVE, QUERIES
    from etl_globalretail_spark.sources.readers import load_table

    rows = QUERIES["q304_pit_feature_join"](spark, sf_dir).collect()
    o = load_table(spark, "orders", sf_dir)
    assert sum(r["n_orders"] for r in rows) == o.count()
    want_cents = o.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r["revenue_cents"] for r in rows) == want_cents
    stale = [r for r in rows if not r["is_current_version"]]
    assert stale, "fixture must exercise closed versions"
    # closed versions exist only for keys the SCD batch CHANGED
    # (c_custkey % 3 == 0, +100 balance), and only before the boundary
    changed_pre = o.filter(
        (F.col("o_custkey") % 3 == 0)
        & (F.to_date("o_orderdate") < F.lit(_EFFECTIVE))
    ).count()
    assert sum(r["n_orders"] for r in stale) == changed_pre
    import datetime

    eff_day = (
        datetime.date.fromisoformat(_EFFECTIVE) - datetime.date(1970, 1, 1)
    ).days
    for r in stale:
        assert r["last_day"] < eff_day  # closed versions end at the boundary
