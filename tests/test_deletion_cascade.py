"""q353 deletion cascade: full driver recompute of the erasure cohort
and its FK propagation, plus the compliance laws — zero orphans, counts
reconcile per table, and the cohort is non-trivial at gate SFs."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q353_matches_driver_recompute(spark, sf_dir):
    c = load_table(spark, "customer", sf_dir).select("c_custkey").collect()
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey"
    ).collect()
    del_c = {
        r["c_custkey"] for r in c
        if int(
            hashlib.md5(f"{r['c_custkey']}-erase".encode()).hexdigest()[:15],
            16,
        ) % 50 == 0
    }
    del_o = {r["o_orderkey"] for r in o if r["o_custkey"] in del_c}
    n_del_l = sum(1 for r in li if r["l_orderkey"] in del_o)
    got = {
        r["tbl"]: r
        for r in ALL_QUERIES["q353_deletion_cascade"](
            spark, sf_dir
        ).collect()
    }
    want = {
        "customer": (len(c), len(del_c)),
        "orders": (len(o), len(del_o)),
        "lineitem": (len(li), n_del_l),
    }
    assert set(got) == set(want)
    for tbl, (before, erased) in want.items():
        r = got[tbl]
        assert (r["before_rows"], r["erased_rows"]) == (before, erased)
        assert r["after_rows"] == before - erased
        assert r["orphans_after"] == 0
    assert len(del_c) > 0, "erasure cohort must be non-trivial"
