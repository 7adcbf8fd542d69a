"""q351 join-cardinality estimation: full driver recompute of the MCV +
uniform-tail estimator and the exact audit, plus the estimator laws —
exact when BOTH sides fit inside the MCV list, and the audit equals the
true join row count."""

from __future__ import annotations

from collections import Counter

from etl_globalretail_spark.plans.analytics import _Q351_MCV
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _estimate(a: Counter, b: Counter):
    def mcv(c: Counter):
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        top = dict(ranked[:_Q351_MCV])
        nt = sum(c.values()) - sum(top.values())
        dt = len(c) - len(top)
        return top, nt, dt

    am, nat, dat = mcv(a)
    bm, nbt, dbt = mcv(b)
    est = (
        sum(n * bm[u] for u, n in am.items() if u in bm)
        + sum(n for u, n in am.items() if u not in bm)
        * (nbt // max(dbt, 1))
        + sum(n for u, n in bm.items() if u not in am)
        * (nat // max(dat, 1))
        + nat * nbt // max(dat, dbt, 1)
    )
    return est


def test_q351_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "user_id").collect()
    )
    a = Counter(
        r["user_id"] for r in rows if r["event_type"] == "click"
    )
    b = Counter(
        r["user_id"] for r in rows if r["event_type"] == "purchase"
    )
    exact = sum(n * b.get(u, 0) for u, n in a.items())
    (got,) = ALL_QUERIES["q351_join_cardinality_estimate"](
        spark, sf_dir
    ).collect()
    assert (got["n_a"], got["d_a"]) == (sum(a.values()), len(a))
    assert (got["n_b"], got["d_b"]) == (sum(b.values()), len(b))
    assert got["exact_join"] == exact
    assert got["est_join"] == _estimate(a, b)
    assert got["err_permil"] == (
        abs(got["est_join"] - exact) * 1000 // max(exact, 1)
    )


def test_q351_estimator_exact_when_mcv_covers():
    a = Counter({1: 5, 2: 3, 3: 1})
    b = Counter({2: 4, 3: 2, 9: 7})
    assert _estimate(a, b) == 3 * 4 + 1 * 2
