"""q347 RA link prediction: full driver recompute (degrees, common
neighbors, integer RA scores, anti-join of existing edges, total-order
top-20) plus the defining laws — predicted pairs are never edges, and
every predicted pair shares >= 1 common neighbor."""

from __future__ import annotations

from collections import defaultdict

from etl_globalretail_spark.plans.analytics import co_purchase_edges
from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q347_matches_driver_recompute(spark, sf_dir):
    edges = {
        (r["u"], r["v"])
        for r in co_purchase_edges(spark, sf_dir).collect()
    }
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    deg = {w: len(xs) for w, xs in nbrs.items()}
    scores: dict[tuple, list] = {}
    for w, xs in nbrs.items():
        xs_sorted = sorted(xs)
        for i, a in enumerate(xs_sorted):
            for b in xs_sorted[i + 1:]:
                if (a, b) in edges:
                    continue
                s = scores.setdefault((a, b), [0, 0])
                s[0] += 10**9 // deg[w]
                s[1] += 1
    ranked = sorted(
        ((v[0], a, b, v[1]) for (a, b), v in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = ALL_QUERIES["q347_link_prediction_ra"](spark, sf_dir).collect()
    assert len(got) == 20
    for r in sorted(got, key=lambda r: r["rnk"]):
        s, a, b, nc = ranked[r["rnk"] - 1]
        assert (r["part_a"], r["part_b"]) == (a, b)
        assert r["ra_ppb"] == s
        assert r["n_common"] == nc
        assert (a, b) not in edges
        assert nc >= 1
