"""q363 harmonic centrality: full driver recompute (seed choice,
per-seed BFS to radius 6, integer harmonic sums, total-order top-20)
plus the estimator laws — seeds themselves score high only through
OTHER seeds (d >= 1), scores are monotone in reach count upper bound."""

from __future__ import annotations

import hashlib
from collections import deque

from etl_globalretail_spark.plans.analytics import (
    _Q363_K,
    _Q363_ROUNDS,
    co_purchase_edges,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q363_matches_driver_recompute(spark, sf_dir):
    edges = [
        (r["u"], r["v"])
        for r in co_purchase_edges(spark, sf_dir).collect()
    ]
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = sorted(adj)
    seeds = sorted(
        verts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:_Q363_K]
    score: dict[int, int] = dict.fromkeys(verts, 0)
    reach: dict[int, int] = dict.fromkeys(verts, 0)
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] >= _Q363_ROUNDS:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, d in dist.items():
            if 1 <= d <= _Q363_ROUNDS:
                score[v] += 10**6 // d
                reach[v] += 1
    want = sorted(
        ((score[v], v) for v in verts), key=lambda t: (-t[0], t[1])
    )[:20]
    got = sorted(
        ALL_QUERIES["q363_harmonic_centrality"](spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(got) == 20
    for i, r in enumerate(got):
        s, v = want[i]
        assert (r["part"], r["harmonic_score"]) == (v, s)
        assert r["n_reached"] == reach[v]
        assert r["n_reached"] <= _Q363_K
