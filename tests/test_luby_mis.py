"""q339 Luby MIS: pure-Python recompute of the derandomized rounds over
the recomputed fuzzy pair graph, plus independence/maximality laws."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.operators.dedup import _Q339_ROUNDS, QUERIES
from tests.test_mutual_matching import _pairs


def _prio(node: int) -> int:
    return int(
        hashlib.md5(str(node).encode()).hexdigest()[:15], 16
    )


def _rounds(pairs):
    edges = [(a, b) for a, b, _ in pairs]
    nodes = {n for e in edges for n in e}
    result = {}
    for r in range(1, _Q339_ROUNDS + 1):
        nbrs: dict[int, list] = {n: [] for n in nodes}
        for a, b in edges:
            nbrs[a].append(b)
            nbrs[b].append(a)
        mis = {
            n
            for n in nodes
            if not nbrs[n]
            or (_prio(n), n) < min((_prio(m), m) for m in nbrs[n])
        }
        result[r] = mis
        dead = set(mis)
        for n in mis:
            dead.update(nbrs[n])
        nodes = nodes - dead
        edges = [
            (a, b) for a, b in edges if a not in dead and b not in dead
        ]
    return result


def test_q339_matches_pure_python(spark, sf_dir):
    expected = _rounds(_pairs(sf_dir))
    rows = QUERIES["q339_luby_mis"](spark, sf_dir).collect()
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["round"], set()).add(r["node"])
    for r in range(1, _Q339_ROUNDS + 1):
        assert got.get(r, set()) == expected[r]


def test_q339_independence_and_coverage(spark, sf_dir):
    pairs = _pairs(sf_dir)
    adj = {}
    for a, b, _ in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    mis = {
        r["node"]
        for r in QUERIES["q339_luby_mis"](spark, sf_dir).collect()
    }
    assert mis
    # Independence: no edge inside the elected set.
    for a, b, _ in pairs:
        assert not (a in mis and b in mis)
    # Progress: after the unrolled rounds, a large majority of nodes is
    # decided (in the MIS or adjacent to it) — Luby terminates in
    # O(log n) rounds w.h.p.; 3 rounds must decide most of this graph.
    decided = set(mis)
    for n in mis:
        decided.update(adj[n])
    assert len(decided) >= 0.8 * len(adj)
