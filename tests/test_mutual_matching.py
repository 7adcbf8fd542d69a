"""q338 mutual-best matching: pure-Python round recompute over the
recomputed fuzzy pair graph, plus matching-validity laws."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.dedup import _Q338_ROUNDS, QUERIES


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _pairs(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    )
    rows = sorted(
        zip(
            tbl.column("c_custkey").to_pylist(),
            tbl.column("c_name").to_pylist(),
            tbl.column("c_nationkey").to_pylist(),
        )
    )
    blocks: dict[tuple, list] = {}
    for ck, nm, nk in rows:
        blocks.setdefault((nk, len(nm)), []).append((ck, nm))
    out = []
    for members in blocks.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, na), (ib, nb) = members[i], members[j]
                d = _levenshtein(na, nb)
                if d <= 2:
                    out.append((ia, ib, d))
    return out


def _rounds(pairs):
    alive = list(pairs)
    result = {}
    for r in range(1, _Q338_ROUNDS + 1):
        best = {}
        for ia, ib, d in alive:
            for node, partner in ((ia, ib), (ib, ia)):
                cur = best.get(node)
                if cur is None or (d, partner) < cur:
                    best[node] = (d, partner)
        mutual = [
            (ia, ib, d)
            for ia, ib, d in alive
            if best[ia][1] == ib and best[ib][1] == ia
        ]
        result[r] = set(mutual)
        matched = {n for ia, ib, _ in mutual for n in (ia, ib)}
        alive = [
            p for p in alive if p[0] not in matched and p[1] not in matched
        ]
    return result


def test_q338_matches_pure_python(spark, sf_dir):
    expected = _rounds(_pairs(sf_dir))
    rows = QUERIES["q338_mutual_best_matching"](spark, sf_dir).collect()
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["round"], set()).add(
            (r["id_a"], r["id_b"], r["distance"])
        )
    for r in range(1, _Q338_ROUNDS + 1):
        assert got.get(r, set()) == expected[r]


def test_q338_is_a_matching(spark, sf_dir):
    rows = QUERIES["q338_mutual_best_matching"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        # One-to-one: a node is matched in at most one round/pair.
        assert r["id_a"] not in seen and r["id_b"] not in seen
        seen.add(r["id_a"])
        seen.add(r["id_b"])
        assert r["distance"] <= 2
