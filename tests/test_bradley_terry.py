"""q330 Bradley-Terry: pure-Python duel synthesis + exact integer MM
recompute from the raw parquet, plus conservation laws."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_globalretail_spark.plans.analytics import (
    QUERIES,
    bradley_terry_strengths,
)


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    rows = sorted(
        zip(
            tbl.column("user_id").to_pylist(),
            tbl.column("ts").to_pylist(),
            tbl.column("event_id").to_pylist(),
            tbl.column("event_type").to_pylist(),
            tbl.column("value").to_pylist(),
        )
    )
    duels = []
    prev = {}
    for uid, ts, eid, et, v in rows:
        if uid in prev:
            _, pid, pt, pv = prev[uid]
            if pt != et:
                if pv > v or (pv == v and pid < eid):
                    duels.append((pt, et))
                else:
                    duels.append((et, pt))
        prev[uid] = (ts, eid, et, v)
    dirs: dict[tuple[str, str], list[int]] = {}
    for wnr, lsr in duels:
        dirs.setdefault((wnr, lsr), [0, 0])
        dirs.setdefault((lsr, wnr), [0, 0])
        dirs[(wnr, lsr)][0] += 1
        dirs[(wnr, lsr)][1] += 1
        dirs[(lsr, wnr)][0] += 1
    flat = [(i, j, n, w) for (i, j), (n, w) in dirs.items()]
    strengths = bradley_terry_strengths(flat)
    census = {}
    for i, _, n, w in flat:
        d, ww = census.get(i, (0, 0))
        census[i] = (d + n, ww + w)
    return strengths, census, len(duels)


def test_q330_matches_pure_python(spark, sf_dir):
    strengths, census, n_duels = _recompute(sf_dir)
    rows = QUERIES["q330_bradley_terry"](spark, sf_dir).collect()
    assert len(rows) == len(strengths)
    order = sorted(strengths, key=lambda i: (-strengths[i], i))
    for r in rows:
        d, w = census[r["item"]]
        assert (r["duels"], r["wins"]) == (d, w)
        assert r["strength_ppm"] == strengths[r["item"]]
        assert r["rank"] == order.index(r["item"]) + 1
    # Conservation: every duel contributes one win and two duel slots.
    assert sum(r["wins"] for r in rows) == n_duels
    assert sum(r["duels"] for r in rows) == 2 * n_duels


def test_mm_fixpoint_on_balanced_duels():
    # Two items trading equal wins must stay at equal strength.
    flat = [("a", "b", 10, 5), ("b", "a", 10, 5)]
    s = bradley_terry_strengths(flat)
    assert s["a"] == s["b"]
    # A shutout loser hits the floor clamp; the winner dominates.
    s2 = bradley_terry_strengths([("a", "b", 10, 10), ("b", "a", 10, 0)])
    assert s2["b"] == 1000
    assert s2["a"] > s2["b"]
