"""q343 grid-density clustering: full driver recompute (JL projection,
adaptive minPts, 8-neighborhood union-find, majority labels) plus the
DBSCAN invariants — clustered + noise partitions the corpus, every
cluster holds >= minPts points, top label is the in-cluster majority."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from etl_globalretail_spark.operators.clustering import (
    _Q343_CELL,
    _Q343_D,
    _Q343_KEY,
    _Q343_OFF,
    _q343_sign,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q343_sign_matches_q332_matrix():
    from etl_globalretail_spark.operators.similarity import _jl_sign

    assert all(
        _q343_sign(j, k) == _jl_sign(j, k)
        for j in range(2) for k in range(_Q343_D)
    )


def test_q343_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "embeddings", sf_dir)
        .select("embedding", "label").collect()
    )
    s = {j: [_q343_sign(j, k) for k in range(_Q343_D)] for j in (0, 1)}
    pts = []
    for r in rows:
        xq = [math.floor(float(x) * 1000) for x in r["embedding"]]
        p0 = sum(a * b for a, b in zip(s[0], xq))
        p1 = sum(a * b for a, b in zip(s[1], xq))
        pts.append(
            ((p0 + _Q343_OFF) // _Q343_CELL,
             (p1 + _Q343_OFF) // _Q343_CELL, r["label"])
        )
    minpts = max(3, len(pts) // 160)
    cells = Counter((cx, cy) for cx, cy, _ in pts)
    dense = {c for c, n in cells.items() if n >= minpts}
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    # component id = min ckey in the component (the hash-min fixpoint)
    comp_of: dict[tuple, int] = {}
    min_key: dict[tuple, int] = {}
    for c in dense:
        r = find(c)
        k = c[0] * _Q343_KEY + c[1]
        min_key[r] = min(min_key.get(r, k), k)
    for c in dense:
        comp_of[c] = min_key[find(c)]
    by_comp: dict[int, Counter] = {}
    noise_pts = 0
    for cx, cy, lab in pts:
        if (cx, cy) in dense:
            by_comp.setdefault(comp_of[(cx, cy)], Counter())[lab] += 1
        else:
            noise_pts += 1
    want = {}
    for comp, labs in by_comp.items():
        top_n = max(labs.values())
        top = min(l for l, n in labs.items() if n == top_n)
        n_cells = sum(1 for c in dense if comp_of[c] == comp)
        want[comp] = (sum(labs.values()), n_cells, top, top_n)

    got = {
        r["component"]: r
        for r in ALL_QUERIES["q343_grid_density_clusters"](
            spark, sf_dir
        ).collect()
    }
    noise = got.pop(-1)
    assert noise["n_points"] == noise_pts
    assert noise["n_cells"] == len(cells) - len(dense)
    assert set(got) == set(want)
    for comp, (n_pts, n_cells, top, top_n) in want.items():
        r = got[comp]
        assert (r["n_points"], r["n_cells"]) == (n_pts, n_cells)
        assert (r["top_label"], r["top_label_n"]) == (top, top_n)
        assert n_pts >= minpts
    assert sum(v[0] for v in want.values()) + noise_pts == len(pts)
