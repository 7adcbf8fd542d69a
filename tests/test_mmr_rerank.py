"""q355 MMR rerank: full driver recompute (pool, greedy, integer
scores) plus the MMR laws — rank 1 is the pure-relevance argmax with
max_sim 0, every later pick maximized 7·rel − 3·maxsim among the
remaining pool at its step, and selections never repeat."""

from __future__ import annotations

import math

from etl_globalretail_spark.operators.similarity import (
    _Q355_K,
    _Q355_POOL,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q355_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding").collect()
    )
    vecs = {
        r["vec_id"]: [math.floor(float(x) * 1000) for x in r["embedding"]]
        for r in rows
    }
    qid = min(vecs)
    q = vecs.pop(qid)
    rel = {
        vid: sum(a * b for a, b in zip(xq, q)) for vid, xq in vecs.items()
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:_Q355_POOL]
    selected = []
    remaining = set(pool)
    while len(selected) < _Q355_K and remaining:
        best = None
        for vid in sorted(remaining):
            ms = max(
                (
                    sum(a * b for a, b in zip(vecs[vid], vecs[s]))
                    for s, _ in selected
                ),
                default=0,
            )
            score = 7 * rel[vid] - 3 * ms
            if best is None or (-score, vid) < (-best[2], best[0]):
                best = (vid, ms, score)
        selected.append((best[0], best[1]))
        remaining.discard(best[0])
    got = sorted(
        ALL_QUERIES["q355_mmr_rerank"](spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(got) == _Q355_K
    assert len({r["vec_id"] for r in got}) == _Q355_K
    assert got[0]["max_sim_dot"] == 0
    for i, r in enumerate(got):
        vid, ms = selected[i]
        assert r["vec_id"] == vid
        assert r["max_sim_dot"] == ms
        assert r["rel_dot"] == rel[vid]
        assert r["score10"] == 7 * rel[vid] - 3 * ms
