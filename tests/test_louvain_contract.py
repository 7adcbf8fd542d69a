"""q319 Louvain phase 2: pure-Python recompute of the contraction +
swap-guarded singleton local-move round from the memoized l4 labels and
the edge artifact, plus the Q-monotonicity and q314-composition laws
(VERDICT r7 item 6)."""

from __future__ import annotations

from etl_globalretail_spark.plans.analytics import (
    co_purchase_edges,
    louvain_moved_labels,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES


def _python_phase2(edges, l4):
    """Contract → singleton gains → best (gain desc, c asc) → swap
    guard (mutual positive pair: only the larger id moves) → flat Q."""
    lab = {r["v"]: r["label"] for r in l4}
    m = len(edges)
    ce: dict[tuple[int, int], int] = {}
    ck: dict[int, int] = {}
    for u, v in edges:
        cu, cv = lab[u], lab[v]
        ck[cu] = ck.get(cu, 0) + 1
        ck[cv] = ck.get(cv, 0) + 1
        if cu != cv:
            key = (min(cu, cv), max(cu, cv))
            ce[key] = ce.get(key, 0) + 1
    best: dict[int, tuple[int, int]] = {}
    for (c1, c2), w in ce.items():
        for v, c in ((c1, c2), (c2, c1)):
            gain = 2 * m * w - ck[v] * ck[c]
            cur = best.get(v)
            if cur is None or (gain, -c) > (cur[0], -cur[1]):
                best[v] = (gain, c)
    l5 = {}
    merged = 0
    for cid in ck:
        b = best.get(cid)
        move = b is not None and b[0] > 0
        if move:
            bc = best.get(b[1])
            if bc is not None and bc[1] == cid and bc[0] > 0 \
                    and cid < b[1]:
                move = False  # mutual pair: only the larger id moves
        l5[cid] = b[1] if move else cid
        merged += 1 if move else 0
    flat = {v: l5[c] for v, c in lab.items()}

    def qm(assign):
        ec: dict[int, int] = {}
        dc: dict[int, int] = {}
        for u, v in edges:
            dc[assign[u]] = dc.get(assign[u], 0) + 1
            dc[assign[v]] = dc.get(assign[v], 0) + 1
            if assign[u] == assign[v]:
                ec[assign[u]] = ec.get(assign[u], 0) + 1
        num = sum(4 * m * ec.get(c, 0) - d * d for c, d in dc.items())
        return len(dc), num * 1000000 // (4 * m * m)

    ncb, qb = qm(lab)
    nca, qa = qm(flat)
    return {
        "n_super_vertices": len(ck),
        "n_super_edges": len(ce),
        "n_merged_supers": merged,
        "n_comm_before": ncb,
        "n_comm_after": nca,
        "q_before_millionths": qb,
        "q_after_millionths": qa,
    }


def test_q319_matches_python_phase2(spark, sf_dir):
    edges = [
        (r["u"], r["v"])
        for r in co_purchase_edges(spark, sf_dir).collect()
    ]
    l4 = louvain_moved_labels(spark, sf_dir).collect()
    want = _python_phase2(edges, l4)
    got = ALL_QUERIES["q319_louvain_contract"](
        spark, sf_dir
    ).collect()[0].asDict()
    assert got == want


def test_q319_q_monotone_and_composes_q314(spark, sf_dir):
    """One full outer Louvain iteration must not decrease modularity,
    and its 'before' audit is exactly q314's 'after' (the contraction
    starts from the phase-1 result)."""
    r14 = ALL_QUERIES["q314_louvain_move"](spark, sf_dir).collect()[0]
    r19 = ALL_QUERIES["q319_louvain_contract"](spark, sf_dir).collect()[0]
    assert r19["q_before_millionths"] == r14["q_after_millionths"]
    assert r19["n_comm_before"] == r14["n_comm_after"]
    assert r19["q_after_millionths"] >= r19["q_before_millionths"]
    assert r19["n_comm_after"] <= r19["n_comm_before"]
    # singleton init: every phase-1 community is a super-vertex
    assert r19["n_super_vertices"] == r19["n_comm_before"]
