"""q318 multi-probe hard negatives: the recall-recovery composition of
q311 (single-bucket LSH mining) and q315 (Hamming-1 probe set).
Properties beyond the DuckDB hash gate — candidate-superset dominance
over q311, recall vs the exact tier q293 that can only rise, and the
shuffle-equi-join plan shape."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def _by_anchor(rows):
    got = {}
    for r in rows:
        got.setdefault(int(r["anchor_id"]), []).append(
            (r["rank"], r["cos_sim"], int(r["neg_id"]))
        )
    for a in got:
        got[a].sort()
    return got


def test_q318_dominates_q311_pointwise(spark, sf_dir):
    """q318's candidate set is a strict superset of q311's (mask 0 IS
    the q311 join), so per (anchor, rank) the multi-probe cosine is >=
    the single-bucket cosine, and every q311 anchor still appears."""
    single = _by_anchor(
        ALL_QUERIES["q311_hard_negatives_lsh"](spark, sf_dir).collect()
    )
    multi = _by_anchor(
        ALL_QUERIES["q318_hard_negatives_multiprobe"](
            spark, sf_dir
        ).collect()
    )
    assert set(single) <= set(multi)
    for a, srows in single.items():
        mrows = multi[a]
        assert len(mrows) >= len(srows), a
        for (rk, scos, _), (mrk, mcos, _) in zip(srows, mrows):
            assert rk == mrk
            assert mcos >= scos, (a, rk)


def test_q318_recall_ge_q311(spark, sf_dir):
    """Recall vs the exact tier q293 can only rise under a candidate
    superset (VERDICT r7 item 5's done-condition)."""
    exact = {
        (r["anchor_id"], r["neg_id"])
        for r in ALL_QUERIES["q293_hard_negatives"](spark, sf_dir).collect()
    }
    single = {
        (r["anchor_id"], r["neg_id"])
        for r in ALL_QUERIES["q311_hard_negatives_lsh"](
            spark, sf_dir
        ).collect()
    }
    multi_rows = ALL_QUERIES["q318_hard_negatives_multiprobe"](
        spark, sf_dir
    ).collect()
    multi = {(r["anchor_id"], r["neg_id"]) for r in multi_rows}
    recall_single = len(exact & single) / len(exact)
    recall_multi = len(exact & multi) / len(exact)
    assert recall_multi >= recall_single, (recall_multi, recall_single)
    # probing must actually contribute: some picked negative was reached
    # only through a Hamming-1 bucket
    assert any(r["probe_hamming"] == 1 for r in multi_rows)
    assert all(r["probe_hamming"] in (0, 1) for r in multi_rows)


def test_q318_plan_shape(spark, sf_dir):
    plan = ALL_QUERIES["q318_hard_negatives_multiprobe"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # the persisted base feeds BOTH sides of the probed bucket equi-join
    assert plan.count("InMemoryTableScan") >= 2
