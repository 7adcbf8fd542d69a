"""q317 unigram trained decode: pure-Python recompute of the full
learn→apply chain (two EM rounds → trained costs → Viterbi min-cost +
path-count DP per distinct word), plus the composition law tying q317
to q307's published cost2 column."""

from __future__ import annotations

import test_unigram_em as em

from etl_globalretail_spark.operators.corpus import (
    _Q301_FREQ_NUM,
    _Q301_HUGE,
    _Q301_PENALTY,
    QUERIES,
)


def _trained_costs(sf_dir: str):
    """Round-2 EM costs recomputed in pure Python (the q307 recompute's
    cost2, keyed by piece length)."""
    model = em._recompute(sf_dir)
    c1 = {p: v[4] for p, v in model.items() if len(p) == 1}
    c2 = {p: v[4] for p, v in model.items() if len(p) == 2}
    return c1, c2


def _viterbi(w: str, c1: dict, c2: dict):
    best_prev, paths_prev = None, 0
    best, paths = 0, 1
    for i in range(1, len(w) + 1):
        cand1 = best + c1[w[i - 1]]
        cand2 = best_prev + c2[w[i - 2:i]] if i >= 2 else _Q301_HUGE
        nb = min(cand1, cand2)
        np_ = (paths if cand1 == nb else 0) + (
            paths_prev if cand2 == nb else 0
        )
        best_prev, paths_prev = best, paths
        best, paths = nb, np_
    return best, paths


def test_q317_matches_python_trained_viterbi(spark, sf_dir):
    c1, c2 = _trained_costs(sf_dir)
    want = {
        w: (len(w), *_viterbi(w, c1, c2)) for w in em._words(sf_dir)
    }
    got = {
        r["word"]: (r["len"], r["min_cost"], r["n_best_paths"])
        for r in QUERIES["q317_unigram_trained_viterbi"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_q317_decodes_under_q307_published_costs(spark, sf_dir):
    """Composition law: q317's min_cost for each word equals a Viterbi
    run under EXACTLY the cost2 column q307 publishes — the artifact
    handoff is the whole point of the learn→apply composition."""
    pub = QUERIES["q307_unigram_em_train"](spark, sf_dir).collect()
    c1 = {r["piece"]: r["cost2"] for r in pub if r["piece_len"] == 1}
    c2 = {r["piece"]: r["cost2"] for r in pub if r["piece_len"] == 2}
    rows = QUERIES["q317_unigram_trained_viterbi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        best, paths = _viterbi(r["word"], c1, c2)
        assert (r["min_cost"], r["n_best_paths"]) == (best, paths), r["word"]
    # trained costs stay in the documented int64-safe band
    assert all(
        _Q301_PENALTY <= c <= _Q301_PENALTY + _Q301_FREQ_NUM // 1
        for c in list(c1.values()) + list(c2.values())
    )
