"""q322 unigram vocabulary pruning: pure-Python recompute of the full
train → prune → decode chain, plus the prune laws (pruned optimum can
only rise vs q317's trained decode; chars never pruned so every word
stays segmentable)."""

from __future__ import annotations

import test_unigram_em as em
import test_unigram_trained_viterbi as tv

from etl_globalretail_spark.operators.corpus import _Q301_HUGE, QUERIES


def _pruned_costs(sf_dir: str):
    c1, c2 = tv._trained_costs(sf_dir)
    model = em._recompute(sf_dir)  # piece -> (len, f0, u1, u2, cost2)
    bigs = [(p, v[4], v[3]) for p, v in model.items() if len(p) == 2]
    ranked = sorted(
        ((u2 * (c1[p[0]] + c1[p[1]] - c), p) for p, c, u2 in bigs),
        key=lambda t: (-t[0], t[1]),
    )
    k = max(4, (len(bigs) + 1) // 2)
    keep = {p for _, p in ranked[:k]}
    c2p = {p: (c if p in keep else _Q301_HUGE) for p, c, _ in bigs}
    return c1, c2p, keep, len(bigs)


def test_q322_matches_python_prune_recompute(spark, sf_dir):
    c1, c2p, _keep, _nb = _pruned_costs(sf_dir)
    want = {
        w: (len(w), *tv._viterbi(w, c1, c2p)) for w in em._words(sf_dir)
    }
    got = {
        r["word"]: (r["len"], r["min_cost"], r["n_best_paths"])
        for r in QUERIES["q322_unigram_vocab_prune"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_q322_prune_laws(spark, sf_dir):
    """Removing pieces can only raise the optimal segmentation cost
    (pointwise vs q317), the prune keeps exactly max(4, ceil(nb/2))
    bigrams, and every word stays segmentable (chars never pruned, so
    min_cost stays far below the removed-piece sentinel)."""
    _c1, _c2p, keep, nb = _pruned_costs(sf_dir)
    assert len(keep) == max(4, (nb + 1) // 2)
    trained = {
        r["word"]: r["min_cost"]
        for r in QUERIES["q317_unigram_trained_viterbi"](
            spark, sf_dir
        ).collect()
    }
    pruned = {
        r["word"]: r["min_cost"]
        for r in QUERIES["q322_unigram_vocab_prune"](
            spark, sf_dir
        ).collect()
    }
    assert set(pruned) == set(trained)
    assert all(pruned[w] >= trained[w] for w in trained)
    # the prune must measurably bite: with half the bigrams gone some
    # word's optimum re-routes through a costlier path
    assert any(pruned[w] > trained[w] for w in trained)
    # segmentability: no word's cost carries the removed-piece sentinel
    assert all(v < _Q301_HUGE for v in pruned.values())
