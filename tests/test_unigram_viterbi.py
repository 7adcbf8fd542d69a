"""q301 unigram Viterbi: brute-force enumeration of EVERY 1/2-char-piece
segmentation must reproduce the DP's minimum cost and optimal-path count
for every corpus word."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.corpus import (
    _Q301_FREQ_NUM,
    _Q301_PENALTY,
    QUERIES,
)


def _inventory(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pydict()
    insts = []
    for text in t["text"]:
        for w in text.strip().lower().split():
            if w and all("a" <= ch <= "z" for ch in w):
                insts.append(w)
    c1, c2 = Counter(), Counter()
    for w in insts:
        c1.update(w)
        c2.update(w[i:i + 2] for i in range(len(w) - 1))
    cost = lambda f: _Q301_PENALTY + _Q301_FREQ_NUM // (f + 1)  # noqa: E731
    return (
        sorted(set(insts)),
        {p: cost(f) for p, f in c1.items()},
        {p: cost(f) for p, f in c2.items()},
    )


def _enumerate(w, c1, c2):
    """All segmentations into 1/2-char pieces, exponentially."""
    if not w:
        return [0]
    costs = [c1[w[0]] + c for c in _enumerate(w[1:], c1, c2)]
    if len(w) >= 2:
        costs += [c2[w[:2]] + c for c in _enumerate(w[2:], c1, c2)]
    return costs


def test_q301_matches_bruteforce_enumeration(spark, sf_dir):
    words, c1, c2 = _inventory(sf_dir)
    assert words
    got = {
        r["word"]: (r["len"], r["min_cost"], r["n_best_paths"])
        for r in QUERIES["q301_unigram_viterbi"](spark, sf_dir).collect()
    }
    assert set(got) == set(words)
    for w in words:
        costs = _enumerate(w, c1, c2)
        mc = min(costs)
        assert got[w] == (len(w), mc, costs.count(mc)), w
