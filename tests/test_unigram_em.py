"""q307 unigram-LM Viterbi-EM training: pure-Python recompute of both
EM rounds from the parquet (forward/backward path-count DPs + edge
marginals), plus the fwd/bwd path-count consistency law."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.corpus import (
    _Q301_FREQ_NUM,
    _Q301_HUGE,
    _Q301_PENALTY,
    QUERIES,
)

_WORD = re.compile(r"^[a-z]+$")


def _words(sf_dir: str) -> Counter:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    freq = Counter()
    for txt in t.column("text").to_pylist():
        for w in str(txt).lower().strip().split():
            if _WORD.fullmatch(w):
                freq[w] += 1
    return freq


def _dps(w: str, c1: dict, c2: dict):
    L = len(w)
    bf, pf = [0] * (L + 1), [0] * (L + 1)
    pf[0] = 1
    for i in range(1, L + 1):
        cand1 = bf[i - 1] + c1[w[i - 1]]
        cand2 = bf[i - 2] + c2[w[i - 2:i]] if i >= 2 else _Q301_HUGE
        bf[i] = min(cand1, cand2)
        pf[i] = (pf[i - 1] if cand1 == bf[i] else 0) + (
            pf[i - 2] if i >= 2 and cand2 == bf[i] else 0
        )
    bb, pb = [0] * (L + 1), [0] * (L + 1)
    pb[L] = 1
    for i in range(L - 1, -1, -1):
        cand1 = c1[w[i]] + bb[i + 1]
        cand2 = c2[w[i:i + 2]] + bb[i + 2] if i + 2 <= L else _Q301_HUGE
        bb[i] = min(cand1, cand2)
        pb[i] = (pb[i + 1] if cand1 == bb[i] else 0) + (
            pb[i + 2] if i + 2 <= L and cand2 == bb[i] else 0
        )
    return bf, pf, bb, pb


def _estep(freq: Counter, c1: dict, c2: dict) -> Counter:
    usage = Counter()
    for w, fw in freq.items():
        bf, pf, bb, pb = _dps(w, c1, c2)
        L = len(w)
        assert pf[L] == pb[0], w  # fwd/bwd optimal-path counts agree
        total = bf[L]
        for i in range(1, L + 1):
            if bf[i - 1] + c1[w[i - 1]] + bb[i] == total:
                usage[w[i - 1]] += pf[i - 1] * pb[i] * fw
            if i >= 2 and bf[i - 2] + c2[w[i - 2:i]] + bb[i] == total:
                usage[w[i - 2:i]] += pf[i - 2] * pb[i] * fw
    return usage


def _recompute(sf_dir: str):
    freq = _words(sf_dir)
    f0 = Counter()
    for w, fw in freq.items():
        for ch in w:
            f0[ch] += fw
        for i in range(len(w) - 1):
            f0[w[i:i + 2]] += fw

    def mstep(u):
        c1 = {p: _Q301_PENALTY + _Q301_FREQ_NUM // (u.get(p, 0) + 1)
              for p in f0 if len(p) == 1}
        c2 = {p: _Q301_PENALTY + _Q301_FREQ_NUM // (u.get(p, 0) + 1)
              for p in f0 if len(p) == 2}
        return c1, c2

    u1 = _estep(freq, *mstep(f0))
    u2 = _estep(freq, *mstep(u1))
    return {
        p: (len(p), f, u1.get(p, 0), u2.get(p, 0),
            _Q301_PENALTY + _Q301_FREQ_NUM // (u2.get(p, 0) + 1))
        for p, f in f0.items()
    }


def test_q307_matches_python_em_recompute(spark, sf_dir):
    got = {
        r["piece"]: (r["piece_len"], r["f0"], r["u1"], r["u2"], r["cost2"])
        for r in QUERIES["q307_unigram_em_train"](spark, sf_dir).collect()
    }
    assert got == _recompute(sf_dir)


def test_q307_usage_is_bounded_by_frequency_mass(spark, sf_dir):
    """Each round's TOTAL piece usage, divided by each word's optimal
    path count, sums the per-word piece counts of one segmentation —
    so usage of any piece is positive only if it appears in some
    optimal segmentation, and 1-char usage of a char can't exceed
    total optimal-path-weighted instances. Cheap sanity: u >= 0 and at
    least one piece is used each round."""
    rows = QUERIES["q307_unigram_em_train"](spark, sf_dir).collect()
    assert rows
    assert all(r["u1"] >= 0 and r["u2"] >= 0 for r in rows)
    assert any(r["u1"] > 0 for r in rows)
    assert any(r["u2"] > 0 for r in rows)
