"""q308 trained quality classifier: pure-Python recompute of the full
integer GD trajectory from the parquet, plus the learnability law (the
final scores must near-perfectly rank the rule labels: AUC >= 0.95)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.corpus import (
    _Q308_BIAS,
    _Q308_DIM,
    _Q308_LR_DEN,
    _Q308_ROUNDS,
    _q308_tdiv,
    QUERIES,
)
from etl_globalretail_spark.operators.text import _QUALITY_STOPWORDS

_SW = set(_QUALITY_STOPWORDS)


def _slot_sign(name: str, v: str) -> tuple[int, int]:
    h = int(hashlib.md5(f"{name}={v}".encode()).hexdigest()[:15], 16)
    return h % _Q308_DIM, 1 if (h // _Q308_DIM) % 2 == 0 else -1


def _rows(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "text"]
    )
    rows = []
    for lang, src, text in zip(
        t["lang"].to_pylist(), t["source"].to_pylist(),
        t["text"].to_pylist(),
    ):
        toks = str(text).strip().split() or [""]
        nt = len(toks)  # split('') -> [''] on both engines, so nt >= 1
        st = sum(1 for w in toks if w in _SW)
        nd = len(set(toks))
        y = 1 if (st * 10 >= nt and nt >= 5) else 0
        fx = [
            _slot_sign("lang", str(lang)),
            _slot_sign("source", str(src)),
            _slot_sign("lenb", str(len(str(nt)))),
            _slot_sign("divb", str(nd * 10 // max(nt, 1))),
            _slot_sign("swrb", str(st * 10 // max(nt, 1))),
            (_Q308_BIAS, 1),
        ]
        rows.append((y, fx))
    return rows


def _train(rows):
    w: dict[int, int] = {}
    n = len(rows)
    for _ in range(_Q308_ROUNDS):
        g: Counter = Counter()
        for y, fx in rows:
            z = sum(w.get(s, 0) * sg for s, sg in fx)
            p = min(1000000, max(0, 500000 + _q308_tdiv(z, 4)))
            e = p - 1000000 * y
            for s, sg in fx:
                g[s] += e * sg
        for s, gv in g.items():
            w[s] = w.get(s, 0) - _q308_tdiv(gv, _Q308_LR_DEN * n)
    return w


def _census(rows, w):
    c: Counter = Counter()
    for y, fx in rows:
        z = sum(w.get(s, 0) * sg for s, sg in fx)
        p = min(1000000, max(0, 500000 + _q308_tdiv(z, 4)))
        c[(y, p // 100000)] += 1
    return dict(c)


def test_q308_matches_python_gd_recompute(spark, sf_dir):
    rows = _rows(sf_dir)
    want = _census(rows, _train(rows))
    got = {
        (r["label"], r["bucket"]): r["n_docs"]
        for r in QUERIES["q308_quality_classifier"](spark, sf_dir).collect()
    }
    assert got == want


def test_q308_learns_the_rule_auc(spark, sf_dir):
    """The discriminative model must rank rule-positives above
    rule-negatives: AUC of the final integer scores >= 0.95 (observed
    1.0 at sf0.01 — the quantized features carry the rule)."""
    rows = _rows(sf_dir)
    w = _train(rows)
    scores = [
        (sum(w.get(s, 0) * sg for s, sg in fx), y) for y, fx in rows
    ]
    pos = sorted(s for s, y in scores if y == 1)
    neg = sorted(s for s, y in scores if y == 0)
    assert pos and neg
    import bisect

    wins = sum(
        bisect.bisect_left(neg, s) + 0.5 * (
            bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s)
        )
        for s in pos
    )
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.95, auc
