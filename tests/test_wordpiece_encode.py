"""q316 WordPiece encode: the per-source census must equal a pure-Python
greedy longest-match recompute over the same learned vocabulary, and
compression must be real (tokens < chars — the merges actually fire)."""

from __future__ import annotations

import re
from collections import Counter

from etl_globalretail_spark.operators.corpus import (
    QUERIES,
    wordpiece_learn,
)
from etl_globalretail_spark.sources.readers import load_table


def _greedy_count(word: str, vocab: set, lmax: int) -> int:
    pos, cnt = 0, 0
    while pos < len(word):
        step = 1
        for length in range(min(lmax, len(word) - pos), 1, -1):
            if word[pos:pos + length] in vocab:
                step = length
                break
        pos += step
        cnt += 1
    return cnt


def test_q316_matches_greedy_recompute(spark, sf_dir):
    merges = wordpiece_learn(spark, sf_dir)
    vocab = {chr(c) for c in range(97, 123)} | {m[3] for m in merges}
    lmax = max(len(t) for t in vocab)
    docs = load_table(spark, "documents", sf_dir).select(
        "source", "text"
    ).collect()
    wf: Counter = Counter()
    for r in docs:
        for t in re.split(r"\s+", r["text"].strip().lower()):
            if re.fullmatch("[a-z]+", t):
                wf[(r["source"], t)] += 1
    expect = {}
    for (src, w), f in wf.items():
        nd, tw, ch, tk = expect.get(src, (0, 0, 0, 0))
        expect[src] = (
            nd + 1, tw + f, ch + f * len(w),
            tk + f * _greedy_count(w, vocab, lmax),
        )
    got = {
        r["source"]: (
            r["n_distinct_words"], r["total_words"], r["total_chars"],
            r["total_tokens"],
        )
        for r in QUERIES["q316_wordpiece_encode"](spark, sf_dir).collect()
    }
    assert got == expect
    for src, (_nd, _tw, ch, tk) in expect.items():
        assert tk < ch, src  # the merges fire somewhere in every source
