"""q349 FORCAST readability: full driver recompute (vowel-group
syllable heuristic, mono filter, cleared-integer grade) plus range
laws — grade lives in [5, 20] when mono <= words."""

from __future__ import annotations

import re
from collections import defaultdict

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table

_VOWELS = re.compile(r"[aeiouy]+")


def test_q349_matches_driver_recompute(spark, sf_dir):
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("source", "text").collect()
    )
    acc = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, mono, grade_sum
    for r in docs:
        ws = r["text"].strip().split()
        if not ws:
            continue
        mono = sum(
            1 for w in ws if len(_VOWELS.findall(w.lower())) == 1
        )
        a = acc[r["source"]]
        a[0] += 1
        a[1] += len(ws)
        a[2] += mono
        a[3] += 20000 - (15000 * mono) // len(ws)
    got = {
        r["source"]: r
        for r in ALL_QUERIES["q349_readability_forcast"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(acc)
    for src, (nd, words, mono, gsum) in acc.items():
        r = got[src]
        assert (r["n_docs"], r["sum_words"], r["sum_mono"]) == (
            nd, words, mono,
        )
        assert r["corpus_grade_milli"] == 20000 - (15000 * mono) // words
        assert r["mean_doc_grade_milli"] == gsum // nd
        assert 5000 <= r["corpus_grade_milli"] <= 20000
