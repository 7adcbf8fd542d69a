"""q331 BM25: pure-Python exact-integer recompute of the full
saturated, length-normalized scoring, plus the BM25 shape laws."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.corpus import _Q331_QUERY, QUERIES


def _sat_ppm(a: int, tf: int, dl: int) -> int:
    return (1000000 * 44 * a * tf) // (20 * a * tf + 6 * a + 18 * dl)


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = {
        i: t.strip().split()
        for i, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
    }
    vocab: Counter = Counter()
    for toks in docs.values():
        vocab.update(toks)
    maxbits = max(c.bit_length() for c in vocab.values())
    rarity = {
        t: maxbits - vocab[t].bit_length() + 1
        for t in _Q331_QUERY
        if t in vocab
    }
    total = sum(len(t) for t in docs.values())
    a = total // len(docs)
    scored = []
    for i, toks in docs.items():
        tf = Counter(t for t in toks if t in rarity)
        if not tf:
            continue
        score = sum(
            rarity[t] * _sat_ppm(a, c, len(toks)) for t, c in tf.items()
        )
        scored.append((i, len(toks), score))
    scored.sort(key=lambda x: (-x[2], x[0]))
    return scored[:10]


def test_q331_matches_pure_python(spark, sf_dir):
    expected = _recompute(sf_dir)
    rows = QUERIES["q331_bm25_retrieval"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r, (doc_id, dl, score) in zip(
        sorted(rows, key=lambda r: r["rank"]), expected
    ):
        assert (r["doc_id"], r["dl"], r["score"]) == (doc_id, dl, score)


def test_bm25_shape_laws():
    a = 50
    # Saturation: marginal gain of the 10th occurrence is below the 1st.
    g1 = _sat_ppm(a, 1, 50) - _sat_ppm(a, 0, 50)
    g10 = _sat_ppm(a, 10, 50) - _sat_ppm(a, 9, 50)
    assert 0 < g10 < g1
    # Bounded by (k1+1) = 2.2: never exceeds 2.2e6 ppm.
    assert _sat_ppm(a, 10**6, 50) <= 2_200_000
    # Length normalization: same tf, longer doc scores lower.
    assert _sat_ppm(a, 3, 200) < _sat_ppm(a, 3, 20)
    # Average-length doc with tf=1 sits at the textbook 2.2/2.2 = 1e6·
    # tf·(k1+1)/(tf+k1) = 1e6·2.2/2.2 = 1e6 ppm.
    assert _sat_ppm(a, 1, a) == 1_000_000
