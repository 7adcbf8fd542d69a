"""q337 weighted-cosine AllPairs: pure-Python tf-idf recompute with
bit-equal doubles, plus cosine laws."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.dedup import _Q337_TAU, QUERIES


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = {}
    for i, t in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        toks = t.strip().split()
        docs[i] = Counter(
            "\x1f".join(toks[k : k + 4]) for k in range(len(toks) - 3)
        )
    vocab: Counter = Counter()
    for tf in docs.values():
        vocab.update(tf)
    maxbits = max(c.bit_length() for c in vocab.values())
    w = {
        i: {
            t: c * (maxbits - vocab[t].bit_length() + 1)
            for t, c in tf.items()
        }
        for i, tf in docs.items()
    }
    norms = {
        i: math.sqrt(float(sum(Decimal(x * x) for x in ws.values())))
        for i, ws in w.items()
    }
    out = {}
    ids = sorted(w)
    inv: dict[str, list[int]] = {}
    for i in ids:
        for t in w[i]:
            inv.setdefault(t, []).append(i)
    cand = set()
    for t, members in inv.items():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                cand.add((members[x], members[y]))
    for ia, ib in cand:
        shared = set(w[ia]) & set(w[ib])
        dot = float(sum(Decimal(w[ia][t] * w[ib][t]) for t in shared))
        cos = dot / (norms[ia] * norms[ib])
        if cos >= _Q337_TAU:
            out[(ia, ib)] = (len(shared), cos)
    return out


def test_q337_matches_pure_python(spark, sf_dir):
    expected = _recompute(sf_dir)
    rows = QUERIES["q337_weighted_cosine_pairs"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n_shared, cos = expected[(r["id_a"], r["id_b"])]
        assert r["n_shared"] == n_shared
        assert r["cosine"] == cos  # bit-equal: identical double pipeline
        assert _Q337_TAU <= r["cosine"] <= 1.0 + 1e-12
        assert r["id_a"] < r["id_b"]


def test_q337_finds_near_duplicates(spark, sf_dir):
    # The fixture corpus contains exact/near-duplicate docs (q18's
    # guarantee); the weighted tier must surface at least one pair with
    # cosine near 1.
    rows = QUERIES["q337_weighted_cosine_pairs"](spark, sf_dir).collect()
    assert rows
    assert max(r["cosine"] for r in rows) > 0.9
