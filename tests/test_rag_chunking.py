"""q354 RAG chunking: driver recompute by ENUMERATION (actually walk
the stride windows per doc) vs the query's closed-form mass, plus the
chunking laws — every token is covered, overlap mass is non-negative,
fill is full except the tail."""

from __future__ import annotations

from collections import defaultdict

from etl_globalretail_spark.operators.corpus import _Q354_C, _Q354_S
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q354_matches_enumerated_windows(spark, sf_dir):
    C, S = _Q354_C, _Q354_S
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("source", "text").collect()
    )
    acc = defaultdict(lambda: [0, 0, 0, 0])  # docs, toks, chunks, mass
    for r in docs:
        nt = len(r["text"].strip().split())
        starts = [0]
        while starts[-1] + C < nt:
            starts.append(starts[-1] + S)
        sizes = [min(C, nt - s) for s in starts]
        assert starts[-1] + sizes[-1] == nt  # full coverage law
        a = acc[r["source"]]
        a[0] += 1
        a[1] += nt
        a[2] += len(starts)
        a[3] += sum(sizes)
    got = {
        r["source"]: r
        for r in ALL_QUERIES["q354_rag_chunking"](spark, sf_dir).collect()
    }
    assert set(got) == set(acc)
    for src, (nd, nt, nc, m) in acc.items():
        r = got[src]
        assert (r["n_docs"], r["n_tokens"], r["n_chunks"]) == (nd, nt, nc)
        assert r["chunk_token_mass"] == m
        assert r["overlap_mass"] == m - nt >= 0
        assert r["mean_fill_permil"] == m * 1000 // (nc * C)
