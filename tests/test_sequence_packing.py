"""q342 sequence packing: full driver recompute of the concat-and-chunk
layout plus the packing invariants — chunk count is ceil(total/L), every
chunk except the last is exactly full, boundary docs are the spans>=2
set, and doc spans partition the token stream."""

from __future__ import annotations

from etl_globalretail_spark.operators.corpus import _Q342_L
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q342_matches_driver_packing_recompute(spark, sf_dir):
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text").collect()
    )
    L = _Q342_L
    off = 0
    spans = []
    chunk_docs: dict[int, int] = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        n = len(r["text"].strip().split())
        st, fin = off, off + n
        first, last = st // L, (fin - 1) // L
        spans.append(last - first + 1)
        for c in range(first, last + 1):
            chunk_docs[c] = chunk_docs.get(c, 0) + 1
        off = fin
    total = off
    n_chunks = (total + L - 1) // L
    row = ALL_QUERIES["q342_sequence_packing"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == len(docs)
    assert row["total_tokens"] == total
    assert row["n_chunks"] == n_chunks == len(chunk_docs)
    assert row["n_boundary_docs"] == sum(1 for s in spans if s >= 2)
    assert row["max_spans"] == max(spans)
    assert row["max_docs_per_chunk"] == max(chunk_docs.values())
    assert row["n_singleton_chunks"] == sum(
        1 for v in chunk_docs.values() if v == 1
    )
    assert row["last_fill"] == total - (n_chunks - 1) * L
    assert 1 <= row["last_fill"] <= L
