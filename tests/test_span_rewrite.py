"""q329 span-dedup rewrite: pure-Python recompute of the C4-style
first-occurrence tile dedup + reassembly, plus the conservation law
(every distinct segment survives exactly once corpus-wide)."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.dedup import _REWRITE_K, QUERIES


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    k = _REWRITE_K
    seen: set[str] = set()
    out = {}
    n_distinct = 0
    for doc_id, text in docs:
        toks = text.strip().split()
        n_segs = (len(toks) + k - 1) // k
        kept = []
        for i in range(n_segs):
            seg = " ".join(toks[i * k : i * k + k])
            if seg not in seen:
                seen.add(seg)
                n_distinct += 1
                kept.append(seg)
        new_text = " ".join(kept)
        out[doc_id] = (
            n_segs,
            len(kept),
            len(new_text),
            hashlib.md5(new_text.encode()).hexdigest(),
        )
    return out, n_distinct


def test_q329_matches_pure_python(spark, sf_dir):
    expected, n_distinct = _recompute(sf_dir)
    rows = QUERIES["q329_span_dedup_rewrite"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    total_kept = 0
    for r in rows:
        n_segs, kept_segs, kept_chars, digest = expected[r["doc_id"]]
        assert r["n_segs"] == n_segs
        assert r["kept_segs"] == kept_segs
        assert r["kept_chars"] == kept_chars
        assert r["rewritten_md5"] == digest
        assert r["kept_segs"] <= r["n_segs"]
        total_kept += r["kept_segs"]
    # Conservation: corpus-wide, exactly one copy of each distinct
    # segment survives — dedup removes repeats, never content.
    assert total_kept == n_distinct


def test_q329_removes_planted_duplicates(spark, sf_dir):
    # The corpus has exact-duplicate docs (q18's fixture guarantee), so
    # at least one tile must be removed somewhere.
    rows = QUERIES["q329_span_dedup_rewrite"](spark, sf_dir).collect()
    assert any(r["kept_segs"] < r["n_segs"] for r in rows)
