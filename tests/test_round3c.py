"""Round-3 additions, wave 2: independent recomputes for q240–q243.

Each test re-derives the operator with a driver-side reference
implementation (plain Python over the collected sf0.001 fixture) so the
oracle gate and the pytest gate fail independently; q240 additionally
pins the KMV merge law the sketch's 100 TB story depends on.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.profiling import (
    _KMV_H,
    _KMV_K,
    kmv_hash,
    kmv_partials,
    kmv_sketch,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES as QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _kmv_ref_hash(user_id: int) -> int:
    return int(hashlib.md5(f"{user_id}kmv".encode()).hexdigest()[:13], 16)


def test_q240_kmv_estimate_recompute(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", "user_id"
    ).collect()
    per_type: dict[str, set[int]] = {}
    for r in ev:
        per_type.setdefault(r["event_type"], set()).add(r["user_id"])
    out = {
        r["event_type"]: r
        for r in QUERIES["q240_kmv_distinct"](spark, sf_dir).collect()
    }
    assert set(out) == set(per_type)
    for t, users in per_type.items():
        hs = sorted({_kmv_ref_hash(u) for u in users})
        mins = hs[:_KMV_K]
        row = out[t]
        assert row["n_exact"] == len(users)
        assert row["n_kept"] == len(mins)
        assert row["kth_min"] == mins[-1]
        if len(mins) < _KMV_K:
            assert row["est_distinct"] == len(mins)
        else:
            assert row["est_distinct"] == (63 * _KMV_H) // mins[-1]
        assert row["err_permil"] == abs(row["est_distinct"] - len(users)) * 1000 // len(users)


def test_q240_kmv_merge_law(spark, sf_dir):
    """sketch(A ∪ B) == take_k(sketch(A) ∪ sketch(B)): partials built from
    two disjoint halves merge to the whole-corpus sketch."""
    ev = load_table(spark, "events", sf_dir)
    hashed = ev.select("event_type", kmv_hash(F.col("user_id")).alias("hv"))
    whole = {
        r["event_type"]: list(r["mins"])
        for r in kmv_sketch(
            kmv_partials(hashed, "event_type", "hv"), "event_type", "hv"
        ).collect()
    }
    a = hashed.filter(F.col("hv") % 2 == 0)
    b = hashed.filter(F.col("hv") % 2 != 0)
    merged_partials = kmv_partials(a, "event_type", "hv").unionAll(
        kmv_partials(b, "event_type", "hv")
    )
    merged = {
        r["event_type"]: list(r["mins"])
        for r in kmv_sketch(merged_partials, "event_type", "hv").collect()
    }
    assert merged == whole


def test_q241_inverted_index_recompute(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    ).collect()
    postings: dict[str, set[int]] = {}
    for r in docs:
        toks = {
            t
            for t in re.split(r"\s+", r["text"].strip().lower())
            if re.fullmatch("[a-z]+", t)
        }
        for t in toks:
            postings.setdefault(t, set()).add(r["doc_id"])
    out = {
        r["tok"]: r
        for r in QUERIES["q241_inverted_index"](spark, sf_dir).collect()
    }
    assert set(out) == set(postings)
    for tok, ids in postings.items():
        row = out[tok]
        srt = sorted(ids)
        assert row["df"] == len(ids)
        assert row["doc_checksum"] == sum(ids)
        assert row["postings_prefix"] == ",".join(str(i) for i in srt[:20])


def test_q242_bpe_merges_recompute(spark, sf_dir):
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
        for w, f in vocab.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += f
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = l + r
        for m, exp in sorted(expansion.items(), reverse=True):
            merged = merged.replace(m, exp)
        expansion[str(rnd)] = merged
        expected.append((rnd, l, r, merged, cnt))
        vocab = _apply_merge(vocab, l + r, str(rnd))
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in QUERIES["q242_bpe_merges"](spark, sf_dir)
        .orderBy("round")
        .collect()
    ]
    assert got == expected


def _apply_merge(vocab: dict, pat: str, marker: str) -> dict:
    out: dict[str, int] = {}
    for w, f in vocab.items():
        nw = w.replace(pat, marker)
        out[nw] = out.get(nw, 0) + f
    return out


def test_q243_k_anonymity_recompute(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    import math

    classes: Counter = Counter()
    for r in cust:
        band = int(math.floor(r["c_acctbal"] * 100 + 1000000)) // 100000
        classes[(r["c_nationkey"], r["c_mktsegment"], band)] += 1
    bands: dict[str, list[int]] = {"safe": [], "small": [], "singleton": []}
    for size in classes.values():
        key = "safe" if size >= 5 else ("small" if size > 1 else "singleton")
        bands[key].append(size)
    out = {
        r["size_band"]: r
        for r in QUERIES["q243_k_anonymity"](spark, sf_dir).collect()
    }
    for band, sizes in bands.items():
        if not sizes:
            assert band not in out
            continue
        row = out[band]
        assert row["n_classes"] == len(sizes)
        assert row["n_rows"] == sum(sizes)
        assert row["rows_at_risk"] == (0 if band == "safe" else sum(sizes))
        assert row["min_class_size"] == min(sizes)
    # conservation: every customer lands in exactly one class
    assert sum(r["n_rows"] for r in out.values()) == len(cust)
