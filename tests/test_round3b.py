"""Round-3 additions: independent recomputes for q231–q236.

Each test re-derives the operator's result with a driver-side reference
implementation (plain Python/numpy over the collected fixture — fine at
sf0.001) and compares it to the registered query, so the oracle gate and
the pytest gate fail independently.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES as QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q232_bigram_model_recompute(spark, sf_dir):
    import re

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    ).collect()
    c2: Counter = Counter()
    doc_bigrams: dict[int, list[tuple[str, str]]] = {}
    for r in docs:
        toks = [
            t
            for t in re.split(r"\s+", r["text"].strip().lower())
            if re.fullmatch("[a-z]+", t)
        ]
        bgs = list(zip(toks, toks[1:]))
        doc_bigrams[r["doc_id"]] = bgs
        c2.update(bgs)
    c1: Counter = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    out = {
        r["doc_id"]: r
        for r in QUERIES["q232_bigram_lm_score"](spark, sf_dir).collect()
    }
    checked = 0
    for doc_id, bgs in doc_bigrams.items():
        if not bgs:
            assert doc_id not in out
            continue
        lp = sum((1_000_000 * c2[b]) // c1[b[0]] for b in bgs)
        row = out[doc_id]
        assert row["n_bigrams"] == len(bgs)
        assert row["sum_cond_ppm"] == lp
        assert row["lm_score_ppm"] == lp // len(bgs)
        checked += 1
    assert checked > 100


def test_q233_cusum_recurrence_vs_closed_form(spark, sf_dir):
    import math

    ev = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    per_user: dict[int, list] = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 1e6))
        )
    out = {
        r["user_id"]: r
        for r in QUERIES["q233_cusum_changepoint"](spark, sf_dir).collect()
    }
    for uid, rows in per_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        n = len(rows)
        total = sum(x for _, _, x in rows)
        # the literal Page recurrence, NOT the closed form the query uses
        s, peak, checksum = 0, 0, 0
        for _, _, x in rows:
            s = max(0, s + (n * x - total))
            peak = max(peak, s)
            checksum += s
        row = out[uid]
        assert row["n_events"] == n
        assert row["peak_cusum"] == peak
        assert row["cusum_checksum"] == checksum
        assert row["drift_alarm"] == (1 if peak > n * n * 100_000_000 else 0)


def test_q234_gram_numpy_recompute(spark, sf_dir):
    import numpy as np

    vecs = (
        load_table(spark, "embeddings", sf_dir).select("embedding").collect()
    )
    m = np.vstack([np.asarray(r["embedding"], dtype="float64") for r in vecs])
    q = np.floor(m * 1e6).astype("int64")
    g = q.T @ q
    out = QUERIES["q234_embedding_gram"](spark, sf_dir).collect()
    d = q.shape[1]
    assert len(out) == d * (d + 1) // 2
    for r in out:
        assert g[r["i"] - 1, r["j"] - 1] == r["gram"], (r["i"], r["j"])


def test_q235_power_iteration_vs_eigh(spark, sf_dir):
    import numpy as np

    vecs = (
        load_table(spark, "embeddings", sf_dir).select("embedding").collect()
    )
    m = np.vstack([np.asarray(r["embedding"], dtype="float64") for r in vecs])
    q = np.floor(m * 1e6).astype("int64")
    g = (q.T @ q).astype("float64")
    w, v = np.linalg.eigh(g)
    top = v[:, -1]
    if top[0] < 0:
        top = -top
    out = QUERIES["q235_pca_power_iteration"](spark, sf_dir).collect()
    out.sort(key=lambda r: r["pos"])
    got = np.array([r["component_micros"] for r in out], dtype="float64") / 1e6
    # power iteration converges geometrically in the spectral gap; the
    # fixture's gap is small (λ₂/λ₁ ≈ 0.98) and the int64-lattice
    # renormalization injects ~1e-6 truncation noise per round, so the
    # 300-round fixpoint lands within ~1e-3 of eigh's direction.
    assert np.abs(got - top).max() < 1e-3
    # eigenvalue_micros is the Rayleigh quotient of the RESCALED matrix
    # G' = trunc(G / gram_scale_div); read it back on G's scale.
    lam = out[0]["eigenvalue_micros"] / 1e6 * out[0]["gram_scale_div"]
    assert abs(lam - w[-1]) / w[-1] < 1e-3


def test_q236_label_propagation_recompute(spark, sf_dir):
    from etl_globalretail_spark.plans import analytics

    edges = [
        (r["u"], r["v"])
        for r in analytics.co_purchase_edges(spark, sf_dir).collect()
    ]
    nbrs: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
        nbrs[v].append(u)
    lab = {v: v for v in nbrs}
    for _ in range(3):
        nxt = {}
        for v, ns in nbrs.items():
            cnt = Counter(lab[n] for n in ns)
            nxt[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
    sizes = Counter(lab.values())
    out = QUERIES["q236_label_propagation"](spark, sf_dir).collect()
    assert len(out) == len(nbrs)
    for r in out:
        assert lab[r["part"]] == r["community"]
        assert sizes[r["community"]] == r["community_size"]


def test_q231_stream_join_matches_batch_join(spark, sf_dir):
    """The streamed pair aggregate equals the same aggregate over the
    batch interval join — the executed-result face of the existing
    plan-parity test."""
    from etl_globalretail_spark.streaming.windows import (
        purchases_with_recent_click,
    )

    e = load_table(spark, "events", sf_dir)
    batch = (
        purchases_with_recent_click(e)
        .groupBy(F.date_trunc("hour", F.col("p_ts")).alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.sum("click_id").alias("click_checksum"),
        )
        .collect()
    )
    got = {
        r["window_start"]: r
        for r in QUERIES["q231_streaming_join_exact"](spark, sf_dir).collect()
    }
    assert len(got) == len(batch)
    for b in batch:
        g = got[b["window_start"]]
        assert (g["n_pairs"], g["n_purchases"], g["click_checksum"]) == (
            b["n_pairs"],
            b["n_purchases"],
            b["click_checksum"],
        )


def test_q237_rrf_recompute(spark, sf_dir):
    from etl_globalretail_spark.operators.corpus import q226_keyword_search
    from etl_globalretail_spark.operators.similarity import q27_ann_bruteforce

    kw = {r["doc_id"]: r["rank"] for r in q226_keyword_search(spark, sf_dir).collect()}
    ann = {r["vec_id"]: r["rank"] for r in q27_ann_bruteforce(spark, sf_dir).collect()}
    expect = {}
    for i in set(kw) | set(ann):
        s = 0
        if i in kw:
            s += 1_000_000_000 // (60 + kw[i])
        if i in ann:
            s += 1_000_000_000 // (60 + ann[i])
        expect[i] = (kw.get(i, -1), ann.get(i, -1), s)
    out = QUERIES["q237_rrf_fusion"](spark, sf_dir).collect()
    assert len(out) == len(expect)
    order = sorted(expect, key=lambda i: (-expect[i][2], i))
    for r in out:
        kwr, annr, s = expect[r["id"]]
        assert (r["kw_rank"], r["ann_rank"], r["rrf_score"]) == (kwr, annr, s)
        assert order[r["fused_rank"] - 1] == r["id"]


def test_q238_bootstrap_bounds_and_membership(spark, sf_dir):
    import hashlib
    import math

    rows = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    reps: dict[tuple, list] = defaultdict(list)
    full: dict[str, list] = defaultdict(list)
    for r in rows:
        cents = math.floor(r["o_totalprice"] * 100)
        full[r["o_orderpriority"]].append(cents)
        for rep in range(32):
            h = hashlib.md5(f"{r['o_orderkey']}boot{rep}".encode()).hexdigest()
            if int(h[:15], 16) % 1_000_000 < 500_000:
                reps[(r["o_orderpriority"], rep)].append(cents)
    out = {r["priority"]: r for r in QUERIES["q238_bootstrap_ci"](spark, sf_dir).collect()}
    for prio, vals in full.items():
        means = sorted(
            (sum(reps[(prio, i)]) // len(reps[(prio, i)]), i) for i in range(32)
        )
        row = out[prio]
        assert row["lo_cents"] == means[1][0]      # rank 2 of 32
        assert row["hi_cents"] == means[30][0]     # rank 31 of 32
        assert row["lo_cents"] <= row["hi_cents"]
        assert row["full_mean_cents"] == sum(vals) // len(vals)
        assert row["n_orders"] == len(vals)


def test_q239_interval_union_recompute(spark, sf_dir):
    import hashlib
    import re

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text"
    ).collect()
    K = 5
    span_docs: dict[str, set] = defaultdict(set)
    doc_spans: dict[int, list] = {}
    toks_n: dict[int, int] = {}
    for r in docs:
        toks = re.split(r"\s+", r["text"].strip())
        toks_n[r["doc_id"]] = len(toks)
        spans = []
        for i in range(len(toks) - K + 1):
            h = hashlib.md5("\x1f".join(toks[i : i + K]).encode()).hexdigest()
            spans.append((i + 1, h))
            span_docs[h].add(r["doc_id"])
        doc_spans[r["doc_id"]] = spans
    out = {r["doc_id"]: r for r in QUERIES["q239_dup_span_coverage"](spark, sf_dir).collect()}
    n_with_dups = 0
    for doc_id, spans in doc_spans.items():
        covered: set[int] = set()
        for s, h in spans:
            if len(span_docs[h]) > 1:
                covered.update(range(s, s + K))
        row = out[doc_id]
        assert row["covered_tokens"] == len(covered), doc_id
        assert row["n_toks"] == toks_n[doc_id]
        assert row["coverage_permil"] == (len(covered) * 1000) // toks_n[doc_id]
        if covered:
            n_with_dups += 1
    assert n_with_dups > 0, "fixture has no cross-doc duplicated spans?"
