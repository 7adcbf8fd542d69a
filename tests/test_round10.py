"""Round-10 regression tier (VERDICT r9 items 1/2/4 + ADVICE r9).

Pins, each against the defect the r9 verdict/advice named:
- the q50 graded frame is LIST-FREE (the driver comparator's
  ``sort_values`` canonicalizer raises ``unhashable type: 'list'`` on
  any array cell — VERDICT r9 item 1);
- every registered query now carries an oracle: zero rows-only gate
  records are possible from here on (item 2);
- the four latent-edge guards hold on constructed degenerate inputs
  (item 4): empty staged wave, empty hash-Bernoulli sample, pe = 10^6
  kappa denominator, and the q351 exact-audit value on a known corpus.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_globalretail_spark.plans.registry import ALL_ORACLE, ALL_QUERIES
from etl_globalretail_spark.schemas import TESTDATA_SCHEMAS


def test_every_registered_query_has_an_oracle():
    # VERDICT r9 item 2: the seven scale tiers were registered with NO
    # oracle at all, so the driver could only record `err: no_oracle`.
    # From round 10 every query ships SQL — hash-exact, or shape-only
    # with the `-- SHAPE-ONLY` marker naming its hash twin.
    missing = [name for name in ALL_QUERIES if name not in ALL_ORACLE]
    assert missing == []


def test_shape_only_oracles_lead_with_marker():
    # check_oracle.py (and the registry convention) detect shape-only
    # oracles by the LEADING marker; a marker buried mid-SQL silently
    # downgrades to a value compare that can never pass.
    for name in (
        "q24_minhash_neardup", "q25_simhash_neardup", "q28_ann_lsh",
        "q36_ann_ivf", "q43_dedup_clusters", "q50_sketch_profile",
    ):
        assert ALL_ORACLE[name].lstrip().startswith("-- SHAPE-ONLY"), name


def test_q50_graded_frame_is_list_free(spark, sf_dir):
    # VERDICT r9 item 1: an ArrayType column crashes the driver's
    # canonicalizer before rows/schema can be recorded.
    df = ALL_QUERIES["q50_sketch_profile"](spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"q50 column {f.name} is non-scalar: {f.dataType}"
    cols = {f.name for f in df.schema.fields}
    assert {"p50", "p95", "p99"} <= cols


def test_stage_wave_file_empty_wave_raises(tmp_path):
    # q344's staging guard (ADVICE r8, re-pinned r10): a wave predicate
    # that selects no rows leaves no __wave=i directory, and the bare
    # glob()[0] used to IndexError two frames deep.
    from etl_globalretail_spark.streaming.windows import _stage_wave_file

    tmp = tmp_path / "staged"
    sdir = tmp_path / "stream"
    os.makedirs(tmp / "__wave=0")
    os.makedirs(sdir)
    with pytest.raises(ValueError, match="wave 1 is empty"):
        _stage_wave_file(str(tmp), str(sdir), 1)


def _write_table(spark, sf_dir_tmp, name, rows):
    df = spark.createDataFrame(rows, TESTDATA_SCHEMAS[name])
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir_tmp, f"{name}.parquet")
    )


def test_q345_empty_corpus_returns_empty_frame(spark, tmp_path):
    # The empty-sample guard: on a 0-row lineitem the hash-Bernoulli
    # sample is empty, the oracle's rn=pos join emits zero rows, and
    # the Spark side must mirror that instead of KeyError-ing.
    _write_table(spark, str(tmp_path), "lineitem", [])
    df = ALL_QUERIES["q345_quantile_sketch"](spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "phi_ppm", "n_rows", "scale_s", "sample_n",
        "est_cents", "count_lt", "count_le", "rank_err_ppm",
    ]


def test_q361_degenerate_single_class_kappa_zero(spark, tmp_path):
    # The pe=10^6 denominator clamp: when label and prediction both put
    # all mass in ONE class, po = pe = 10^6 and kappa must come out 0
    # via max(1, 1e6 - pe) — not ZeroDivisionError. Two passes: first
    # learn what the n-gram classifier predicts for a crafted text,
    # then relabel every doc with that prediction and re-run.
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (i, text, "xx", "src", len(text)) for i in range(1, 9)
    ]
    # two distinct dirs: load_table memoizes the (sf_dir, table) plan
    # per session, so pass 2 must not overwrite pass 1's files in place
    d1, d2 = str(tmp_path / "pass1"), str(tmp_path / "pass2")
    _write_table(spark, d1, "documents", docs)
    from etl_globalretail_spark.operators.text import QUERIES as TEXT_QUERIES

    cm = TEXT_QUERIES["q21_lang_id"](spark, d1).collect()
    pred = cm[0]["lang_pred"]
    assert all(r["lang_pred"] == pred for r in cm)  # one class only

    docs = [(i, text, pred, "src", len(text)) for i in range(1, 9)]
    _write_table(spark, d2, "documents", docs)
    row = TEXT_QUERIES["q361_cohens_kappa"](spark, d2).collect()[0]
    assert row["po_ppm"] == 1_000_000
    assert row["pe_ppm"] == 1_000_000
    assert row["kappa_ppm"] == 0


def test_q351_exact_audit_on_known_corpus(spark, tmp_path):
    # The widened Σ na·nb audit, checked against a hand-computed value:
    # users 1/2 click {3,2} times and purchase {1,4} times, user 3 only
    # clicks → exact join size = 3·1 + 2·4 = 11.
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user, n in ((1, 3), (2, 2), (3, 5)):
        for _ in range(n):
            eid += 1
            rows.append((eid, ts, user, "click", 1.0, "{}"))
    for user, n in ((1, 1), (2, 4)):
        for _ in range(n):
            eid += 1
            rows.append((eid, ts, user, "purchase", 1.0, "{}"))
    _write_table(spark, str(tmp_path), "events", rows)
    row = ALL_QUERIES["q351_join_cardinality_estimate"](
        spark, str(tmp_path)
    ).collect()[0]
    assert row["exact_join"] == 11
    assert row["n_a"] == 10 and row["n_b"] == 5


def test_q412_runs_consistent_with_q139(spark, sf_dir):
    # dup_windows aggregates the same flagged-window set q139 counts —
    # the two faces of the span family must agree doc by doc.
    from etl_globalretail_spark.operators.corpus import QUERIES as CQ

    runs = {
        r["doc_id"]: (r["n_runs"], r["longest_run_tokens"],
                      r["dup_windows"])
        for r in CQ["q412_dup_span_runs"](spark, sf_dir).collect()
    }
    frac = {
        r["doc_id"]: r["dup_spans"]
        for r in CQ["q139_dup_span_fraction"](spark, sf_dir).collect()
    }
    assert set(runs) == set(frac)
    for doc, (n_runs, longest, dw) in runs.items():
        assert dw == frac[doc]
        if dw == 0:
            assert n_runs == 0 and longest == 0
        else:
            assert n_runs >= 1
            # a run of c windows spans c+4 tokens; the longest run is
            # bounded by the doc's duplicated-window total
            assert 5 <= longest <= dw + 4


def test_q412_recovers_variable_length_region(spark, tmp_path):
    # Two docs sharing a verbatim 12-token region (and nothing else)
    # must each report exactly ONE run of 12 tokens = 8 windows.
    shared = " ".join(f"w{i}" for i in range(12))
    docs = [
        (1, "alpha beta gamma " + shared + " delta one", "xx", "s", 0),
        (2, "epsilon zeta " + shared + " eta theta two", "xx", "s", 0),
        (3, "totally unrelated text with many plain tokens here", "xx",
         "s", 0),
    ]
    docs = [(i, t, lg, sr, len(t)) for i, t, lg, sr, _ in docs]
    _write_table(spark, str(tmp_path), "documents", docs)
    from etl_globalretail_spark.operators.corpus import QUERIES as CQ

    rows = {
        r["doc_id"]: r
        for r in CQ["q412_dup_span_runs"](
            spark, str(tmp_path)
        ).collect()
    }
    for doc in (1, 2):
        assert rows[doc]["n_runs"] == 1
        assert rows[doc]["longest_run_tokens"] == 12
        assert rows[doc]["dup_windows"] == 8
    assert rows[3]["n_runs"] == 0 and rows[3]["longest_run_tokens"] == 0


def _winnow_brute(tokens, k=3, w=4):
    # reference implementation of the q415 contract
    import hashlib

    n = len(tokens) - k + 1
    grams = []
    for i in range(n):
        gram = "\x1f".join(tokens[i:i + k])
        grams.append(int(hashlib.md5(gram.encode()).hexdigest()[:12], 16))
    n_starts = max(1, n - w + 1)
    sel = set()
    for s in range(1, n_starts + 1):
        win = [(grams[p - 1], p) for p in range(s, min(s + w, n + 1))]
        mh = min(h for h, _ in win)
        fp = max(p for h, p in win if h == mh)
        sel.add((fp, grams[fp - 1]))
    return sel


def test_q415_matches_bruteforce_and_guarantee(spark, tmp_path):
    from etl_globalretail_spark.operators.text import QUERIES as TQ

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k−1 tokens
    t1 = "one two three " + shared + " four five six"
    t2 = "seven eight " + shared + " nine ten eleven twelve"
    t3 = "unrelated words only in this document here now"
    docs = [(i + 1, t, "xx", "s", len(t)) for i, t in
            enumerate((t1, t2, t3))]
    _write_table(spark, str(tmp_path), "documents", docs)
    rows = {
        r["doc_id"]: r
        for r in TQ["q415_winnowing_fingerprints"](
            spark, str(tmp_path)
        ).collect()
    }
    for doc_id, text in ((1, t1), (2, t2), (3, t3)):
        want = _winnow_brute(text.split())
        r = rows[doc_id]
        assert r["n_fps"] == len(want)
        xor = 0
        for _, h in want:
            xor ^= h
        assert r["fp_xor"] == xor
    # the winnowing GUARANTEE: a shared run of ≥ w+k−1 tokens forces a
    # shared fingerprint between docs 1 and 2
    assert rows[1]["n_shared"] >= 1 and rows[2]["n_shared"] >= 1
    assert rows[3]["n_shared"] == 0


def test_q415_density_near_theory(spark, sf_dir):
    # expected selection density is ~2/(w+1) = 0.4 for random hashes;
    # docs with enough grams should sit in a generous band around it
    from etl_globalretail_spark.operators.text import QUERIES as TQ

    rows = [
        r for r in TQ["q415_winnowing_fingerprints"](
            spark, sf_dir
        ).collect()
        if r["n_grams"] >= 40
    ]
    assert rows
    for r in rows:
        assert 250 <= r["density_permil"] <= 600, (
            r["doc_id"], r["density_permil"]
        )


def test_q416_index_pairs_on_crafted_corpus(spark, tmp_path):
    from etl_globalretail_spark.operators.text import QUERIES as TQ

    shared = ("alpha beta gamma delta epsilon zeta eta theta iota "
              "kappa lam mu")  # 12 tokens → many shared fingerprints
    t1 = "one two three " + shared + " four five six"
    t2 = "seven eight " + shared + " nine ten eleven twelve"
    t3 = "unrelated words only in this document here now truly"
    docs = [(i + 1, t, "xx", "s", len(t)) for i, t in
            enumerate((t1, t2, t3))]
    _write_table(spark, str(tmp_path), "documents", docs)
    rows = TQ["q416_winnowing_neardup_pairs"](
        spark, str(tmp_path)
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert r["shared_fps"] >= 2
    # exact Jaccard check: distinct 3-gram sets of the two texts
    def gset(t):
        toks = t.split()
        return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}
    ga, gb = gset(t1), gset(t2)
    assert r["inter_grams"] == len(ga & gb)
    assert r["union_grams"] == len(ga | gb)
    assert r["jaccard_permil"] == len(ga & gb) * 1000 // len(ga | gb)


def test_q417_matches_driver_recompute(spark, sf_dir):
    # full contract recompute with numpy from the raw embeddings:
    # quantize, exact kNN graph (top-16 by dot desc, id asc), md5
    # probe/entry seeds, 10 monotone greedy steps, exact best.
    import hashlib

    import numpy as np

    from etl_globalretail_spark.operators.similarity import (
        QUERIES as SQ,
        _Q417_DEG as DEG,
        _Q417_ENTRIES as NE,
        _Q417_STEPS as ST,
    )
    from etl_globalretail_spark.sources.readers import load_table

    rows = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6
    ).astype(np.int64)
    o = np.argsort(ids)
    ids, Q = ids[o], Q[o]
    idx = {int(v): k for k, v in enumerate(ids)}
    seeds = sorted(
        (hashlib.md5(str(int(v)).encode()).hexdigest(), int(v))
        for v in ids
    )
    probes = [v for _, v in seeds[:4]]
    entries = [v for _, v in seeds[4:4 + NE]]
    D = Q @ Q.T
    nbrs = {}
    for k, v in enumerate(ids):
        d = D[k].copy()
        keep = ids != v
        cid, cd = ids[keep], d[keep]
        sel = np.lexsort((cid, -cd))[:DEG]
        nbrs[int(v)] = [int(cid[s]) for s in sel]
    want = {}
    for p in probes:
        pi = idx[p]
        row = D[pi]
        exact = int(
            max(row[k] for k, v in enumerate(ids) if int(v) != p)
        )
        best = None
        for en in entries:
            if en == p:
                continue
            cur = en
            for _ in range(ST):
                cands = [c for c in [cur, *nbrs[cur]] if c != p]
                cur = max(cands, key=lambda c: (row[idx[c]], -c))
            d = int(row[idx[cur]])
            best = d if best is None else max(best, d)
        want[p] = (exact, best, 1 if best == exact else 0,
                   best * 1000 // exact)
    got = {
        r["probe_id"]: (r["exact_dot_q"], r["found_dot_q"],
                        r["hit_top1"], r["found_permil"])
        for r in SQ["q417_graph_ann_search"](spark, sf_dir).collect()
    }
    assert got == want
