"""Round-4 additions, second batch: stream-static enrichment on the
gate (q288), distributed exact heavy hitters (q289), Mann-Whitney U
(q290), equi-depth histogram audit (q291) — property tests beyond the
DuckDB hash gate."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q288_stream_matches_batch(spark, sf_dir):
    """The streaming stream-static join + two-level aggregate equals the
    same computation run purely in batch (stream↔batch parity for the
    whole q288 pipeline, not just the join operator)."""
    got = {
        (r["window_start"], r["segment"]): (
            r["n_events"], r["n_users"], round(r["sum_value"], 6))
        for r in ALL_QUERIES["q288_stream_static_enrich_exact"](
            spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir)
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    want = {
        (r["ws"], r["segment"]): (
            r["n_events"], r["n_users"], round(r["sum_value"], 6))
        for r in (
            e.join(F.broadcast(c), "user_id", "left")
            .groupBy(
                F.date_trunc("hour", "ts").alias("ws"),
                F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.col("value").cast("decimal(27,6)"))
                .cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == want


def test_q289_candidates_are_lossless_and_bounded(spark, sf_dir):
    """The two-phase output is EXACTLY the true heavy-hitter set (the
    pigeonhole guarantee: no true heavy hitter can be missed by the
    local-threshold candidate pass), and every reported token was
    flagged by at least one shard."""
    from etl_globalretail_spark.operators.profiling import _HH_K
    from etl_globalretail_spark.operators.text import tokens

    rows = ALL_QUERIES["q289_local_heavy_hitters"](spark, sf_dir).collect()
    got = {r["token"]: r["n"] for r in rows}
    d = load_table(spark, "documents", sf_dir)
    occ = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    n_total = occ.count()
    true_hh = {
        r["token"]: r["n"]
        for r in occ.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * _HH_K > F.lit(n_total))
        .collect()
    }
    assert got == true_hh
    assert all(r["n_shards_flagging"] >= 1 for r in rows)
    assert all(0 < r["share_permil"] <= 1000 for r in rows)


def test_q290_matches_numpy_rank_formula(spark, sf_dir):
    """U and the tie-corrected z recomputed per group from raw rows with
    numpy average ranks (the textbook formulation) match the grid fold."""
    got = {
        r["event_type"]: r
        for r in ALL_QUERIES["q290_mann_whitney_u"](spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir)
    rows = e.select(
        "event_type",
        F.dayofweek("ts").isin(1, 7).cast("int").alias("wk"),
        F.floor(F.col("value") * 1e3).cast("long").alias("x"),
    ).collect()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["wk"], r["x"]))
    for et, data in by_type.items():
        wk = np.array([d[0] for d in data])
        x = np.array([d[1] for d in data], dtype=np.float64)
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sx = x[order]
        i = 0
        pos = 1
        while i < len(sx):
            j = i
            while j < len(sx) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
            pos += j - i
            i = j
        n_a, n_b = int(wk.sum()), int((1 - wk).sum())
        r_a = ranks[wk == 1].sum()
        u_a = r_a - n_a * (n_a + 1) / 2.0
        assert got[et]["n_a"] == n_a and got[et]["n_b"] == n_b
        assert got[et]["u_a_2x"] == int(round(2 * u_a))
        _, counts = np.unique(sx, return_counts=True)
        n = n_a + n_b
        tie3 = float((counts.astype(np.float64) ** 3 - counts).sum())
        var_u = (n_a * n_b / 12.0) * ((n + 1.0) - tie3 / (n * (n - 1.0)))
        if n_a and n_b and var_u > 0:
            z = (u_a - n_a * n_b / 2.0) / np.sqrt(var_u)
            assert abs(got[et]["z_stat"] - z) < 1e-9
        else:
            assert got[et]["z_stat"] == 0.0


def test_q291_schema_matches_q271_and_estimates_sane(spark, sf_dir):
    """The equi-depth audit is head-to-head comparable with q271 (same
    schema, same predicates) and its estimator is exact on a predicate
    that covers the full value range."""
    out = ALL_QUERIES["q291_equidepth_audit"](spark, sf_dir)
    q271 = ALL_QUERIES["q271_selectivity_audit"](spark, sf_dir)
    assert out.schema == q271.schema
    rows = {r["predicate"]: r for r in out.collect()}
    assert set(rows) == {r["predicate"] for r in q271.collect()}
    # the 0-100 predicate spans whole buckets on this fixture; the
    # interpolation error must stay tiny (boundary-bucket mass only)
    r = rows["0-100"]
    assert abs(r["est_rows"] - r["actual_rows"]) <= max(
        r["actual_rows"] // 10, 5
    )
    for r in rows.values():
        assert r["est_rows"] >= 0
        assert r["err_permil"] == abs(
            r["est_rows"] - r["actual_rows"]
        ) * 1000 // max(r["actual_rows"], 1)


def test_generate_filter_not_cloned(spark, sf_dir):
    """InferFiltersFromGenerate is excluded engine-wide: an inner explode
    over an expensive HOF-built array must evaluate the array builder
    EXACTLY ONCE in the physical plan (the inferred size/isnotnull
    filter used to clone it twice more — 13x wall on q239's spans)."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators.corpus import span_hashes
    from etl_globalretail_spark.plans.queries import pin_generate_posture
    from etl_globalretail_spark.sources.readers import load_table

    pin_generate_posture(spark)
    d = load_table(spark, "documents", sf_dir)
    base = d.select("doc_id", span_hashes(F.col("text")).alias("spans"))
    starts = base.select("doc_id", F.posexplode("spans").alias("p0", "h"))
    plan = starts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("transform(") == 1
    # and the exclusion is append-safe: a second pin does not duplicate
    pin_generate_posture(spark)
    rules = spark.conf.get("spark.sql.optimizer.excludedRules")
    assert rules.count("InferFiltersFromGenerate") == 1


def test_q292_semdedup_census_properties(spark, sf_dir):
    """SemDeDup invariants: the cells partition the corpus exactly; a
    cell never prunes more vectors than it has dup pairs; the
    within-cluster pair census is a SUBSET of q33's exact all-pairs
    tier; and the whole protocol is deterministic (bit-equal reruns)."""
    out = {
        r["cell"]: r
        for r in ALL_QUERIES["q292_semdedup_prune"](spark, sf_dir).collect()
    }
    n_total = load_table(spark, "embeddings", sf_dir).count()
    assert sum(r["n_vectors"] for r in out.values()) == n_total
    for r in out.values():
        assert 0 <= r["n_pruned"] <= r["n_dup_pairs"]
        assert r["kept_id_sum"] >= 0
    q33_pairs = ALL_QUERIES["q33_embedding_neardup"](spark, sf_dir).count()
    assert sum(r["n_dup_pairs"] for r in out.values()) <= q33_pairs
    again = {
        r["cell"]: r
        for r in ALL_QUERIES["q292_semdedup_prune"](spark, sf_dir).collect()
    }
    assert {c: tuple(r) for c, r in out.items()} == {
        c: tuple(r) for c, r in again.items()
    }


def test_q293_tile_topk_matches_bruteforce(spark, sf_dir):
    """The block-tile partial top-K merge must equal a driver brute
    force over all wrong-label pairs (same quantized arithmetic) —
    proves no candidate is lost at tile boundaries."""
    out = ALL_QUERIES["q293_hard_negatives"](spark, sf_dir).collect()
    e = load_table(spark, "embeddings", sf_dir).collect()
    ids = np.array([r["vec_id"] for r in e], dtype=np.int64)
    lbl = np.array([r["label"] for r in e], dtype=np.int64)
    X = np.array([r["embedding"] for r in e], dtype=np.float64)
    nrm = np.sqrt(np.floor(X * X * 1e12).sum(axis=1))
    dp = np.zeros((len(ids), len(ids)))
    for d in range(X.shape[1]):
        dp += np.floor(X[:, d, None] * X[None, :, d] * 1e12)
    cos = dp / (nrm[:, None] * nrm[None, :])
    expect = {}
    order_ids = np.argsort(ids)
    for i in range(len(ids)):
        cands = [
            (-cos[i, j], ids[j])
            for j in order_ids
            if lbl[j] != lbl[i]
        ]
        cands.sort()
        expect[int(ids[i])] = [
            (rk + 1, int(b), -negc) for rk, (negc, b) in enumerate(cands[:3])
        ]
    got = {}
    for r in out:
        got.setdefault(r["anchor_id"], []).append(
            (r["rank"], r["neg_id"], r["cos_sim"])
        )
    for a in got:
        got[a].sort()
    assert set(got) == set(expect)
    for a, rows in expect.items():
        assert got[a] == rows, a


def test_q294_dsir_selects_target_like_docs(spark, sf_dir):
    """The DSIR ranking must actually concentrate the target: the top-50
    'en' share strictly exceeds the corpus 'en' share, ranks are a
    1..50 permutation ordered by (adj_ppm desc, doc_id), and the
    normalizer fold is the documented exact integer formula."""
    rows = ALL_QUERIES["q294_dsir_weights"](spark, sf_dir).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )
    ordered = sorted(rows, key=lambda r: (-r["adj_ppm"], r["doc_id"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    top_en = sum(1 for r in rows if r["lang"] == "en")
    assert top_en / len(rows) > n_en / n_docs
    for r in rows:
        assert r["n_tokens"] > 0 and r["raw_ppm"] >= 0
