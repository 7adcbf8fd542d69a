"""Unit tests for operators/corpus.py — corpus-curation statistics.

Micro-fixtures with hand-computed expectations; the differential oracle
(scripts/check_oracle.py) covers the full-table behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.corpus import (
    normalized_text_key,
    q88_weighted_sample,
    q89_rarity_bands,
    q90_repetition_filter,
    q91_event_outliers,
    q92_tfidf_terms,
    rarity_bands,
    repetition_stats,
    tfidf_top_terms,
    weighted_sample,
    zscore_outliers,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_certain_inclusion_at_cap(spark):
    """weight × rate ≥ n_buckets ⇒ probability 1 ⇒ row always kept."""
    d = _docs(spark, [(i, "x", "en", "s", 999_999) for i in range(50)])
    kept = weighted_sample(d, "doc_id", "n_chars", 200)
    assert kept.count() == 50


def test_weighted_sample_zero_weight_excluded(spark):
    d = _docs(spark, [(i, "x", "en", "s", 0) for i in range(50)])
    assert weighted_sample(d, "doc_id", "n_chars", 200).count() == 0


def test_weighted_sample_monotone_in_rate(spark):
    """Higher rate ⇒ superset: thresholds only move up under one salt."""
    d = _docs(spark, [(i, "x", "en", "s", 1500 + 7 * i) for i in range(400)])
    lo = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 100).collect()}
    hi = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 300).collect()}
    assert lo <= hi
    assert len(lo) < len(hi) < 400


def test_weighted_sample_deterministic(spark):
    d = _docs(spark, [(i, "x", "en", "s", 2000) for i in range(300)])
    a = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 150).collect()}
    b = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 150).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# rarity_bands
# ---------------------------------------------------------------------------


def test_rarity_bands_uniform_corpus_is_band_zero(spark):
    """Every token equally frequent ⇒ rarity 0 everywhere ⇒ band 0."""
    d = _docs(
        spark,
        [(1, "aa bb", "en", "s", 5), (2, "bb aa", "en", "s", 5)],
    )
    rows = rarity_bands(d).collect()
    assert {r.band for r in rows} == {0}
    assert {r.n_tokens for r in rows} == {2}


def test_rarity_bands_rare_token_scores_higher(spark):
    """doc2 holds a hapax among frequent tokens ⇒ strictly higher band."""
    common = "the " * 15 + "the"  # 16 occurrences of 'the'
    d = _docs(
        spark,
        [(1, common, "en", "s", 1), (2, "the zyzzyva", "en", "s", 1)],
    )
    got = {r.doc: r.band for r in rarity_bands(d).collect()}
    # vocab: the=17 (bitlen 5), zyzzyva=1 (bitlen 1); rarity: the=0, zyz=4
    assert got[1] == 0
    assert got[2] == (0 + 4) * 10 // 2  # = 20


def test_rarity_bands_skips_tokenless_docs(spark):
    d = _docs(spark, [(1, "hello world", "en", "s", 1), (2, "123 456", "en", "s", 1)])
    assert {r.doc for r in rarity_bands(d).collect()} == {1}


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_all_same_bigram_is_1000_permil(spark):
    d = _docs(spark, [(1, "a a a a a", "en", "s", 9)])
    r = repetition_stats(d).collect()[0]
    assert r.n_grams == 4 and r.max_cnt == 4 and r.rep_permil == 1000


def test_repetition_all_distinct_bigrams(spark):
    d = _docs(spark, [(1, "a b c d e", "en", "s", 9)])
    r = repetition_stats(d).collect()[0]
    assert r.n_grams == 4 and r.max_cnt == 1 and r.rep_permil == 250


def test_repetition_known_max_run(spark):
    # bigrams: 'x y','y x','x y','y z' → top 'x y' ×2 of 4 → 500 permil
    d = _docs(spark, [(1, "x y x y z", "en", "s", 9)])
    r = repetition_stats(d).collect()[0]
    assert r.max_cnt == 2 and r.rep_permil == 500


def test_repetition_short_docs_unscored(spark):
    d = _docs(spark, [(1, "single", "en", "s", 6), (2, "", "en", "s", 0)])
    assert repetition_stats(d).count() == 0


def test_repetition_scoring_is_shuffle_free(spark):
    """The scoring pass must not shuffle: no Exchange below the audit agg."""
    d = _docs(spark, [(1, "a b a b", "en", "s", 7)])
    plan = repetition_stats(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# zscore_outliers
# ---------------------------------------------------------------------------


def test_zscore_flags_planted_outlier(spark):
    rows = [(i, "a", 10.0) for i in range(20)] + [(99, "a", 10_000.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r.id: r.is_outlier for r in zscore_outliers(df, "g", "v").collect()}
    assert got[99] is True
    assert sum(got.values()) == 1


def test_zscore_constant_group_flags_nothing(spark):
    df = spark.createDataFrame(
        [(i, "a", 5.0) for i in range(10)], "id long, g string, v double"
    )
    assert not any(r.is_outlier for r in zscore_outliers(df, "g", "v").collect())


def test_zscore_groups_are_independent(spark):
    rows = (
        [(i, "a", 10.0) for i in range(20)]
        + [(50, "a", 500.0)]
        + [(100 + i, "b", 500.0) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v double")
    flagged = {r.id for r in zscore_outliers(df, "g", "v").collect() if r.is_outlier}
    assert flagged == {50}  # 500.0 is normal in group b, anomalous in a


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


def test_tfidf_distinctive_term_outranks_stopword(spark):
    d = _docs(
        spark,
        [
            (1, "the cat the cat", "en", "s", 1),
            (2, "the chat the chat", "fr", "s", 1),
            (3, "the cat sat", "en", "s", 1),
        ],
    )
    top = tfidf_top_terms(d, top_k=1).collect()
    by_lang = {r.lang: r.term for r in top}
    # 'the' appears in every doc (df=3) → idf 1; 'cat'/'chat' concentrate.
    assert by_lang == {"en": "cat", "fr": "chat"}


def test_tfidf_rank_deterministic_tie_break(spark):
    d = _docs(spark, [(1, "aa bb", "en", "s", 1), (2, "aa bb", "en", "s", 1)])
    rows = tfidf_top_terms(d, top_k=2).orderBy("rank").collect()
    # identical scores → lexicographic term order
    assert [r.term for r in rows] == ["aa", "bb"]


# ---------------------------------------------------------------------------
# normalized_text_key
# ---------------------------------------------------------------------------


def test_normalized_key_ignores_formatting(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO ... WORLD")],
        "id long, text string",
    )
    ks = df.select(normalized_text_key(F.col("text")).alias("k")).collect()
    assert len({r.k for r in ks}) == 1


def test_normalized_key_distinguishes_content(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello there")], "id long, text string"
    )
    ks = df.select(normalized_text_key(F.col("text")).alias("k")).collect()
    assert len({r.k for r in ks}) == 2


# ---------------------------------------------------------------------------
# registered queries run end-to-end on the sf0.001 fixture
# ---------------------------------------------------------------------------


def test_registered_corpus_queries_run(spark, sf_dir):
    for q in (
        q88_weighted_sample,
        q89_rarity_bands,
        q90_repetition_filter,
        q91_event_outliers,
        q92_tfidf_terms,
    ):
        assert q(spark, sf_dir).count() > 0


def test_temperature_mixture_smooths_toward_uniform(spark, sf_dir):
    """α=0.5 rebalancing: expected kept ∝ √n, so the kept-share of a
    2× larger source is < 2× (smoothing), every threshold is a valid
    bucket cut, and kept sets are subsets of their source."""
    from etl_globalretail_spark.operators.corpus import (
        QUERIES as CQ,
        _Q126_BUDGET,
    )
    from etl_globalretail_spark.operators.sampling import N_BUCKETS

    rows = CQ["q126_temperature_mixture"](spark, sf_dir).collect()
    assert all(0 <= r.thr <= N_BUCKETS for r in rows)
    assert all(0 <= r.n_kept <= r.n_docs for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    # expected budget holds loosely (hash noise): within ±50%
    assert 0.5 * _Q126_BUDGET <= total_kept <= 1.5 * _Q126_BUDGET or all(
        r.thr == N_BUCKETS for r in rows
    )
    # smoothing: keep-RATE decreases with source size (monotone thr)
    by_n = sorted(rows, key=lambda r: r.n_docs)
    for small, big in zip(by_n, by_n[1:]):
        if small.n_docs < big.n_docs:
            assert small.thr >= big.thr


# ---------------------------------------------------------------------------
# dup_span_stats / span_hashes (q139)
# ---------------------------------------------------------------------------


def test_dup_span_verbatim_copy_fully_flagged(spark):
    """Two identical 6-word docs: every span of each is duplicated
    (dup_permil = 1000); an unrelated doc stays at 0."""
    from etl_globalretail_spark.operators.corpus import dup_span_stats

    t = "a b c d e f"
    d = _docs(spark, [(1, t, "en", "s", 11), (2, t, "en", "s", 11),
                      (3, "p q r s t u v", "en", "s", 13)])
    rows = {r["doc_id"]: r for r in dup_span_stats(d, "doc_id", "text").collect()}
    assert rows[1]["n_spans"] == 2 and rows[1]["dup_permil"] == 1000
    assert rows[2]["dup_permil"] == 1000
    assert rows[3]["n_spans"] == 3 and rows[3]["dup_spans"] == 0


def test_dup_span_partial_overlap_counts_positions(spark):
    """Doc 1 shares exactly its first 5-word span with doc 2; with 7 words it
    has 3 spans, 1 duplicated → 333 permil (integer floor)."""
    from etl_globalretail_spark.operators.corpus import dup_span_stats

    d = _docs(spark, [
        (1, "a b c d e x y", "en", "s", 13),
        (2, "z z a b c d e", "en", "s", 13),
    ])
    rows = {r["doc_id"]: r for r in dup_span_stats(d, "doc_id", "text").collect()}
    assert rows[1]["n_spans"] == 3 and rows[1]["dup_spans"] == 1
    assert rows[1]["dup_permil"] == 333


def test_dup_span_short_docs_zero_not_dropped(spark):
    """Docs under k words have no spans but still appear with zeros."""
    from etl_globalretail_spark.operators.corpus import dup_span_stats

    d = _docs(spark, [(1, "a b", "en", "s", 3), (2, "a b", "en", "s", 3)])
    rows = dup_span_stats(d, "doc_id", "text").collect()
    assert len(rows) == 2
    assert all(r["n_spans"] == 0 and r["dup_permil"] == 0 for r in rows)


def test_dup_span_self_repeat_is_not_duplication(spark):
    """A span repeated WITHIN one document is not cross-document duplication
    (min == max over the hash partition)."""
    from etl_globalretail_spark.operators.corpus import dup_span_stats

    d = _docs(spark, [(1, "a b c d e a b c d e", "en", "s", 19),
                      (2, "u v w x y z u v", "en", "s", 15)])
    rows = {r["doc_id"]: r for r in dup_span_stats(d, "doc_id", "text").collect()}
    assert rows[1]["dup_spans"] == 0 and rows[2]["dup_spans"] == 0


# ---------------------------------------------------------------------------
# adjacent_char_pairs (q140)
# ---------------------------------------------------------------------------


def test_adjacent_pairs_overlapping_positional(spark):
    from etl_globalretail_spark.operators.corpus import adjacent_char_pairs

    df = spark.createDataFrame([("abca",), ("x",), ("",)], "w string")
    got = df.select(adjacent_char_pairs(F.col("w")).alias("p")).collect()
    assert sorted(got[0]["p"]) == ["ab", "bc", "ca"]
    assert got[1]["p"] == [] and got[2]["p"] == []


def test_bpe_top_pair_is_corpus_argmax(spark, sf_dir):
    """rank-1 pair of q140 really is the most frequent adjacent pair —
    recounted driver-side from the raw text."""
    from collections import Counter

    from etl_globalretail_spark.operators.corpus import q140_bpe_pair_counts
    from etl_globalretail_spark.sources.readers import load_table

    top = q140_bpe_pair_counts(spark, sf_dir).orderBy("rank").first()
    texts = [r["text"] for r in load_table(spark, "documents", sf_dir).collect()]
    c = Counter()
    for t in texts:
        for w in t.strip().split():
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (top["pair"], top["cnt"]) == best


# ---------------------------------------------------------------------------
# mad_outlier_census (q146)
# ---------------------------------------------------------------------------


def test_mad_census_hand_computed(spark):
    """Group [1..7, 100]: lower median 4, deviations {3,2,1,0,1,2,3,96},
    MAD = lower-median(sorted devs)= 2, outliers = |v-4| > 6 → only 100."""
    from etl_globalretail_spark.operators.corpus import mad_outlier_census

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outlier_census(df, "g", "v").collect()[0]
    assert out["median"] == 4.0
    assert out["mad"] == 2.0
    assert out["n_rows"] == 8 and out["n_outliers"] == 1


def test_mad_census_robust_where_zscore_is_not(spark):
    """A 50%-contaminated-free group with one extreme value: MAD flags it;
    the z-score gate (k=3) does NOT because the outlier inflates sigma —
    the robustness claim, demonstrated."""
    from etl_globalretail_spark.operators.corpus import (
        mad_outlier_census,
        zscore_outliers,
    )

    rows = [("a", float(v)) for v in range(1, 30)] + [("a", 10000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    mad = mad_outlier_census(df, "g", "v").collect()[0]
    assert mad["n_outliers"] == 1
    z = zscore_outliers(df, "g", "v").filter("is_outlier").count()
    assert z == 1  # z-score still catches THE extreme one...
    rows2 = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0), ("a", -1000.0)]
    df2 = spark.createDataFrame(rows2, "g string, v double")
    # ...but with two opposing extremes sigma explodes and z misses both
    z2 = zscore_outliers(df2, "g", "v").filter("is_outlier").count()
    mad2 = mad_outlier_census(df2, "g", "v").collect()[0]
    assert mad2["n_outliers"] == 2 and z2 == 0


def test_mad_census_groups_independent(spark):
    from etl_globalretail_spark.operators.corpus import mad_outlier_census

    rows = [("a", float(v)) for v in [1, 2, 3, 50]] + [
        ("b", float(v)) for v in [100, 200, 300, 400]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mad_outlier_census(df, "g", "v").collect()}
    assert out["a"]["median"] == 2.0 and out["b"]["median"] == 200.0
    assert out["a"]["n_outliers"] == 1 and out["b"]["n_outliers"] == 0


def test_weighted_median_udaf_hand_case(spark):
    """Weighted lower median: values 1..4 with weights (1,1,1,10) → 4
    dominates; with uniform weights → lower median 2."""
    from etl_globalretail_spark.operators.corpus import weighted_median_udf

    wm = weighted_median_udf()
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 10)], "v double, wt long"
    )
    assert df.agg(wm(F.col("v"), F.col("wt"))).collect()[0][0] == 4.0
    df2 = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1)], "v double, wt long"
    )
    assert df2.agg(wm(F.col("v"), F.col("wt"))).collect()[0][0] == 2.0


def test_winsorize_census_hand_case(spark):
    """Values 1..100 in one group: p05 bound = 5, p95 = 95; 4 low + 5 high
    clipped; winsorized sum replaces them with the bounds."""
    from etl_globalretail_spark.operators.corpus import winsorize_census

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "g string, v double"
    )
    r = winsorize_census(df, "g", "v").collect()[0]
    assert (r["lo_bound"], r["hi_bound"]) == (5.0, 95.0)
    assert (r["n_clip_lo"], r["n_clip_hi"]) == (4, 5)
    raw = sum(range(1, 101))
    wins = sum(max(5, min(95, v)) for v in range(1, 101))
    assert r["raw_sum"] == float(raw) and r["wins_sum"] == float(wins)


def test_feature_hashing_deterministic_and_zero_mean_shape(spark):
    """Same value → same slot/sign everywhere; signed sums stay within the
    raw counts; slots land in [0, dim)."""
    import hashlib

    from etl_globalretail_spark.operators.corpus import _FH_DIM, _fh_slot_sign

    df = spark.createDataFrame(
        [("click",), ("view",), ("click",)], "event_type string"
    )
    slot, sign = _fh_slot_sign("event_type", _FH_DIM)
    got = df.select(slot.alias("s"), sign.alias("g")).collect()
    # driver-side replay of the recipe
    def replay(v):
        h = int(hashlib.md5(f"event_type={v}".encode()).hexdigest()[:15], 16)
        return h % _FH_DIM, 1 if (h // _FH_DIM) % 2 == 0 else -1

    assert (got[0]["s"], got[0]["g"]) == replay("click")
    assert (got[1]["s"], got[1]["g"]) == replay("view")
    assert got[0]["s"] == got[2]["s"] and got[0]["g"] == got[2]["g"]
    assert all(0 <= r["s"] < _FH_DIM and r["g"] in (1, -1) for r in got)


def test_impute_group_median_hand_case(spark):
    """NULLs get their group's lower median; non-nulls untouched; groups
    independent."""
    from etl_globalretail_spark.operators.corpus import impute_group_median

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
         ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    out = impute_group_median(df, "g", "v").collect()
    a_vals = sorted(r["v"] for r in out if r["g"] == "a")
    b_vals = sorted(r["v"] for r in out if r["g"] == "b")
    assert a_vals == [1.0, 2.0, 2.0, 3.0]   # NULL → lower median 2
    assert b_vals == [10.0, 10.0]


def test_histogram_drift_bounds(spark):
    """Identical distributions → L1 = 0; disjoint supports → L1 = 2."""
    from etl_globalretail_spark.operators.corpus import histogram_drift

    same = spark.createDataFrame(
        [("a", v) for v in (10, 110, 210)] + [("b", v) for v in (10, 110, 210)],
        "s string, v long",
    )
    r = histogram_drift(same, "s", "a", "b", "v", 100).collect()
    assert all(row["l1_distance"] == 0.0 for row in r)

    disjoint = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 500), ("b", 600)], "s string, v long"
    )
    r2 = histogram_drift(disjoint, "s", "a", "b", "v", 100).collect()
    assert all(abs(row["l1_distance"] - 2.0) < 1e-12 for row in r2)


def test_ks_statistic_matches_scipy_free_recompute(spark):
    """KS on a hand case equals the classical max-ECDF-gap computed
    driver-side (ties handled by full-mass-at-value)."""
    from etl_globalretail_spark.operators.corpus import ks_statistic

    a_vals = [1, 2, 2, 3, 10]
    b_vals = [2, 3, 3, 4]
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "s string, v long")
    r = ks_statistic(df, "s", "a", "b", "v").collect()[0]

    support = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    best = 0
    for t in support:
        ca = sum(1 for v in a_vals if v <= t)
        cb = sum(1 for v in b_vals if v <= t)
        best = max(best, abs(ca * nb - cb * na))
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["ks_numerator"] == best
    assert abs(r["ks"] - best / (na * nb)) < 1e-15


def test_ks_zero_for_identical_samples(spark):
    from etl_globalretail_spark.operators.corpus import ks_statistic

    rows = [("a", v) for v in (1, 5, 9)] + [("b", v) for v in (1, 5, 9)]
    df = spark.createDataFrame(rows, "s string, v long")
    assert ks_statistic(df, "s", "a", "b", "v").collect()[0]["ks"] == 0.0
