"""Dedup ladder + similarity search operators on fixtures and sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_globalretail_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_near_duplicates,
    simhash,
    simhash_near_duplicates,
    word_shingles,
)
from etl_globalretail_spark.operators.similarity import (
    ann_lsh_topk,
    cosine,
    cosine_topk,
)
from etl_globalretail_spark.sources.readers import load_table


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a  b   c"),  # same after whitespace normalization
            (3, "different doc"),
        ],
        "doc_id long, text string",
    )
    kept = exact_dedup(df, "text", "doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [1, 3]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
    out = df.select(word_shingles(F.col("text"), 2).alias("s")).collect()
    assert out[0].s == ["a b", "b c", "c d"]
    assert out[1].s == []  # shorter than k → no shingles


def test_jaccard_hand_computed(spark):
    # doc1: shingles {a b, b c}; doc2: {a b, b x} → jaccard = 1/3
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b x")], "doc_id long, text string"
    )
    p = jaccard_pairs(df, "text", "doc_id", k=2, threshold=0.0).collect()
    assert len(p) == 1
    assert p[0].jaccard == pytest.approx(1 / 3)


def test_minhash_recall_vs_exact(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(d, "text", "doc_id", 2, 0.4).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(d, "text", "doc_id").collect()
    }
    assert approx <= exact  # verification step ⇒ no false positives
    assert len(approx & exact) / max(len(exact), 1) >= 0.8  # recall of LSH


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz yyy xxx www")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.s for r in df.select("doc_id", simhash(F.col("text")).alias("s")).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical signature
    assert sigs[1] != sigs[3]
    pairs = simhash_near_duplicates(df, "text", "doc_id", max_hamming=0).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}


def test_cosine_kernel_matches_numpy(spark):
    import numpy as np

    a = [1.0, 2.0, 3.0]
    b = [0.5, -1.0, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    out = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    expect = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert out == pytest.approx(expect, rel=1e-6)


def test_cosine_topk_agrees_with_oracle_form(spark, sf_dir):
    from etl_globalretail_spark.operators.similarity import q27_ann_bruteforce

    e = load_table(spark, "embeddings", sf_dir)
    first = e.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in first["embedding"]]
    fast = cosine_topk(e, qvec, k=10).collect()
    slow = q27_ann_bruteforce(spark, sf_dir).collect()
    assert [r.vec_id for r in fast] == [r.vec_id for r in slow]
    for rf, rs in zip(fast, slow):
        assert rf.cos_sim == pytest.approx(rs.cos_sim, rel=1e-9)


def test_ann_lsh_candidates_are_subset_scored_correctly(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    first = e.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in first["embedding"]]
    approx = ann_lsh_topk(e, qvec, k=10, bits=4).collect()
    assert len(approx) >= 1
    # the query vector itself always lands in its own bucket at rank 1
    assert approx[0].vec_id == first["vec_id"]
    assert approx[0].cos_sim == pytest.approx(1.0, abs=1e-6)


def test_minhash_arrow_matches_jvm(spark, sf_dir):
    """The numpy mapInPandas signature engine is bit-identical to the JVM
    grouped-aggregation twin (same hash family, same mask, same modulus)."""
    from etl_globalretail_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_arrow,
    )

    d = load_table(spark, "documents", sf_dir)
    base = d.select(
        F.col("doc_id").alias("doc"),
        F.transform(
            word_shingles(F.col("text"), 2), lambda s: F.xxhash64(s)
        ).alias("shingles"),
    )
    jvm = {
        r["doc"]: r["sig"]
        for r in minhash_signatures(
            base, "doc", "shingles", 60, pre_hashed=True
        ).collect()
    }
    arrow = {
        r["doc"]: r["sig"]
        for r in minhash_signatures_arrow(base, "doc", "shingles", 60).collect()
    }
    assert jvm == arrow
    assert len(jvm) > 0


def test_fuzzy_pairs_blocked_and_symmetric_free(spark):
    """Distance threshold respected, each unordered pair reported once,
    cross-block pairs never compared."""
    from etl_globalretail_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "smith", 0), (2, "smyth", 0), (3, "smith", 0),
            (4, "smith", 1),            # other block: never pairs with 1-3
            (5, "zzzzz", 0),            # too far from everything
        ],
        "id long, name string, blk int",
    )
    pairs = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_pairs(df, "id", "name", ["blk"], 2).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 0, (2, 3): 1}


def test_contamination_removal_is_clean(spark, sf_dir):
    """Anti-joining the flagged ids leaves a corpus with NO doc sharing
    >= min_shared shingles with the benchmark (re-audit finds nothing),
    and the benchmark slice itself is 100% self-contaminated."""
    from etl_globalretail_spark.operators.dedup import contamination_audit
    from etl_globalretail_spark.sources.readers import load_table

    d = load_table(spark, "documents", sf_dir)
    bench = d.filter(F.col("doc_id") % 17 == 0)
    corpus = d.filter(F.col("doc_id") % 17 != 0)
    flagged = contamination_audit(corpus, bench, "doc_id", "text")
    clean = corpus.join(flagged.select("doc_id"), "doc_id", "left_anti")
    assert contamination_audit(clean, bench, "doc_id", "text").count() == 0

    # every benchmark doc trivially matches itself past the threshold
    self_hits = contamination_audit(bench, bench, "doc_id", "text")
    long_enough = bench.filter(F.size(F.split(F.trim("text"), r"\s+")) > 5)
    assert self_hits.count() == long_enough.count()


def test_ann_recall_audit_consistent(spark, sf_dir):
    """q120's n_common equals the independently-computed intersection of
    the two top-k id sets, and recall is its k-normalized value."""
    from etl_globalretail_spark.operators.similarity import QUERIES as SQ

    bf = {r.vec_id for r in SQ["q27_ann_bruteforce"](spark, sf_dir).collect()}
    lsh = {r.vec_id for r in SQ["q82_ann_lsh_exact"](spark, sf_dir).collect()}
    row = SQ["q120_ann_recall"](spark, sf_dir).collect()[0]
    assert row.n_common == len(bf & lsh)
    assert row.recall_at_k == row.n_common / row.k
    assert 0 <= row.n_common <= row.k == 10


def test_ann_ivf_exact_subset_and_rank_contract(spark, sf_dir):
    """q123's results come only from the probed cells, ranks are 1..k
    dense, and every returned similarity is ≤ the brute-force best."""
    from etl_globalretail_spark.operators.similarity import QUERIES as SQ

    rows = SQ["q123_ann_ivf_exact"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(-1.001 <= r.cos_sim <= 1.001 for r in rows)
    bf = SQ["q27_ann_bruteforce"](spark, sf_dir).collect()
    # approximate tier can never beat the exact best (the self-match);
    # whether it CONTAINS the self-match depends on the probed cells —
    # labels are class ids, not geometric cells, so no containment claim.
    assert rows[0].cos_sim <= bf[0].cos_sim + 1e-12


def test_incremental_neardup_cross_side_only(spark, sf_dir):
    """q132 pairs always have a batch-side (id % 10 == 0) left id and an
    index-side right id, and the pair set equals q66's full pair set
    restricted to cross-side pairs (incrementality loses nothing that
    crosses the boundary)."""
    from etl_globalretail_spark.operators.dedup import QUERIES as DQ

    inc = DQ["q132_incremental_neardup"](spark, sf_dir).collect()
    assert all(r.id_new % 10 == 0 and r.id_index % 10 != 0 for r in inc)
    full = DQ["q66_minhash_pairs_exact"](spark, sf_dir).collect()
    cross = {
        (a, b)
        for r in full
        for a, b in [(r.id_a, r.id_b), (r.id_b, r.id_a)]
        if a % 10 == 0 and b % 10 != 0
    }
    assert {(r.id_new, r.id_index) for r in inc} == cross


def test_int8_quantization_errors_match_python_recompute(spark, sf_dir):
    """quantize_int8_errors ≡ a driver-side integer replay on the real
    fixture, and every error is within one quantization cell (2g/255 + 1)."""
    from etl_globalretail_spark.operators.similarity import quantize_int8_errors
    from etl_globalretail_spark.sources.readers import load_table

    import math

    e = load_table(spark, "embeddings", sf_dir)
    rows = e.collect()
    expected = {}
    bounds = {}
    for r in rows:
        vq = [math.floor(float(v) * 1e6) for v in r["embedding"]]
        g = max(max((abs(x) for x in vq), default=0), 1)
        errs = []
        for x in vq:
            u = x + g
            qu = (u * 255) // (2 * g)
            deq = ((2 * qu + 1) * g) // 255
            errs.append(abs(u - deq))
        expected[r["vec_id"]] = sorted(errs)
        bounds[r["vec_id"]] = 2 * g // 255 + 1

    out = quantize_int8_errors(e).collect()
    per_vec = {}
    for r in out:
        per_vec.setdefault(r["vec_id"], []).append(r["err"])
    assert set(per_vec) == set(expected)
    for vid, errs in per_vec.items():
        assert sorted(errs) == expected[vid], vid
        assert max(errs) <= bounds[vid], (vid, max(errs), bounds[vid])


def test_embedding_neardup_arrow_matches_fold(spark, sf_dir):
    """The numpy mapInPandas engine and the zip_with fold produce the
    IDENTICAL pair set with bit-equal cosines (same floor-quantized
    arithmetic, float64-exact accumulation)."""
    from etl_globalretail_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from etl_globalretail_spark.sources.readers import load_table

    e = load_table(spark, "embeddings", sf_dir)
    fold = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_near_duplicates(e, arrow=False).collect()
    )
    arrow = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_near_duplicates(e, engine="_crosscheck").collect()
    )
    assert fold == arrow and len(fold) > 0


def test_embedding_neardup_blocked_matches_arrow(spark, sf_dir):
    """The co-partitioned block-pair engine (no driver-resident side, the
    100 TB path and the q33 default) is bit-identical to the
    driver-resident arrow kernel — same pairs, same cosine bits — at
    several block counts, including B larger than the id range's spread."""
    from etl_globalretail_spark.operators.similarity import (
        _neardup_pairs_blocked,
        _NEARDUP_TAU,
        embedding_near_duplicates,
    )
    from etl_globalretail_spark.sources.readers import load_table

    e = load_table(spark, "embeddings", sf_dir)
    arrow = sorted(
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_near_duplicates(e, engine="_crosscheck").collect()
    )
    for n_blocks in (1, 3, 8):
        blocked = sorted(
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in _neardup_pairs_blocked(
                e, "embedding", "vec_id", _NEARDUP_TAU, n_blocks=n_blocks
            ).collect()
        )
        assert blocked == arrow, n_blocks
    assert len(arrow) > 0


def test_embedding_neardup_default_is_blocked_no_collect(spark, sf_dir):
    """q33's default engine returns a lazy cogroup plan (FlatMapCoGroups),
    not a driver-collected local relation."""
    from etl_globalretail_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from etl_globalretail_spark.sources.readers import load_table

    e = load_table(spark, "embeddings", sf_dir)
    df = embedding_near_duplicates(e)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "FlatMapCoGroupsInPandas" in plan


def test_prefix_filter_join_exact_and_cheaper(spark, sf_dir):
    """Prefix filtering loses no pair vs the full inverted index at the
    same threshold and posts strictly fewer index entries."""
    from etl_globalretail_spark.operators.dedup import (
        _MASK32,
        _md5_hash64,
        prefix_filtered_pairs,
        word_shingles,
    )

    d = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 3 == 0)
    verified, base = prefix_filtered_pairs(d, "text", "doc_id", pct=35)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}

    # brute force on the same md5 shingle sets, driver-side
    hs_rows = base.collect()
    sets = {r["doc"]: set(r["hs"]) for r in hs_rows}
    want = {}
    ids = sorted(sets)
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            inter = len(sets[x] & sets[y])
            union = len(sets[x]) + len(sets[y]) - inter
            if union and 100 * inter >= 35 * union:
                want[(x, y)] = inter / union
    base.unpersist()
    assert got == want and len(got) > 0

    # the efficiency claim: prefix postings < full postings
    full = sum(len(s) for s in sets.values())
    prefix = sum(len(s) - (35 * len(s) + 99) // 100 + 1 for s in sets.values())
    assert prefix < 0.75 * full


def test_embedding_dim_stats_match_numpy(spark, sf_dir):
    """q159's per-dimension mean/variance agree with numpy on the quantized
    values (population variance)."""
    import numpy as np

    from etl_globalretail_spark.operators.similarity import (
        q159_embedding_dim_stats,
    )

    got = {r["pos"]: r for r in q159_embedding_dim_stats(spark, sf_dir).collect()}
    e = load_table(spark, "embeddings", sf_dir).collect()
    mat = np.floor(
        np.array([r["embedding"] for r in e], dtype=np.float64) * 1e6
    )
    for d in range(mat.shape[1]):
        col = mat[:, d]
        r = got[d + 1]
        assert r["n"] == len(col)
        assert abs(r["mean"] - col.mean() / 1e6) < 1e-9
        assert abs(r["variance"] - col.var() / 1e12) < 1e-6


def test_dedup_tier_overlap_sanity(spark, sf_dir):
    """Set algebra holds: every intersection ≤ its operands, the union
    equals inclusion-exclusion, and exact-dups are a subset of
    normalized-dups (normalization only merges MORE)."""
    from etl_globalretail_spark.operators.dedup import q178_dedup_tier_overlap

    r = q178_dedup_tier_overlap(spark, sf_dir).collect()[0]
    assert r["exact_and_norm"] <= min(r["n_exact"], r["n_norm"])
    assert r["all_three"] <= min(
        r["exact_and_norm"], r["exact_and_minhash"], r["norm_and_minhash"]
    )
    ie = (
        r["n_exact"] + r["n_norm"] + r["n_minhash"]
        - r["exact_and_norm"] - r["exact_and_minhash"] - r["norm_and_minhash"]
        + r["all_three"]
    )
    assert r["any_tier"] == ie
    # identical token streams ⇒ identical normalized text ⇒ E ⊆ N
    assert r["exact_and_norm"] == r["n_exact"]


def test_jaccard_prefix_plan_matches_brute_force(spark, sf_dir):
    """The round-3 prefix-filter jaccard_pairs plan is LOSSLESS: its pair
    set, intersection counts, and jaccard values equal the naive
    full-posting inverted-index join recomputed here, and the prefix
    index posts strictly fewer entries than the full index."""
    from etl_globalretail_spark.operators.dedup import hashed_word_shingles

    d = load_table(spark, "documents", sf_dir)
    got = {
        (r.id_a, r.id_b): (r.n_a, r.n_b, r.n_common, r.jaccard)
        for r in jaccard_pairs(d, "text", "doc_id", 2, 0.4).collect()
    }
    # naive reference: full posting join + group-count (the old plan)
    sh = d.select(
        F.col("doc_id").alias("doc"),
        F.size(hashed_word_shingles(F.col("text"), 2)).alias("n"),
        F.explode(hashed_word_shingles(F.col("text"), 2)).alias("h"),
    )
    a = sh.select(F.col("doc").alias("id_a"), F.col("n").alias("n_a"), "h")
    b = sh.select(F.col("doc").alias("id_b"), F.col("n").alias("n_b"), "h")
    ref = {}
    rows = (
        a.join(b, ["h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    for r in rows:
        j = r.c / (r.n_a + r.n_b - r.c)
        if j >= 0.4:
            ref[(r.id_a, r.id_b)] = (r.n_a, r.n_b, r.c, j)
    assert set(got) == set(ref)
    for k, (n_a, n_b, c, j) in ref.items():
        gn_a, gn_b, gc, gj = got[k]
        assert (gn_a, gn_b, gc) == (n_a, n_b, c)
        assert gj == pytest.approx(j, abs=0)
    # economy: the prefix index is strictly smaller than the full index
    full_postings = sh.count()
    pct = 40
    plen = (
        F.size("hs") - F.expr(f"({pct} * size(hs) + 99) div 100") + 1
    )
    prefix_postings = (
        d.select(
            F.array_sort(hashed_word_shingles(F.col("text"), 2)).alias("hs")
        )
        .filter(F.size("hs") > 0)
        .select(F.explode(F.slice("hs", 1, plen)))
        .count()
    )
    assert prefix_postings < full_postings
