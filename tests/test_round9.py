"""Round-9 additions: the deterministic epoch shuffle's permutation laws
(q364, VERDICT r8 item 4). The shuffle must be a seeded bijection over
the example set, reproducible bit-for-bit, and shard-interleaved —
each law checked on a synthetic example table whose shard sizes are
deliberately UNEQUAL so the round-robin merge's degrade path (cycling
only still-alive shards) is exercised."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.corpus import epoch_shuffle

N_SHARDS = 4


def _examples(spark, n=103):
    # n NOT divisible by n_shards → unequal shard sizes (27/26/25/25)
    return spark.range(0, n).select(
        F.col("id").alias("chunk"),
        (F.col("id") * 7 % 5).alias("docs_in_chunk"),
    )


def _run(spark, seed, n=103):
    rows = epoch_shuffle(_examples(spark, n), seed, N_SHARDS).collect()
    return sorted(
        (r["epoch_pos"], r["chunk"], r["shard"], r["shard_pos"])
        for r in rows
    )


def test_same_seed_bitwise_reproducible(spark):
    assert _run(spark, "s1") == _run(spark, "s1")


def test_epoch_pos_is_bijection(spark):
    rows = _run(spark, "s1")
    assert [r[0] for r in rows] == list(range(1, 104))
    assert sorted(r[1] for r in rows) == list(range(103))


def test_cross_seed_same_multiset_different_order(spark):
    a, b = _run(spark, "s1"), _run(spark, "s2")
    # same example→shard assignment (layout is seed-independent) …
    assert sorted((c, s) for _, c, s, _ in a) == sorted(
        (c, s) for _, c, s, _ in b
    )
    # … but the order is a DIFFERENT permutation
    pos_a = {c: p for p, c, _, _ in a}
    pos_b = {c: p for p, c, _, _ in b}
    assert any(pos_a[c] != pos_b[c] for c in pos_a)


def test_round_robin_interleaves_shards(spark):
    rows = sorted(_run(spark, "s1"))  # by epoch_pos
    # While all shards are alive, each consecutive block of N_SHARDS
    # positions covers all N_SHARDS shards exactly once; the smallest
    # shard here has 25 elements, so the first 25 blocks are full.
    for blk in range(25):
        shards = {rows[blk * N_SHARDS + i][2] for i in range(N_SHARDS)}
        assert shards == set(range(N_SHARDS)), f"block {blk}: {shards}"
    # Within a shard, epoch order preserves the shard-internal order.
    by_shard: dict[int, list[int]] = {}
    for _, _, s, sp in rows:
        by_shard.setdefault(s, []).append(sp)
    for s, sps in by_shard.items():
        assert sps == sorted(sps), f"shard {s} not order-preserving"


def test_louvain_convergence_fixpoint_laws(spark):
    """q365 terminates (converged flag set inside the K-bound), Q is
    monotone over the loop, and the levels compose: its starting audit
    equals q319's post-contraction audit exactly."""
    from etl_globalretail_spark.plans.analytics import QUERIES as AQ

    sf = "/root/testdata/sf0.001"
    out = AQ["q365_louvain_converged"](spark, sf).collect()[0]
    assert out["converged"] == 1  # fixpoint reached inside the bound
    assert out["n_active_rounds"] < out["n_rounds_max"]
    assert out["q_final_millionths"] >= out["q_initial_millionths"]
    q319 = AQ["q319_louvain_contract"](spark, sf).collect()[0]
    assert out["q_initial_millionths"] == q319["q_after_millionths"]
    assert out["n_comm_initial"] == q319["n_comm_after"]


def test_harmonic_packing_recompute_and_laws(spark):
    """q367: pure-Python harmonic-class recompute matches the frame
    exactly; harmonic bins can never beat the fractional lower bound;
    packable + oversize conserves the corpus."""
    from etl_globalretail_spark.operators.corpus import QUERIES as CQ
    from etl_globalretail_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    L = 512
    out = CQ["q367_harmonic_packing"](spark, sf).collect()[0]
    lens = [
        r["t"] for r in load_table(spark, "documents", sf)
        .select(F.size(F.split(F.trim(F.col("text")), r"\s+"))
                .alias("t")).collect()
    ]
    packable = [t for t in lens if t <= L]
    hist: dict[int, int] = {}
    for t in packable:
        hist[t] = hist.get(t, 0) + 1
    bins = sum(-(-n // (L // t)) for t, n in hist.items())
    assert out["n_packable"] == len(packable)
    assert out["n_oversize"] == len(lens) - len(packable)
    assert out["n_classes"] == len(hist)
    assert out["packable_tokens"] == sum(packable)
    assert out["harmonic_bins"] == bins
    assert out["lp_lower_bound"] == -(-sum(packable) // L)
    assert out["harmonic_bins"] >= out["lp_lower_bound"]
    assert out["waste_tokens"] == bins * L - sum(packable) >= 0


def test_dp_release_mechanism_recompute(spark):
    """q368: the noise draw is a pure function of the release key —
    recomputed here from md5 in Python bit-for-bit — and the release
    is exactly true + noise."""
    import hashlib

    from etl_globalretail_spark.operators.quality import QUERIES as QQ

    out = QQ["q368_dp_count_release"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 5  # the five market segments
    for r in out:
        u = int(
            hashlib.md5(f"dp9:{r['c_mktsegment']}".encode())
            .hexdigest()[:13], 16,
        )
        sign = 1 if u % 2 == 0 else -1
        v = u // 2
        mag = 51 if v == 0 else ((v & -v).bit_length() - 1)
        assert r["noise"] == sign * mag
        assert r["n_released"] == r["n_true"] + r["noise"]
        assert r["abs_err"] == abs(r["noise"])


def test_consistent_rebalance_minimal_movement(spark):
    """q369: the minimal-movement law — on an 8 → 10 ring resize,
    examples are GAINED only by the two added shards; surviving shards
    only lose; totals conserve; and the census matches a pure-Python
    ring recompute."""
    import hashlib

    from etl_globalretail_spark.operators.corpus import QUERIES as CQ
    from etl_globalretail_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    rows = {r["shard"]: r for r in
            CQ["q369_consistent_shard_rebalance"](spark, sf).collect()}
    assert sorted(rows) == list(range(10))
    # gained only by the added shards 8 and 9
    for s in range(8):
        assert rows[s]["gained"] == 0, f"shard {s} gained"
        assert rows[s]["n_before"] >= rows[s]["n_after"]
    for s in (8, 9):
        assert rows[s]["n_before"] == 0 and rows[s]["lost"] == 0
    # conservation: total before == total after == corpus size;
    # total lost == total gained
    n = load_table(spark, "documents", sf).count()
    assert sum(r["n_before"] for r in rows.values()) == n
    assert sum(r["n_after"] for r in rows.values()) == n
    assert (sum(r["lost"] for r in rows.values())
            == sum(r["gained"] for r in rows.values()))

    # pure-Python ring recompute
    mod = 1 << 52

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    def owner(p, ns):
        return min(range(ns), key=lambda i: ((h(f"ring:{i}") - p) % mod, i))

    docs = [r["doc_id"] for r in
            load_table(spark, "documents", sf).select("doc_id").collect()]
    before = {s: 0 for s in range(10)}
    after = {s: 0 for s in range(10)}
    for did in docs:
        p = h(f"doc:{did}")
        before[owner(p, 8)] += 1
        after[owner(p, 10)] += 1
    for s in range(10):
        assert rows[s]["n_before"] == before[s]
        assert rows[s]["n_after"] == after[s]


def test_schema_evolution_merge_semantics_and_pushdown(spark, tmp_path):
    """q370's widening semantics: old-generation rows surface the added
    column as NULL (exactly n_rows of gen 1), new-generation values ride
    through; and a mergeSchema read still pushes filters to the scan."""
    import os

    from pyspark.sql import functions as F

    from etl_globalretail_spark.sources.formats import QUERIES as FQ

    out = {r["gen"]: r for r in
           FQ["q370_schema_evolution"](spark, "/root/testdata/sf0.001")
           .collect()}
    assert sorted(out) == [1, 2]
    assert out[1]["n_rank_null"] == out[1]["n_rows"]  # all NULL pre-add
    assert out[1]["rank_sum"] == 0
    assert out[2]["n_rank_null"] == 0  # every new row has the column
    assert out[2]["rank_sum"] > 0

    # pushdown survives the merged read
    base = str(tmp_path / "evo")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("a")
    ).write.parquet(os.path.join(base, "gen=1"))
    spark.range(100, 200).select(
        F.col("id"), (F.col("id") * 2).alias("a"),
        (F.col("id") % 7).alias("b"),
    ).write.parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    filtered = merged.filter(F.col("id") > 150)
    filtered.write.format("noop").mode("overwrite").save()
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,150)]" in plan
