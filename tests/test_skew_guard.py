"""Skew-bomb regression guard (VERDICT r3 item 6).

`tests/test_scale_features.py` proves AQE skew-join splitting once on a
synthetic join; at 100 TB the joins that will actually meet a hot key
are the dedup/similarity candidate joins (a viral shingle posting in
q23/q156's prefix index) and the null bucket of the null-safe join
(q196 — every NULL co-locates). These tests plant a ≥50%-hot key in a
synthesized frame, run the REAL operator path, and assert the executed
plan shows AQE skew handling (the alternative manual route, the q42
salting device, has its own equality proofs in tests/test_skew.py).
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from etl_globalretail_spark.operators.dedup import jaccard_pairs

_SKEW_CONFS = {
    # fixture-scale thresholds: a hot key worth a few tens of KB must
    # register as skewed, and nothing may escape into a broadcast join
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextlib.contextmanager
def _skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _assert_skew_split(df) -> list:
    """collect() the frame (finalizing ITS adaptive plan) and assert the
    final plan carries AQE skew markers."""
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan or "isSkew=true" in plan, plan[:3000]
    return rows


def test_jaccard_prefix_join_splits_hot_shingle(spark):
    """A viral shingle shared by 60% of the corpus makes one posting key
    carry the prefix index — the q23/q156 candidate self-join must
    AQE-split it, and the verified output must stay exact (the hot pairs
    are below threshold; one planted exact-dup pair is above)."""
    n_hot, n_cold = 1200, 400
    # hot docs: 2 shingles each ("alpha beta", "beta w<i>"); with only
    # two shingles the WHOLE set is posted (prefix length = n - ceil(
    # 0.4 n) + 1 = 2), so the hot shingle's posting list is exactly the
    # hot doc count — deterministic, no hash-order luck.
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta w"), F.col("id")).alias("text"),
    )
    cold = spark.range(n_cold).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("c"), F.col("id"), F.lit("a c"), F.col("id"),
            F.lit("b c"), F.col("id"), F.lit("c"),
        ).alias("text"),
    )
    dup = spark.createDataFrame(
        [(2_000_001, "exact duplicate text here"),
         (2_000_002, "exact duplicate text here")],
        "doc_id long, text string",
    )
    docs = hot.unionAll(cold).unionAll(dup)

    with _skew_confs(spark):
        out = jaccard_pairs(docs, "text", "doc_id", k=2, threshold=0.4)
        rows = _assert_skew_split(out)

    # exactness under the split: hot docs share 1 of 3 union shingles
    # (J = 1/3 < 0.4 — all pruned); only the planted dup pair survives
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [
        (2_000_001, 2_000_002, 1.0)
    ]


def test_null_bucket_join_splits(spark):
    """q196's scale note made real: a 50%-null key column co-locates
    every NULL in one bucket of the null-safe self-join — AQE must split
    it, and the pair census must stay exact."""
    n = 3000
    keyed = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 500).alias("k"),
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("k").alias("k_a"))
    b = keyed.select(F.col("id").alias("id_b"), F.col("k").alias("k_b"))
    joined = (
        a.join(b, F.col("k_a").eqNullSafe(F.col("k_b"))
               & (F.col("id_a") < F.col("id_b")))
        .groupBy(F.coalesce("k_a", F.lit(-1)).alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    with _skew_confs(spark):
        rows = _assert_skew_split(joined)

    got = {r["join_key"]: r["n_pairs"] for r in rows}
    n_null = n // 2  # ids 0,2,4,... -> NULL key
    assert got[-1] == n_null * (n_null - 1) // 2
    # non-null keys: 6 ids apiece (odd ids with id%500 = k, k odd since
    # 500 is even) -> C(6,2) = 15 pairs
    assert all(v == 15 for k, v in got.items() if k != -1)
    assert len(got) == 1 + 500 - 250  # -1 plus the 250 odd residues
