"""Connected-components closure semantics on known graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_globalretail_spark.operators.components import (
    connected_components,
    dedup_by_components,
)


def _cc_map(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.vertex: r.component for r in connected_components(pairs).collect()
    }


def test_chain_merges_transitively(spark):
    """a~b, b~c, c~d is ONE cluster even though (a,c),(a,d),(b,d) were never
    verified pairs — the case the single-pass greedy policy under-merges."""
    got = _cc_map(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_stay_separate(spark):
    got = _cc_map(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_ring_and_reversed_edges(spark):
    """Cycles converge; edge direction is irrelevant (symmetrized)."""
    got = _cc_map(spark, [(5, 4), (3, 4), (5, 2), (2, 3)])
    assert got == {2: 2, 3: 2, 4: 2, 5: 2}


def test_long_path_diameter(spark):
    """A 12-vertex path needs multiple propagation rounds."""
    edges = [(i, i + 1) for i in range(1, 12)]
    got = _cc_map(spark, edges)
    assert got == {v: 1 for v in range(1, 13)}


def test_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_dedup_by_components_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters {1,2,3,4} (chain) and {6,7}; 5 is clean.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_by_components(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 5, 6]

    # contrast: the greedy single-pass policy keeps the same set here only
    # because every pair's smaller id is the cluster min; on the chain it
    # also drops 2,3,4 — but on (2,3) alone it would keep 2 even though 2
    # duplicates 1 transitively. The closure is the guarantee, not luck:
    from etl_globalretail_spark.operators.dedup import drop_near_duplicates

    partial_pairs = spark.createDataFrame([(2, 3), (3, 4)], "id_a long, id_b long")
    greedy = sorted(
        r.doc_id
        for r in drop_near_duplicates(docs, partial_pairs, "doc_id").collect()
    )
    closure = sorted(
        r.doc_id
        for r in dedup_by_components(docs, partial_pairs, "doc_id").collect()
    )
    assert greedy == closure == [1, 2, 5, 6, 7]


def test_q43_runs(spark, sf_dir):
    from etl_globalretail_spark.operators.components import q43_dedup_clusters

    row = q43_dedup_clusters(spark, sf_dir).collect()[0]
    assert row.n_docs > 0
    assert row.n_kept + row.n_docs_clustered - row.n_clusters == row.n_docs
    assert row.max_cluster >= 2


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """No verified near-dup pair may straddle the train/test boundary —
    the invariant q86 exists to provide."""
    from pyspark.sql import functions as F

    from etl_globalretail_spark.operators import dedup
    from etl_globalretail_spark.operators.components import (
        connected_components,
    )
    from etl_globalretail_spark.operators.sampling import hash_bucket
    from etl_globalretail_spark.sources.readers import load_table

    pairs = dedup.QUERIES["q66_minhash_pairs_exact"](spark, sf_dir).persist()
    try:
        cc = connected_components(pairs)
        comp = {r.vertex: r.component for r in cc.collect()}
        d = load_table(spark, "documents", sf_dir).select("doc_id")
        buckets = {
            r.doc_id: r.b
            for r in d.select(
                "doc_id", hash_bucket(F.col("doc_id"), salt="split").alias("b")
            ).collect()
        }

        def split_of(doc):
            key = comp.get(doc, doc)
            # members inherit the REPRESENTATIVE's bucket
            rep_bucket = buckets.get(key)
            return "train" if rep_bucket < 900000 else "test"

        for p in pairs.collect():
            assert split_of(p.id_a) == split_of(p.id_b), (p.id_a, p.id_b)
    finally:
        pairs.unpersist()
