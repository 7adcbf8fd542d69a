"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The engine's third iterative operator family (after connected components
and the IVF coarse quantizer, whose single centroid step is q26): full
cluster fitting with convergence detection. Used for IVF index building,
corpus topic bucketing, and embedding-space diagnostics.

Iteration shape (the only scalable one for k ≪ N):

- **assign**: centroids are a k×d table — broadcast it, score every vector
  against every centroid with a codegen'd fold kernel, ``min_by`` argmin.
  No shuffle of the vectors themselves.
- **update**: posexplode assigned vectors → (cell, pos) partial sums —
  ONE shuffle of k·d·partitions partial aggregates, not of vectors.
- centroids (k×d doubles) return to the driver between rounds — that is
  the algorithm's inherent synchronization point, kilobytes per round.

Determinism: init picks the k vectors with the smallest md5(id) (a seeded,
data-independent-order choice — NOT head-of-partition luck), and every
argmin tie breaks on the lower cell id, so refits are bit-reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


def _sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² as a single fold kernel (JVM, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-9,
) -> tuple[DataFrame, list[list[float]], int, float]:
    """Fit k-means; returns (assignments, centroids, n_iter, inertia).

    ``assignments``: (id, cell, sq_dist) for every input vector.
    Converged when no centroid moves more than ``tol`` (squared shift) —
    or after ``max_iter`` rounds (k-means always terminates finitely, but
    a round cap bounds the job).
    """
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).persist()
    try:
        init = (
            base.select("__id", "__v")
            .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
            .limit(k)
            .collect()
        )
        centroids = [list(r["__v"]) for r in init]  # Row.attr rejects __-names

        n_iter = 0
        for n_iter in range(1, max_iter + 1):
            cdf = spark.createDataFrame(
                [(i, c) for i, c in enumerate(centroids)],
                "cell int, cvec array<double>",
            )
            scored = base.crossJoin(F.broadcast(cdf)).select(
                "__id",
                "__v",
                "cell",
                _sq_dist(F.col("__v"), F.col("cvec")).alias("__d"),
            )
            # min_by with struct tiebreak: lowest distance, then lowest cell
            assigned = scored.groupBy("__id", "__v").agg(
                F.min(F.struct("__d", "cell")).alias("__best")
            ).select(
                "__id",
                "__v",
                F.col("__best.cell").alias("cell"),
                F.col("__best.__d").alias("sq_dist"),
            )
            new_rows = (
                assigned.select("cell", F.posexplode("__v").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
                .groupBy("cell")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
                    ).alias("packed")
                )
                .select("cell", F.transform("packed", lambda p: p.m).alias("cvec"))
                .collect()
            )
            new_centroids = list(centroids)
            for r in new_rows:  # empty cells keep their old centroid
                new_centroids[r.cell] = list(r.cvec)
            shift = max(
                sum((a - b) * (a - b) for a, b in zip(old, new))
                for old, new in zip(centroids, new_centroids)
            )
            centroids = new_centroids
            if shift <= tol:
                break

        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cell int, cvec array<double>",
        )
        final = (
            base.crossJoin(F.broadcast(cdf))
            .select(
                "__id",
                "cell",
                _sq_dist(F.col("__v"), F.col("cvec")).alias("__d"),
            )
            .groupBy("__id")
            .agg(F.min(F.struct("__d", "cell")).alias("__best"))
            .select(
                F.col("__id").alias(id_col),
                F.col("__best.cell").alias("cell"),
                F.col("__best.__d").alias("sq_dist"),
            )
            .persist()
        )
        inertia = final.agg(F.sum("sq_dist")).collect()[0][0]
        return final, centroids, n_iter, float(inertia)
    finally:
        base.unpersist()


@_register("q74_kmeans")  # iterative, driver-held centroids — rows-only
def q74_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table (k=8): convergence round
    count, inertia, and the cluster-size profile. Deterministic (hash-seeded
    init, total-order argmin ties) so the rows-only check is stable."""
    e = load_table(spark, "embeddings", sf_dir)
    assigned, _centroids, n_iter, inertia = kmeans_fit(
        e, "embedding", "vec_id", k=8, max_iter=15
    )
    try:
        sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        prof = sizes.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.min("n").alias("min_sz"),
            F.max("n").alias("max_sz"),
            F.sum("n").alias("n_vectors"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    "kmeans_k8",
                    int(prof.n_cells),
                    int(prof.min_sz),
                    int(prof.max_sz),
                    int(prof.n_vectors),
                    int(n_iter),
                    round(inertia, 6),
                )
            ],
            "method string, n_cells long, min_sz long, max_sz long, "
            "n_vectors long, n_iter long, inertia double",
        )
    finally:
        assigned.unpersist()
