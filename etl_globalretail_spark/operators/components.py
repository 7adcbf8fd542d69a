"""Connected components over a pair/edge list — duplicate-cluster closure.

``drop_near_duplicates`` (dedup.py) is the single-pass policy: drop the
larger id of each verified pair. It under-merges chains (a~b, b~c, a≁c is
two pairs but ONE duplicate cluster {a,b,c}) — the canonical fix is the
transitive closure, i.e. connected components over the pair graph, keeping
one representative per component.

Algorithm: iterative min-label propagation (hash-min). Each round every
vertex adopts the smallest label among itself and its neighbors; fixpoint =
every vertex holds its component's minimum id. Rounds needed = graph
diameter — for near-dup clusters (tiny, dense clumps; diameter ≤ ~3) this
beats the O(log n) star-contraction algorithms on constant factors while
staying pure DataFrame ops. The loop is driver-side but each iteration is
one distributed join+agg; lineage is truncated per round with
``localCheckpoint`` so the plan doesn't grow unboundedly (the classic
iterative-Spark failure mode).

Per-round cost: one shuffle of the edge list (join on vertex) + one
min-aggregate. Edges for dedup are |verified pairs| — orders of magnitude
smaller than the corpus, so at 100 TB the CC phase is dwarfed by the LSH
phase that produced the pairs.

No SQL oracle: iteration-to-fixpoint is not expressible in DuckDB's
non-recursive dialect (a RECURSIVE CTE could, but per-query hash compare of
an unordered fixpoint adds nothing over the pytest ground truth) — q43 is a
rows-only check with pytest-verified closure semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    materialized: list | None = None,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``pairs``;
    component = min vertex id reachable. Converges in ≤ diameter rounds;
    raises if ``max_iter`` rounds don't reach the fixpoint (pathological
    diameter — use a star-contraction variant then).

    Checkpoint hygiene: each round's ``localCheckpoint`` pins RDD blocks in
    executor storage that ``DataFrame.unpersist`` never touches — on a long
    job the superseded rounds would accumulate one corpus-of-labels block
    set per iteration. Every round therefore explicitly unpersists the
    previous round's blocks once the new checkpoint is materialized; the
    FINAL round's blocks (which the returned frame reads) are appended to
    ``materialized`` for the caller to release after consumption.
    """
    sc = pairs.sparkSession.sparkContext

    def _checkpoint(df: DataFrame):
        """localCheckpoint + handles of the java RDD blocks it pinned."""
        pre = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        out = df.localCheckpoint()
        post = sc._jsc.getPersistentRDDs()
        handles = [
            post.get(i) for i in set(post.keySet().toArray()) - pre
        ]
        return out, handles

    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels, prev_blocks = _checkpoint(
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.v == labels.vertex)
                .groupBy("u")
                .agg(F.min("component").alias("nmin"))
            )
            updated = (
                labels.join(neighbor_min, labels.vertex == neighbor_min.u, "left")
                .select(
                    "vertex",
                    F.least(
                        "component", F.coalesce("nmin", "component")
                    ).alias("component"),
                    (F.coalesce("nmin", "component") < F.col("component")).alias(
                        "__changed"
                    ),
                )
            )
            # One pass computes both the new labels and the convergence
            # flag; localCheckpoint materializes it so the growing loop
            # lineage is cut and `changed` doesn't recompute the join.
            updated, new_blocks = _checkpoint(updated)
            for h in prev_blocks:
                h.unpersist(False)
            prev_blocks = new_blocks
            changed = updated.filter("__changed").limit(1).count()
            labels = updated.drop("__changed")
            if changed == 0:
                if materialized is not None:
                    materialized.extend(prev_blocks)
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()


def dedup_by_components(
    df: DataFrame, pairs: DataFrame, id_col: str, cc: DataFrame | None = None
) -> DataFrame:
    """Keep one representative (the min id) per duplicate cluster — the
    transitive-closure-correct version of ``drop_near_duplicates``.

    Pass ``cc`` when the caller already ran ``connected_components`` on the
    same pair graph (it is a multi-job iterative computation — never worth
    running twice)."""
    if cc is None:
        cc = connected_components(pairs)
    losers = cc.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def _q67_oracle() -> str:
    """Recursive-CTE oracle: reachability closure + min-label aggregation
    over the SAME edge set q66's oracle derives (md5 pipeline — every
    upstream hash is cross-engine), so the fixpoint the Spark hash-min
    loop converges to is checked vertex-for-vertex against an independent
    formulation of transitive closure."""
    from etl_globalretail_spark.operators import dedup

    q66 = dedup.ORACLE["q66_minhash_pairs_exact"]
    return f"""
    WITH RECURSIVE
    pairs AS ({q66}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    reach AS (
        SELECT v, v AS r FROM verts
        UNION
        SELECT e.dst AS v, reach.r AS r
        FROM reach JOIN edges e ON reach.v = e.src
    )
    SELECT v AS vertex, MIN(r) AS component FROM reach GROUP BY v
    """


def _register_q67() -> None:
    @_register("q67_cluster_closure_exact", oracle=_q67_oracle())
    def q67_cluster_closure_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
        """(vertex, component) labeling from the iterative hash-min loop,
        oracle-checked against DuckDB's recursive-CTE transitive closure on
        the identical (md5-derived, q66) pair graph. Upgrades the CC
        verification tier from rows-only (q43, xxhash edges) to an exact
        cross-engine fixpoint compare."""
        from etl_globalretail_spark.operators import dedup

        pairs = dedup.QUERIES["q66_minhash_pairs_exact"](spark, sf_dir)
        pairs = pairs.persist()
        held: list = []
        try:
            cc = connected_components(pairs, materialized=held)
            # The labels live in localCheckpoint blocks that are released
            # below; the label set is |pair-graph vertices| (≪ corpus —
            # only docs that near-dup something), so materializing it to
            # the driver before release is the cheap, safe hand-off.
            rows = cc.select("vertex", "component").collect()
            return spark.createDataFrame(rows, "vertex long, component long")
        finally:
            pairs.unpersist()
            for h in held:
                try:
                    h.unpersist(False)
                except Exception:
                    pass


_register_q67()


@_register("q43_dedup_clusters")  # iterative fixpoint — rows-only check
def q43_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-closure dedup over the MinHash-verified pair graph: component
    count/size profile plus corpus size after keeping one doc per cluster.
    Deterministic (seeded LSH upstream, min-id representatives)."""
    from etl_globalretail_spark.operators.dedup import minhash_near_duplicates

    d = load_table(spark, "documents", sf_dir)
    held: list = []
    pairs = minhash_near_duplicates(d, "text", "doc_id", materialized=held)
    pairs = pairs.persist()
    held.append(pairs)
    try:
        cc = connected_components(pairs, materialized=held)
        sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        kept = dedup_by_components(d, pairs, "doc_id", cc=cc)
        prof = sizes.agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs_clustered"),
            F.max("sz").alias("max_cluster"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    "cc_minhash",
                    d.count(),
                    int(prof.n_clusters),
                    int(prof.n_docs_clustered),
                    int(prof.max_cluster),
                    kept.count(),
                )
            ],
            "method string, n_docs long, n_clusters long, "
            "n_docs_clustered long, max_cluster long, n_kept long",
        )
    finally:
        for fr in held:
            fr.unpersist()
