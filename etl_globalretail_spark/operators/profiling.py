"""Corpus profiling: exact and sketch-based dataset statistics.

Before any 100 TB corpus is trained on, it is profiled: row counts,
cardinalities, value distributions, null rates — per slice. At that scale
the *exact* versions of two of those are shuffle-monsters:

- ``COUNT(DISTINCT x)`` shuffles every distinct value to its reducer;
- exact percentiles need a full sort (or a two-pass count + select).

The sketch forms bound both with fixed memory per partition and a single
map-side-combinable pass:

- **HyperLogLog++** (``approx_count_distinct``) — ~relSD error with a
  few-KB register array, mergeable across partitions/slices;
- **KLL/GK quantile sketch** (``percentile_approx``) — rank-error-bounded
  quantiles, mergeable the same way.

Both are Spark-built-in aggregates (JVM, codegen, partial-merge), so the
profile of a 100 TB table is one scan + a tiny shuffle of sketch states.

q49 is the exact profile (oracle-paired — bit-stable aggregates only);
q50 is the sketch profile (no cross-engine twin — HLL/KLL states are
implementation-defined — so it is a rows-only check, with pytest bounding
its error against the exact profile).

The reference's only statistics surface is COUNT(*) per table
(etl_completo.py:1063-1092, A2 in SURVEY.md §2.4); this family is its
scale-grade generalization under the 100 TB mandate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.queries import dsum, make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


def exact_profile(df: DataFrame, group_col: str, id_col: str, value_col: str) -> DataFrame:
    """Exact per-slice profile with bit-stable aggregates (counts, exact
    distinct, min/max, decimal-exact sum) — the ground truth q50 sketches."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(id_col).alias("n_distinct_ids"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        dsum(F.col(value_col), "sum_value"),
    )


def sketch_profile(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    rsd: float = 0.02,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based per-slice profile: HLL++ cardinality (relative standard
    deviation ``rsd``) + KLL-style approximate quantiles (rank error
    1/``accuracy``). One scan, fixed memory, mergeable partials — the form
    that actually runs on 100 TB."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(id_col, rsd).alias("approx_distinct_ids"),
        F.percentile_approx(
            value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
        ).alias("value_quantiles"),
    )


@_register(
    "q49_corpus_profile",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_distinct_ids,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q49_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type profile of the events table (A2 generalized:
    counts, user cardinality, value range and exact-decimal sum)."""
    e = load_table(spark, "events", sf_dir)
    return exact_profile(e, "event_type", "user_id", "value")


@_register("q50_sketch_profile")  # HLL/KLL states are engine-specific — rows-only
def q50_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of q49: HLL++ user cardinality at 2% rsd + p50/p95/p99
    value quantiles at 1e-4 rank error. pytest bounds its divergence from
    the exact profile; no SQL twin (sketch internals differ per engine)."""
    e = load_table(spark, "events", sf_dir)
    return sketch_profile(e, "event_type", "user_id", "value")
