"""Analytical query surface beyond the reference's ETL builders — the
grouped/windowed shapes a star-schema DW exists to serve (SURVEY.md §7.6):
rollup hierarchies, semi/anti membership, ordered-window lag analytics,
pivot crosstabs, exact distributional statistics, and set-algebra cohort
comparisons. The reference builds the DW "para análise" (README.md:7) but
ships no analytical queries beyond row counts (etl_completo.py:1063-1092);
this module is that missing query layer, Spark-first.

Every query is oracle-paired (DuckDB ANSI SQL) and follows the module-wide
numeric-stability contract from plans/queries.py (decimal-exact FP sums,
BIGINT-normalized derived integers, deterministic tie-breaks).
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.operators.ranks import (
    global_prefix_agg,
    global_row_number,
    global_topk,
)
from etl_globalretail_spark.plans.queries import (
    dsum,
    make_query_decorator,
    _osum,
)
from etl_globalretail_spark.sources.artifacts import materialize
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


# ---------------------------------------------------------------------------
# q54 — ROLLUP hierarchy totals (region → nation → grand total).
# ---------------------------------------------------------------------------


@_register(
    "q54_rollup_revenue",
    oracle=f"""
    SELECT COALESCE(r.r_name, 'ALL') AS regiao,
           COALESCE(n.n_name, 'ALL') AS nacao,
           COUNT(*) AS n_orders,
           {_osum("o.o_totalprice", "revenue")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q54_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue at three grains in one pass — (region, nation),
    region subtotal, grand total — via ``rollup``.

    Scale notes: Spark plans rollup as a single Expand + one hash
    aggregate — the fact table is scanned ONCE for all grains (vs three
    separate groupBys = three scans + three shuffles). nation/region are
    broadcast; the only big shuffle is the orders⨝customer equi-join.
    Grouping-null subtotal rows are disambiguated with 'ALL' labels
    (the natural keys are never null in the data, so COALESCE is safe).
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("regiao"),
            F.coalesce("n_name", F.lit("ALL")).alias("nacao"),
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# q55 — semi/anti join membership split.
# ---------------------------------------------------------------------------


@_register(
    "q55_semi_anti_customers",
    oracle="""
    SELECT c_mktsegment, 'with_orders' AS cohort,
           COUNT(*) AS n_customers, CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'no_orders',
           COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q55_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers split per segment into has-orders / no-orders cohorts via
    LEFT SEMI and LEFT ANTI joins — the explicit faces of the membership
    predicates the reference only has implicitly (`ON CONFLICT DO NOTHING`
    = anti-join, etl_completo.py:172-177; null-guarded lookups = semi,
    etl_completo.py:321-331).

    Scale notes: both probes share one orders scan shape — the key column
    alone is shuffled (column pruning reaches the parquet footer), and
    semi/anti joins carry no payload from the build side at all. sum_keys
    is an exact BIGINT checksum (order-independent).
    """
    c = load_table(spark, "customer", sf_dir)
    okeys = load_table(spark, "orders", sf_dir).select("o_custkey")

    def cohort(joined: DataFrame, label: str) -> DataFrame:
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_custkey").alias("sum_keys"),
        ).select(
            "c_mktsegment",
            F.lit(label).alias("cohort"),
            "n_customers",
            "sum_keys",
        )

    semi = c.join(okeys, c.c_custkey == okeys.o_custkey, "left_semi")
    anti = c.join(okeys, c.c_custkey == okeys.o_custkey, "left_anti")
    return cohort(semi, "with_orders").unionByName(cohort(anti, "no_orders"))


# ---------------------------------------------------------------------------
# q56 — inter-event gaps via lag() ordered windows.
# ---------------------------------------------------------------------------


@_register(
    "q56_interevent_gaps",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           CAST(COALESCE(SUM(gap_us), 0) AS BIGINT) AS sum_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0
               AS avg_gap_s
    FROM gaps
    GROUP BY event_type
    """,
)
def q56_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event time gaps (lag over an ordered per-user
    window), aggregated per event type of the later event — the dwell-time
    / session-cadence primitive.

    Scale notes: ONE shuffle on user_id (the window partition key); lag is
    computed inside the sorted window with no self-join (the naive
    formulation — self-join on rn = rn-1 — would shuffle twice and join).
    Gap math runs in exact BIGINT microseconds on both engines
    (``unix_micros`` ≡ DuckDB ``epoch_us``); the average divides the exact
    sum as double with an identical operation order, so it is bit-stable.
    Ties on ts are broken by event_id — the window order is total, hence
    deterministic.
    """
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).alias("sum_gap_us"),
        (
            F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(1000000.0)
        ).alias("avg_gap_s"),
    )


# ---------------------------------------------------------------------------
# q57 — pivot crosstab (hour-of-day × event type).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_register(
    "q57_event_type_pivot",
    oracle="""
    SELECT CAST(hour(ts) AS BIGINT) AS hora,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
    FROM events
    GROUP BY hour(ts)
    """,
)
def q57_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type crosstab via ``pivot`` with an explicit
    value list.

    Scale notes: passing the pivot values explicitly matters at 100 TB —
    without them Spark runs an extra distinct-collect job over the whole
    table just to discover the columns. With them, the pivot compiles to a
    single hash aggregate of conditional counts (one scan, one shuffle of
    24 × 5 partial counters — bytes). Missing cells are 0, not NULL, to
    match the conditional-aggregation oracle shape.
    """
    e = load_table(spark, "events", sf_dir)
    pivoted = (
        e.groupBy(F.hour("ts").cast("bigint").alias("hora"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "hora",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# q58 — exact discrete percentiles per group (no interpolation).
# ---------------------------------------------------------------------------


@_register(
    "q58_order_value_percentiles",
    oracle="""
    WITH ranked AS (
        SELECT c.c_mktsegment, o.o_totalprice, o.o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice, o.o_orderkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           MAX(n) AS n_orders,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                    THEN o_totalprice END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN o_totalprice END) AS p99
    FROM ranked
    GROUP BY c_mktsegment
    """,
)
def q58_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99) of order value per market
    segment — the element at rank ⌈p·n⌉ under a total order, so both
    engines pick the SAME row (no interpolation arithmetic to diverge on,
    unlike percentile_cont).

    Scale notes: one shuffle on the group key serves both window
    functions and the final aggregate (same partitioning). Exact
    percentiles fundamentally need a per-group sort; at 100 TB with huge
    groups the sketch path is q50's approx_percentile — this is the exact
    tier of that pair, and the oracle gate for it.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_totalprice", "o_orderkey"
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    ranked = joined.select(
        "c_mktsegment",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )

    def at(p: float, alias: str):
        rank = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        return F.max(
            F.when(F.col("rn") == rank, F.col("o_totalprice"))
        ).alias(alias)

    return ranked.groupBy("c_mktsegment").agg(
        F.max("n").alias("n_orders"),
        at(0.50, "p50"),
        at(0.90, "p90"),
        at(0.99, "p99"),
    )


# ---------------------------------------------------------------------------
# q68 — running (cumulative) totals per partition.
# ---------------------------------------------------------------------------


@_register(
    "q68_running_revenue",
    oracle="""
    WITH monthly AS (
        SELECT r.r_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS ano,
               CAST(month(o.o_orderdate) AS BIGINT) AS mes,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6)))
                    AS DECIMAL(27,6)) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, year(o.o_orderdate), month(o.o_orderdate)
    )
    SELECT r_name, ano, mes,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (
               PARTITION BY r_name ORDER BY ano, mes
               ROWS UNBOUNDED PRECEDING
           ) AS DOUBLE) AS running_revenue
    FROM monthly
    """,
)
def q68_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative monthly revenue per region — the running-total window
    every DW dashboard needs.

    Scale notes: aggregate FIRST (months × regions rows), window over the
    tiny aggregate — never a running sum over raw orders. The window
    partition key (region) matches the aggregate's grouping prefix, so
    AQE reuses the partitioning: one fact shuffle, one small window sort.
    The cumulative sum runs over DECIMAL month subtotals (exact, order-
    independent) and casts to double per row — bit-stable across engines
    even though prefix sums are order-sensitive in FP.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            "r_name",
            F.year("o_orderdate").cast("bigint").alias("ano"),
            F.month("o_orderdate").cast("bigint").alias("mes"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .cast("decimal(27,6)")
            .alias("rev")
        )
    )
    w = (
        Window.partitionBy("r_name")
        .orderBy("ano", "mes")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "r_name",
        "ano",
        "mes",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("running_revenue"),
    )


# ---------------------------------------------------------------------------
# q69 — percent-of-total (ratio-to-report) window.
# ---------------------------------------------------------------------------


@_register(
    "q69_revenue_share",
    oracle="""
    WITH per_nation AS (
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6)))
                    AS DECIMAL(27,6)) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
               / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE)
               AS share_of_region,
           CAST(rev AS DOUBLE)
               / CAST(SUM(rev) OVER () AS DOUBLE) AS share_of_total
    FROM per_nation
    """,
)
def q69_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's and of global revenue —
    ratio-to-report at two scopes in one pass.

    Scale notes: same aggregate-first shape as q68; the unpartitioned
    total is a window over the 25-row aggregate (harmless single
    partition of 25 rows — NOT a global window over the fact table).
    Decimal subtotals make numerator and denominator exact, so the
    double divisions are bit-identical across engines.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .cast("decimal(27,6)")
            .alias("rev")
        )
    )
    region_total = F.sum("rev").over(Window.partitionBy("r_name"))
    grand_total = F.sum("rev").over(
        Window.partitionBy()
    )
    dbl = F.col("rev").cast("double")
    return per_nation.select(
        "r_name",
        "n_name",
        dbl.alias("revenue"),
        (dbl / region_total.cast("double")).alias("share_of_region"),
        (dbl / grand_total.cast("double")).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# q75 — funnel analysis (ordered event-sequence conversion).
# ---------------------------------------------------------------------------


@_register(
    "q75_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY e.user_id
    )
    SELECT stage, n_users,
           CAST(n_users AS DOUBLE)
               / (SELECT COUNT(*) FROM s1) AS conversion
    FROM (
        SELECT 'signup' AS stage, (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL
        SELECT 'signup>click', (SELECT COUNT(*) FROM s2)
        UNION ALL
        SELECT 'signup>click>purchase', (SELECT COUNT(*) FROM s3)
    )
    """,
)
def q75_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel: users who signed up, then clicked at/after
    their first signup, then purchased at/after that click — the ordered
    sequence-matching primitive of event analytics (strictly ordered
    stages, first-qualifying-occurrence semantics).

    Scale notes: each stage is a pushed-filter scan + one aggregate on
    user_id, joined to the previous stage's (user, ts) frame — the stage
    frames shrink monotonically, and every join is on the same key, so
    AQE reuses the user_id partitioning. No window over raw events, no
    per-user collect — the pattern match is expressed entirely as
    conditional min-aggregates.
    """
    e = load_table(spark, "events", sf_dir)

    def stage(event_type: str, prev: DataFrame | None, prev_ts: str, out_ts: str):
        s = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_ts))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s1 = stage("signup", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")

    n1, n2, n3 = s1.count(), s2.count(), s3.count()
    rows = [
        ("signup", n1),
        ("signup>click", n2),
        ("signup>click>purchase", n3),
    ]
    out = spark.createDataFrame(rows, "stage string, n_users long")
    return out.select(
        "stage",
        "n_users",
        (F.col("n_users").cast("double") / F.lit(n1)).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# q81 — incremental aggregate maintenance (materialized-view refresh).
# ---------------------------------------------------------------------------


def merge_aggregates(
    agg: DataFrame, delta_agg: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a delta's partial aggregates into a materialized aggregate
    table: union + re-aggregate on the keys, summing every non-key column.
    Works for any algebraic aggregate stored in summable form (counts,
    sums; averages as sum+count pairs; HLL states via hll_merge).

    This is incremental view maintenance for the append-only case: the
    refresh costs Θ(|delta| + |affected groups|), never a rescan of the
    base table. The shuffle moves group subtotals — rows, not data.
    """
    sum_cols = [c for c in agg.columns if c not in keys]
    return (
        agg.unionByName(delta_agg)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )


@_register(
    "q81_incremental_agg",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
           CAST(month(o_orderdate) AS BIGINT) AS mes,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q81_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized monthly-revenue aggregate maintained INCREMENTALLY —
    the base aggregate is built from pre-1998 orders, then the 1998+
    delta's partial aggregate is folded in with ``merge_aggregates`` —
    and checked against the oracle's full recompute. Proves refresh ≡
    recompute for algebraic aggregates (the decimal sums make the
    equivalence bit-exact, not just approximate).
    """
    o = load_table(spark, "orders", sf_dir)

    def monthly(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("o_orderdate").cast("bigint").alias("ano"),
            F.month("o_orderdate").cast("bigint").alias("mes"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("revenue"),
        )

    base = monthly(o.filter(F.year("o_orderdate") < 1998))
    delta = monthly(o.filter(F.year("o_orderdate") >= 1998))
    merged = merge_aggregates(base, delta, ["ano", "mes"])
    return merged.select(
        "ano",
        "mes",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("revenue").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q78 — semi-structured (JSON) column extraction.
# ---------------------------------------------------------------------------


@_register(
    "q78_json_extraction",
    oracle="""
    WITH parsed AS (
        SELECT event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(k) AS n_parsed,
           CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM parsed GROUP BY event_type
    """,
)
def q78_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing of the ``props`` payload
    (``from_json`` with an explicit struct schema — malformed documents
    yield NULL fields, counted as unparsed), aggregated per event type.
    The structured twin of q13's regex extraction.

    Scale notes: ``from_json`` is a JVM Jackson parse inside codegen — no
    UDF, no Python; the declared schema means only the projected keys are
    materialized. At 100 TB prefer parsing ONCE into a struct column at
    ingest (then column-prune forever after) over re-parsing per query —
    this query is the per-query form; the ingest form is the same
    expression in a ``withColumn`` before the write.
    """
    e = load_table(spark, "events", sf_dir)
    parsed = e.select(
        "event_type",
        F.from_json(F.col("props"), "k bigint").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_parsed"),
        F.coalesce(F.sum("k"), F.lit(0)).alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q77 — cohort retention matrix.
# ---------------------------------------------------------------------------


@_register(
    "q77_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort_month
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_month,
               CAST(date_trunc('month', e.ts) AS DATE) AS activity_month
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_month,
           CAST((year(activity_month) - year(cohort_month)) * 12
                + (month(activity_month) - month(cohort_month))
                AS BIGINT) AS months_since,
           COUNT(*) AS n_users
    FROM activity
    GROUP BY cohort_month, months_since
    """,
)
def q77_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity month, counted in
    each subsequent month they return — the (cohort, months-since)
    triangle behind every retention curve.

    Scale notes: both the first-touch aggregate and the activity dedup
    shuffle on user_id (one partitioning, reused); the matrix aggregate
    then works on (cohort, month) pairs — |users| rows at most, not
    events. Month arithmetic is integer (year·12+month deltas), exact on
    both engines.
    """
    e = load_table(spark, "events", sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.trunc(F.min("ts"), "month").alias("cohort_month")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_month",
            F.trunc("ts", "month").alias("activity_month"),
        )
        .distinct()
    )
    months_since = (
        (F.year("activity_month") - F.year("cohort_month")) * 12
        + (F.month("activity_month") - F.month("cohort_month"))
    ).cast("bigint")
    return activity.groupBy(
        "cohort_month", months_since.alias("months_since")
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# q59 — cohort set algebra (INTERSECT / EXCEPT).
# ---------------------------------------------------------------------------


@_register(
    "q59_cohort_set_ops",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(o_orderdate) = 1996)
    SELECT 'retained' AS cohort, COUNT(*) AS n_customers,
           CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) AS sum_keys
    FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'churned', COUNT(*), CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT)
    FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'acquired', COUNT(*), CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT)
    FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
    """,
)
def q59_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer cohorts via set algebra: retained
    (1995 ∩ 1996), churned (1995 ∖ 1996), acquired (1996 ∖ 1995).

    Scale notes: ``intersect``/``exceptAll`` on the deduped key column
    compile to left-semi/left-anti hash joins over just the BIGINT key —
    the year filter and key projection both push to the parquet scan, so
    the shuffled payload is the key alone. The three set ops share the
    same two inputs; Spark recomputes the scans (cheap, pruned) rather
    than caching — at 100 TB a persisted key set would be the call, noted
    here as the scale lever.
    """
    o = load_table(spark, "orders", sf_dir)

    def keys(year: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = keys(1995), keys(1996)

    def tally(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.coalesce(F.sum("o_custkey"), F.lit(0)).alias("sum_keys"),
        ).select(
            F.lit(label).alias("cohort"), "n_customers", "sum_keys"
        )

    return (
        tally(y95.intersect(y96), "retained")
        .unionByName(tally(y95.exceptAll(y96), "churned"))
        .unionByName(tally(y96.exceptAll(y95), "acquired"))
    )


@_register(
    "q97_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q97_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers — the left-outer-join + double
    aggregation every "engagement histogram" is.

    Scale notes: COUNT(o_orderkey) over the outer join counts only matched
    rows (null-skipping), so no-order customers land in the c_count=0
    bucket without a separate anti-join pass. First aggregate collapses to
    |customers| rows, second to |distinct counts| — the fact table is
    shuffled once, on the join key.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@_register(
    "q98_trailing_window_avg",
    oracle="""
    WITH e AS (
        SELECT event_id, event_type, ts, value FROM events
    ),
    framed AS (
        SELECT event_type, event_id,
               COUNT(*) OVER w AS n_trailing,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS avg_trailing
        FROM e
        WINDOW w AS (
            PARTITION BY event_type ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(n_trailing) AS BIGINT) AS sum_trailing_counts,
           CAST(SUM(CAST(avg_trailing AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_trailing_avgs
    FROM framed GROUP BY event_type
    """,
)
def q98_trailing_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: for every event, the average value over
    the trailing 1 hour within its event type (sensor smoothing / rate
    features) — the frame is defined by TIME, not row count, so bursts
    widen the frame and quiet periods shrink it.

    Spark expresses time-range frames as ``rangeBetween`` over epoch
    MICROseconds (-3.6e9 → 0) — epoch seconds would truncate and disagree
    with the oracle's full-precision interval comparison on boundary rows.
    The frame SUM runs over exact decimals and each
    per-row average is one double division — deterministic despite FP;
    the audit fold sums those averages as decimals again (order-free).

    Scale shape — GHOST-ROW BUCKETING: a window partitioned only by
    event_type (~5 values) is a 5-task parallelism ceiling — one
    executor sorts the whole type at any corpus size (the low-
    cardinality sibling of the partition-less windows the r6 lint
    banned). Instead, rows are bucketed by (type, UTC day) and every
    row in the LAST HOUR of a day is replicated as a GHOST into the
    next day's bucket: each native row's trailing-1h frame is then
    fully present inside its own bucket, the window runs per
    (type, day) — parallelism grows with the time span — and ghost
    rows (whose own frames would be truncated) are dropped after the
    pass. Shuffle cost is N·(1 + frame/bucket) ≈ 1.04×N. Output is
    bit-identical to the single-window form — the unchanged oracle
    hash-checks exactly that.
    """
    e = load_table(spark, "events", sf_dir)
    hour_us, day_us = 3_600_000_000, 86_400_000_000
    us = F.unix_micros("ts")
    # base feeds BOTH union legs (native + ghosts): without a persist
    # the events scan + projection runs twice (Catalyst never dedupes
    # the subplan). Lifetime tied to the returned plan; released by the
    # harness clearCache() (ADVICE r6).
    base = e.select(
        "event_type", "event_id", "value", us.alias("us"),
        (us.cast("long") - (us.cast("long") % day_us)).alias("bstart"),
    ).persist()
    native = base.select(
        "event_type", "event_id", "value", "us", "bstart",
        F.lit(False).alias("ghost"),
    )
    ghosts = base.filter(
        F.col("us") >= F.col("bstart") + (day_us - hour_us)
    ).select(
        "event_type", "event_id", "value", "us",
        (F.col("bstart") + day_us).alias("bstart"),
        F.lit(True).alias("ghost"),
    )
    w = (
        Window.partitionBy("event_type", "bstart")
        .orderBy("us")
        .rangeBetween(-hour_us, 0)
    )
    framed = (
        native.unionAll(ghosts)
        .select(
            "event_type",
            "event_id",
            "ghost",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            (
                F.sum(F.col("value").cast("decimal(27,6)")).over(w)
                .cast("double") / F.count(F.lit(1)).over(w)
            ).alias("avg_trailing"),
        )
        .filter(~F.col("ghost"))
    )
    return framed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_trailing").alias("sum_trailing_counts"),
        F.sum(F.col("avg_trailing").cast("decimal(27,6)"))
        .cast("double")
        .alias("sum_trailing_avgs"),
    )


@_register(
    "q102_idle_rich_customers",
    oracle="""
    WITH thresh AS (
        SELECT AVG(CAST(c_acctbal AS DECIMAL(27,6))) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(c.c_custkey) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               AS total_balance
    FROM customer c CROSS JOIN thresh
    WHERE c.c_acctbal > CAST(thresh.avg_bal AS DOUBLE)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
)
def q102_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no RECENT orders (none since 2000-01-01) — the "reachable but lapsed"
    audience query. Combines a global scalar threshold (exact-decimal AVG,
    broadcast as a 1-row cross join in the oracle, a literal-free scalar
    filter here) with an anti-join against the date-pruned fact slice.

    Scale notes: the threshold aggregate collapses to one row before
    anything joins (never a per-row correlated AVG); the anti-join
    shuffles only the (custkey) column of orders, and the surviving
    customer set is segment-aggregated in the same stage. The decimal AVG
    keeps the threshold bit-stable, so the boundary set is deterministic
    cross-engine.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    thresh_row = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(27,6)"))
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
        .first()
    )
    rich = c.filter(
        F.col("c_acctbal") > F.lit(float(thresh_row.avg_bal))
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01")
    idle_rich = rich.join(
        recent.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return idle_rich.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("c_custkey").alias("sum_keys"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_balance"),
    )


@_register(
    "q103_cube_revenue",
    oracle=f"""
    SELECT COALESCE(r.r_name, 'ALL') AS regiao,
           COALESCE(CAST(year(o.o_orderdate) AS VARCHAR), 'ALL') AS ano,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(year(o.o_orderdate))
                AS BIGINT) AS grouping_id,
           COUNT(*) AS n_orders,
           {_osum("o.o_totalprice", "revenue")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r.r_name, year(o.o_orderdate))
    """,
)
def q103_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, order year): all four grains — cell, per-region,
    per-year, grand total — in ONE Expand pass over one fact scan, with
    GROUPING() disambiguating genuine NULL keys from subtotal rows (the
    reason COALESCE-to-'ALL' alone is not a correct rollup encoding).

    Completes the grouping-sets family next to q54's ROLLUP: CUBE is the
    cross-tab variant (2ⁿ grains). Same scale shape: Expand multiplies
    rows by #grains BEFORE the single hash aggregate — no per-grain
    rescans, one shuffle.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "r_name",
            F.year("o_orderdate").alias("__ano"),
            "o_totalprice",
        )
    )
    cubed = base.cube("r_name", "__ano").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "revenue"),
        F.grouping_id("r_name", "__ano").cast("bigint").alias("grouping_id"),
    )
    return cubed.select(
        F.coalesce("r_name", F.lit("ALL")).alias("regiao"),
        F.coalesce(F.col("__ano").cast("string"), F.lit("ALL")).alias("ano"),
        "grouping_id",
        "n_orders",
        "revenue",
    )


@_register(
    "q105_value_positions",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment, c.c_custkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS total_spend
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ),
    pos AS (
        SELECT c_mktsegment,
               PERCENT_RANK() OVER w AS pr,
               CUME_DIST() OVER w AS cd,
               NTILE(10) OVER w AS decile
        FROM spend
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY total_spend DESC, c_custkey ASC)
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(decile) AS BIGINT) AS sum_deciles,
           CAST(SUM(CAST(pr AS DECIMAL(27,6))) AS DOUBLE) AS sum_pr,
           CAST(SUM(CAST(cd AS DECIMAL(27,6))) AS DOUBLE) AS sum_cd
    FROM pos GROUP BY c_mktsegment
    """,
)
def q105_value_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions — percent_rank, cume_dist,
    ntile(10) — over per-customer spend within each market segment,
    completing the ranking family next to row_number (q10/q61) and rank
    percentiles (q58). The window order is total (spend desc, custkey
    asc), so positions are deterministic; the audit folds them through
    exact decimals.

    Scale notes: positions are computed over the customer-grain aggregate
    (|customers| rows), never raw orders; one shuffle to the spend grain,
    one segment-partitioned sort.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    pos = spend.select(
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )
    return pos.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("decile").cast("bigint").alias("sum_deciles"),
        F.sum(F.col("pr").cast("decimal(27,6)")).cast("double").alias("sum_pr"),
        F.sum(F.col("cd").cast("decimal(27,6)")).cast("double").alias("sum_cd"),
    )


@_register(
    "q106_latest_order_profile",
    oracle="""
    WITH scored AS (
        SELECT o_custkey,
               o_orderkey,
               o_totalprice,
               (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                   * 1000000000000 + o_orderkey AS recency_key
        FROM orders
    ),
    latest AS (
        SELECT o_custkey,
               arg_max(o_orderkey, recency_key) AS latest_orderkey,
               arg_max(o_totalprice, recency_key) AS latest_totalprice,
               COUNT(*) AS n_orders
        FROM scored GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(l.n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(l.latest_orderkey) AS BIGINT) AS sum_latest_ids,
           CAST(SUM(CAST(l.latest_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS latest_revenue
    FROM latest l JOIN customer c ON c.c_custkey = l.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q106_latest_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation (``max_by``): each customer's LATEST order in one
    hash aggregate — no rank window, no self-join. The classic
    latest-row-per-key problem solved the cheap way: max_by carries the
    payload with the max of a totally-ordered recency key
    (epoch-days·10¹² + orderkey breaks same-day ties deterministically, overflow-free: days < 10⁵, orderkey < 10¹²), so one
    map-side-combinable aggregate replaces the row_number()==1 pattern
    (which must SORT every partition). Latest-order ids and revenue are
    then profiled per market segment.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    recency = (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
        ).cast("bigint")
        * F.lit(1_000_000_000_000)
        + F.col("o_orderkey")
    )
    latest = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            recency.alias("recency_key"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "recency_key").alias("latest_orderkey"),
            F.max_by("o_totalprice", "recency_key").alias("latest_totalprice"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return (
        latest.join(c, latest.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("total_orders"),
            F.sum("latest_orderkey").alias("sum_latest_ids"),
            F.sum(F.col("latest_totalprice").cast("decimal(27,6)"))
            .cast("double")
            .alias("latest_revenue"),
        )
    )


@_register(
    "q107_nation_rollcall",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           md5(string_agg(n.n_name, ',' ORDER BY n.n_name)) AS nations_md5
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q107_nation_rollcall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): the alphabetical nation roster
    per region. ``collect_list`` order is nondeterministic under parallel
    merge, so determinism comes from sorting WITHIN the collected row
    (array_sort) before joining — the same discipline as q101's posting
    lists; DuckDB replays it with ORDER BY inside string_agg. Rosters are
    dimension-sized; a fact-sized rollcall would cap or sketch instead
    (collect_list materializes the group in memory — never on raw facts).
    """
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    rolled = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
        )
    )
    return rolled.select(
        "r_name", "n_nations", "nations", F.md5("nations").alias("nations_md5")
    )


@_register(
    "q124_grouping_sets",
    oracle=f"""
    SELECT CAST(GROUPING(r.r_name) AS BIGINT) AS g_region,
           CAST(GROUPING(c.c_mktsegment) AS BIGINT) AS g_segment,
           r.r_name, c.c_mktsegment,
           COUNT(*) AS n_orders,
           {_osum("o.o_totalprice", "revenue")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment))
    """,
)
def q124_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC grouping sets — order volume by region AND by market
    segment in ONE pass: `GROUP BY GROUPING SETS ((region), (segment))`.
    ROLLUP (q54) and CUBE (q103) cover the hierarchical/full-lattice
    cases; this is the hand-picked-grains face of the same Expand
    operator, the shape dashboard fan-out queries take when the grains
    share no hierarchy.

    Scale notes: one Expand doubles the fact stream pre-aggregation (2
    sets), then one shuffle carries both grains' partials — versus two
    full scans + two shuffles for the UNION ALL formulation. GROUPING()
    flags disambiguate the all-NULL grain rows exactly as in the oracle.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupingSets(
            [["r_name"], ["c_mktsegment"]], "r_name", "c_mktsegment"
        )
        .agg(
            # grouping() is only resolvable INSIDE the grouping-sets
            # aggregate (it reads the Expand's spill mask), not above it
            F.grouping("r_name").cast("long").alias("g_region"),
            F.grouping("c_mktsegment").cast("long").alias("g_segment"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            "g_region",
            "g_segment",
            "r_name",
            "c_mktsegment",
            "n_orders",
            "revenue",
        )
    )


@_register(
    "q125_bag_set_ops",
    oracle="""
    WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT 'common_demand' AS op, COUNT(*) AS n_rows,
           CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) AS sum_keys
    FROM (SELECT o_custkey FROM y95 INTERSECT ALL SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'excess_95', COUNT(*), CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT)
    FROM (SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y96)
    """,
)
def q125_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set algebra (INTERSECT ALL / EXCEPT ALL) on yearly
    order multisets: a customer with 5 orders in 1995 and 3 in 1996
    contributes 3 rows to the intersection and 2 to the difference —
    multiplicity is the signal (repeat-demand analysis), which the
    DISTINCT set ops of q59 erase.

    Scale notes: Spark's intersectAll/exceptAll aggregate each side to
    (key, count) grains and join those — the shuffle carries one row per
    DISTINCT key per side, not per duplicate, then re-expands by
    min(m₁,m₂) / max(m₁−m₂,0). Same two-pruned-scans shape as q59.
    """
    o = load_table(spark, "orders", sf_dir)

    def keys(year: int) -> DataFrame:
        return o.filter(F.year("o_orderdate") == year).select("o_custkey")

    y95, y96 = keys(1995), keys(1996)

    def tally(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("o_custkey"), F.lit(0)).alias("sum_keys"),
        ).select(F.lit(label).alias("op"), "n_rows", "sum_keys")

    return tally(y95.intersectAll(y96), "common_demand").unionAll(
        tally(y95.exceptAll(y96), "excess_95")
    )


@_register(
    "q129_order_lifecycle",
    oracle="""
    WITH framed AS (
        SELECT o_custkey,
               ROW_NUMBER() OVER w AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS last_order,
               COALESCE(NTH_VALUE(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING), -1) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, n_orders, first_order, last_order, second_order
    FROM framed WHERE rn = 1
    """,
)
def q129_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window frames — FIRST_VALUE / LAST_VALUE / NTH_VALUE over
    each customer's chronological order history (the window face q105's
    relative-position functions and q106's max_by argmax don't cover):
    first, latest, and second-ever order per customer in ONE windowed pass.

    Determinism: the frame order is (o_orderdate, o_orderkey) — a total
    order. LAST/NTH use the explicit full frame (the default frame stops
    at CURRENT ROW, silently returning the current row's value — the
    classic positional-window bug, made explicit here for both engines).
    Single-order customers yield second_order = -1 (COALESCE both sides;
    a NULL int column would mutate to float64 through pandas).

    Scale notes: one shuffle on o_custkey; all four functions share one
    sort; the rn=1 filter collapses to one row per customer in the same
    pass — no join-back, no second window.
    """
    o = load_table(spark, "orders", sf_dir)
    order_w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    full = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        o.select(
            "o_custkey",
            F.row_number().over(order_w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("o_custkey"))
            .alias("n_orders"),
            F.first("o_orderkey").over(full).alias("first_order"),
            F.last("o_orderkey").over(full).alias("last_order"),
            F.coalesce(
                F.nth_value("o_orderkey", 2).over(full), F.lit(-1)
            ).alias("second_order"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "n_orders", "first_order", "last_order", "second_order"
        )
    )


@_register(
    "q134_rank_with_ties",
    oracle="""
    WITH per_cust AS (
        SELECT n.n_name, c.c_custkey, COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_custkey
    )
    SELECT n_name, c_custkey, n_orders,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
    FROM per_cust
    WINDOW w AS (PARTITION BY n_name ORDER BY n_orders DESC)
    QUALIFY RANK() OVER w <= 3
    """,
)
def q134_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-per-nation customers by order count under TIE-INCLUSIVE
    ranking — RANK (gaps) and DENSE_RANK (no gaps) semantics, which
    row_number-based top-k (q10/q61) cannot express: order counts are
    small integers, so ties are the NORM, and every tied customer
    surfaces (group sizes exceed 3 where ties straddle the cut).

    Determinism without a tiebreak column: the rank depends only on
    n_orders (exact integers), and ALL rows at a surviving rank are kept
    — so the result SET is deterministic even though peer order isn't.

    Scale notes: one shuffle to the (nation, customer) grain, one window
    shuffle on nation; the rank filter prunes before any further join.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("n_orders"))
    return (
        per_cust.select(
            "n_name",
            "c_custkey",
            "n_orders",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@_register(
    "q135_moving_average",
    oracle="""
    WITH monthly AS (
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS ano,
               CAST(month(o.o_orderdate) AS BIGINT) AS mes,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, year(o.o_orderdate), month(o.o_orderdate)
    )
    SELECT n_name, ano, mes, revenue,
           (revenue
            + COALESCE(LAG(revenue, 1) OVER w, 0)
            + COALESCE(LAG(revenue, 2) OVER w, 0))
           / (1 + CASE WHEN LAG(revenue, 1) OVER w IS NULL THEN 0 ELSE 1 END
                + CASE WHEN LAG(revenue, 2) OVER w IS NULL THEN 0 ELSE 1 END)
               AS trailing_3mo
    FROM monthly
    WINDOW w AS (PARTITION BY n_name ORDER BY ano, mes)
    """,
)
def q135_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-month trailing revenue average per nation — the ROWS-frame moving
    aggregate, expressed as explicit LAG terms rather than
    ``avg().over(rowsBetween(-2, 0))``: windowed AVG accumulates in
    frame-internal order (Spark: sliding accumulate; DuckDB: segment
    tree), so its float sum is NOT cross-engine-deterministic — three
    explicit lags added in one fixed expression order are. Same plan
    shape (one window sort), bit-stable result.

    Scale notes: aggregate to the (nation, month) grain FIRST (the moving
    window then sorts ~|nations|·|months| rows, not orders); one shuffle
    for the grain, one for the window partition.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("ano"),
            F.month("o_orderdate").cast("bigint").alias("mes"),
        )
        .agg(dsum(F.col("o_totalprice"), "revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("ano", "mes")
    l1 = F.lag("revenue", 1).over(w)
    l2 = F.lag("revenue", 2).over(w)
    denom = (
        F.lit(1)
        + F.when(l1.isNull(), 0).otherwise(1)
        + F.when(l2.isNull(), 0).otherwise(1)
    )
    return monthly.select(
        "n_name",
        "ano",
        "mes",
        "revenue",
        (
            (F.col("revenue") + F.coalesce(l1, F.lit(0.0)) + F.coalesce(l2, F.lit(0.0)))
            / denom
        ).alias("trailing_3mo"),
    )


@_register(
    "q138_yoy_growth",
    oracle="""
    WITH yearly AS (
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS ano,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, year(o.o_orderdate)
    )
    SELECT n_name, ano, n_orders, revenue,
           COALESCE(revenue / LAG(revenue) OVER (
               PARTITION BY n_name ORDER BY ano) - 1.0, -999.0) AS yoy_growth
    FROM yearly
    """,
)
def q138_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the period-comparison
    ratio (this/prev − 1) with an explicit −999 sentinel for each
    nation's first year (a NULL double survives the hash, but the
    sentinel keeps the growth column total so downstream filters never
    need three-valued logic).

    Determinism: yearly revenues are decimal-exact; the growth ratio is
    one division of two identical doubles per row; LAG over (nation, ano)
    is a total order.

    Scale notes: aggregate to |nations|·|years| BEFORE the window — the
    lag sorts dozens of rows per nation, not orders; one grain shuffle,
    one window shuffle.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("ano"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("ano")
    return yearly.select(
        "n_name",
        "ano",
        "n_orders",
        "revenue",
        F.coalesce(
            F.col("revenue") / F.lag("revenue").over(w) - 1.0, F.lit(-999.0)
        ).alias("yoy_growth"),
    )


# ---------------------------------------------------------------------------
# q141 — Z-order (Morton) layout audit: multi-dimensional data clustering
# for file skipping. The reference's only physical tuning is 23 single-
# column b-tree indexes (sql/cria_indices_dw.sql:9-37); at 100 TB the
# columnar equivalent is LAYOUT, and Z-ordering is the standard answer when
# queries filter on TWO high-cardinality columns (Delta OPTIMIZE ZORDER BY).
# The query computes the interleave and audits per-bucket bounding boxes —
# the oracle replays the identical bit arithmetic; sources/formats.py
# write_zordered materializes the layout and the pytest checks real parquet
# footers.
# ---------------------------------------------------------------------------

from etl_globalretail_spark.sources.formats import morton_key, morton_sql  # noqa: E402
from etl_globalretail_spark.sources.artifacts import materialize

_Z_BUCKETS = 16


@_register(
    "q141_zorder_layout",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey, l_suppkey,
               {morton_sql('l_partkey', 'l_suppkey')} AS zval,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    b AS (
        SELECT l_partkey, l_suppkey,
               CAST(NTILE({_Z_BUCKETS}) OVER (
                   ORDER BY zval, l_orderkey, l_linenumber) AS BIGINT)
                   AS bucket
        FROM z
    )
    SELECT bucket,
           COUNT(*) AS cnt,
           CAST(MIN(l_partkey) AS BIGINT) AS p_min,
           CAST(MAX(l_partkey) AS BIGINT) AS p_max,
           CAST(MIN(l_suppkey) AS BIGINT) AS s_min,
           CAST(MAX(l_suppkey) AS BIGINT) AS s_max,
           CAST((MAX(l_partkey) - MIN(l_partkey) + 1)
                * (MAX(l_suppkey) - MIN(l_suppkey) + 1) AS BIGINT) AS box_area
    FROM b GROUP BY bucket
    """,
)
def q141_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve bucket audit over lineitem (l_partkey × l_suppkey): each of
    the {16} Z-ordered buckets reports its row count and (partkey, suppkey)
    bounding box. Z-ordering makes every box SMALL IN BOTH dimensions —
    Σ box_area ≪ buckets × global area — which is exactly why per-file
    footer min/max can skip files for predicates on either column. A
    single-column sort would give p-tight but full-range-s boxes.

    Scale notes: the interleave is a map-side bit expression; production
    placement uses ``repartitionByRange(z)`` (sampling-based, no global
    sort). The deterministic bucket id the driver compare needs comes from
    the two-phase distributed rank (``operators.ranks.global_row_number``:
    range-partition on the z total order, per-partition row_number, add
    per-partition offsets) — never a single-task global window — with
    NTILE reconstructed from (rank, n) by its definition: the first
    n mod K buckets hold ⌈n/K⌉ rows, the rest ⌊n/K⌋.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    z = li.withColumn("zval", morton_key("l_partkey", "l_suppkey"))
    ranked, n = global_row_number(
        z,
        [("zval", "asc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
        out="rn",
    )
    q, r = divmod(n, _Z_BUCKETS)
    cut = r * (q + 1)  # last rank inside the ⌈n/K⌉-sized buckets
    # max(q, 1): the else branch is unreachable when q == 0 (then cut == n)
    # but its divisor must still be nonzero for ANSI planning.
    bucket = (
        F.when(F.col("rn") <= cut, F.expr(f"(rn - 1) div {q + 1} + 1"))
        .otherwise(F.expr(f"{r} + 1 + (rn - {cut} - 1) div {max(q, 1)}"))
        .cast("long")
    )
    b = ranked.withColumn("bucket", bucket)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("l_partkey").cast("long").alias("p_min"),
        F.max("l_partkey").cast("long").alias("p_max"),
        F.min("l_suppkey").cast("long").alias("s_min"),
        F.max("l_suppkey").cast("long").alias("s_max"),
        ((F.max("l_partkey") - F.min("l_partkey") + 1)
         * (F.max("l_suppkey") - F.min("l_suppkey") + 1))
        .cast("long").alias("box_area"),
    )


# ---------------------------------------------------------------------------
# q145 — group-wise OLS regression: the simplest "ML-ish" aggregate Spark
# has no built-in for (regr_slope exists in ANSI SQL but not PySpark's
# function surface, and its naive double accumulation isn't cross-engine
# stable anyway). Sufficient statistics (n, Σx, Σy, Σxy, Σx²) are kept in
# EXACT decimals end-to-end — x is a small year index, y a decimal revenue
# sum — so the only floating-point operations are the final slope/intercept
# divisions (single correctly-rounded IEEE ops, portable per the q26/q122
# recipe). The same shape distributes trivially: one groupBy computes every
# group's regression in a single pass, the 100 TB answer to "fit a line per
# key" without per-group collect or MLlib.
# ---------------------------------------------------------------------------


@_register(
    "q145_revenue_trend_ols",
    oracle="""
    WITH yearly AS (
        SELECT n.n_name,
               CAST(EXTRACT(year FROM o.o_orderdate) - 1992 AS BIGINT) AS x,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, x
    ),
    stats AS (
        SELECT n_name,
               COUNT(*) AS n,
               SUM(x) AS sx,
               SUM(x * x) AS sxx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM yearly GROUP BY n_name
    ),
    fit AS (
        SELECT n_name, n, sx, sy,
               CAST(n * sxy - sx * sy AS BIGINT) AS num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den
        FROM stats
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_years,
           CAST(CASE WHEN den = 0 THEN 0.0
                ELSE CAST(num AS DOUBLE) / CAST(den * 100 AS DOUBLE)
           END AS DOUBLE) AS slope,
           CAST(CASE WHEN den = 0 THEN 0.0
                ELSE (CAST(sy AS DOUBLE) / 100.0
                      - (CAST(num AS DOUBLE) / CAST(den * 100 AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)
           END AS DOUBLE) AS intercept
    FROM fit
    """,
)
def q145_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation least-squares revenue trend over order years: slope and
    intercept of yearly revenue vs year index, fitted for every nation in
    ONE aggregation pass over sufficient statistics — the distributed
    answer to "fit a line per key" without per-group collect or MLlib.

    Determinism contract (learned the hard way): decimal×decimal products
    here exceed precision 38, where Spark silently reduces scale and DuckDB
    silently promotes to DOUBLE — a last-ulp slope divergence. So the
    statistics live in integer floor-cents (floor(price·100) — floor, not
    CAST, because double→int CAST truncates in Spark but rounds in DuckDB):
    n, Σx,
    Σx², Σy, Σxy and the regression numerator/denominator are all exact
    int64; slope and intercept are then a fixed sequence of individually
    correctly-rounded IEEE double ops, bit-identical across engines.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") - 1992).cast("long").alias("x"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    stats = yearly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    fit = stats.select(
        "n_name", "n", "sx", "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    slope = F.col("num").cast("double") / (F.col("den") * 100).cast("double")
    intercept = (
        F.col("sy").cast("double") / F.lit(100.0)
        - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    zero = F.col("den") == 0
    return fit.select(
        "n_name",
        F.col("n").cast("long").alias("n_years"),
        F.when(zero, F.lit(0.0)).otherwise(slope).alias("slope"),
        F.when(zero, F.lit(0.0)).otherwise(intercept).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q147 — frequent-pair mining (market-basket co-occurrence): the first pass
# of FP-growth/Apriori, run exactly. Pairs are generated per order (the
# natural blocking key — never a corpus-wide cross join); the per-order
# item-set is small, so the self-join blowup is Σ C(k,2) per basket, and
# support counting is a combiner-reduced wordcount on the pair key.
# ---------------------------------------------------------------------------


@_register(
    "q147_copurchase_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    c AS (
        SELECT part_a, part_b, COUNT(*) AS support
        FROM pairs GROUP BY part_a, part_b
    ),
    ranked AS (
        SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY support DESC, part_a, part_b) AS BIGINT) AS rank
        FROM c
    )
    SELECT part_a, part_b, support, rank FROM ranked WHERE rank <= 25
    """,
)
def q147_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 co-purchased part pairs by basket support — exact frequent-
    pair mining. DISTINCT (order, part) first (multiplicity within one
    basket is not co-occurrence), pair generation as an orderkey-blocked
    self-join (shuffle on the basket key both sides — AQE reuses one
    exchange), combiner-reduced support counts, total-ordered top-k.

    Scale notes: the per-basket quadratic term is bounded by basket size
    (≈4 items in this schema; production pipelines cap or top-N the basket
    before pairing, exactly as q80 blocks fuzzy matching). No corpus-wide
    cross product ever exists.
    """
    li = load_table(spark, "lineitem", sf_dir)
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "ok").filter(F.col("part_a") < F.col("part_b"))
    counts = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("support")
    )
    # bounded top-k (TakeOrderedAndProject + rank over <= 25 rows) — the
    # pair-grain support frame never funnels through a single-task window
    return global_topk(
        counts,
        [("support", "desc"), ("part_a", "asc"), ("part_b", "asc")],
        25,
        out="rank",
    ).select(
        "part_a", "part_b",
        F.col("support").cast("long").alias("support"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q148 — behavioral transition matrix (first-order Markov counts): for each
# user's time-ordered event stream, count type→type transitions. The lag
# window rides ONE shuffle on user_id; the matrix aggregation collapses to
# |types|² rows. The probability column is an exact-integer ratio (one
# double division) — portable.
# ---------------------------------------------------------------------------


@_register(
    "q148_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    tot AS MATERIALIZED (
        SELECT prev_type, SUM(n) AS row_total FROM t GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type,
           CAST(t.n AS BIGINT) AS n_transitions,
           CAST(t.n AS DOUBLE) / CAST(tot.row_total AS DOUBLE) AS p
    FROM t JOIN tot ON t.prev_type = tot.prev_type
    """,
)
def q148_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts and probabilities over per-user
    event streams: lag(event_type) ordered by (ts, event_id) — the total
    order both engines share — then a |types|²-row matrix with exact counts
    and one-division probabilities. The sequence-model statistic every
    behavioral/clickstream pipeline starts from.
    """
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        t.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type", "next_type",
            F.col("n").cast("long").alias("n_transitions"),
            (F.col("n").cast("double") / F.col("row_total").cast("double"))
            .alias("p"),
        )
    )


# ---------------------------------------------------------------------------
# q149 — equi-depth range-boundary planner: the explicit version of what
# repartitionByRange's sampling pass estimates. K−1 exact order-statistic
# boundaries give perfectly balanced range buckets for layout
# (write_range_sorted), range-shuffle planning, or histogram equi-depth
# binning; the audit emits each boundary with its realized bucket count,
# proving balance. Production uses the sampled estimate (one pass, no
# global sort); this exact form is the ground truth it approximates AND a
# usable boundary source when the column is already aggregated/small.
# ---------------------------------------------------------------------------

_Q149_K = 16


@_register(
    "q149_range_boundaries",
    oracle=f"""
    WITH ranked AS (
        SELECT l_extendedprice AS v,
               ROW_NUMBER() OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS rn,
               COUNT(*) OVER () AS n
        FROM lineitem
    ),
    b AS (
        SELECT CAST((rn * {_Q149_K}) // n AS BIGINT) -
               CASE WHEN (rn * {_Q149_K}) % n = 0 THEN 1 ELSE 0 END
                   AS bucket,
               v
        FROM ranked
    )
    SELECT bucket, COUNT(*) AS cnt,
           MIN(v) AS lo, MAX(v) AS hi
    FROM b GROUP BY bucket
    """,
)
def q149_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth bucketing of lineitem prices into {K} buckets:
    bucket(r) = ⌈r·K/n⌉−1 over the total order (value, orderkey,
    linenumber); the output is each bucket's row count (within 1 of n/K by
    construction) and its [lo, hi] value range — i.e. the K−1 boundary
    values AND the balance proof in one frame.

    The exact global rank comes from the two-phase distributed device
    (``operators.ranks.global_row_number``): range-partition on the
    (value, orderkey, linenumber) total order, per-partition row_number,
    add per-partition offsets — no single-task window; ``n`` is a free
    by-product of the offsets job. The production path samples boundaries
    (repartitionByRange) and this exact tier is its ground truth.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    ranked, n = global_row_number(
        li,
        [("v", "asc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
        out="rn",
    )
    n = max(n, 1)  # empty-frame guard: bucket expr is never evaluated then
    bucket = (
        F.expr(f"(rn * {_Q149_K}) div {n}")
        - F.when(F.expr(f"(rn * {_Q149_K}) % {n} = 0"), 1).otherwise(0)
    ).cast("long")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q154 — triangle counting: the canonical "joins as graph analytics"
# workload (clustering-coefficient numerator, community cohesion). Input
# graph: the co-purchase part graph (q147's pairs at support ≥ 2 — a real
# derived graph, not a toy fixture). The count is the standard two-join
# enumeration with the orientation trick: edges directed low→high id, so
# each triangle {a<b<c} is counted EXACTLY once as (a→b, b→c, a→c) and the
# join explosion is bounded by the out-degree of low-id endpoints.
# ---------------------------------------------------------------------------


def _q154_edges_sql() -> str:
    return """
        SELECT part_a AS u, part_b AS v
        FROM (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS support
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY part_a, part_b
        ) WHERE support >= 2
    """



_EDGE_MEMO_ATTR = "_etl_globalretail_edge_memo"


def co_purchase_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support≥2 co-purchase edge list (u < v, support) as a
    session-memoized EXECUTOR-RESIDENT artifact — the q66 verified-pairs
    stance applied to the graph family. The basket self-join + support
    aggregate (the expensive part: quadratic in basket size) runs ONCE
    per (session, corpus); q154 triangles, q170 coefficients, q179
    PageRank etc. then pay |E|-sized work only.

    The artifact is a `localCheckpoint(eager=True)` DataFrame: the edge
    rows live in executor block storage (never on the driver), lineage
    to the corpus scan is truncated so every downstream graph job starts
    from the materialized blocks, and the blocks are released by the
    ContextCleaner when the memoized frame is dropped with the session.
    This is the single-session face of the 100 TB answer (a bucketed
    edge TABLE written once via sources/readers.write_bucketed) — same
    plan shape, storage swapped for the cluster tier. The memo lives on
    the SparkSession object itself (not a module dict keyed by
    `id(spark)`), so a GC'd session can never alias a stale artifact.
    """
    memo = getattr(spark, _EDGE_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _EDGE_MEMO_ATTR, memo)
    if sf_dir not in memo:
        li = load_table(spark, "lineitem", sf_dir)
        items = li.select("l_orderkey", "l_partkey").distinct()
        a = items.select(F.col("l_orderkey").alias("ok"),
                         F.col("l_partkey").alias("pa"))
        b = items.select(F.col("l_orderkey").alias("ok"),
                         F.col("l_partkey").alias("pb"))
        und = (
            a.join(b, "ok")
            .filter(F.col("pa") < F.col("pb"))
            .groupBy(F.col("pa").alias("u"), F.col("pb").alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .filter(F.col("support") >= 2)
            .select(
                F.col("u").cast("long").alias("u"),
                F.col("v").cast("long").alias("v"),
                F.col("support"),
            )
        )
        memo[sf_dir] = und.transform(materialize)
    return memo[sf_dir]


def co_purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v) face of the same memoized executor-resident artifact."""
    return co_purchase_edges_weighted(spark, sf_dir).select("u", "v")


@_register(
    "q154_triangle_count",
    oracle=f"""
    WITH e AS ({_q154_edges_sql()}),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(COALESCE(SUM(a + b + c), 0) AS BIGINT) AS vertex_checksum
    FROM tri
    """,
)
def q154_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the support≥2 co-purchase graph: one row with the
    triangle count, edge count, and an id-pinned vertex checksum. Two
    self-joins on the low→high-oriented edge list — each triangle counted
    once; the wedge join (e1.v = e2.u) shuffles on the shared vertex and
    the closing join verifies (e1.u, e2.v) ∈ E.

    Scale notes: orientation bounds the wedge fan-out by low-endpoint
    out-degree; production graph engines additionally order by TOTAL
    degree (breaks high-degree hubs) — same plan shape, different edge
    orientation rule.
    """
    edges = co_purchase_edges(spark, sf_dir)  # memoized checkpointed artifact
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    wedges = e1.join(e2, F.col("b") == F.col("b2"))
    tri = wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    n_edges = edges.count()  # reads the checkpointed blocks, not the corpus
    row = tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.coalesce(
            F.sum(F.col("a") + F.col("b") + F.col("c")), F.lit(0)
        ).cast("long").alias("vertex_checksum"),
    ).collect()[0]
    return spark.createDataFrame(
        [(int(row["n_triangles"]), int(n_edges), int(row["vertex_checksum"]))],
        "n_triangles long, n_edges long, vertex_checksum long",
    )


# ---------------------------------------------------------------------------
# q162 — contingency / independence audit (chi-square cells): is event
# type independent of day-of-week? The workhorse sanity check for A/B
# splits, time-based sampling bias, and scraper scheduling artifacts.
# Output is PER CELL (observed, expected, contribution): cells are a
# fixed sequence of IEEE ops on exact integers (portable), whereas a
# summed χ² statistic would be an order-dependent double sum — the
# per-cell frame is both more useful (which cell deviates) and
# cross-engine stable; the driver can sum 35 rows if it wants the scalar.
# ---------------------------------------------------------------------------


@_register(
    "q162_type_weekday_contingency",
    oracle="""
    WITH o AS (
        -- DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based
        SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               COUNT(*) AS obs
        FROM events GROUP BY event_type, dow
    ),
    r AS (SELECT event_type, SUM(obs) AS rt FROM o GROUP BY event_type),
    c AS (SELECT dow, SUM(obs) AS ct FROM o GROUP BY dow),
    n AS (SELECT SUM(obs) AS tot FROM o)
    SELECT o.event_type, o.dow, CAST(o.obs AS BIGINT) AS observed,
           CAST(r.rt * c.ct AS DOUBLE) / CAST(n.tot AS DOUBLE) AS expected,
           (CAST(o.obs AS DOUBLE)
            - CAST(r.rt * c.ct AS DOUBLE) / CAST(n.tot AS DOUBLE))
           * (CAST(o.obs AS DOUBLE)
              - CAST(r.rt * c.ct AS DOUBLE) / CAST(n.tot AS DOUBLE))
           / (CAST(r.rt * c.ct AS DOUBLE) / CAST(n.tot AS DOUBLE))
               AS contribution
    FROM o JOIN r ON o.event_type = r.event_type
           JOIN c ON o.dow = c.dow
           CROSS JOIN n
    """,
)
def q162_type_weekday_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square cells for event_type × day-of-week: observed counts,
    expected under independence (row·col/N), and each cell's χ²
    contribution. Marginals are broadcast back onto the |types|×|days|
    cell frame; DuckDB dayofweek (1=Sunday) matches Spark dayofweek under
    the pinned UTC session."""
    e = load_table(spark, "events", sf_dir)
    o = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    o = o.persist()  # feeds marginals AND the cell frame
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("tot"))
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("tot").cast("double")
    dev = F.col("obs").cast("double") - exp
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "dow",
            F.col("obs").cast("long").alias("observed"),
            exp.alias("expected"),
            (dev * dev / exp).alias("contribution"),
        )
    )


# ---------------------------------------------------------------------------
# q163 — group-wise Pearson correlation, on q145's integer-sufficient-
# statistics recipe (Spark's corr() accumulates doubles — order-dependent,
# not oracle-matchable). r = (nΣxy − ΣxΣy) / √(nΣx²−(Σx)²) / √(nΣy²−(Σy)²)
# with every Σ an exact int64 over floor-cent values; the three final ops
# (two correctly-rounded sqrts, divisions) are bit-identical across
# engines when written in the same order both sides.
# ---------------------------------------------------------------------------


@_register(
    "q163_discount_quantity_corr",
    oracle="""
    WITH q AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_quantity) AS BIGINT) AS x,
               CAST(FLOOR(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT flag, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM q GROUP BY flag
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                     THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                     / SQRT(CAST(n * syy - sy * sy AS DOUBLE))
           END AS DOUBLE) AS pearson_r
    FROM s
    """,
)
def q163_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs discount per return flag —
    "do bigger lines get deeper discounts?" — computed distributively from
    exact int64 moments in one aggregation pass (never Spark's
    double-accumulating corr())."""
    li = load_table(spark, "lineitem", sf_dir)
    q = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_quantity")).cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    s = q.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = num.cast("double") / F.sqrt(dx.cast("double")) / F.sqrt(dy.cast("double"))
    return s.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("long").alias("n_rows"),
        F.when((dx == 0) | (dy == 0), F.lit(0.0)).otherwise(r)
        .alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# q167 — exact ROC-AUC per group, the Mann-Whitney way: AUC =
# (Σ ranks(positives) − P(P+1)/2) / (P·N). Ranks over a shared total
# order (score, id) make ties deterministic; every statistic is an exact
# int64 and the final value is ONE double division — the model-eval
# aggregate every scoring pipeline needs, computed distributively without
# sklearn and without collecting scores.
# ---------------------------------------------------------------------------


@_register(
    "q167_group_auc",
    oracle="""
    WITH scored AS (
        SELECT event_type,
               CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END AS label,
               value AS score, event_id
        FROM events
    ),
    ranked AS (
        SELECT event_type, label,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY score, event_id
               ) AS BIGINT) AS rnk
        FROM scored
    ),
    s AS (
        SELECT event_type,
               CAST(SUM(label) AS BIGINT) AS p,
               CAST(COUNT(*) - SUM(label) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN label = 1 THEN rnk ELSE 0 END) AS BIGINT)
                   AS rank_sum
        FROM ranked GROUP BY event_type
    )
    SELECT event_type, p AS n_pos, n AS n_neg,
           CAST(CASE WHEN p = 0 OR n = 0 THEN 0.0
                ELSE CAST(rank_sum - (p * (p + 1)) / 2 AS DOUBLE)
                     / CAST(p * n AS DOUBLE)
           END AS DOUBLE) AS auc
    FROM s
    """,
)
def q167_group_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact AUC of `value` as a score against a
    deterministic synthetic label (event_id % 5 — the fixtures carry no
    labels; the operator is the product). Mann-Whitney rank formulation
    with integer rank sums and one division. An AUC of ~0.5 everywhere
    is itself the correct answer for an independent label — and the hash
    gate certifies the machinery.

    Scale shape: scores are continuous doubles, so the q290 value-grid
    collapse degenerates (every score distinct) — instead the per-type
    rank comes from the TWO-PHASE global rank (operators.ranks) over the
    total order (type, score, id): per-type rank = global rank − the
    type's exclusive row offset, so rank_sum folds as Σ grn − p·offset.
    A row_number window partitioned by ~5 event types would be a 5-task
    sort of the corpus (the low-cardinality sibling of the banned
    partition-less windows); the offset cumulation runs over the
    ≤|event_type| aggregate — bounded grain, whitelisted. Rank sums are
    decimal(38,0): they grow as N²/2 (the sf1 overflow class)."""
    from etl_globalretail_spark.operators.ranks import global_row_number

    e = load_table(spark, "events", sf_dir)
    scored = e.select(
        "event_type",
        (F.col("event_id") % 5 == 0).cast("long").alias("label"),
        F.col("value").alias("score"),
        "event_id",
    )
    ranked, _total = global_row_number(
        scored,
        [("event_type", "asc"), ("score", "asc"), ("event_id", "asc")],
        out="grn",
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("label").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n"),
        F.sum(
            F.when(F.col("label") == 1, F.col("grn")).otherwise(0)
            .cast("decimal(38,0)")
        ).alias("gsum"),
    )
    # exclusive row offset per type over the ≤|event_type|-row aggregate
    wt = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rows_t = (F.col("p") + F.col("n")).cast("decimal(38,0)")
    s = agg.select(
        "event_type", "p", "n",
        (F.col("gsum")
         - F.col("p").cast("decimal(38,0)")
         * (F.sum(rows_t).over(wt) - rows_t)).alias("rank_sum"),
    )
    auc = (
        (F.col("rank_sum") - (F.col("p") * (F.col("p") + 1)) / 2)
        .cast("double") / (F.col("p") * F.col("n")).cast("double")
    )
    return s.select(
        "event_type",
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        F.when((F.col("p") == 0) | (F.col("n") == 0), F.lit(0.0))
        .otherwise(auc).alias("auc"),
    )


# ---------------------------------------------------------------------------
# q168 — association rules from the pair supports (q147's second half):
# confidence(a→b) = supp(a,b)/supp(a) and lift = N·supp(a,b)/
# (supp(a)·supp(b)). All counts exact integers; each measure is one
# double division (lift's numerator/denominator multiplied in int64
# first) — the Apriori rule-generation step, distributively.
# ---------------------------------------------------------------------------


@_register(
    "q168_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_b AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
    supp1 AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM items
        GROUP BY l_partkey
    ),
    supp2 AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS s2
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING COUNT(*) >= 3
    )
    SELECT p.part_a, p.part_b, p.s2 AS pair_support,
           CAST(p.s2 AS DOUBLE) / CAST(sa.s AS DOUBLE) AS confidence,
           CAST(n_b.n * p.s2 AS DOUBLE) / CAST(sa.s * sb.s AS DOUBLE)
               AS lift
    FROM supp2 p
    JOIN supp1 sa ON p.part_a = sa.l_partkey
    JOIN supp1 sb ON p.part_b = sb.l_partkey
    CROSS JOIN n_b
    """,
)
def q168_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over baskets with pair support ≥ 3:
    confidence and lift from exact integer supports. The single-item
    support table is |parts| rows (broadcast); the basket count is a
    broadcast 1-row scalar; lift >1 ⇔ positive association."""
    li = load_table(spark, "lineitem", sf_dir)
    # Executor-resident materialization: the distinct item set feeds the
    # basket count, supp1, and both self-join sides — checkpoint once so
    # none of the four consumers re-scans the corpus, and the rule set is
    # returned LAZY (pair-set outputs are data-sized; no driver collect).
    items = (
        li.select("l_orderkey", "l_partkey").distinct()
        .transform(materialize)
    )
    n_baskets = items.select("l_orderkey").distinct().count()
    supp1 = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    a = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_b"))
    supp2 = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("s2"))
        .filter(F.col("s2") >= 3)
    )
    sa = supp1.select(F.col("l_partkey").alias("part_a"),
                      F.col("s").alias("sa"))
    sb = supp1.select(F.col("l_partkey").alias("part_b"),
                      F.col("s").alias("sb"))
    return (
        supp2.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            F.col("s2").alias("pair_support"),
            (F.col("s2").cast("double") / F.col("sa").cast("double"))
            .alias("confidence"),
            ((F.lit(n_baskets) * F.col("s2")).cast("double")
             / (F.col("sa") * F.col("sb")).cast("double")).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q169 — seasonality index: month-of-year revenue share vs the uniform
# expectation, the classic retail planning statistic (a December index of
# 1.4 = 40% over the average month). Ratio of two decimal-exact sums per
# cell (never an order-dependent double mean), scaled by 12 in integer
# space first.
# ---------------------------------------------------------------------------


@_register(
    "q169_seasonality_index",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mes,
               SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev,
               COUNT(*) AS n_orders
        FROM orders GROUP BY mes
    ),
    tot AS (SELECT SUM(rev) AS t FROM monthly)
    SELECT mes,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(12 * rev AS DOUBLE) / CAST(t AS DOUBLE) AS season_index
    FROM monthly, tot
    """,
)
def q169_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality of order revenue: per month-of-year, order
    count, exact revenue, and the index 12·rev_m/Σrev (1.0 = an average
    month). The monthly aggregate is 12 rows; the annual total attaches
    as a broadcast scalar (whitelisted bounded cross join)."""
    o = load_table(spark, "orders", sf_dir)
    monthly = o.groupBy(
        F.month("o_orderdate").cast("long").alias("mes")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    ).persist()  # rows AND the 1-row total — Catalyst won't dedupe
    tot = monthly.agg(F.sum("rev").alias("t"))
    return (
        monthly.crossJoin(F.broadcast(tot))
        .select(
            "mes",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("rev").cast("double").alias("revenue"),
            ((F.lit(12) * F.col("rev")).cast("double")
             / F.col("t").cast("double")).alias("season_index"),
        )
    )


# ---------------------------------------------------------------------------
# q170 — local clustering coefficient: per vertex, how close its
# neighborhood is to a clique (triangles_at_v / C(deg_v, 2)) — the
# node-level cohesion score under q154's global count. Triangles are
# enumerated once on the oriented edge list and then un-oriented (each
# triangle credits all three vertices); degrees come from the symmetric
# view. Coefficients are one double division over exact integers.
# ---------------------------------------------------------------------------


@_register(
    "q170_clustering_coefficient",
    oracle=f"""
    WITH e AS ({_q154_edges_sql()}),
    sym AS (
        SELECT u AS v, v AS w FROM e
        UNION ALL
        SELECT v AS v, u AS w FROM e
    ),
    deg AS MATERIALIZED (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY v),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tv AS (
        SELECT x.v, CAST(COUNT(*) AS BIGINT) AS t
        FROM (
            SELECT a AS v FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) x GROUP BY x.v
    )
    SELECT deg.v AS vertex, deg.d AS degree,
           CAST(COALESCE(tv.t, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN deg.d < 2 THEN 0.0
                ELSE CAST(2 * COALESCE(tv.t, 0) AS DOUBLE)
                     / CAST(deg.d * (deg.d - 1) AS DOUBLE)
           END AS DOUBLE) AS coefficient
    FROM deg LEFT JOIN tv ON deg.v = tv.v
    """,
)
def q170_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex clustering coefficient over the support≥2 co-purchase
    graph: degree, triangle membership count, and 2t/(d(d−1))."""
    edges = co_purchase_edges(spark, sf_dir)  # memoized checkpointed artifact
    sym = edges.select(F.col("u").alias("vx")).unionAll(
        edges.select(F.col("v").alias("vx"))
    )
    deg = sym.groupBy("vx").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e1 = edges.select(F.col("u").alias("ta"), F.col("v").alias("tb"))
    e2 = edges.select(F.col("u").alias("tb2"), F.col("v").alias("tc"))
    e3 = edges.select(F.col("u").alias("ta3"), F.col("v").alias("tc3"))
    tri = (
        e1.join(e2, F.col("tb") == F.col("tb2"))
        .join(e3, (F.col("ta") == F.col("ta3")) & (F.col("tc") == F.col("tc3")))
        .select("ta", "tb", "tc")
    )
    tv = (
        tri.select(F.col("ta").alias("vx"))
        .unionAll(tri.select(F.col("tb").alias("vx")))
        .unionAll(tri.select(F.col("tc").alias("vx")))
        .groupBy("vx")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    coef = (
        (2 * F.coalesce(F.col("t"), F.lit(0))).cast("double")
        / (F.col("d") * (F.col("d") - 1)).cast("double")
    )
    # Per-vertex output is graph-sized — returned lazy, no driver collect.
    return (
        deg.join(tv, "vx", "left")
        .select(
            F.col("vx").cast("long").alias("vertex"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(F.col("d") < 2, F.lit(0.0)).otherwise(coef)
            .cast("double").alias("coefficient"),
        )
    )


# ---------------------------------------------------------------------------
# q174 — Benford first-digit audit: the forensic screen for fabricated or
# systematically-generated amounts. Expected shares log10(1+1/d) are
# pre-computed CONSTANTS (embedded identically in both engines — no
# runtime log, which is not correctly-rounded-portable); observed shares
# are one division over exact counts.
# ---------------------------------------------------------------------------

_BENFORD = {
    1: 0.30102999566398120, 2: 0.17609125905568124,
    3: 0.12493873660829993, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}

# E-notation forces DuckDB to parse each literal directly as a DOUBLE
# (a plain decimal literal becomes DECIMAL(18,17) whose cast to double
# rounds differently in the last ulp — observed).
_BENFORD_SQL_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p!r}e0" for d, p in _BENFORD.items()
) + " END"


@_register(
    "q174_benford_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT c.d AS first_digit,
           CAST(c.n AS BIGINT) AS n_amounts,
           CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS observed_share,
           CAST({_BENFORD_SQL_CASE.replace('CASE d', 'CASE c.d')}
                AS DOUBLE) AS benford_share
    FROM c CROSS JOIN t
    """,
)
def q174_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First significant digit of order totals vs Benford's law: observed
    share per digit next to the theoretical constant. Synthetic uniform
    prices will NOT follow Benford — and showing that deviation is the
    audit working. First digit via integer→string (exact); shares via one
    division; expected values as shared literals."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        ).cast("long").alias("d")
    )
    c = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n")).persist()
    t = c.agg(F.sum("n").alias("tot"))
    benford = F.create_map(
        *[x for d, p in _BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("d").alias("first_digit"),
            F.col("n").cast("long").alias("n_amounts"),
            (F.col("n").cast("double") / F.col("tot").cast("double"))
            .alias("observed_share"),
            benford[F.col("d")].alias("benford_share"),
        )
    )


# ---------------------------------------------------------------------------
# q175 — Gini coefficient of revenue concentration per nation: how
# unequal customer spend is. G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over
# per-customer totals in exact floor-cents; the rank-weighted sum is
# int64 and the final value is one double ratio. The concentration
# metric behind "top-1% of customers drive X%" dashboards.
# ---------------------------------------------------------------------------


@_register(
    "q175_revenue_gini",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS nk, o.o_custkey AS ck,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY nk, ck
    ),
    ranked AS (
        SELECT nk, x,
               CAST(ROW_NUMBER() OVER (PARTITION BY nk ORDER BY x, ck)
                    AS BIGINT) AS r
        FROM spend
    ),
    s AS (
        -- rank-weighted spend grows as N^2 * avg_cents per nation:
        -- DuckDB accumulates in native HUGEINT (no BIGINT cast), Spark
        -- mirrors with decimal(38,0); numerator/denominator each take
        -- ONE exact-integer -> DOUBLE conversion before the division.
        SELECT nk, COUNT(*) AS n,
               SUM(x) AS sx,
               SUM(r * x) AS srx
        FROM ranked GROUP BY nk
    )
    SELECT nk AS nationkey,
           CAST(n AS BIGINT) AS n_customers,
           CAST(CASE WHEN sx = 0 THEN 0.0
                ELSE CAST(2 * srx - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE)
           END AS DOUBLE) AS gini
    FROM s
    """,
)
def q175_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer spend within each nation, from
    exact integer rank-weighted sums (ties broken on custkey — the shared
    total order). 0 = everyone spends equally; →1 = one whale."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.col("o_custkey").alias("ck")
        )
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
             .cast("long").alias("x"))
    )
    wr = Window.partitionBy("nk").orderBy("x", "ck")
    ranked = spend.select(
        "nk", "x", F.row_number().over(wr).cast("long").alias("r")
    )
    # Σ r·x grows as N²·avg_cents per nation — int64 dies near 3e9
    # customers; decimal(38,0) is exact to ~1e19² and mirrors the
    # oracle's native HUGEINT sums (numerator and denominator each
    # convert to double ONCE, from the same exact integers).
    dx = F.col("x").cast("decimal(38,0)")
    s = ranked.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(F.col("r").cast("decimal(38,0)") * dx).alias("srx"),
    )
    dn = F.col("n").cast("decimal(38,0)")
    gini = (
        (2 * F.col("srx") - (dn + 1) * F.col("sx")).cast("double")
        / (dn * F.col("sx")).cast("double")
    )
    return s.select(
        F.col("nk").alias("nationkey"),
        F.col("n").cast("long").alias("n_customers"),
        F.when(F.col("sx") == 0, F.lit(0.0)).otherwise(gini).alias("gini"),
    )


# ---------------------------------------------------------------------------
# q176 — skyline (Pareto frontier): customers not dominated on
# (total spend, last order date) — "no one both spends more AND ordered
# more recently". Engines don't ship a skyline operator; the 2-D case
# collapses to ONE window pass: over distinct points sorted by
# (spend desc, day desc), a point is on the frontier iff its day exceeds
# the running max of every preceding point (preceding = strictly more
# spend, or equal spend and strictly later day — exactly the dominators).
# The oracle runs the TEXTBOOK quadratic NOT EXISTS dominance predicate —
# hash equality is the proof that the O(n log n) window form computes
# dominance, the same decorrelation-style certificate as q96.
# ---------------------------------------------------------------------------


@_register(
    "q176_customer_skyline",
    oracle="""
    WITH pts AS (
        SELECT o_custkey AS ck,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend,
               CAST(MAX(epoch_us(o_orderdate)) // 86400000000 AS BIGINT)
                   AS last_day
        FROM orders GROUP BY ck
    )
    SELECT p.ck AS custkey, p.spend, p.last_day
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.spend >= p.spend AND q.last_day >= p.last_day
          AND (q.spend > p.spend OR q.last_day > p.last_day)
    )
    """,
)
def q176_customer_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal customers on (exact floor-cent spend, last order
    day): the window-pass skyline. Distinct (spend, day) points carry
    their member customers, the frontier test is one running max, and
    frontier points re-expand to customers."""
    o = load_table(spark, "orders", sf_dir)
    pts = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("spend"),
        F.expr("CAST(max(unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
               " div 86400000000 AS LONG)").alias("last_day"),
    )
    grain = pts.groupBy("spend", "last_day").agg(
        F.collect_list("ck").alias("cks")
    )
    # exclusive running max over the global (spend desc, last_day desc)
    # order via the two-phase distributed prefix device — the distinct
    # point grain is customer-sized, so no single-task window here either
    frontier = global_prefix_agg(
        grain,
        [("spend", "desc"), ("last_day", "desc")],
        "last_day",
        agg="max",
        out="__pm",
    ).filter(F.col("__pm").isNull() | (F.col("last_day") > F.col("__pm")))
    return frontier.select(
        F.explode("cks").alias("custkey"), "spend", "last_day"
    )


# ---------------------------------------------------------------------------
# q177 — time-weighted average (TWAP): the right mean for irregularly
# sampled measurements (a value holds until the next observation, so
# dense bursts must not dominate). Per user: Σ value·Δt / ΣΔt over the
# lead-gap in integer seconds. Portability: value·Δt·1e6 is computed as
# ONE double product per row and floor-quantized — both engines run the
# identical op sequence — then summed as exact int64.
# ---------------------------------------------------------------------------


@_register(
    "q177_twap_per_user",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               (LEAD(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) - epoch_us(ts)) // 1000000 AS dt_s
        FROM events
    ),
    w AS (
        SELECT user_id,
               CAST(FLOOR(value * dt_s * 1e6) AS BIGINT) AS wq,
               dt_s
        FROM seq WHERE dt_s IS NOT NULL AND dt_s > 0
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(dt_s) AS BIGINT) AS total_seconds,
           CAST(SUM(wq) AS DOUBLE)
               / (CAST(SUM(dt_s) AS DOUBLE) * 1e6) AS twap
    FROM w GROUP BY user_id
    """,
)
def q177_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TWAP of the event value stream: each observation holds
    until the next (lead gap in whole seconds; the final open-ended
    observation carries no weight). One shuffle on user_id; zero-length
    gaps (same-second bursts) are excluded from the weighting on both
    engines."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "value",
        F.expr("(lead(unix_micros(ts)) OVER (PARTITION BY user_id "
               "ORDER BY ts, event_id) - unix_micros(ts)) div 1000000")
        .alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    wq = seq.select(
        "user_id", "dt_s",
        F.floor(F.col("value") * F.col("dt_s") * F.lit(1e6))
        .cast("long").alias("wq"),
    )
    return wq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_s").cast("long").alias("total_seconds"),
        (F.sum("wq").cast("double")
         / (F.sum("dt_s").cast("double") * F.lit(1e6))).alias("twap"),
    )


# ---------------------------------------------------------------------------
# q179 — PageRank, integer-quantized, fixed 3 iterations, oracle-exact.
# The canonical iterative graph workload (importance over the co-purchase
# part graph — "which parts anchor the catalog's basket structure"). The
# reference has no graph surface (etl_completo.py is row-at-a-time retail
# ETL); this extends the q154/q170 graph family from one-shot joins to a
# CONVERGING ITERATION, cross-engine verified.
#
# Determinism device: ranks live in integer micro-units (start 1_000_000
# per vertex). Each step is
#     contrib(v)  = rank(v) div outdeg(v)          -- integer floor
#     rank'(u)    = 150_000 + (85 * Σ contrib) div 100
# i.e. damping 0.85 applied in exact integer arithmetic (Spark `div` ≡
# DuckDB `//` on positive BIGINTs — the dialect-portable floor division
# from the cookbook). No double ever enters the loop, so the fixpoint
# trajectory is bit-identical across engines, partitionings, and retries.
# The symmetric graph guarantees outdeg ≥ 1 (no dangling-mass term).
#
# Scale notes: the classic Pregel shape — the edge list is the big frame,
# partitioned once and PERSISTED (re-read every superstep; re-shuffling it
# per iteration is the textbook PageRank-on-Spark mistake); each iteration
# shuffles only (dst, contrib) partial sums (map-side combine on the
# groupBy) and the vertex-sized rank frame. Lineage is cut with
# localCheckpoint before the persisted inputs are released, so the
# returned frame never re-runs the loop. At 100 TB the rank frame is
# |V| ≪ |E| and the per-iteration cost is one co-partitioned join — with
# edges pre-bucketed by src the shuffle drops to the rank frame alone.
# ---------------------------------------------------------------------------


def _q179_oracle() -> str:
    it = """
    r{i} AS (
        SELECT d.src AS v, d.outdeg,
               CAST(150000 + (85 * COALESCE(s.contrib, 0)) // 100 AS BIGINT)
                   AS rank
        FROM deg d LEFT JOIN (
            SELECT sym.dst AS v2, SUM(r.rank // r.outdeg) AS contrib
            FROM sym JOIN r{p} r ON sym.src = r.v GROUP BY sym.dst
        ) s ON d.src = s.v2
    )"""
    iters = ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
    WITH e AS ({_q154_edges_sql()}),
    sym AS (SELECT u AS src, v AS dst FROM e
            UNION ALL SELECT v AS src, u AS dst FROM e),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM sym GROUP BY src),
    r0 AS (SELECT src AS v, outdeg, CAST(1000000 AS BIGINT) AS rank
           FROM deg),
    {iters}
    SELECT v AS part, outdeg, rank AS pagerank FROM r3
    """


@_register("q179_pagerank", oracle=_q179_oracle())
def q179_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized PageRank (3 supersteps, damping 0.85) over the
    support≥2 co-purchase part graph; one row per vertex with its out-degree
    and final rank in micro-units. The DuckDB oracle replays the identical
    integer trajectory through unrolled CTEs — iterative algorithms sit on
    the hash gate, not the weaker rows-only tier."""
    und = co_purchase_edges(spark, sf_dir)  # memoized checkpointed artifact
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    ranks = deg.select(
        F.col("src").alias("v"), "outdeg", F.lit(1000000).cast("long").alias("rank")
    )
    for _ in range(3):
        contrib = (
            sym.join(ranks, sym["src"] == ranks["v"])
            .select(F.col("dst"), F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")  # map-side partial combine on (dst, Σc)
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["dst"], "left")
            .select(
                deg["src"].alias("v"),
                "outdeg",
                (F.lit(150000)
                 + F.expr("(85 * coalesce(contrib, 0)) div 100"))
                .cast("long").alias("rank"),
            )
        )
    return ranks.select(
        F.col("v").alias("part"), "outdeg", F.col("rank").alias("pagerank")
    )


# ---------------------------------------------------------------------------
# q181 — a true RECURRENCE on the hash gate: integer EWMA (α = 1/2) over
# each user's event-value stream. Windows cannot express s_t =
# (s_{t-1} + x_t) div 2 — the state feeds back — so this is the honest
# home of a grouped-map pandas kernel (the same surface as q155), and its
# DuckDB twin is a RECURSIVE CTE stepping rn → rn+1 with the identical
# integer update. A smoothed value + cumulative checksum per user are
# hash-compared: the sequential kernel and the set-based recursion agree
# bit for bit because the state space is exact int64 (values quantized to
# micros BEFORE the loop; floor-divisions are the portable `div`/`//`).
#
# Scale notes: the kernel is sharded (user_id % 32) like q155 — grouped-map
# pays Arrow+interpreter overhead per INVOCATION, so thousands of tiny
# per-user groups are batched into 32 shard calls; each user's history is
# contiguous after the in-shard sort. State is O(1) per user, the pass is
# O(events); this is the batch face of what
# streaming/stateful.running_user_totals does with per-key state across
# micro-batches. The recursive CTE oracle is the VERIFIER, not the scale
# path — its depth equals the longest per-user history.
# ---------------------------------------------------------------------------


@_register(
    "q181_ewma_recursive",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS x,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    rec AS (
        SELECT user_id, rn, x AS s FROM seq WHERE rn = 1
        UNION ALL
        SELECT seq.user_id, seq.rn, (rec.s + seq.x) // 2 AS s
        FROM rec JOIN seq
          ON seq.user_id = rec.user_id AND seq.rn = rec.rn + 1
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(arg_max(s, rn) AS BIGINT) AS ewma_final,
           CAST(SUM(s) AS BIGINT) AS ewma_checksum
    FROM rec GROUP BY user_id
    """,
)
def q181_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user integer EWMA (α = 1/2) over (ts, event_id)-ordered event
    values in exact micro-units: final smoothed value + Σ of every
    intermediate state (the trajectory checksum). Sharded applyInPandas
    kernel vs a recursive-CTE oracle — the recurrence itself is verified."""
    import pandas as pd

    events = load_table(spark, "events", sf_dir)

    def shard_ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "tus", "event_id"])
        rows = []
        for uid, g in pdf.groupby("user_id", sort=False):
            s = None
            total = 0
            n = 0
            for x in g["x"]:
                x = int(x)
                if s is None:
                    s = x
                else:
                    # engine `//`/`div` TRUNCATES toward zero; Python //
                    # floors — branch so negative states stay portable
                    t = s + x
                    s = t // 2 if t >= 0 else -((-t) // 2)
                total += s
                n += 1
            rows.append((int(uid), n, s, total))
        return pd.DataFrame(
            rows, columns=["user_id", "n_events", "ewma_final", "ewma_checksum"]
        )

    base = events.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("x"),
    )
    return base.groupBy((F.col("user_id") % 32).alias("__shard")).applyInPandas(
        shard_ewma,
        "user_id long, n_events long, ewma_final long, ewma_checksum long",
    )


# ---------------------------------------------------------------------------
# q184 — Welch's unequal-variance t-test per event type (weekend vs
# weekday values): the classic "did the metric move between strata"
# gate, completing the drift/eval family (L1 q172, KS q173, χ² q162,
# AUC q167, Pearson q163). Same portability recipe as all of them:
# quantize to integer millis FIRST, aggregate exact moments (Σx as
# int64; Σx² through DECIMAL(38,0) — at 100 TB row counts an int64 Σx²
# overflows), then ONE fixed sequence of correctly-rounded double ops
# (two means, two sample variances, one sqrt, one division) written
# identically in both engines. sqrt IS portable (cookbook); pow/log are
# not, which is why dof/p-value stay out — the t statistic itself is the
# decision variable a pipeline thresholds on.
#
# Scale notes: one conditional-aggregation pass (q62's device) — no
# per-stratum scans, no joins; the shuffle carries |event_type| moment
# rows. The weekday split uses the documented dayofweek dialect offset
# (Spark Sun=1 … Sat=7; DuckDB Sun=0 … Sat=6).
# ---------------------------------------------------------------------------


@_register(
    "q184_welch_t_test",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 1e3) AS BIGINT) AS x
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(SUM(wk) AS BIGINT) AS n_a,
               CAST(SUM(1 - wk) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN wk = 1 THEN x ELSE 0 END) AS BIGINT) AS s_a,
               CAST(SUM(CASE WHEN wk = 0 THEN x ELSE 0 END) AS BIGINT) AS s_b,
               CAST(SUM(CASE WHEN wk = 1 THEN x * x ELSE 0 END) AS DOUBLE) AS q_a,
               CAST(SUM(CASE WHEN wk = 0 THEN x * x ELSE 0 END) AS DOUBLE) AS q_b
        FROM q GROUP BY event_type
    )
    SELECT event_type, n_a, n_b, s_a, s_b,
           (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(
               ((CAST(n_a AS DOUBLE) * q_a
                 - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1)))
               / CAST(n_a AS DOUBLE)
               +
               ((CAST(n_b AS DOUBLE) * q_b
                 - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
                / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1)))
               / CAST(n_b AS DOUBLE)
             ) AS welch_t
    FROM m
    """,
)
def q184_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic per event type between weekend (stratum a) and
    weekday (stratum b) values, from exact integer-milli moments in one
    conditional-aggregation pass; the identical IEEE op sequence runs in
    DuckDB, so the statistic hash-matches bit for bit."""
    e = load_table(spark, "events", sf_dir)
    q = e.select(
        "event_type",
        F.when(F.dayofweek("ts").isin(1, 7), F.lit(1)).otherwise(F.lit(0))
        .alias("wk"),
        F.floor(F.col("value") * F.lit(1e3)).cast("long").alias("x"),
    )
    m = q.groupBy("event_type").agg(
        F.sum("wk").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("wk")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("wk") == 1, F.col("x")).otherwise(F.lit(0)))
        .cast("long").alias("s_a"),
        F.sum(F.when(F.col("wk") == 0, F.col("x")).otherwise(F.lit(0)))
        .cast("long").alias("s_b"),
        # Σx² exact through DECIMAL(38,0) — int64 overflows at 100 TB rows
        F.sum(F.when(F.col("wk") == 1, (F.col("x") * F.col("x"))
                     .cast("decimal(38,0)")).otherwise(F.lit(0)))
        .cast("double").alias("q_a"),
        F.sum(F.when(F.col("wk") == 0, (F.col("x") * F.col("x"))
                     .cast("decimal(38,0)")).otherwise(F.lit(0)))
        .cast("double").alias("q_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("s_a").cast("double")
    sb = F.col("s_b").cast("double")
    va = (na * F.col("q_a") - sa * sa) / (na * (na - F.lit(1.0)))
    vb = (nb * F.col("q_b") - sb * sb) / (nb * (nb - F.lit(1.0)))
    return m.select(
        "event_type", "n_a", "n_b", "s_a", "s_b",
        ((sa / na - sb / nb) / F.sqrt(va / na + vb / nb)).alias("welch_t"),
    )


# ---------------------------------------------------------------------------
# q186 — multi-source BFS hop distance: the MIN-propagation member of the
# iterative family (PageRank q179 is SUM-propagation, the q43/q67 closure
# is label-MIN over components; BFS is frontier-MIN over hops). "How far
# is every part from the seeded promotion set" — reachability radius over
# the co-purchase graph. Seeds are a deterministic arithmetic subset
# (partkey % 101 = 0 — no hash needed); 3 bounded supersteps; vertices
# unreached within the bound report -1 (NULL-free, via the standard
# 999-as-infinity device: min() keeps it inert and bounded).
#
# Scale notes: per superstep one edges⨝distance join + MIN aggregate —
# the distance frame is vertex-sized and broadcast-class beside the
# edges; with the memoized edge artifact the whole run is |E|-sized.
# Production BFS iterates to fixpoint with a frontier filter (only
# changed vertices join); the bounded unroll keeps the oracle exact.
# ---------------------------------------------------------------------------

_BFS_INF = 999


def _q186_oracle() -> str:
    it = f"""
    d{{i}} AS (
        SELECT dv.v, LEAST(dv.d, COALESCE(m.md, {_BFS_INF})) AS d
        FROM d{{p}} dv LEFT JOIN (
            SELECT sym.dst AS v2, MIN(dp.d + 1) AS md
            FROM sym JOIN d{{p}} dp ON sym.src = dp.v GROUP BY sym.dst
        ) m ON dv.v = m.v2
    )"""
    iters = ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
    WITH e AS ({_q154_edges_sql()}),
    sym AS (SELECT u AS src, v AS dst FROM e
            UNION ALL SELECT v AS src, u AS dst FROM e),
    verts AS (SELECT DISTINCT src AS v FROM sym),
    d0 AS (SELECT v, CASE WHEN v % 101 = 0 THEN 0 ELSE {_BFS_INF} END AS d
           FROM verts),
    {iters}
    SELECT v AS part,
           CAST(CASE WHEN v % 101 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_seed,
           CAST(CASE WHEN d >= {_BFS_INF} THEN -1 ELSE d END AS BIGINT)
               AS hops
    FROM d3
    """


@_register("q186_bfs_hops", oracle=_q186_oracle())
def q186_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (≤3 supersteps) from the seeded part set over the
    co-purchase graph; unreached vertices report -1. The DuckDB oracle
    unrolls the identical min-propagation — all-integer, hash-exact."""
    und = co_purchase_edges(spark, sf_dir)  # memoized checkpointed artifact
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    verts = sym.select(F.col("src").alias("v")).distinct()
    dist = verts.select(
        "v",
        F.when(F.col("v") % 101 == 0, F.lit(0))
        .otherwise(F.lit(_BFS_INF)).cast("long").alias("d"),
    )
    for _ in range(3):
        md = (
            sym.join(dist, sym["src"] == dist["v"])
            .select(F.col("dst"), (F.col("d") + 1).alias("nd"))
            .groupBy("dst")  # map-side partial MIN
            .agg(F.min("nd").alias("md"))
        )
        dist = (
            dist.join(md, dist["v"] == md["dst"], "left")
            .select(
                dist["v"],
                F.least(
                    F.col("d"), F.coalesce(F.col("md"), F.lit(_BFS_INF))
                ).cast("long").alias("d"),
            )
        )
    return dist.select(
        F.col("v").alias("part"),
        F.when(F.col("v") % 101 == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_seed"),
        F.when(F.col("d") >= _BFS_INF, F.lit(-1)).otherwise(F.col("d"))
        .cast("long").alias("hops"),
    )


# ---------------------------------------------------------------------------
# q201 — cumulative distinct (the growth curve): unique users ever seen,
# by day. The naive formulation (COUNT(DISTINCT user) OVER growing
# frames) re-scans every prefix — quadratic; the scalable identity is
# first-seen collapse: cumulative_distinct(d) = Σ_{d' ≤ d} |{users whose
# FIRST event day is d'}| — one user-grain aggregate, one day-grain
# count, one prefix sum over the (tiny) day frame. New-vs-returning
# falls out of the same frame.
# ---------------------------------------------------------------------------


@_register(
    "q201_cumulative_users",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
        GROUP BY user_id
    ),
    actives AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY day
    ),
    news AS (SELECT d0 AS day, COUNT(*) AS new_users FROM firsts GROUP BY d0)
    SELECT a.day,
           CAST(a.dau AS BIGINT) AS active_users,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (
               ORDER BY a.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_users
    FROM actives a LEFT JOIN news n ON a.day = n.day
    """,
)
def q201_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active, new, and cumulative-ever-seen user counts via the
    first-seen collapse — no growing-frame COUNT DISTINCT anywhere."""
    e = load_table(spark, "events", sf_dir)
    day = F.to_date("ts")
    firsts = e.groupBy("user_id").agg(F.min(day).alias("d0"))
    actives = e.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    news = firsts.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return (
        actives.join(F.broadcast(news), "day", "left")
        .select(
            "day",
            F.col("dau").cast("long").alias("active_users"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
            F.sum(F.coalesce("new_users", F.lit(0))).over(w).cast("long")
            .alias("cumulative_users"),
        )
    )


# ---------------------------------------------------------------------------
# q202 — business-day shipping latency: order → ship lag counted in
# BUSINESS days via the calendar dimension (dim_tempo's weekend flag, S7/
# F11) — the date arithmetic a retail DW actually reports ("ships in 3
# business days"), not raw datediff. Exact integers: the lag is a COUNT
# of weekday calendar rows inside the (orderdate, shipdate] interval,
# computed with the q52 range-join device (calendar rows joined by
# year-bucket, filtered by the exact interval) — never a per-row loop
# and never a quadratic nested-loop plan.
# ---------------------------------------------------------------------------


@_register(
    "q202_business_day_latency",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey, o.o_orderpriority,
               o.o_orderdate AS d0, l.l_shipdate AS d1
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    cal AS (
        SELECT CAST(r.d AS DATE) AS day
        FROM (SELECT unnest(generate_series(DATE '1992-01-01',
                                            DATE '1998-12-31',
                                            INTERVAL 1 DAY)) AS d) r
        WHERE dayofweek(CAST(r.d AS DATE)) NOT IN (0, 6)
    ),
    lags AS (
        SELECT li.l_orderkey, li.o_orderpriority,
               (SELECT COUNT(*) FROM cal
                WHERE cal.day > li.d0 AND cal.day <= li.d1) AS bdays
        FROM li
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(bdays) AS BIGINT) AS sum_business_days,
           CAST(SUM(bdays) AS DOUBLE) / COUNT(*) AS avg_business_days
    FROM lags GROUP BY o_orderpriority
    """,
)
def q202_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average order->ship latency in business days per order priority.

    Spark side: the CLOSED-FORM weekday prefix count — with Monday
    anchor A = 1991-12-30 (before the data range) and n1 = days in
    [A, d] inclusive,

        W(d)          = 5·(n1 div 7) + least(n1 mod 7, 5)
        bdays(d0, d1] = W(d1) − W(d0)

    a pure per-row integer expression: NO calendar table, no range
    join, no interval fan-out (the previous year-bucketed probe built
    ~261·span intermediate rows per lag — ~300M at sf0.1). The ORACLE
    deliberately keeps the explicit generate_series calendar scan with
    a correlated interval count, so the hash match is a cross-FORM
    proof that the closed form counts exactly the Mon–Fri days in
    (d0, d1]. All operands non-negative (A precedes every date), so
    div/mod agree across engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )

    def wdays_expr(name: str) -> Column:
        # clamp into the calendar window first: dates past 1998-12-31
        # accrue nothing, dates before 1992-01-01 count from the window
        # start, and (with the greatest(...,0) below) reversed intervals
        # (the fixture HAS shipdates before the orderdate) count zero —
        # exactly the correlated calendar COUNT the oracle runs
        c = (
            "greatest(least(cast({d} as date), date'1998-12-31'),"
            " date'1991-12-31')".format(d=name)
        )
        return F.expr(
            "5 * ((datediff({c}, date'1991-12-30') + 1) div 7)"
            " + least((datediff({c}, date'1991-12-30') + 1) % 7, 5)"
            .format(c=c)
        ).cast("long")

    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.greatest(
            wdays_expr("l_shipdate") - wdays_expr("o_orderdate"), F.lit(0)
        ).alias("bdays"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("bdays").cast("long").alias("sum_business_days"),
        (F.sum("bdays").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg_business_days"),
    )


# ---------------------------------------------------------------------------
# q204 — diversified top-k (group-quota ranking): "the top 20 parts by
# revenue, but at most 2 per brand" — the search/recommendation
# diversity pattern a plain top-k window can't express. Two chained
# windows on the SAME aggregate frame: an in-brand rank (quota filter)
# then a global rank over the survivors. Both total-ordered (decimal-
# exact revenue, partkey tie-break) so the selected set is bit-stable.
#
# Scale notes: both windows run over the part-grain AGGREGATE (|parts|
# rows), never the fact table; the in-brand window partitions by brand
# (parallel), and the global pass ranks only quota survivors. At
# extreme |parts| the global rank becomes TakeOrderedAndProject via the
# q27 LIMIT device; the quota window stays partition-parallel.
# ---------------------------------------------------------------------------


@_register(
    "q204_diversified_topk",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand, l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_partkey
    ),
    quota AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY revenue DESC, l_partkey) AS brand_rank
        FROM rev
    ),
    survivors AS (SELECT * FROM quota WHERE brand_rank <= 2)
    SELECT p_brand, CAST(l_partkey AS BIGINT) AS partkey, revenue,
           CAST(brand_rank AS BIGINT) AS brand_rank,
           CAST(rnk AS BIGINT) AS global_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey)
                      AS rnk
        FROM survivors
    ) WHERE rnk <= 20
    """,
)
def q204_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by decimal-exact revenue with a ≤2-per-brand quota:
    in-brand rank filter, then a global rank over the survivors."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(27,6)")
            ).cast("double").alias("revenue")
        )
    )
    wb = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), "l_partkey"
    )
    survivors = (
        rev.select("*", F.row_number().over(wb).alias("brand_rank"))
        .filter(F.col("brand_rank") <= 2)
    )
    wg = Window.orderBy(F.col("revenue").desc(), "l_partkey")
    return (
        survivors.select("*", F.row_number().over(wg).alias("rnk"))
        .filter(F.col("rnk") <= 20)
        .select(
            "p_brand",
            F.col("l_partkey").cast("long").alias("partkey"),
            "revenue",
            F.col("brand_rank").cast("long").alias("brand_rank"),
            F.col("rnk").cast("long").alias("global_rank"),
        )
    )


# ---------------------------------------------------------------------------
# q205 — funnel latency percentiles: exact p50/p90 of the signup →
# first-subsequent-purchase delay. q75 counts who converts; this
# measures HOW FAST — the product-analytics companion. Stage times are
# conditional min-aggregates per user (the q75 device, no window over
# raw events); gaps live in integer seconds; percentiles are the q58
# exact order statistic (rank ⌈p·n⌉ under a total order with user_id
# tie-break — no interpolation arithmetic to diverge cross-engine).
# ---------------------------------------------------------------------------


@_register(
    "q205_funnel_latency",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                   AS s_ts
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT st.user_id,
               (MIN(epoch_us(e.ts)) - st.s_ts) // 1000000 AS gap_s
        FROM stages st
        JOIN events e ON e.user_id = st.user_id
         AND e.event_type = 'purchase' AND epoch_us(e.ts) >= st.s_ts
        WHERE st.s_ts IS NOT NULL
        GROUP BY st.user_id, st.s_ts
    ),
    ranked AS (
        SELECT gap_s, user_id,
               ROW_NUMBER() OVER (ORDER BY gap_s, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM conv
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                         THEN gap_s END) AS BIGINT) AS p50_seconds,
           CAST(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                         THEN gap_s END) AS BIGINT) AS p90_seconds
    FROM ranked
    """,
)
def q205_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How fast users convert: exact p50/p90 seconds from first signup to
    first subsequent purchase (order-statistic percentiles, integer
    gaps)."""
    e = load_table(spark, "events", sf_dir)
    stages = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("s_ts")
    ).filter(F.col("s_ts").isNotNull())
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("p_ts")
    )
    conv = (
        stages.join(
            purch,
            (F.col("user_id") == F.col("pu")) & (F.col("p_ts") >= F.col("s_ts")),
        )
        .groupBy("user_id", "s_ts")
        .agg(F.expr("(min(p_ts) - s_ts) div 1000000").alias("gap_s"))
        .select("user_id", "gap_s")
    )
    # two-phase distributed rank over the (gap, user) total order — conv
    # is per-converted-user grain, too big for a single-task window at
    # scale; n and the ⌈p·n⌉ target ranks come from the offsets job
    # (math.ceil(p*n) is the same double product+ceil DuckDB runs)
    ranked, n = global_row_number(
        conv, [("gap_s", "asc"), ("user_id", "asc")], out="rn"
    )
    p50r, p90r = math.ceil(0.5 * n), math.ceil(0.9 * n)
    return ranked.agg(
        F.max(F.lit(n)).cast("long").alias("n_converted"),
        F.max(
            F.when(F.col("rn") == p50r, F.col("gap_s"))
        ).cast("long").alias("p50_seconds"),
        F.max(
            F.when(F.col("rn") == p90r, F.col("gap_s"))
        ).cast("long").alias("p90_seconds"),
    )


# ---------------------------------------------------------------------------
# q206 — power-of-two latency histogram: inter-purchase gaps bucketed by
# bit length (bucket k ⇔ gap ∈ [2^(k−1), 2^k)) — the log2 bucketing of
# every ops/latency dashboard (hdr-histogram's coarse tier), computed
# with ZERO floating log: bitlen = length(bin(x)) is the q89 integer
# device, exact in both engines. Gaps via one lag window per user in
# integer seconds; zero-gaps land in their own bucket 0.
# ---------------------------------------------------------------------------


@_register(
    "q206_latency_histogram",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS t, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT (t - LAG(t) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id)) // 1000000 AS g
        FROM p
    ),
    b AS (
        SELECT CASE WHEN g = 0 THEN 0
                    ELSE length(bin(g)) END AS bucket, g
        FROM gaps WHERE g IS NOT NULL
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(g) AS BIGINT) AS min_gap_s,
           CAST(MAX(g) AS BIGINT) AS max_gap_s
    FROM b GROUP BY bucket
    """,
)
def q206_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap histogram in power-of-two second buckets
    (bucket = bit length of the gap), with per-bucket min/max — log2
    binning without any floating log."""
    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = p.select(
        F.expr("(t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id))"
               " div 1000000").alias("g")
    ).filter(F.col("g").isNotNull())
    b = gaps.select(
        F.when(F.col("g") == 0, F.lit(0))
        .otherwise(F.length(F.bin(F.col("g")))).alias("bucket"),
        "g",
    )
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("g").cast("long").alias("min_gap_s"),
        F.max("g").cast("long").alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# q209 — WEIGHTED PageRank: the q179 trajectory with basket-support edge
# weights — contributions proportional to co-purchase strength, the form
# recommendation graphs actually run. Integer-exact throughout:
#     contrib(v→u) = (rank(v) · w_vu) div strength(v),
#     strength(v)  = Σ_out w — so Σ contribs ≤ rank(v) (floors shave),
#     rank'(u)     = 150000 + (85 · Σ contrib) div 100.
# Same persisted-artifact economics as q179 (the weighted face of the
# memoized edge list); the oracle unrolls the weighted recurrence.
# ---------------------------------------------------------------------------


def _q209_oracle() -> str:
    it = """
    r{i} AS (
        SELECT d.src AS v, d.strength,
               CAST(150000 + (85 * COALESCE(s.contrib, 0)) // 100 AS BIGINT)
                   AS rank
        FROM deg d LEFT JOIN (
            SELECT sym.dst AS v2,
                   SUM((r.rank * sym.w) // r.strength) AS contrib
            FROM sym JOIN r{p} r ON sym.src = r.v GROUP BY sym.dst
        ) s ON d.src = s.v2
    )"""
    iters = ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
    WITH e AS (
        SELECT part_a AS u, part_b AS v, support AS w
        FROM (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS support
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY part_a, part_b
        ) WHERE support >= 2
    ),
    sym AS (SELECT u AS src, v AS dst, w FROM e
            UNION ALL SELECT v AS src, u AS dst, w FROM e),
    deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS strength
            FROM sym GROUP BY src),
    r0 AS (SELECT src AS v, strength, CAST(1000000 AS BIGINT) AS rank
           FROM deg),
    {iters}
    SELECT v AS part, strength, rank AS pagerank FROM r3
    """


@_register("q209_weighted_pagerank", oracle=_q209_oracle())
def q209_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-weighted PageRank (3 supersteps) over the co-purchase
    graph; per-vertex strength and final integer rank."""
    und = co_purchase_edges_weighted(spark, sf_dir)
    sym = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("support").alias("w"),
    ).unionAll(
        und.select(
            F.col("v").alias("src"), F.col("u").alias("dst"),
            F.col("support").alias("w"),
        )
    )
    deg = sym.groupBy("src").agg(F.sum("w").cast("long").alias("strength"))
    ranks = deg.select(
        F.col("src").alias("v"), "strength",
        F.lit(1000000).cast("long").alias("rank"),
    )
    for _ in range(3):
        contrib = (
            sym.join(ranks, sym["src"] == ranks["v"])
            .select(F.col("dst"),
                    F.expr("(rank * w) div strength").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["dst"], "left")
            .select(
                deg["src"].alias("v"),
                "strength",
                (F.lit(150000)
                 + F.expr("(85 * coalesce(contrib, 0)) div 100"))
                .cast("long").alias("rank"),
            )
        )
    return ranks.select(
        F.col("v").alias("part"), "strength", F.col("rank").alias("pagerank")
    )


# ---------------------------------------------------------------------------
# q210 — degree assortativity: Pearson correlation of endpoint degrees
# over the directed edge list — do hub parts co-purchase with other hubs
# (r > 0) or with the periphery (r < 0)? One scalar that summarizes the
# co-purchase topology. The q163 exact-moment recipe verbatim: degree
# sums are integers, every moment is an exact BIGINT, and r is one fixed
# double op sequence (two sqrts, one division) — bit-identical.
# ---------------------------------------------------------------------------


@_register(
    "q210_degree_assortativity",
    oracle=f"""
    WITH e AS ({_q154_edges_sql()}),
    sym AS (SELECT u AS src, v AS dst FROM e
            UNION ALL SELECT v AS src, u AS dst FROM e),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src),
    pairs AS (
        SELECT da.d AS x, db.d AS y
        FROM sym JOIN deg da ON sym.src = da.src
                 JOIN deg db ON sym.dst = db.src
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs
    )
    SELECT n AS n_directed_edges,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               AS assortativity
    FROM m
    """,
)
def q210_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of endpoint degrees over the symmetric
    co-purchase edge list — the hub-mixing scalar, from exact integer
    moments."""
    und = co_purchase_edges(spark, sf_dir)
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("src").alias("sa"), F.col("d").alias("x"))
    db = deg.select(F.col("src").alias("sb"), F.col("d").alias("y"))
    pairs = (
        sym.join(da, sym["src"] == da["sa"])
        .join(db, sym["dst"] == db["sb"])
        .select("x", "y")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        ((n * F.col("sxy").cast("double") - sx * sy)
         / (F.sqrt(n * F.col("sxx").cast("double") - sx * sx)
            * F.sqrt(n * F.col("syy").cast("double") - sy * sy)))
        .alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# q212 — k-core peeling (k = 3, three bounded rounds): iteratively
# remove vertices of degree < 3 from the co-purchase graph — the
# density-core extraction that separates structural product clusters
# from incidental co-purchases. Completes the graph family's iteration
# taxonomy: SUM-propagation (q179/q209), MIN-propagation (q186, q43
# closure), and now SUBGRAPH-CONTRACTION. Three peel rounds are
# unrolled in the oracle (production peels to fixpoint with the same
# per-round plan; the bounded unroll keeps the gate exact — the q186
# stance). Census output: surviving vertex/edge counts + id checksum
# per round so the trajectory itself is verified, not just the end.
#
# Scale notes: each round is one degree aggregate + two semi-joins of
# the edge list against the surviving vertex set — |E|-sized work per
# round on the memoized artifact.
# ---------------------------------------------------------------------------


def _q212_oracle() -> str:
    # MATERIALIZED CTEs: each round feeds the next round AND its census
    # row — left inline, DuckDB re-evaluates the whole peel chain per
    # reference (measured 15 s at sf0.01; materialized: sub-second).
    rnd = """
    v{i} AS MATERIALIZED (
        SELECT src AS v FROM e{p} GROUP BY src HAVING COUNT(*) >= 3
    ),
    e{i} AS MATERIALIZED (
        SELECT e.src, e.dst FROM e{p} e
        JOIN v{i} a ON e.src = a.v
        JOIN v{i} b ON e.dst = b.v
    )"""
    rounds = ",".join(rnd.format(i=i, p=i - 1) for i in (1, 2, 3))
    stats = " UNION ALL ".join(
        f"""SELECT {i} AS round,
               CAST(COUNT(DISTINCT src) AS BIGINT) AS n_vertices,
               CAST(COUNT(*) // 2 AS BIGINT) AS n_edges,
               CAST(COALESCE(SUM(DISTINCT src), 0) AS BIGINT)
                   AS vertex_id_sum
           FROM e{i}"""
        for i in (1, 2, 3)
    )
    return f"""
    WITH e AS MATERIALIZED ({_q154_edges_sql()}),
    e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM e
           UNION ALL SELECT v AS src, u AS dst FROM e),
    {rounds}
    SELECT CAST(round AS BIGINT) AS round, n_vertices, n_edges,
           vertex_id_sum
    FROM ({stats})
    """


@_register("q212_kcore_peeling", oracle=_q212_oracle())
def q212_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of 3-core peeling over the co-purchase graph; one
    census row per round (vertices, undirected edges, id checksum) —
    the contraction trajectory on the hash gate."""
    und = co_purchase_edges(spark, sf_dir)
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    out_rows = []
    for rnd in (1, 2, 3):
        surv = (
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= 3)
            .select(F.col("src").alias("v"))
        )
        edges = (
            edges.join(surv.select(F.col("v").alias("src")), "src", "left_semi")
            .join(
                surv.select(F.col("v").alias("dst")), "dst", "left_semi"
            )
            # cut the lineage: without this each round's collect re-runs
            # every previous round's joins (chained-iteration trap, q43)
            .transform(materialize)
        )
        stats = edges.agg(
            F.countDistinct("src").cast("long").alias("n_vertices"),
            F.expr("count(1) div 2").alias("n_edges"),
            F.coalesce(F.sum_distinct(F.col("src")), F.lit(0)).cast("long")
            .alias("vertex_id_sum"),
        ).collect()[0]
        out_rows.append(
            (rnd, stats["n_vertices"], stats["n_edges"],
             stats["vertex_id_sum"])
        )
    return spark.createDataFrame(
        out_rows,
        "round long, n_vertices long, n_edges long, vertex_id_sum long",
    )


# ---------------------------------------------------------------------------
# q213 — ranking ACROSS grouping sets (the TPC-DS Q67 shape): one ROLLUP
# pass produces every grain, then a window partitioned by the GROUPING
# ID ranks rows WITHIN their grain — "top regions, top nations within
# region, and the grand total, from one scan". Combines the q54 single-
# Expand rollup with the q134 ranking discipline: decimal-exact revenue
# sort keys, name tie-breaks, NULL grain cells COALESCEd to 'ALL' so the
# output is NULL-free (DuckDB nullable strings mutate through Arrow).
# Top-3 per grain level.
# ---------------------------------------------------------------------------


@_register(
    "q213_rollup_rank",
    oracle="""
    WITH base AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               l.l_extendedprice * (1 - l.l_discount) AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    grains AS (
        SELECT COALESCE(region, 'ALL') AS region,
               COALESCE(nation, 'ALL') AS nation,
               CAST(GROUPING(region) * 2 + GROUPING(nation) AS BIGINT)
                   AS gid,
               CAST(SUM(CAST(rev AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM base GROUP BY ROLLUP (region, nation)
    )
    SELECT region, nation, gid, revenue,
           CAST(rnk AS BIGINT) AS grain_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY gid
                   ORDER BY revenue DESC, region, nation) AS rnk
        FROM grains
    ) WHERE rnk <= 3
    """,
)
def q213_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 rows per rollup grain (nation-in-region detail, region
    subtotals, grand total) ranked within their GROUPING-ID partition —
    every grain from one Expand pass, decimal-exact sort keys."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    grains = (
        base.rollup("region", "nation")
        .agg(
            F.sum(F.col("rev").cast("decimal(27,6)")).cast("double")
            .alias("revenue"),
            # grouping() is only legal inside the rollup's own aggregate
            (F.grouping("region") * 2 + F.grouping("nation")).cast("long")
            .alias("gid"),
        )
        .select(
            F.coalesce("region", F.lit("ALL")).alias("region"),
            F.coalesce("nation", F.lit("ALL")).alias("nation"),
            "gid",
            "revenue",
        )
    )
    w = Window.partitionBy("gid").orderBy(
        F.col("revenue").desc(), "region", "nation"
    )
    return (
        grains.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("region", "nation", "gid", "revenue",
                F.col("rnk").cast("long").alias("grain_rank"))
    )


# ---------------------------------------------------------------------------
# q214 — FIFO inventory matching WITHOUT recursion: the classic "hard in
# SQL" allocation (which receipt lot does each sale consume?) solved as
# a cumulative-interval overlap join. Per part, receipts and sales each
# get exact cumulative-quantity intervals [c_{i-1}, c_i) under a total
# order; FIFO allocation is EXACTLY their interval overlap:
#     alloc(i, j) = min(cr_i, cs_j) − max(cr_{i-1}, cs_{j-1})  (if > 0)
# — no loop, no recursion, one window per side plus one part-keyed join
# with a range residual (per-part blocks are lineitem-count-sized; at
# scale the q52 quantity-bin device bounds the pair fan-out). Receipts =
# even line numbers, sales = odd (a deterministic split of the same
# fact stream, standing in for a receipts feed). COGS in exact integer
# cents: per-unit cost = floor-cents div quantity (integer division —
# the portable floor), alloc × unit never leaves int64.
# ---------------------------------------------------------------------------


@_register(
    "q214_fifo_allocation",
    oracle="""
    WITH base AS (
        SELECT l_partkey AS pk, l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                   // CAST(l_quantity AS BIGINT) AS unit_cents,
               l_shipdate
        FROM lineitem WHERE l_quantity > 0
    ),
    r AS (
        SELECT pk, qty, unit_cents,
               SUM(qty) OVER (PARTITION BY pk
                              ORDER BY l_shipdate, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cr
        FROM base WHERE l_linenumber % 2 = 0
    ),
    s AS (
        SELECT pk, qty,
               SUM(qty) OVER (PARTITION BY pk
                              ORDER BY l_shipdate, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cs
        FROM base WHERE l_linenumber % 2 = 1
    ),
    alloc AS (
        SELECT r.pk,
               LEAST(r.cr, s.cs)
               - GREATEST(r.cr - r.qty, s.cs - s.qty) AS a,
               r.unit_cents
        FROM r JOIN s ON r.pk = s.pk
         AND r.cr > s.cs - s.qty AND s.cs > r.cr - r.qty
    )
    SELECT pk AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(SUM(a) AS BIGINT) AS matched_qty,
           CAST(SUM(a * unit_cents) AS BIGINT) AS cogs_cents
    FROM alloc GROUP BY pk
    """,
)
def q214_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part FIFO allocation of sales (odd line numbers) against
    receipt lots (even line numbers): match count, matched quantity, and
    exact integer-cent cost of goods sold — the interval-overlap
    formulation, loop-free."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 0)
    base = li.select(
        F.col("l_partkey").alias("pk"), "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"
               " div CAST(l_quantity AS BIGINT)").alias("unit_cents"),
        "l_shipdate",
    )
    w = Window.partitionBy("pk").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = base.filter(F.col("l_linenumber") % 2 == 0).select(
        "pk", "qty", "unit_cents", F.sum("qty").over(w).alias("cr")
    ).select(F.col("pk").alias("rpk"), F.col("qty").alias("rqty"),
             "unit_cents", "cr")
    sl = base.filter(F.col("l_linenumber") % 2 == 1).select(
        "pk", "qty", F.sum("qty").over(w).alias("cs")
    ).select(F.col("pk").alias("spk"), F.col("qty").alias("sqty"), "cs")
    alloc = r.join(
        sl,
        (F.col("rpk") == F.col("spk"))
        & (F.col("cr") > F.col("cs") - F.col("sqty"))
        & (F.col("cs") > F.col("cr") - F.col("rqty")),
    ).select(
        F.col("rpk").alias("pk"),
        (F.least("cr", "cs")
         - F.greatest(F.col("cr") - F.col("rqty"),
                      F.col("cs") - F.col("sqty"))).alias("a"),
        "unit_cents",
    )
    return alloc.groupBy(F.col("pk").alias("partkey")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.sum("a").cast("long").alias("matched_qty"),
        F.sum(F.col("a") * F.col("unit_cents")).cast("long")
        .alias("cogs_cents"),
    )


# ---------------------------------------------------------------------------
# q215 — bill-of-materials explosion (hierarchy flatten with
# multiplicative quantity rollup): the classic recursive-hierarchy
# workload (BOM costing, org rollups, category trees). The hierarchy is
# synthesized deterministically from the part keyspace — parent(p) =
# p div 10 — giving a bounded 4-level tree both engines construct
# identically; per-edge assembly quantity = p % 5 + 1. The explosion
# multiplies quantities ALONG each ancestor path (the BOM semantics a
# plain additive rollup cannot express); Spark unrolls the bounded
# depth as three self-joins (the q179/q186 bounded-iteration stance),
# the oracle as a recursive CTE carrying the running product. All
# integers (products ≤ 5⁴), id-pinned census per root.
# ---------------------------------------------------------------------------


@_register(
    "q215_bom_explosion",
    oracle="""
    WITH RECURSIVE parts AS (
        SELECT p_partkey AS pk, p_partkey // 10 AS parent,
               CAST(p_partkey % 5 + 1 AS BIGINT) AS edge_qty
        FROM part
    ),
    reach AS (
        SELECT pk AS root, pk AS node, CAST(1 AS BIGINT) AS path_qty,
               CAST(0 AS BIGINT) AS depth
        FROM parts
        UNION ALL
        SELECT r.root, p.pk AS node, r.path_qty * p.edge_qty,
               r.depth + 1
        FROM reach r JOIN parts p ON p.parent = r.node
        WHERE p.pk <> r.node AND r.depth < 4
    )
    SELECT root,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_descendants,
           CAST(SUM(path_qty) - 1 AS BIGINT) AS exploded_qty,
           CAST(MAX(depth) AS BIGINT) AS max_depth
    FROM reach GROUP BY root
    HAVING COUNT(*) > 1
    """,
)
def q215_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-assembly explosion census over the synthesized part hierarchy
    (parent = key div 10): descendant count, path-multiplied exploded
    quantity, and subtree depth — bounded-depth unrolled joins vs the
    oracle's recursive CTE."""
    p = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("pk"),
        F.expr("p_partkey div 10").alias("parent"),
        (F.col("p_partkey") % 5 + 1).cast("long").alias("edge_qty"),
    ).persist()  # probed once per unrolled level
    reach = p.select(
        F.col("pk").alias("root"), F.col("pk").alias("node"),
        F.lit(1).cast("long").alias("path_qty"),
        F.lit(0).cast("long").alias("depth"),
    )
    # fresh column names per level avoid the chained self-join ambiguity
    pj = p.select(
        F.col("pk").alias("c_pk"), F.col("parent").alias("c_parent"),
        F.col("edge_qty").alias("c_qty"),
    )
    frontier = reach
    for _ in range(4):
        nxt = (
            frontier.join(pj, F.col("c_parent") == F.col("node"))
            .filter((F.col("c_pk") != F.col("node")) & (F.col("depth") < 4))
            .select(
                "root",
                F.col("c_pk").alias("node"),
                (F.col("path_qty") * F.col("c_qty")).alias("path_qty"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        reach = reach.unionAll(nxt)
        frontier = nxt
    out = (
        reach.groupBy("root")
        .agg(
            (F.count(F.lit(1)) - 1).cast("long").alias("n_descendants"),
            (F.sum("path_qty") - 1).cast("long").alias("exploded_qty"),
            F.max("depth").cast("long").alias("max_depth"),
        )
        .filter(F.col("n_descendants") > 0)
    )
    try:
        rows = out.collect()
    finally:
        p.unpersist()
    return spark.createDataFrame(
        rows, "root long, n_descendants long, exploded_qty long, max_depth long"
    )


# ---------------------------------------------------------------------------
# q217 — exact Spearman rank correlation (tie-corrected) per group: the
# robust sibling of q163's Pearson on the SAME (quantity, discount)
# pairs, so the two statistics are directly comparable. Tie handling is
# the textbook average rank, kept EXACT with the doubled-rank device:
# 2·avg_rank(v) = 2·|{x < v}| + |{x = v}| + 1 is an INTEGER, so Spearman
# = Pearson over doubled ranks runs on the q163 exact-integer-moment
# recipe unchanged (doubling cancels in the correlation). Rank moments
# come from per-value count frames (value-grain windows), never a
# per-row sort.
# ---------------------------------------------------------------------------


@_register(
    "q217_spearman_corr",
    oracle="""
    WITH q AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_quantity) AS BIGINT) AS x,
               CAST(FLOOR(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    rx AS (
        SELECT flag, x,
               2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY x
                                        ROWS UNBOUNDED PRECEDING)
                    - COUNT(*)) + COUNT(*) + 1 AS drx
        FROM q GROUP BY flag, x
    ),
    ry AS (
        SELECT flag, y,
               2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY y
                                        ROWS UNBOUNDED PRECEDING)
                    - COUNT(*)) + COUNT(*) + 1 AS dry
        FROM q GROUP BY flag, y
    ),
    j AS (
        SELECT q.flag, rx.drx AS a, ry.dry AS b
        FROM q JOIN rx ON q.flag = rx.flag AND q.x = rx.x
               JOIN ry ON q.flag = ry.flag AND q.y = ry.y
    ),
    m AS (
        -- second moments of doubled ranks grow as 4N^3: DuckDB sums in
        -- native HUGEINT, then one exact-integer -> DOUBLE conversion,
        -- mirroring Spark's decimal(38,0) accumulation (int64 overflows
        -- at ~2.4M rows/group -- caught by the sf1 scale rehearsal).
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
               CAST(SUM(a * b) AS DOUBLE) AS sab,
               CAST(SUM(a * a) AS DOUBLE) AS saa,
               CAST(SUM(b * b) AS DOUBLE) AS sbb
        FROM j GROUP BY flag
    )
    SELECT flag, n,
           (CAST(n AS DOUBLE) * sab - sa * sb)
           / (sqrt(CAST(n AS DOUBLE) * saa - sa * sa)
              * sqrt(CAST(n AS DOUBLE) * sbb - sb * sb))
               AS spearman
    FROM m
    """,
)
def q217_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman correlation of quantity vs discount per
    return flag via exact doubled average ranks — Pearson over integer
    rank moments, q163's recipe on the rank scale."""
    li = load_table(spark, "lineitem", sf_dir)
    # Checkpoint: q feeds both rank-count aggregates AND the join base —
    # one corpus scan instead of three.
    q = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("y"),
    ).transform(materialize)

    def doubled_ranks(col):
        cnts = q.groupBy("flag", col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("flag").orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return cnts.select(
            "flag", col,
            (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1)
            .alias(f"dr_{col}"),
        )

    j = (
        q.join(doubled_ranks("x"), ["flag", "x"])
        .join(doubled_ranks("y"), ["flag", "y"])
        .select("flag", F.col("dr_x").alias("a"), F.col("dr_y").alias("b"))
    )
    # Second moments of doubled ranks grow as 4N^3 per group — int64
    # overflows past ~2.4M rows/group (hit at the sf1 scale rehearsal;
    # ANSI mode errors loudly). Accumulate in decimal(38,0) — exact to
    # N ≈ 10^12 rows/group, comfortably past the 100 TB lineitem — and
    # convert the exact integer to double ONCE, which DuckDB mirrors
    # with its native HUGEINT sum + one CAST AS DOUBLE.
    da = F.col("a").cast("decimal(38,0)")
    db = F.col("b").cast("decimal(38,0)")
    m = j.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(da).cast("double").alias("sa"),
        F.sum(db).cast("double").alias("sb"),
        F.sum(da * db).cast("double").alias("sab"),
        F.sum(da * da).cast("double").alias("saa"),
        F.sum(db * db).cast("double").alias("sbb"),
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("sa"), F.col("sb")
    return m.select(
        "flag", "n",
        ((n * F.col("sab") - sa * sb)
         / (F.sqrt(n * F.col("saa") - sa * sa)
            * F.sqrt(n * F.col("sbb") - sb * sb)))
        .alias("spearman"),
    )


# ---------------------------------------------------------------------------
# q218 — Kendall's tau-b (tie-corrected) per group, exactly: the third
# rank-correlation tier beside Pearson (q163) and Spearman (q217), on
# the same (quantity, discount) pairs. The O(n²) pair enumeration
# collapses to the JOINT-VALUE GRID: per (x, y) cell counts c, then
# concordant/discordant mass is a cell×cell dominance join (grid cells
# number |x-values|·|y-values| ≈ hundreds — corpus-size-INDEPENDENT,
# the same collapse q173's ECDF uses). C, D, and the tie sums grow as
# N²/2 — accumulated in decimal(38,0) (Spark) / native HUGEINT (DuckDB)
# after the sf1-rehearsal overflow audit; the long output columns stay
# exact while representable (the q290 posture). tau_b =
# (C−D)/√((n0−n1)·(n0−n2)) converts each exact factor to double ONCE
# (÷2.0 is a power-of-two divide — exact) before multiplying — the
# int64 product of the factors overflows at corpus row counts (the
# q184 Σx² lesson, denominator edition).
# ---------------------------------------------------------------------------


@_register(
    "q218_kendall_tau",
    oracle="""
    WITH q AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_quantity) AS BIGINT) AS x,
               CAST(FLOOR(l_discount * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    cells AS (
        SELECT flag, x, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM q GROUP BY flag, x, y
    ),
    cd AS (
        SELECT a.flag,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                             THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                             THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc
        FROM cells a JOIN cells b ON a.flag = b.flag
        GROUP BY a.flag
    ),
    nn AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY flag
    ),
    tx AS (
        SELECT flag, SUM(cx * (cx - 1)) AS s1
        FROM (SELECT flag, x, COUNT(*) AS cx FROM q GROUP BY flag, x)
        GROUP BY flag
    ),
    ty AS (
        SELECT flag, SUM(cy * (cy - 1)) AS s2
        FROM (SELECT flag, y, COUNT(*) AS cy FROM q GROUP BY flag, y)
        GROUP BY flag
    )
    SELECT nn.flag, nn.n,
           CAST(cd.conc AS BIGINT) AS concordant,
           CAST(cd.disc AS BIGINT) AS discordant,
           (CAST(cd.conc AS DOUBLE) - CAST(cd.disc AS DOUBLE))
           / sqrt((CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) - tx.s1
                        AS DOUBLE) / 2.0)
                  * (CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) - ty.s2
                          AS DOUBLE) / 2.0))
               AS tau_b
    FROM nn JOIN cd ON nn.flag = cd.flag
            JOIN tx ON nn.flag = tx.flag
            JOIN ty ON nn.flag = ty.flag
    """,
)
def q218_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kendall tau-b per return flag via the joint-value
    grid dominance join — concordant/discordant mass in exact integers,
    one sqrt-and-divide at the end."""
    li = load_table(spark, "lineitem", sf_dir)
    q = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    cells = q.groupBy("flag", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()  # both sides of the dominance join
    a = cells.select(F.col("flag").alias("fa"), F.col("x").alias("xa"),
                     F.col("y").alias("ya"), F.col("c").alias("ca"))
    b = cells.select(F.col("flag").alias("fb"), F.col("x").alias("xb"),
                     F.col("y").alias("yb"), F.col("c").alias("cb"))
    # C/D mass and tie sums grow as N²/2 per flag — decimal(38,0)
    # accumulation (the sf1-rehearsal overflow device); the grid-cell
    # per-term products ca·cb stay within int64 far longer but are
    # promoted too, for free.
    dzero = F.lit(0).cast("decimal(38,0)")
    dca = F.col("ca").cast("decimal(38,0)")
    dcb = F.col("cb").cast("decimal(38,0)")
    cd = (
        a.join(b, F.col("fa") == F.col("fb"))
        .groupBy(F.col("fa").alias("flag"))
        .agg(
            F.sum(
                F.when((F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                       dca * dcb).otherwise(dzero)
            ).alias("conc"),
            F.sum(
                F.when((F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                       dca * dcb).otherwise(dzero)
            ).alias("disc"),
        )
    )
    # r10: n and the tie sums are GRID marginals — derive all three from
    # the persisted cell frame instead of re-scanning lineitem (4 corpus
    # passes → 1): n = Σc, cx = Σ_y c, cy = Σ_x c, bit-identical to the
    # row-grain counts.
    nn = cells.groupBy("flag").agg(
        F.sum("c").cast("long").alias("n")
    )
    dcx = F.col("cx").cast("decimal(38,0)")
    dcy = F.col("cy").cast("decimal(38,0)")
    tx = (
        cells.groupBy("flag", "x").agg(F.sum("c").alias("cx"))
        .groupBy("flag")
        .agg(F.sum(dcx * (dcx - 1)).alias("s1"))
    )
    ty = (
        cells.groupBy("flag", "y").agg(F.sum("c").alias("cy"))
        .groupBy("flag")
        .agg(F.sum(dcy * (dcy - 1)).alias("s2"))
    )
    dn = F.col("n").cast("decimal(38,0)")
    # each tau_b factor: exact decimal integer → ONE double conversion →
    # exact ÷2.0 (power of two) — both engines do the identical sequence
    f1 = (dn * (dn - 1) - F.col("s1")).cast("double") / F.lit(2.0)
    f2 = (dn * (dn - 1) - F.col("s2")).cast("double") / F.lit(2.0)
    out = (
        nn.join(cd, "flag").join(tx, "flag").join(ty, "flag")
        .select(
            "flag", "n",
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            ((F.col("conc").cast("double") - F.col("disc").cast("double"))
             / F.sqrt(f1 * f2)).alias("tau_b"),
        )
    )
    try:
        rows = out.collect()
    finally:
        cells.unpersist()
    return spark.createDataFrame(
        rows,
        "flag string, n long, concordant long, discordant long, tau_b double",
    )


# ---------------------------------------------------------------------------
# q220 — cohort LTV curve: cumulative purchase revenue per first-touch
# cohort as it ages — the growth-accounting companion to q77's
# retention counts (WHO comes back) and q201's user curve (HOW MANY are
# new): this is HOW MUCH each acquisition vintage has produced by age
# N. Cohort = first-event epoch week (integer div on micros — no
# calendar/timezone surface at all); revenue in exact floor-micros; the
# cumulative runs over the (cohort, age) aggregate, never event rows.
# NULL-free: cohort-age cells with no purchases appear with zero via
# the cohort×age grid (bounded: weeks² — the q193 densification stance).
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86400 * 1_000_000


@_register(
    "q220_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_w
        FROM events GROUP BY user_id
    ),
    purch AS (
        SELECT e.user_id,
               epoch_us(e.ts) // {_WEEK_US} AS w,
               CAST(FLOOR(e.value * 1e6) AS BIGINT) AS rev
        FROM events e WHERE e.event_type = 'purchase'
    ),
    cells AS (
        SELECT f.cohort_w, p.w - f.cohort_w AS age_w,
               CAST(SUM(p.rev) AS BIGINT) AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM purch p JOIN firsts f ON p.user_id = f.user_id
        GROUP BY f.cohort_w, age_w
    ),
    grid AS (
        SELECT c.cohort_w, CAST(g.a AS BIGINT) AS age_w
        FROM (SELECT DISTINCT cohort_w FROM firsts) c,
             (SELECT unnest(range(0, (SELECT CAST(MAX(age_w) AS BIGINT) + 1
                                      FROM cells))) AS a) g
    )
    SELECT g.cohort_w, g.age_w,
           CAST(COALESCE(c.n_purchases, 0) AS BIGINT) AS n_purchases,
           CAST(SUM(COALESCE(c.rev, 0)) OVER (
               PARTITION BY g.cohort_w ORDER BY g.age_w
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_micros
    FROM grid g LEFT JOIN cells c
      ON g.cohort_w = c.cohort_w AND g.age_w = c.age_w
    """,
)
def q220_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative purchase revenue (exact micros) per first-touch weekly
    cohort and age-in-weeks, densified over the cohort×age grid."""
    e = load_table(spark, "events", sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.expr(f"min(unix_micros(ts)) div {_WEEK_US}").alias("cohort_w")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_WEEK_US}").alias("w"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("rev"),
    )
    cells = (
        purch.join(firsts, "user_id")
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("age_w"))
        .agg(
            F.sum("rev").cast("long").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
        )
        .persist()  # feeds the grid bound AND the left join
    )
    max_age = cells.agg(F.max("age_w")).collect()[0][0] or 0
    grid = (  # bounded by construction: |weeks| × |weeks| cells
        firsts.select("cohort_w").distinct()
        .crossJoin(
            spark.range(0, int(max_age) + 1).select(
                F.col("id").alias("age_w")
            )
        )
    )
    w = Window.partitionBy("cohort_w").orderBy("age_w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        grid.join(cells, ["cohort_w", "age_w"], "left")
        .select(
            "cohort_w", "age_w",
            F.coalesce("n_purchases", F.lit(0)).cast("long")
            .alias("n_purchases"),
            F.sum(F.coalesce("rev", F.lit(0))).over(w).cast("long")
            .alias("cum_revenue_micros"),
        )
    )
    try:
        rows = out.collect()
    finally:
        cells.unpersist()
    return spark.createDataFrame(
        rows,
        "cohort_w long, age_w long, n_purchases long, cum_revenue_micros long",
    )


# ---------------------------------------------------------------------------
# q222 — deterministic MODE per group: the everyday aggregate whose
# built-in forms are tie-luck in both engines (DuckDB mode() and a
# max_by over counts each pick an arbitrary tied winner). The portable
# form is counts → total-order rank (count desc, value asc) → rank 1,
# plus the runner-up and its count so the margin (how modal is the
# mode) rides along. Value grain = floor(value) buckets.
# ---------------------------------------------------------------------------


@_register(
    "q222_group_mode",
    oracle="""
    WITH cnt AS (
        SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, v
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY c DESC, v) AS rnk
        FROM cnt
    )
    SELECT event_type,
           MAX(CASE WHEN rnk = 1 THEN v END) AS mode_value,
           MAX(CASE WHEN rnk = 1 THEN c END) AS mode_count,
           CAST(COALESCE(MAX(CASE WHEN rnk = 2 THEN c END), 0) AS BIGINT)
               AS runner_up_count
    FROM ranked WHERE rnk <= 2 GROUP BY event_type
    """,
)
def q222_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal floor(value) bucket per event type with its count and the
    runner-up count — mode under a total order, never tie luck."""
    e = load_table(spark, "events", sf_dir)
    cnt = e.groupBy(
        "event_type", F.floor("value").cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("event_type").orderBy(F.col("c").desc(), "v")
    ranked = cnt.select("*", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= 2
    )
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rnk") == 1, F.col("v"))).alias("mode_value"),
        F.max(F.when(F.col("rnk") == 1, F.col("c"))).alias("mode_count"),
        F.coalesce(
            F.max(F.when(F.col("rnk") == 2, F.col("c"))), F.lit(0)
        ).cast("long").alias("runner_up_count"),
    )


# ---------------------------------------------------------------------------
# q223 — audience overlap matrix: Jaccard similarity between every pair
# of event-type user cohorts (|both| / |either|) — the segment-overlap
# question behind campaign targeting and funnel design, and the set-
# similarity machinery (q23's measure) applied at the BEHAVIORAL-COHORT
# grain rather than the document grain. Distinct (type, user) pairs
# self-join on the user (intersections), cohort sizes broadcast back,
# union by inclusion-exclusion — all integers, one division.
# ---------------------------------------------------------------------------


@_register(
    "q223_audience_overlap",
    oracle="""
    WITH cu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM cu
              GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS both_users
        FROM cu a JOIN cu b ON a.user_id = b.user_id
         AND a.event_type < b.event_type
        GROUP BY type_a, type_b
    )
    SELECT sa.event_type AS type_a, sb.event_type AS type_b,
           CAST(COALESCE(i.both_users, 0) AS BIGINT) AS both_users,
           CAST(sa.n + sb.n - COALESCE(i.both_users, 0) AS BIGINT)
               AS either_users,
           CAST(COALESCE(i.both_users, 0) AS DOUBLE)
           / CAST(sa.n + sb.n - COALESCE(i.both_users, 0) AS DOUBLE)
               AS jaccard
    FROM sizes sa JOIN sizes sb ON sa.event_type < sb.event_type
    LEFT JOIN inter i
      ON i.type_a = sa.event_type AND i.type_b = sb.event_type
    """,
)
def q223_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard overlap between every event-type user cohort pair —
    intersections via a user-keyed self-join of the distinct cohort
    frame, unions by inclusion-exclusion."""
    e = load_table(spark, "events", sf_dir)
    cu = e.select("event_type", "user_id").distinct()
    sizes = cu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = cu.select(F.col("event_type").alias("type_a"), "user_id")
    b = cu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("both_users"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("nb"))
    pairs = (
        sa.crossJoin(sb)  # bounded by construction: |event types|² rows
        .filter(F.col("type_a") < F.col("type_b"))
        .join(inter, ["type_a", "type_b"], "left")
    )
    both = F.coalesce("both_users", F.lit(0))
    either = F.col("na") + F.col("nb") - both
    return pairs.select(
        "type_a", "type_b",
        both.cast("long").alias("both_users"),
        either.cast("long").alias("either_users"),
        (both.cast("double") / either.cast("double")).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# q224 — CUPED-adjusted A/B arm means: the experimentation-analytics
# workhorse (variance reduction via the pre-period covariate:
# Y_adj = Y − θ·(X − X̄), θ = cov(X,Y)/var(X)). Arms are the q47 md5
# hash split of users; pre/post periods split at a fixed literal date.
# Everything before the final op sequence is exact integers: per-user
# X/Y in floor-DOLLAR units (milli-quantization overflows int64 in the
# pooled ΣXY at these magnitudes — the q184 overflow discipline applied
# to covariates), pooled moments as BIGINTs, then θ and the adjusted
# means as one fixed chain of correctly-rounded double ops written
# identically in both engines.
# ---------------------------------------------------------------------------


@_register(
    "q224_cuped_uplift",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'ab'),
                                   1, 15) AS BIGINT) % 2 AS arm,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15'
                             THEN CAST(FLOOR(value) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                             THEN CAST(FLOOR(value) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    pooled AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM per_user
    ),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS BIGINT) AS arm_sx,
               CAST(SUM(y) AS BIGINT) AS arm_sy
        FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.arm_sx, a.arm_sy,
           (CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
            - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
           / (CAST(p.n AS DOUBLE) * CAST(p.sxx AS DOUBLE)
              - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE)) AS theta,
           CAST(a.arm_sy AS DOUBLE) / CAST(a.n_users AS DOUBLE)
           - ((CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
               - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
              / (CAST(p.n AS DOUBLE) * CAST(p.sxx AS DOUBLE)
                 - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE)))
             * (CAST(a.arm_sx AS DOUBLE) / CAST(a.n_users AS DOUBLE)
                - CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE))
               AS adjusted_mean
    FROM arms a, pooled p
    """,
)
def q224_cuped_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm CUPED-adjusted post-period means over an md5 user split:
    exact integer covariate moments, one fixed double chain for θ and
    the adjustment — the experimentation readout, bit-stable."""
    e = load_table(spark, "events", sf_dir)
    cut = F.lit("2024-01-15").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts") < cut, F.floor("value").cast("long"))
            .otherwise(F.lit(0))
        ).cast("long").alias("x"),
        F.sum(
            F.when(F.col("ts") >= cut, F.floor("value").cast("long"))
            .otherwise(F.lit(0))
        ).cast("long").alias("y"),
    ).select(
        (F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("ab"))),
                1, 15,
            ), 16, 10,
        ).cast("bigint") % 2).alias("arm"),
        "x", "y",
    )
    per_user = per_user.persist()  # pooled moments + arm aggregates
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("arm_sx"),
        F.sum("y").cast("long").alias("arm_sy"),
    )
    pn = F.col("n").cast("double")
    psx = F.col("sx").cast("double")
    psy = F.col("sy").cast("double")
    theta = (pn * F.col("sxy").cast("double") - psx * psy) / (
        pn * F.col("sxx").cast("double") - psx * psx
    )
    adj = (
        F.col("arm_sy").cast("double") / F.col("n_users").cast("double")
        - theta
        * (F.col("arm_sx").cast("double") / F.col("n_users").cast("double")
           - psx / pn)
    )
    out = arms.crossJoin(F.broadcast(pooled)).select(  # 1-row pooled scalar
        "arm", "n_users", "arm_sx", "arm_sy",
        theta.alias("theta"), adj.alias("adjusted_mean"),
    )
    try:
        rows = out.collect()
    finally:
        per_user.unpersist()
    return spark.createDataFrame(
        rows,
        "arm long, n_users long, arm_sx long, arm_sy long, "
        "theta double, adjusted_mean double",
    )


# ---------------------------------------------------------------------------
# q225 — time-decayed popularity with an EXACT half-life: recency-
# weighted scores (the reco/trending staple) computed without pow() —
# with a one-week half-life, weight(age) = 2^(max_age − age) in integer
# units (the most recent week's unit = 2^max_age), so the decayed sum
# is an exact BIGINT of value-millis and every engine/partitioning
# computes the identical score. Shifts via the portable `<<`/shiftleft
# on the small age range (the q180 register device). One aggregate per
# (event_type, week) then a weighted combine over the tiny grid.
# ---------------------------------------------------------------------------


@_register(
    "q225_decayed_popularity",
    oracle=f"""
    WITH wk AS (
        SELECT event_type,
               epoch_us(ts) // {7 * 86400 * 1_000_000} AS w,
               CAST(FLOOR(value * 1e3) AS BIGINT) AS v
        FROM events
    ),
    per AS (
        SELECT event_type, w, CAST(SUM(v) AS BIGINT) AS wv,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM wk GROUP BY event_type, w
    ),
    mx AS (SELECT MAX(w) AS wmax, MIN(w) AS wmin FROM per)
    SELECT p.event_type,
           CAST(SUM(p.n) AS BIGINT) AS n_events,
           CAST(SUM(p.wv * (CAST(1 AS BIGINT)
                            << CAST(p.w - mx.wmin AS INTEGER)))
                AS BIGINT) AS scaled_decayed_millis,
           CAST(SUM(p.wv * (CAST(1 AS BIGINT)
                            << CAST(p.w - mx.wmin AS INTEGER))) AS DOUBLE)
           / CAST(CAST(1 AS BIGINT)
                  << CAST(mx.wmax - mx.wmin AS INTEGER) AS DOUBLE)
               AS decayed_score
    FROM per p, mx
    GROUP BY p.event_type, mx.wmax, mx.wmin
    """,
)
def q225_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed value mass per event type: weight doubles every
    week of recency (2^(w − wmin) integer units, exact), and the double
    score renormalizes so the newest week has weight 1."""
    e = load_table(spark, "events", sf_dir)
    wk = e.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {7 * 86400 * 1_000_000}").alias("w"),
        F.floor(F.col("value") * F.lit(1e3)).cast("long").alias("v"),
    )
    per = wk.groupBy("event_type", "w").agg(
        F.sum("v").cast("long").alias("wv"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mx = per.agg(F.max("w").alias("wmax"), F.min("w").alias("wmin"))
    return (
        per.crossJoin(F.broadcast(mx))  # 1-row global scalar
        .groupBy("event_type", "wmax", "wmin")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum(
                F.col("wv")
                * F.expr("shiftleft(CAST(1 AS BIGINT),"
                         " CAST(w - wmin AS INT))")
            ).cast("long").alias("scaled_decayed_millis"),
        )
        .select(
            "event_type", "n_events", "scaled_decayed_millis",
            (F.col("scaled_decayed_millis").cast("double")
             / F.expr("CAST(shiftleft(CAST(1 AS BIGINT),"
                      " CAST(wmax - wmin AS INT)) AS DOUBLE)"))
            .alias("decayed_score"),
        )
    )


# ---------------------------------------------------------------------------
# q227 — weighted shortest paths (bounded Bellman-Ford): min-PLUS
# propagation over the weighted co-purchase graph — the third iteration
# algebra beside q186's min-hop and q179's damped sum. Edge cost =
# 101 − min(support, 100) (strong co-purchase = cheap hop, floor 1), so
# costs are small exact integers. Three relaxation rounds from the
# q186 seed set; 10^6-as-infinity keeps the frame NULL-free and inert
# under MIN. Unreached report -1.
# ---------------------------------------------------------------------------

_SP_INF = 1_000_000


def _q227_oracle() -> str:
    it = f"""
    d{{i}} AS (
        SELECT dv.v, LEAST(dv.d, COALESCE(m.md, {_SP_INF})) AS d
        FROM d{{p}} dv LEFT JOIN (
            SELECT sym.dst AS v2, MIN(dp.d + sym.cost) AS md
            FROM sym JOIN d{{p}} dp ON sym.src = dp.v GROUP BY sym.dst
        ) m ON dv.v = m.v2
    )"""
    iters = ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
    return f"""
    WITH e AS (
        SELECT part_a AS u, part_b AS v,
               101 - LEAST(support, 100) AS cost
        FROM (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS support
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY part_a, part_b
        ) WHERE support >= 2
    ),
    sym AS (SELECT u AS src, v AS dst, cost FROM e
            UNION ALL SELECT v AS src, u AS dst, cost FROM e),
    verts AS (SELECT DISTINCT src AS v FROM sym),
    d0 AS (SELECT v, CASE WHEN v % 101 = 0 THEN 0 ELSE {_SP_INF} END AS d
           FROM verts),
    {iters}
    SELECT v AS part,
           CAST(CASE WHEN d >= {_SP_INF} THEN -1 ELSE d END AS BIGINT)
               AS cost_to_seed
    FROM d3
    """


@_register("q227_weighted_shortest_path", oracle=_q227_oracle())
def q227_weighted_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-plus distance (≤3 relaxation rounds) from the seeded part set
    over support-derived edge costs; unreached report -1."""
    und = co_purchase_edges_weighted(spark, sf_dir)
    cost = (F.lit(101) - F.least(F.col("support"), F.lit(100))).alias("cost")
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst"),
                     cost).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), cost)
    )
    verts = sym.select(F.col("src").alias("v")).distinct()
    dist = verts.select(
        "v",
        F.when(F.col("v") % 101 == 0, F.lit(0))
        .otherwise(F.lit(_SP_INF)).cast("long").alias("d"),
    )
    for _ in range(3):
        md = (
            sym.join(dist, sym["src"] == dist["v"])
            .select(F.col("dst"), (F.col("d") + F.col("cost")).alias("nd"))
            .groupBy("dst")
            .agg(F.min("nd").alias("md"))
        )
        dist = (
            dist.join(md, dist["v"] == md["dst"], "left")
            .select(
                dist["v"],
                F.least(
                    F.col("d"), F.coalesce(F.col("md"), F.lit(_SP_INF))
                ).cast("long").alias("d"),
            )
        )
    return dist.select(
        F.col("v").alias("part"),
        F.when(F.col("d") >= _SP_INF, F.lit(-1)).otherwise(F.col("d"))
        .cast("long").alias("cost_to_seed"),
    )


# ---------------------------------------------------------------------------
# q228 — interpolated median, the portable special case: the cookbook
# bans percentile_cont-style interpolation because arbitrary-fraction
# lerps compound FP ops differently across engines — but the MEDIAN's
# interpolation is (lo + hi) / 2 of two exact integer order statistics:
# ONE addition and ONE division by two, identical everywhere. This
# fills the exact-percentile family's last gap (q58 returns discrete
# order stats; q157 weights them): per event type, the true interpolated
# median of value-millis. Both middle elements come from one rank
# window over value-grain counts... kept simple here: rank the rows,
# pick ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉ under the total order.
# ---------------------------------------------------------------------------


@_register(
    "q228_interpolated_median",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(FLOOR(value * 1e3) AS BIGINT) AS x, event_id
        FROM events
    ),
    ranked AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN x END) AS BIGINT)
               AS lo_millis,
           CAST(MAX(CASE WHEN rn = (n + 2) // 2 THEN x END) AS BIGINT)
               AS hi_millis,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN x END)
                + MAX(CASE WHEN rn = (n + 2) // 2 THEN x END) AS DOUBLE)
           / 2 AS median_millis
    FROM ranked GROUP BY event_type
    """,
)
def q228_interpolated_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True interpolated median of value-millis per event type: the two
    middle order statistics under a total order, averaged with the one
    FP-safe interpolation (sum of two exact ints, one division by 2).

    Scale shape — VALUE-GRID order statistics (the q290 collapse): a
    row_number window partitioned by ~5 event types is a 5-task sort of
    the whole corpus (the low-cardinality sibling of the banned
    partition-less windows). An order STATISTIC of the quantized value
    needs no per-row rank: aggregate to the (type, x) grid — bounded by
    the value range × quantum, corpus-size-INDEPENDENT — cumulate counts
    over the grid, and pick the first x whose running count reaches each
    middle position. Output is bit-identical to the row_number form
    (ties in x collapse to the same grid row), which the unchanged
    oracle hash-checks."""
    e = load_table(spark, "events", sf_dir)
    grid = (
        e.select(
            "event_type",
            F.floor(F.col("value") * F.lit(1e3)).cast("long").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wg = Window.partitionBy("event_type").orderBy("x")
    wn = Window.partitionBy("event_type")
    g = grid.select(
        "event_type", "x", "c",
        F.sum("c").over(wg).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    lo_pos = F.expr("(n + 1) div 2")
    hi_pos = F.expr("(n + 2) div 2")
    lo = F.min(F.when(F.col("cum") >= lo_pos, F.col("x")))
    hi = F.min(F.when(F.col("cum") >= hi_pos, F.col("x")))
    return g.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        lo.cast("long").alias("lo_millis"),
        hi.cast("long").alias("hi_millis"),
        ((lo + hi).cast("double") / 2).alias("median_millis"),
    )


# ---------------------------------------------------------------------------
# q233 — CUSUM changepoint statistic per user: sequential drift detection
# (Page 1954) over each user's event-value stream — "has this user's
# spend level shifted up from its own baseline, and by how much at the
# peak?" The recurrence s_i = max(0, s_{i-1} + dev_i) looks like another
# q181-style grouped-map kernel, but it has a closed form the engines can
# both evaluate SET-WISE:
#
#     s_i = ps_i − min(0, min_{j≤i} ps_j),   ps = prefix sum of dev
#
# (the clip-at-zero restarts are exactly "subtract the lowest prefix seen
# so far"). Two stacked windows over ONE (user, ts, event_id) sort — no
# recursion, no Python, no per-row state.
#
# Integer exactness without division: deviations are scaled by the user's
# event count, dev_i = n·x_i − S (x in micros, S the user's exact micro
# sum), so the baseline subtraction needs no mean and the whole statistic
# lives in int64 (|ps| ≤ n²·max_x ≈ 1e4²·5e8 ≪ 2⁶³ at sf1; re-scale the
# quantum before n² growth bites at larger per-user histories).
#
# Scale notes: one shuffle on user_id, one in-partition sort shared by
# both window operators (same WindowSpec ⇒ single Sort + two Window nodes,
# no second exchange), then a map-side-combinable final aggregate. The
# streaming face of this statistic is per-key state (streaming/stateful);
# this is the batch audit that backfills it.
# ---------------------------------------------------------------------------


@_register(
    "q233_cusum_changepoint",
    oracle="""
    WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS x
        FROM events
    ),
    base AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(x) AS s
        FROM q GROUP BY user_id
    ),
    dev AS (
        SELECT q.user_id,
               CAST(base.n AS BIGINT) AS n,
               CAST(base.n * q.x - base.s AS BIGINT) AS dev,
               q.ts, q.event_id
        FROM q JOIN base USING (user_id)
    ),
    pref0 AS (
        SELECT user_id, n, ts, event_id,
               SUM(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ps
        FROM dev
    ),
    pref AS (
        SELECT user_id, n, ps,
               MIN(ps) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS runmin
        FROM pref0
    ),
    st AS (
        SELECT user_id, n,
               CAST(ps - LEAST(0, runmin) AS BIGINT) AS s
        FROM pref
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(s) AS BIGINT) AS peak_cusum,
           CAST(SUM(s) AS BIGINT) AS cusum_checksum,
           CAST(CASE WHEN MAX(s) > MAX(n) * MAX(n) * 100000000
                     THEN 1 ELSE 0 END AS BIGINT) AS drift_alarm
    FROM st GROUP BY user_id
    """,
)
def q233_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak CUSUM drift statistic per user via the prefix-min closed form
    (two stacked windows over one sort — no recursion), deviations scaled
    to exact int64 so the DuckDB twin hash-matches."""
    e = load_table(spark, "events", sf_dir)
    q = e.select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("x"),
    )
    base = q.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = q.join(base, "user_id").select(
        "user_id", "n", "ts", "event_id",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("dev"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = dev.select(
        "user_id", "n", "ts", "event_id", F.sum("dev").over(w).alias("ps")
    ).select("user_id", "n", "ps", F.min("ps").over(w).alias("runmin"))
    st = pref.select(
        "user_id", "n",
        (F.col("ps") - F.least(F.lit(0).cast("long"), F.col("runmin")))
        .cast("long").alias("s"),
    )
    peak = F.max("s").cast("long")
    return st.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        peak.alias("peak_cusum"),
        F.sum("s").cast("long").alias("cusum_checksum"),
        F.when(
            peak > F.max("n") * F.max("n") * F.lit(100000000), F.lit(1)
        ).otherwise(F.lit(0)).cast("long").alias("drift_alarm"),
    )


# ---------------------------------------------------------------------------
# q236 — community detection by synchronous label propagation (Raghavan
# 2007) over the co-purchase graph: the clustering member of the iterative
# graph family (q186 is frontier-MIN, q179 is SUM-propagation, q67 is
# label-MIN closure; LPA is neighbor-MAJORITY). Three synchronous rounds,
# deterministic update — new_label(v) = the neighbor label with the
# highest count, ties broken by smallest label — so both engines walk the
# identical trajectory (asynchronous/randomized LPA variants are not
# reproducible; this one is, and stays on the hash gate).
#
# Per round: one edges⨝labels join (labels are vertex-sized — broadcast-
# class beside the edge stream at scale), one (dst,label)-grouped count
# with map-side combine, one per-vertex top-1 window. The DuckDB oracle
# unrolls the same three rounds as CTEs.
# ---------------------------------------------------------------------------


def _q236_round(i: int, p: int) -> str:
    return f"""
    l{i} AS MATERIALIZED (
        SELECT dst AS v, label FROM (
            SELECT s.dst, lp.label,
                   ROW_NUMBER() OVER (PARTITION BY s.dst
                                      ORDER BY COUNT(*) DESC, lp.label) AS rn
            FROM sym s JOIN l{p} lp ON s.src = lp.v
            GROUP BY s.dst, lp.label
        ) WHERE rn = 1
    )"""


def _q236_cte_prefix() -> str:
    """Shared oracle CTE prefix: edges, symmetric adjacency, and the
    3-round label-propagation trajectory ending at l3(v, label). Every
    stage is multi-referenced downstream (q236 sizes, q246's two
    audits, q314's move round) — AS MATERIALIZED or DuckDB re-evaluates
    the whole chain per reference (the q212 lesson; q314's oracle
    measured 56 s → ~2 s)."""
    rounds = ",".join(_q236_round(i, i - 1) for i in (1, 2, 3))
    return f"""
    WITH e AS MATERIALIZED ({_q154_edges_sql()}),
    sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e
            UNION ALL SELECT v AS src, u AS dst FROM e),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label FROM sym),
    {rounds}"""


_LP_MEMO_ATTR = "_etl_globalretail_lp_memo"


def lp_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous label-propagation assignment (v, label) over
    the co-purchase graph — the deterministic trajectory q236, the q246
    modularity audit, and the q314 move round all consume. Memoized as
    an executor-resident localCheckpoint artifact per (session, corpus),
    the co_purchase_edges stance one level up: three consumers (× bench
    repetitions) pay the 3 join+window LP rounds once."""
    memo = getattr(spark, _LP_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _LP_MEMO_ATTR, memo)
    if sf_dir in memo:
        return memo[sf_dir]
    und = co_purchase_edges(spark, sf_dir)  # memoized checkpointed artifact
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    lab = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(3):
        cnt = (
            sym.join(lab, sym["src"] == lab["v"])
            .groupBy("dst", "label")  # map-side partial combine
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        lab = (
            cnt.select(
                "dst", "label", F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("v"), "label")
        )
    memo[sf_dir] = lab.transform(materialize)
    return memo[sf_dir]


def _q236_oracle() -> str:
    return f"""
    {_q236_cte_prefix()},
    sizes AS (SELECT label, COUNT(*) AS csize FROM l3 GROUP BY label)
    SELECT l3.v AS part,
           CAST(l3.label AS BIGINT) AS community,
           CAST(s.csize AS BIGINT) AS community_size
    FROM l3 JOIN sizes s ON l3.label = s.label
    """


@_register("q236_label_propagation", oracle=_q236_oracle())
def q236_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-round synchronous label propagation (majority
    neighbor label, min-label tie-break) over the co-purchase graph;
    output is each part's community and the community size — the DuckDB
    twin replays the identical trajectory."""
    lab = lp_labels(spark, sf_dir)
    sizes = lab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return lab.join(sizes, "label").select(
        F.col("v").alias("part"),
        F.col("label").cast("long").alias("community"),
        "community_size",
    )


# ---------------------------------------------------------------------------
# q246 — modularity of the label-propagation partition: the quality
# score that turns q236's communities from an artifact into an audited
# one (Newman 2004; the objective Louvain greedily climbs). Kept EXACT
# by clearing denominators: with m = |E|, e_c = intra-community edges,
# d_c = community degree sum,
#
#   Q = Σ_c (e_c/m − (d_c/2m)²)  =  [Σ_c (4·m·e_c − d_c²)] / (4m²)
#
# so the frame carries the integer numerator and denominator, plus the
# floor-scaled q_millionths (Spark div ≡ DuckDB // — both truncate
# toward zero, cookbook rule, and Q here is provably > 0 only when
# communities beat chance — the sign rides the exact numerator either
# way). Magnitudes: d_c ≤ 2m, so the numerator is bounded by 4m² —
# int64-safe through m ≈ 1.5e9 edges; past that the two columns widen
# to DECIMAL(38,0) with the same expressions.
#
# Plan shape: the label assignment (vertex-sized) is persisted — it is
# consumed three times (both endpoint attachments and the degree sum);
# edges come from the checkpointed artifact; everything aggregates to
# |communities| rows before the final 1-row reduction.
# ---------------------------------------------------------------------------


def _q246_oracle() -> str:
    return f"""
    {_q236_cte_prefix()},
    mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    intra AS (
        SELECT a.label, CAST(COUNT(*) AS BIGINT) AS ec
        FROM e JOIN l3 a ON e.u = a.v JOIN l3 b ON e.v = b.v
        WHERE a.label = b.label
        GROUP BY a.label
    ),
    deg AS (
        SELECT a.label, CAST(COUNT(*) AS BIGINT) AS dc
        FROM sym s JOIN l3 a ON s.src = a.v
        GROUP BY a.label
    ),
    comm AS (
        SELECT d.label, COALESCE(i.ec, 0) AS ec, d.dc
        FROM deg d LEFT JOIN intra i ON d.label = i.label
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(mm.m AS BIGINT) AS n_edges,
           CAST(SUM(4 * mm.m * ec - dc * dc) AS BIGINT) AS q_numerator,
           CAST(4 * mm.m * mm.m AS BIGINT) AS q_denominator,
           CAST(SUM(4 * mm.m * ec - dc * dc) * 1000000
                // (4 * mm.m * mm.m) AS BIGINT) AS q_millionths
    FROM comm, mm
    GROUP BY mm.m
    """


@_register("q246_modularity", oracle=_q246_oracle())
def q246_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-rational modularity of the q236 partition on the
    co-purchase graph: one row with the community count, edge count,
    integer numerator/denominator, and floor-scaled millionths."""
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    # memoized checkpointed artifact — all 3 consuming legs read its
    # executor-resident blocks (no re-persist: derived-persist net loss)
    lab = lp_labels(spark, sf_dir)
    m = edges.count()  # driver scalar from the checkpointed blocks
    a = lab.select(F.col("v").alias("u"), F.col("label").alias("la"))
    b = lab.select(F.col("v").alias("v"), F.col("label").alias("lb"))
    intra = (
        edges.join(a, "u").join(b, "v")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("ec"))
    )
    sym = edges.select(F.col("u").alias("src")).unionAll(
        edges.select(F.col("v").alias("src"))
    )
    deg = (
        sym.join(lab, sym["src"] == lab["v"])
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("dc"))
    )
    comm = deg.join(intra, "label", "left").select(
        "label", F.coalesce("ec", F.lit(0)).cast("long").alias("ec"), "dc"
    )
    # m rides into the SQL as a BIGINT literal (L suffix): bare int
    # literals are INT32 in Spark SQL and 4·m·m overflowed at the sf1
    # soak's edge count (ANSI errored loudly; the int64 headroom bound
    # itself is documented above).
    return comm.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.lit(m).cast("long").alias("n_edges"),
        F.sum(4 * F.lit(m).cast("long") * F.col("ec")
              - F.col("dc") * F.col("dc"))
        .cast("long").alias("q_numerator"),
        F.lit(4 * m * m).cast("long").alias("q_denominator"),
        F.expr(f"CAST(SUM(4L * {m}L * ec - dc * dc) * 1000000L"
               f" div (4L * {m}L * {m}L) AS BIGINT)").alias("q_millionths"),
    )


# ---------------------------------------------------------------------------
# q314 — one SYNCHRONIZED Louvain local-move round (Blondel et al. 2008,
# phase-1 step; the synchronous variant distributed implementations use,
# e.g. Grappolo): starting from the q236 label-propagation partition,
# every vertex simultaneously evaluates moving to each NEIGHBOR
# community and takes the move with the largest positive modularity
# gain. Completes the community family: q236 detects (majority labels),
# q246 MEASURES modularity, this OPTIMIZES it — and the output proves
# the optimization did its job (q_after ≥ q_before on the same exact
# integer scale).
#
# Exact integer gain, ×2m so no division appears: moving v from a to c
# changes Q by [k_{v,c} − k_v·tot_c/2m] − [k_{v,a∖v} − k_v·(tot_a−k_v)/2m],
# so gain2m = (2m·k_vc − k_v·tot_c) − (2m·k_va − k_v·(tot_a − k_v)) —
# all int64 (magnitudes ≤ ~4m·k_max, the q246 headroom class; widen to
# decimal(38,0) past m ≈ 1e9 edges). Move iff max gain2m > 0, argmax
# ties on the smaller community label — deterministic, so the oracle
# replays the identical round. Synchronous rounds can oscillate over
# iterations; ONE round is well-defined and is what's pinned here.
#
# Plan shape: degrees/community totals are label-grain aggregates;
# candidate gains live on the (vertex, neighbor-community) grain —
# bounded by Σ deg(v) = 2m rows, same mass as the edge list; the argmax
# is a window partitioned by vertex (high cardinality). Modularity
# before/after reuses the q246 aggregates on l3 and on the moved
# labels. m is a driver scalar off the checkpointed edge artifact.
# ---------------------------------------------------------------------------


def _q314_qmod(lab: str, suffix: str) -> str:
    """Exact-integer modularity audit CTEs (the q246 formula) over the
    label CTE ``lab`` — shared by q314's before/after pair and q319's
    contracted-round after. Module-level so both oracles splice it."""
    return f"""
    intra{suffix} AS (
        SELECT a.label, CAST(COUNT(*) AS BIGINT) AS ec
        FROM e JOIN {lab} a ON e.u = a.v JOIN {lab} b ON e.v = b.v
        WHERE a.label = b.label
        GROUP BY a.label
    ),
    dg{suffix} AS (
        SELECT a.label, CAST(COUNT(*) AS BIGINT) AS dc
        FROM sym s JOIN {lab} a ON s.src = a.v
        GROUP BY a.label
    ),
    q{suffix} AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
               CAST(SUM(4 * mm.m * COALESCE(i.ec, 0) - d.dc * d.dc)
                    * 1000000 // (4 * mm.m * mm.m) AS BIGINT) AS qm
        FROM dg{suffix} d LEFT JOIN intra{suffix} i ON d.label = i.label,
             mm
        GROUP BY mm.m
    )"""


def _q314_chain() -> str:
    """The LP prefix + one synchronized local-move round, ending at
    l4(v, label, moved) — shared by q314's oracle and q319's, which
    contracts l4 and runs the phase-2 round on the super-graph."""
    return f"""
    {_q236_cte_prefix()},
    mm AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS k
            FROM sym GROUP BY src),
    tot AS MATERIALIZED (
            SELECT a.label, CAST(SUM(d.k) AS BIGINT) AS tot
            FROM l3 a JOIN deg d ON a.v = d.v GROUP BY a.label),
    kvc AS MATERIALIZED (SELECT s.src AS v, lb.label AS c, CAST(COUNT(*) AS BIGINT) AS kvc
            FROM sym s JOIN l3 lb ON s.dst = lb.v GROUP BY s.src, lb.label),
    own AS MATERIALIZED (
        SELECT l3.v, l3.label AS a, d.k, ta.tot AS tot_a,
               COALESCE(ka.kvc, 0) AS k_va
        FROM l3 JOIN deg d ON l3.v = d.v
                JOIN tot ta ON l3.label = ta.label
        LEFT JOIN kvc ka ON ka.v = l3.v AND ka.c = l3.label
    ),
    cand AS (
        SELECT o.v, o.a, k.c,
               (2 * mm.m * k.kvc - o.k * tc.tot)
               - (2 * mm.m * o.k_va - o.k * (o.tot_a - o.k)) AS gain2m
        FROM own o
        JOIN kvc k ON k.v = o.v AND k.c <> o.a
        JOIN tot tc ON k.c = tc.label, mm
    ),
    best AS MATERIALIZED (
        SELECT v, c, gain2m FROM (
            SELECT v, c, gain2m,
                   ROW_NUMBER() OVER (PARTITION BY v
                                      ORDER BY gain2m DESC, c) AS rn
            FROM cand
        ) WHERE rn = 1
    ),
    l4 AS MATERIALIZED (
        SELECT o.v,
               CASE WHEN b.gain2m > 0 THEN b.c ELSE o.a END AS label,
               CASE WHEN b.gain2m > 0 THEN 1 ELSE 0 END AS moved
        FROM own o LEFT JOIN best b ON o.v = b.v
    )"""


def _q314_oracle() -> str:
    return f"""{_q314_chain()},
    {_q314_qmod("l3", "3")},
    {_q314_qmod("l4", "4")}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l3) AS n_vertices,
           (SELECT CAST(SUM(moved) AS BIGINT) FROM l4) AS n_moved,
           (SELECT n_comm FROM q3) AS n_comm_before,
           (SELECT n_comm FROM q4) AS n_comm_after,
           (SELECT qm FROM q3) AS q_before_millionths,
           (SELECT qm FROM q4) AS q_after_millionths
    """


_L4_MEMO_ATTR = "_etl_globalretail_l4_memo"


def louvain_moved_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, label, moved) after ONE synchronized Louvain local-move round
    over the q236 partition — q314's move round as a session-memoized
    executor-resident artifact (the lp_labels device one level up), so
    q314's report and q319's phase-2 contraction pay the gain
    computation once per (session, corpus)."""
    memo = getattr(spark, _L4_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _L4_MEMO_ATTR, memo)
    if sf_dir in memo:
        return memo[sf_dir]
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    # lp_labels is itself a memoized checkpointed artifact — every
    # consuming leg reads its executor-resident blocks (re-persisting a
    # checkpointed frame is the derived-persist net-loss PLANS.md notes)
    lab = lp_labels(spark, sf_dir)
    m = edges.count()  # driver scalar off the checkpointed blocks
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    tot = (
        lab.join(deg, "v")
        .groupBy("label")
        .agg(F.sum("k").cast("long").alias("tot"))
    )
    kvc = (
        sym.join(
            lab.select(F.col("v").alias("dst"), F.col("label").alias("c")),
            "dst",
        )
        .groupBy(F.col("src").alias("v"), "c")
        .agg(F.count(F.lit(1)).cast("long").alias("kvc"))
    )
    own = (
        lab.select("v", F.col("label").alias("a"))
        .join(deg, "v")
        .join(tot.select(F.col("label").alias("a"),
                         F.col("tot").alias("tot_a")), "a")
        .join(
            kvc.select("v", F.col("c").alias("a"),
                       F.col("kvc").alias("k_va")),
            ["v", "a"], "left",
        )
        .select("v", "a", "k", "tot_a",
                F.coalesce("k_va", F.lit(0)).cast("long").alias("k_va"))
        # feeds the candidate gains AND the l4 stitch — persist or the
        # whole label/degree pipeline replans twice; released once the
        # l4 artifact is materialized below.
        .persist()
    )
    m2 = F.lit(2 * m).cast("long")
    cand = (
        own.join(kvc, "v")
        .filter(F.col("c") != F.col("a"))
        .join(tot.select(F.col("label").alias("c"),
                         F.col("tot").alias("tot_c")), "c")
        .select(
            "v", "a", "c",
            ((m2 * F.col("kvc") - F.col("k") * F.col("tot_c"))
             - (m2 * F.col("k_va")
                - F.col("k") * (F.col("tot_a") - F.col("k"))))
            .cast("long").alias("gain2m"),
        )
    )
    wv = Window.partitionBy("v").orderBy(F.desc("gain2m"), F.asc("c"))
    best = (
        cand.select("v", "c", "gain2m",
                    F.row_number().over(wv).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("v", "c", "gain2m")
    )
    l4 = (
        own.select("v", "a")
        .join(best, "v", "left")
        .select(
            "v",
            F.when(F.col("gain2m") > 0, F.col("c")).otherwise(F.col("a"))
            .alias("label"),
            F.when(F.col("gain2m") > 0, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("moved"),
        )
    )
    memo[sf_dir] = materialize(l4)
    own.unpersist()
    return memo[sf_dir]


@_register("q314_louvain_move", oracle=_q314_oracle())
def q314_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronized Louvain local-move round over the q236 partition
    with exact-integer gains; reports moved-vertex count and modularity
    before/after on the q246 scale. See block comment."""
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    lab = lp_labels(spark, sf_dir)
    l4 = louvain_moved_labels(spark, sf_dir)  # memoized artifact
    m = edges.count()  # driver scalar off the checkpointed blocks
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )

    def qmod(labels: "DataFrame"):
        a = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
        b = labels.select("v", F.col("label").alias("lb"))
        intra = (
            edges.join(a, "u").join(b, "v")
            .filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("ec"))
        )
        dg = (
            sym.join(labels.select(F.col("v").alias("src"), "label"), "src")
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("dc"))
        )
        comm = dg.join(intra, "label", "left").select(
            "label", F.coalesce("ec", F.lit(0)).cast("long").alias("ec"),
            "dc",
        )
        return comm.agg(
            F.count(F.lit(1)).cast("long").alias("n_comm"),
            F.expr(f"CAST(SUM(4L * {m}L * ec - dc * dc) * 1000000L"
                   f" div (4L * {m}L * {m}L) AS BIGINT)").alias("qm"),
        )

    before = qmod(lab).select(
        F.col("n_comm").alias("n_comm_before"),
        F.col("qm").alias("q_before_millionths"),
    )
    after = qmod(l4.select("v", "label")).select(
        F.col("n_comm").alias("n_comm_after"),
        F.col("qm").alias("q_after_millionths"),
    )
    counts = l4.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum("moved").cast("long").alias("n_moved"),
    )
    # three 1-row legs -> ONE job via crossJoin of broadcast singletons
    # (the q283 union-the-scalar-legs stance; bounded by construction)
    return (
        counts.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            "n_vertices", "n_moved", "n_comm_before", "n_comm_after",
            "q_before_millionths", "q_after_millionths",
        )
    )


# ---------------------------------------------------------------------------
# q319 — Louvain PHASE 2 (Blondel et al. 2008 aggregation step): contract
# q314's post-move communities into a weighted super-graph and run one
# more local-move round ON THE SUPER-GRAPH — completing one full outer
# Louvain iteration (phase-1 move → contraction → phase-1 on the
# contracted graph), per VERDICT r7 item 6. q314 moves vertices; this
# merges whole communities.
#
# Contraction: super-vertices are l4's labels; super-edge weight
# w(C1,C2) = inter-community edge count (C1 < C2); super-strength
# k_C = Σ_{v∈C} deg(v) (intra edges ride inside k_C — a self-loop moves
# with its vertex and never enters a gain). Phase-2 round starts from
# SINGLETON communities (each super-vertex its own community — the
# Blondel restart), so the move gain collapses to
#   gain2m = 2m·w(V,C) − k_V·k_C            (all int64: ≤ 4m², the q246
# headroom class), symmetric in (V, C). Symmetry makes mutual-best
# 2-cycles the dominant synchronous pathology (V and C each pick the
# other; both moving just swaps labels and merges nothing), so the round
# applies the deterministic SWAP GUARD distributed implementations use:
# in a mutual-best pair with positive gain, only the LARGER id moves
# (into the smaller) — both engines replay it exactly.
#
# The output audits the whole iteration on the FLAT partition (vertices
# re-labeled through the contraction map) with the exact q246 integer
# formula: q_before = q314's q_after (pytest-pinned equal), and
# q_after ≥ q_before is the Q-monotonicity law the merge round must
# deliver (merging positive-gain community pairs raises Q; the guard
# keeps simultaneous moves from cancelling).
#
# Scale shape: contraction is two label-map equi-joins + one
# (C1,C2)-grouped count — |E|-sized with map-side combine; everything
# after runs at SUPER-graph grain (|communities| vertices, ≤ |E|
# super-edges): gains are one join per endpoint, the argmax is a window
# partitioned by super-vertex, and the guard is one self-join on the
# best-move frame. l4 comes from the memoized louvain_moved_labels
# artifact, so the phase-1 round is never recomputed here.
# ---------------------------------------------------------------------------


def _q319_oracle() -> str:
    return f"""{_q314_chain()},
    cmap AS MATERIALIZED (SELECT v, label AS c FROM l4),
    ce AS MATERIALIZED (
        SELECT LEAST(a.c, b.c) AS c1, GREATEST(a.c, b.c) AS c2,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM e JOIN cmap a ON e.u = a.v JOIN cmap b ON e.v = b.v
        WHERE a.c <> b.c
        GROUP BY 1, 2
    ),
    ck AS MATERIALIZED (
        SELECT a.c AS cid, CAST(COUNT(*) AS BIGINT) AS k
        FROM sym s JOIN cmap a ON s.src = a.v GROUP BY a.c
    ),
    scand AS (
        SELECT c1 AS v, c2 AS c, w FROM ce
        UNION ALL
        SELECT c2 AS v, c1 AS c, w FROM ce
    ),
    sg AS (
        SELECT sc.v, sc.c,
               2 * mm.m * sc.w - kv.k * kc.k AS gain2m
        FROM scand sc
        JOIN ck kv ON kv.cid = sc.v
        JOIN ck kc ON kc.cid = sc.c, mm
    ),
    b5 AS MATERIALIZED (
        SELECT v, c, gain2m FROM (
            SELECT v, c, gain2m,
                   ROW_NUMBER() OVER (PARTITION BY v
                                      ORDER BY gain2m DESC, c) AS rn
            FROM sg
        ) WHERE rn = 1
    ),
    l5 AS MATERIALIZED (
        SELECT k.cid AS v,
               CASE WHEN b.gain2m > 0
                     AND NOT COALESCE(bc.c = k.cid AND bc.gain2m > 0
                                      AND k.cid < b.c, FALSE)
                    THEN b.c ELSE k.cid END AS label,
               CASE WHEN b.gain2m > 0
                     AND NOT COALESCE(bc.c = k.cid AND bc.gain2m > 0
                                      AND k.cid < b.c, FALSE)
                    THEN 1 ELSE 0 END AS merged
        FROM ck k
        LEFT JOIN b5 b ON b.v = k.cid
        LEFT JOIN b5 bc ON bc.v = b.c
    ),
    flat5 AS MATERIALIZED (
        SELECT cm.v, l5.label FROM cmap cm JOIN l5 ON cm.c = l5.v
    ),
    {_q314_qmod("l4", "4")},
    {_q314_qmod("flat5", "5")}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) AS n_super_vertices,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ce) AS n_super_edges,
           (SELECT CAST(COALESCE(SUM(merged), 0) AS BIGINT) FROM l5)
               AS n_merged_supers,
           (SELECT n_comm FROM q4) AS n_comm_before,
           (SELECT n_comm FROM q5) AS n_comm_after,
           (SELECT qm FROM q4) AS q_before_millionths,
           (SELECT qm FROM q5) AS q_after_millionths
    """


@_register("q319_louvain_contract", oracle=_q319_oracle())
def q319_louvain_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain phase 2: contract q314's communities into a weighted
    super-graph, run one swap-guarded singleton-init local-move round on
    it, and audit modularity of the induced flat partition before/after
    on the q246 exact-integer scale. See block comment."""
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    l4 = louvain_moved_labels(spark, sf_dir)  # memoized artifact
    m = edges.count()  # driver scalar off the checkpointed blocks
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    cmap = l4.select("v", F.col("label").alias("c"))
    ce = (
        edges.join(cmap.select(F.col("v").alias("u"),
                               F.col("c").alias("ca")), "u")
        .join(cmap.select("v", F.col("c").alias("cb")), "v")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(
            F.least("ca", "cb").alias("c1"),
            F.greatest("ca", "cb").alias("c2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        # consumed by both directed candidate legs AND the super-edge
        # count — persist; lifetime tied to the returned plan.
        .persist()
    )
    ck = (
        sym.join(cmap.select(F.col("v").alias("src"), "c"), "src")
        .groupBy(F.col("c").alias("cid"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .persist()  # feeds both gain endpoints, l5, and the census
    )
    scand = ce.select(F.col("c1").alias("v"), F.col("c2").alias("c"), "w") \
        .unionAll(ce.select(F.col("c2").alias("v"),
                            F.col("c1").alias("c"), "w"))
    m2 = F.lit(2 * m).cast("long")
    sg = (
        scand.join(ck.select(F.col("cid").alias("v"),
                             F.col("k").alias("kv")), "v")
        .join(ck.select(F.col("cid").alias("c"),
                        F.col("k").alias("kc")), "c")
        .select(
            "v", "c",
            (m2 * F.col("w") - F.col("kv") * F.col("kc"))
            .cast("long").alias("gain2m"),
        )
    )
    wv = Window.partitionBy("v").orderBy(F.desc("gain2m"), F.asc("c"))
    b5 = (
        sg.select("v", "c", "gain2m", F.row_number().over(wv).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("v", "c", "gain2m")
        .persist()  # self-joined for the swap guard
    )
    moves = F.col("gain2m") > 0
    guard = ~F.coalesce(
        (F.col("bc_c") == F.col("cid")) & (F.col("bc_gain") > 0)
        & (F.col("cid") < F.col("c")),
        F.lit(False),
    )
    l5 = (
        ck.select("cid")
        .join(b5.withColumnRenamed("v", "cid"), "cid", "left")
        .join(
            b5.select(F.col("v").alias("c"),
                      F.col("c").alias("bc_c"),
                      F.col("gain2m").alias("bc_gain")),
            "c", "left",
        )
        .select(
            F.col("cid").alias("sv"),
            F.when(moves & guard, F.col("c")).otherwise(F.col("cid"))
            .alias("label"),
            F.when(moves & guard, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("merged"),
        )
        .persist()  # feeds the merge count AND the flat re-label
    )
    flat5 = cmap.join(
        l5.select(F.col("sv").alias("c"), "label"), "c"
    ).select("v", "label")

    def qmod(labels: "DataFrame"):
        a = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
        b = labels.select("v", F.col("label").alias("lb"))
        intra = (
            edges.join(a, "u").join(b, "v")
            .filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("ec"))
        )
        dg = (
            sym.join(labels.select(F.col("v").alias("src"), "label"), "src")
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("dc"))
        )
        comm = dg.join(intra, "label", "left").select(
            "label", F.coalesce("ec", F.lit(0)).cast("long").alias("ec"),
            "dc",
        )
        return comm.agg(
            F.count(F.lit(1)).cast("long").alias("n_comm"),
            F.expr(f"CAST(SUM(4L * {m}L * ec - dc * dc) * 1000000L"
                   f" div (4L * {m}L * {m}L) AS BIGINT)").alias("qm"),
        )

    before = qmod(l4.select("v", "label")).select(
        F.col("n_comm").alias("n_comm_before"),
        F.col("qm").alias("q_before_millionths"),
    )
    after = qmod(flat5).select(
        F.col("n_comm").alias("n_comm_after"),
        F.col("qm").alias("q_after_millionths"),
    )
    census = ck.agg(
        F.count(F.lit(1)).cast("long").alias("n_super_vertices"),
    ).crossJoin(F.broadcast(
        ce.agg(F.count(F.lit(1)).cast("long").alias("n_super_edges"))
    )).crossJoin(F.broadcast(
        l5.agg(F.coalesce(F.sum("merged"), F.lit(0)).cast("long")
               .alias("n_merged_supers"))
    ))
    # 1-row legs stitched via broadcast crossJoins into ONE job (the
    # q283/q314 union-the-scalar-legs stance; bounded by construction)
    return (
        census.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            "n_super_vertices", "n_super_edges", "n_merged_supers",
            "n_comm_before", "n_comm_after",
            "q_before_millionths", "q_after_millionths",
        )
    )


# ---------------------------------------------------------------------------
# q326 — Louvain LEVEL 2 (multi-level aggregation, Blondel et al. 2008):
# contract q319's flat partition into a SECOND weighted super-graph and
# run one more swap-guarded singleton local-move round on it — the
# third outer step of the full multi-level pipeline (move → contract →
# move → CONTRACT → MOVE), each level coarser than the last. q314
# moves vertices, q319 merges communities, THIS merges communities of
# communities; modularity is audited on the induced flat partition at
# every step and can only rise (pytest-pinned, with q_before ≡ q319's
# q_after — the levels compose).
#
# Mechanics are EXACTLY q319's one level up (the shared
# `_contract_move_round` helper): super-edge weights from two
# label-map equi-joins + one grouped count, singleton gains
# gain2m = 2m·w(V,C) − k_V·k_C, argmax with (gain DESC, c ASC) ties,
# and the deterministic mutual-best SWAP GUARD (larger id moves).
# Level-1's flat labels come from the memoized `louvain_level2_labels`
# artifact, so the level-1 round is computed once per (session,
# corpus) and never inside this query's plan.
#
# Scale shape: every level runs at the CURRENT super-graph grain,
# which shrinks monotonically (level 2 is |communities-of-communities|
# vertices) — the multi-level property that makes Louvain near-linear
# in practice.
# ---------------------------------------------------------------------------


def _contract_move_round(edges, sym, m, labels):
    """One Louvain aggregation level over ``labels`` (v, label):
    contract into a weighted super-graph, run a swap-guarded
    singleton-init local-move round, and return lazy frames
    (ce super-edges [persisted], ck super-strengths [persisted],
    l5 moves [persisted], flat re-labeled vertices). Persisted frames'
    lifetimes are tied to the consuming plan (harness clearCache) or
    released by the caller after materialization."""
    cmap = labels.select("v", F.col("label").alias("c"))
    ce = (
        edges.join(cmap.select(F.col("v").alias("u"),
                               F.col("c").alias("ca")), "u")
        .join(cmap.select("v", F.col("c").alias("cb")), "v")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(
            F.least("ca", "cb").alias("c1"),
            F.greatest("ca", "cb").alias("c2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .persist()
    )
    ck = (
        sym.join(cmap.select(F.col("v").alias("src"), "c"), "src")
        .groupBy(F.col("c").alias("cid"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .persist()
    )
    scand = ce.select(F.col("c1").alias("v"), F.col("c2").alias("c"), "w") \
        .unionAll(ce.select(F.col("c2").alias("v"),
                            F.col("c1").alias("c"), "w"))
    m2 = F.lit(2 * m).cast("long")
    sg = (
        scand.join(ck.select(F.col("cid").alias("v"),
                             F.col("k").alias("kv")), "v")
        .join(ck.select(F.col("cid").alias("c"),
                        F.col("k").alias("kc")), "c")
        .select(
            "v", "c",
            (m2 * F.col("w") - F.col("kv") * F.col("kc"))
            .cast("long").alias("gain2m"),
        )
    )
    wv = Window.partitionBy("v").orderBy(F.desc("gain2m"), F.asc("c"))
    b5 = (
        sg.select("v", "c", "gain2m", F.row_number().over(wv).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("v", "c", "gain2m")
        .persist()
    )
    moves = F.col("gain2m") > 0
    guard = ~F.coalesce(
        (F.col("bc_c") == F.col("cid")) & (F.col("bc_gain") > 0)
        & (F.col("cid") < F.col("c")),
        F.lit(False),
    )
    l5 = (
        ck.select("cid")
        .join(b5.withColumnRenamed("v", "cid"), "cid", "left")
        .join(
            b5.select(F.col("v").alias("c"),
                      F.col("c").alias("bc_c"),
                      F.col("gain2m").alias("bc_gain")),
            "c", "left",
        )
        .select(
            F.col("cid").alias("sv"),
            F.when(moves & guard, F.col("c")).otherwise(F.col("cid"))
            .alias("label"),
            F.when(moves & guard, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("merged"),
        )
        .persist()
    )
    flat = cmap.join(
        l5.select(F.col("sv").alias("c"), "label"), "c"
    ).select("v", "label")
    return ce, ck, l5, flat


_L5_MEMO_ATTR = "_etl_globalretail_l5_memo"


def louvain_level2_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, label) flat partition after the LEVEL-1 contraction round
    (q319's result) as a session-memoized executor-resident artifact —
    the louvain_moved_labels device one level up, so q326's level-2
    round never recomputes level 1."""
    memo = getattr(spark, _L5_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _L5_MEMO_ATTR, memo)
    if sf_dir in memo:
        return memo[sf_dir]
    edges = co_purchase_edges(spark, sf_dir)
    l4 = louvain_moved_labels(spark, sf_dir)
    m = edges.count()
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    ce, ck, l5, flat = _contract_move_round(
        edges, sym, m, l4.select("v", "label")
    )
    memo[sf_dir] = materialize(flat)
    for fr in (ce, ck, l5):
        fr.unpersist()
    return memo[sf_dir]


def _q326_round_sql(lvl: str, lab: str) -> str:
    """One contraction + swap-guarded move round as CTEs over the label
    CTE ``lab``, producing ce{lvl}/ck{lvl}/l{lvl}m/flat{lvl}."""
    return f"""
    cmap{lvl} AS MATERIALIZED (SELECT v, label AS c FROM {lab}),
    ce{lvl} AS MATERIALIZED (
        SELECT LEAST(a.c, b.c) AS c1, GREATEST(a.c, b.c) AS c2,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM e JOIN cmap{lvl} a ON e.u = a.v JOIN cmap{lvl} b ON e.v = b.v
        WHERE a.c <> b.c
        GROUP BY 1, 2
    ),
    ck{lvl} AS MATERIALIZED (
        SELECT a.c AS cid, CAST(COUNT(*) AS BIGINT) AS k
        FROM sym s JOIN cmap{lvl} a ON s.src = a.v GROUP BY a.c
    ),
    sg{lvl} AS (
        SELECT sc.v, sc.c,
               2 * mm.m * sc.w - kv.k * kc.k AS gain2m
        FROM (
            SELECT c1 AS v, c2 AS c, w FROM ce{lvl}
            UNION ALL
            SELECT c2 AS v, c1 AS c, w FROM ce{lvl}
        ) sc
        JOIN ck{lvl} kv ON kv.cid = sc.v
        JOIN ck{lvl} kc ON kc.cid = sc.c, mm
    ),
    b{lvl} AS MATERIALIZED (
        SELECT v, c, gain2m FROM (
            SELECT v, c, gain2m,
                   ROW_NUMBER() OVER (PARTITION BY v
                                      ORDER BY gain2m DESC, c) AS rn
            FROM sg{lvl}
        ) WHERE rn = 1
    ),
    l{lvl}m AS MATERIALIZED (
        SELECT k.cid AS v,
               CASE WHEN b.gain2m > 0
                     AND NOT COALESCE(bc.c = k.cid AND bc.gain2m > 0
                                      AND k.cid < b.c, FALSE)
                    THEN b.c ELSE k.cid END AS label,
               CASE WHEN b.gain2m > 0
                     AND NOT COALESCE(bc.c = k.cid AND bc.gain2m > 0
                                      AND k.cid < b.c, FALSE)
                    THEN 1 ELSE 0 END AS merged
        FROM ck{lvl} k
        LEFT JOIN b{lvl} b ON b.v = k.cid
        LEFT JOIN b{lvl} bc ON bc.v = b.c
    ),
    flat{lvl} AS MATERIALIZED (
        SELECT cm.v, lm.label FROM cmap{lvl} cm
        JOIN l{lvl}m lm ON cm.c = lm.v
    )"""


def _q326_oracle() -> str:
    return f"""{_q314_chain()},
    {_q326_round_sql('5', 'l4')},
    {_q326_round_sql('6', 'flat5')},
    {_q314_qmod("flat5", "5")},
    {_q314_qmod("flat6", "6")}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ck6) AS n_super_vertices,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ce6) AS n_super_edges,
           (SELECT CAST(COALESCE(SUM(merged), 0) AS BIGINT) FROM l6m)
               AS n_merged_supers,
           (SELECT n_comm FROM q5) AS n_comm_before,
           (SELECT n_comm FROM q6) AS n_comm_after,
           (SELECT qm FROM q5) AS q_before_millionths,
           (SELECT qm FROM q6) AS q_after_millionths
    """


@_register("q326_louvain_level2", oracle=_q326_oracle())
def q326_louvain_level2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain level 2: contract q319's flat partition into a second
    weighted super-graph, run one more swap-guarded singleton move
    round, audit modularity of the induced flat partition before/after
    on the q246 exact-integer scale. See block comment."""
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    flat5 = louvain_level2_labels(spark, sf_dir)  # memoized artifact
    m = edges.count()  # driver scalar off the checkpointed blocks
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    ce2, ck2, l6, flat6 = _contract_move_round(edges, sym, m, flat5)

    def qmod(labels: "DataFrame"):
        a = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
        b = labels.select("v", F.col("label").alias("lb"))
        intra = (
            edges.join(a, "u").join(b, "v")
            .filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("ec"))
        )
        dg = (
            sym.join(labels.select(F.col("v").alias("src"), "label"), "src")
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("dc"))
        )
        comm = dg.join(intra, "label", "left").select(
            "label", F.coalesce("ec", F.lit(0)).cast("long").alias("ec"),
            "dc",
        )
        return comm.agg(
            F.count(F.lit(1)).cast("long").alias("n_comm"),
            F.expr(f"CAST(SUM(4L * {m}L * ec - dc * dc) * 1000000L"
                   f" div (4L * {m}L * {m}L) AS BIGINT)").alias("qm"),
        )

    before = qmod(flat5).select(
        F.col("n_comm").alias("n_comm_before"),
        F.col("qm").alias("q_before_millionths"),
    )
    after = qmod(flat6).select(
        F.col("n_comm").alias("n_comm_after"),
        F.col("qm").alias("q_after_millionths"),
    )
    census = ck2.agg(
        F.count(F.lit(1)).cast("long").alias("n_super_vertices"),
    ).crossJoin(F.broadcast(
        ce2.agg(F.count(F.lit(1)).cast("long").alias("n_super_edges"))
    )).crossJoin(F.broadcast(
        l6.agg(F.coalesce(F.sum("merged"), F.lit(0)).cast("long")
               .alias("n_merged_supers"))
    ))
    # 1-row legs stitched via broadcast crossJoins into ONE job (the
    # q283/q314/q319 stance; bounded by construction)
    return (
        census.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            "n_super_vertices", "n_super_edges", "n_merged_supers",
            "n_comm_before", "n_comm_after",
            "q_before_millionths", "q_after_millionths",
        )
    )


# ---------------------------------------------------------------------------
# q365 — Louvain TO CONVERGENCE (VERDICT r8 item 5): the
# repeat-until-no-positive-move aggregation loop that turns the
# one-round-per-level family (q314 move, q319 contract, q326 level 2)
# into a TERMINATING algorithm. Starting from q319's flat partition
# (the memoized louvain_level2_labels artifact), run swap-guarded
# singleton contraction rounds (the q326 `_contract_move_round`)
# until a round merges NOTHING, bounded at K = 6 rounds (at sf0.01 the
# trajectory is 149/63/32/15/0 merges — fixpoint in round 5; the
# bound is the termination insurance every production Louvain carries).
#
# Fixpoint semantics make the DYNAMIC loop oracle-expressible with a
# STATIC unroll: merged == 0 means no positive-gain move existed, so
# the round is the identity and every later round is too (labels,
# gains and guards are all deterministic functions of the labels) —
# the SQL unrolls exactly K rounds and rounds past the fixpoint
# contribute zero merges and identical labels. The driver-checked stop
# (merged_r == 0, a 1-row collect per round) is therefore pure
# compute-saving, never a semantic fork; ΔQ = 0 at the stop is the
# q-fixpoint law pinned in tests/test_round9.py.
#
# Execution: the SHARED-MEMORY SWITCH every production multi-level
# Louvain makes (Grappolo/Vite posture — once the contracted graph
# fits one node, stop paying distributed-round overhead). The level-1
# super-graph (weights ce, strengths ck — both ADDITIVE under further
# contraction, so later rounds aggregate them through the current
# label map instead of rescanning edges) is collected when its edge
# count is under _Q365_DRIVER_EDGE_BOUND and the remaining rounds run
# as exact driver-side integer algebra replaying the identical
# trajectory (same gains, same (gain DESC, c ASC) argmax, same swap
# guard). Measured: the distributed per-round path cost GREW
# 8.9/4.0/5.4/29.7 s on the shrinking 191-node graph at sf0.01 — pure
# per-round job overhead, the q343 lesson — vs < 0.1 s driver-side.
# Over the bound the rounds fall back to the distributed
# `_contract_move_round` (the q326 machinery), each round
# localCheckpointed (q212 rule) with scratch frames unpersisted after
# its merge-count collect.
#
# Scale shape: the corpus-sized work (edge build, LP, phase 1, level 1,
# the two vertex-grain modularity audits, the |V|-row final relabel
# join) is all Spark; only the ≤bound super-graph and its ≤|nodes|
# label map ever reach the driver. Modularity is audited with the
# exact q246 integer formula on the flat (vertex-grain) partitions.
# ---------------------------------------------------------------------------

_Q365_MAX_ROUNDS = 6


def _q365_oracle() -> str:
    rounds = ",".join(
        _q326_round_sql(str(6 + r), "flat5" if r == 0 else f"flat{5 + r}")
        for r in range(_Q365_MAX_ROUNDS)
    )
    last = 5 + _Q365_MAX_ROUNDS
    merged = ", ".join(
        f"(SELECT CAST(COALESCE(SUM(merged), 0) AS BIGINT) FROM l{6 + r}m)"
        f" AS m{r + 1}"
        for r in range(_Q365_MAX_ROUNDS)
    )
    active = " + ".join(
        f"CASE WHEN m{r + 1} > 0 THEN 1 ELSE 0 END"
        for r in range(_Q365_MAX_ROUNDS)
    )
    total = " + ".join(f"m{r + 1}" for r in range(_Q365_MAX_ROUNDS))
    return f"""{_q314_chain()},
    {_q326_round_sql('5', 'l4')},
    {rounds},
    {_q314_qmod("flat5", "5")},
    {_q314_qmod(f"flat{last}", str(last))},
    mg AS (SELECT {merged})
    SELECT CAST({_Q365_MAX_ROUNDS} AS BIGINT) AS n_rounds_max,
           CAST({active} AS BIGINT) AS n_active_rounds,
           CAST({total} AS BIGINT) AS n_merged_total,
           CAST(CASE WHEN m{_Q365_MAX_ROUNDS} = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS converged,
           (SELECT n_comm FROM q5) AS n_comm_initial,
           (SELECT n_comm FROM q{last}) AS n_comm_final,
           (SELECT qm FROM q5) AS q_initial_millionths,
           (SELECT qm FROM q{last}) AS q_final_millionths
    FROM mg
    """


_Q365_DRIVER_EDGE_BOUND = 5_000_000


@_register("q365_louvain_converged", oracle=_q365_oracle())
def q365_louvain_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain aggregation rounds from q319's flat partition until no
    positive-gain merge remains (K = 6 bound, driver-checked stop);
    remaining rounds run driver-side once the contracted super-graph
    fits the documented shared-memory switch bound. Audits modularity
    at start and fixpoint on the q246 exact-integer scale. See block
    comment."""
    edges = co_purchase_edges(spark, sf_dir)  # checkpointed artifact
    flat0 = louvain_level2_labels(spark, sf_dir)  # memoized artifact
    m = edges.count()  # driver scalar off the checkpointed blocks
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    # Contract ONCE to the level-1 super-graph (nodes = flat0 labels).
    cmap = flat0.select("v", F.col("label").alias("c"))
    ce5 = (
        edges.join(cmap.select(F.col("v").alias("u"),
                               F.col("c").alias("ca")), "u")
        .join(cmap.select("v", F.col("c").alias("cb")), "v")
        .filter(F.col("ca") != F.col("cb"))
        .groupBy(
            F.least("ca", "cb").alias("c1"),
            F.greatest("ca", "cb").alias("c2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ck5 = (
        sym.join(cmap.select(F.col("v").alias("src"), "c"), "src")
        .groupBy(F.col("c").alias("cid"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    w5 = {(r["c1"], r["c2"]): r["w"] for r in ce5.collect()}
    k5 = {r["cid"]: r["k"] for r in ck5.collect()}
    if len(w5) > _Q365_DRIVER_EDGE_BOUND:  # pragma: no cover — the
        # over-bound fallback: distributed rounds (q326 machinery),
        # localCheckpoint per round, scratch unpersisted per round.
        cur, merged_counts = flat0, []
        while len(merged_counts) < _Q365_MAX_ROUNDS:
            ce, ck, lm, nflat = _contract_move_round(edges, sym, m, cur)
            nflat = materialize(nflat)
            mr = int(
                lm.agg(F.coalesce(F.sum("merged"), F.lit(0)).alias("s"))
                .collect()[0]["s"]
            )
            for fr in (ce, ck, lm):
                fr.unpersist()
            merged_counts.append(mr)
            cur = nflat
            if mr == 0:
                break
        final_flat = cur
    else:
        # Driver-side rounds: exact integer replay of _q326_round_sql
        # over the collected (and additive) level-1 weights/strengths.
        lab = {c: c for c in k5}  # level-1 super-vertex -> current label
        merged_counts = []
        while len(merged_counts) < _Q365_MAX_ROUNDS:
            w: dict[tuple[int, int], int] = {}
            for (a, b), wt in w5.items():
                la, lb = lab[a], lab[b]
                if la != lb:
                    key = (la, lb) if la < lb else (lb, la)
                    w[key] = w.get(key, 0) + wt
            k: dict[int, int] = {}
            for c, kv in k5.items():
                k[lab[c]] = k.get(lab[c], 0) + kv
            best: dict[int, tuple[int, int]] = {}  # node -> (gain, c)
            for (a, b), wt in w.items():
                for v, c in ((a, b), (b, a)):
                    g = 2 * m * wt - k[v] * k[c]
                    # argmax ties on SMALLER c (gain DESC, c ASC)
                    if v not in best or (g, -c) > (
                        best[v][0], -best[v][1]
                    ):
                        best[v] = (g, c)
            moves: dict[int, int] = {}
            for v in k:
                b = best.get(v)
                if b is None or b[0] <= 0:
                    continue
                bc = best.get(b[1])
                # swap guard: in a mutual-best positive pair only the
                # LARGER id moves (NOT (bc.c==v AND bc.gain>0 AND v<c))
                if bc is not None and bc[1] == v and bc[0] > 0                         and v < b[1]:
                    continue
                moves[v] = b[1]
            merged_counts.append(len(moves))
            if not moves:
                break
            lab = {c: moves.get(l, l) for c, l in lab.items()}
        # |level-1 communities|-row map frame: bounded by the driver
        # switch; the |V|-row relabel is a broadcast-map equi-join.
        map_df = spark.createDataFrame(
            [(c, l) for c, l in lab.items()], "c long, final_label long"
        )
        final_flat = cmap.join(F.broadcast(map_df), "c").select(
            "v", F.col("final_label").alias("label")
        )
    while len(merged_counts) < _Q365_MAX_ROUNDS:
        merged_counts.append(0)  # identity rounds past the fixpoint

    def qmod(labels: "DataFrame"):
        a = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
        b = labels.select("v", F.col("label").alias("lb"))
        intra = (
            edges.join(a, "u").join(b, "v")
            .filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("ec"))
        )
        dg = (
            sym.join(labels.select(F.col("v").alias("src"), "label"), "src")
            .groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("dc"))
        )
        comm = dg.join(intra, "label", "left").select(
            "label",
            F.coalesce("ec", F.lit(0)).cast("long").alias("ec"), "dc",
        )
        return comm.agg(
            F.count(F.lit(1)).cast("long").alias("n_comm"),
            F.expr(f"CAST(SUM(4L * {m}L * ec - dc * dc) * 1000000L"
                   f" div (4L * {m}L * {m}L) AS BIGINT)").alias("qm"),
        )

    initial = qmod(flat0).select(
        F.col("n_comm").alias("n_comm_initial"),
        F.col("qm").alias("q_initial_millionths"),
    )
    final = qmod(final_flat).select(
        F.col("n_comm").alias("n_comm_final"),
        F.col("qm").alias("q_final_millionths"),
    )
    head = spark.createDataFrame(
        [(
            _Q365_MAX_ROUNDS,
            sum(1 for x in merged_counts if x > 0),
            sum(merged_counts),
            1 if merged_counts[-1] == 0 else 0,
        )],
        "n_rounds_max long, n_active_rounds long,"
        " n_merged_total long, converged long",
    )
    # 1-row legs stitched via broadcast crossJoins into ONE job (the
    # q283/q314/q319 stance; bounded by construction)
    return (
        head.crossJoin(F.broadcast(initial))
        .crossJoin(F.broadcast(final))
        .select(
            "n_rounds_max", "n_active_rounds", "n_merged_total",
            "converged", "n_comm_initial", "n_comm_final",
            "q_initial_millionths", "q_final_millionths",
        )
    )


# ---------------------------------------------------------------------------
# q250 — Theil–Sen robust trend per user: the median of all pairwise
# slopes, the estimator that shrugs off the outliers OLS (q176-family)
# chases. Kept exact by quantizing BEFORE the division: values floor to
# cents, timestamps to epoch seconds, and each pair's slope becomes
# (Δcents · 1e6) div Δsec — int64, truncation identical in Spark's div
# and DuckDB's // (cookbook rule; the pytest recompute must truncate,
# not floor, on negative Δcents). The median is the nearest-rank lower
# median of that integer multiset under a total order, so ties carry no
# engine luck.
#
# Plan shape: a recency cap FIRST — each user contributes only their
# K=64 most-recent events under the (ts, event_id) total order — then
# one per-user rank self-join over the capped slice. Pair mass per key
# is therefore ≤ K(K-1)/2 = 2016 BY CONSTRUCTION, independent of how
# hot the user is: a 10⁶-event whale at 100 TB costs the same 2016
# pairs as anyone else (the standard Theil–Sen scaling move — trend is
# a recent-window notion anyway). The cap is surfaced in the output
# (`n_events_used`, ≤ 64) so consumers see exactly how much history
# fed each estimate. One user-keyed shuffle end to end; the cap window
# and the count ride the same partitioning.
# ---------------------------------------------------------------------------

_Q250_CAP_K = 64  # most-recent events per user fed to the estimator


@_register(
    "q250_theil_sen_trend",
    oracle=f"""
    WITH recent AS (
        SELECT user_id, event_id,
               epoch_us(ts) // 1000000 AS sec,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rev
        FROM events
    ),
    ev AS (
        SELECT user_id, event_id, sec, cents,
               COUNT(*) OVER (PARTITION BY user_id) - rev + 1 AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_used
        FROM recent
        WHERE rev <= {_Q250_CAP_K}
    ),
    pairs AS (
        SELECT a.user_id, a.n_used,
               (b.cents - a.cents) * 1000000 // (b.sec - a.sec) AS slope,
               a.rn AS ra, b.rn AS rb
        FROM ev a JOIN ev b
          ON a.user_id = b.user_id AND a.rn < b.rn AND a.sec < b.sec
    ),
    ranked AS (
        SELECT user_id, n_used, slope,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY slope, ra, rb) AS rnk,
               COUNT(*) OVER (PARTITION BY user_id) AS n_pairs
        FROM pairs
    )
    SELECT user_id,
           CAST(n_used AS BIGINT) AS n_events_used,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope AS BIGINT) AS median_slope_micro
    FROM ranked
    WHERE rnk = (n_pairs + 1) // 2
    """,
)
def q250_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Theil–Sen trend over the K=64 most-recent events:
    nearest-rank lower median of all pairwise integer slopes
    (Δcents·1e6 div Δsec). Per-key pair mass ≤ K(K-1)/2 by
    construction; the cap is surfaced as `n_events_used`.

    Engine: one user-keyed pass — the capped events collect into a ≤K
    array per user (sort_array pins the (ts, event_id) total order) and
    the slope multiset is built JVM-side with nested higher-order
    transforms, sorted, and indexed for the nearest-rank median. The
    pair set lives as a per-user array (≤ 2016 longs), never as
    shuffled rows: the prior rank-self-join plan exploded ~n²/2 rows
    per user through an exchange + two windows (2.30 s at sf0.1); an
    applyInPandas kernel paid per-group Python/Arrow overhead (4.2 s);
    this form runs ~0.6 s. `div` on bigint is the truncating division
    both engines share."""
    k = _Q250_CAP_K
    w_recent = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ev = (
        load_table(spark, "events", sf_dir)
        .select(
            "user_id", "event_id", "ts",
            F.unix_timestamp("ts").cast("long").alias("sec"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            F.row_number().over(w_recent).alias("rev"),
        )
        .filter(F.col("rev") <= k)
    )
    # the sort_array over (ts, event_id, …) structs pins the rn total
    # order INSIDE the aggregation; the parallel sec/cents arrays hand
    # the kernel flat int64 vectors (no struct conversion cost)
    g = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "sec", "cents"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.expr("transform(evs, x -> x.sec)").alias("secs"),
            F.expr("transform(evs, x -> x.cents)").alias("cents"),
        )
    )

    def _theil_sen_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            uids, nus, nps, meds = [], [], [], []
            for uid, secs, cents in zip(
                pdf["user_id"], pdf["secs"], pdf["cents"]
            ):
                sec = np.asarray(secs, dtype=np.int64)
                cen = np.asarray(cents, dtype=np.int64)
                iu, ju = np.triu_indices(len(sec), 1)  # ra < rb
                keep = sec[ju] > sec[iu]  # sa < sb
                iu, ju = iu[keep], ju[keep]
                if iu.size == 0:
                    continue
                num = (cen[ju] - cen[iu]) * 1_000_000
                # truncating division (sign restored) ≡ Spark div ≡
                # DuckDB // — the q181 cookbook branch for negatives
                q = np.abs(num) // (sec[ju] - sec[iu])
                slopes = np.where(num >= 0, q, -q)
                slopes.sort()
                uids.append(uid)
                nus.append(len(sec))
                nps.append(slopes.size)
                meds.append(int(slopes[(slopes.size + 1) // 2 - 1]))
            yield pd.DataFrame(
                {"user_id": pd.Series(uids, dtype="int64"),
                 "n_events_used": pd.Series(nus, dtype="int64"),
                 "n_pairs": pd.Series(nps, dtype="int64"),
                 "median_slope_micro": pd.Series(meds, dtype="int64")}
            )

    return g.mapInPandas(
        _theil_sen_batches,
        schema="user_id long, n_events_used long, n_pairs long, "
               "median_slope_micro long",
    )


# ---------------------------------------------------------------------------
# q251 — the full decile table (D1…D9 per order priority): closes the
# percentile family around q228's single median with the whole
# distribution profile BI tooling actually renders. Nearest-rank
# definition throughout — decile d = the value at rank ⌈d·n/10⌉ under
# the (cents, orderkey) total order — so every output is an exact
# int64 cent value picked by an integer rank: no interpolation, no FP,
# no tie luck.
#
# Plan shape: one per-priority window pass (rank + count), then a 9×
# literal explode filtered to the nine target ranks — the multiplier is
# applied BEFORE the filter but after the window, so the extra rows are
# a projection, never a shuffle. At 100 TB the same query swaps the
# full sort for the two-phase range-offset device (q190) per group —
# rank selection is unchanged.
# ---------------------------------------------------------------------------


@_register(
    "q251_decile_table",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT),
                            o_orderkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT priority,
           CAST(d AS BIGINT) AS decile,
           CAST(rn AS BIGINT) AS at_rank,
           CAST(n AS BIGINT) AS n_orders,
           cents AS value_cents
    FROM (SELECT *, unnest(generate_series(1, 9)) AS d FROM ranked)
    WHERE rn = (d * n + 9) // 10
    """,
)
def q251_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-rank deciles of order value per priority, exact cents;
    see block comment for the total order and the 100 TB rank device."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    wr = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    wc = Window.partitionBy("priority")
    ranked = o.select(
        "priority", "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        ranked.withColumn("d", F.explode(F.sequence(F.lit(1), F.lit(9))))
        .filter(F.col("rn") == F.expr("(d * n + 9) div 10"))
        .select(
            "priority",
            F.col("d").cast("long").alias("decile"),
            F.col("rn").cast("long").alias("at_rank"),
            F.col("n").cast("long").alias("n_orders"),
            F.col("cents").alias("value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q252 — HITS hubs & authorities (Kleinberg) on the customer→part
# purchase bipartite graph: hubs = customers whose baskets concentrate
# on widely-bought parts, authorities = parts bought by the broadest
# hubs — the mutual-reinforcement member of the iterative family
# (q179/q209 damped-sum, q186 frontier-min, q236 neighbor-majority,
# q227 min-plus). Two full iterations, unrolled in the oracle.
#
# Exactness device: after every half-step the raw integer scores
# (Σ over neighbors of the previous side's score) renormalize by the
# side's MAXIMUM — score·1e6 div max — the q235 max-norm in int64
# instead of the L2 norm HITS papers use (L2 needs sqrt of a sum of
# products ≥ 2⁶³; max-norm keeps the fixpoint direction and the
# iteration order). Bounds: scores ≤ 1e6, raw sums ≤ degree·1e6
# ≤ ~1e11, renorm numerator ≤ 1e17 — all int64.
#
# Plan shape: the distinct (cust, part) edge frame is built once and
# persisted (consumed by all four half-steps); each half-step is one
# edge-keyed aggregate whose 1-row MAX collects as a driver scalar and
# inlines as a literal divisor (bounded by construction — the documented
# driver-scalar class); output is each side's bounded top-10 via
# global_topk (TakeOrderedAndProject). At 100 TB: same aggregates, the
# max is a 1-row collect per round exactly like k-means' centroid fetch,
# and the persist becomes a checkpointed artifact like
# co_purchase_edges.
# ---------------------------------------------------------------------------


def _q252_oracle() -> str:
    return """
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    a1r AS (SELECT p, CAST(COUNT(*) AS BIGINT) * 1000000 AS r FROM e GROUP BY p),
    a1 AS (SELECT p, r * 1000000 // (SELECT MAX(r) FROM a1r) AS s FROM a1r),
    h1r AS (
        SELECT e.c, CAST(SUM(a1.s) AS BIGINT) AS r
        FROM e JOIN a1 ON e.p = a1.p GROUP BY e.c
    ),
    h1 AS (SELECT c, r * 1000000 // (SELECT MAX(r) FROM h1r) AS s FROM h1r),
    a2r AS (
        SELECT e.p, CAST(SUM(h1.s) AS BIGINT) AS r
        FROM e JOIN h1 ON e.c = h1.c GROUP BY e.p
    ),
    a2 AS (SELECT p, r * 1000000 // (SELECT MAX(r) FROM a2r) AS s FROM a2r),
    h2r AS (
        SELECT e.c, CAST(SUM(a2.s) AS BIGINT) AS r
        FROM e JOIN a2 ON e.p = a2.p GROUP BY e.c
    ),
    h2 AS (SELECT c, r * 1000000 // (SELECT MAX(r) FROM h2r) AS s FROM h2r),
    top_a AS (
        SELECT 'authority' AS kind, p AS node_id, s,
               ROW_NUMBER() OVER (ORDER BY s DESC, p) AS rnk
        FROM a2
    ),
    top_h AS (
        SELECT 'hub' AS kind, c AS node_id, s,
               ROW_NUMBER() OVER (ORDER BY s DESC, c) AS rnk
        FROM h2
    )
    SELECT kind, CAST(rnk AS BIGINT) AS rank,
           CAST(node_id AS BIGINT) AS node_id,
           CAST(s AS BIGINT) AS score_ppm
    FROM (SELECT * FROM top_a WHERE rnk <= 10
          UNION ALL SELECT * FROM top_h WHERE rnk <= 10)
    """


def _maxnorm(df: DataFrame, key: str, persisted: list) -> DataFrame:
    """score·1e6 div max(score) — the max collected as a DRIVER SCALAR
    (one bounded 1-row job; the documented driver-scalar class) and
    inlined as a literal divisor. The raw-score frame feeds both the max
    job and the scored rows, so it persists (|nodes|-sized — the
    cookbook twice-consumed rule); handles append to ``persisted`` for
    the caller's finally.

    Was a crossJoin(broadcast(1-row max)): the lazy broadcast put a
    BroadcastNestedLoopJoin into every downstream half-step's plan and
    each broadcast subjob re-planned the growing DAG — measured +0.8 s
    over the scalar-literal form at sf0.1 (VERDICT r6 item 2; interleaved
    control q218 at parity, so real, not host variance)."""
    df = df.persist()
    persisted.append(df)
    mx = df.agg(F.max("r")).collect()[0][0]
    return df.select(
        key, F.expr(f"r * 1000000 div {int(mx)}").cast("long").alias("s")
    )


@_register("q252_hits_scores", oracle=_q252_oracle())
def q252_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hubs and authorities after 2 max-norm integer HITS
    rounds on the customer→part graph; see block comment."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    )
    persisted: list[DataFrame] = []
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()  # consumed by all four half-steps
    )
    persisted.append(e)
    try:
        # Unrolled trajectory (matches the oracle CTE chain exactly):
        # a1 = normalized degree counts; h1 = hubs against a1; a2 =
        # authorities against h1; h2 = hubs against a2.
        a1 = _maxnorm(
            e.groupBy("p").agg(
                (F.count(F.lit(1)) * 1000000).cast("long").alias("r")
            ),
            "p", persisted,
        )
        h1 = _maxnorm(
            e.join(a1, "p").groupBy("c")
            .agg(F.sum("s").cast("long").alias("r")),
            "c", persisted,
        )
        a2 = _maxnorm(
            e.join(h1, "c").groupBy("p")
            .agg(F.sum("s").cast("long").alias("r")),
            "p", persisted,
        )
        # a2 is consumed twice (the h2 build and top_a), but its raw-score
        # parent is already cached inside _maxnorm, so each consumer only
        # re-runs a crossJoin+select over |parts| cached rows. Caching the
        # derived projection too adds a cache-build pass that benched ~40%
        # SLOWER than the recompute (1.27 s -> 3.7 s regression in r4) —
        # deliberately NOT persisted.
        h2 = _maxnorm(
            e.join(a2, "p").groupBy("c")
            .agg(F.sum("s").cast("long").alias("r")),
            "c", persisted,
        )
        # Bounded top-10s via TakeOrderedAndProject (operators/ranks) —
        # never a single-task row_number window over the node grain.
        top_a = global_topk(
            a2.select(
                F.lit("authority").alias("kind"),
                F.col("p").alias("node_id"), "s",
            ),
            [("s", "desc"), ("node_id", "asc")], 10, out="rnk",
        )
        top_h = global_topk(
            h2.select(
                F.lit("hub").alias("kind"), F.col("c").alias("node_id"), "s",
            ),
            [("s", "desc"), ("node_id", "asc")], 10, out="rnk",
        )
        out = top_a.unionAll(top_h).select(
            "kind",
            F.col("rnk").cast("long").alias("rank"),
            F.col("node_id").cast("long").alias("node_id"),
            F.col("s").cast("long").alias("score_ppm"),
        )
        # ≤20 rows: materialize so the finally can release every cache
        # without the returned frame recomputing the whole trajectory
        return materialize(out)
    finally:
        for f in persisted:
            f.unpersist()


# ---------------------------------------------------------------------------
# q257 — first-order Markov transition matrix over event types: the
# behavioral model behind next-action prediction, anomaly scoring, and
# bot detection. Per user, consecutive events (under the (ts, event_id)
# total order) yield (from → to) transitions; the matrix row-normalizes
# to permil with one truncating division — the log-free, integer-exact
# face of a stochastic matrix (rows sum to ≤ 1000 with the remainder
# being truncation dust — reported, not hidden, via row_total).
#
# Plan: one per-user window lag (event-grain, key-partitioned) and one
# (from, to) aggregate with map-side combine; the |types|²-grain matrix
# then self-attaches its row totals by a broadcast-size join.
# ---------------------------------------------------------------------------


@_register(
    "q257_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ),
    t AS (
        SELECT prev AS from_type, event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev IS NOT NULL
        GROUP BY 1, 2
    ),
    rt AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM t GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n, rt.row_total,
           CAST(t.n * 1000 // rt.row_total AS BIGINT) AS p_permil
    FROM t JOIN rt ON t.from_type = rt.from_type
    """,
)
def q257_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts and row-normalized permil under the
    per-user (ts, event_id) total order; see block comment."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    t = seq.groupBy(
        F.col("prev").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rt = t.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    return t.join(F.broadcast(rt), "from_type").select(
        "from_type", "to_type", "n", "row_total",
        F.expr("CAST(n * 1000 div row_total AS BIGINT)").alias("p_permil"),
    )


# ---------------------------------------------------------------------------
# q260 — skyline / Pareto frontier: the orders no other order dominates
# (later-or-equal date AND cheaper-or-equal price, strictly better in
# at least one) — the multi-objective shortlist operator (best
# price-recency tradeoffs) that has no native Spark form. The naive
# dominance test is an O(n²) self-join; the 2-D skyline instead falls
# out of ONE window pass: scan in (date DESC, price ASC, key ASC)
# total order and keep rows strictly below the running price minimum
# of everything EARLIER in that order (previous rows all have
# later-or-equal dates, and equal-date-cheaper rows sort first, so
# "running min beaten" ⇔ "undominated") — the textbook sort-scan
# skyline, expressed relationally. First frontier row (no
# predecessor) guards the NULL running min.
#
# Plan: one window over the (date, price, key) sort — no join at all.
# At 100 TB the sort shards by date range with per-range min carry-in
# (the q190 two-phase device applied to a running MIN).
# ---------------------------------------------------------------------------


@_register(
    "q260_pareto_frontier",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k, o_orderdate AS d,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    combos AS (SELECT DISTINCT d, cents FROM o),
    scan AS (
        SELECT d, cents,
               MIN(cents) OVER (
                   ORDER BY d DESC, cents ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prior_min
        FROM combos
    ),
    -- the scan runs at the DISTINCT (d, cents) grain: rows sharing the
    -- exact combination do not dominate each other (dominance needs one
    -- strict inequality), so an undominated combination admits ALL its
    -- rows — the join-back below restores them
    sky AS (
        SELECT o.k, o.d, o.cents
        FROM o JOIN (
            SELECT d, cents FROM scan
            WHERE prior_min IS NULL OR cents < prior_min
        ) f ON o.d = f.d AND o.cents = f.cents
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY d DESC, cents, k) AS BIGINT)
               AS rank,
           CAST(k AS BIGINT) AS o_orderkey,
           d AS o_orderdate,
           cents AS price_cents
    FROM sky
    """,
)
def q260_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/recency Pareto frontier of orders via the one-pass
    sort-scan skyline; see block comment."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # scan at the DISTINCT (d, cents) grain — equal combinations never
    # dominate each other (strictness), so the frontier combination
    # admits all its rows via the join-back
    combos = o.select("d", "cents").distinct()
    # both global windows go through the two-phase distributed devices
    # (operators.ranks): the distinct grain and the frontier are small
    # today but unbounded in the worst case — no single-task windows
    scan = global_prefix_agg(
        combos,
        [("d", "desc"), ("cents", "asc")],
        "cents",
        agg="min",
        out="prior_min",
    )
    frontier = scan.filter(
        F.col("prior_min").isNull() | (F.col("cents") < F.col("prior_min"))
    ).select("d", "cents")
    sky = o.join(F.broadcast(frontier), ["d", "cents"])
    ranked, _n = global_row_number(
        sky, [("d", "desc"), ("cents", "asc"), ("k", "asc")], out="rank"
    )
    return ranked.select(
        F.col("rank").cast("long").alias("rank"),
        F.col("k").cast("long").alias("o_orderkey"),
        F.col("d").alias("o_orderdate"),
        F.col("cents").alias("price_cents"),
    )


# ---------------------------------------------------------------------------
# q264 — time-weighted average (TWAP): the mean of a signal weighted by
# how LONG each reading was in force — the correct average for
# irregularly-sampled telemetry and the standard execution benchmark in
# finance (a plain AVG over-weights bursts). Right-open intervals: each
# event's value holds until the user's next event; the last reading has
# no duration and drops out (stated, matching both engines).
#
# Exact integers end to end: value floors to cents, durations are
# epoch-second deltas from ONE lead() window, and the TWAP is a single
# truncating division of Σ cents·Δt by ΣΔt (products ≤ 1e5·1e6 per
# interval, summed ≈ 1e13 per user — int64-safe; DECIMAL(38,0) is the
# stated widening at year-scale horizons).
# ---------------------------------------------------------------------------


@_register(
    "q264_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) // 1000000 AS sec,
               LEAD(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(nxt - sec) AS BIGINT) AS total_sec,
           CAST(SUM(cents * (nxt - sec)) // SUM(nxt - sec) AS BIGINT)
               AS twap_cents
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(nxt - sec) > 0
    """,
)
def q264_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TWAP of event value over right-open holding intervals;
    exact cents·seconds integers, one lead() window + one aggregate."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_timestamp("ts").cast("long").alias("sec"),
        F.lead(F.unix_timestamp("ts").cast("long")).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("nxt") - F.col("sec")).cast("long")
            .alias("total_sec"),
            F.expr(
                "CAST(SUM(cents * (nxt - sec)) div SUM(nxt - sec)"
                " AS BIGINT)"
            ).alias("twap_cents"),
        )
        .filter(F.col("total_sec") > 0)
    )


# ---------------------------------------------------------------------------
# q267 — life table (discrete-time survival / churn analysis): time
# from a user's first event to their first PURCHASE, day-bucketed, with
# right-censoring at the user's observation end — the retention
# statistic product teams read as "how fast do users convert, and how
# many never do (yet)". The cross-engine face is the LIFE TABLE itself
# (n_risk, events, censored, hazard in permil per day bucket): the
# Kaplan–Meier curve is a cumulative PRODUCT over these rows — an
# ordered FP chain both engines could disagree on — so the product
# stays a driver/BI-layer fold over this exact integer table (stated,
# the q50/q180 convention of gating the portable face).
#
# Plan: one per-user aggregate (first event, first purchase, last
# event), a day-bucket projection, then the risk-set sweep as ONE
# descending cumulative-sum window over the |buckets|-grain frame —
# n_risk(d) = Σ_{d' ≥ d} (events + censored)(d') — no per-user join
# against day grids.
# ---------------------------------------------------------------------------


@_register(
    "q267_life_table",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) AS t0,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
               MAX(ts) AS tend
        FROM events GROUP BY user_id
    ),
    durs AS (
        SELECT user_id,
               CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS converted,
               CASE WHEN tp IS NOT NULL
                    THEN (epoch_us(tp) - epoch_us(t0)) // 86400000000
                    ELSE (epoch_us(tend) - epoch_us(t0)) // 86400000000
               END AS day
        FROM per_user
    ),
    buckets AS (
        SELECT day, CAST(SUM(converted) AS BIGINT) AS d_events,
               CAST(SUM(1 - converted) AS BIGINT) AS d_censored
        FROM durs GROUP BY day
    ),
    risk AS (
        SELECT day, d_events, d_censored,
               SUM(d_events + d_censored) OVER (
                   ORDER BY day DESC ROWS UNBOUNDED PRECEDING
               ) AS n_risk
        FROM buckets
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(n_risk AS BIGINT) AS n_risk,
           d_events, d_censored,
           CAST(d_events * 1000 // n_risk AS BIGINT) AS hazard_permil
    FROM risk
    """,
)
def q267_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-bucketed first-purchase life table with right censoring;
    see block comment for why the KM product stays off the hash gate."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
        F.max("ts").alias("tend"),
    )
    durs = per_user.select(
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("converted"),
        F.when(
            F.col("tp").isNotNull(),
            F.expr("(unix_micros(tp) - unix_micros(t0)) div 86400000000"),
        ).otherwise(
            F.expr("(unix_micros(tend) - unix_micros(t0)) div 86400000000")
        ).alias("day"),
    )
    buckets = durs.groupBy("day").agg(
        F.sum("converted").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("converted")).cast("long")
        .alias("d_censored"),
    )
    wr = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = buckets.select(
        "day", "d_events", "d_censored",
        F.sum(F.col("d_events") + F.col("d_censored")).over(wr)
        .alias("n_risk"),
    )
    return risk.select(
        F.col("day").cast("long").alias("day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "d_events", "d_censored",
        F.expr("CAST(d_events * 1000 div n_risk AS BIGINT)")
        .alias("hazard_permil"),
    )


# ---------------------------------------------------------------------------
# q269 — split-conformal prediction intervals: the distribution-free
# way to turn ANY point predictor into an interval with finite-sample
# coverage (Vovk; the calibration layer modern ML ships on top of
# models). Three md5-hash splits of orders (train/cal/test — the q47
# device); the predictor is the train split's per-priority mean price
# (integer cents, truncating division); the interval half-width is the
# nearest-rank ⌈0.9·(n+1)⌉-th absolute residual on the calibration
# split; coverage is then MEASURED on the held-out test split. All
# integers end to end, so both the quantile pick and the coverage
# census hash-match.
#
# Plan: one grouped aggregate for the predictor (broadcast back — the
# q91 two-pass device), a per-priority rank window on the calibration
# residuals, and a broadcast join onto the test split. The conformal
# guarantee (coverage ≥ 90% in expectation over splits) is asserted
# with slack in pytest — it is a property of the construction, not of
# one draw.
# ---------------------------------------------------------------------------


@_register(
    "q269_conformal_interval",
    oracle="""
    WITH o AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
               CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                       || 'conf'), 1, 15) AS BIGINT)
                   % 1000 AS b
        FROM orders
    ),
    pred AS (
        SELECT pri, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS yhat
        FROM o WHERE b < 600 GROUP BY pri
    ),
    cal AS (
        SELECT o.pri, abs(o.cents - p.yhat) AS r
        FROM o JOIN pred p ON o.pri = p.pri
        WHERE o.b >= 600 AND o.b < 800
    ),
    qs AS (
        SELECT pri, r AS q_cents FROM (
            SELECT pri, r,
                   ROW_NUMBER() OVER (PARTITION BY pri ORDER BY r) AS rn,
                   COUNT(*) OVER (PARTITION BY pri) AS n
            FROM cal
        ) WHERE rn = least(n, (9 * (n + 1) + 9) // 10)
    )
    SELECT o.pri AS priority,
           CAST(q.q_cents AS BIGINT) AS q_cents,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN abs(o.cents - p.yhat) <= q.q_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN abs(o.cents - p.yhat) <= q.q_cents
                         THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
               AS coverage_permil
    FROM o
    JOIN pred p ON o.pri = p.pri
    JOIN qs q ON o.pri = q.pri
    WHERE o.b >= 800
    GROUP BY o.pri, q.q_cents
    """,
)
def q269_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% intervals around the per-priority train-mean
    predictor, with measured test coverage; see block comment."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"),
                                   F.lit("conf"))), 1, 15,
                ), 16, 10,
            ).cast("bigint") % 1000
        ).alias("b"),
    )
    pred = (
        o.filter(F.col("b") < 600)
        .groupBy("pri")
        .agg(F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias("yhat"))
    )
    cal = (
        o.filter((F.col("b") >= 600) & (F.col("b") < 800))
        .join(F.broadcast(pred), "pri")
        .select("pri", F.abs(F.col("cents") - F.col("yhat")).alias("r"))
    )
    wr = Window.partitionBy("pri").orderBy("r")
    wc = Window.partitionBy("pri")
    qs = (
        cal.select(
            "pri", "r",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.expr("least(n, (9 * (n + 1) + 9) div 10)"))
        .select("pri", F.col("r").alias("q_cents"))
    )
    test = o.filter(F.col("b") >= 800).join(F.broadcast(pred), "pri").join(
        F.broadcast(qs), "pri"
    )
    covered = (
        F.abs(F.col("cents") - F.col("yhat")) <= F.col("q_cents")
    ).cast("long")
    return test.groupBy(F.col("pri").alias("priority"), "q_cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(covered).cast("long").alias("n_covered"),
        F.expr(
            "CAST(SUM(CAST(abs(cents - yhat) <= q_cents AS LONG)) * 1000"
            " div COUNT(*) AS BIGINT)"
        ).alias("coverage_permil"),
    ).select(
        "priority", F.col("q_cents").cast("long").alias("q_cents"),
        "n_test", "n_covered", "coverage_permil",
    )


# ---------------------------------------------------------------------------
# q273 — forecast backtest (naive vs seasonal-naive, MASE-style): the
# baseline every demand/traffic forecasting system must beat, measured
# the way backtests actually run — per horizon day, forecast(t) =
# actual(t−1) (naive) and actual(t−7) (seasonal), errors in exact
# cents. Predecessors are found by CALENDAR self-joins on the daily
# revenue grain (lag-over-rows would silently skip across gaps);
# only days with BOTH predecessors score (inner joins, stated in both
# engines). The headline number is the MASE-like ratio
# Σ|e_seasonal|·1000 div Σ|e_naive| — < 1000 means weekly seasonality
# is real and a model exploiting it has signal to beat.
# ---------------------------------------------------------------------------


@_register(
    "q273_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY o_orderdate
    ),
    scored AS (
        SELECT t.d, t.rev,
               abs(t.rev - n.rev) AS e_naive,
               abs(t.rev - s.rev) AS e_seasonal
        FROM daily t
        JOIN daily n ON n.d = t.d - INTERVAL 1 DAY
        JOIN daily s ON s.d = t.d - INTERVAL 7 DAY
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(e_naive) // COUNT(*) AS BIGINT) AS mae_naive_cents,
           CAST(SUM(e_seasonal) // COUNT(*) AS BIGINT)
               AS mae_seasonal_cents,
           CAST(SUM(e_seasonal) * 1000 // SUM(e_naive) AS BIGINT)
               AS mase_permil
    FROM scored
    """,
)
def q273_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue backtest of the two universal baselines; exact
    cents, calendar predecessor joins. See block comment."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("rev")
    ).persist()  # consumed as target and both predecessor sides
    t = daily
    n = daily.select(
        F.col("d").alias("dn"), F.col("rev").alias("rev_n")
    )
    s = daily.select(
        F.col("d").alias("ds"), F.col("rev").alias("rev_s")
    )
    scored = (
        t.join(n, F.expr("dn = d - INTERVAL 1 DAY"))
        .join(s, F.expr("ds = d - INTERVAL 7 DAY"))
        .select(
            F.abs(F.col("rev") - F.col("rev_n")).alias("e_naive"),
            F.abs(F.col("rev") - F.col("rev_s")).alias("e_seasonal"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(SUM(e_naive) div COUNT(*) AS BIGINT)")
        .alias("mae_naive_cents"),
        F.expr("CAST(SUM(e_seasonal) div COUNT(*) AS BIGINT)")
        .alias("mae_seasonal_cents"),
        F.expr("CAST(SUM(e_seasonal) * 1000 div SUM(e_naive) AS BIGINT)")
        .alias("mase_permil"),
    )


# ---------------------------------------------------------------------------
# q275 — rolling correlation between two activity series: the 7-day
# windowed Pearson between daily 'view' and 'purchase' counts — the
# co-movement monitor behind "are purchases still tracking traffic?".
# Kept deterministic by the cookbook split: every windowed SUM is an
# exact INTEGER (counts and their products over a RANGE frame keyed on
# epoch days), and each row's r is one fixed IEEE chain on those
# integers — (nΣxy−ΣxΣy) / (√(nΣx²−Σx²ᵗᵒᵗ)·√(nΣy²−Σy²ᵗᵒᵗ)) — with sqrt
# correctly rounded in both engines and zero-variance windows mapped to
# 0 by an integer guard BEFORE any division.
#
# Plan: events → (day, views, purchases) grain (map-side combine), one
# RANGE window (6 preceding days) carrying five integer sums, then the
# scalar chain. |days| rows end to end after the first aggregate.
# ---------------------------------------------------------------------------


@_register(
    "q275_rolling_correlation",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT day, x, y,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * y) OVER w AS sxy,
               SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(n AS BIGINT) AS n_days, x, y,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN CAST(0 AS DOUBLE)
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS r
    FROM win
    """,
)
def q275_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson between daily view and purchase counts;
    integer window sums, one IEEE chain per row. See block comment."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.sum((F.col("event_type") == "view").cast("long")).cast("long")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).cast("long")
        .alias("y"),
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    win = daily.select(
        "day", "x", "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return win.select(
        F.col("day").cast("long").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        "x", "y",
        F.when((vx == 0) | (vy == 0), F.lit(0.0))
        .otherwise(
            cov.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        )
        .alias("r"),
    )


# ---------------------------------------------------------------------------
# q284 — the VARIANT semi-structured type (Spark 4's answer to schema-on-
# read JSON): parse_json materializes the payload ONCE into the binary
# variant encoding, typed extraction (`try_variant_get`) shreds fields
# without re-parsing, and `schema_of_variant` gives per-row shape
# introspection. The 100 TB relevance over q78's from_json: a variant
# column written at ingest is parsed once ever — every later query pays
# binary field access, not a Jackson parse; and unlike a declared
# struct, payloads with heterogeneous shapes don't force schema
# migration. The shape census (countDistinct of the variant schema)
# is representation-portable: both engines agree on HOW MANY distinct
# shapes exist even though their type-name spellings differ.
# ---------------------------------------------------------------------------


@_register(
    "q284_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN json_valid(props)
                            AND json_extract(props, '$.k') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_with_k,
           CAST(COALESCE(SUM(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 0) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT CASE WHEN json_valid(props)
                    THEN json_structure(props) END) AS BIGINT) AS n_shapes
    FROM events GROUP BY event_type
    """,
)
def q284_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the props payload into a VARIANT, shred the typed `k`
    field, and census the payload shapes per event type. See block
    comment."""
    e = load_table(spark, "events", sf_dir)
    v = F.try_parse_json("props")
    parsed = e.select(
        "event_type",
        v.alias("v"),
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("sum_k"),
        F.countDistinct(F.schema_of_variant("v")).alias("n_shapes"),
    )


# ---------------------------------------------------------------------------
# q290 — Mann-Whitney U (Wilcoxon rank-sum) per event type, weekend vs
# weekday values: the nonparametric sibling of q184's Welch t — the test
# a pipeline reaches for when the metric is skewed/heavy-tailed and a
# mean comparison would be driven by outliers. Completes the two-sample
# panel (parametric q184, distribution-shape q173 KS, rank-based here).
#
# Cross-engine recipe: ranks are computed on the VALUE GRID (group by
# quantized value → weekend/weekday counts), never per row — the grid is
# |distinct values| rows, the rank sum folds in as Σ c_a·(2·cum + t + 1)
# over DOUBLED average ranks so tie-averaged ranks (k+½ steps) stay in
# exact int64 arithmetic. The z statistic (with the standard tie
# correction Σ(t³−t)) is ONE fixed sequence of correctly-rounded double
# ops — two products, two divisions, one sqrt — written identically in
# both engines. U itself is the integer decision variable.
#
# Scale notes: one grid aggregation (map-side combinable) + a per-type
# cumulative window over the grid + a per-type fold — shuffle carries
# |types|·|grid| rows, nothing row-sized; same shape as q218's
# joint-grid Kendall.
# ---------------------------------------------------------------------------


@_register(
    "q290_mann_whitney_u",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 1e3) AS BIGINT) AS x
        FROM events
    ),
    g AS (
        SELECT event_type, x,
               CAST(SUM(wk) AS BIGINT) AS ca,
               CAST(SUM(1 - wk) AS BIGINT) AS cb,
               CAST(COUNT(*) AS BIGINT) AS t
        FROM q GROUP BY event_type, x
    ),
    w AS (
        SELECT event_type, ca, cb, t,
               SUM(t) OVER (PARTITION BY event_type ORDER BY x) - t AS cum
        FROM g
    ),
    s AS (
        SELECT event_type,
               SUM(ca) AS n_a, SUM(cb) AS n_b, SUM(t) AS n,
               SUM(ca * (2 * cum + t + 1)) AS r_a2,
               SUM(t * t * t - t) AS tie3
        FROM w GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(r_a2 - n_a * (n_a + 1) AS BIGINT) AS u_a_2x,
           CASE WHEN n_a = 0 OR n_b = 0 OR
                     (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                     * ((CAST(n AS DOUBLE) + 1.0)
                        - CAST(tie3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                     <= 0.0
                THEN 0.0
                ELSE (CAST(r_a2 - n_a * (n_a + 1) AS DOUBLE)
                      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                     / (2.0 * SQRT(
                         (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                         * ((CAST(n AS DOUBLE) + 1.0)
                            - CAST(tie3 AS DOUBLE)
                              / (CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0)))))
           END AS z_stat
    FROM s
    """,
)
def q290_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U (doubled-rank integer form) per
    event type, weekend vs weekday; see block comment for the grid
    device and the portability argument."""
    e = load_table(spark, "events", sf_dir)
    q = e.select(
        "event_type",
        F.when(F.dayofweek("ts").isin(1, 7), F.lit(1)).otherwise(F.lit(0))
        .alias("wk"),
        F.floor(F.col("value") * 1e3).cast("long").alias("x"),
    )
    g = q.groupBy("event_type", "x").agg(
        F.sum("wk").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("wk")).cast("long").alias("cb"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    win = Window.partitionBy("event_type").orderBy("x")
    w = g.select(
        "event_type", "ca", "cb", "t",
        (F.sum("t").over(win) - F.col("t")).alias("cum"),
    )
    # Rank-sum terms ca·(2·cum+t+1) ~ N² and tie products t³ overflow
    # int64 near 3e9 events/type; accumulate in decimal(38,0) — the
    # Spark twin of the oracle's native HUGEINT sums (which it already
    # uses: the SQL has no BIGINT cast inside s). Downstream consumers
    # take one exact decimal→double (z) or decimal→long (U, exact while
    # representable) conversion.
    dca = F.col("ca").cast("decimal(38,0)")
    dt = F.col("t").cast("decimal(38,0)")
    s = w.groupBy("event_type").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum("t").alias("n"),
        F.sum(dca * (2 * F.col("cum").cast("decimal(38,0)") + dt + 1))
        .alias("r_a2"),
        F.sum(dt * dt * dt - dt).alias("tie3"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = F.col("n").cast("double")
    u2 = F.col("r_a2") - F.col("n_a").cast("decimal(38,0)") * (
        F.col("n_a") + 1
    )
    var_u = (na * nb / F.lit(12.0)) * (
        (nn + F.lit(1.0))
        - F.col("tie3").cast("double") / (nn * (nn - F.lit(1.0)))
    )
    z = (u2.cast("double") - na * nb) / (F.lit(2.0) * F.sqrt(var_u))
    return s.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u_a_2x"),
        F.when(
            (F.col("n_a") == 0) | (F.col("n_b") == 0) | (var_u <= 0.0),
            F.lit(0.0),
        ).otherwise(z).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# q330 — Bradley-Terry preference strengths (Zermelo 1929; Hunter 2004
# MM algorithm): THE statistic behind RLHF reward modeling and LLM
# arena leaderboards — given pairwise "duels", estimate each item's
# latent strength s_i so that P(i beats j) = s_i / (s_i + s_j). Duels
# are synthesized deterministically from the event stream: within each
# user's timeline, every consecutive pair of different-type events is
# one duel, won by the higher-value event (value tie → lower event_id).
#
# Estimation = 3 unrolled Hunter MM rounds on the directed duel-count
# matrix:  s_i' = W_i / Σ_j n_ij / (s_i + s_j),  kept EXACT in
# arbitrary-precision integer micro-space (Python ints driver-side,
# HUGEINT CTE-internal in the oracle — the q322 device; int64 products
# n·10^12 die at ~9e6 duels, far below 100 TB grain). Strengths are
# ppm-scaled, clamped to [1e3, 1e9] (an all-losing item's MM fixpoint
# is 0; the clamp keeps later denominators positive — applied
# identically in both engines).
#
# Plan shape: ONE partitioned window pass (user timeline lag) feeds a
# map-side-combinable groupBy to the ≤|types|²-row directed matrix —
# the corpus is touched once; the MM iteration runs on that bounded
# driver scalar (documented class, like q308's 33-row gradients), and
# the result frame stays distributed (strength/rank fold back as
# literal when-chains over the |types|-row census). Reference has no
# preference surface; 100 TB training-data mandate (reward-model data
# curation).
# ---------------------------------------------------------------------------

_BT_ROUNDS = 3
_BT_SCALE = 10**12
_BT_LO, _BT_HI = 1000, 10**9


def _q330_oracle() -> str:
    # every chain CTE is multi-referenced across the MM rounds —
    # AS MATERIALIZED throughout or DuckDB replays the duel build
    # per reference (measured 5.7 s -> 0.1 s at sf0.01; q212 rule)
    ctes = [
        """s AS MATERIALIZED (
            SELECT event_type, value, event_id,
                   lag(event_type) OVER w AS prev_t,
                   lag(value) OVER w AS prev_v,
                   lag(event_id) OVER w AS prev_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )""",
        """duel AS MATERIALIZED (
            SELECT CASE WHEN prev_v > value
                             OR (prev_v = value AND prev_id < event_id)
                        THEN prev_t ELSE event_type END AS winner,
                   CASE WHEN prev_v > value
                             OR (prev_v = value AND prev_id < event_id)
                        THEN event_type ELSE prev_t END AS loser
            FROM s WHERE prev_t IS NOT NULL AND prev_t <> event_type
        )""",
        """dir0 AS MATERIALIZED (
            SELECT winner AS item, loser AS opp, 1 AS win FROM duel
            UNION ALL
            SELECT loser AS item, winner AS opp, 0 AS win FROM duel
        )""",
        """dirs AS MATERIALIZED (
            SELECT item, opp, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(win) AS BIGINT) AS w
            FROM dir0 GROUP BY item, opp
        )""",
        """items AS MATERIALIZED (
            SELECT item, CAST(SUM(n) AS BIGINT) AS duels,
                   CAST(SUM(w) AS BIGINT) AS wins
            FROM dirs GROUP BY item
        )""",
        "s0 AS MATERIALIZED (SELECT item, CAST(1000000 AS HUGEINT) AS s FROM items)",
    ]
    for r in range(1, _BT_ROUNDS + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
            SELECT p.item,
                   GREATEST(SUM((CAST(p.n AS HUGEINT) * {_BT_SCALE})
                                // (si.s + sj.s)),
                            CAST(1 AS HUGEINT)) AS denom
            FROM dirs p
            JOIN s{r - 1} si ON si.item = p.item
            JOIN s{r - 1} sj ON sj.item = p.opp
            GROUP BY p.item
        )""")
        ctes.append(f"""s{r} AS MATERIALIZED (
            SELECT i.item,
                   LEAST(GREATEST((CAST(i.wins AS HUGEINT) * {_BT_SCALE})
                                  // d.denom,
                                  CAST({_BT_LO} AS HUGEINT)),
                         CAST({_BT_HI} AS HUGEINT)) AS s
            FROM items i JOIN d{r} d ON d.item = i.item
        )""")
    last = f"s{_BT_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT i.item, i.duels, i.wins,
               CAST(f.s AS BIGINT) AS strength_ppm,
               CAST(ROW_NUMBER() OVER (ORDER BY f.s DESC, i.item)
                    AS BIGINT) AS rank
        FROM items i JOIN {last} f ON f.item = i.item
        """
    )


def bradley_terry_strengths(
    dirs: list[tuple[str, str, int, int]], rounds: int = _BT_ROUNDS
) -> dict[str, int]:
    """Exact integer Hunter-MM rounds over a directed duel-count list
    [(item, opp, n, wins_of_item_over_opp)] — arbitrary-precision
    Python ints, the oracle's HUGEINT twin."""
    items = sorted({i for i, _, _, _ in dirs})
    wins = {i: 0 for i in items}
    for i, _, _, w in dirs:
        wins[i] += w
    s = {i: 1000000 for i in items}
    for _ in range(rounds):
        denom = {i: 0 for i in items}
        for i, j, n, _ in dirs:
            denom[i] += (n * _BT_SCALE) // (s[i] + s[j])
        s = {
            i: min(
                max((wins[i] * _BT_SCALE) // max(denom[i], 1), _BT_LO),
                _BT_HI,
            )
            for i in items
        }
    return s


@_register("q330_bradley_terry", oracle=_q330_oracle())
def q330_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength table over user-timeline duels: item,
    duel/win counts, MM-estimated strength (ppm) after 3 exact integer
    rounds, and the leaderboard rank. See block comment."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", "value", "event_id",
        F.lag("event_type").over(w).alias("prev_t"),
        F.lag("value").over(w).alias("prev_v"),
        F.lag("event_id").over(w).alias("prev_id"),
    )
    prev_wins = (F.col("prev_v") > F.col("value")) | (
        (F.col("prev_v") == F.col("value"))
        & (F.col("prev_id") < F.col("event_id"))
    )
    duel = s.filter(
        F.col("prev_t").isNotNull()
        & (F.col("prev_t") != F.col("event_type"))
    ).select(
        F.when(prev_wins, F.col("prev_t")).otherwise(F.col("event_type"))
        .alias("winner"),
        F.when(prev_wins, F.col("event_type")).otherwise(F.col("prev_t"))
        .alias("loser"),
    )
    dir0 = duel.select(
        F.col("winner").alias("item"),
        F.col("loser").alias("opp"),
        F.lit(1).alias("win"),
    ).unionAll(
        duel.select(
            F.col("loser").alias("item"),
            F.col("winner").alias("opp"),
            F.lit(0).alias("win"),
        )
    )
    # ≤|types|² rows; materialized because it feeds BOTH the census agg
    # and the driver-side MM iteration (one corpus pass, not two).
    dirs = materialize(
        dir0.groupBy("item", "opp").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("win").cast("long").alias("w"),
        )
    )
    rows = dirs.collect()  # bounded by construction: |types|² driver scalars
    strengths = bradley_terry_strengths(
        [(r["item"], r["opp"], r["n"], r["w"]) for r in rows]
    )
    order = sorted(strengths, key=lambda i: (-strengths[i], i))
    rank = {i: k + 1 for k, i in enumerate(order)}
    s_col = F.lit(None).cast("long")
    r_col = F.lit(None).cast("long")
    for i in strengths:
        s_col = F.when(F.col("item") == i, F.lit(strengths[i])).otherwise(
            s_col
        )
        r_col = F.when(F.col("item") == i, F.lit(rank[i])).otherwise(r_col)
    return (
        dirs.groupBy("item")
        .agg(
            F.sum("n").cast("long").alias("duels"),
            F.sum("w").cast("long").alias("wins"),
        )
        .select(
            "item", "duels", "wins",
            s_col.cast("long").alias("strength_ppm"),
            r_col.cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# q334 — LEAKAGE-SAFE target encoding (K-fold / leave-fold-out mean
# encoding, the Kaggle-canonical categorical feature): encode each
# customer segment by the mean order value computed EXCLUDING the
# row's own fold — the device that keeps a target-derived feature from
# leaking the very labels it will be trained against. Folds are
# deterministic (o_orderkey % 5).
#
# Exactness: fold sums accumulate in DECIMAL(27,6) (order-free); the
# leave-one-out encoding is (total − fold) / (n_total − n_fold) — a
# ratio of two decimal-exact quantities converted once, the cookbook's
# one-division rule. Never an average of averages.
#
# Plan shape: the orders⨝customer star join (AQE broadcasts the dim
# side when it fits) feeds ONE map-side-combinable groupBy to the
# (segment × fold) grain — ≤ 5·|segments| rows; totals re-aggregate
# THAT bounded frame (never the orders again) and broadcast back.
# Corpus touched once; 100 TB-safe by construction.
# ---------------------------------------------------------------------------


@_register(
    "q334_target_encoding",
    oracle="""
    WITH base AS (
        SELECT c.c_mktsegment AS segment,
               o.o_orderkey % 5 AS fold,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
        SELECT segment, CAST(fold AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(y AS DECIMAL(27,6))) AS s
        FROM base GROUP BY segment, fold
    ),
    tot AS (
        SELECT segment, SUM(n_orders) AS nt, SUM(s) AS st
        FROM cells GROUP BY segment
    )
    SELECT c.segment, c.fold, c.n_orders,
           CAST(c.s AS DOUBLE) / c.n_orders AS fold_mean,
           CASE WHEN t.nt - c.n_orders = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(t.st - c.s AS DOUBLE)
                     / CAST(t.nt - c.n_orders AS DOUBLE)
           END AS encoding
    FROM cells c JOIN tot t ON t.segment = c.segment
    """,
)
def q334_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment × fold) leave-fold-out mean-target encoding table with
    decimal-exact arithmetic. See block comment."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    base = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % 5).cast("long").alias("fold"),
        F.col("o_totalprice").alias("y"),
    )
    cells = materialize(  # ≤ 5·|segments| rows; feeds totals AND output
        base.groupBy("segment", "fold").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("y").cast("decimal(27,6)")).alias("s"),
        )
    )
    tot = cells.groupBy("segment").agg(
        F.sum("n_orders").alias("nt"), F.sum("s").alias("st")
    )
    joined = cells.join(F.broadcast(tot), "segment")
    return joined.select(
        "segment", "fold", "n_orders",
        (F.col("s").cast("double") / F.col("n_orders")).alias("fold_mean"),
        F.when(
            (F.col("nt") - F.col("n_orders")) == 0, F.lit(0.0)
        ).otherwise(
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n_orders")).cast("double")
        ).alias("encoding"),
    )


# ---------------------------------------------------------------------------
# q347 — LINK PREDICTION by the Resource-Allocation index (Zhou, Lü &
# Zhang 2009): for every non-adjacent pair (a, b) of the support≥2
# co-purchase graph, RA(a,b) = Σ_{w ∈ N(a)∩N(b)} 1/deg(w) — the
# common-neighbor family member whose weights need no logarithm, so the
# score stays EXACT in integer space: contribution = 10^9 div deg(w),
# summed per pair (Adamic-Adar's 1/ln deg would hit the libm ban; RA is
# the published integer-safe sibling and empirically outperforms it).
# Top-20 predicted edges under the (score DESC, a, b) total order.
#
# Plan: rides the session-memoized executor-resident edge artifact
# (co_purchase_edges_weighted — built once per session, q66 stance);
# candidate pairs enumerate through the common neighbor (adj ⋈ adj on
# w, a < b), so pair mass is Σ_w deg(w)² — the same bound as q154's
# triangle join, the family's documented enumeration budget; existing
# edges leave via one anti-join; ranking is two-phase global_topk
# (TakeOrderedAndProject, never a partition-less window). At 100 TB
# the production mitigation is hub pruning (drop w with deg > D before
# the self-join) — deliberately NOT applied here so the audit tier
# stays exact; the LSH-pruned/exact tiering precedent is q311/q293.
# ---------------------------------------------------------------------------


def _register_q347() -> None:
    @_register(
        "q347_link_prediction_ra",
        oracle=f"""
        WITH edges AS ({_q154_edges_sql()}),
        adj AS (
            SELECT u AS w, v AS x FROM edges
            UNION ALL
            SELECT v AS w, u AS x FROM edges
        ),
        deg AS (SELECT w, COUNT(*) AS d FROM adj GROUP BY w),
        cand AS (
            SELECT a.x AS ca, b.x AS cb, a.w
            FROM adj a JOIN adj b ON a.w = b.w AND a.x < b.x
        ),
        scored AS (
            SELECT c.ca, c.cb,
                   SUM(1000000000 // d.d) AS ra_ppb,
                   COUNT(*) AS n_common
            FROM cand c
            JOIN deg d ON d.w = c.w
            LEFT JOIN edges e ON e.u = c.ca AND e.v = c.cb
            WHERE e.u IS NULL
            GROUP BY c.ca, c.cb
        ),
        ranked AS (
            SELECT ca, cb, ra_ppb, n_common,
                   ROW_NUMBER() OVER (ORDER BY ra_ppb DESC, ca, cb) AS rnk
            FROM scored
        )
        SELECT CAST(rnk AS BIGINT) AS rnk,
               CAST(ca AS BIGINT) AS part_a,
               CAST(cb AS BIGINT) AS part_b,
               CAST(ra_ppb AS BIGINT) AS ra_ppb,
               CAST(n_common AS BIGINT) AS n_common
        FROM ranked WHERE rnk <= 20
        """,
    )
    def q347_link_prediction_ra(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Top-20 Resource-Allocation link predictions over the
        co-purchase graph (integer 10^9-scaled scores). See block
        comment."""
        edges = co_purchase_edges(spark, sf_dir)
        adj = edges.select(
            F.col("u").alias("w"), F.col("v").alias("x")
        ).unionAll(
            edges.select(F.col("v").alias("w"), F.col("u").alias("x"))
        )
        # adj feeds degrees AND both sides of the neighbor self-join;
        # it derives from the memoized executor-resident edge artifact,
        # so recomputation is two |E| projections — no persist needed.
        deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
        a = adj.select("w", F.col("x").alias("ca"))
        b = adj.select("w", F.col("x").alias("cb"))
        cand = a.join(b, "w").filter(F.col("ca") < F.col("cb"))
        scored = (
            cand.join(deg, "w")
            .join(
                edges.select(
                    F.col("u").alias("ca"), F.col("v").alias("cb"),
                ),
                ["ca", "cb"],
                "left_anti",
            )
            .groupBy("ca", "cb")
            .agg(
                F.sum(F.expr("1000000000L div d")).alias("ra_ppb"),
                F.count(F.lit(1)).alias("n_common"),
            )
        )
        top = global_topk(
            scored,
            [("ra_ppb", "desc"), ("ca", "asc"), ("cb", "asc")],
            20,
            out="rnk",
        )
        return top.select(
            F.col("rnk").cast("long").alias("rnk"),
            F.col("ca").cast("long").alias("part_a"),
            F.col("cb").cast("long").alias("part_b"),
            F.col("ra_ppb").cast("long").alias("ra_ppb"),
            F.col("n_common").cast("long").alias("n_common"),
        )


_register_q347()


# ---------------------------------------------------------------------------
# q351 — JOIN-CARDINALITY ESTIMATION from catalog statistics (the
# Postgres eqjoinsel shape: Most-Common-Value lists + uniform-tail
# assumption, after Ioannidis & Christodoulakis' end-biased
# histograms): estimate |clicks ⋈ purchases on user_id| from per-side
# stats a catalog would store — N rows, D distinct keys, top-32 MCVs
# with exact frequencies — and audit against the exact join size.
# This is the optimizer-facing application of the sketch family: the
# number every join-order decision hangs on, priced from bounded
# state.
#
# Integer estimator (every term a product or one truncating div):
#   est = Σ_{MCV∩MCV} na·nb                       (exact heavy×heavy)
#       + Σ_{MCVa\MCVb} na·(NBt div max(DBt,1))   (heavy×avg-tail)
#       + Σ_{MCVb\MCVa} nb·(NAt div max(DAt,1))
#       + NAt·NBt div max(DAt, DBt, 1)            (tail×tail uniform)
# with NXt/DXt the tail row/distinct counts after removing the MCVs.
# Exact audit = Σ_u na(u)·nb(u) from the per-key count aggregates —
# never a materialized join (the count is the aggregate of products).
#
# Scale shape: two groupBy(user) counts, two bounded global_topk MCV
# extractions (TakeOrderedAndProject), 32-row broadcast joins for the
# term algebra, one products aggregate for the audit. Catalog state is
# 2·(32+2) numbers at ANY corpus size — the point of MCV statistics.
# ---------------------------------------------------------------------------

_Q351_MCV = 32


def _register_q351() -> None:
    def side_sql(alias: str, etype: str) -> str:
        return f"""
        {alias}_cnt AS (
            SELECT user_id AS u, COUNT(*) AS n FROM events
            WHERE event_type = '{etype}' GROUP BY user_id
        ),
        {alias}_mcv AS (
            SELECT u, n FROM (
                SELECT u, n, ROW_NUMBER() OVER (ORDER BY n DESC, u) AS rk
                FROM {alias}_cnt
            ) WHERE rk <= {_Q351_MCV}
        ),
        {alias}_tail AS (
            SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS dt
            FROM {alias}_cnt
            WHERE u NOT IN (SELECT u FROM {alias}_mcv)
        ),
        {alias}_tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM {alias}_cnt
        )"""

    @_register(
        "q351_join_cardinality_estimate",
        oracle=f"""
        WITH {side_sql('a', 'click')},
        {side_sql('b', 'purchase')},
        hh AS (
            SELECT CAST(COALESCE(SUM(a.n * b.n), 0) AS BIGINT) AS v
            FROM a_mcv a JOIN b_mcv b ON a.u = b.u
        ),
        ht AS (
            SELECT CAST(COALESCE(SUM(a.n), 0)
                   * (SELECT nt // GREATEST(dt, 1) FROM b_tail)
                   AS BIGINT) AS v
            FROM a_mcv a WHERE a.u NOT IN (SELECT u FROM b_mcv)
        ),
        th AS (
            SELECT CAST(COALESCE(SUM(b.n), 0)
                   * (SELECT nt // GREATEST(dt, 1) FROM a_tail)
                   AS BIGINT) AS v
            FROM b_mcv b WHERE b.u NOT IN (SELECT u FROM a_mcv)
        ),
        tt AS (
            SELECT CAST(a.nt * b.nt
                   // GREATEST(a.dt, b.dt, 1) AS BIGINT) AS v
            FROM a_tail a, b_tail b
        ),
        exact AS (
            SELECT CAST(COALESCE(SUM(a.n * b.n), 0) AS BIGINT) AS v
            FROM a_cnt a JOIN b_cnt b ON a.u = b.u
        )
        SELECT a_tot.n AS n_a, a_tot.d AS d_a,
               b_tot.n AS n_b, b_tot.d AS d_b,
               CAST(hh.v + ht.v + th.v + tt.v AS BIGINT) AS est_join,
               exact.v AS exact_join,
               CAST(ABS(hh.v + ht.v + th.v + tt.v - exact.v) * 1000
                    // GREATEST(exact.v, 1) AS BIGINT) AS err_permil
        FROM a_tot, b_tot, hh, ht, th, tt, exact
        """,
    )
    def q351_join_cardinality_estimate(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """MCV + uniform-tail estimate of the click⋈purchase user join
        size vs the exact Σ na·nb audit. See block comment."""
        e = load_table(spark, "events", sf_dir)

        def side(etype: str):
            cnt = (
                e.filter(F.col("event_type") == etype)
                .groupBy(F.col("user_id").alias("u"))
                .agg(F.count(F.lit(1)).alias("n"))
            )
            # cnt feeds totals, MCV, tail, and the exact audit — persist
            cnt = cnt.persist()
            mcv = global_topk(
                cnt, [("n", "desc"), ("u", "asc")], _Q351_MCV, out="rk"
            ).select("u", "n")
            tot = cnt.agg(
                F.sum("n").cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("d"),
            ).collect()[0]
            mcv_rows = mcv.collect()  # ≤ 32 catalog scalars, documented
            mcv_n = sum(r["n"] for r in mcv_rows)
            nt = int(tot["n"]) - mcv_n
            dt = int(tot["d"]) - len(mcv_rows)
            return cnt, {r["u"]: r["n"] for r in mcv_rows}, (
                int(tot["n"]), int(tot["d"]), nt, dt,
            )

        a_cnt, a_mcv, (na, da, nat, dat) = side("click")
        b_cnt, b_mcv, (nb, db, nbt, dbt) = side("purchase")
        try:
            # estimator: pure catalog-stat algebra on driver scalars
            # (the 2·(32+2)-number state the block comment documents)
            hh = sum(
                n * b_mcv[u] for u, n in a_mcv.items() if u in b_mcv
            )
            ht = sum(
                n for u, n in a_mcv.items() if u not in b_mcv
            ) * (nbt // max(dbt, 1))
            th = sum(
                n for u, n in b_mcv.items() if u not in a_mcv
            ) * (nat // max(dat, 1))
            tt = nat * nbt // max(dat, dbt, 1)
            est = hh + ht + th + tt
            # Audit accumulator widened to decimal(38,0) (the q217
            # posture, ADVICE r8): DuckDB's SUM(BIGINT) accumulates in
            # HUGEINT while Spark's long SUM would silently wrap — the
            # per-key na·nb products are int64-safe (per-user event
            # counts), but their corpus-wide SUM is not at 100 TB.
            exact = int(
                a_cnt.join(b_cnt, "u")
                .agg(
                    F.coalesce(
                        F.sum(
                            (a_cnt["n"] * b_cnt["n"]).cast(
                                "decimal(38,0)"
                            )
                        ),
                        F.lit(0),
                    ).cast("long").alias("v")
                )
                .collect()[0]["v"]
            )
            err = abs(est - exact) * 1000 // max(exact, 1)
            return spark.createDataFrame(
                [(na, da, nb, db, est, exact, err)],
                "n_a long, d_a long, n_b long, d_b long,"
                " est_join long, exact_join long, err_permil long",
            )
        finally:
            a_cnt.unpersist()
            b_cnt.unpersist()


_register_q351()


# ---------------------------------------------------------------------------
# q353 — DELETION CASCADE census (right-to-be-forgotten propagation):
# given a deletion-request set over customers (md5 % 50 == 0, a ~2%
# corpus-fraction cohort — the q47 hash-cohort device), propagate the
# erasure through the FK chain customer → orders → lineitem and census
# each table: rows before, rows erased, rows after, plus the
# referential-integrity audit (orphans after = 0 — a lineitem whose
# order was erased must not survive). Completes the compliance family
# beside k-anonymity (q243), t-closeness, and PII span scrubbing
# (q185): the reactive half of privacy tooling.
#
# Plan shape: the cascade is two semi-join hops (custkey → orderkey);
# deletions are corpus-fraction frames, so NO broadcast hints — AQE
# picks broadcast while the cohort fits and shuffle-joins beyond (the
# q312 stance). Census rows are one aggregate per table; the orphan
# audit is one anti-join count. At 100 TB this is exactly the
# lakehouse DELETE plan (anti-join rewrite of the affected files).
# ---------------------------------------------------------------------------


def _register_q353() -> None:
    @_register(
        "q353_deletion_cascade",
        oracle="""
        WITH del_c AS (
            SELECT c_custkey FROM customer
            WHERE CAST('0x' || substr(md5(c_custkey || '-erase'), 1, 15)
                  AS BIGINT) % 50 = 0
        ),
        del_o AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del_c)
        ),
        del_l AS (
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)
        ),
        census AS (
            SELECT 'customer' AS tbl,
                   (SELECT COUNT(*) FROM customer) AS before_rows,
                   (SELECT COUNT(*) FROM del_c) AS erased_rows
            UNION ALL
            SELECT 'orders',
                   (SELECT COUNT(*) FROM orders),
                   (SELECT COUNT(*) FROM del_o)
            UNION ALL
            SELECT 'lineitem',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM del_l)
        )
        SELECT tbl,
               CAST(before_rows AS BIGINT) AS before_rows,
               CAST(erased_rows AS BIGINT) AS erased_rows,
               CAST(before_rows - erased_rows AS BIGINT) AS after_rows,
               CAST((SELECT COUNT(*) FROM lineitem l
                     JOIN del_o d ON l.l_orderkey = d.o_orderkey)
                    - (SELECT COUNT(*) FROM del_l)
                    AS BIGINT) AS orphans_after
        FROM census
        """,
    )
    def q353_deletion_cascade(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-table census of a customer-erasure cascade through the
        FK chain, with the zero-orphans audit column. See block
        comment."""
        c = load_table(spark, "customer", sf_dir)
        o = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)
        del_c = c.filter(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"),
                                   F.lit("-erase"))),
                    1, 15,
                ), 16, 10,
            ).cast("long") % 50 == 0
        ).select("c_custkey")
        del_o = o.join(
            del_c, o.o_custkey == del_c.c_custkey, "left_semi"
        ).select("o_orderkey")
        # del_o feeds the lineitem cascade AND the orphan audit
        del_o = del_o.persist()
        try:
            del_l = li.join(
                del_o, li.l_orderkey == del_o.o_orderkey, "left_semi"
            )
            kept_l = li.join(
                del_o, li.l_orderkey == del_o.o_orderkey, "left_anti"
            )
            # orphans = kept lineitems whose order WAS erased — zero by
            # construction of the semi/anti pair; computed, not assumed
            orphans = (
                kept_l.join(
                    del_o, kept_l.l_orderkey == del_o.o_orderkey,
                    "left_semi",
                ).count()
            )
            counts = [
                ("customer", c.count(), del_c.count()),
                ("orders", o.count(), del_o.count()),
                ("lineitem", li.count(), del_l.count()),
            ]  # six 1-value aggregates — driver census scalars
            return spark.createDataFrame(
                [
                    (t, b, e, b - e, orphans)
                    for t, b, e in counts
                ],
                "tbl string, before_rows long, erased_rows long,"
                " after_rows long, orphans_after long",
            )
        finally:
            del_o.unpersist()


_register_q353()


# ---------------------------------------------------------------------------
# q357 — CUPED variance-reduced experiment readout (Deng et al. WSDM
# 2013, the industry-standard A/B adjustment): users split into two
# arms (user_id parity); the post-period metric Y (value cents after
# Jan 16) is adjusted by the pre-period covariate X (cents before) as
# Y − θ(X − X̄), with θ = Cov(X,Y)/Var(X) pooled across arms — the
# pre-period is unaffected by treatment, so the adjustment removes
# user-level variance without biasing the arm contrast.
#
# Integer contract: cents via FLOOR; θ in raw-moment form
# θ_ppm = (n·ΣXY − ΣX·ΣY)·10^6 div (n·ΣXX − ΣX²) — every term int64 at
# gate SFs and the 10× replica ((ΣX)² ≈ 6·10^18 < 2^63 there; beyond,
# the q217 decimal(38,0) widening applies); per-arm adjusted mean in
# milli-cents as a FIXED chain of truncating divisions (negative
# operands truncate toward zero identically in both engines):
# mean_adj = ΣY·1000 div n − θ_ppm·(X̄_arm·1000 − X̄·1000) div 10^6.
#
# Scale shape: one groupBy(user) two-conditional-sum pass, one 5-value
# pooled moment aggregate (driver scalars), one |arms|-row census.
# ---------------------------------------------------------------------------


def _register_q357() -> None:
    @_register(
        "q357_cuped_adjustment",
        oracle="""
        WITH per AS (
            SELECT user_id, user_id % 2 AS arm,
                   SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                       THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100)
                            AS BIGINT) ELSE 0 END) AS x,
                   SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                       THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100)
                            AS BIGINT) ELSE 0 END) AS y
            FROM events GROUP BY user_id
        ),
        mom AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM per
        ),
        theta AS (
            SELECT CAST((n * sxy - sx * sy) * 1000000
                        // (n * sxx - sx * sx) AS BIGINT) AS t_ppm,
                   CAST(sx * 1000 // n AS BIGINT) AS xbar_milli
            FROM mom
        )
        SELECT CAST(p.arm AS BIGINT) AS arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(p.x) AS BIGINT) AS sum_x_cents,
               CAST(SUM(p.y) AS BIGINT) AS sum_y_cents,
               CAST(SUM(p.y) * 1000 // COUNT(*) AS BIGINT)
                   AS mean_y_milli,
               CAST(SUM(p.y) * 1000 // COUNT(*)
                    - t.t_ppm * (SUM(p.x) * 1000 // COUNT(*)
                                 - t.xbar_milli) // 1000000
                    AS BIGINT) AS mean_adj_milli,
               t.t_ppm AS theta_ppm
        FROM per p, theta t
        GROUP BY p.arm, t.t_ppm, t.xbar_milli
        """,
    )
    def q357_cuped_adjustment(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-arm CUPED-adjusted post-period means (milli-cents) with
        the pooled theta. See block comment."""
        e = load_table(spark, "events", sf_dir)
        cents = F.expr(
            "CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)"
        )
        cut = F.lit("2024-01-16").cast("timestamp")
        per = e.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < cut, cents).otherwise(0))
            .cast("long").alias("x"),
            F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0))
            .cast("long").alias("y"),
        ).withColumn("arm", (F.col("user_id") % 2).cast("long"))
        # per feeds the pooled moments AND the arm census — persist
        per = per.persist()
        try:
            m = per.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
            ).collect()[0]  # 5 pooled-moment driver scalars
            n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
            sxy, sxx = int(m["sxy"]), int(m["sxx"])
            t_ppm = _tdiv(
                (n * sxy - sx * sy) * 1000000, n * sxx - sx * sx
            )
            xbar_milli = _tdiv(sx * 1000, n)
            out = per.groupBy("arm").agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum("x").cast("long").alias("sum_x_cents"),
                F.sum("y").cast("long").alias("sum_y_cents"),
                F.expr("CAST(SUM(y) * 1000 div COUNT(*) AS BIGINT)")
                .alias("mean_y_milli"),
                F.expr(
                    f"CAST(SUM(y) * 1000 div COUNT(*)"
                    f" - {t_ppm} * (SUM(x) * 1000 div COUNT(*)"
                    f" - {xbar_milli}) div 1000000 AS BIGINT)"
                ).alias("mean_adj_milli"),
            ).withColumn("theta_ppm", F.lit(t_ppm).cast("long"))
            rows = out.collect()  # |arms| = 2 census rows — localized
            # so the finally can release the cache under the lazy plan
            return spark.createDataFrame(rows, out.schema)
        finally:
            per.unpersist()


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark div / DuckDB //
    semantics — Python's // FLOORS, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


_register_q357()


# ---------------------------------------------------------------------------
# q358 — SIEGEL REPEATED-MEDIAN trend (Siegel 1982): per event type,
# slope_i = median_j slope(i, j) for every day i, estimate =
# median_i slope_i — the 50%-breakdown robust regression (Theil–Sen,
# q250, breaks at 29%: half the points can be wild and the repeated
# median still holds the line, which is why monitoring uses it on
# series with bursty corruption).
#
# Integer contract: slopes micro-quantized by ONE truncating division;
# (a) div (b) equals (−a) div (−b) under truncate-toward-zero, so the
# ordered-pair slope is orientation-free and both engines agree for
# falling slopes too. Both medians are lower-median ORDER STATISTICS
# at (n+1) div 2 under total orders ((slope, xj) inner, (slope, xi)
# outer) — never float mid-averages.
#
# Scale shape: the pair explosion is DAY-grain (series length squared,
# independent of corpus rows); the corpus contributes one
# groupBy(type, day) pass. All rank windows PARTITIONED ((type) or
# (type, i)) and bounded by the day count.
# ---------------------------------------------------------------------------


def _register_q358() -> None:
    @_register(
        "q358_siegel_repeated_median",
        oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                   SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100)
                       AS BIGINT)) AS y
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type, a.d AS xi, b.d AS xj,
                   (b.y - a.y) * 1000000 // (b.d - a.d) AS s
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.d != a.d
        ),
        inner_med AS (
            SELECT event_type, xi, s AS med_i
            FROM (
                SELECT event_type, xi, s,
                       ROW_NUMBER() OVER (PARTITION BY event_type, xi
                           ORDER BY s, xj) AS rk,
                       COUNT(*) OVER (PARTITION BY event_type, xi) AS np
                FROM slopes
            ) WHERE rk = (np + 1) // 2
        ),
        outer_med AS (
            SELECT event_type, med_i, xi,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY med_i, xi) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS nd,
                   MIN(med_i) OVER (PARTITION BY event_type) AS mn,
                   MAX(med_i) OVER (PARTITION BY event_type) AS mx
            FROM inner_med
        )
        SELECT event_type,
               CAST(nd AS BIGINT) AS n_days,
               CAST(med_i AS BIGINT) AS siegel_slope_micro,
               CAST(mn AS BIGINT) AS min_med_micro,
               CAST(mx AS BIGINT) AS max_med_micro
        FROM outer_med
        WHERE rk = (nd + 1) // 2
        """,
    )
    def q358_siegel_repeated_median(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-event-type Siegel repeated-median daily-revenue slope
        (micro-cents/day). See block comment."""
        e = load_table(spark, "events", sf_dir)
        daily = e.groupBy(
            "event_type",
            F.expr(
                "CAST(unix_micros(ts) div 86400000000 AS BIGINT)"
            ).alias("d"),
        ).agg(
            F.sum(
                F.expr("CAST(FLOOR(CAST(value AS DOUBLE) * 100)"
                       " AS BIGINT)")
            ).alias("y"),
        )
        a = daily.select(
            "event_type", F.col("d").alias("xi"), F.col("y").alias("yi")
        )
        b = daily.select(
            "event_type", F.col("d").alias("xj"), F.col("y").alias("yj")
        )
        slopes = (
            a.join(b, "event_type")
            .filter(F.col("xj") != F.col("xi"))
            .select(
                "event_type", "xi", "xj",
                F.expr("(yj - yi) * 1000000 div (xj - xi)").alias("s"),
            )
        )
        wi = Window.partitionBy("event_type", "xi")
        inner = (
            slopes.withColumn(
                "rk", F.row_number().over(wi.orderBy("s", "xj"))
            )
            .withColumn("np", F.count(F.lit(1)).over(wi))
            .filter(F.col("rk") == F.expr("(np + 1) div 2"))
            .select("event_type", "xi", F.col("s").alias("med_i"))
        )
        wt = Window.partitionBy("event_type")
        outer = (
            inner.withColumn(
                "rk", F.row_number().over(wt.orderBy("med_i", "xi"))
            )
            .withColumn("nd", F.count(F.lit(1)).over(wt))
            .withColumn("mn", F.min("med_i").over(wt))
            .withColumn("mx", F.max("med_i").over(wt))
            .filter(F.col("rk") == F.expr("(nd + 1) div 2"))
        )
        return outer.select(
            "event_type",
            F.col("nd").cast("long").alias("n_days"),
            F.col("med_i").cast("long").alias("siegel_slope_micro"),
            F.col("mn").cast("long").alias("min_med_micro"),
            F.col("mx").cast("long").alias("max_med_micro"),
        )


_register_q358()


# ---------------------------------------------------------------------------
# q359 — MANN–WHITNEY U (Wilcoxon rank-sum, the nonparametric
# two-sample location test): does the F-status order-value
# distribution sit above the O-status one, without any normality
# assumption — the robust sibling of q184's Welch t. U is EXACT in
# integer space: with midranks doubled (a tie group spanning ranks
# [a, b] has 2·midrank = a + b, always integral), the A-side rank mass
# is R2A = Σ_v tA_v·(2·before_v + t_v + 1) over the VALUE-grain tie
# census, and 2·U_A = R2A − nA(nA+1).
#
# The normal approximation's z carries the tie-corrected variance —
# one FIXED double op sequence ending in the portable sqrt (the q184
# stance); everything upstream of it is int64 (Σ(t³ − t) bounded by
# the tie profile; heavy-tie columns take the q217 decimal widening).
#
# Scale shape: one groupBy(cents) tie census, ONE two-phase prefix sum
# (global_prefix_sums — never a partition-less window) for the
# before-counts, then a single aggregate. No corpus-sized sort, no
# per-row rank materialization.
# ---------------------------------------------------------------------------


def _register_q359() -> None:
    @_register(
        "q359_mann_whitney_u",
        oracle="""
        WITH vals AS (
            SELECT CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100)
                        AS BIGINT) AS cents,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ),
        census AS (
            SELECT cents, COUNT(*) AS t, SUM(a) AS ta
            FROM vals GROUP BY cents
        ),
        cum AS (
            SELECT cents, t, ta,
                   SUM(t) OVER (ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) - t AS before
            FROM census
        ),
        agg AS (
            SELECT CAST(SUM(ta) AS BIGINT) AS na,
                   CAST(SUM(t - ta) AS BIGINT) AS nb,
                   CAST(SUM(ta * (2 * before + t + 1)) AS BIGINT) AS r2a,
                   CAST(SUM(CASE WHEN t >= 2 THEN t * t * t - t
                            ELSE 0 END) AS BIGINT) AS tiesum,
                   CAST(SUM(CASE WHEN t >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tie_values
            FROM cum
        )
        SELECT na AS n_a, nb AS n_b, n_tie_values,
               CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
               CAST(na * nb AS BIGINT) AS mean_u2,
               (CAST(r2a - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE)
                * CAST(nb AS DOUBLE))
               / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 3.0
                      * ((CAST(na + nb AS DOUBLE) + 1.0)
                         - CAST(tiesum AS DOUBLE)
                           / (CAST(na + nb AS DOUBLE)
                              * (CAST(na + nb AS DOUBLE) - 1.0))))
                   AS z_score
        FROM agg
        """,
    )
    def q359_mann_whitney_u(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Mann–Whitney U (doubled-midrank integer statistic +
        tie-corrected z) for F vs O order values. See block comment."""
        from etl_globalretail_spark.operators.ranks import (
            global_prefix_sums,
        )

        o = load_table(spark, "orders", sf_dir)
        vals = o.filter(F.col("o_orderstatus").isin("F", "O")).select(
            F.expr(
                "CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100)"
                " AS BIGINT)"
            ).alias("cents"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0).alias("a"),
        )
        census = vals.groupBy("cents").agg(
            F.count(F.lit(1)).alias("t"), F.sum("a").alias("ta")
        )
        cum, _tot = global_prefix_sums(census, [("cents", "asc")], ["t"])
        agg = cum.select(
            "t", "ta", (F.col("t_cum") - F.col("t")).alias("before")
        ).agg(
            F.sum("ta").cast("long").alias("na"),
            F.sum(F.col("t") - F.col("ta")).cast("long").alias("nb"),
            F.sum(
                F.col("ta") * (2 * F.col("before") + F.col("t") + 1)
            ).cast("long").alias("r2a"),
            F.sum(
                F.when(
                    F.col("t") >= 2,
                    F.col("t") * F.col("t") * F.col("t") - F.col("t"),
                ).otherwise(0)
            ).cast("long").alias("tiesum"),
            F.sum(F.when(F.col("t") >= 2, 1).otherwise(0))
            .cast("long").alias("n_tie_values"),
        )
        return agg.select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "n_tie_values",
            (F.col("r2a") - F.col("na") * (F.col("na") + 1))
            .cast("long").alias("u2_a"),
            (F.col("na") * F.col("nb")).cast("long").alias("mean_u2"),
            F.expr(
                "(CAST(r2a - na * (na + 1) AS DOUBLE) - CAST(na AS"
                " DOUBLE) * CAST(nb AS DOUBLE))"
                " / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 3.0"
                " * ((CAST(na + nb AS DOUBLE) + 1.0)"
                " - CAST(tiesum AS DOUBLE) / (CAST(na + nb AS DOUBLE)"
                " * (CAST(na + nb AS DOUBLE) - 1.0))))"
            ).alias("z_score"),
        )


_register_q359()


# ---------------------------------------------------------------------------
# q360 — POISSON BOOTSTRAP (the at-scale bootstrap: per-row
# Poisson(1) replicate weights instead of resampling indices — the
# streaming/map-side formulation large analytics stacks standardized
# on): 32 replicate means of the purchase value, each row's weight in
# replicate r drawn DETERMINISTICALLY as w = #{cdf thresholds ≤ u}
# with u = md5('boot{r}-' || event_id) % 10^6 — a pure function of
# (row, r), no RNG, reproducible in both engines. The Poisson(1) CDF
# thresholds are Python-precomputed ppm literals (the q341 LC-table
# device); the replicate spread IS the sampling distribution of the
# mean, and the rank-2/rank-31 replicates bracket a ~94% CI.
#
# Scale shape: one map-side explode of 32 (replicate, weight) structs
# per row folding straight into a 32-group aggregate (map-side
# combine); output is 32 + 1 rows at ANY corpus size. Means in
# milli-cents by one truncating division.
# ---------------------------------------------------------------------------

_Q360_R = 32
# Poisson(1) CDF in ppm for k = 0..7 (weight = #thresholds <= u; the
# tail mass beyond 8 is < 1.02e-4 ppm-rounded into the last bucket)
_Q360_CDF = [
    int(__import__("math").floor(
        sum(
            __import__("math").exp(-1) / __import__("math").factorial(i)
            for i in range(k + 1)
        ) * 10**6
    ))
    for k in range(8)
]


def _register_q360() -> None:
    cdf_sql = "[" + ", ".join(str(x) for x in _Q360_CDF) + "]"

    @_register(
        "q360_poisson_bootstrap",
        oracle=f"""
        WITH p AS (
            SELECT event_id,
                   CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)
                       AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        drawn AS (
            SELECT r.r, p.cents,
                   len(list_filter({cdf_sql},
                       c -> c <= CAST('0x' || substr(md5('boot' || r.r
                            || '-' || p.event_id), 1, 15) AS BIGINT)
                            % 1000000)) AS w
            FROM p, (SELECT unnest(range({_Q360_R})) AS r) r
        ),
        reps AS (
            SELECT r AS replicate,
                   CAST(SUM(w) AS BIGINT) AS n_eff,
                   CAST(SUM(w * cents) * 1000 // SUM(w) AS BIGINT)
                       AS mean_milli
            FROM drawn GROUP BY r
        )
        SELECT CAST(replicate AS BIGINT) AS replicate, n_eff, mean_milli
        FROM reps
        UNION ALL
        SELECT -1, COUNT(*),
               CAST(SUM(cents) * 1000 // COUNT(*) AS BIGINT)
        FROM p
        """,
    )
    def q360_poisson_bootstrap(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """32 Poisson-bootstrap replicate means of purchase value
        (milli-cents) plus the replicate = -1 point estimate. See
        block comment."""
        e = load_table(spark, "events", sf_dir)
        p = e.filter(F.col("event_type") == "purchase").select(
            "event_id",
            F.expr(
                "CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT)"
            ).alias("cents"),
        )
        cdf_arr = "array(" + ", ".join(
            f"{x}L" for x in _Q360_CDF
        ) + ")"
        drawn = p.select(
            "cents",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_Q360_R - 1}), r ->"
                    " struct(r AS r, CAST(size(filter("
                    f"{cdf_arr}, c -> c <= CAST(conv(substring("
                    "md5(concat('boot', r, '-', event_id)), 1, 15),"
                    " 16, 10) AS BIGINT) % 1000000L)) AS BIGINT)"
                    " AS w))"
                )
            ).alias("d"),
        ).select("cents", F.col("d.r").alias("r"), F.col("d.w").alias("w"))
        reps = drawn.groupBy("r").agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.expr(
                "CAST(SUM(w * cents) * 1000 div SUM(w) AS BIGINT)"
            ).alias("mean_milli"),
        ).select(
            F.col("r").cast("long").alias("replicate"),
            "n_eff", "mean_milli",
        )
        point = p.agg(
            F.lit(-1).cast("long").alias("replicate"),
            F.count(F.lit(1)).cast("long").alias("n_eff"),
            F.expr(
                "CAST(SUM(cents) * 1000 div COUNT(*) AS BIGINT)"
            ).alias("mean_milli"),
        )
        return reps.unionAll(point)


_register_q360()


# ---------------------------------------------------------------------------
# q363 — HARMONIC CENTRALITY by sampled multi-source BFS (the
# Eppstein–Wang/Boldi–Vigna estimator: exact closeness needs all-pairs
# distances; the at-scale answer samples k sources and sums 1/d from
# those): completes the centrality family beside degree (q179's
# out-degrees), eigenvector-flavored PageRank/HITS and the local
# clustering coefficient — harmonic is the variant that handles
# disconnected graphs (unreached contributes 0, not a divide-by-∞).
#
# Contract: k = 8 seed parts = smallest (md5(v), v) — the q122 init
# device; distances by 6 SUPERSTEPS of (seed, v)-keyed min-propagation
# (a truncated-radius variant, stated: contributions beyond 6 hops are
# 0 — at 6 hops 1/d ≤ 0.17 and the co-purchase graph's radius is
# smaller); score(v) = Σ_seeds 10^6 div d for d ≥ 1 — integer-exact;
# top-20 under (score DESC, v).
#
# Scale shape: BFS state is |V|·k rows (k fixed), each superstep one
# edge join + map-side MIN combine, localCheckpoint per round (the
# q212 re-execution lesson); ranking via bounded global_topk. The
# oracle unrolls the same 6 rounds over a (seed, v) grid.
# ---------------------------------------------------------------------------

_Q363_K = 8
_Q363_ROUNDS = 6
_Q363_INF = 999


def _register_q363() -> None:
    def round_sql(r: int) -> str:
        return f"""
    d{r} AS MATERIALIZED (
        SELECT dd.seed, dd.v,
               LEAST(dd.d, COALESCE(m.md, {_Q363_INF})) AS d
        FROM d{r - 1} dd
        LEFT JOIN (
            SELECT p.seed, e.dst, MIN(p.d + 1) AS md
            FROM d{r - 1} p JOIN sym e ON e.src = p.v
            GROUP BY p.seed, e.dst
        ) m ON m.seed = dd.seed AND m.dst = dd.v
    )"""

    rounds = ",".join(round_sql(r) for r in range(1, _Q363_ROUNDS + 1))

    @_register(
        "q363_harmonic_centrality",
        oracle=f"""
    WITH RECURSIVE
    edges AS ({_q154_edges_sql()}),
    sym AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v AS src, u AS dst FROM edges
    ),
    verts AS (SELECT DISTINCT src AS v FROM sym),
    seeds AS (
        SELECT v AS seed FROM (
            SELECT v, ROW_NUMBER() OVER (
                ORDER BY md5(CAST(v AS VARCHAR)), v) AS rk
            FROM verts
        ) WHERE rk <= {_Q363_K}
    ),
    d0 AS MATERIALIZED (
        SELECT s.seed, vv.v,
               CASE WHEN vv.v = s.seed THEN 0 ELSE {_Q363_INF} END AS d
        FROM seeds s CROSS JOIN verts vv
    ),
    {rounds},
    scored AS (
        SELECT v,
               CAST(SUM(CASE WHEN d >= 1 AND d < {_Q363_INF}
                        THEN 1000000 // d ELSE 0 END) AS BIGINT) AS score,
               CAST(SUM(CASE WHEN d < {_Q363_INF} AND d >= 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_reached
        FROM d{_Q363_ROUNDS} GROUP BY v
    ),
    ranked AS (
        SELECT v, score, n_reached,
               ROW_NUMBER() OVER (ORDER BY score DESC, v) AS rnk
        FROM scored
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, CAST(v AS BIGINT) AS part,
           score AS harmonic_score, n_reached
    FROM ranked WHERE rnk <= 20
    """,
    )
    def q363_harmonic_centrality(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Top-20 sampled harmonic centrality over the co-purchase
        graph (8 md5 seeds, 6 supersteps). See block comment."""
        edges = co_purchase_edges(spark, sf_dir)
        sym = edges.select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        ).unionAll(
            edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        verts = sym.select(F.col("src").alias("v")).distinct()
        seeds = [
            r["v"]
            for r in verts.orderBy(
                F.md5(F.col("v").cast("string")), F.col("v")
            ).limit(_Q363_K).collect()
        ]  # k = 8 documented seed scalars
        seed_df = verts.select(
            "v",
            F.explode(
                F.array(*[F.lit(s).cast("long") for s in seeds])
            ).alias("seed"),
        ).select(
            "seed", "v",
            F.when(F.col("v") == F.col("seed"), 0)
            .otherwise(F.lit(_Q363_INF)).cast("long").alias("d"),
        )
        dist = seed_df.localCheckpoint()
        for _ in range(_Q363_ROUNDS):
            # r10: one wide exchange per superstep — the previous round's
            # state unions with the edge-propagated candidates and a single
            # (seed, v) groupBy-MIN replaces the former
            # groupBy(seed,dst) → left-join-back chain (2 state-keyed
            # exchanges → 1). Equivalent because d0 seeds EVERY (seed, v)
            # cell, so min over self ∪ incoming ≡ least(d, min(d+1)).
            relaxed = (
                sym.join(dist, sym["src"] == dist["v"])
                .select("seed", F.col("dst").alias("v"),
                        (F.col("d") + 1).alias("d"))
            )
            nxt = (
                dist.select("seed", "v", "d")
                .unionAll(relaxed)
                .groupBy("seed", "v")  # map-side partial MIN
                .agg(F.min("d").cast("long").alias("d"))
            )
            prev = dist
            dist = nxt.localCheckpoint()  # q212: or every action replays
            del prev
        scored = dist.groupBy("v").agg(
            F.sum(
                F.when(
                    (F.col("d") >= 1) & (F.col("d") < _Q363_INF),
                    F.expr("1000000 div d"),
                ).otherwise(0)
            ).cast("long").alias("score"),
            F.sum(
                F.when(
                    (F.col("d") >= 1) & (F.col("d") < _Q363_INF), 1
                ).otherwise(0)
            ).cast("long").alias("n_reached"),
        )
        top = global_topk(
            scored, [("score", "desc"), ("v", "asc")], 20, out="rnk"
        )
        return top.select(
            F.col("rnk").cast("long").alias("rnk"),
            F.col("v").cast("long").alias("part"),
            F.col("score").alias("harmonic_score"),
            F.col("n_reached"),
        )


_register_q363()


# ---------------------------------------------------------------------------
# q384 — FORECAST BASELINE EVALUATION (naive-1, seasonal-naive-7,
# moving-average-7, scored by MAE and MASE): the benchmark panel every
# forecasting rollout is graded against (Hyndman & Koehler 2006
# introduced MASE precisely so models are compared to the naive
# baselines; M-competitions report exactly this table). A model that
# can't beat seasonal-naive on MASE < 1000‰ doesn't ship.
#
# All-integer: the series is the daily order count; each candidate day
# joins its 7 trailing days via a bounded offset EXPLODE (never a
# global range-frame window — day grain would be whitelist-bounded,
# but the explode form needs no whitelist at all); eval set = days
# with ALL 7 lags present (fair across models, identical in both
# engines); MA-7 = floor(Σ lags / 7); errors are |int − int|;
#     mae_milli   = Σ|e| · 1000 div n_days
#     mase_permil = Σ|e_model| · 1000 div Σ|e_naive1|
# — single truncations of exact integer sums (naive-1's own MASE is
# exactly 1000 by construction, a free self-check the pytest pins).
# ---------------------------------------------------------------------------


def _register_q384() -> None:
    @_register(
        "q384_forecast_baselines",
        oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        ),
        lagged AS (
            SELECT t.d, t.n,
                   COUNT(*) AS n_lags,
                   CAST(SUM(l.n) AS BIGINT) AS lag_sum,
                   CAST(MAX(CASE WHEN l.d = t.d - 1 THEN l.n END)
                        AS BIGINT) AS lag1,
                   CAST(MAX(CASE WHEN l.d = t.d - 7 THEN l.n END)
                        AS BIGINT) AS lag7
            FROM daily t
            JOIN daily l
              ON l.d >= t.d - 7 AND l.d <= t.d - 1
            GROUP BY t.d, t.n
            HAVING COUNT(*) = 7
        ),
        errs AS (
            SELECT SUM(ABS(n - lag1)) AS e1,
                   SUM(ABS(n - lag7)) AS e7,
                   SUM(ABS(n - lag_sum // 7)) AS ema,
                   COUNT(*) AS nd
            FROM lagged
        )
        SELECT model, n_days, sum_abs_err,
               CAST(sum_abs_err * 1000 // n_days AS BIGINT) AS mae_milli,
               CAST(sum_abs_err * 1000 // e1 AS BIGINT) AS mase_permil
        FROM (
            SELECT 'naive1' AS model, CAST(nd AS BIGINT) AS n_days,
                   CAST(e1 AS BIGINT) AS sum_abs_err, e1 FROM errs
            UNION ALL
            SELECT 'seasonal7', CAST(nd AS BIGINT), CAST(e7 AS BIGINT), e1
            FROM errs
            UNION ALL
            SELECT 'ma7', CAST(nd AS BIGINT), CAST(ema AS BIGINT), e1
            FROM errs
        )
        """,
    )
    def q384_forecast_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MAE/MASE panel for the three canonical forecast baselines
        over the daily order-count series. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        # bounded offset explode: each day looks up its 7 trailing days
        offs = daily.select(
            "d", "n",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, 8)])
            ).alias("off"),
        ).select(
            "d", "n", F.date_sub(F.col("d"), F.col("off")).alias("ld"),
            "off",
        )
        lagged = (
            offs.join(
                daily.select(F.col("d").alias("ld"),
                             F.col("n").alias("ln")),
                "ld",
            )
            .groupBy("d", "n")
            .agg(
                F.count(F.lit(1)).alias("n_lags"),
                F.sum("ln").cast("long").alias("lag_sum"),
                F.max(F.when(F.col("off") == 1, F.col("ln")))
                .cast("long").alias("lag1"),
                F.max(F.when(F.col("off") == 7, F.col("ln")))
                .cast("long").alias("lag7"),
            )
            .filter(F.col("n_lags") == 7)
        )
        errs = lagged.agg(
            F.sum(F.abs(F.col("n") - F.col("lag1"))).cast("long")
            .alias("e1"),
            F.sum(F.abs(F.col("n") - F.col("lag7"))).cast("long")
            .alias("e7"),
            F.sum(F.abs(F.col("n") - F.expr("lag_sum div 7"))).cast("long")
            .alias("ema"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        )
        legs = []
        for model, col in (("naive1", "e1"), ("seasonal7", "e7"),
                           ("ma7", "ema")):
            legs.append(
                errs.select(
                    F.lit(model).alias("model"),
                    F.col("nd").alias("n_days"),
                    F.col(col).alias("sum_abs_err"),
                    F.expr(f"CAST({col} * 1000 div nd AS BIGINT)")
                    .alias("mae_milli"),
                    F.expr(f"CAST({col} * 1000 div e1 AS BIGINT)")
                    .alias("mase_permil"),
                )
            )
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out


_register_q384()


# ---------------------------------------------------------------------------
# q385 — KAPLAN–MEIER product-limit survival curve (Kaplan & Meier 1958)
# over q267's first-purchase life table: THE estimator every retention /
# churn dashboard plots above the life table's hazards. q267's block
# comment deliberately left the KM product off the hash gate because a
# cumulative FP product is an ordered chain both engines could disagree
# on; this query puts it ON the gate by making the fold exact: survival
# is carried in integer ppm and each step applies
#     s ← s · (n_risk − d_events) div n_risk
# with truncating integer division — associativity is irrelevant because
# BOTH engines replay the identical left fold over the identical bucket
# order (all operands non-negative, so DuckDB `//` ≡ Spark/Python
# truncation; s ≤ 1e6 and n_risk ≤ |users| keep s·n_risk far from int64).
#
# Plan: the life table is computed distributed exactly as q267 (one
# per-user aggregate → day-bucket groupBy); the fold then runs over the
# DAY-BUCKET grain — bounded by the observation span in days (≤ ~2.6k
# for the 7-year corpus at ANY SF, the q343/q122 documented
# driver-scalar class), so the buckets are collected and folded in
# Python ints with the suffix-sum n_risk computed in the same pass (no
# partition-less window anywhere). The oracle replays the identical
# fold as a recursive CTE over the ROW_NUMBER-indexed buckets.
# At 100 TB nothing changes: the collect is |distinct duration days|,
# not corpus-sized.
# ---------------------------------------------------------------------------


def _register_q385() -> None:
    @_register(
        "q385_kaplan_meier",
        oracle="""
        WITH RECURSIVE per_user AS (
            SELECT user_id,
                   MIN(ts) AS t0,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
                   MAX(ts) AS tend
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS converted,
                   CASE WHEN tp IS NOT NULL
                        THEN (epoch_us(tp) - epoch_us(t0)) // 86400000000
                        ELSE (epoch_us(tend) - epoch_us(t0)) // 86400000000
                   END AS day
            FROM per_user
        ),
        buckets AS (
            SELECT day, CAST(SUM(converted) AS BIGINT) AS d_events,
                   CAST(SUM(1 - converted) AS BIGINT) AS d_censored
            FROM durs GROUP BY day
        ),
        idx AS (
            SELECT day, d_events, d_censored,
                   SUM(d_events + d_censored) OVER (
                       ORDER BY day DESC ROWS UNBOUNDED PRECEDING
                   ) AS n_risk,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM buckets
        ),
        km AS (
            SELECT rn, day, n_risk, d_events, d_censored,
                   CAST(1000000 * (n_risk - d_events) // n_risk
                        AS BIGINT) AS s
            FROM idx WHERE rn = 1
            UNION ALL
            SELECT i.rn, i.day, i.n_risk, i.d_events, i.d_censored,
                   CAST(km.s * (i.n_risk - i.d_events) // i.n_risk
                        AS BIGINT)
            FROM km JOIN idx i ON i.rn = km.rn + 1
        )
        SELECT CAST(day AS BIGINT) AS day,
               CAST(n_risk AS BIGINT) AS n_risk,
               d_events, d_censored,
               s AS survival_ppm
        FROM km
        """,
    )
    def q385_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact integer-ppm Kaplan–Meier curve over the first-purchase
        life table (q267's stated BI-layer fold, made cross-engine).
        See block comment for the bounded-grain driver-fold posture."""
        ev = load_table(spark, "events", sf_dir)
        per_user = ev.groupBy("user_id").agg(
            F.min("ts").alias("t0"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("tp"),
            F.max("ts").alias("tend"),
        )
        durs = per_user.select(
            F.when(F.col("tp").isNotNull(), 1).otherwise(0)
            .alias("converted"),
            F.when(
                F.col("tp").isNotNull(),
                F.expr(
                    "(unix_micros(tp) - unix_micros(t0)) div 86400000000"
                ),
            ).otherwise(
                F.expr(
                    "(unix_micros(tend) - unix_micros(t0)) div 86400000000"
                )
            ).alias("day"),
        )
        buckets = durs.groupBy("day").agg(
            F.sum("converted").cast("long").alias("d_events"),
            F.sum(F.lit(1) - F.col("converted")).cast("long")
            .alias("d_censored"),
        )
        # bounded collect: |buckets| ≤ observation span in DAYS (≤ ~2.6k
        # at any SF) — the q343 documented driver-scalar class.
        rows = sorted(
            (
                (r["day"], r["d_events"], r["d_censored"])
                for r in buckets.collect()
            ),
        )
        n_risk = 0
        suffix: list[tuple[int, int, int, int]] = []
        for day, d_ev, d_ce in reversed(rows):
            n_risk += d_ev + d_ce
            suffix.append((day, n_risk, d_ev, d_ce))
        suffix.reverse()
        s = 1_000_000
        out = []
        for day, nr, d_ev, d_ce in suffix:
            s = s * (nr - d_ev) // nr  # non-negative: // ≡ truncation
            out.append((day, nr, d_ev, d_ce, s))
        return spark.createDataFrame(
            out,
            "day long, n_risk long, d_events long, d_censored long,"
            " survival_ppm long",
        )


_register_q385()


# ---------------------------------------------------------------------------
# q386 — WILSON lower-bound ranking (Wilson 1927 by way of Miller's
# "How Not To Sort By Average Rating" — the Reddit/Hacker-News comment
# sort): rank suppliers by the LOWER bound of the 95% Wilson score
# interval on their keep rate (share of line items NOT returned), not
# by the raw rate — a 3/3 supplier must not outrank a 970/1000 one.
#
# Cross-engine determinism: the bound needs sqrt, which IEEE 754
# requires correctly rounded (portable, unlike pow/log — the cookbook's
# libm line), and +,−,×,/ on doubles are exact IEEE ops — so BOTH
# engines evaluate the IDENTICAL formula string (the q374 shared-SQL
# device) over exactly-representable int64 inputs and produce
# bit-identical doubles. Constants are E-notation literals (decimal
# literals cast differently in DuckDB — the q174 observation):
# z = 1.96, z² = 3.8416, z²/2 = 1.9208, z²/4 = 9.604e-1. The algebra
# is pre-multiplied by n so no p̂ intermediate exists:
#     lb = (pos + z²/2 − z·√(pos·neg/n + z²/4)) / (n + z²).
# pos·neg stays exact in double up to n ≈ 9.4e7 rows per supplier
# (2^53 bound) — orders of magnitude above any per-supplier line count
# at 100 TB; stated, not silently assumed.
#
# Plan: one map-side-combinable groupBy(l_suppkey) over lineitem (the
# only shuffle), the scalar formula row-wise, then top-20 via the
# two-phase global_topk (TakeOrderedAndProject — never a partition-less
# rank window).
# ---------------------------------------------------------------------------


_WILSON_LB_SQL = (
    "(CAST(pos AS DOUBLE) + 1.9208e0 - 1.96e0 * sqrt("
    "CAST(pos AS DOUBLE) * CAST(neg AS DOUBLE) / CAST(n AS DOUBLE)"
    " + 9.604e-1)) / (CAST(n AS DOUBLE) + 3.8416e0)"
)


def _register_q386() -> None:
    @_register(
        "q386_wilson_ranking",
        oracle=f"""
        WITH agg AS (
            SELECT l_suppkey AS suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag <> 'R'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM lineitem GROUP BY l_suppkey
        ),
        scored AS (
            SELECT suppkey, n, pos,
                   CAST(pos * 1000000 // n AS BIGINT) AS naive_ppm,
                   {_WILSON_LB_SQL.replace("neg", "(n - pos)")} AS wilson_lb
            FROM agg
        )
        SELECT CAST(rnk AS BIGINT) AS rnk, suppkey, n, pos,
               naive_ppm, wilson_lb
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       ORDER BY wilson_lb DESC, suppkey) AS rnk
            FROM scored
        ) WHERE rnk <= 20
        """,
    )
    def q386_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Top-20 suppliers by the Wilson 95% lower bound of their
        keep rate (bit-identical shared formula). See block comment."""
        li = load_table(spark, "lineitem", sf_dir)
        agg = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
            .cast("long").alias("pos"),
        )
        scored = agg.select(
            "suppkey", "n", "pos",
            F.expr("CAST(pos * 1000000 div n AS BIGINT)")
            .alias("naive_ppm"),
            F.expr(_WILSON_LB_SQL.replace("neg", "(n - pos)"))
            .alias("wilson_lb"),
        )
        return global_topk(
            scored, [("wilson_lb", "desc"), ("suppkey", "asc")], 20,
            out="rnk",
        ).select(
            F.col("rnk").cast("long").alias("rnk"),
            "suppkey", "n", "pos", "naive_ppm", "wilson_lb",
        )


_register_q386()


# ---------------------------------------------------------------------------
# q389 — PINBALL-LOSS QUANTILE-FORECAST EVALUATION (Koenker & Bassett
# 1978's check function; the M5-Uncertainty / every-prob-forecast
# scoring rule): q384 grades POINT forecasts by MAE — this grades
# QUANTILE forecasts by the loss they are actually proper for,
#     L_τ(y, ŷ) = τ·(y−ŷ)⁺ + (1−τ)·(ŷ−y)⁺,
# at τ = 0.5 and τ = 0.9 over the same daily order-count series. The
# punchline the pytest pins: each forecaster wins at ITS OWN τ — the
# trailing median minimizes τ=0.5 pinball, the trailing max (the 7/7
# order statistic ≈ p90 of a 7-window) wins at τ=0.9 — which is the
# whole reason quantile models are scored this way.
#
# All-integer: τ cleared to tenths (×10): loss10 = 9(y−ŷ)⁺ + (ŷ−y)⁺
# at τ=.9 and 5|y−ŷ| at τ=.5. Forecasters are order statistics of the
# 7 trailing lags (q384's bounded offset explode): median = 4th of 7,
# max = 7th of 7, plus naive-1 (lag1) as the point-model control —
# whose DOUBLED τ=.5 pinball equals q384's naive-1 Σ|e| exactly (a
# free cross-query law, pinned). ONE aggregate computes all six sums;
# six 1-row legs union BY NAME into one job (the q283 device).
# ---------------------------------------------------------------------------


def _register_q389() -> None:
    @_register(
        "q389_pinball_quantile_eval",
        oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        ),
        offs AS (
            SELECT t.d, t.n, l.n AS ln, o.off
            FROM daily t
            CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS off) o
            JOIN daily l ON l.d = t.d - CAST(o.off AS INTEGER)
        ),
        lagged AS (
            SELECT d, n,
                   list_sort(list(ln)) AS ls,
                   MAX(CASE WHEN off = 1 THEN ln END) AS lag1
            FROM offs GROUP BY d, n
            HAVING COUNT(*) = 7
        ),
        fc AS (
            SELECT d, n, ls[4] AS f_med, ls[7] AS f_max, lag1 AS f_lag1
            FROM lagged
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(5 * abs(n - f_med)) AS BIGINT) AS med50,
                   CAST(SUM(5 * abs(n - f_max)) AS BIGINT) AS max50,
                   CAST(SUM(5 * abs(n - f_lag1)) AS BIGINT) AS lag150,
                   CAST(SUM(9 * GREATEST(n - f_med, 0)
                            + GREATEST(f_med - n, 0)) AS BIGINT) AS med90,
                   CAST(SUM(9 * GREATEST(n - f_max, 0)
                            + GREATEST(f_max - n, 0)) AS BIGINT) AS max90,
                   CAST(SUM(9 * GREATEST(n - f_lag1, 0)
                            + GREATEST(f_lag1 - n, 0)) AS BIGINT) AS lag190
            FROM fc
        )
        SELECT tau_pct, model, n_days, pinball10_sum,
               CAST(pinball10_sum * 1000 // n_days AS BIGINT) AS mean_milli
        FROM (
            SELECT CAST(50 AS BIGINT) AS tau_pct, 'trail_median' AS model,
                   nd AS n_days, med50 AS pinball10_sum FROM sums
            UNION ALL SELECT 50, 'trail_max', nd, max50 FROM sums
            UNION ALL SELECT 50, 'naive1', nd, lag150 FROM sums
            UNION ALL SELECT 90, 'trail_median', nd, med90 FROM sums
            UNION ALL SELECT 90, 'trail_max', nd, max90 FROM sums
            UNION ALL SELECT 90, 'naive1', nd, lag190 FROM sums
        )
        """,
    )
    def q389_pinball_quantile_eval(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """τ ∈ {0.5, 0.9} pinball-loss panel for trailing-window order
        statistics + naive-1 over the daily order series. See block
        comment."""
        o = load_table(spark, "orders", sf_dir)
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        offs = daily.select(
            "d", "n",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, 8)])
            ).alias("off"),
        ).select(
            "d", "n", F.date_sub(F.col("d"), F.col("off")).alias("ld"),
            "off",
        )
        lagged = (
            offs.join(
                daily.select(F.col("d").alias("ld"),
                             F.col("n").alias("ln")),
                "ld",
            )
            .groupBy("d", "n")
            .agg(
                F.count(F.lit(1)).alias("n_lags"),
                F.array_sort(F.collect_list("ln")).alias("ls"),
                F.max(F.when(F.col("off") == 1, F.col("ln")))
                .cast("long").alias("f_lag1"),
            )
            .filter(F.col("n_lags") == 7)
            .select(
                "d", "n",
                F.element_at("ls", 4).cast("long").alias("f_med"),
                F.element_at("ls", 7).cast("long").alias("f_max"),
                "f_lag1",
            )
        )
        sums = lagged.agg(
            F.count(F.lit(1)).cast("long").alias("nd"),
            *[
                F.sum(5 * F.abs(F.col("n") - F.col(f"f_{m}")))
                .cast("long").alias(f"{m}50")
                for m in ("med", "max", "lag1")
            ],
            *[
                F.sum(
                    9 * F.greatest(F.col("n") - F.col(f"f_{m}"), F.lit(0))
                    + F.greatest(F.col(f"f_{m}") - F.col("n"), F.lit(0))
                ).cast("long").alias(f"{m}90")
                for m in ("med", "max", "lag1")
            ],
        )
        legs = []
        for tau, suf in ((50, "50"), (90, "90")):
            for model, m in (("trail_median", "med"), ("trail_max", "max"),
                             ("naive1", "lag1")):
                legs.append(
                    sums.select(
                        F.lit(tau).cast("long").alias("tau_pct"),
                        F.lit(model).alias("model"),
                        F.col("nd").alias("n_days"),
                        F.col(f"{m}{suf}").alias("pinball10_sum"),
                        F.expr(
                            f"CAST({m}{suf} * 1000 div nd AS BIGINT)"
                        ).alias("mean_milli"),
                    )
                )
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out


_register_q389()


# ---------------------------------------------------------------------------
# q390 — SIMPSON'S-PARADOX AUDIT (Simpson 1951; the kidney-stone /
# Berkeley-admissions trap): before shipping "segment A converts
# better than segment B", check whether the POOLED direction agrees
# with the WITHIN-STRATUM directions — a confounded mix (here: order
# year) can flip the sign. This is the metrics-review gate every
# experimentation platform runs next to q357's CUPED.
#
# Exact integers: rates are never divided — a_pos/a_n vs b_pos/b_n is
# compared by cross-multiplication a_pos·b_n vs b_pos·a_n (int64;
# needs the q217 decimal widening past ~3e9 rows per cell, stated),
# giving diff_sign ∈ {−1, 0, 1} per stratum and pooled. paradox_flag
# = 1 iff the pooled sign is nonzero, no populated stratum agrees
# with it, and at least one strictly opposes — the strict form of the
# reversal.
#
# Cohorts: BUILDING vs MACHINERY customers; metric: URGENT/HIGH
# priority order share; strata: order year. One fact⨝dim join, one
# groupBy(year) to the |years|-grain cell frame (persisted — rows AND
# its own re-aggregate, the CLAUDE.md rule), pooled = re-aggregate of
# the cells, flag = driver scalar over ≤|years| signs.
# ---------------------------------------------------------------------------


def _register_q390() -> None:
    @_register(
        "q390_simpson_audit",
        oracle="""
        WITH base AS (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                   c.c_mktsegment AS seg,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS hot
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        ),
        cells AS MATERIALIZED (
            SELECT yr,
                   CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN seg = 'BUILDING' THEN hot ELSE 0 END)
                        AS BIGINT) AS pos_a,
                   CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN hot ELSE 0 END)
                        AS BIGINT) AS pos_b
            FROM base GROUP BY yr
        ),
        strata AS (
            SELECT CAST(yr AS VARCHAR) AS stratum, n_a, pos_a, n_b, pos_b,
                   CASE WHEN pos_a * n_b > pos_b * n_a THEN 1
                        WHEN pos_a * n_b < pos_b * n_a THEN -1
                        ELSE 0 END AS diff_sign
            FROM cells WHERE n_a > 0 AND n_b > 0
        ),
        pooled AS (
            SELECT 'ALL' AS stratum,
                   CAST(SUM(n_a) AS BIGINT) AS n_a,
                   CAST(SUM(pos_a) AS BIGINT) AS pos_a,
                   CAST(SUM(n_b) AS BIGINT) AS n_b,
                   CAST(SUM(pos_b) AS BIGINT) AS pos_b,
                   CASE WHEN SUM(pos_a) * SUM(n_b)
                             > SUM(pos_b) * SUM(n_a) THEN 1
                        WHEN SUM(pos_a) * SUM(n_b)
                             < SUM(pos_b) * SUM(n_a) THEN -1
                        ELSE 0 END AS diff_sign
            FROM cells
        ),
        allrows AS (
            SELECT * FROM strata UNION ALL SELECT * FROM pooled
        ),
        flag AS (
            SELECT CASE WHEN p.diff_sign <> 0
                         AND NOT EXISTS (SELECT 1 FROM strata s
                                         WHERE s.diff_sign = p.diff_sign)
                         AND EXISTS (SELECT 1 FROM strata s
                                     WHERE s.diff_sign = -p.diff_sign)
                        THEN 1 ELSE 0 END AS paradox_flag
            FROM pooled p
        )
        SELECT a.stratum, a.n_a, a.pos_a, a.n_b, a.pos_b,
               CAST(a.diff_sign AS BIGINT) AS diff_sign,
               CAST(f.paradox_flag AS BIGINT) AS paradox_flag
        FROM allrows a CROSS JOIN flag f
        """,
    )
    def q390_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-year and pooled BUILDING-vs-MACHINERY hot-order-rate
        direction with a strict Simpson-reversal flag. See block
        comment."""
        o = load_table(spark, "orders", sf_dir)
        c = load_table(spark, "customer", sf_dir)
        base = (
            o.join(c, o.o_custkey == c.c_custkey)
            .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
            .select(
                F.year("o_orderdate").cast("long").alias("yr"),
                F.col("c_mktsegment").alias("seg"),
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0).alias("hot"),
            )
        )
        cells = base.groupBy("yr").agg(
            F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("seg") == "BUILDING", F.col("hot"))
                  .otherwise(0)).cast("long").alias("pos_a"),
            F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0))
            .cast("long").alias("n_b"),
            F.sum(F.when(F.col("seg") == "MACHINERY", F.col("hot"))
                  .otherwise(0)).cast("long").alias("pos_b"),
        ).persist()  # rows AND their own pooled re-aggregate
        sign = (
            F.when(F.col("pos_a") * F.col("n_b")
                   > F.col("pos_b") * F.col("n_a"), 1)
            .when(F.col("pos_a") * F.col("n_b")
                  < F.col("pos_b") * F.col("n_a"), -1)
            .otherwise(0)
        )
        strata = cells.filter(
            (F.col("n_a") > 0) & (F.col("n_b") > 0)
        ).select(
            F.col("yr").cast("string").alias("stratum"),
            "n_a", "pos_a", "n_b", "pos_b",
            sign.cast("long").alias("diff_sign"),
        )
        pooled = cells.agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("pos_a").cast("long").alias("pos_a"),
            F.sum("n_b").cast("long").alias("n_b"),
            F.sum("pos_b").cast("long").alias("pos_b"),
        ).select(
            F.lit("ALL").alias("stratum"),
            "n_a", "pos_a", "n_b", "pos_b",
            sign.cast("long").alias("diff_sign"),
        )
        # ≤|years| signs + 1 pooled sign: bounded driver scalars
        s_signs = [r["diff_sign"] for r in strata.collect()]
        p_sign = pooled.collect()[0]["diff_sign"]
        paradox = int(
            p_sign != 0
            and all(s != p_sign for s in s_signs)
            and any(s == -p_sign for s in s_signs)
        )
        return strata.unionByName(pooled).withColumn(
            "paradox_flag", F.lit(paradox).cast("long")
        )


_register_q390()


# ---------------------------------------------------------------------------
# q392 — ISOTONIC CALIBRATION via PAVA (Ayer et al. 1955; Barlow et al.
# 1972; Zadrozny & Elkan 2002 made it the standard classifier
# calibrator next to Platt scaling): fit the best MONOTONE
# non-decreasing rate curve over ordered score bins — here the
# hot-order (URGENT/HIGH) rate over bit-length price buckets
# (bucket = bitlen(floor-cents), a deterministic, window-free,
# bounded ~24-value grid monotone in price). q350 calibrates by
# binning alone; this adds the monotonicity projection.
#
# Cross-engine exactness rides on TWO facts. (1) The PAVA fit has the
# minimax closed form  ŷ_i = max_{k≤i} min_{j≥i} mean(pool k..j)
# (Barlow et al. 1972, thm 1.4.4) — so the oracle needs no recursive
# pool-merging, just an O(B³) enumeration over the BOUNDED bin grain.
# (2) floor is monotone non-decreasing, so it COMMUTES with min/max:
# floor-ppm of the minimax equals minimax of the floor-ppm interval
# means — both engines therefore quantize each interval mean ONCE
# with integer division and take max-of-min in int64.
#
# Plan: one map-side-combinable groupBy(bucket) over orders; the
# Spark side collects the ≤24 bins (q343 driver-scalar class) and
# runs the exact-fraction PAVA fold (cross-multiplied mean compares,
# never a float); the oracle replays the minimax form. Equality of
# the two IS the theorem, re-proven on the gate every round.
# ---------------------------------------------------------------------------


def _register_q392() -> None:
    @_register(
        "q392_isotonic_calibration",
        oracle="""
        WITH base AS (
            SELECT length(bin(CAST(FLOOR(o_totalprice * 100) AS BIGINT)))
                       AS bucket,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS hot
            FROM orders
        ),
        bins AS MATERIALIZED (
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(hot) AS BIGINT) AS pos
            FROM base GROUP BY bucket
        ),
        idx AS MATERIALIZED (
            SELECT bucket, n, pos,
                   ROW_NUMBER() OVER (ORDER BY bucket) AS rn
            FROM bins
        ),
        intervals AS MATERIALIZED (
            SELECT a.rn AS k, b.rn AS j,
                   CAST(1000000 * SUM(m.pos) // SUM(m.n) AS BIGINT) AS v
            FROM idx a
            JOIN idx b ON a.rn <= b.rn
            JOIN idx m ON m.rn BETWEEN a.rn AND b.rn
            GROUP BY a.rn, b.rn
        ),
        mv AS (
            SELECT iv.k, i.rn AS i, MIN(iv.v) AS mn
            FROM intervals iv
            JOIN idx i ON iv.k <= i.rn AND iv.j >= i.rn
            GROUP BY iv.k, i.rn
        ),
        iso AS (SELECT i, CAST(MAX(mn) AS BIGINT) AS iso_ppm
                FROM mv GROUP BY i)
        SELECT x.bucket, x.n, x.pos,
               CAST(1000000 * x.pos // x.n AS BIGINT) AS raw_ppm,
               iso.iso_ppm
        FROM idx x JOIN iso ON iso.i = x.rn
        """,
    )
    def q392_isotonic_calibration(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Monotone (isotonic / PAVA) hot-order rate over bit-length
        price buckets, exact-fraction pooling quantized once to ppm.
        See block comment."""
        o = load_table(spark, "orders", sf_dir)
        bins = (
            o.select(
                F.length(
                    F.bin(F.floor(F.col("o_totalprice") * 100)
                          .cast("long"))
                ).cast("long").alias("bucket"),
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0).alias("hot"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("hot").cast("long").alias("pos"),
            )
        )
        rows = sorted(
            (r["bucket"], r["n"], r["pos"]) for r in bins.collect()
        )  # ≤ bitlen(max cents) ≈ 24 buckets — bounded driver scalars
        # exact-fraction PAVA: pools are (S, C) pairs; violation test by
        # cross-multiplication, never a float division
        pools: list[list[int]] = []  # [S, C, n_buckets]
        for _b, n, pos in rows:
            pools.append([pos, n, 1])
            while len(pools) >= 2 and (
                pools[-2][0] * pools[-1][1]
                >= pools[-1][0] * pools[-2][1]
            ):
                s2, c2, m2 = pools.pop()
                pools[-1][0] += s2
                pools[-1][1] += c2
                pools[-1][2] += m2
        iso: list[int] = []
        for s, c, m in pools:
            iso.extend([1_000_000 * s // c] * m)
        out = [
            (b, n, pos, 1_000_000 * pos // n, iso_v)
            for (b, n, pos), iso_v in zip(rows, iso)
        ]
        return spark.createDataFrame(
            out, "bucket long, n long, pos long, raw_ppm long, iso_ppm long"
        )


_register_q392()


# ---------------------------------------------------------------------------
# q393 — PAIRED PERMUTATION TEST by deterministic sign-flips (Fisher
# 1935's randomization test — the distribution-free significance gate
# that needs NO normal approximation, so no erf/Φ and nothing
# unportable): did per-customer spend change from 1995 to 1996? The
# null "no change" is exchangeable under sign-flips of the paired
# differences; the test compares the observed |Σ dᵢ| against B = 64
# resampled |Σ ±dᵢ|.
#
# Determinism: flip b assigns pair i the sign 1 − 2·(md5(cust‖perm‖b)
# mod 2) — a pure function of (customer, b), identically replayable in
# DuckDB; p_permil = (1 + #{b : T_b ≥ T_obs})·1000 div (B+1), the
# standard add-one estimate, exact integers end to end (Σ|d| needs the
# q217 widening past ~10^18 cents, stated).
#
# Plan: one groupBy(customer) pivot builds the paired-diff frame (the
# only corpus shuffle); the 64 flips are a bounded literal explode
# (map-side), collapsing straight to the 64-group aggregate — partial
# aggregation makes the b-grain shuffle 64·P rows, nothing more. One
# summary row out.
# ---------------------------------------------------------------------------


def _register_q393() -> None:
    _b = 64

    @_register(
        "q393_permutation_test",
        oracle=f"""
        WITH pairs AS MATERIALIZED (
            SELECT o_custkey AS cust,
                   CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                            THEN FLOOR(o_totalprice * 100) ELSE 0 END)
                        - SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                              THEN FLOOR(o_totalprice * 100) ELSE 0 END)
                        AS BIGINT) AS d
            FROM orders
            WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
            GROUP BY o_custkey
            HAVING SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                       THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                       THEN 1 ELSE 0 END) > 0
        ),
        obs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(abs(SUM(d)) AS BIGINT) AS t_obs
            FROM pairs
        ),
        flips AS (
            SELECT b.b,
                   CAST(abs(SUM((1 - 2 * (CAST('0x' || substr(md5(
                       CAST(p.cust AS VARCHAR) || 'perm'
                       || CAST(b.b AS VARCHAR)), 1, 15) AS BIGINT) % 2))
                       * p.d)) AS BIGINT) AS t_b
            FROM pairs p
            CROSS JOIN (SELECT unnest(generate_series(1, {_b})) AS b) b
            GROUP BY b.b
        )
        SELECT o.n_pairs, o.t_obs,
               CAST(SUM(CASE WHEN f.t_b >= o.t_obs THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ge,
               CAST((1 + SUM(CASE WHEN f.t_b >= o.t_obs THEN 1 ELSE 0 END))
                    * 1000 // {_b + 1} AS BIGINT) AS p_permil
        FROM flips f CROSS JOIN obs o
        GROUP BY o.n_pairs, o.t_obs
        """,
    )
    def q393_permutation_test(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Sign-flip permutation test on paired 1995→1996 customer
        spend diffs, B=64 md5 flips, exact-integer p. See block
        comment."""
        o = load_table(spark, "orders", sf_dir)
        yr = F.year("o_orderdate")
        pairs = (
            o.filter(yr.isin(1995, 1996))
            .groupBy(F.col("o_custkey").alias("cust"))
            .agg(
                (
                    F.sum(F.when(yr == 1996,
                                 F.floor(F.col("o_totalprice") * 100))
                          .otherwise(0))
                    - F.sum(F.when(yr == 1995,
                                   F.floor(F.col("o_totalprice") * 100))
                            .otherwise(0))
                ).cast("long").alias("d"),
                F.sum(F.when(yr == 1996, 1).otherwise(0)).alias("n96"),
                F.sum(F.when(yr == 1995, 1).otherwise(0)).alias("n95"),
            )
            .filter((F.col("n96") > 0) & (F.col("n95") > 0))
            .select("cust", "d")
            .transform(materialize)  # feeds the observed agg AND 64 flips
        )
        obs = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.abs(F.sum("d")).cast("long").alias("t_obs"),
        )
        sign = 1 - 2 * (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("cust").cast("string"), F.lit("perm"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("bigint") % 2
        )
        flips = (
            pairs.select(
                "cust", "d",
                F.explode(
                    F.array(*[F.lit(i) for i in range(1, _b + 1)])
                ).alias("b"),
            )
            .groupBy("b")
            .agg(F.abs(F.sum(sign * F.col("d"))).cast("long").alias("t_b"))
        )
        return (
            flips.crossJoin(F.broadcast(obs))  # 1-row scalar broadcast
            .groupBy("n_pairs", "t_obs")
            .agg(
                F.sum(
                    F.when(F.col("t_b") >= F.col("t_obs"), 1).otherwise(0)
                ).cast("long").alias("n_ge"),
            )
            .select(
                "n_pairs", "t_obs", "n_ge",
                F.expr(
                    f"CAST((1 + n_ge) * 1000 div {_b + 1} AS BIGINT)"
                ).alias("p_permil"),
            )
        )


_register_q393()


# ---------------------------------------------------------------------------
# q394 — AUTOCORRELATION FUNCTION panel (Box & Jenkins 1970's model-
# identification plot): r_l for lags 1..14 over the daily order-count
# series — the diagnostic read before picking q384's seasonal-naive-7
# (a spike at lag 7 is WHY that baseline exists; the free cross-check
# the pytest pins is r_7 > r_6, r_8 on this seasonal corpus... if the
# synthetic series carries weekly structure — asserted only as data
# allows, the recompute is the real law).
#
# Exact integers: clear the mean by multiplying through by n —
# deviation_t = n·x_t − S (S = Σx, n = #days), so
#     r_l = Σ_{t>l} dev_t·dev_{t−l} · 1000 div Σ_t dev_t²
# is ONE truncating division per lag (toward zero on negative
# numerators — Spark div ≡ DuckDB //); n·x ≲ 2.5e7 at sf100 keeps the
# products inside int64 with the q217 widening note past that.
# Gapped days simply drop pairs (calendar-lag join), identically in
# both engines — stated, not hidden.
#
# Plan: one groupBy(day) scan; (n, S, den) fold into literals from one
# 1-row aggregate (the q331 literal-scalar device); 14 lags as a
# bounded literal explode → one equi-join back on the lagged date →
# 14-group aggregate. Two jobs, one corpus pass each.
# ---------------------------------------------------------------------------


def _register_q394() -> None:
    _lags = 14

    @_register(
        "q394_acf_panel",
        oracle=f"""
        WITH daily AS MATERIALIZED (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        sc AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        dev AS MATERIALIZED (
            SELECT d, sc.n * x - sc.s AS dv FROM daily CROSS JOIN sc
        ),
        den AS (SELECT CAST(SUM(dv * dv) AS BIGINT) AS den FROM dev)
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(a.dv * b.dv) * 1000 // MAX(den.den) AS BIGINT)
                   AS acf_permil
        FROM (SELECT unnest(generate_series(1, {_lags})) AS lag) l
        JOIN dev a ON TRUE
        JOIN dev b ON b.d = a.d - CAST(l.lag AS INTEGER)
        CROSS JOIN den
        GROUP BY l.lag
        """,
    )
    def q394_acf_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact-permil ACF at lags 1..14 over the daily order series.
        See block comment."""
        o = load_table(spark, "orders", sf_dir)
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("x")
        ).transform(materialize)  # feeds the scalar fold AND both sides
        sc = daily.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("s"),
        ).collect()[0]  # 1-row corpus scalars — literal fold, no crossJoin
        n, s = int(sc["n"]), int(sc["s"])
        dev = daily.select(
            "d", (F.lit(n) * F.col("x") - F.lit(s)).alias("dv")
        ).transform(materialize)  # feeds den AND the 14-lag join
        den = int(
            dev.agg(F.sum(F.col("dv") * F.col("dv")).alias("den"))
            .collect()[0]["den"]
        )
        lagged = dev.select(
            "d", F.col("dv").alias("adv"),
            F.explode(
                F.array(*[F.lit(i) for i in range(1, _lags + 1)])
            ).alias("lag"),
        ).select(
            "lag", "adv", F.date_sub(F.col("d"), F.col("lag")).alias("ld")
        )
        return (
            lagged.join(
                dev.select(F.col("d").alias("ld"), F.col("dv").alias("bdv")),
                "ld",
            )
            .groupBy("lag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.expr(
                    f"CAST(SUM(adv * bdv) * 1000 div {den}L AS BIGINT)"
                ).alias("acf_permil"),
            )
            .select(F.col("lag").cast("long").alias("lag"),
                    "n_pairs", "acf_permil")
        )


_register_q394()


# ---------------------------------------------------------------------------
# q395 — RFM SEGMENTATION (Hughes 1994; the classic retail-CRM
# customer partition the GlobalRetail star schema exists to serve):
# score every ordering customer 1..5 on Recency (days since last
# order, vs the corpus max date), Frequency (order count) and
# Monetary (floor-cents lifetime spend), then census the ≤125
# (r,f,m) cells — quintile 1 is BEST on each axis (most recent /
# most frequent / highest spend; stated, not implied).
#
# Quintiles are NTILE over the full customer grain — a partition-less
# rank by definition — so each axis uses the two-phase
# operators/ranks.global_row_number (range-shard offsets + partitioned
# window; the q141 NTILE reconstruction) under a TOTAL order
# (tie-break custkey), and the quintile is the exact integer
# 5·(rank−1) div n + 1. No global window anywhere; ranks are
# hash-identical to the single-window form by the ranks.py property
# tests.
#
# Plan: one groupBy(custkey) over orders (the only corpus shuffle),
# the corpus max date folded in as a driver literal, three two-phase
# ranks over the customer-grain frame (materialized once), one
# ≤125-cell census.
# ---------------------------------------------------------------------------


def _register_q395() -> None:
    @_register(
        "q395_rfm_segmentation",
        oracle="""
        WITH per AS MATERIALIZED (
            SELECT o_custkey AS cust,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                             (SELECT MAX(CAST(o_orderdate AS DATE))
                              FROM orders)) AS rec,
                   COUNT(*) AS freq,
                   CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT) AS mon
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT mon,
                   ROW_NUMBER() OVER (ORDER BY rec, cust) AS rr,
                   ROW_NUMBER() OVER (ORDER BY freq DESC, cust) AS fr,
                   ROW_NUMBER() OVER (ORDER BY mon DESC, cust) AS mr,
                   COUNT(*) OVER () AS n
            FROM per
        )
        SELECT CAST(5 * (rr - 1) // n + 1 AS BIGINT) AS r_q,
               CAST(5 * (fr - 1) // n + 1 AS BIGINT) AS f_q,
               CAST(5 * (mr - 1) // n + 1 AS BIGINT) AS m_q,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(mon) AS BIGINT) AS monetary_cents
        FROM ranked
        GROUP BY 1, 2, 3
        """,
    )
    def q395_rfm_segmentation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """≤125-cell RFM quintile census over ordering customers;
        two-phase ranks, quintile 1 = best. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        ref = o.agg(
            F.max(F.to_date("o_orderdate")).alias("mx")
        ).collect()[0]["mx"]  # 1-row corpus scalar — literal fold
        per = o.groupBy(F.col("o_custkey").alias("cust")).agg(
            F.datediff(F.lit(ref), F.max(F.to_date("o_orderdate")))
            .cast("long").alias("rec"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long")
            .alias("mon"),
        ).transform(materialize)  # feeds all three two-phase ranks
        ranked, n = global_row_number(
            per, [("rec", "asc"), ("cust", "asc")], out="rr"
        )
        ranked, _ = global_row_number(
            ranked, [("freq", "desc"), ("cust", "asc")], out="fr"
        )
        ranked, _ = global_row_number(
            ranked, [("mon", "desc"), ("cust", "asc")], out="mr"
        )
        q = "CAST(5 * ({col} - 1) div {n}L + 1 AS BIGINT)"
        return (
            ranked.select(
                F.expr(q.format(col="rr", n=n)).alias("r_q"),
                F.expr(q.format(col="fr", n=n)).alias("f_q"),
                F.expr(q.format(col="mr", n=n)).alias("m_q"),
                "mon",
            )
            .groupBy("r_q", "f_q", "m_q")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_customers"),
                F.sum("mon").cast("long").alias("monetary_cents"),
            )
        )


_register_q395()


# ---------------------------------------------------------------------------
# q397 — BENJAMINI–HOCHBERG FDR over a family of permutation tests
# (Benjamini & Hochberg 1995 — THE multiple-testing correction of
# every modern experimentation / genomics pipeline): q393 runs ONE
# paired test; a real metrics review runs one per nation and must
# control the false-discovery rate across all 25. Each nation gets
# q393's sign-flip test (B = 32 flips, salt 'bh'); BH then rejects the
# k* smallest p-values where k* = max{k : p_(k)·m ≤ k·α}, α = 20%.
#
# Exact integers throughout: p_j = (1 + n_ge_j)/(B+1) is never
# divided — the BH condition is cross-multiplied,
#     (1 + n_ge_(k)) · m · 1000 ≤ k · α_permil · (B+1),
# and the p-ranking uses the total order (n_ge, nation). The step-up
# "max k" makes rejection non-monotone in isolation, so it is computed
# ONCE from the ranked list, never per-row independently.
#
# Plan: one orders scan → (nation, cust) paired diffs (the q393
# device, one shuffle); 33 legs (b = 0 is the observed statistic) as
# a bounded literal explode collapsing map-side to the (nation, b)
# grain; per-nation stats are ≤ 25 driver rows (q343 class) where the
# BH step-up runs in Python; the oracle replays it with a ranked CTE.
# ---------------------------------------------------------------------------


def _register_q397() -> None:
    _b = 32
    _alpha = 200  # permil

    @_register(
        "q397_bh_fdr",
        oracle=f"""
        WITH pairs AS MATERIALIZED (
            SELECT c.c_nationkey AS nat, o.o_custkey AS cust,
                   CAST(SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate)
                                      = 1996
                            THEN FLOOR(o.o_totalprice * 100) ELSE 0 END)
                        - SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate)
                                        = 1995
                              THEN FLOOR(o.o_totalprice * 100) ELSE 0 END)
                        AS BIGINT) AS d
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
            GROUP BY c.c_nationkey, o.o_custkey
            HAVING SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                       THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1995
                       THEN 1 ELSE 0 END) > 0
        ),
        stats AS MATERIALIZED (
            SELECT p.nat, b.b,
                   CAST(abs(SUM((CASE WHEN b.b = 0 THEN 1
                                 ELSE 1 - 2 * (CAST('0x' || substr(md5(
                                     CAST(p.cust AS VARCHAR) || 'bh'
                                     || CAST(b.b AS VARCHAR)), 1, 15)
                                     AS BIGINT) % 2) END) * p.d))
                        AS BIGINT) AS t
            FROM pairs p
            CROSS JOIN (SELECT unnest(generate_series(0, {_b})) AS b) b
            GROUP BY p.nat, b.b
        ),
        obs AS (SELECT nat, t AS t_obs FROM stats WHERE b = 0),
        pernat AS MATERIALIZED (
            SELECT s.nat,
                   CAST(MAX(o.t_obs) AS BIGINT) AS t_obs,
                   CAST(SUM(CASE WHEN s.b > 0 AND s.t >= o.t_obs
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
            FROM stats s JOIN obs o ON o.nat = s.nat
            GROUP BY s.nat
        ),
        np AS (
            SELECT nat,
                   (SELECT COUNT(*) FROM pairs p WHERE p.nat = x.nat)
                       AS n_pairs
            FROM (SELECT DISTINCT nat FROM pernat) x
        ),
        ranked AS MATERIALIZED (
            SELECT pn.nat, np.n_pairs, pn.t_obs, pn.n_ge,
                   CAST((1 + pn.n_ge) * 1000 // {_b + 1} AS BIGINT)
                       AS p_permil,
                   ROW_NUMBER() OVER (ORDER BY pn.n_ge, pn.nat)
                       AS bh_rank,
                   COUNT(*) OVER () AS m
            FROM pernat pn JOIN np ON np.nat = pn.nat
        ),
        kstar AS (
            SELECT COALESCE(MAX(bh_rank), 0) AS k
            FROM ranked
            WHERE (1 + n_ge) * m * 1000 <= bh_rank * {_alpha} * {_b + 1}
        )
        SELECT r.nat AS nation, r.n_pairs, r.t_obs, r.n_ge, r.p_permil,
               CAST(r.bh_rank AS BIGINT) AS bh_rank,
               CAST(CASE WHEN r.bh_rank <= k.k THEN 1 ELSE 0 END
                    AS BIGINT) AS rejected
        FROM ranked r CROSS JOIN kstar k
        """,
    )
    def q397_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-nation sign-flip permutation tests with BH step-up FDR
        control at alpha = 20%. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        c = load_table(spark, "customer", sf_dir)
        yr = F.year("o_orderdate")
        pairs = (
            o.filter(yr.isin(1995, 1996))
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_nationkey").alias("nat"),
                F.col("o_custkey").alias("cust"),
            )
            .agg(
                (
                    F.sum(F.when(yr == 1996,
                                 F.floor(F.col("o_totalprice") * 100))
                          .otherwise(0))
                    - F.sum(F.when(yr == 1995,
                                   F.floor(F.col("o_totalprice") * 100))
                            .otherwise(0))
                ).cast("long").alias("d"),
                F.sum(F.when(yr == 1996, 1).otherwise(0)).alias("n96"),
                F.sum(F.when(yr == 1995, 1).otherwise(0)).alias("n95"),
            )
            .filter((F.col("n96") > 0) & (F.col("n95") > 0))
            .select("nat", "cust", "d")
            .transform(materialize)  # feeds flips AND per-nation counts
        )
        sign = F.when(F.col("b") == 0, F.lit(1)).otherwise(
            1 - 2 * (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("cust").cast("string"),
                                       F.lit("bh"),
                                       F.col("b").cast("string"))),
                        1, 15,
                    ),
                    16, 10,
                ).cast("bigint") % 2
            )
        )
        stats = (
            pairs.select(
                "nat", "cust", "d",
                F.explode(
                    F.array(*[F.lit(i) for i in range(0, _b + 1)])
                ).alias("b"),
            )
            .groupBy("nat", "b")
            .agg(F.abs(F.sum(sign * F.col("d"))).cast("long").alias("t"))
        )
        counts = {
            r["nat"]: r["n"]
            for r in pairs.groupBy("nat")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        per: dict[int, dict[str, int]] = {}
        for r in stats.collect():  # ≤ |nations|·33 bounded driver rows
            per.setdefault(r["nat"], {})[r["b"]] = r["t"]
        rows = []
        for nat, ts in per.items():
            t_obs = ts[0]
            n_ge = sum(1 for b, t in ts.items() if b > 0 and t >= t_obs)
            rows.append((nat, counts[nat], t_obs, n_ge))
        rows.sort(key=lambda r: (r[3], r[0]))  # total order (n_ge, nat)
        m = len(rows)
        kstar = 0
        for k, (_nat, _np, _t, n_ge) in enumerate(rows, start=1):
            if (1 + n_ge) * m * 1000 <= k * _alpha * (_b + 1):
                kstar = k
        out = [
            (nat, np_, t_obs, n_ge, (1 + n_ge) * 1000 // (_b + 1), k,
             int(k <= kstar))
            for k, (nat, np_, t_obs, n_ge) in enumerate(rows, start=1)
        ]
        return spark.createDataFrame(
            out,
            "nation long, n_pairs long, t_obs long, n_ge long,"
            " p_permil long, bh_rank long, rejected long",
        )


_register_q397()


# ---------------------------------------------------------------------------
# q402 — BURST SEGMENTATION by two-state Viterbi (Kleinberg 2002's
# burst automaton, with the probabilistic emission replaced by an
# integer L1 cost so every cost, comparison and tie-break is exact):
# segment the WEEKLY order series into baseline / burst regimes — the
# trend-detection read over the same series q394 diagnoses and q384
# forecasts. States: baseline rate mu0 = S div T, burst rate
# mu1 = 3*mu0 div 2 + 1; emission cost |x_t − mu_state|; entering the
# burst state costs gamma = mu0 div 2 (leaving and staying are free —
# the Kleinberg asymmetry that yields few, coherent bursts: 5
# segments / 3 burst weeks at sf0.01, measured). Week grain, not day:
# the oracle's recursive DP costs one round per step, and 345 weekly
# rounds run in seconds where 2400 daily rounds measured 90 s.
#
# Determinism: ties are PINNED — into state 0 prefer predecessor 0,
# into state 1 prefer STAYING, final tie prefers 0 (all expressed as
# <= in both engines). The DP is inherently sequential over the
# BOUNDED week grain (the q385/q343 driver-fold class); the oracle
# replays it as a recursive CTE that carries the FORWARD best-path
# string per state (no backward pass needed), then gaps-and-islands
# the winning string into segments.
#
# Plan: one groupBy(week) corpus pass; everything after is algebra on
# ≤ span-weeks rows.
# ---------------------------------------------------------------------------


def _register_q402() -> None:
    @_register(
        "q402_burst_segmentation",
        oracle="""
        WITH RECURSIVE weekly AS MATERIALIZED (
            SELECT date_diff('day', DATE '1970-01-05',
                             CAST(o_orderdate AS DATE)) // 7 AS w,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        idx AS MATERIALIZED (
            SELECT w, x, ROW_NUMBER() OVER (ORDER BY w) AS rn
            FROM weekly
        ),
        par AS MATERIALIZED (
            SELECT SUM(x) // COUNT(*) AS mu0,
                   3 * (SUM(x) // COUNT(*)) // 2 + 1 AS mu1,
                   (SUM(x) // COUNT(*)) // 2 AS gam,
                   COUNT(*) AS t
            FROM weekly
        ),
        dp AS (
            SELECT i.rn,
                   abs(i.x - p.mu0) AS c0,
                   abs(i.x - p.mu1) + p.gam AS c1,
                   '0' AS p0, '1' AS p1
            FROM idx i CROSS JOIN par p WHERE i.rn = 1
            UNION ALL
            SELECT i.rn,
                   abs(i.x - p.mu0)
                       + CASE WHEN dp.c0 <= dp.c1 THEN dp.c0
                         ELSE dp.c1 END,
                   abs(i.x - p.mu1)
                       + CASE WHEN dp.c1 <= dp.c0 + p.gam THEN dp.c1
                         ELSE dp.c0 + p.gam END,
                   (CASE WHEN dp.c0 <= dp.c1 THEN dp.p0
                    ELSE dp.p1 END) || '0',
                   (CASE WHEN dp.c1 <= dp.c0 + p.gam THEN dp.p1
                    ELSE dp.p0 END) || '1'
            FROM dp JOIN idx i ON i.rn = dp.rn + 1
            CROSS JOIN par p
        ),
        best AS MATERIALIZED (
            SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
            FROM dp CROSS JOIN par p WHERE dp.rn = p.t
        ),
        states AS MATERIALIZED (
            SELECT i.w, i.x,
                   CAST(SUBSTRING(b.path, CAST(i.rn AS INTEGER), 1)
                        AS BIGINT) AS st,
                   i.rn
            FROM idx i CROSS JOIN best b
        ),
        isl AS MATERIALIZED (
            SELECT w, x, st, rn,
                   rn - ROW_NUMBER() OVER (
                       PARTITION BY st ORDER BY rn) AS grp
            FROM states
        ),
        segs AS (
            SELECT st, CAST(MIN(w) AS BIGINT) AS w_start,
                   CAST(MAX(w) AS BIGINT) AS w_end,
                   CAST(COUNT(*) AS BIGINT) AS n_weeks,
                   CAST(SUM(x) AS BIGINT) AS total_x,
                   MIN(rn) AS first_rn
            FROM isl GROUP BY st, grp
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY first_rn) AS BIGINT)
                   AS seg_id,
               CAST(st AS BIGINT) AS state, w_start, w_end, n_weeks,
               total_x
        FROM segs
        """,
    )
    def q402_burst_segmentation(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Two-state integer-Viterbi burst segments over the weekly
        order series, pinned tie rules. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        weekly = sorted(
            (r["w"], r["x"])
            for r in o.groupBy(
                F.expr(
                    "CAST(datediff(to_date(o_orderdate),"
                    " DATE '1970-01-05') div 7 AS BIGINT)"
                ).alias("w")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("x"))
            .collect()  # bounded: ≤ span weeks (q385/q343 driver class)
        )
        xs = [x for _, x in weekly]
        t, s = len(xs), sum(xs)
        mu0 = s // t
        mu1 = 3 * mu0 // 2 + 1
        gam = mu0 // 2
        c0, c1 = abs(xs[0] - mu0), abs(xs[0] - mu1) + gam
        back: list[tuple[int, int]] = []
        for x in xs[1:]:
            p0 = 0 if c0 <= c1 else 1
            n0 = abs(x - mu0) + min(c0, c1)
            p1 = 1 if c1 <= c0 + gam else 0
            n1 = abs(x - mu1) + min(c1, c0 + gam)
            back.append((p0, p1))
            c0, c1 = n0, n1
        st = 0 if c0 <= c1 else 1
        path = [st]
        for b in reversed(back):
            st = b[st]
            path.append(st)
        path.reverse()
        out = []
        seg_start = 0
        for i in range(1, t + 1):
            if i == t or path[i] != path[i - 1]:
                out.append(
                    (
                        len(out) + 1, path[seg_start],
                        weekly[seg_start][0], weekly[i - 1][0],
                        i - seg_start,
                        sum(xs[seg_start:i]),
                    )
                )
                seg_start = i
        return spark.createDataFrame(
            out,
            "seg_id long, state long, w_start long, w_end long,"
            " n_weeks long, total_x long",
        )


_register_q402()


# ---------------------------------------------------------------------------
# q404 — VALUE-AT-RISK / EXPECTED SHORTFALL panel (Artzner et al.
# 1999 made ES the coherent risk measure; Basel's FRTB moved bank
# capital onto it): over the day-over-day change in total order
# revenue, report VaR and ES at 95% and 99% — "how bad is a bad day,
# and how bad is the average of the bad days". ES is the canonical
# example of a statistic the AVERAGE-of-quantiles crowd gets wrong;
# here both are EXACT order statistics / tail means in floor-cents.
#
# Exact contract: losses = −Δrevenue (positive = bad); tail sizes
# k_95 = ⌈n/20⌉, k_99 = ⌈n/100⌉ (nearest-rank, ceil); ONE bounded
# top-k (TakeOrderedAndProject via global_topk, k = k_95 ⊇ k_99)
# yields both levels: VaR_α = the k_α-th largest loss, ES_α =
# truncating mean of the top k_α. Total order (loss DESC, day ASC).
#
# Plan: one groupBy(day) corpus pass → day-grain deltas via a
# 1-day-lag equi-join (no window at all), one global_topk, 2-row
# panel assembled from ≤k driver rows (q343 class).
# ---------------------------------------------------------------------------


def _register_q404() -> None:
    @_register(
        "q404_var_expected_shortfall",
        oracle="""
        WITH daily AS MATERIALIZED (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ),
        deltas AS MATERIALIZED (
            SELECT t.d, p.rev - t.rev AS loss
            FROM daily t JOIN daily p ON p.d = t.d - 1
        ),
        n AS (SELECT COUNT(*) AS n FROM deltas),
        ranked AS MATERIALIZED (
            SELECT loss, ROW_NUMBER() OVER (ORDER BY loss DESC, d) AS rn
            FROM deltas
        )
        SELECT CAST(lvl AS BIGINT) AS level_pct,
               CAST(n.n AS BIGINT) AS n_days,
               CAST(k AS BIGINT) AS tail_k,
               CAST((SELECT loss FROM ranked WHERE rn = k)
                    AS BIGINT) AS var_cents,
               CAST((SELECT SUM(loss) // k FROM ranked WHERE rn <= k)
                    AS BIGINT) AS es_cents
        FROM (
            SELECT 95 AS lvl, (n.n + 19) // 20 AS k FROM n
            UNION ALL
            SELECT 99, (n.n + 99) // 100 FROM n
        ) CROSS JOIN n
        """,
    )
    def q404_var_expected_shortfall(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Exact nearest-rank VaR + tail-mean ES at 95/99% over daily
        revenue losses. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long")
            .alias("rev")
        ).transform(materialize)  # feeds both sides of the lag join
        deltas = (
            daily.alias("t")
            .join(
                daily.select(
                    F.date_add(F.col("d"), 1).alias("d"),
                    F.col("rev").alias("prev"),
                ).alias("p"),
                "d",
            )
            .select("d", (F.col("prev") - F.col("rev")).alias("loss"))
        )
        n = deltas.count()
        k95, k99 = (n + 19) // 20, (n + 99) // 100
        tail = global_topk(
            deltas, [("loss", "desc"), ("d", "asc")], k95, out="rn"
        ).select("rn", "loss").collect()  # ≤ k_95 driver rows
        tail.sort(key=lambda r: r["rn"])
        losses = [r["loss"] for r in tail]
        out = []
        for lvl, k in ((95, k95), (99, k99)):
            out.append(
                (lvl, n, k, losses[k - 1], sum(losses[:k]) // k)
            )
        return spark.createDataFrame(
            out,
            "level_pct long, n_days long, tail_k long, var_cents long,"
            " es_cents long",
        )


_register_q404()


# ---------------------------------------------------------------------------
# q406 — SIMPLE EXPONENTIAL SMOOTHING forecast (Brown 1956; the third
# classical baseline family beside q384's naive/seasonal/MA and
# q402's regime segmentation): level l_t = α·x_t + (1−α)·l_{t−1} with
# α = 1/4 CLEARED — l_t = (x_t + 3·l_{t−1}) div 4, a truncating
# integer fold both engines replay identically (the q385 recurrence
# device; truncation bias < 1 count per step, stated). The forecast
# for day t is l_{t−1}; the panel scores SES against q384's naive-1
# on the SAME eval days (days 2..T), reporting Σ|e| and MAE.
#
# Weekly grain (the q402 lesson: recursive-CTE rounds cost wall time;
# 345 weeks, not 2400 days). Seeded l_1 = x_1.
#
# Plan: one groupBy(week) corpus pass; the fold runs over ≤ span-weeks
# driver rows; the oracle is a recursive CTE over the ROW_NUMBER
# index. Output: one row per model with exact error sums.
# ---------------------------------------------------------------------------


def _register_q406() -> None:
    @_register(
        "q406_exponential_smoothing",
        oracle="""
        WITH RECURSIVE weekly AS MATERIALIZED (
            SELECT date_diff('day', DATE '1970-01-05',
                             CAST(o_orderdate AS DATE)) // 7 AS w,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        idx AS MATERIALIZED (
            SELECT w, x, ROW_NUMBER() OVER (ORDER BY w) AS rn,
                   LAG(x) OVER (ORDER BY w) AS prev_x
            FROM weekly
        ),
        ses AS (
            SELECT rn, x AS lvl, CAST(0 AS BIGINT) AS err
            FROM idx WHERE rn = 1
            UNION ALL
            SELECT i.rn, (i.x + 3 * s.lvl) // 4,
                   s.err + abs(i.x - s.lvl)
            FROM ses s JOIN idx i ON i.rn = s.rn + 1
        ),
        fin AS (
            SELECT MAX(err) AS ses_err,
                   (SELECT COUNT(*) - 1 FROM weekly) AS n_eval
            FROM ses
        ),
        naive AS (
            SELECT CAST(SUM(abs(x - prev_x)) AS BIGINT) AS e
            FROM idx WHERE prev_x IS NOT NULL
        )
        SELECT model, n_eval, sum_abs_err,
               CAST(sum_abs_err * 1000 // n_eval AS BIGINT) AS mae_milli
        FROM (
            SELECT 'ses_q4' AS model, CAST(f.n_eval AS BIGINT) AS n_eval,
                   CAST(f.ses_err AS BIGINT) AS sum_abs_err
            FROM fin f
            UNION ALL
            SELECT 'naive1', CAST(f.n_eval AS BIGINT), n.e
            FROM fin f CROSS JOIN naive n
        )
        """,
    )
    def q406_exponential_smoothing(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """SES (alpha = 1/4, truncating integer fold) vs naive-1 over
        the weekly order series. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        weekly = sorted(
            (r["w"], r["x"])
            for r in o.groupBy(
                F.expr(
                    "CAST(datediff(to_date(o_orderdate),"
                    " DATE '1970-01-05') div 7 AS BIGINT)"
                ).alias("w")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("x"))
            .collect()  # bounded: ≤ span weeks (q385 driver class)
        )
        xs = [x for _, x in weekly]
        lvl = xs[0]
        ses_err = 0
        naive_err = 0
        for prev, x in zip(xs, xs[1:]):
            ses_err += abs(x - lvl)
            naive_err += abs(x - prev)
            lvl = (x + 3 * lvl) // 4
        n_eval = len(xs) - 1
        out = [
            ("ses_q4", n_eval, ses_err, ses_err * 1000 // n_eval),
            ("naive1", n_eval, naive_err, naive_err * 1000 // n_eval),
        ]
        return spark.createDataFrame(
            out,
            "model string, n_eval long, sum_abs_err long, mae_milli long",
        )


_register_q406()


# ---------------------------------------------------------------------------
# q409 — DAY-OF-WEEK SEASONAL INDEX (the ratio-to-overall decomposition
# read on every ops dashboard, and classical decomposition's seasonal
# component at weekly period — completing the series suite: q394
# diagnoses, q384/q389/q406 forecast, q402 segments, this PROFILES):
# for each day-of-week, how does its mean daily order count compare to
# the overall mean daily count?
#
# Exact contract: means are never divided — the index is ONE
# cross-multiplied truncation, idx_permil = S_d·D·1000 div (D_d·S)
# (S_d = orders on that dow, D_d = #days of that dow, S/D = overall).
# The cookbook's dayofweek trap is exercised head-on: Spark's
# dayofweek() is 1-based (Sun=1), DuckDB's is 0-based (Sun=0) — the
# oracle offsets by +1 so both emit the Spark convention.
#
# Plan: one groupBy(day) corpus pass → ≤7-row dow aggregate; (S, D)
# fold in as driver literals.
# ---------------------------------------------------------------------------


def _register_q409() -> None:
    @_register(
        "q409_dow_seasonal_index",
        oracle="""
        WITH daily AS MATERIALIZED (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(x) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS nd
            FROM daily
        ),
        dow AS (
            SELECT CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS n_orders
            FROM daily GROUP BY 1
        )
        SELECT w.dow, w.n_days, w.n_orders,
               CAST(w.n_orders * t.nd * 1000 // (w.n_days * t.s)
                    AS BIGINT) AS index_permil
        FROM dow w CROSS JOIN tot t
        """,
    )
    def q409_dow_seasonal_index(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-day-of-week order-rate index vs the overall daily mean,
        one cross-multiplied truncation. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("x")
        ).transform(materialize)  # feeds totals AND the dow rollup
        tot = daily.agg(
            F.sum("x").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        ).collect()[0]  # 1-row corpus scalars — literal fold
        s, nd = int(tot["s"]), int(tot["nd"])
        return (
            daily.groupBy(
                F.dayofweek("d").cast("long").alias("dow")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum("x").cast("long").alias("n_orders"),
            )
            .select(
                "dow", "n_days", "n_orders",
                F.expr(
                    f"CAST(n_orders * {nd}L * 1000"
                    f" div (n_days * {s}L) AS BIGINT)"
                ).alias("index_permil"),
            )
        )


_register_q409()


# ---------------------------------------------------------------------------
# q410 — DIFFERENCE-IN-DIFFERENCES (Card & Krueger 1994 made it the
# workhorse of applied causal inference; the third leg of this repo's
# experimentation stack — q357 CUPED reduces variance, q393/q397 test
# significance, THIS estimates a treatment effect under the parallel-
# trends assumption): did BUILDING-segment customers' mean order value
# move differently from MACHINERY's between 1995 (pre) and 1996
# (post)?
#
#     DiD = (m_treat,post − m_treat,pre) − (m_ctrl,post − m_ctrl,pre)
#
# Exact contract: the four cell means are never materialized as
# floats — DiD is ONE truncation of the exact rational
#     1e6·(S_tp·D/n_tp − S_tr·D/n_tr − S_cp·D/n_cp + S_cr·D/n_cr) / D,
# D = Π n, computed in driver Python ints (arbitrary precision) on the
# Spark side and HUGEINT-cast products in the oracle — int64 dies at
# ~1e21 here, the q400 lesson applied preemptively. Per-cell milli-
# cent means ride along as separate single truncations (display tier).
#
# Plan: one fact⨝dim scan → 4-cell aggregate (driver algebra, q343
# class). Sign-correct truncation toward zero in both engines.
# ---------------------------------------------------------------------------


def _register_q410() -> None:
    @_register(
        "q410_difference_in_differences",
        oracle="""
        WITH cells AS MATERIALIZED (
            SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'treat'
                        ELSE 'ctrl' END AS grp,
                   CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                        THEN 'post' ELSE 'pre' END AS period,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(FLOOR(o.o_totalprice * 100)) AS BIGINT) AS s
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
              AND EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
            GROUP BY 1, 2
        ),
        w AS (
            SELECT
                MAX(CASE WHEN grp='treat' AND period='post' THEN n END)
                    AS n_tp,
                MAX(CASE WHEN grp='treat' AND period='post' THEN s END)
                    AS s_tp,
                MAX(CASE WHEN grp='treat' AND period='pre' THEN n END)
                    AS n_tr,
                MAX(CASE WHEN grp='treat' AND period='pre' THEN s END)
                    AS s_tr,
                MAX(CASE WHEN grp='ctrl' AND period='post' THEN n END)
                    AS n_cp,
                MAX(CASE WHEN grp='ctrl' AND period='post' THEN s END)
                    AS s_cp,
                MAX(CASE WHEN grp='ctrl' AND period='pre' THEN n END)
                    AS n_cr,
                MAX(CASE WHEN grp='ctrl' AND period='pre' THEN s END)
                    AS s_cr
            FROM cells
        ),
        f AS (
            SELECT *,
                   CAST(n_tp AS HUGEINT) * n_tr * n_cp * n_cr AS d,
                   1000000 * (
                       CAST(s_tp AS HUGEINT) * n_tr * n_cp * n_cr
                       - CAST(s_tr AS HUGEINT) * n_tp * n_cp * n_cr
                       - CAST(s_cp AS HUGEINT) * n_tp * n_tr * n_cr
                       + CAST(s_cr AS HUGEINT) * n_tp * n_tr * n_cp
                   ) AS num
            FROM w
        )
        SELECT n_tp, n_tr, n_cp, n_cr,
               CAST(s_tp * 1000 // n_tp AS BIGINT) AS m_tp_milli,
               CAST(s_tr * 1000 // n_tr AS BIGINT) AS m_tr_milli,
               CAST(s_cp * 1000 // n_cp AS BIGINT) AS m_cp_milli,
               CAST(s_cr * 1000 // n_cr AS BIGINT) AS m_cr_milli,
               CAST(num // d AS BIGINT) AS did_micro_cents
        FROM f
        """,
    )
    def q410_difference_in_differences(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Exact single-truncation DiD of mean order value, BUILDING vs
        MACHINERY across 1995→1996. See block comment."""
        o = load_table(spark, "orders", sf_dir)
        c = load_table(spark, "customer", sf_dir)
        yr = F.year("o_orderdate")
        cells = {
            (r["grp"], r["period"]): (r["n"], r["s"])
            for r in (
                o.filter(yr.isin(1995, 1996))
                .join(c, o.o_custkey == c.c_custkey)
                .filter(
                    F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
                )
                .groupBy(
                    F.when(F.col("c_mktsegment") == "BUILDING", "treat")
                    .otherwise("ctrl").alias("grp"),
                    F.when(yr == 1996, "post").otherwise("pre")
                    .alias("period"),
                )
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(F.floor(F.col("o_totalprice") * 100))
                    .cast("long").alias("s"),
                )
                .collect()  # exactly 4 cells — driver algebra
            )
        }
        n_tp, s_tp = cells[("treat", "post")]
        n_tr, s_tr = cells[("treat", "pre")]
        n_cp, s_cp = cells[("ctrl", "post")]
        n_cr, s_cr = cells[("ctrl", "pre")]
        d = n_tp * n_tr * n_cp * n_cr
        num = 1_000_000 * (
            s_tp * n_tr * n_cp * n_cr
            - s_tr * n_tp * n_cp * n_cr
            - s_cp * n_tp * n_tr * n_cr
            + s_cr * n_tp * n_tr * n_cp
        )
        did = abs(num) // d * (1 if num >= 0 else -1)  # trunc toward 0
        row = (
            n_tp, n_tr, n_cp, n_cr,
            s_tp * 1000 // n_tp, s_tr * 1000 // n_tr,
            s_cp * 1000 // n_cp, s_cr * 1000 // n_cr,
            did,
        )
        return spark.createDataFrame(
            [row],
            "n_tp long, n_tr long, n_cp long, n_cr long,"
            " m_tp_milli long, m_tr_milli long, m_cp_milli long,"
            " m_cr_milli long, did_micro_cents long",
        )


_register_q410()


# ---------------------------------------------------------------------------
# q411 — HERFINDAHL–HIRSCHMAN concentration INDEX (Herfindahl 1950 /
# Hirschman 1945; the DOJ/FTC merger-review statistic, read directly
# against their published 1500/2500 thresholds): per nation, how
# concentrated is order revenue across that nation's customers?
# Beside q175's Gini (inequality of the distribution) and q104's skew
# profiler (top-k shares), HHI is the share-of-squares market measure
# with REGULATORY cut points — so the panel also emits the DOJ class.
#
# Exact contract: shares are never divided — HHI in basis points is
#     hhi_bp = Σ_i s_i² · 104 div S²  =  (Σ s_i²) · 10000 div S²
# with s_i, S in floor-cents. s_i² and S² overflow int64 past ~3e9
# cents (~$30 M per customer / per nation), so both sums run widened:
# DECIMAL(38,0) per-term casts on the Spark side, HUGEINT casts in
# DuckDB (the q400/q410 discipline). The 1/N lower bound rides along
# (equal-share floor: 10000 div n).
#
# Plan: one fact scan → (nation, customer) grain → one re-aggregate to
# the ≤25-nation panel; both aggregates map-side combinable.
# ---------------------------------------------------------------------------


def _register_q411() -> None:
    @_register(
        "q411_hhi_concentration",
        oracle="""
        WITH per_cust AS (
            SELECT c.c_nationkey AS nat, o.o_custkey AS cust,
                   CAST(SUM(FLOOR(o.o_totalprice * 100)) AS BIGINT) AS s
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        panel AS (
            SELECT nat, CAST(COUNT(*) AS BIGINT) AS n_cust,
                   SUM(CAST(s AS HUGEINT)) AS tot,
                   SUM(CAST(s AS HUGEINT) * s) AS sumsq
            FROM per_cust GROUP BY nat
        )
        SELECT CAST(nat AS BIGINT) AS nation, n_cust,
               CAST(tot AS BIGINT) AS revenue_cents,
               CAST(sumsq * 10000 // (tot * tot) AS BIGINT) AS hhi_bp,
               CAST(10000 // n_cust AS BIGINT) AS floor_bp,
               CASE WHEN sumsq * 10000 // (tot * tot) >= 2500
                    THEN 'high'
                    WHEN sumsq * 10000 // (tot * tot) >= 1500
                    THEN 'moderate'
                    ELSE 'unconcentrated' END AS doj_class
        FROM panel
        """,
    )
    def q411_hhi_concentration(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-nation customer-revenue HHI in basis points with the
        DOJ classification and the equal-share floor. See block
        comment."""
        o = load_table(spark, "orders", sf_dir)
        c = load_table(spark, "customer", sf_dir)
        per_cust = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                F.col("c_nationkey").alias("nat"),
                F.col("o_custkey").alias("cust"),
            )
            .agg(
                F.sum(F.floor(F.col("o_totalprice") * 100)).cast("long")
                .alias("s")
            )
        )
        panel = per_cust.groupBy("nat").agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum(F.col("s").cast("decimal(38,0)")).alias("tot"),
            F.sum(
                F.col("s").cast("decimal(19,0)")
                * F.col("s").cast("decimal(19,0)")
            ).alias("sumsq"),
        )
        return panel.select(
            F.col("nat").cast("long").alias("nation"),
            "n_cust",
            F.col("tot").cast("long").alias("revenue_cents"),
            F.expr(
                "CAST(sumsq * 10000 div (tot * tot) AS BIGINT)"
            ).alias("hhi_bp"),
            F.expr("CAST(10000 div n_cust AS BIGINT)").alias("floor_bp"),
            F.expr(
                "CASE WHEN CAST(sumsq * 10000 div (tot * tot) AS BIGINT)"
                " >= 2500 THEN 'high'"
                " WHEN CAST(sumsq * 10000 div (tot * tot) AS BIGINT)"
                " >= 1500 THEN 'moderate'"
                " ELSE 'unconcentrated' END"
            ).alias("doj_class"),
        )


_register_q411()
