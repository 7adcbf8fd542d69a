"""The relational query surface (SURVEY.md §2 → §7.6), oracle-paired.

Every public query here has two faces kept in lockstep:

- a PySpark builder ``(spark, sf_dir) -> DataFrame`` registered in QUERIES;
- an ANSI-SQL string in ORACLE that DuckDB runs over the same parquet —
  the driver hash-compares the two (row count + schema + order-insensitive
  value hash).

Numeric-stability contract (load-bearing): floating-point SUM/AVG is not
associative, and both Spark (partition order) and DuckDB (vectorized chunks)
sum in engine-defined order. Every FP aggregate therefore goes through an
exact DECIMAL sum — per-row doubles are bit-identical in both engines (IEEE),
the cast to DECIMAL(p,6+) is deterministic, the decimal sum is exact and
order-independent, and the final cast back to DOUBLE is deterministic. Sums
of integers (and of integer-valued doubles < 2^53) are exact as-is and skip
the dance.

Derived integer columns are cast to BIGINT on both sides (Spark year() is
INT, DuckDB year() is BIGINT — schema compare must see one type).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.functions.dates import PT_DAY_NAMES, PT_MONTH_NAMES
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


# InferFiltersFromGenerate synthesizes `size(arr) > 0 AND isnotnull(arr)`
# ahead of every inner explode, and predicate pushdown then CLONES the
# generator's input expression into that filter — an expensive array
# builder (HOF transform + md5 chains, shingles, minhash signatures) is
# evaluated 3x per row instead of once (measured 13x wall on q239's span
# explode, 6.7 s -> 0.5 s). The rule's only benefit is short-circuiting
# empty-array rows at the generator itself — never a shuffle reduction —
# so the engine excludes it session-wide.
_EXCLUDED_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def pin_generate_posture(spark: SparkSession) -> None:
    """Append the engine's excluded optimizer rules to the session
    (idempotent; preserves rules excluded by the caller)."""
    try:
        cur = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        cur = None
    if not cur:
        spark.conf.set("spark.sql.optimizer.excludedRules", _EXCLUDED_RULES)
    elif _EXCLUDED_RULES not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", cur + "," + _EXCLUDED_RULES
        )


def make_query_decorator(queries_dict: dict, oracle_dict: dict):
    """Build a ``@query(name, oracle=...)`` decorator that registers into the
    given dicts — each operator family keeps its own registry and
    plans/registry.py merges them."""

    def query(name: str, oracle: str | None = None):
        def deco(fn):
            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                # The driver hands us its own session; pin the posture that
                # matters for oracle parity (UTC timestamps) and plan cost
                # (generator-filter cloning) at runtime.
                spark.conf.set("spark.sql.session.timeZone", "UTC")
                pin_generate_posture(spark)
                return fn(spark, sf_dir)

            wrapped.__name__ = name
            wrapped.__doc__ = fn.__doc__
            queries_dict[name] = wrapped
            if oracle is not None:
                oracle_dict[name] = oracle
            return wrapped

        return deco

    return query


query = make_query_decorator(QUERIES, ORACLE)


def dsum(col, alias: str, scale: int = 6):
    """Order-independent FP sum: double → DECIMAL(27,scale) → exact sum →
    double. See module docstring."""
    return (
        F.sum(col.cast(f"decimal(27,{scale})")).cast("double").alias(alias)
    )


def davg(col, alias: str, scale: int = 6):
    """Order-independent FP mean: exact decimal sum / count, divided as
    doubles (deterministic)."""
    return (
        F.sum(col.cast(f"decimal(27,{scale})")).cast("double")
        / F.count(col)
    ).alias(alias)


def _osum(expr: str, alias: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE) AS {alias}"


def _oavg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# q01 — flagship: revenue by region (SURVEY.md §7.2).
# Exercises S1 parquet scans, J1 inner join, J2 broadcast dim joins, F12
# measure arithmetic, grouped agg. The testdata transposition of the
# reference's fact assembly + the grouped-sum analytics the DW exists for.
# ---------------------------------------------------------------------------


@query(
    "q01_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           {rev},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """.format(rev=_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")),
)
def q01_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⨝ orders ⨝ customer ⨝ nation ⨝ region → Σ revenue by region.

    Scale notes: nation/region are broadcast (hinted — they are always tiny);
    customer⨝orders⨝lineitem shuffle on their keys with AQE free to switch
    strategy; partial aggregation (map-side combine) halves the final
    shuffle. Only the 4 needed lineitem columns reach the scan.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# P2 distinct projection (etl_completo.py:154-158 analog).
# ---------------------------------------------------------------------------


@query(
    "q02_distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def q02_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: SELECT DISTINCT over a column subset — dedupe shuffles only the
    two projected columns (column pruning reaches the scan)."""
    return load_table(spark, "customer", sf_dir).select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# P1/P5/P7-style filter + projection with pushdown.
# ---------------------------------------------------------------------------


@query(
    "q03_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND l_quantity > 25
    """,
)
def q03_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan — .explain shows
    PushedFilters [GreaterThanOrEqual(l_shipdate,…), GreaterThan(l_quantity,25)]
    and a 6-column ReadSchema. Row-level double math is IEEE-deterministic so
    no decimal dance is needed (no aggregation)."""
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# ---------------------------------------------------------------------------
# J1 inner equi-join + grouped agg.
# ---------------------------------------------------------------------------


@query(
    "q04_orders_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {tot},
           {avgp}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """.format(
        tot=_osum("o.o_totalprice", "total_value"),
        avgp=_oavg("o.o_totalprice", "avg_value"),
    ),
)
def q04_orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: orders ⨝ customer, segment rollup with exact-decimal SUM/AVG."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_value"),
            davg(F.col("o_totalprice"), "avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# J2-shaped supplier-side star join.
# ---------------------------------------------------------------------------


@query(
    "q05_supplier_star",
    oracle="""
    SELECT r.r_name, n.n_name,
           {rev},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """.format(rev=_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")),
)
def q05_supplier_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact against a chain of broadcast dims (supplier→nation→region) —
    the Spark shape of the reference's 5-per-row dimension lookups
    (etl_completo.py:637-663): zero per-row round trips, one broadcast
    exchange per dim."""
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(rev, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# A1 decorrelated AVG (etl_completo.py:381-385).
# ---------------------------------------------------------------------------


@query(
    "q06_avg_price_per_part",
    oracle="""
    WITH avg_sold AS (
        SELECT l_partkey, {avgp}, COUNT(*) AS n_sold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_name, p.p_retailprice,
           a.avg_sold_price, COALESCE(a.n_sold, 0) AS n_sold
    FROM part p LEFT JOIN avg_sold a ON p.p_partkey = a.l_partkey
    """.format(avgp=_oavg("l_extendedprice", "avg_sold_price")),
)
def q06_avg_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's per-product correlated AVG subquery
    (etl_completo.py:381-385), pre-decorrelated: one groupBy over lineitem
    then a left join to part — O(1) passes instead of O(products) scans."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    avg_sold = l.groupBy("l_partkey").agg(
        davg(F.col("l_extendedprice"), "avg_sold_price"),
        F.count(F.lit(1)).alias("n_sold_raw"),
    )
    return (
        p.join(avg_sold, F.col("p_partkey") == F.col("l_partkey"), "left")
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            "avg_sold_price",
            F.coalesce(F.col("n_sold_raw"), F.lit(0).cast("long")).alias("n_sold"),
        )
    )


# ---------------------------------------------------------------------------
# F12 measure derivation (etl_completo.py:666-683) on testdata columns.
# ---------------------------------------------------------------------------


@query(
    "q07_sales_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 0 THEN l_quantity ELSE 0.0 END AS quantidade_vendida,
           CASE WHEN l_extendedprice > 0 THEN l_extendedprice ELSE 0.0 END AS preco_unitario_venda,
           (CASE WHEN l_quantity > 0 THEN l_quantity ELSE 0.0 END)
             * (CASE WHEN l_extendedprice > 0 THEN l_extendedprice ELSE 0.0 END) AS valor_total_item,
           (CASE WHEN l_extendedprice > 0 THEN l_extendedprice ELSE 0.0 END) * 0.7 AS custo_unitario,
           l_discount * 100.0 AS percentual_desconto,
           (CASE WHEN l_quantity > 0 THEN l_quantity ELSE 0.0 END)
             * (CASE WHEN l_extendedprice > 0 THEN l_extendedprice ELSE 0.0 END)
             * l_discount AS valor_desconto
    FROM lineitem
    """,
)
def q07_sales_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/P7: the fact loader's measure math as one projection — positivity
    guards (etl_completo.py:666-668), 0.7 cost estimate (:388-391), discount
    application (dead loader :885-911). Row-level IEEE math, no aggregation."""
    l = load_table(spark, "lineitem", sf_dir)
    qty = F.when(F.col("l_quantity") > 0, F.col("l_quantity")).otherwise(F.lit(0.0))
    price = F.when(F.col("l_extendedprice") > 0, F.col("l_extendedprice")).otherwise(
        F.lit(0.0)
    )
    total = qty * price
    return l.select(
        "l_orderkey",
        "l_linenumber",
        qty.alias("quantidade_vendida"),
        price.alias("preco_unitario_venda"),
        total.alias("valor_total_item"),
        (price * F.lit(0.7)).alias("custo_unitario"),
        (F.col("l_discount") * F.lit(100.0)).alias("percentual_desconto"),
        (total * F.col("l_discount")).alias("valor_desconto"),
    )


# ---------------------------------------------------------------------------
# A3/F15 composite-key dedup with deterministic keep-first (W2 semantics).
# ---------------------------------------------------------------------------


@query(
    "q08_composite_dedup",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag,
               concat_ws('_', l_orderkey, l_partkey) AS item_id,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey, l_partkey
                   ORDER BY l_linenumber, l_quantity, l_returnflag,
                            l_extendedprice
               ) AS rn
        FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT item_id) AS n_items,
           {q}
    FROM ranked WHERE rn = 1
    GROUP BY l_returnflag
    """.format(q=_osum("l_quantity", "sum_qty")),
)
def q08_composite_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F15/W2: composite id concat (etl_completo.py:686) + ON CONFLICT DO
    NOTHING as keep-first-by-rank dedup — made deterministic via
    row_number ordered by l_linenumber (the reference keeps whichever row
    arrives first; SURVEY.md §7.4 documents the divergence)."""
    from etl_globalretail_spark.functions.cleansing import composite_id

    l = load_table(spark, "lineitem", sf_dir)
    # Tie-break past l_linenumber: the synthetic data holds a handful of
    # fully-colliding (orderkey, partkey, linenumber) rows whose other
    # columns differ — without a total order the kept row is engine-luck.
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        "l_linenumber", "l_quantity", "l_returnflag", "l_extendedprice"
    )
    return (
        l.withColumn("item_id", composite_id(F.col("l_orderkey"), F.col("l_partkey")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("item_id").alias("n_items"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# A2 per-table counts (etl_completo.py:1063-1092).
# ---------------------------------------------------------------------------

_COUNT_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@query(
    "q09_table_counts",
    oracle="\nUNION ALL\n".join(
        f"SELECT '{t}' AS tabela, COUNT(*) AS n_rows FROM {t}" for t in _COUNT_TABLES
    ),
)
def q09_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the reference's end-of-run summary (etl_completo.py:1056-1108) as
    a UNION ALL of counts. Parquet count() is metadata-only — no data read."""
    out = None
    for t in _COUNT_TABLES:
        df = (
            load_table(spark, t, sf_dir)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("tabela"), "n_rows")
        )
        out = df if out is None else out.unionAll(df)
    return out


# ---------------------------------------------------------------------------
# Top-N per group (ranking window over exact revenue).
# ---------------------------------------------------------------------------


@query(
    "q10_top_customers_per_region",
    oracle="""
    WITH rev AS (
        SELECT r.r_name, c.c_custkey, c.c_name,
               {rev}
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, c.c_custkey, c.c_name
    )
    SELECT r_name, c_custkey, c_name, revenue, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY r_name ORDER BY revenue DESC, c_custkey
        ) AS rank FROM rev
    ) WHERE rank <= 3
    """.format(rev=_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")),
)
def q10_top_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 customers by revenue per region. The rank orders
    by the exact-decimal revenue (bit-identical across engines) with c_custkey
    as a total-order tie-break, so row_number is deterministic."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "c_custkey", "c_name")
        .agg(dsum(rev, "revenue"))
    )
    w = Window.partitionBy("r_name").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        per_cust.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("r_name", "c_custkey", "c_name", "revenue", "rank")
    )


# ---------------------------------------------------------------------------
# J3/F13/P4: case-insensitive derived-key join with dedup-first (LIMIT 1).
# ---------------------------------------------------------------------------


@query(
    "q11_case_insensitive_join",
    oracle="""
    WITH dim AS (
        SELECT upper(p_brand) AS brand_uc, MIN(p_partkey) AS rep_partkey
        FROM part GROUP BY upper(p_brand)
    )
    SELECT p.p_partkey, p.p_brand, d.brand_uc, d.rep_partkey
    FROM part p
    LEFT JOIN dim d ON lower(trim(p.p_brand)) = lower(trim(d.brand_uc))
    """,
)
def q11_case_insensitive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (etl_completo.py:562-566): lookup on lower(trim(key)) against a
    deduplicated dim — the LIMIT 1 first-match made deterministic by reducing
    the dim to one row per key (min rep) before joining, as SURVEY.md W2
    prescribes. Dim is aggregated-small → broadcast."""
    from etl_globalretail_spark.functions.cleansing import norm_key

    p = load_table(spark, "part", sf_dir)
    dim = p.groupBy(F.upper(F.col("p_brand")).alias("brand_uc")).agg(
        F.min("p_partkey").alias("rep_partkey")
    )
    return p.join(
        F.broadcast(dim), norm_key(F.col("p_brand")) == norm_key(F.col("brand_uc")), "left"
    ).select("p_partkey", "p_brand", "brand_uc", "rep_partkey")


# ---------------------------------------------------------------------------
# P5/F9: sentinel + multi-format dirty-date cleansing with row-drop.
# ---------------------------------------------------------------------------


@query(
    "q12_dirty_date_parse",
    oracle="""
    WITH dirty AS (
        SELECT o_orderkey,
               CASE o_orderkey % 4
                   WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                   WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
                   WHEN 2 THEN 'Data Inválida'
                   ELSE 'N/A'
               END AS data_venda
        FROM orders
    ),
    parsed AS (
        SELECT o_orderkey,
               COALESCE(
                   CAST(try_strptime(data_venda, '%Y-%m-%d') AS DATE),
                   CAST(try_strptime(data_venda, '%d/%m/%Y') AS DATE)
               ) AS data_parsed
        FROM dirty
        WHERE data_venda NOT IN ('Data Inválida', 'N/A', 'NULL', '')
    )
    SELECT CAST(year(data_parsed) AS BIGINT) AS ano,
           COUNT(*) AS n_orders
    FROM parsed
    WHERE data_parsed IS NOT NULL
    GROUP BY 1
    """,
)
def q12_dirty_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F9 (etl_completo.py:615-635): manufacture the reference's dirty
    varchar dates deterministically from orders (two formats + sentinels),
    then cleanse: sentinel filter → multi-format coalesce parse → row-drop of
    unparseables (the reference's `continue`) → count by year."""
    from etl_globalretail_spark.functions.dates import (
        DATE_SENTINELS,
        parse_multiformat_date,
    )

    o = load_table(spark, "orders", sf_dir)
    dirty = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("Data Inválida"))
        .otherwise(F.lit("N/A"))
        .alias("data_venda"),
    )
    parsed = dirty.filter(~F.col("data_venda").isin(*DATE_SENTINELS)).select(
        "o_orderkey", parse_multiformat_date(F.col("data_venda")).alias("data_parsed")
    )
    return (
        parsed.filter(F.col("data_parsed").isNotNull())
        .groupBy(F.year("data_parsed").cast("long").alias("ano"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# F10: regex numeric extraction (from the events props JSON-ish payload).
# ---------------------------------------------------------------------------


@query(
    "q13_regex_extract",
    oracle="""
    WITH extracted AS (
        SELECT event_type,
               TRY_CAST(regexp_extract(props, '(\\d+(?:\\.\\d+)?)', 1) AS DOUBLE) AS k_value
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(COALESCE(k_value, 0.0) AS BIGINT)) AS BIGINT) AS sum_k,
           {avgk}
    FROM extracted
    GROUP BY event_type
    """.format(avgk=_oavg("COALESCE(k_value, 0.0)", "avg_k")),
)
def q13_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (etl_completo.py:731-740): first numeric token out of a text
    payload, cast to double, null→0.0, rolled up per event type."""
    from etl_globalretail_spark.functions.numeric import extract_discount_pct

    e = load_table(spark, "events", sf_dir)
    k = extract_discount_pct(F.col("props"))
    return (
        e.select("event_type", k.alias("k_value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k_value").cast("long")).alias("sum_k"),
            davg(F.col("k_value"), "avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# F1/F2-style name cleansing, SQL-expressible variant.
# DuckDB has no initcap: emulate per-word upper(first)+lower(rest) — the same
# thing initcap does on single-space-collapsed input.
# ---------------------------------------------------------------------------


@query(
    "q14_name_cleansing",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_name IS NULL OR c_name = '' THEN 'N/A'
                ELSE array_to_string(
                    list_transform(
                        regexp_split_to_array(trim(regexp_replace(c_name, '\\s+', ' ', 'g')), ' '),
                        w -> upper(w[1]) || lower(w[2:])
                    ), ' ')
           END AS nome_padronizado,
           lower(trim(c_mktsegment)) AS segmento_norm
    FROM customer
    """,
)
def q14_name_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 clean_text (initcap fast path) + F13 norm_key over customer
    attributes — whole-stage-codegen'd string expressions, no UDFs."""
    from etl_globalretail_spark.functions.cleansing import clean_text, norm_key

    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        clean_text(F.col("c_name")).alias("nome_padronizado"),
        norm_key(F.col("c_mktsegment")).alias("segmento_norm"),
    )


# ---------------------------------------------------------------------------
# S7/F11/W3: the generated calendar dimension, full attribute derivation.
# ---------------------------------------------------------------------------

_PT_DAYS_SQL = "[" + ", ".join(f"'{d}'" for d in PT_DAY_NAMES) + "]"
_PT_MONTHS_SQL = "[" + ", ".join(f"'{m}'" for m in PT_MONTH_NAMES) + "]"


@query(
    "q15_dim_tempo",
    oracle=f"""
    WITH days AS (
        SELECT CAST(unnest(generate_series(DATE '2020-01-01', DATE '2025-12-31',
                                           INTERVAL 1 DAY)) AS DATE) AS data_completa
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY data_completa) AS BIGINT) AS sk_tempo,
           data_completa,
           CAST(year(data_completa) AS BIGINT) AS ano,
           CAST(month(data_completa) AS BIGINT) AS mes,
           CAST(day(data_completa) AS BIGINT) AS dia,
           CAST(quarter(data_completa) AS BIGINT) AS trimestre,
           CAST(CASE WHEN month(data_completa) <= 6 THEN 1 ELSE 2 END AS BIGINT) AS semestre,
           CAST(isodow(data_completa) AS BIGINT) AS dia_semana,
           ({_PT_DAYS_SQL})[isodow(data_completa)] AS nome_dia_semana,
           ({_PT_MONTHS_SQL})[month(data_completa)] AS nome_mes,
           isodow(data_completa) >= 6 AS eh_fim_semana
    FROM days
    """,
)
def q15_dim_tempo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+F11+W3 (etl_completo.py:776-801): the calendar dimension —
    sequence-generated days, full Portuguese calendar attributes, and a
    deterministic surrogate key (row_number over the date order)."""
    from etl_globalretail_spark.functions.dates import calendar_attributes
    from etl_globalretail_spark.sources.readers import calendar_frame

    cal = calendar_frame(spark, "2020-01-01", "2025-12-31")
    attrs = calendar_attributes(F.col("data_completa"))
    cal = cal.withColumns({k: v.cast("long") if k in (
        "ano", "mes", "dia", "trimestre", "semestre", "dia_semana"
    ) else v for k, v in attrs.items()})
    w = Window.orderBy("data_completa")
    return cal.select(
        F.row_number().over(w).cast("long").alias("sk_tempo"),
        "data_completa",
        "ano", "mes", "dia", "trimestre", "semestre", "dia_semana",
        "nome_dia_semana", "nome_mes", "eh_fim_semana",
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation (batch face of the streaming op).
# ---------------------------------------------------------------------------


@query(
    "q16_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {val}
    FROM events
    GROUP BY 1, 2
    """.format(val=_osum("value", "sum_value")),
)
def q16_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows over the event stream, batch-first — the same
    aggregation runs under Structured Streaming in
    streaming/windows.py (readStream + watermark); date_trunc here ≡
    window(ts, '1 hour').start there."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.col("value"), "sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user profile: multi-aggregate rollup incl. exact distinct + extremes.
# ---------------------------------------------------------------------------


@query(
    "q17_user_profile",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_event_types,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen,
           {val}
    FROM events
    GROUP BY user_id
    """.format(val=_osum("value", "sum_value")),
)
def q17_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-entity rollup: count, exact distinct, min/max timestamps,
    exact-decimal value sum — one shuffle, partial aggregation map-side."""
    e = load_table(spark, "events", sf_dir)
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        dsum(F.col("value"), "sum_value"),
    )
