"""TPC-H-shaped multi-join analytics over the star schema — the classic
decision-support shapes adapted to the driver testdata's columns.

The reference builds its DW explicitly for this kind of analysis
(README.md:7) but ships none of it; these queries are the canonical
workload an analytics engine over this schema must serve, each
exercising a distinct physical pattern. All oracle-paired.

Coverage: ALL 22 classic TPC-H query shapes —
Q1 q127, Q2 q108, Q3 q118, Q4 q109, Q5 q63, Q6 q119, Q7 q60, Q8 q62,
Q9 q130, Q10 q61, Q11 q110, Q12 q158, Q13 q97 (plans/analytics),
Q14 q111, Q15 q112, Q16 q113, Q17 q114, Q18 q115, Q19 q116, Q20 q117,
Q21 q96, Q22 q102 (plans/analytics). Q12's l_shipmode/l_commitdate/
l_receiptdate don't exist in the driver schema, so q158 runs the shape
on documented substitutes (derived shipping class, plain date window) —
see its block comment. Queries that
classically read partsupp (Q2/Q11/Q16/Q20/Q9) use lineitem as the
part×supplier relation — the decorrelation / semi-join / scalar-subquery
structure, which is what each shape exists to exercise, is preserved.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.operators.ranks import global_topk
from etl_globalretail_spark.plans.queries import (
    _osum,
    dsum,
    make_query_decorator,
)
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)

def _rev():
    # built lazily — Column construction needs an active SparkContext,
    # and this module imports before any session exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@_register(
    "q60_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ano,
           COUNT(*) AS n_items,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q60_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations, both directions,
    per ship year — the same dimension table (nation) joined twice in two
    ROLES (supplier's vs customer's).

    Scale notes: both nation joins broadcast (tiny), and the nation-name
    filters push through them so non-participating suppliers/customers are
    eliminated BEFORE the big lineitem⨝orders shuffle — the fact table
    rows that survive are only those touching the two nations. The
    supplier join also broadcasts; the one large shuffle is
    lineitem⨝orders on orderkey.
    """
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ano"),
        )
        .agg(F.count(F.lit(1)).alias("n_items"), dsum(_rev(), "revenue"))
    )


@_register(
    "q61_returned_items",
    oracle=f"""
    WITH per_cust AS (
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue, pos FROM (
        SELECT *, ROW_NUMBER() OVER (
                   ORDER BY revenue DESC, c_custkey) AS pos
        FROM per_cust
    ) WHERE pos <= 20
    """,
)
def q61_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items
    (l_returnflag = 'R').

    Scale notes: the returnflag filter pushes to the lineitem scan (~1/3
    survives); the per-customer aggregate shrinks the data to |customers|
    BEFORE the global top-k. The final rank is a single-partition window
    over that small aggregate — deterministic (ties broken by custkey),
    which plain LIMIT after ORDER BY would not guarantee across engines.
    The decimal-exact revenue makes the sort keys bit-identical in both
    engines, so the rank (and thus the top-20 cut) cannot diverge.
    """
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    per_cust = (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev(), "revenue"))
    )
    # bounded top-k (TakeOrderedAndProject + rank over <= 20 rows) — no
    # single-task global window over the per-customer aggregate
    return global_topk(
        per_cust, [("revenue", "desc"), ("c_custkey", "asc")], 20, out="pos"
    ).select(
        "c_custkey", "c_name", "n_name", "revenue", F.col("pos").cast("bigint")
    )


@_register(
    "q62_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS ano,
           CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_1'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(27,6))) AS DOUBLE) AS share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    WHERE r.r_regionkey = 0 AND p.p_type = 'ECONOMY'
    GROUP BY year(o.o_orderdate)
    """,
)
def q62_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of ECONOMY-part revenue sold into
    region 0, per order year — conditional-share aggregation over a
    6-table star join.

    Scale notes: the p_type filter broadcasts through the part join and
    the region filter through customer⨝nation⨝region, so both prune the
    fact stream before the orderkey shuffle. The share is one aggregate
    pass (conditional numerator / total denominator) — NOT two queries
    joined. Both sums are decimal-exact; the final division is the same
    double op in both engines.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0))
    joined = (
        l.join(F.broadcast(p.filter(F.col("p_type") == "ECONOMY")), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_regionkey") == 0)),
            F.col("cn_region") == F.col("r_regionkey"),
        )
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("ano")
    ).agg(
        (
            F.sum(nat.cast("decimal(27,6)")).cast("double")
            / F.sum(rev.cast("decimal(27,6)")).cast("double")
        ).alias("share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "q63_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q63_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where the supplier and the customer share a
    nation (local fulfillment), per nation — the join carries an EQUALITY
    BETWEEN TWO FACT-SIDE FOREIGN KEYS (c_nationkey = s_nationkey), which
    q01's plain star join never tests.

    Scale notes: the nation-equality predicate is applied as part of the
    broadcast nation join (both FK columns are already on the joined fact
    row), so no extra shuffle beyond q01's — the selective predicate just
    drops ~24/25 of rows at the join.
    """
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n),
            (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@_register(
    "q96_late_supplier_blame",
    oracle="""
    WITH ranked AS (
        SELECT s.s_name, COUNT(*) AS numwait,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s.s_name ASC) AS rnk
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s.s_name
    )
    SELECT s_name, numwait, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def q96_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders waiting),
    adapted to this schema: within completed ('F') orders involving more
    than one supplier, blame the SOLE supplier whose lines shipped > 90
    days after the order date; top-10 suppliers by blamed line count.

    The oracle states the textbook doubly-correlated form (EXISTS other
    supplier + NOT EXISTS other late supplier — two correlated subqueries
    per line). This plan DEcorrelates both into one aggregation pipeline:
    collapse lines to (order, supplier, any_late, n_late_lines) grains,
    derive per-order supplier/late-supplier counts with a second aggregate,
    and keep blamed suppliers where n_suppliers > 1 AND n_late_suppliers=1.
    Cost: two shuffles on l_orderkey (grain collapse + order profile) and
    the broadcast supplier-name join — versus the correlated form's two
    extra scans of lineitem per predicate. At 100 TB the collapsed
    (order, supplier) grain is ~6× smaller than raw lines and the order
    profile is broadcast-joined back onto it by AQE.
    """
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    lines = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90),
        )
    )
    grain = lines.groupBy("o_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late"),
        F.sum(F.col("is_late").cast("long")).alias("n_late_lines"),
    )
    order_profile = grain.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("any_late").alias("n_late_suppliers"),
    )
    blamed = (
        grain.join(order_profile, "o_orderkey")
        .filter(
            (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
            & (F.col("any_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )
    named = blamed.join(
        F.broadcast(s.select("s_suppkey", "s_name")),
        blamed.l_suppkey == F.col("s_suppkey"),
    ).select("s_name", "numwait")
    # bounded top-k (TakeOrderedAndProject + rank over <= 10 rows)
    return global_topk(
        named, [("numwait", "desc"), ("s_name", "asc")], 10, out="rnk"
    ).withColumn("rnk", F.col("rnk").cast("long"))


# ---------------------------------------------------------------------------
# Round-2 widening: the remaining classic TPC-H physical shapes, adapted to
# this schema (no partsupp table — lineitem doubles as the part×supplier
# relation where TPC-H uses partsupp, which preserves each query's plan
# shape: the interesting part is the decorrelation / semi-join / scalar
# subquery structure, not which table feeds it).
# ---------------------------------------------------------------------------


@_register(
    "q108_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
        SELECT l.l_partkey, p.p_name, l.l_suppkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               AS unit_cost
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size < 10
        GROUP BY l.l_partkey, p.p_name, l.l_suppkey
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rn
        FROM cost
    )
    SELECT r.l_partkey AS p_partkey, r.p_name, s.s_name, n.n_name, r.unit_cost
    FROM ranked r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE r.rn = 1
    """,
)
def q108_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every small part (p_size < 10), the cheapest
    supplier by quantity-weighted unit price — the correlated-MIN subquery
    (`WHERE cost = (SELECT MIN(cost) ... WHERE partkey = outer.partkey)`)
    decorrelated into a per-part window rank.

    unit_cost is Σprice/Σqty (two decimal-exact sums, one double ratio) —
    NOT an average of per-line ratios, whose decimal cast would round
    HALF_UP in Spark but half-even in DuckDB and diverge in the 7th
    decimal (observed).

    Scale notes: the p_size filter broadcasts through the part join and
    prunes ~80% of lineitem BEFORE the (partkey, suppkey) aggregation
    shuffle. The argmin is row_number over the aggregated grain (|parts| ×
    |suppliers per part| rows, ~30× smaller than lineitem), partitioned by
    partkey — fully parallel, no global sort. Ties broken by suppkey so
    the pick is deterministic in both engines; unit_cost is decimal-exact
    so the rank keys are bit-identical.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cost = (
        l.join(
            F.broadcast(p.filter(F.col("p_size") < 10).select("p_partkey", "p_name")),
            l.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name", "s_name", "n_name", "unit_cost",
        )
    )


@_register(
    "q109_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q109_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority class (first half of 1996) that
    had at least one line shipped more than 30 days after the order date —
    the EXISTS correlated subquery expressed as a LEFT SEMI join whose
    condition mixes the equi-key with a cross-side inequality.

    Scale notes: the date range pushes to the orders parquet scan (~8% of
    orders survive). The semi join shuffles on orderkey only; the late-ship
    inequality rides along as the join's residual condition, so no second
    pass over lineitem and no DISTINCT — semi-join semantics dedup matches
    for free (an order with 5 late lines counts once).
    """
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    window_o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = window_o.join(
        l.select("l_orderkey", "l_shipdate"),
        (window_o.o_orderkey == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


@_register(
    "q110_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey,
               {_osum("l.l_extendedprice * (1 - l.l_discount)", "part_value")}
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_1'
        GROUP BY l.l_partkey
    ), tot AS (
        SELECT {_osum("part_value", "total_value")} FROM pv
    )
    SELECT pv.l_partkey AS p_partkey, pv.part_value,
           pv.part_value / tot.total_value AS share
    FROM pv, tot
    WHERE pv.part_value > tot.total_value * 0.001
    """,
)
def q110_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_1-supplied revenue exceeds 0.1%
    of the national total — a grouped aggregate HAVING-compared against a
    GLOBAL scalar subquery over the same aggregate.

    Scale notes: the nation filter broadcasts through supplier onto the
    fact scan (only NATION_1 suppliers' lines aggregate). The per-part
    aggregate is computed ONCE and reused for both the rows and the global
    total — the scalar total is a 1-row broadcast attached via cross join
    (bounded by construction; the lint whitelists it), never a re-scan.
    Both sums are decimal-exact so threshold comparisons are bit-identical.
    """
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    nat_supp = (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_1")),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    pv = (
        l.join(F.broadcast(nat_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(_rev(), "part_value"))
        .persist()
    )
    tot = pv.agg(dsum(F.col("part_value"), "total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "part_value",
            (F.col("part_value") / F.col("total_value")).alias("share"),
        )
    )


@_register(
    "q111_promo_share",
    oracle="""
    SELECT CAST(month(l.l_shipdate) AS BIGINT) AS mes,
           100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(27,6))) AS DOUBLE) AS promo_share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY month(l.l_shipdate)
    """,
)
def q111_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the share of 1997 revenue attributable to PROMO
    parts, per ship month — conditional numerator over unconditional
    denominator in ONE aggregation pass.

    Scale notes: the ship-date range pushes to the lineitem parquet scan;
    part broadcasts (it carries only p_type). One shuffle: the 12-group
    aggregate, with map-side partials carrying both sums together.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              l.l_partkey == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").cast("bigint").alias("mes"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast("decimal(27,6)")).cast("double")
                / F.sum(rev.cast("decimal(27,6)")).cast("double")
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "q112_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l.l_suppkey,
               {_osum("l.l_extendedprice * (1 - l.l_discount)", "total_revenue")}
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q112_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in 1997Q1 —
    the scalar MAX subquery over a grouped view, joined back to the view
    (ties all surface, exactly like the spec's `= (SELECT max ...)`).

    Scale notes: the quarter filter pushes to the scan; the per-supplier
    aggregate is computed once and reused for both the rows and the max
    (1-row broadcast cross join, whitelisted as bounded). Revenue is
    decimal-exact, so the max and the equality test agree bit-for-bit
    across engines — a raw double sum would make `= MAX` flaky.
    """
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(_rev(), "total_revenue"))
        .persist()
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "q113_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q113_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    bucket, excluding an attribute-defined supplier blacklist — the NOT IN
    subquery as a LEFT ANTI join feeding a COUNT(DISTINCT).

    Scale notes: all three part predicates (two inequalities + IN-list)
    broadcast through the part join and prune the fact stream before any
    shuffle; the blacklist is a broadcast anti join (supplier is tiny; at
    real scale Spark would still broadcast the filtered blacklist). The
    count-distinct expands to the standard two-phase aggregate on
    (bucket, suppkey) — no global distinct.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    good_parts = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(good_parts), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(blacklist), l.l_suppkey == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "q114_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                      / COUNT(*)) AS qty_threshold
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))), 0)
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa     ON l.l_partkey = pa.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < pa.qty_threshold
    """,
)
def q114_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue from Brand#3 lines whose
    quantity sits below 20% of that part's average order quantity — the
    correlated AVG subquery decorrelated into a per-part aggregate joined
    back onto the fact rows.

    Scale notes: the per-part threshold table is |parts|-sized — Spark
    joins it back on partkey; with AQE at real scale this is a shuffle
    join co-partitioned with the grouped side it came from (one exchange
    reused). The brand filter broadcasts through the part join. The
    threshold itself divides a decimal-exact sum by COUNT(*) — integer
    quantities, so the double division is bit-identical cross-engine.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#3")
                           .select("p_partkey")),
               l.l_partkey == F.col("p_partkey"))
        .join(pa, l.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.coalesce(
                    F.sum(F.col("l_extendedprice").cast("decimal(27,6)")),
                    F.lit(0).cast("decimal(27,6)"),
                ).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "q115_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {_osum("l_quantity", "sum_qty")}
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 150
    ), ranked AS (
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, b.sum_qty,
               ROW_NUMBER() OVER (
                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS pos
        FROM big b
        JOIN orders o   ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty, pos
    FROM ranked WHERE pos <= 20
    """,
)
def q115_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 20 highest-value orders whose total quantity
    exceeds 150 units — the `IN (SELECT ... HAVING)` membership expressed
    as a join against the HAVING-filtered aggregate.

    Scale notes: lineitem aggregates on orderkey FIRST (its natural key —
    the same shuffle the orders join needs, so AQE reuses the exchange);
    the HAVING cut drops ~99% of orders before any join. customer joins
    broadcast-style after the aggregate. The final top-20 is a
    row_number over the tiny surviving set with a decimal-exact tiebreak.
    """
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    joined = (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )
    # bounded top-k (TakeOrderedAndProject + rank over <= 20 rows)
    return global_topk(
        joined, [("o_totalprice", "desc"), ("o_orderkey", "asc")], 20, out="pos"
    ).withColumn("pos", F.col("pos").cast("bigint"))


@_register(
    "q116_disjunctive_filter",
    oracle=f"""
    SELECT {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q116_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-branch disjunctive predicate
    mixing part attributes with lineitem quantity ranges — the classic
    OR-of-ANDs that tests predicate decomposition.

    Scale notes: Catalyst factors the part-only disjuncts
    (brand ∈ {1,2,3} ∧ size ≤ 15) and pushes them into the broadcast
    part build side, so only candidate parts join; the quantity ranges
    evaluate post-join as the residual. A naive engine evaluates the OR
    per joined row with no pruning.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
               l.l_partkey == F.col("p_partkey"))
        .filter(branch)
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@_register(
    "q117_dominant_suppliers",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, {_osum("l_quantity", "supp_qty")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey, {_osum("supp_qty", "part_qty")}
        FROM ps GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           COUNT(*) AS n_dominant_parts
    FROM ps
    JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE ps.supp_qty > 0.5 * pt.part_qty
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def q117_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated a part's 1997 volume
    (shipped > 50% of its total) and how many parts they dominate — the
    nested `IN (SELECT ... WHERE qty > 0.5 * (SELECT SUM ...))` chain
    decorrelated into a two-level aggregation with a join-back.

    Scale notes: the ship-year filter pushes to the scan; the
    (part, supplier) grain collapses lineitem ~6× BEFORE the per-part
    total is derived FROM THE GRAIN ITSELF (re-aggregation, not a second
    lineitem scan). Both aggregations shuffle on l_partkey — AQE reuses
    the exchange for the join-back. Quantities are decimal-exact so the
    50% comparison cannot straddle an ulp.
    """
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    ps = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(F.col("l_quantity"), "supp_qty"))
        .persist()  # the grain feeds BOTH the per-part total and the
        # join-back; without it Catalyst re-scans lineitem for each path
    )
    pt = ps.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        dsum(F.col("supp_qty"), "part_qty")
    )
    return (
        ps.join(pt, ps.l_partkey == F.col("pt_partkey"))
        .filter(F.col("supp_qty") > F.lit(0.5) * F.col("part_qty"))
        .join(F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
              ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )


@_register(
    "q118_shipping_priority",
    oracle=f"""
    WITH ranked AS (
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
               ROW_NUMBER() OVER (
                   ORDER BY CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                          AS DECIMAL(27,6))) AS DOUBLE) DESC,
                            l.l_orderkey) AS pos
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-06-15'
          AND l.l_shipdate  > TIMESTAMP '1997-06-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, o_orderdate, o_orderpriority, revenue, pos
    FROM ranked WHERE pos <= 10
    """,
)
def q118_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the 10 highest-revenue BUILDING-segment orders
    placed before a cutoff but still unshipped at it (order date before,
    ship date after).

    Scale notes: both date predicates push to their respective parquet
    scans, and the segment filter broadcasts through the customer join —
    three independent prunings before the orderkey shuffle. The top-10
    ranks the post-aggregate frame (|qualifying orders| rows) with
    decimal-exact revenue keys and an orderkey tiebreak.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    cutoff = F.lit("1997-06-15").cast("timestamp")
    per_order = (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff),
              l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(
            c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")),
            o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), "revenue"))
    )
    # bounded top-k (TakeOrderedAndProject + rank over <= 10 rows)
    return (
        global_topk(
            per_order, [("revenue", "desc"), ("l_orderkey", "asc")], 10,
            out="pos",
        )
        .withColumn("pos", F.col("pos").cast("bigint"))
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue", "pos")
    )


@_register(
    "q119_discount_revenue",
    oracle=f"""
    SELECT {_osum("l_extendedprice * l_discount", "revenue_effect")},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q119_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue that would be recovered by eliminating
    mid-band discounts on small-quantity 1997 lines — a pure scan-and-
    aggregate with NO join, the canonical predicate-pushdown probe.

    Scale notes: all three predicates (date range, discount band, quantity
    cap) are simple column comparisons and ALL push into the parquet scan
    (PushedFilters), with row-group min/max statistics skipping whole
    chunks; only 2 columns are read beyond the filter columns. The global
    aggregate is a two-stage partial/final with a single 1-row exchange.
    """
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"),
                 "revenue_effect"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "q127_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum("l_quantity", "sum_qty")},
           {_osum("l_extendedprice", "sum_base_price")},
           {_osum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {_osum("l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                  "sum_charge")},
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q127_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — THE canonical pricing summary: per (returnflag,
    linestatus), four decimal-exact sums, three exact-ratio averages, and
    the order count over almost-all of lineitem.

    Scale notes: this is the pure aggregation-throughput probe — no joins;
    one shuffle of ~6 groups × 8 partials with map-side combine doing
    ~all the work; the date cutoff and the 5 payload columns push to the
    scan. The classic Q1 bottleneck is expression evaluation width, which
    whole-stage codegen keeps in one fused loop.
    """
    l = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def dratio(col: str, alias: str):
        return (
            F.sum(F.col(col).cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias(alias)

    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            dratio("l_quantity", "avg_qty"),
            dratio("l_extendedprice", "avg_price"),
            dratio("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q130_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS ano,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * 0.7 * l.l_quantity
                         AS DECIMAL(27,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%1%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q130_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue − estimated cost) on parts whose
    name matches a substring, per supplier nation per order year — the
    5-way join with a LIKE predicate and two-term measure arithmetic.
    Cost uses the reference's own 0.7·retail rule (etl_completo.py:390,
    the custo_estimado formula) in place of partsupp.ps_supplycost, which
    this schema lacks.

    Scale notes: the contains-LIKE pushes to the part scan as a string
    predicate (row-group dictionary filtering applies even though a
    leading-%% pattern defeats min/max skipping); the surviving part set
    broadcasts, pruning lineitem before the orderkey shuffle — the one
    large exchange. The profit expression folds into a single
    decimal-exact sum, not revenue and cost aggregated separately.
    """
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    profit = _rev() - F.col("p_retailprice") * 0.7 * F.col("l_quantity")
    return (
        l.join(
            F.broadcast(
                p.filter(F.col("p_name").like("%1%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              l.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("ano"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(profit, "profit"),
        )
    )


# ---------------------------------------------------------------------------
# q158 — the Q12 shape (shipping-mode priority census), completing 22/22.
# The driver schema has no l_shipmode/l_commitdate/l_receiptdate, so the
# SHAPE runs on documented substitutes: mode := the line's shipping class
# derived as l_linenumber mod 3 (a stable low-cardinality category on the
# fact row, standing in for SHIP/MAIL/RAIL), and the "received late"
# window predicate := shipped in 1995 (a plain fact-side date window).
# What Q12 exercises — a fact→orders equi-join where the GROUP BY key and
# the filter live on the FACT side and the measures are CONDITIONAL
# counts over the ORDER side's priority — is preserved exactly.
# ---------------------------------------------------------------------------


@_register(
    "q158_shipmode_priority",
    oracle="""
    SELECT CASE l.l_linenumber % 3 WHEN 0 THEN 'CLASS_A'
                                   WHEN 1 THEN 'CLASS_B'
                                   ELSE 'CLASS_C' END AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY ship_class
    """,
)
def q158_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per shipping class, how many high- vs low-priority
    orders' lines shipped in the window. Fact-side filter + derived
    fact-side group key + order-side conditional counts; the orderkey
    equi-join shuffles only the date-windowed slice (pushdown-pruned)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    lf = li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
    ).select("l_orderkey", "l_linenumber")
    ship_class = (
        F.when(F.col("l_linenumber") % 3 == 0, "CLASS_A")
        .when(F.col("l_linenumber") % 3 == 1, "CLASS_B")
        .otherwise("CLASS_C")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lf.join(o.select("o_orderkey", "o_orderpriority"),
                lf.l_orderkey == F.col("o_orderkey"))
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )
