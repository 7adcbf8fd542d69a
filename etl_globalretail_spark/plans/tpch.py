"""TPC-H-shaped multi-join analytics over the star schema — the classic
decision-support shapes (volume shipping, returned-item ranking, market
share, local-supplier volume) adapted to the driver testdata's columns.

The reference builds its DW explicitly for this kind of analysis
(README.md:7) but ships none of it; these queries are the canonical
workload an analytics engine over this schema must serve, and each one
exercises a distinct physical pattern: two-dimension-role joins (the same
nation table joined twice in different roles), conditional-share
aggregation, filtered top-k with deterministic ranking, and
nation-equality co-location. All oracle-paired.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        per_cust.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 20)
        .select("c_custkey", "c_name", "n_name", "revenue", F.col("pos").cast("bigint"))
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
    w = Window.orderBy(F.desc("numwait"), F.asc("s_name"))
    return (
        blamed.join(F.broadcast(s.select("s_suppkey", "s_name")),
                    blamed.l_suppkey == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )
