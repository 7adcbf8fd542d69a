"""Slowly-changing-dimension maintenance — the dimension-update operators
a Kimball warehouse needs that the reference's insert-only loader cannot
express.

The reference loads dimensions with ``INSERT … ON CONFLICT DO NOTHING``
(etl_completo.py:172-177 et al.): first write wins, updates are silently
dropped, history is lost. Real DW maintenance needs the other two
policies:

- **SCD Type 1** (``upsert_frame`` / ``merge_upsert``): last-write-wins —
  the delta overwrites matching keys, new keys append. The relational
  face is ``current ANTI-JOIN delta ∪ delta`` — one anti-join on the key
  column, no per-row round trips.
- **SCD Type 2** (``scd2_apply``): versioned history — a changed row
  CLOSES the open version (valid_to = effective date) and opens a new one;
  unchanged rows pass through untouched; brand-new keys open their first
  version. Every version row carries [valid_from, valid_to) and the query
  surface gains point-in-time snapshots (``scd2_snapshot``).

Scale shape (both): the delta is typically ≪ the dimension, so the joins
broadcast; nothing here shuffles the fact table. Attribute comparison is
null-safe (``eqNullSafe``) — NULL→value and value→NULL are real changes.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table
from etl_globalretail_spark.sources.artifacts import materialize

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


def upsert_frame(current: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """SCD1 merge as a frame: delta rows win on key collision, current
    rows survive otherwise. Columns must match."""
    return current.join(
        delta.select(*keys).dropDuplicates(keys), keys, "left_anti"
    ).unionByName(delta.dropDuplicates(keys))


def merge_upsert(spark: SparkSession, delta: DataFrame, path: str, keys: list[str]) -> None:
    """SCD1 merge into a parquet sink: read-merge-swap (the parquet-level
    stand-in for ``MERGE INTO``; a table format would replace the swap
    with an atomic metadata commit, the dataflow is identical). Creates
    the sink on first call."""
    if not os.path.isdir(path):
        delta.dropDuplicates(keys).write.mode("overwrite").parquet(path)
        return
    current = spark.read.parquet(path)
    merged = upsert_frame(current, delta, keys)
    tmp = f"{path}.__merge_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def _any_attr_differs(attrs: list[str]) -> Column:
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    return cond


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension.

    ``current`` schema: key, attrs…, valid_from DATE, valid_to DATE
    (NULL = open version). ``updates`` schema: key, attrs…. Returns the
    new version table:

    - open versions whose attrs differ from their update → CLOSED
      (valid_to = effective_date) plus a NEW open version with the new
      attrs (valid_from = effective_date);
    - open versions with no update, or an identical update → unchanged;
    - keys new to the dimension → first open version;
    - already-closed history rows pass through untouched (history is
      immutable).

    One broadcast-able join of open versions against the update batch +
    one anti-join for brand-new keys; history never rejoins anything.
    """
    eff = F.to_date(F.lit(effective_date))
    closed_history = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull())

    u = updates.dropDuplicates([key])
    joined = open_rows.alias("cur").join(
        u.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"), "left"
    )
    differs = _any_attr_differs(attrs) & F.col(f"upd.{key}").isNotNull()

    # open rows: closed if changed, passed through otherwise
    survivors = joined.select(
        F.col(f"cur.{key}").alias(key),
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        F.when(differs, eff).otherwise(F.col("cur.valid_to")).alias("valid_to"),
    )
    # new versions for changed keys
    changed_new = joined.filter(differs).select(
        F.col(f"upd.{key}").alias(key),
        *[F.col(f"upd.{a}").alias(a) for a in attrs],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    # first versions for brand-new keys
    brand_new = u.join(
        current.select(key).dropDuplicates([key]), key, "left_anti"
    ).select(
        key,
        *attrs,
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return (
        closed_history.unionByName(survivors)
        .unionByName(changed_new)
        .unionByName(brand_new)
    )


def scd2_snapshot(dim: DataFrame, as_of: str) -> DataFrame:
    """Point-in-time view: the version of each key valid on ``as_of``
    ([valid_from, valid_to) semantics)."""
    d = F.to_date(F.lit(as_of))
    return dim.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )


# ---------------------------------------------------------------------------
# Oracle-paired query faces over a deterministic synthetic update batch:
# the dimension is customers 1..N with (c_acctbal, c_mktsegment); the update
# batch touches keys ≡ 0 (mod 3) with a shifted balance (a real change),
# keys ≡ 1 (mod 3) with identical attrs (a no-op update), and adds new keys
# (max_key + 1 .. max_key + 50).
# ---------------------------------------------------------------------------

_EFFECTIVE = "1997-06-15"
_GENESIS = "1995-01-01"


@_register(
    "q70_scd2_merge",
    oracle=f"""
    WITH cur AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               DATE '{_GENESIS}' AS valid_from,
               CAST(NULL AS DATE) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 3 IN (0, 1)
        UNION ALL
        SELECT mx + s AS c_custkey, 0.0 AS c_acctbal,
               'NEWSEG' AS c_mktsegment
        FROM (SELECT MAX(c_custkey) AS mx FROM customer),
             (SELECT unnest(range(1, 51)) AS s)
    ),
    changed AS (
        SELECT u.* FROM upd u JOIN cur c ON u.c_custkey = c.c_custkey
        WHERE u.c_acctbal IS DISTINCT FROM c.c_acctbal
           OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    ),
    survivors AS (
        SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment, c.valid_from,
               CASE WHEN ch.c_custkey IS NOT NULL
                    THEN DATE '{_EFFECTIVE}' ELSE c.valid_to END AS valid_to
        FROM cur c LEFT JOIN changed ch ON c.c_custkey = ch.c_custkey
    ),
    new_versions AS (
        SELECT c_custkey, c_acctbal, c_mktsegment,
               DATE '{_EFFECTIVE}' AS valid_from, CAST(NULL AS DATE) AS valid_to
        FROM changed
        UNION ALL
        SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
               DATE '{_EFFECTIVE}', CAST(NULL AS DATE)
        FROM upd u WHERE NOT EXISTS (
            SELECT 1 FROM cur c WHERE c.c_custkey = u.c_custkey
        )
    )
    SELECT * FROM survivors UNION ALL SELECT * FROM new_versions
    """,
)
def q70_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 applied to a deterministic update batch: changed keys
    (balance shift) close their open version and open a new one; no-op
    updates leave the dimension untouched; new keys open first versions.
    The oracle derives the identical version table relationally — checking
    close-out, pass-through, AND the null-safe change predicate."""
    c = load_table(spark, "customer", sf_dir)
    cur = c.select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.to_date(F.lit(_GENESIS)).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    mx = c.agg(F.max("c_custkey")).collect()[0][0]
    existing_upd = c.filter(F.col("c_custkey") % 3 < 2).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    new_upd = spark.range(1, 51).select(
        (F.col("id") + mx).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    updates = existing_upd.unionByName(new_upd)
    return scd2_apply(
        cur, updates, "c_custkey", ["c_acctbal", "c_mktsegment"], _EFFECTIVE
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], attrs: list[str]
) -> DataFrame:
    """Change-data-capture between two snapshots: one row per differing
    key, labeled ``inserted`` / ``deleted`` / ``changed``.

    A single FULL OUTER join on the key column computes all three classes
    in one pass (vs the naive three-query anti/anti/inner formulation =
    three shuffles of the same tables). Attribute comparison is null-safe.
    At 100 TB both snapshots are typically bucketed on the key
    (``write_bucketed``), making this join exchange-free.
    """
    on = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    j = old.alias("o").join(new.alias("n"), cond, "full_outer")
    o_key, n_key = F.col(f"o.{keys[0]}"), F.col(f"n.{keys[0]}")
    differs = F.lit(False)
    for a in attrs:
        differs = differs | ~F.col(f"o.{a}").eqNullSafe(F.col(f"n.{a}"))
    status = (
        F.when(o_key.isNull(), F.lit("inserted"))
        .when(n_key.isNull(), F.lit("deleted"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change", status)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.coalesce(f"n.{k}", f"o.{k}").alias(k) for k in keys],
            "change",
        )
    )


@_register(
    "q79_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_custkey % 7 <> 0
    ),
    new AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 50.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 11 <> 0
    )
    SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'inserted'
                WHEN n.c_custkey IS NULL THEN 'deleted'
                WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                  OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                THEN 'changed' END AS change
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
       OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
    """,
)
def q79_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff between two deterministic customer snapshots (old drops
    keys ≡ 0 mod 7; new drops keys ≡ 0 mod 11 and shifts balances for
    keys ≡ 0 mod 5): the inserted/deleted/changed ledger in one
    full-outer pass."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    old = c.filter(F.col("c_custkey") % 7 != 0)
    new = c.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 50.0
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )
    return snapshot_diff(
        old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
    )


@_register(
    "q71_upsert_merge",
    oracle="""
    WITH delta AS (
        SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 4 = 0
        UNION ALL
        SELECT mx + s, 0.0, 'NEWSEG'
        FROM (SELECT MAX(c_custkey) AS mx FROM customer),
             (SELECT unnest(range(1, 26)) AS s)
    )
    SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_acctbal, c_mktsegment FROM delta
    """,
)
def q71_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 1 (last-write-wins) merge as a relational face: the delta
    (shifted balances for keys ≡ 0 mod 4, plus 25 new keys) replaces
    matching current rows and appends the rest — one anti-join + union,
    the set-operation form of MERGE INTO."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    mx = c.agg(F.max("c_custkey")).collect()[0][0]
    delta = c.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        spark.range(1, 26).select(
            (F.col("id") + mx).alias("c_custkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEWSEG").alias("c_mktsegment"),
        )
    )
    return upsert_frame(c, delta, ["c_custkey"])


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (the join-side complement of q81's
# aggregate maintenance).
# ---------------------------------------------------------------------------


def incremental_join_refresh(
    view_old: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    keys: list[str],
    out_cols: list[str],
) -> DataFrame:
    """Refresh a materialized inner-equi-join view V = A ⋈ B under
    append-only deltas using the classic delta rule:

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
        V'  = V ∪ ΔV

    Every join touches at least one delta side, so per-batch cost is
    Θ(|Δ| join-partners) — the base-table join (A_old ⋈ B_old) is NEVER
    re-run; that is the entire point of maintaining the view. At scale
    the deltas are broadcast-sized (a day against years) and AQE turns
    all three terms into broadcast joins with zero shuffle of the base
    tables beyond the ΔB-side probe. Append-only inputs only (upserts/
    deletes need SCD2-style close-out first, q70).
    """
    d1 = delta_a.join(b_old, keys)
    d2 = a_old.join(delta_b, keys)
    d3 = delta_a.join(delta_b, keys)
    parts = [df.select(*out_cols) for df in (view_old, d1, d2, d3)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@_register(
    "q100_incremental_join",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS ano,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY year(o.o_orderdate)
    """,
)
def q100_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance identity, oracle-proven: split orders and
    lineitem at 1995-01-01 into base/delta batches, refresh the
    (order ⋈ line) view with the three delta joins, and aggregate the
    refreshed view. The oracle recomputes the join from scratch — the
    hash match proves refresh ≡ recompute row-for-row (in exact-decimal
    revenue), which is the invariant that lets a 100 TB pipeline never
    re-join its history."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    pivot = "1995-01-01"
    a_old = o.filter(F.col("o_orderdate") < pivot)
    delta_a = o.filter(F.col("o_orderdate") >= pivot)
    b_old = l.filter(F.col("l_shipdate") < pivot).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    delta_b = l.filter(F.col("l_shipdate") >= pivot).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    out_cols = ["o_orderkey", "o_orderdate", "l_extendedprice", "l_discount"]
    view_old = a_old.join(b_old, ["o_orderkey"]).select(*out_cols)
    refreshed = incremental_join_refresh(
        view_old, a_old, b_old, delta_a, delta_b, ["o_orderkey"], out_cols
    )
    return refreshed.groupBy(
        F.year("o_orderdate").cast("bigint").alias("ano")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(27,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q188 — op-coded CDC MERGE (the full MERGE INTO statement as set
# algebra): a change batch tagged I/U/D applied in one pass —
#   survivors = target ANTI-JOIN (U ∪ D keys)  ∪  batch rows (I ∪ U)
# which is MERGE WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT
# MATCHED INSERT without a transactional engine. q71 covers upserts
# (I/U); the delete clause is what this adds — the piece replication
# pipelines (GDPR erasure, tombstone streams) need. The batch is
# synthesized DETERMINISTICALLY from the key domain (%-arithmetic), so
# both engines construct the identical change set; the post-merge state
# is audited at the segment grain with exact integer measures.
#
# Scale notes: one broadcast-class anti-join on the batch keys + one
# union — Θ(|target| + |batch|), no full-outer pass (q79's diff is the
# inspection face; MERGE apply never needs the change classification).
# The floor-cents device keeps the balance audit int64-exact.
# ---------------------------------------------------------------------------


@_register(
    "q188_merge_with_deletes",
    oracle="""
    WITH batch AS (
        SELECT c_custkey AS k, 'D' AS op,
               CAST(NULL AS VARCHAR) AS seg, CAST(0 AS BIGINT) AS bal_cents
        FROM customer WHERE c_custkey % 13 = 0
        UNION ALL
        SELECT c_custkey, 'U', c_mktsegment,
               CAST(FLOOR(c_acctbal * 100) + 10000 AS BIGINT)
        FROM customer WHERE c_custkey % 13 <> 0 AND c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 10000000, 'I', 'NEWSEG', CAST(0 AS BIGINT)
        FROM customer WHERE c_custkey % 17 = 0
    ),
    kept AS (
        SELECT c_mktsegment AS seg,
               c_custkey AS k,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM batch WHERE op IN ('U', 'D'))
    ),
    applied AS (
        SELECT seg, k, bal_cents FROM kept
        UNION ALL
        SELECT seg, k, bal_cents FROM batch WHERE op IN ('I', 'U')
    )
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(bal_cents) AS BIGINT) AS bal_cents_sum
    FROM applied GROUP BY seg
    """,
)
def q188_merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with delete clause over customer: deterministic I/U/D batch
    applied as anti-join ∪ union; post-merge per-segment census with
    exact key and floor-cent balance checksums."""
    c = load_table(spark, "customer", sf_dir)
    cents = F.floor(F.col("c_acctbal") * 100).cast("long")
    deletes = c.filter(F.col("c_custkey") % 13 == 0).select(
        F.col("c_custkey").alias("k"), F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("seg"),
        F.lit(0).cast("long").alias("bal_cents"),
    )
    updates = c.filter(
        (F.col("c_custkey") % 13 != 0) & (F.col("c_custkey") % 7 == 0)
    ).select(
        F.col("c_custkey").alias("k"), F.lit("U").alias("op"),
        F.col("c_mktsegment").alias("seg"),
        (cents + 10000).alias("bal_cents"),
    )
    inserts = c.filter(F.col("c_custkey") % 17 == 0).select(
        (F.col("c_custkey") + 10000000).alias("k"), F.lit("I").alias("op"),
        F.lit("NEWSEG").alias("seg"), F.lit(0).cast("long").alias("bal_cents"),
    )
    batch = deletes.unionAll(updates).unionAll(inserts)
    matched_keys = batch.filter(F.col("op").isin("U", "D")).select("k")
    kept = (
        c.select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_custkey").alias("k"),
            cents.alias("bal_cents"),
        )
        .join(F.broadcast(matched_keys), "k", "left_anti")
    )
    # the key-equijoin moves `k` to column 0 — re-project before the
    # POSITIONAL union or seg/k misalign (observed: 'NEWSEG' cast to k)
    applied = kept.select("seg", "k", "bal_cents").unionAll(
        batch.filter(F.col("op").isin("I", "U")).select("seg", "k", "bal_cents")
    )
    return applied.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("long").alias("key_sum"),
        F.sum("bal_cents").cast("long").alias("bal_cents_sum"),
    )


# ---------------------------------------------------------------------------
# q249 — incremental view maintenance (self-maintainable aggregate):
# the warehouse pattern where a materialized revenue cube is kept
# current by merging each load's PARTIAL aggregate into the stored
# state — never re-reading the history. Valid exactly when every
# measure is a commutative monoid (SUM/COUNT here; MIN/MAX on inserts;
# AVG carried as sum+count), which is also why the same states shuffle
# map-side-combined inside one Spark job — IVM is partial aggregation
# across LOADS instead of across partitions.
#
# The query executes the maintenance, not just its algebra: state =
# agg(orders with o_orderkey mod 4 ≠ 0) materialized to executor blocks
# (localCheckpoint — the stored view), delta = agg(mod-4 slice), merged
# on the VIEW grain (|groups| rows, not |orders|). The oracle computes
# the view from scratch over the whole table — hash equality proves the
# incremental path ≡ full recompute. Sums in cents (int64) so the merge
# is order-free; the revenue DOUBLE is derived once at the end from the
# exact cents (one IEEE division, cross-engine stable).
# ---------------------------------------------------------------------------


def _ivm_state(orders: DataFrame) -> DataFrame:
    return orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.year("o_orderdate").cast("long").alias("yr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("rev_cents"),
    )


@_register(
    "q249_incremental_view",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q249_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status×year revenue view maintained incrementally: stored state
    (3/4 of orders, checkpointed) merged with the delta load's partial
    aggregate on the view grain; hash-equal to the from-scratch view."""
    o = load_table(spark, "orders", sf_dir)
    is_delta = F.pmod(F.col("o_orderkey"), 4) == 0
    # the "previously materialized" view: executor-resident, lineage cut
    state = _ivm_state(o.filter(~is_delta)).transform(materialize)
    delta = _ivm_state(o.filter(is_delta))
    merged = (
        state.unionAll(delta)
        .groupBy("status", "yr")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
        )
    )
    return merged.select(
        "status", "yr", "n_orders", "rev_cents",
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q274 — multi-source survivorship (MDM consensus merge): three replicas
# of the customer dimension disagree — the golden record takes the
# 2-of-3 field-level majority, and keys where all three differ are
# routed to stewardship. Replicas derive deterministically from the
# base (r2 corrupts mod-7 balances by +111 cents, r3 corrupts mod-11
# by −222), so both engines build identical inputs and the consensus
# arithmetic has a closed form the oracle states directly: mod-77 keys
# are the genuinely conflicted ones (both corruptions hit, three
# distinct values); every other key has a 2-of-3 majority at the clean
# value or better.
#
# Plan: one 3-way key-aligned projection (no joins — the replicas are
# column derivations of one scan here; real feeds would be a 3-way
# key join at the same grain), a per-key majority expression, and the
# class census.
# ---------------------------------------------------------------------------


@_register(
    "q274_survivorship_consensus",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS k,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v1,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                 + CASE WHEN c_custkey % 7 = 0 THEN 111 ELSE 0 END AS v2,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT)
                 - CASE WHEN c_custkey % 11 = 0 THEN 222 ELSE 0 END AS v3
        FROM customer
    ),
    voted AS (
        SELECT k,
               CASE WHEN v1 = v2 OR v1 = v3 THEN v1
                    WHEN v2 = v3 THEN v2
                    ELSE NULL END AS gold,
               CASE WHEN v1 = v2 AND v2 = v3 THEN 'unanimous'
                    WHEN v1 = v2 OR v1 = v3 OR v2 = v3 THEN 'majority'
                    ELSE 'conflict' END AS verdict
        FROM base
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(k) AS BIGINT) AS key_checksum,
           CAST(COALESCE(SUM(gold), 0) AS BIGINT) AS gold_cents_sum
    FROM voted GROUP BY verdict
    """,
)
def q274_survivorship_consensus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """2-of-3 field-level majority merge of three derived customer
    replicas; census of unanimous / majority / conflict keys."""
    cust = load_table(spark, "customer", sf_dir)
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("v1"),
        (
            F.floor(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 7 == 0, 111).otherwise(0)
        ).alias("v2"),
        (
            F.floor(F.col("c_acctbal") * 100).cast("long")
            - F.when(F.col("c_custkey") % 11 == 0, 222).otherwise(0)
        ).alias("v3"),
    )
    voted = base.select(
        "k",
        F.when(
            (F.col("v1") == F.col("v2")) | (F.col("v1") == F.col("v3")),
            F.col("v1"),
        ).when(F.col("v2") == F.col("v3"), F.col("v2")).alias("gold"),
        F.when(
            (F.col("v1") == F.col("v2")) & (F.col("v2") == F.col("v3")),
            "unanimous",
        )
        .when(
            (F.col("v1") == F.col("v2"))
            | (F.col("v1") == F.col("v3"))
            | (F.col("v2") == F.col("v3")),
            "majority",
        )
        .otherwise("conflict")
        .alias("verdict"),
    )
    return voted.groupBy("verdict").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("k").cast("long").alias("key_checksum"),
        F.coalesce(F.sum("gold"), F.lit(0)).cast("long")
        .alias("gold_cents_sum"),
    )


# ---------------------------------------------------------------------------
# q304 — point-in-time (PIT) feature join: the feature-store correctness
# primitive every leakage-safe ML training join needs — each fact row
# must see the dimension VERSION that was valid AT ITS OWN timestamp,
# never the current one (the classic label-leakage bug: training on
# attributes that only became true after the event). Facts = orders
# (1995–2001, genuinely straddling the q70 SCD2 boundary 1997-06-15);
# dim = q70's version table. The census splits every (segment, version
# currency) cell, so the rows with is_current = false ARE the leakage
# the naive current-version join would have mislabeled — the risk
# quantification reads directly off the frame.
#
# Plan shape: the version table is CUSTOMER-grain (scales with data), so
# it is NOT broadcast-hinted; the join is a plain equi-join on the key
# with the validity interval as a post-join filter (never a nested-loop
# range join) — shuffle hash/sort-merge at 100 TB, AQE-broadcast at
# small SF. Oracle: q70's
# relational version derivation spliced in as a CTE (oracles compose —
# the q191/q200 stance), then the identical interval join.
# ---------------------------------------------------------------------------


def _q304_oracle() -> str:
    versions = ORACLE["q70_scd2_merge"]
    return f"""
    WITH versions AS ({versions}),
    pit AS (
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
               v.c_mktsegment, v.valid_to
        FROM orders o
        JOIN versions v
          ON o.o_custkey = v.c_custkey
         AND CAST(o.o_orderdate AS DATE) >= v.valid_from
         AND CAST(o.o_orderdate AS DATE)
             < COALESCE(v.valid_to, DATE '9999-12-31')
    )
    SELECT c_mktsegment AS segment,
           valid_to IS NULL AS is_current_version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(MIN(epoch_us(o_orderdate) // 86400000000) AS BIGINT)
               AS first_day,
           CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT)
               AS last_day
    FROM pit GROUP BY 1, 2
    """


@_register("q304_pit_feature_join", oracle=_q304_oracle())
def q304_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined to the SCD2 customer version valid AT ORDER DATE,
    censused per (segment, version currency): the is_current=false cells
    are exactly the rows a naive current-version join would mislabel.
    See block comment for the leakage-safety and plan contracts."""
    o = load_table(spark, "orders", sf_dir)
    v = q70_scd2_merge(spark, sf_dir).select(
        "c_custkey", "c_mktsegment", "valid_from", "valid_to"
    )
    # v is CUSTOMER-GRAIN (≥1 version row per customer) — it scales with
    # the corpus, so no broadcast hint (ADVICE r6): the equi key makes
    # this a shuffle hash/sort-merge join with the validity interval as a
    # post-join filter; AQE still broadcasts at small SF.
    pit = o.join(
        v,
        (o.o_custkey == v.c_custkey)
        & (F.to_date("o_orderdate") >= F.col("valid_from"))
        & (
            F.to_date("o_orderdate")
            < F.coalesce(F.col("valid_to"), F.to_date(F.lit("9999-12-31")))
        ),
    )
    return pit.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("valid_to").isNull().alias("is_current_version"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("revenue_cents"),
        F.expr(
            "CAST(MIN(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000) AS LONG)"
        ).alias("first_day"),
        F.expr(
            "CAST(MAX(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000) AS LONG)"
        ).alias("last_day"),
    )
