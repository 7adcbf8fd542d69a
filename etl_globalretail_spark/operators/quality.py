"""Data-quality expectations — declarative validation over any frame.

The reference's entire purpose is taming dirty data, but its only guard is
log-and-continue (etl_completo.py:182-184 et al.): violations vanish into
logs. This module makes expectations first-class relational checks, each
one aggregate or anti-join producing a (check, n_rows, n_violations) row —
the report a pipeline gates on before promoting a load.

Check semantics:

- ``check_unique``: surplus rows beyond one per key (n − distinct(keys)).
- ``check_not_null``: rows with NULL in any listed column.
- ``check_range``: rows outside [lo, hi] (NULL passes — pair with
  not_null when absence is itself a violation).
- ``check_fk``: child rows whose non-null key has no parent — referential
  integrity as a left anti-join on the pruned parent key column (the
  relational form of the FK constraints in sql/cria_dw.sql:126-131 that
  parquet cannot enforce).

Scale shape: every check is a single scan with map-side partial
aggregation (the FK check adds one key-only anti-join); the checks UNION
into one report frame, and Spark runs the independent branches as
separate-but-concurrent jobs under one action.
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


def _report(df: DataFrame, name: str, violations) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        violations.alias("n_violations"),
    ).select(
        F.lit(name).alias("check_name"), "n_rows", "n_violations"
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    surplus = F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
    return _report(df, name or f"unique({','.join(cols)})", surplus)


def check_not_null(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return _report(
        df, name or f"not_null({','.join(cols)})", F.sum(cond.cast("long"))
    )


def check_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    bad = F.col(col).isNotNull() & (~F.col(col).between(lo, hi))
    return _report(
        df, name or f"range({col})", F.sum(bad.cast("long"))
    )


def check_fk(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    # left join on the deduped parent key column (pruned scan), then count
    # non-null child keys that found no parent — stays LAZY like every
    # other check (no driver actions), so the whole report is one plan.
    marker = f"__fk_hit_{child_key}"
    parent_keys = (
        parent.select(F.col(parent_key).alias(child_key))
        .dropDuplicates()
        .withColumn(marker, F.lit(1))
    )
    joined = child.join(parent_keys, child_key, "left")
    orphan = F.col(child_key).isNotNull() & F.col(marker).isNull()
    return _report(
        joined, name or f"fk({child_key})", F.sum(orphan.cast("long"))
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@_register(
    "q76_dq_expectations",
    oracle="""
    SELECT 'unique(o_orderkey)' AS check_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'not_null(o_custkey,o_orderdate)', COUNT(*),
           COUNT(*) FILTER (WHERE o_custkey IS NULL OR o_orderdate IS NULL)
    FROM orders
    UNION ALL
    SELECT 'range(l_quantity)', COUNT(*),
           COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
                            AND l_quantity NOT BETWEEN 1 AND 50)
    FROM lineitem
    UNION ALL
    SELECT 'range(l_discount)', COUNT(*),
           COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                            AND l_discount NOT BETWEEN 0.0 AND 0.1)
    FROM lineitem
    UNION ALL
    SELECT 'fk(o_custkey)', COUNT(*),
           COUNT(*) FILTER (WHERE o_custkey IS NOT NULL AND NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey))
    FROM orders
    UNION ALL
    SELECT 'fk(l_orderkey)', COUNT(*),
           COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l_orderkey))
    FROM lineitem
    """,
)
def q76_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The promotion-gate report over the warehouse load: key uniqueness,
    required columns, measure ranges, and both fact-side FK integrities —
    six expectations, one report frame.

    Plan shape (VERDICT r9 item 5): the six generic check_* legs each
    re-scanned their table (orders ×3, lineitem ×3 → six scans). Fused
    form, three concurrent legs under ONE action (the q283 device):
    (1) the uniqueness leg on the bare orders scan (count_distinct kept
    OUT of the joined aggregate — a distinct over join output planned a
    second wide exchange, measured +0.5 s at sf0.1); (2) orders ⨝
    customer-keys with null + orphan counts folded into one map-side
    partial; (3) lineitem ⨝ order-keys with both range counts and the
    orphan count in one partial. The 1-row aggregates unpivot via an
    inline explode of literal structs and union into the 6-row report:
    2.1 s → ~1.6 s warm at sf0.1, 6 jobs → 1."""
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    c = load_table(spark, "customer", sf_dir)

    uq = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .alias("n_violations"),
    ).select(
        F.lit("unique(o_orderkey)").alias("check_name"),
        "n_rows",
        "n_violations",
    )
    c_keys = (
        c.select(F.col("c_custkey").alias("o_custkey"))
        .dropDuplicates()
        .withColumn("__c_hit", F.lit(1))
    )
    o_agg = o.join(c_keys, "o_custkey", "left").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("o_custkey").isNull()
             | F.col("o_orderdate").isNull()).cast("long")
        ).alias("nn_v"),
        F.sum(
            (F.col("o_custkey").isNotNull()
             & F.col("__c_hit").isNull()).cast("long")
        ).alias("fk_v"),
    )
    o_keys = (
        o.select(F.col("o_orderkey").alias("l_orderkey"))
        .dropDuplicates()
        .withColumn("__o_hit", F.lit(1))
    )
    l_agg = l.join(o_keys, "l_orderkey", "left").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("l_quantity").isNotNull()
             & ~F.col("l_quantity").between(1, 50)).cast("long")
        ).alias("qty_v"),
        F.sum(
            (F.col("l_discount").isNotNull()
             & ~F.col("l_discount").between(0.0, 0.1)).cast("long")
        ).alias("disc_v"),
        F.sum(
            (F.col("l_orderkey").isNotNull()
             & F.col("__o_hit").isNull()).cast("long")
        ).alias("fk_v"),
    )

    def unpivot(agg: DataFrame, legs: list[tuple[str, str]]) -> DataFrame:
        structs = [
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(vcol).alias("n_violations"),
            )
            for name, vcol in legs
        ]
        return (
            agg.select(F.explode(F.array(*structs)).alias("r"))
            .select("r.*")
        )

    return uq.unionByName(
        unpivot(
            o_agg,
            [
                ("not_null(o_custkey,o_orderdate)", "nn_v"),
                ("fk(o_custkey)", "fk_v"),
            ],
        )
    ).unionByName(
        unpivot(
            l_agg,
            [
                ("range(l_quantity)", "qty_v"),
                ("range(l_discount)", "disc_v"),
                ("fk(l_orderkey)", "fk_v"),
            ],
        )
    )


# ---------------------------------------------------------------------------
# PII redaction — scrub-before-train.
# ---------------------------------------------------------------------------

# Patterns kept in the Java ∩ RE2 common subset (no lookarounds) so the
# DuckDB oracle evaluates the identical automaton.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def redact_pii(text_col, patterns: dict[str, str] | None = None):
    """Replace every PII match with its ``[TYPE]`` tag — chained
    ``regexp_replace`` (JVM regex inside codegen, no UDF). Order matters
    only if patterns overlap; defaults don't."""
    pats = patterns or {"EMAIL": EMAIL_RE, "PHONE": PHONE_RE}
    out = text_col
    for tag, pat in pats.items():
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


@_register(
    "q85_pii_redaction",
    oracle=f"""
    WITH dirty AS (
        SELECT doc_id, lang,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' call 555-123-4567 today' ELSE '' END AS t
        FROM documents
    ),
    red AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(regexp_replace(t, '{EMAIL_RE}', '[EMAIL]', 'g'),
                              '{PHONE_RE}', '[PHONE]', 'g') AS clean
        FROM dirty
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           bit_xor(CAST('0x' || substr(md5(clean), 1, 15) AS BIGINT))
               AS redacted_checksum
    FROM red GROUP BY lang
    """,
)
def q85_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub-before-train: emails/phones (injected deterministically — the
    corpus ships clean) replaced by type tags, audited per language with
    match counts AND an order-independent checksum of the redacted text —
    the oracle checks the actual cleaned bytes, not just the counts."""
    d = load_table(spark, "documents", sf_dir)
    dirty = d.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567 today")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    red = dirty.select(
        "lang",
        F.regexp_count("t", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("t", F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        redact_pii(F.col("t")).alias("clean"),
    )
    # XOR-fold of per-doc 60-bit hashes: order-independent AND overflow-
    # free at any group size (a SUM of 60-bit values overflows int64
    # past ~2^3 docs per group at full width — measured).
    checksum = F.conv(F.substring(F.md5("clean"), 1, 15), 16, 10).cast("bigint")
    return red.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.bit_xor(checksum).alias("redacted_checksum"),
    )


# ---------------------------------------------------------------------------
# In-flight pipeline metrics: df.observe() — validation WITHOUT extra jobs.
# ---------------------------------------------------------------------------


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    not_null_cols: tuple[str, ...] = (),
    positive_cols: tuple[str, ...] = (),
):
    """Attach zero-cost quality counters to a frame: row count, per-column
    null counts, and per-column non-positive counts, collected as
    ``Observation`` metrics DURING whatever action next runs — unlike the
    ``check_*`` report (a separate aggregation job), observation rides the
    existing pass, so a 100 TB load pays nothing extra for its metrics.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action. The same ``observe(name, ...)``
    call on a streaming frame surfaces per-batch under
    ``query.lastProgress["observedMetrics"][name]`` — one metrics
    definition, both execution modes (the engine-wide batch↔stream
    pattern, cf. quality_gate).
    """
    from pyspark.sql import Observation

    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null_cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"null_{c}"
            )
        )
    for c in positive_cols:
        exprs.append(
            F.sum(F.when(F.col(c) <= 0, 1).otherwise(0)).alias(
                f"nonpos_{c}"
            )
        )
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


# ---------------------------------------------------------------------------
# q152 — distributed table fingerprint (anti-entropy checksum): ONE scan
# reduces a table to a tiny bucketed digest (count, XOR-fold, sum of
# 60-bit row hashes per bucket). Two copies of a dataset — before/after a
# migration, across clusters, source vs replicated sink — compare by
# diffing 64 rows instead of re-reading 100 TB twice through a join; a
# mismatched bucket localizes WHERE to re-sync (the Merkle-leaf idea,
# Cassandra-style anti-entropy, Iceberg snapshot checksums). Row identity
# is the md5→15-hex→int64 recipe over an explicitly serialized row: every
# numeric quantized to integers FIRST (floor-cents; epoch micros) because
# double→string rendering is NOT portable across engines.
# ---------------------------------------------------------------------------

_FP_BUCKETS = 64
_FP_MOD = (1 << 61) - 1


def table_fingerprint(df: DataFrame, row_repr: F.Column, n_buckets: int = _FP_BUCKETS) -> DataFrame:
    """(bucket, n_rows, xor_hash, sum_hash) digest of ``df`` under the
    given serialized row representation. Map-side hash + one tiny
    aggregation; XOR and SUM are order-independent, so any partitioning
    (and any engine) produces the identical digest."""
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("bigint")
    return (
        df.select(h.alias("__h"))
        .groupBy((F.col("__h") % n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("__h").alias("xor_hash"),
            # 60-bit hashes summed over row counts overflow int64: fold
            # modulo the Mersenne 2^61-1 with an exact decimal accumulator
            # (order-independent; DuckDB sums in HUGEINT and takes the
            # same modulus).
            (F.sum(F.col("__h").cast("decimal(38,0)")) % F.lit(_FP_MOD))
            .cast("long").alias("sum_hash"),
        )
    )


@_register(
    "q152_table_fingerprint",
    oracle=f"""
    WITH h AS (
        SELECT CAST('0x' || substr(md5(
                   CAST(l_orderkey AS VARCHAR) || '|' ||
                   CAST(l_linenumber AS VARCHAR) || '|' ||
                   CAST(l_partkey AS VARCHAR) || '|' ||
                   CAST(l_suppkey AS VARCHAR) || '|' ||
                   CAST(CAST(FLOOR(l_quantity * 100) AS BIGINT) AS VARCHAR) || '|' ||
                   CAST(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
                   CAST(CAST(FLOOR(l_discount * 100) AS BIGINT) AS VARCHAR) || '|' ||
                   CAST(CAST(FLOOR(l_tax * 100) AS BIGINT) AS VARCHAR) || '|' ||
                   l_returnflag || '|' || l_linestatus || '|' ||
                   CAST(epoch_us(l_shipdate) AS VARCHAR)
               ), 1, 15) AS BIGINT) AS hh
        FROM lineitem
    )
    SELECT hh % {_FP_BUCKETS} AS bucket,
           COUNT(*) AS n_rows,
           CAST(BIT_XOR(hh) AS BIGINT) AS xor_hash,
           CAST(SUM(hh) % {_FP_MOD} AS BIGINT) AS sum_hash
    FROM h GROUP BY bucket
    """,
)
def q152_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bucket content fingerprint of lineitem. The oracle computing the
    SAME digest from the same parquet IS the operator's use-case run live:
    two independent engines agreeing bucket-for-bucket on count + XOR +
    sum certifies byte-level content equality without shipping any rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    cents = lambda c: F.floor(F.col(c) * 100).cast("long").cast("string")  # noqa: E731
    row = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        # NTZ → micros via a timestamp cast under the UTC session TZ the
        # @query wrapper pins (≡ DuckDB epoch_us of the naive timestamp).
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).cast("string"),
    )
    return table_fingerprint(li, row)


# ---------------------------------------------------------------------------
# q183 — key-continuity audit (gaps-and-islands over a surrogate-key
# domain): the DQ check that catches dropped extraction batches, purged
# ranges, and sequence-generator resets. The audited domain here is the
# orderkeys of high-value orders (o_totalprice ≥ 150000) — a naturally
# holey subset, so the island report is genuinely exercised (~thousands
# of runs) rather than degenerating on the fixture's dense raw keys.
# One contiguous run per output row (start, end, length) plus the gap to
# the next run — integers only, NULL-free (last row's gap COALESCEd to 0).
#
# Scale notes: the window runs over the DISTINCT KEY COLUMN ONLY (pruned
# scan → distinct → island grouping), the same global-order cost class as
# q149's range-boundary planner. The island grouping key (id − rank) is
# the textbook dense-rank trick; the heavy frame (one row per distinct
# key) immediately collapses to one row per ISLAND before the lead()
# pass, which runs over the island frame. At 100 TB you run this per
# range partition (repartitionByRange on the key) and stitch the ≤P
# boundary islands driver-side — same arithmetic, documented here rather
# than coded because the fixture's domain is single-window-sized.
# ---------------------------------------------------------------------------


@_register(
    "q183_orderkey_islands",
    oracle="""
    WITH ids AS (SELECT DISTINCT o_orderkey AS id FROM orders
              WHERE o_totalprice >= 150000),
    ranked AS (
        SELECT id, id - ROW_NUMBER() OVER (ORDER BY id) AS grp FROM ids
    ),
    islands AS (
        SELECT MIN(id) AS island_start, MAX(id) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS island_len
        FROM ranked GROUP BY grp
    )
    SELECT island_start, island_end, island_len,
           CAST(COALESCE(LEAD(island_start) OVER (ORDER BY island_start)
                         - island_end - 1, 0) AS BIGINT) AS gap_after
    FROM islands
    """,
)
def q183_orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous orderkey runs and the gap following each — the
    missing-range detector for surrogate-key continuity audits."""
    from etl_globalretail_spark.operators.ranks import (
        global_lead,
        global_row_number,
    )

    ids = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") >= 150000)  # pushed to the scan
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    # two-phase distributed rank (id grain) and two-phase lead (island
    # grain) — neither funnels through a single-task global window
    ranked, _n = global_row_number(ids, [("id", "asc")], out="__rn")
    islands = (
        ranked.select("id", (F.col("id") - F.col("__rn")).alias("grp"))
        .groupBy("grp")
        .agg(
            F.min("id").alias("island_start"),
            F.max("id").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
    )
    led = global_lead(
        islands, [("island_start", "asc")], "island_start", out="__next"
    )
    return led.select(
        "island_start", "island_end", "island_len",
        F.coalesce(
            F.col("__next") - F.col("island_end") - 1,
            F.lit(0),
        ).cast("long").alias("gap_after"),
    )


# ---------------------------------------------------------------------------
# q203 — financial reconciliation: does each order's header total agree
# with the sum of its line-level net amounts? The retail-DW closing
# check (the reference's fact math — F12's valor arithmetic — exists to
# make these columns consistent; this query is the audit that catches
# when they are not). Everything in exact floor-cents: per-line net =
# floor(extprice·(1−disc)·(1+tax)·100) — ONE fixed double product chain
# then FLOOR (portable), header total likewise — so the mismatch census
# and the absolute-drift sum are integer-exact, not tolerance-fuzzy.
#
# Scale notes: one line-grain map + one orderkey combine + one broadcast
# header join + one priority rollup; the same single-shuffle class as
# the fact build it audits.
# ---------------------------------------------------------------------------


@_register(
    "q203_order_reconciliation",
    oracle="""
    WITH line_net AS (
        SELECT l_orderkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) * 100) AS BIGINT)) AS net_cents
        FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
        SELECT o.o_orderpriority,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                   - COALESCE(l.net_cents, 0) AS diff_cents
        FROM orders o LEFT JOIN line_net l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN abs(diff_cents) > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(SUM(abs(diff_cents)) AS BIGINT) AS sum_abs_diff_cents
    FROM recon GROUP BY o_orderpriority
    """,
)
def q203_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation per order priority: orders whose
    floor-cent total drifts more than one cent from the sum of line
    nets, plus the exact total drift."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    line_net = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")) * 100
            ).cast("long")
        ).alias("net_cents")
    )
    recon = o.join(
        line_net, o["o_orderkey"] == line_net["l_orderkey"], "left"
    ).select(
        "o_orderpriority",
        (F.floor(F.col("o_totalprice") * 100).cast("long")
         - F.coalesce("net_cents", F.lit(0))).alias("diff_cents"),
    )
    return recon.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.abs("diff_cents") > 1).cast("long")).cast("long")
        .alias("n_mismatched"),
        F.sum(F.abs("diff_cents")).cast("long").alias("sum_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# q243 — k-anonymity audit: the privacy-governance gate a training corpus
# passes before release. Rows are grouped by their quasi-identifier tuple
# (the columns an adversary could link on — here nation × market segment
# × account-balance band); every equivalence class smaller than k is a
# re-identification risk, and the release rule is "suppress or coarsen
# until min class size ≥ k".
#
# Output grain is the class-SIZE histogram (size band → classes, rows,
# rows-at-risk under k=5), one row per band — the shape auditors read —
# plus each band's minimum class size so the k-anonymity number itself
# (global min) rides the frame.
#
# Scale shape: groupBy(QI) is one map-side-combinable aggregate over the
# table; the histogram is a second aggregate over the |classes|-sized
# class frame. No joins, no windows — the 100 TB cost is one shuffle of
# the QI keys. Banding acctbal into $1000 buckets is the COARSENING
# device itself (floor division — exact in both engines on the
# non-negative fixture balances; negatives would floor vs truncate
# differently, so the band quantizes floor((bal+10000)·100) cents
# offset positive first).
# ---------------------------------------------------------------------------

_K_ANON = 5


def _register_q243() -> None:
    @_register(
        "q243_k_anonymity",
        oracle=f"""
        WITH qi AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(FLOOR(c_acctbal * 100 + 1000000) AS BIGINT)
                       // 100000 AS bal_band,
                   c_custkey
            FROM customer
        ),
        cls AS (
            SELECT c_nationkey, c_mktsegment, bal_band,
                   CAST(COUNT(*) AS BIGINT) AS class_size
            FROM qi GROUP BY 1, 2, 3
        )
        SELECT
            CASE WHEN class_size >= {_K_ANON} THEN 'safe'
                 WHEN class_size > 1 THEN 'small'
                 ELSE 'singleton' END AS size_band,
            CAST(COUNT(*) AS BIGINT) AS n_classes,
            CAST(SUM(class_size) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN class_size < {_K_ANON}
                          THEN class_size ELSE 0 END) AS BIGINT)
                AS rows_at_risk,
            CAST(MIN(class_size) AS BIGINT) AS min_class_size
        FROM cls GROUP BY 1
        """,
    )
    def q243_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """k-anonymity census over customer quasi-identifiers
        (nation, segment, $1000 balance band): per size band, the class
        count, row count, rows at risk under k=5, and min class size."""
        cust = load_table(spark, "customer", sf_dir)
        cls = (
            cust.select(
                "c_nationkey", "c_mktsegment",
                F.expr(
                    "CAST(FLOOR(c_acctbal * 100 + 1000000) AS BIGINT)"
                    " div 100000"
                ).alias("bal_band"),
            )
            .groupBy("c_nationkey", "c_mktsegment", "bal_band")
            .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        )
        return (
            cls.select(
                F.when(F.col("class_size") >= _K_ANON, "safe")
                .when(F.col("class_size") > 1, "small")
                .otherwise("singleton")
                .alias("size_band"),
                "class_size",
            )
            .groupBy("size_band")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.sum("class_size").cast("long").alias("n_rows"),
                F.sum(
                    F.when(F.col("class_size") < _K_ANON,
                           F.col("class_size")).otherwise(0)
                ).cast("long").alias("rows_at_risk"),
                F.min("class_size").cast("long").alias("min_class_size"),
            )
        )


_register_q243()


# ---------------------------------------------------------------------------
# q263 — l-diversity audit: k-anonymity's necessary complement (q243
# counts CLASS SIZES; a class can be large yet still leak if everyone
# in it shares the sensitive value — the homogeneity attack). Here the
# quasi-identifier is (nation, segment) and the sensitive attribute is
# the $1000 balance band; a class's l is its count of DISTINCT
# sensitive values, and the release rule pairs min-class-size ≥ k with
# min-l ≥ l. Output is the l histogram plus rows in classes below
# l = 3. Two aggregates: (QI, sensitive)-grain distinct collapse, then
# the per-class l — both map-side-combinable.
# ---------------------------------------------------------------------------

_L_DIVERSE = 3


def _register_q263() -> None:
    @_register(
        "q263_l_diversity",
        oracle=f"""
        WITH qi AS (
            SELECT c_nationkey AS nk, c_mktsegment AS seg,
                   CAST(FLOOR(c_acctbal * 100 + 1000000) AS BIGINT)
                       // 100000 AS sens
            FROM customer
        ),
        cls AS (
            SELECT nk, seg,
                   CAST(COUNT(*) AS BIGINT) AS class_size,
                   CAST(COUNT(DISTINCT sens) AS BIGINT) AS l
            FROM qi GROUP BY nk, seg
        )
        SELECT l,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(class_size) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l < {_L_DIVERSE} THEN class_size
                             ELSE 0 END) AS BIGINT) AS rows_below_l
        FROM cls GROUP BY l
        """,
    )
    def q263_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """l-diversity histogram over (nation, segment) classes with the
        $1000 balance band as the sensitive attribute."""
        cust = load_table(spark, "customer", sf_dir)
        cls = (
            cust.select(
                F.col("c_nationkey").alias("nk"),
                F.col("c_mktsegment").alias("seg"),
                F.expr(
                    "CAST(FLOOR(c_acctbal * 100 + 1000000) AS BIGINT)"
                    " div 100000"
                ).alias("sens"),
            )
            .groupBy("nk", "seg")
            .agg(
                F.count(F.lit(1)).cast("long").alias("class_size"),
                F.countDistinct("sens").cast("long").alias("l"),
            )
        )
        return cls.groupBy("l").agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("l") < _L_DIVERSE, F.col("class_size"))
                .otherwise(0)
            ).cast("long").alias("rows_below_l"),
        )


_register_q263()


# ---------------------------------------------------------------------------
# q296 — t-closeness audit: the third rung of the release-privacy ladder
# (Li, Li, Venkatasubramanian, ICDE 2007). k-anonymity (q243) bounds
# class SIZE, l-diversity (q263) bounds sensitive-value VARIETY — both
# pass a class whose balance-band distribution is wildly skewed vs the
# table (the skewness attack). t-closeness bounds the DISTANCE between
# each class's sensitive distribution and the global one; for an ORDERED
# attribute the canonical distance is the Earth Mover's Distance
#
#   EMD(p, q) = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|
#
# Exact integers end to end: with cumulative class counts C_i (class
# size n_c) and cumulative global counts G_i (table size N), each
# cumulative difference is (N·C_i − n_c·G_i)/(n_c·N), so
#
#   emd_num = Σ_i |N·C_i − n_c·G_i|        (exact int64; the last term
#                                            is identically 0)
#   t_permil = (emd_num · 1000) div (n_c · N · (m−1))
#
# — one truncating division per class, no FP anywhere. (Magnitude note:
# emd_num ≤ (m−1)·N·n_c ≈ 1e13·class-share at SF100; at full 100 TB
# audit grain the stated widening is DECIMAL(38,0) for the two products,
# same note as q264.)
#
# Scale shape: one (QI, sens) aggregate over the table (the only
# corpus-sized shuffle), then everything runs at bounded audit grains —
# the |classes|×m grid is built by crossing the CLASS aggregate with the
# m-row sensitive DOMAIN aggregate (both broadcast-class by
# construction; INTENTIONAL_CROSS), cumulative sums ride windows
# PARTITIONED by class, and (N, m) attach as a broadcast 1-row scalar.
# The grid is what makes the audit exact: sensitive values ABSENT from a
# class still step the global cumulative, which per-class-only rows
# would miss.
# ---------------------------------------------------------------------------


def _register_q296() -> None:
    _band = (
        "CAST(FLOOR(c_acctbal * 100 + 1000000) AS BIGINT) {div} 100000"
    )

    @_register(
        "q296_t_closeness",
        oracle=f"""
        WITH qi AS (
            SELECT c_nationkey AS nk, c_mktsegment AS seg,
                   {_band.format(div='//')} AS sens
            FROM customer
        ),
        cells AS (
            SELECT nk, seg, sens, CAST(COUNT(*) AS BIGINT) AS c
            FROM qi GROUP BY 1, 2, 3
        ),
        cls AS (SELECT nk, seg, CAST(SUM(c) AS BIGINT) AS n_c
                FROM cells GROUP BY 1, 2),
        dom AS (SELECT sens, CAST(SUM(c) AS BIGINT) AS g
                FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
                       CAST(COUNT(DISTINCT sens) AS BIGINT) AS m
                FROM cells),
        grid AS (
            SELECT cls.nk, cls.seg, cls.n_c, dom.sens, dom.g,
                   COALESCE(cells.c, 0) AS c
            FROM cls CROSS JOIN dom
            LEFT JOIN cells ON cells.nk = cls.nk AND cells.seg = cls.seg
                           AND cells.sens = dom.sens
        ),
        cum AS (
            SELECT nk, seg, n_c,
                   SUM(c) OVER (PARTITION BY nk, seg ORDER BY sens
                                ROWS UNBOUNDED PRECEDING) AS cc,
                   SUM(g) OVER (PARTITION BY nk, seg ORDER BY sens
                                ROWS UNBOUNDED PRECEDING) AS gg
            FROM grid
        )
        SELECT CAST(cum.nk AS BIGINT) AS nationkey, cum.seg AS segment,
               CAST(MIN(cum.n_c) AS BIGINT) AS class_size,
               CAST(SUM(ABS(t.n_total * cc - cum.n_c * gg)) AS BIGINT)
                   AS emd_num,
               CAST(SUM(ABS(t.n_total * cc - cum.n_c * gg)) * 1000
                    // (MIN(cum.n_c) * MIN(t.n_total)
                        * GREATEST(MIN(t.m) - 1, 1))
                    AS BIGINT) AS t_permil
        FROM cum CROSS JOIN tot t
        GROUP BY cum.nk, cum.seg
        """,
    )
    def q296_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-(nation, segment) t-closeness of the $1000 balance-band
        distribution vs the whole table, as exact integer EMD numerator
        + truncating permil; see block comment for the arithmetic and
        the bounded-grid scale shape."""
        cust = load_table(spark, "customer", sf_dir)
        cells = (
            cust.select(
                F.col("c_nationkey").alias("nk"),
                F.col("c_mktsegment").alias("seg"),
                F.expr(_band.format(div="div")).alias("sens"),
            )
            .groupBy("nk", "seg", "sens")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            # Feeds cls, dom, tot AND the grid left-join; tied to the returned
            # plan, released by harness clearCache() (ADVICE r6).
            .persist()
        )
        cls = cells.groupBy("nk", "seg").agg(
            F.sum("c").cast("long").alias("n_c")
        )
        dom = cells.groupBy("sens").agg(F.sum("c").cast("long").alias("g"))
        tot = cells.agg(
            F.sum("c").cast("long").alias("n_total"),
            F.countDistinct("sens").cast("long").alias("m"),
        )
        grid = (
            cls.crossJoin(F.broadcast(dom))  # |classes| × m — bounded
            .join(cells, ["nk", "seg", "sens"], "left")
            .select(
                "nk", "seg", "n_c", "sens", "g",
                F.coalesce("c", F.lit(0)).alias("c"),
            )
        )
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy("nk", "seg")
            .orderBy("sens")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = grid.select(
            "nk", "seg", "n_c",
            F.sum("c").over(w).alias("cc"),
            F.sum("g").over(w).alias("gg"),
        ).crossJoin(F.broadcast(tot))  # 1-row scalar attach — bounded
        return cum.groupBy(
            F.col("nk").cast("long").alias("nationkey"),
            F.col("seg").alias("segment"),
        ).agg(
            F.min("n_c").cast("long").alias("class_size"),
            F.sum(
                F.abs(F.col("n_total") * F.col("cc")
                      - F.col("n_c") * F.col("gg"))
            ).cast("long").alias("emd_num"),
            # GREATEST(m−1, 1) on BOTH sides: a degenerate corpus where
            # every balance lands in one band (m = 1) must yield
            # t_permil = 0, not a division by zero (ADVICE r6); with
            # m = 1 the EMD numerator is identically 0, so any positive
            # divisor gives the same exact answer.
            F.expr(
                "CAST(SUM(ABS(n_total * cc - n_c * gg)) * 1000"
                " div (MIN(n_c) * MIN(n_total)"
                " * GREATEST(MIN(m) - 1, 1)) AS LONG)"
            ).alias("t_permil"),
        )


_register_q296()


# ---------------------------------------------------------------------------
# q368 — DIFFERENTIALLY-PRIVATE count release (the privacy family's
# missing half: q243/q263/q296 AUDIT a corpus, q353 deletes, q85
# scrubs — nothing yet RELEASES an aggregate under a privacy budget).
# Releases per-segment customer counts through symmetric-geometric
# additive noise — the discrete analogue of the Laplace mechanism
# (Dwork et al. 2006; Ghosh-Roughgarden-Sundararajan's geometric
# mechanism family): noise n has P(0) = 1/2, P(±k) = 2^-(k+2), so for
# sensitivity Δ = 1 the release is pure ε-DP with
# ε = ln(P(0)/P(1)) = ln 4 ≈ 1.386 — stated, not approximated, because
# the tail ratio is exactly 2 and the worst case sits at the center.
#
# Determinism (the repo's seeded stance — rand() never appears): the
# noise draw is a PSEUDO-random function of the release key,
# u = 52-bit md5("dp9:" ‖ segment); sign = u mod 2; magnitude = count
# of trailing zeros of u div 2 (a geometric(1/2) variable), extracted
# INTEGER-EXACTLY as LENGTH(BIN(v & -v)) − 1 — the q345 bit-length
# device, identical in both engines. A production release would rotate
# the seed per release epoch and emit ONLY n_released; the audit frame
# here carries n_true/noise so the gate can hash the whole mechanism.
#
# Scale shape: one map-side-combinable groupBy(segment) count; the
# noise is a per-GROUP scalar expression (|segments| rows) — the
# mechanism costs nothing at any corpus size. Negative releases are
# kept (clamping would break the DP guarantee; consumers post-process).
# ---------------------------------------------------------------------------


def _register_q368() -> None:
    @_register(
        "q368_dp_count_release",
        oracle="""
        WITH cnt AS (
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_true
            FROM customer GROUP BY 1
        ),
        draw AS (
            SELECT c_mktsegment, n_true,
                   CAST('0x' || substr(md5('dp9:' || c_mktsegment),
                                       1, 13) AS BIGINT) AS u
            FROM cnt
        ),
        noise AS (
            SELECT c_mktsegment, n_true,
                   CASE WHEN u % 2 = 0 THEN 1 ELSE -1 END
                   * CASE WHEN u // 2 = 0 THEN 51
                          ELSE LENGTH(BIN((u // 2) & -(u // 2))) - 1
                     END AS noise
            FROM draw
        )
        SELECT c_mktsegment,
               n_true,
               CAST(noise AS BIGINT) AS noise,
               CAST(n_true + noise AS BIGINT) AS n_released,
               CAST(ABS(noise) AS BIGINT) AS abs_err
        FROM noise
        """,
    )
    def q368_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
        """ε = ln 4 differentially-private per-segment customer counts
        via seeded symmetric-geometric noise; the audit frame carries
        the true count, the noise draw, and the release. See block
        comment."""
        cust = load_table(spark, "customer", sf_dir)
        cnt = cust.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n_true")
        )
        u = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp9:"), F.col("c_mktsegment"))),
                1, 13,
            ), 16, 10,
        ).cast("long")
        drawn = cnt.select("c_mktsegment", "n_true", u.alias("u"))
        noise = (
            F.when(F.col("u") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
            * F.when(F.expr("u div 2") == 0, F.lit(51)).otherwise(
                F.expr("LENGTH(BIN((u div 2) & -(u div 2))) - 1")
            )
        ).cast("long")
        return drawn.select(
            "c_mktsegment", "n_true",
            noise.alias("noise"),
            (F.col("n_true") + noise).cast("long").alias("n_released"),
            F.abs(noise).cast("long").alias("abs_err"),
        )


_register_q368()


# ---------------------------------------------------------------------------
# q382 — UNBIASED pass@k AGGREGATION (Chen et al. 2021, "Evaluating
# Large Language Models Trained on Code", eq. 1): the eval-harness
# staple. Naively reporting 1 − (1 − ĉ/n)^k is biased; the unbiased
# per-task estimator is 1 − C(n−c, k)/C(n, k) over n samples with c
# successes. Every LLM eval pipeline aggregates exactly this.
#
# Integer-exact device: n is FIXED at 8 samples per task, so C(8−c, k)
# is a 9-entry CASE table of literal integers (emitted by the same
# Python loop into both engines — no factorials, no floats), and the
# fleet aggregate is computed as ONE exact fraction:
#     pass@k = Σ_tasks [C(n,k) − C(n−c,k)] · 1000
#              div (n_tasks · C(n,k))            (single truncation)
# — not a mean of per-task truncations. The naive biased rate rides
# along for contrast (what the estimator corrects).
#
# Task framing on the fixture: task = user with ≥ 8 events; samples =
# the user's FIRST 8 events under the (ts, event_id) total order;
# success = 'purchase'. The rank is per-user PARTITIONED (heap-
# rewritten by InferWindowGroupLimit); one task-grain census feeds all
# four k legs (persist, the rows+reaggregate stance).
# ---------------------------------------------------------------------------

_Q382_N = 8
_Q382_KS = (1, 2, 4, 8)


def _comb(n: int, k: int) -> int:
    import math

    return math.comb(n, k) if 0 <= k <= n else 0


def _register_q382() -> None:
    def case_sql(k: int) -> str:
        whens = " ".join(
            f"WHEN {c} THEN {_comb(_Q382_N - c, k)}"
            for c in range(_Q382_N + 1)
        )
        return f"CASE c {whens} END"

    legs = []
    for k in _Q382_KS:
        cnk = _comb(_Q382_N, k)
        legs.append(f"""
        SELECT CAST({k} AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n_tasks,
               CAST(SUM({cnk} - {case_sql(k)}) * 1000
                    // (COUNT(*) * {cnk}) AS BIGINT) AS pass_at_k_permil,
               CAST(SUM(c) * 1000 // (COUNT(*) * {_Q382_N}) AS BIGINT)
                   AS naive_rate_permil
        FROM tasks""")
    oracle = f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    tasks AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS c
        FROM ranked WHERE rn <= {_Q382_N}
        GROUP BY user_id
        HAVING COUNT(*) = {_Q382_N}
    )
    {" UNION ALL ".join(legs)}
    """

    @_register("q382_pass_at_k", oracle=oracle)
    def q382_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Unbiased pass@k over 8-sample tasks for k ∈ {1,2,4,8}, as one
        exact integer fraction per k; the biased naive rate rides along.
        See block comment."""
        from pyspark.sql.window import Window

        e = load_table(spark, "events", sf_dir)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        tasks = (
            e.select(
                "user_id", "event_type",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") <= _Q382_N)
            .groupBy("user_id")
            .agg(
                F.sum(
                    (F.col("event_type") == "purchase").cast("long")
                ).alias("c"),
                F.count(F.lit(1)).alias("n"),
            )
            .filter(F.col("n") == _Q382_N)
            .persist()  # one task census, four k legs
        )
        out = None
        for k in _Q382_KS:
            cnk = _comb(_Q382_N, k)
            cmap = F.create_map(
                *[
                    F.lit(x)
                    for c in range(_Q382_N + 1)
                    for x in (c, _comb(_Q382_N - c, k))
                ]
            )
            leg = tasks.select(
                F.col("c"), cmap[F.col("c")].alias("cnck")
            ).agg(
                F.lit(k).cast("long").alias("k"),
                F.count(F.lit(1)).cast("long").alias("n_tasks"),
                F.expr(
                    f"CAST(SUM({cnk} - cnck) * 1000"
                    f" div (COUNT(*) * {cnk}) AS BIGINT)"
                ).alias("pass_at_k_permil"),
                F.expr(
                    f"CAST(SUM(c) * 1000 div (COUNT(*) * {_Q382_N})"
                    " AS BIGINT)"
                ).alias("naive_rate_permil"),
            )
            out = leg if out is None else out.unionByName(leg)
        return out


_register_q382()
