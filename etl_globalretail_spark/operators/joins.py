"""Runtime join pre-filtering: a hand-rolled broadcast Bloom filter.

Spark's own InjectRuntimeFilter does this automatically in some shapes
(selective build side, shuffle join), but (a) its `bloom_filter_agg` is not
exposed to SQL/PySpark, and (b) at local thresholds it rarely fires. This
module implements the same idea as a first-class operator the engine can
apply deliberately: aggregate the SMALL side's join keys into an m-bit
Bloom bitmap (k salted xxhash64 probes), ship the bitmap to every task as
a plan literal (the hand analogue of a broadcast variable), and discard
big-side rows map-side BEFORE the shuffle/join. False positives are
harmless — the real join still runs after the pre-filter — so the result
is exact while the shuffle carries only ~selectivity·N + fp·N rows instead
of N.

At 100 TB this is the difference between shuffling a full fact table and
shuffling the ~1% of it that can possibly match a selective dimension
predicate: the classic "semi-join reduction" from distributed query
processing, with the Bloom bitmap standing in for shipping the key set.

The reference has no joins beyond point lookups (etl_completo.py:615-698
issues one SELECT per fact row); this operator is part of the 100 TB
mandate's scale toolkit.

Cross-engine notes: the filter itself needs no oracle twin — correctness
of q144 is the exact join result, which DuckDB recomputes from scratch;
the Bloom pass only changes WHICH rows reach the join, never the output.
Probes use xxhash64 (no DuckDB twin needed for the same reason).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.plans.queries import dsum, make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)

_MAX_BITS = 1 << 17  # 2048 long words as a plan literal — keeps plans small
_MIN_BITS = 1 << 10


def _bloom_positions(key: Column, m_bits: int, k: int, salt: str) -> list[Column]:
    """k salted non-negative probe positions in [0, m_bits) for a key."""
    return [
        (F.xxhash64(key, F.lit(f"{salt}:{i}")) % m_bits + m_bits) % m_bits
        for i in range(k)
    ]


def bloom_bits_for(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bitmap size targeting ~bits_per_key·n bits (k=3 →
    sub-percent false-positive rates), clamped to keep the literal array
    bounded."""
    m = _MIN_BITS
    while m < n_keys * bits_per_key and m < _MAX_BITS:
        m *= 2
    return m


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int, k: int = 3, salt: str = "bloom"
) -> list[int]:
    """Aggregate the small side's keys into an m_bits Bloom bitmap,
    returned as m_bits/64 driver-side longs (a bounded scalar: ≤ 2048
    words by construction — the broadcast-variable payload, not a
    data-sized collect)."""
    pos = df.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), m_bits, k, salt)))
        .alias("p")
    ).distinct()
    words = pos.groupBy(F.expr("p div 64").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(p % 64 AS INT))")).alias("mask")
    )
    got = {r["w"]: r["mask"] for r in words.collect()}
    return [got.get(i, 0) for i in range(m_bits // 64)]


def bloom_prefilter(
    df: DataFrame, key_col: str, bitmap: list[int], k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Map-side Bloom membership filter: keeps every row whose key is in
    the build set (NO false negatives), drops almost every row that is
    not. Zero shuffle — the bitmap rides the plan as a constant array and
    each probe is two bit ops."""
    m_bits = len(bitmap) * 64
    # One array LITERAL (F.lit(list)), not F.array(*lits): CreateArray with
    # 2048 children is rebuilt row-by-row in codegen (measured ~6 s on the
    # sf0.1 lineitem scan); a Literal is materialized once.
    out = df.withColumn("__bf", F.lit([int(w) for w in bitmap]).cast("array<long>"))
    keep = F.lit(True)
    for i, p in enumerate(_bloom_positions(F.col(key_col), m_bits, k, salt)):
        out = out.withColumn(f"__bp{i}", p)
        keep = keep & F.expr(
            f"(element_at(__bf, CAST(__bp{i} div 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(__bp{i} % 64 AS INT))) != 0"
        )
    return out.filter(keep).drop("__bf", *[f"__bp{i}" for i in range(k)])


_Q144_THRESHOLD = 470000.0


@_register(
    "q144_bloom_join_reduction",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > {_Q144_THRESHOLD}
    GROUP BY o.o_orderpriority
    """,
)
def q144_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of line items belonging to high-value orders, with the fact
    scan Bloom-pre-filtered on the selective order set BEFORE the join:
    build bitmap from the ~6% of orders above the price threshold (one
    tiny aggregation job), discard non-matching lineitem rows map-side,
    then run the exact equi-join. The oracle recomputes the plain join —
    hash equality certifies the pre-filter is transparent (no false
    negatives; false positives eliminated by the join).

    Scale notes: the shuffle after pre-filtering carries only matching
    (+ <1%) lineitem rows; the bitmap is O(keys) bits, never the key set
    itself. The two extra driver-side actions (count for sizing, bitmap
    collect) are bounded scalars (documented per CLAUDE.md).
    """
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") > _Q144_THRESHOLD
    )
    hot = o.select("o_orderkey", "o_orderpriority")
    # Fixed max-size bitmap: skips the cardinality-probe job (a sparser
    # bitmap only LOWERS the fp rate; 2048 literal longs either way).
    bitmap = build_bloom(hot, "o_orderkey", _MAX_BITS)

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    li_f = bloom_prefilter(li, "l_orderkey", bitmap)

    return (
        li_f.join(hot, li_f.l_orderkey == hot.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                 "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q196 — null-safe equality join: SQL equality treats NULL ≠ NULL, so a
# plain equi-join silently DROPS every null-keyed row — the classic
# silent-data-loss bug in CDC key matching and dedup on nullable
# business keys. Spark's `<=>` (eqNullSafe) and DuckDB's IS NOT DISTINCT
# FROM both make NULL match NULL; this query proves the two agree, pair
# census by key over a deterministically nulled domain (every 11th
# customer's key nulled — the fixture's columns are NULL-free, so the
# missingness is synthesized identically in both engines).
#
# Scale notes: eqNullSafe compiles to a HASH join (null keys hash to one
# value) — fine when nulls are rare; a heavily-null key column makes the
# NULL bucket a skew key (all nulls co-locate), which is exactly the
# q42 salting / AQE-skew regime. The census output keeps NULL-free
# columns via the -1 sentinel.
# ---------------------------------------------------------------------------


@_register(
    "q196_null_safe_join",
    oracle="""
    WITH keyed AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE c_custkey % 50 END AS k
        FROM customer
    )
    SELECT CAST(COALESCE(a.k, -1) AS BIGINT) AS join_key,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(a.id + b.id) AS BIGINT) AS id_sum
    FROM keyed a JOIN keyed b
      ON a.k IS NOT DISTINCT FROM b.k AND a.id < b.id
    GROUP BY join_key
    """,
)
def q196_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair census of a null-safe self-join on a deterministically nulled
    key: NULL-keyed rows pair with each other (eqNullSafe ≡ IS NOT
    DISTINCT FROM), reported under the -1 sentinel."""
    c = load_table(spark, "customer", sf_dir)
    keyed = c.select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("c_custkey") % 50).alias("k"),
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("k").alias("k_a"))
    b = keyed.select(F.col("id").alias("id_b"), F.col("k").alias("k_b"))
    return (
        a.join(b, F.col("k_a").eqNullSafe(F.col("k_b"))
               & (F.col("id_a") < F.col("id_b")))
        .groupBy(F.coalesce("k_a", F.lit(-1)).cast("long").alias("join_key"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# q396 — FELLEGI–SUNTER probabilistic record linkage (Fellegi & Sunter
# 1969; the scoring theory under Splink/dedupe.io): q191 links records
# by a DETERMINISTIC edit-distance threshold — this adds the
# probabilistic tier, where each comparison field contributes a
# log-odds weight log((m_f/u_f)) on agreement and log((1−m_f)/(1−u_f))
# on disagreement, and the PAIR'S total score drives
# match / possible (clerical review) / non-match.
#
# Construction: source B is an md5-perturbed copy of customer (~20%
# segment rotations, ~25% balance jitters — the deterministic-fake
# convention); candidates are blocked on (nation, name-suffix) where
# the suffix LENGTH is adaptive — max(0, decimal_digits(n) − 4) — so
# blocks stay bounded (~≤400 rows/nation) at ANY corpus size while
# gate SFs (n ≤ 10^4) keep the suffix empty and the u-estimates see
# real non-match mass; true pairs share every block because B keeps
# the name. The 10× rehearsal measured the nation-only form at ratio
# 10.2 (quadratic-in-block); the adaptive key is the linear fix, not
# a stated intention. Fields:
# segment equality, balance BIT-LENGTH band, balance cents-mod-100.
# m_f and u_f are estimated EXACTLY from the labeled candidate census
# (same-key pairs are truth) — no EM needed when labels exist; weights
# are the q378 bit-length device, bitlen(num+1) − bitlen(den+1), i.e.
# log2 resolution with +1 smoothing so empty cells never hit bin(0).
# Thresholds (match ≥ 8, possible ≥ 0) sit in the measured score gaps:
# the all-agree pattern scores 10 at 95% true, the cents+band pattern
# 6 at 48% (clerical), everything ≤ 1 is ~0% true.
#
# Plan: ONE blocked equi-join (nation key, AQE-planned), one 8-row
# agreement-pattern census; every m/u margin, weight, score and class
# is algebra on those 8 driver rows (the q343 class). The output IS
# the canonical FS pattern table.
# ---------------------------------------------------------------------------


_FS_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY")


def _register_q396() -> None:
    segs_sql = "[" + ", ".join(f"'{s}'" for s in _FS_SEGS) + "]"
    h = ("CAST('0x' || substr(md5(CAST(cust AS VARCHAR) || '{salt}'),"
         " 1, 15) AS BIGINT)")

    @_register(
        "q396_fellegi_sunter",
        oracle=f"""
        WITH a AS MATERIALIZED (
            SELECT c_custkey AS cust, c_nationkey AS nat, c_name AS nm,
                   c_mktsegment AS seg,
                   CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        ),
        sfx AS (
            SELECT GREATEST(0, length(CAST(COUNT(*) AS VARCHAR)) - 4)
                       AS k
            FROM customer
        ),
        b AS (
            SELECT cust, nat, nm,
                   CASE WHEN {h.format(salt='fss')} % 5 = 0
                        THEN ({segs_sql})[CAST({h.format(salt='fssv')} % 5
                                          AS INTEGER) + 1]
                        ELSE seg END AS seg,
                   CASE WHEN {h.format(salt='fsb')} % 4 = 0
                        THEN cents + {h.format(salt='fsbv')} % 2000 - 1000
                        ELSE cents END AS cents
            FROM a
        ),
        census AS MATERIALIZED (
            SELECT CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS seg_agree,
                   CASE WHEN length(bin(abs(a.cents) + 1))
                             = length(bin(abs(b.cents) + 1))
                        THEN 1 ELSE 0 END AS band_agree,
                   CASE WHEN ((a.cents % 100) + 100) % 100
                             = ((b.cents % 100) + 100) % 100
                        THEN 1 ELSE 0 END AS cents_agree,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN a.cust = b.cust THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_true
            FROM a JOIN b
              ON a.nat = b.nat
             AND right(a.nm, (SELECT k FROM sfx))
                 = right(b.nm, (SELECT k FROM sfx))
            GROUP BY 1, 2, 3
        ),
        tot AS (
            SELECT SUM(n_true) AS md, SUM(n_pairs - n_true) AS ud
            FROM census
        ),
        w AS MATERIALIZED (
            SELECT f,
                   CAST(length(bin(mn * t.ud + 1))
                        - length(bin(t.md * un + 1)) AS BIGINT) AS wa,
                   CAST(length(bin((t.md - mn) * t.ud + 1))
                        - length(bin(t.md * (t.ud - un) + 1))
                        AS BIGINT) AS wd
            FROM (
                SELECT 's' AS f,
                       SUM(CASE WHEN seg_agree = 1 THEN n_true
                           ELSE 0 END) AS mn,
                       SUM(CASE WHEN seg_agree = 1 THEN n_pairs - n_true
                           ELSE 0 END) AS un
                FROM census
                UNION ALL
                SELECT 'b',
                       SUM(CASE WHEN band_agree = 1 THEN n_true
                           ELSE 0 END),
                       SUM(CASE WHEN band_agree = 1 THEN n_pairs - n_true
                           ELSE 0 END)
                FROM census
                UNION ALL
                SELECT 'c',
                       SUM(CASE WHEN cents_agree = 1 THEN n_true
                           ELSE 0 END),
                       SUM(CASE WHEN cents_agree = 1 THEN n_pairs - n_true
                           ELSE 0 END)
                FROM census
            ) m CROSS JOIN tot t
        ),
        scored AS (
            SELECT c.*,
                   CAST((CASE WHEN c.seg_agree = 1 THEN ws.wa ELSE ws.wd
                         END)
                        + (CASE WHEN c.band_agree = 1 THEN wb.wa
                           ELSE wb.wd END)
                        + (CASE WHEN c.cents_agree = 1 THEN wc.wa
                           ELSE wc.wd END) AS BIGINT) AS score
            FROM census c,
                 (SELECT wa, wd FROM w WHERE f = 's') ws,
                 (SELECT wa, wd FROM w WHERE f = 'b') wb,
                 (SELECT wa, wd FROM w WHERE f = 'c') wc
        )
        SELECT CAST(seg_agree AS BIGINT) AS seg_agree,
               CAST(band_agree AS BIGINT) AS band_agree,
               CAST(cents_agree AS BIGINT) AS cents_agree,
               n_pairs, n_true, score,
               CASE WHEN score >= 8 THEN 'match'
                    WHEN score >= 0 THEN 'possible'
                    ELSE 'non-match' END AS fs_class
        FROM scored
        """,
    )
    def q396_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
        """FS agreement-pattern table: exact m/u from the labeled
        blocked candidates, bitlen log2-resolution weights, 3-way
        classification. See block comment."""
        c = load_table(spark, "customer", sf_dir)
        a = c.select(
            F.col("c_custkey").alias("cust"),
            F.col("c_nationkey").alias("nat"),
            F.col("c_name").alias("nm"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
        # adaptive block-suffix length: decimal_digits(n) − 4, so block
        # size stays bounded at any corpus size (driver scalar, 1 value)
        sfx = max(0, len(str(a.count())) - 4)

        def _h(salt: str, mod: int):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("cust").cast("string"),
                                       F.lit(salt))),
                        1, 15,
                    ),
                    16, 10,
                ).cast("bigint") % mod
            )

        segs_arr = F.array(*[F.lit(s) for s in _FS_SEGS])
        b = a.select(
            "cust", "nat", "nm",
            F.when(
                _h("fss", 5) == 0,
                F.element_at(segs_arr, (_h("fssv", 5) + 1).cast("int")),
            ).otherwise(F.col("seg")).alias("seg"),
            F.when(
                _h("fsb", 4) == 0,
                F.col("cents") + _h("fsbv", 2000) - 1000,
            ).otherwise(F.col("cents")).alias("cents"),
        )
        bk = F.concat_ws(
            "|", F.col("nat").cast("string"),
            F.expr(f"right(nm, {sfx})"),
        )
        al = a.select(
            bk.alias("bk"), F.col("cust").alias("cust_a"),
            F.col("seg").alias("seg_a"), F.col("cents").alias("cents_a"),
        )
        bl_ = b.select(
            bk.alias("bk"), F.col("cust").alias("cust_b"),
            F.col("seg").alias("seg_b"), F.col("cents").alias("cents_b"),
        )
        band = "length(bin(abs({c}) + 1))"
        c100 = "(({c} % 100) + 100) % 100"
        census = (
            al.join(bl_, "bk")
            .select(
                F.when(F.col("seg_a") == F.col("seg_b"), 1).otherwise(0)
                .alias("seg_agree"),
                F.when(
                    F.expr(band.format(c="cents_a"))
                    == F.expr(band.format(c="cents_b")), 1,
                ).otherwise(0).alias("band_agree"),
                F.when(
                    F.expr(c100.format(c="cents_a"))
                    == F.expr(c100.format(c="cents_b")), 1,
                ).otherwise(0).alias("cents_agree"),
                F.when(F.col("cust_a") == F.col("cust_b"), 1).otherwise(0)
                .alias("t"),
            )
            .groupBy("seg_agree", "band_agree", "cents_agree")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum("t").cast("long").alias("n_true"),
            )
        ).collect()  # ≤ 8 agreement patterns — bounded driver rows
        md = sum(r["n_true"] for r in census)
        ud = sum(r["n_pairs"] - r["n_true"] for r in census)
        weights = {}
        for f in ("seg_agree", "band_agree", "cents_agree"):
            mn = sum(r["n_true"] for r in census if r[f] == 1)
            un = sum(r["n_pairs"] - r["n_true"] for r in census
                     if r[f] == 1)
            weights[f] = (
                (mn * ud + 1).bit_length() - (md * un + 1).bit_length(),
                ((md - mn) * ud + 1).bit_length()
                - (md * (ud - un) + 1).bit_length(),
            )
        out = []
        for r in census:
            score = sum(
                weights[f][0] if r[f] == 1 else weights[f][1]
                for f in ("seg_agree", "band_agree", "cents_agree")
            )
            cls = ("match" if score >= 8
                   else "possible" if score >= 0 else "non-match")
            out.append(
                (r["seg_agree"], r["band_agree"], r["cents_agree"],
                 r["n_pairs"], r["n_true"], score, cls)
            )
        return spark.createDataFrame(
            out,
            "seg_agree long, band_agree long, cents_agree long,"
            " n_pairs long, n_true long, score long, fs_class string",
        )


_register_q396()
