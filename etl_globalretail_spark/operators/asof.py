"""As-of (temporal) join — match each left row to the latest right row at
or before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do; it is the canonical
"operator the engine lacks" for event analytics: attribution, last-quote
enrichment, slowly-changing lookups). The naive formulations both fail at
100 TB:

- range join (``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-per-row):
  Catalyst plans a broadcast-nested-loop or an exploding inner join — the
  per-key cross product is quadratic in events per key;
- per-key ``applyInPandas`` merge: linear, but moves the whole table
  through Python.

The scalable shape is **union + one window**: tag both sides, union them,
sort each key's timeline once (ONE shuffle on the key — the same cost as
any equi-join on that key), and let every left row read the running
``last(right_payload, ignorenulls=True)`` over the preceding frame. All
right-side columns travel in a single struct, so the matched values are
guaranteed to come from the SAME right row. Whole plan is JVM window
aggregation — no Python, no cross product, linear in |left| + |right|.

Ordering within a timestamp tie: right rows sort BEFORE left rows, so a
right row with ts == left.ts matches (``>=`` semantics, same as DuckDB
ASOF). Right-side ties on (key, ts) are broken by the struct's column
order deterministically (last wins after an explicit tiebreak sort key).

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (q51) — the rare case where the
oracle engine has the operator built in and we implement it from relational
primitives.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.plans.queries import make_query_decorator
from etl_globalretail_spark.sources.readers import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    payload_prefix: str = "asof_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the payload of the latest
    ``right`` row with ``right.ts_col <= left.ts_col`` and equal ``on`` key
    (NULLs when no prior right row exists).

    Right payload columns (everything except the key) appear as
    ``{payload_prefix}{name}``. ``tiebreak`` orders right rows that share
    (key, ts) — pass a unique column for full determinism.
    """
    r_payload = [c for c in right.columns if c != on]
    packed = right.select(
        F.col(on),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
    )
    lhs = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(packed.schema["__r"].dataType).alias("__r"),
        F.lit(None).cast(packed.schema["__tb"].dataType).alias("__tb"),
    )
    u = lhs.unionByName(packed, allowMissingColumns=True)
    # right(0) sorts before left(1) at equal ts → `>=` match semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[
            F.col("__m").getField(c).alias(f"{payload_prefix}{c}")
            for c in r_payload
        ],
    )
    return out


def range_join(
    left: DataFrame,
    ts_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bin_days: int = 30,
) -> DataFrame:
    """Interval-containment join: ``left.ts_col ∈ [start_col, end_col)``
    (end-EXCLUSIVE), inner.

    Expressed naively (``JOIN ON ts >= start AND ts < end``) Spark plans a
    broadcast-nested-loop join — O(|left| × |right|), a non-starter when the
    interval table outgrows broadcast. The scale shape is **time binning**:
    quantize time into ``bin_days`` bins, explode each interval to the bins
    it covers, and equi-join on the bin — Catalyst then picks broadcast-hash
    or shuffle-hash like any equi-join, and the exact predicate filters
    within the bin. Each left row owns exactly one bin and an interval
    covers each bin at most once, so no pair duplicates and no dedup pass.
    Replication factor = interval length / bin width: choose ``bin_days``
    near the typical interval length (promo windows here are ~45 days).
    """
    sec = bin_days * 86400
    lb = left.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / sec)
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / sec),
                F.floor(F.unix_timestamp(F.col(end_col)) / sec),
            )
        ),
    )
    return (
        lb.join(rb, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )


_SEASONS = [
    ("Holiday", "{y}-11-20", "{n}-01-01"),
    ("Summer Sale", "{y}-06-01", "{y}-07-16"),
]
_WINDOW_ROWS = [
    (nome, y, s.format(y=y, n=y + 1) + " 00:00:00", e.format(y=y, n=y + 1) + " 00:00:00")
    for y in range(1992, 1999)
    for nome, s, e in _SEASONS
]
_SQL_WINDOWS = ",\n        ".join(
    f"('{n}', {y}, TIMESTAMP '{s}', TIMESTAMP '{e}')"
    for n, y, s, e in _WINDOW_ROWS
)


@_register(
    "q52_range_join",
    oracle=f"""
    WITH windows AS (
        SELECT * FROM (VALUES
        {_SQL_WINDOWS}
        ) AS t(nome, ano, t_start, t_end)
    )
    SELECT nome, ano, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN windows
      ON l_shipdate >= t_start AND l_shipdate < t_end
    GROUP BY nome, ano
    """,
)
def q52_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-window revenue: lineitem shipments range-joined into
    per-year promo windows (end-exclusive containment) via the binned
    equi-join formulation; oracle is the plain BETWEEN join in DuckDB."""
    from etl_globalretail_spark.plans.queries import dsum

    l = load_table(spark, "lineitem", sf_dir)
    windows = spark.createDataFrame(
        [(n, y, s, e) for n, y, s, e in _WINDOW_ROWS],
        "nome string, ano int, t_start string, t_end string",
    ).select(
        "nome",
        "ano",
        F.to_timestamp("t_start").alias("t_start"),
        F.to_timestamp("t_end").alias("t_end"),
    )
    joined = range_join(l, "l_shipdate", windows, "t_start", "t_end", bin_days=30)
    return joined.groupBy("nome", "ano").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


@_register(
    "q51_asof_attribution",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts AS purchase_ts,
           l.value AS purchase_value,
           r.ts AS asof_ts, r.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q51_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the user's latest
    click at or before it. Oracle is DuckDB's native ASOF LEFT JOIN; the
    Spark side is the union+window formulation (one shuffle on user_id)."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("value"), F.col("event_id").alias("__click_id")
    )
    joined = as_of_join(
        purchases, clicks, on="user_id", ts_col="ts", tiebreak="__click_id"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("asof_ts"),
        F.col("asof_value"),
    )


# ---------------------------------------------------------------------------
# q192 — linear multi-touch attribution: each purchase's value is split
# EQUALLY across the same user's clicks in the preceding hour (q51's
# as-of join is the last-touch model; this is the linear model, the other
# staple). Exactness device: credit in integer micro-units, per-click
# share = credit div n, and the division remainder goes to the LAST
# click under a total order (ts desc, event_id desc) — conservation is
# exact (Σ shares ≡ purchase credit), not approximate, and both engines
# compute the identical split. Output is per credited click (the grain
# that actually exercises the split arithmetic).
#
# Scale notes: the purchase⨝click join is user-keyed with a 1-hour range
# residual — per-user blocks, the batch face of the stream-stream join
# (windows.purchases_with_recent_click); at corpus scale with heavy
# users, q52's time-binning bounds the pair fan-out the same way. The
# two windows (count, rank) share one (pid) partitioning — one shuffle.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 3_600_000_000  # 1 hour


@_register(
    "q192_linear_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS pts,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS credit
        FROM events WHERE event_type = 'purchase'
    ),
    k AS (
        SELECT event_id AS cid, user_id, epoch_us(ts) AS cts
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.pid, p.user_id, p.credit, k.cid, k.cts
        FROM p JOIN k ON p.user_id = k.user_id
         AND k.cts >= p.pts - {_ATTR_WINDOW_US} AND k.cts < p.pts
    ),
    ranked AS (
        SELECT pid, user_id, credit, cid,
               COUNT(*) OVER (PARTITION BY pid) AS n,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY cts DESC, cid DESC) AS rn
        FROM j
    ),
    shares AS (
        SELECT user_id, cid,
               credit // n
               + CASE WHEN rn = 1 THEN credit - n * (credit // n)
                      ELSE 0 END AS share
        FROM ranked
    )
    SELECT cid AS click_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases_credited,
           CAST(SUM(share) AS BIGINT) AS credit_micros
    FROM shares GROUP BY cid, user_id
    """,
)
def q192_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-click linear attribution credit (integer micro-units, exact
    conservation via remainder-to-last) for purchases within one hour of
    the click, per user."""
    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.unix_micros("ts").alias("pts"),
        F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("credit"),
    )
    k = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("kuser"),
        F.unix_micros("ts").alias("cts"),
    )
    j = p.join(
        k,
        (F.col("user_id") == F.col("kuser"))
        & (F.col("cts") >= F.col("pts") - _ATTR_WINDOW_US)
        & (F.col("cts") < F.col("pts")),
    )
    wp = Window.partitionBy("pid")
    ranked = j.select(
        "pid", "user_id", "credit", "cid",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(
            wp.orderBy(F.col("cts").desc(), F.col("cid").desc())
        ).alias("rn"),
    )
    share = F.expr("credit div n") + F.when(
        F.col("rn") == 1, F.col("credit") - F.col("n") * F.expr("credit div n")
    ).otherwise(F.lit(0))
    return (
        ranked.select("user_id", "cid", share.alias("share"))
        .groupBy(F.col("cid").alias("click_id"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases_credited"),
            F.sum("share").cast("long").alias("credit_micros"),
        )
    )


# ---------------------------------------------------------------------------
# q193 — time-series resampling with forward fill (gap-fill): every user's
# irregular event stream resampled to a daily grid between their first
# and last active day, carrying the last observed value across silent
# days. The third temporal-join staple beside as-of (q51) and range
# (q52) — feature stores and metric pipelines materialize exactly this
# shape. Determinism: the per-day representative is a total-order
# row_number (ts desc, event_id desc — max_by/arg_max tie-breaks are
# engine luck); values quantized to integer micros BEFORE the fill so
# the carried value is bit-stable.
#
# Scale notes: the daily collapse is a combiner-friendly aggregate; the
# grid explode is map-side (sequence per user, span-bounded); the fill
# is ONE window over (user, day) — same single-shuffle class as q51.
# Silent-day fan-out is bounded by span/user, not corpus size.
# ---------------------------------------------------------------------------


@_register(
    "q193_daily_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS x,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    last_per_day AS (
        SELECT user_id, day, x FROM daily WHERE rn = 1
    ),
    span AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        FROM last_per_day GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM span
    )
    SELECT g.user_id, g.day,
           CAST(last_value(l.x IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS value_micros,
           CAST(CASE WHEN l.x IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_observed
    FROM grid g LEFT JOIN last_per_day l
      ON g.user_id = l.user_id AND g.day = l.day
    """,
)
def q193_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily grid (first→last active day) with forward-filled
    integer-micro values and an observation flag — the gap-fill /
    resample operator."""
    e = load_table(spark, "events", sf_dir)
    daily = (
        e.select(
            "user_id", F.to_date("ts").alias("day"),
            F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("x"),
            F.row_number().over(
                Window.partitionBy("user_id", F.to_date("ts"))
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "x")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.last("x", ignorenulls=True).over(w).cast("long")
            .alias("value_micros"),
            F.when(F.col("x").isNull(), F.lit(0)).otherwise(F.lit(1))
            .cast("long").alias("is_observed"),
        )
    )


# ---------------------------------------------------------------------------
# q195 — the COGROUPED grouped-map surface (df.groupBy(k).cogroup(...)
# .applyInPandas), the one Python execution surface the taxonomy was
# missing (scalar/map/grouped-map/grouped-agg/UDTF/state/source are all
# gate-checked elsewhere). The honest use case: per-key pandas
# merge_asof between TWO keyed streams — each invocation receives the
# user's purchases and clicks as two aligned pandas frames, exactly the
# shape pandas' own as-of join wants. The DuckDB twin is the native
# ASOF LEFT JOIN, so the kernel's backward-inclusive match rule is
# cross-engine verified at the purchase grain.
#
# Determinism: clicks are pre-deduplicated to one per (user, timestamp)
# under a total order (max event_id) IN BOTH ENGINES — asof ties on the
# time key are otherwise engine luck. Unmatched purchases report -1
# (NULL-free); gaps in whole seconds via integer div.
#
# Scale notes: cogroup shuffles each side once on the key; per-user
# frames are session-sized. The JVM q51 as-of (union + one window) is
# the scale path; this surface is for when the per-key logic is
# genuinely pandas-shaped (merge_asof with tolerances, resample-join
# chains) — and its Arrow batches are the per-invocation cost the q155
# sharding lesson applies to.
# ---------------------------------------------------------------------------


@_register(
    "q195_cogroup_asof",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS pid, epoch_us(ts) AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    k0 AS (
        SELECT user_id, event_id AS cid, epoch_us(ts) AS cts,
               ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ),
    k AS (SELECT user_id, cid, cts FROM k0 WHERE rn = 1)
    SELECT p.user_id, p.pid,
           CAST(COALESCE(k.cid, -1) AS BIGINT) AS click_id,
           CAST(COALESCE((p.pts - k.cts) // 1000000, -1) AS BIGINT)
               AS gap_seconds
    FROM p ASOF LEFT JOIN k
      ON p.user_id = k.user_id AND k.cts <= p.pts
    """,
)
def q195_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase backward as-of match to the user's latest click, run
    through the cogrouped applyInPandas surface (pandas merge_asof per
    user) and verified against DuckDB's native ASOF LEFT JOIN."""
    import pandas as pd

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"),
        F.unix_micros("ts").alias("pts"),
    )
    k = (
        e.filter(F.col("event_type") == "click")
        .select(
            "user_id", F.col("event_id").alias("cid"),
            F.unix_micros("ts").alias("cts"),
            F.row_number().over(
                Window.partitionBy("user_id", F.unix_micros("ts"))
                .orderBy(F.col("event_id").desc())
            ).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "cid", "cts")
    )

    def asof_merge(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
        # SHARDED cogroup (the q155 lesson applied to two sides): each
        # invocation receives one shard's purchases AND clicks; users are
        # whole within a shard, so a per-user pandas merge_asof loop is
        # semantically identical while the Arrow+interpreter overhead is
        # paid per SHARD (16), not per user (measured 7.2 s → ~2 s at
        # sf0.1 on ~1.5k users).
        if purchases.empty:
            return pd.DataFrame(
                columns=["user_id", "pid", "click_id", "gap_seconds"]
            )
        click_groups = {
            uid: g.sort_values("cts")
            for uid, g in clicks.groupby("user_id", sort=False)
        }
        outs = []
        for uid, g in purchases.groupby("user_id", sort=False):
            g = g.sort_values("pts")
            kg = click_groups.get(uid)
            if kg is None or kg.empty:
                merged = g.assign(cid=pd.NA, cts=pd.NA)
            else:
                merged = pd.merge_asof(
                    g, kg.drop(columns=["user_id"]),
                    left_on="pts", right_on="cts", direction="backward",
                )
            outs.append(merged)
        merged = pd.concat(outs, ignore_index=True)
        return pd.DataFrame(
            {
                "user_id": merged["user_id"].astype("int64"),
                "pid": merged["pid"].astype("int64"),
                "click_id": merged["cid"].fillna(-1).astype("int64"),
                "gap_seconds": [
                    -1 if pd.isna(c) else int((int(t) - int(c)) // 1_000_000)
                    for t, c in zip(merged["pts"], merged["cts"])
                ],
            }
        )

    return (
        p.groupBy((F.col("user_id") % 16).alias("__shard"))
        .cogroup(k.groupBy((F.col("user_id") % 16).alias("__shard")))
        .applyInPandas(
            asof_merge,
            "user_id long, pid long, click_id long, gap_seconds long",
        )
    )
