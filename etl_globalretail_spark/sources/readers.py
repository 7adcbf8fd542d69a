"""Sources: parquet scans, JDBC, and the generated calendar.

Reference mapping (SURVEY.md §2.1):

- S1 table scan — ``SELECT … FROM t ORDER BY pk`` + fetchall
  (etl_completo.py:154-160 and 9 siblings) → ``spark.read.parquet``; the
  ORDER BY is load-order cosmetics and is intentionally dropped (DataFrames
  are unordered; Catalyst prunes columns + pushes predicates into the scan).
- S7 generator source — one row per day 2020-01-01→2025-12-31
  (etl_completo.py:776-801) → ``explode(sequence(...))`` — distributed, no
  driver-side loop.

JDBC: the reference's actual source is Postgres; ``jdbc_table`` shows the
production-shape reader (predicate-pushdown-capable, partitioned by a numeric
column so a 1000-executor cluster reads in parallel) but is untested here
(no JDBC server in this environment).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_globalretail_spark.schemas import TABLE_NAMES, TESTDATA_SCHEMAS
from etl_globalretail_spark.sources.artifacts import materialize

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Analyzed-plan cache: (sf_dir, table) → DataFrame, scoped per SparkSession
# (weak key — a stopped session's entries vanish with it). DataFrames are
# immutable logical plans, so handing the same object to every caller is
# safe; what this saves is the ~200 ms of driver-side analysis
# (file listing + footer schema read) that `spark.read.parquet` pays on
# EVERY call — load_table runs 1–6× per query and the driver runs 90+
# queries per session, so re-analysis was multiple seconds of pure driver
# latency per round. Executor-side work is unaffected (nothing is
# persisted; each action still scans parquet).
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table_rows(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> int:
    """Memoized row count of one testdata table (parquet footer counts —
    one cheap metadata job per (session, table, sf_dir), then cached).
    Used to size data-dependent knobs (e.g. streaming state partitions)
    without repaying the count per query."""
    cache = _PLAN_CACHE.setdefault(spark, {})
    key = ("__rows__", sf_dir, name)
    if key not in cache:
        cache[key] = load_table(spark, name, sf_dir).count()
    return cache[key]


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one testdata table.

    Columns are selected in canonical schema order so downstream code and the
    oracle agree on column order; Catalyst still prunes unused ones at the
    physical scan.

    The events table has shipped ``ts`` both as parquet TIMESTAMP(NANOS)
    (no native Spark type — read as raw nanos via legacy long mode and
    truncate to µs, matching DuckDB's ns→µs coercion) and as plain
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under Spark's NTZ inference).
    Normalize either encoding to a session-UTC microsecond TimestampType so
    every downstream ``unix_micros``/window expression sees one type.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    per_session = _PLAN_CACHE.setdefault(spark, {})
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type in ("long", "bigint"):  # TIMESTAMP(NANOS) read as raw nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:  # timestamp_ntz or timestamp — value-preserving under UTC session tz
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = df.select(*[f.name for f in TESTDATA_SCHEMAS[name].fields])
    if name not in _SPREAD_EXEMPT:
        df = _spread(spark, df, f"{sf_dir}/{name}.parquet")
    per_session[(sf_dir, name)] = df
    return df


# Broadcast-bound micro-dimensions (≤25 rows): fanning them out just inserts
# an exchange below the BroadcastExchange for nothing.
_SPREAD_EXEMPT = frozenset({"region", "nation"})


def _spread(spark: SparkSession, df: DataFrame, path: str | None = None) -> DataFrame:
    """Fan a narrow scan out to the cluster's parallelism.

    The testdata ships each table as ONE single-row-group parquet file, so
    the scan is one partition and every pre-shuffle map expression runs on
    one core — tokenization/shingling over documents was measured 30× slower
    than the same plan spread over local[32]. A round-robin repartition costs
    one exchange of a ≤11 MB table here; on a real corpus the scan already
    has thousands of splits and this is a no-op (guarded, not unconditional).
    Filters and column pruning still push into the scan below the exchange.

    The split count is estimated from the file size with Spark's own
    packing formula (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, size / defaultParallelism))) — a 7 µs os.stat
    instead of ``df.rdd.getNumPartitions()``, whose DataFrame→RDD
    conversion plans the scan and was measured at ~180 ms PER TABLE LOAD
    (load_table runs 1–6× per query; across the bench that probe alone
    was seconds of driver time). Non-local paths fall back to the probe.
    """
    if os.environ.get('SPREAD_MODE')=='off':
        return df
    want = spark.sparkContext.defaultParallelism
    if os.environ.get('SPREAD_MODE')=='data':
        try:
            sz = os.path.getsize(path) if path else 0
        except OSError:
            sz = 0
        want = max(1, min(want, sz // int(os.environ.get('SPREAD_BPT','65536'))))
    splits: int | None = None
    if path is not None:
        try:
            size = os.path.getsize(path)
            mpb = _size_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
            open_cost = _size_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
            max_split = min(mpb, max(open_cost, size // max(want, 1)))
            splits = max(1, -(-size // max(max_split, 1)))
        except OSError:
            splits = None
    if splits is None:
        splits = df.rdd.getNumPartitions()
    if splits < min(want, 8):
        return df.repartition(want)
    return df


def _size_conf(spark: SparkSession, key: str, default: int) -> int:
    """Parse a byte-size conf ('134217728', '128m', '4mb', '…b')."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if raw.endswith("b"):
        raw = raw[:-1]
    if raw and raw[-1] in units:
        return int(float(raw[:-1]) * units[raw[-1]])
    return int(raw)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def calendar_frame(
    spark: SparkSession, start: str = "2020-01-01", end: str = "2025-12-31"
) -> DataFrame:
    """S7: synthesize one row per day in [start, end] — the dim_tempo source.

    ``sequence`` builds the array on an executor and ``explode`` fans it out;
    for genuinely huge ranges you would sequence per-year first, but a
    calendar is bounded (~10^4 rows) so a single explode is right.
    """
    return spark.sql(
        f"""
        SELECT explode(sequence(to_date('{start}'), to_date('{end}'), interval 1 day))
               AS data_completa
        """
    )


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Production-shape JDBC scan of the reference's Postgres source.

    With ``partition_column`` bounds, Spark issues ``num_partitions`` range
    predicates so the scan parallelizes across executors instead of a single
    cursor (the reference reads every table through one sequential cursor,
    etl_completo.py:154-160). Exercised end-to-end against the embedded
    Derby engine bundled with Spark — q229_jdbc_roundtrip puts the full
    write→read→aggregate loop on the DuckDB hash gate, and pytest asserts
    the partitioned read really splits into range tasks.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_idempotent(df: DataFrame, path: str, keys: list[str], mode: str = "overwrite") -> None:
    """S5: the reference's INSERT … ON CONFLICT DO NOTHING per row
    (etl_completo.py:172-177 et al.) re-expressed as dedup-by-key + an atomic
    job-level write: identical end state, no per-row round trips.
    """
    df.dropDuplicates(keys).write.mode(mode).parquet(path)


def append_new_keys(df: DataFrame, path: str, keys: list[str]) -> int:
    """Incremental idempotent append: write only rows whose key is not yet
    in the sink — the reference's per-row ``INSERT … ON CONFLICT DO
    NOTHING`` (etl_completo.py:172-177) as a set operation, for the
    incremental-load case where ``write_idempotent``'s full overwrite would
    rewrite the whole table.

    The existing-key scan reads ONLY the key columns (column-pruned to the
    parquet footer); the delta is deduped within itself, then anti-joined
    against the sink keys. At 100 TB the sink-side key scan is the cost —
    production sinks bucket by the key (``write_bucketed``) so the anti-join
    co-locates, or keep the delta small enough that AQE broadcasts it.
    Returns the number of rows appended. First write creates the sink.
    """
    spark = df.sparkSession
    fresh = df.dropDuplicates(keys)
    try:
        existing = spark.read.parquet(path).select(*keys)
    except Exception:  # AnalysisException: PATH_NOT_FOUND — first load
        fresh.write.mode("overwrite").parquet(path)
        return fresh.count()
    new = fresh.join(existing.dropDuplicates(keys), keys, "left_anti").persist()
    try:
        n = new.count()
        if n:
            new.write.mode("append").parquet(path)
        return n
    finally:
        new.unpersist()


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog sink: pre-shuffles rows into ``n_buckets`` hash
    buckets on ``bucket_cols`` at WRITE time, so every later equi-join or
    aggregation on those columns reads co-located data and needs NO
    exchange (test-asserted: two tables bucketed on the join key
    sort-merge-join with zero shuffles).

    This is the Spark replacement for the reference's clustered fact
    indexes (cria_indices_dw.sql) on repeat-join workloads: pay one shuffle
    at load, never again. At 100 TB choose n_buckets ≈ cluster cores ×
    small multiple, and repartition on the bucket columns first so each
    task writes one file per bucket it owns rather than n_buckets files.
    """
    out = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        out.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def global_index(df, order_col: str, n_ranges: int = 16):
    """Contiguous global 0-based index under a total order — the 100 TB
    surrogate-key generator SURVEY §7.4 flags as the hard part. A plain
    ``row_number() over (order by k)`` funnels every row through ONE
    partition; this is the standard two-phase replacement:

      1. ``repartitionByRange(order_col)`` + in-partition sort — disjoint,
         ordered ranges, every partition sorted internally (parallel);
      2. per-partition row counts (one tiny job), cumulative offsets on
         the driver (P integers);
      3. index = partition_offset + in-partition row_number, where the
         in-partition window is PARTITIONED BY the range id — parallel,
         never a single-partition exchange.

    Deterministic for a unique ``order_col``: range boundaries vary with
    sampling, but offset+rank composes to the same global index as the
    single-window form regardless of where the boundaries fall (pytest +
    the q190 oracle assert exactly this equivalence).

    The ranged frame is materialized ONCE (``localCheckpoint(eager=True)``)
    before either consumer: ``repartitionByRange`` samples boundaries with
    a per-execution seed (RDD id), so without the pin the counts job (2)
    and the window job (3) could re-plan DIFFERENT boundaries and compose
    offsets from one partitioning with ranks from another — silently
    non-contiguous indexes. Checkpointing freezes one partitioning that
    both jobs read.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ranged = (
        df.repartitionByRange(n_ranges, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .transform(materialize)
    )
    counts = sorted(
        ranged.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    return ranged.withColumn(
        "__idx",
        (off[F.col("__pid")] + F.row_number().over(w) - 1).cast("long"),
    ).drop("__pid")


def fast_count(sf_dir: str, table: str) -> int:
    """Metadata-only row count from the parquet footer(s) — zero data
    read. COUNT(*) with no filter is answerable from file statistics;
    engines with metadata-only optimizations (and table formats with
    manifest counts) do exactly this. At 100 TB the difference is a
    footer listing versus a full scan. Falls back transparently to the
    per-file footer walk for multi-file tables; correctness is pinned
    against the scan-based count in pytest.
    """
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total
