"""Interchange formats and physical-layout management.

The reference ingests exactly one format — SQL INSERT statements replayed
through psycopg2 (etl_completo.py:90-136) — and manages layout with 23
post-load b-tree indexes (sql/cria_indices_dw.sql:9-37). A Spark-native
engine replaces both concerns:

- **formats**: schema-enforced CSV / JSON Lines / parquet readers and
  writers. Schemas are always EXPLICIT (SURVEY.md §1.4) — inference over a
  100 TB corpus is a full extra scan, and the reference's dirty
  varchar-date columns (sql/create_tables.sql:48-49,82) must stay strings
  until the cleansing layer parses them deliberately.
- **layout**: hive-partitioned writes (the Spark answer to the reference's
  composite temporal indexes — partition pruning skips whole directories
  the way an index range-scan skips pages) and small-file compaction (the
  maintenance op that replaces index REINDEX: streaming/incremental appends
  accrete small files until scan task overhead dominates).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# One token, both directions: CSV cannot distinguish NULL from '' natively —
# an explicit sentinel keeps empty strings and NULLs distinct on round-trip.
_CSV_NULL = "\\N"
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_as(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ``parquet`` | ``csv`` | ``json`` (JSON Lines).

    CSV writes a header (column names travel with the data), quotes/escapes
    embedded delimiters, serializes timestamps at microsecond precision, and
    marks NULL with an explicit sentinel so blank strings survive. Doubles
    round-trip exactly in all three formats (shortest-round-trip repr).
    """
    w = df.write.mode(mode)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        (
            w.option("header", "true")
            .option("nullValue", _CSV_NULL)
            .option("timestampFormat", _TS_FMT)
            .option("escape", '"')
            .csv(path)
        )
    elif fmt == "json":
        w.option("timestampFormat", _TS_FMT).json(path)
    elif fmt == "orc":
        # Native columnar alternative to parquet (built into Spark): same
        # pushdown/pruning story, different footer format — offered because
        # Hive-lineage estates interchange in ORC.
        w.orc(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")


def read_as(
    spark: SparkSession, path: str, fmt: str, schema: StructType
) -> DataFrame:
    """Read ``path`` with an EXPLICIT schema — never inference.

    Inference costs a full extra pass over the data (fatal at 100 TB) and
    guesses wrong on exactly the columns this engine exists to cleanse
    (dirty date strings must arrive as StringType, not a half-parsed
    timestamp). The schema is the contract; mismatching files surface as
    nulls/errors immediately rather than as silently drifted types.
    """
    r = spark.read.schema(schema)
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "csv":
        # multiLine parses quoted embedded newlines correctly, at a price:
        # multiline CSV files are NOT splittable (one task per file). For
        # 100 TB ingest keep files modest (~128 MB) or use JSON/parquet —
        # CSV is an interchange format here, not the scan path.
        return (
            r.option("header", "true")
            .option("nullValue", _CSV_NULL)
            .option("timestampFormat", _TS_FMT)
            .option("escape", '"')
            .option("multiLine", "true")
            .csv(path)
        )
    if fmt == "json":
        return r.option("timestampFormat", _TS_FMT).json(path)
    if fmt == "orc":
        return r.orc(path)
    raise ValueError(f"unknown format {fmt!r}")


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet write: one directory per distinct value of
    ``partition_cols``, so equality/range predicates on those columns prune
    whole directories at planning time (PartitionFilters in the scan node —
    test-asserted) instead of reading and filtering.

    This is the Spark replacement for the reference's composite temporal
    indexes (sql/cria_indices_dw.sql:25-26). Partition columns must be
    low-cardinality (year, region — NOT a key: one directory per value; a
    high-cardinality partition column is the classic small-files
    anti-pattern, which ``compact_partitions`` exists to repair). Rows are
    pre-shuffled on the partition columns so each task owns whole
    partitions and writes one file per directory rather than every task
    writing into every directory (tasks × partitions files).
    """
    df.repartition(*[F.col(c) for c in partition_cols]).write.mode(
        mode
    ).partitionBy(*partition_cols).parquet(path)


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Range-partitioned, internally-sorted parquet layout on ``col``:
    ``repartitionByRange`` gives each output file a disjoint value range
    and ``sortWithinPartitions`` orders rows inside, so every file's
    parquet footer carries tight, NON-OVERLAPPING min/max for ``col`` —
    a range predicate then skips whole files and, within a file, whole
    row groups (the columnar stand-in for the reference's clustered
    b-tree indexes, sql/cria_indices_dw.sql).

    This is the layout for high-cardinality range-queried columns where
    hive partitioning (one DIRECTORY per value) would explode; use
    ``write_partitioned`` for low-cardinality columns, this for the rest.
    The range boundaries come from a sampling pass over ``df`` (one extra
    job — the price of balanced ranges without a priori quantiles).
    """
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def parquet_files(path: str) -> list[str]:
    """All data files under a parquet root (recursive, skips _SUCCESS etc.)."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return out


def compact_partitions(
    spark: SparkSession, path: str, target_rows_per_file: int
) -> tuple[int, int]:
    """Rewrite a parquet dataset into ⌈rows / target⌉ files — the
    small-file maintenance op for sinks that accrete incremental appends
    (``append_new_keys``) or streaming micro-batches, where thousands of
    KB-sized files make task scheduling and footer reads dominate the scan.

    Local-FS implementation: write the compacted copy beside the source,
    then swap directories. On cloud object stores the swap step is where a
    table format (Iceberg/Delta) earns its keep — an atomic metadata commit
    instead of a rename; the compaction plan itself (read → repartition →
    write) is identical. Returns (files_before, files_after).
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    before = len(parquet_files(path))
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = f"{path}.__compact_{uuid.uuid4().hex[:8]}"
    # coalesce, not repartition: merging partitions needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return before, len(parquet_files(path))


def read_binary_assets(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal ingestion front door: scan raw image/audio/video files as
    (path, modificationTime, length, content binary) via Spark's built-in
    ``binaryFile`` source — the row shape operators/multimodal.py consumes
    (opaque bytes + typed metadata; SURVEY §2's multimodal mandate).

    ``glob`` filters at FILE-LISTING time (pathGlobFilter) — unmatched
    files are never opened, the cheap first prune for mixed asset trees.
    Scale notes: one row per file; Spark caps rows at
    ``spark.sql.sources.binaryFile.maxLength`` (default 2 GB). Very large
    assets should be chunked upstream; very SMALL files want compaction
    (see ``compact_partitions``) because each costs a listing entry and a
    task. The source is read-only by design — there is no binary writer;
    derived features persist as parquet.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_text_corpus(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw-text corpus ingestion via the built-in ``text`` source.

    Line mode (default): one row per line, ``value`` string — the shape
    for line-delimited corpora (one document per line, the common LLM
    dump format); files split across tasks at newline boundaries, so a
    single huge file still parallelizes. ``whole_file=True``: one row per
    FILE (wholetext) for document-per-file corpora — not splittable, same
    caveat as multiline CSV. Both attach ``source_file`` (input file
    provenance — the lineage column per-source quotas and mixtures key
    on) and a within-source-deterministic ``line_id`` is the caller's
    job via ``row_number`` when order matters (file order is not a
    relational property).
    """
    from pyspark.sql import functions as F

    return spark.read.text(path, wholetext=whole_file).select(
        F.input_file_name().alias("source_file"),
        F.col("value").alias("text"),
    )


def morton_key(x, y, bits: int = 20):
    """Z-order (Morton) interleave of two non-negative integer columns:
    bit i of ``x`` lands at position 2i+1, bit i of ``y`` at 2i, giving a
    single long whose ordering is the space-filling Z-curve over (x, y).

    Sorting/range-partitioning by this key co-locates rows that are close
    in BOTH dimensions, so per-file parquet min/max footers are tight
    boxes in (x, y) space and a predicate on EITHER column skips files —
    the multi-column generalization of ``write_range_sorted``'s single
    -column clustering (Delta/Iceberg expose the same idea as OPTIMIZE
    ZORDER BY). ``bits`` bounds the supported key range (2^bits − 1);
    2·bits ≤ 62 keeps the result in a signed long.
    """
    z = F.lit(0).cast("long")
    xc, yc = F.col(x).cast("long"), F.col(y).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def morton_sql(x: str, y: str, bits: int = 20) -> str:
    """ANSI-SQL twin of ``morton_key`` (DuckDB-compatible bit operators),
    generated from the same loop so both engines compute the identical
    interleave."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int,
    bits: int = 20, mode: str = "overwrite",
) -> None:
    """Two-dimensionally clustered parquet layout: range-partition and sort
    by the Morton key of (x, y). Each output file covers a compact Z-curve
    segment — a small bounding box in (x, y) — so footer min/max on BOTH
    columns stay selective (cf. single-column ``write_range_sorted``,
    whose files are tight on one column and cover the full range of every
    other)."""
    (
        df.withColumn("__z", morton_key(x, y, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Versioned snapshots — minimal time travel on plain parquet. Delta/Iceberg
# aren't in this container; the 80% use-case (read an older snapshot,
# diff two loads, roll back a bad one) needs only an immutable
# version-directory layout: every write lands in v=<n+1>/, reads resolve
# "latest" or a pinned version, and nothing is ever mutated in place —
# which also makes writes safe against concurrent readers (they hold an
# older directory) and replays idempotent at the version level.
# ---------------------------------------------------------------------------


def list_versions(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("v="):
            try:
                out.append(int(d[2:]))
            except ValueError:
                pass
    return sorted(out)


def write_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next immutable snapshot under ``root`` and
    return its version number. Writes to a temp dir first and renames —
    a crashed write never becomes a visible version."""
    n = (list_versions(root)[-1] + 1) if list_versions(root) else 1
    tmp = os.path.join(root, f".tmp_v{n}_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(root, f"v={n}"))
    return n


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot, or the latest when ``version`` is None."""
    vs = list_versions(root)
    if not vs:
        raise FileNotFoundError(f"no versions under {root}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    return spark.read.parquet(os.path.join(root, f"v={v}"))


# ---------------------------------------------------------------------------
# q286 — interchange-format round trip ON THE HASH GATE: the events table
# (timestamps at µs precision, doubles, JSON-bearing strings with quotes
# — every classic interchange hazard) chained through
# parquet → CSV → JSON Lines → ORC with schema-enforced reads, then
# reduced to a per-type census whose md5 content fold covers every
# column of every row. The oracle computes the same census from the
# parquet source directly, so hash equality proves all three formats
# (quoting, escaping, the \\N null sentinel, µs timestamp formatting,
# shortest-round-trip doubles) are LOSSLESS end to end — the guarantee
# a 100 TB estate needs before letting data transit an interchange tier.
# test_formats.py holds the per-format pytest laws; this puts the
# composition on the driver's cross-engine gate.
# ---------------------------------------------------------------------------

from collections.abc import Callable  # noqa: E402

from etl_globalretail_spark.plans.queries import make_query_decorator  # noqa: E402

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

_register = make_query_decorator(QUERIES, ORACLE)


@_register(
    "q286_format_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           bit_xor(CAST('0x' || substr(md5(concat_ws('|',
                       CAST(event_id AS VARCHAR),
                       CAST(epoch_us(ts) AS VARCHAR),
                       CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR),
                       props)), 1, 15) AS BIGINT)) AS content_checksum
    FROM events GROUP BY event_type
    """,
)
def q286_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV → JSON Lines → ORC → census; hash-equal to the
    parquet source ⇔ the whole interchange chain is lossless."""
    import tempfile

    from etl_globalretail_spark.sources.readers import load_table

    e = load_table(spark, "events", sf_dir)
    work = tempfile.mkdtemp(prefix="q286_fmt_")
    try:
        cur = e
        for fmt in ("csv", "json", "orc"):
            path = os.path.join(work, fmt)
            write_as(cur, path, fmt)
            cur = read_as(spark, path, fmt, schema=e.schema)
        checksum = F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.unix_micros("ts").cast("string"),
                    F.floor(F.col("value") * 100).cast("long")
                    .cast("string"),
                    F.col("props"),
                )), 1, 15,
            ), 16, 10,
        ).cast("bigint")
        out = cur.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.bit_xor(checksum).alias("content_checksum"),
        )
        # census is |event types|-sized: materialize so the finally can
        # delete the interchange files the lazy plan would re-read
        from etl_globalretail_spark.sources.artifacts import materialize

        return materialize(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# q370 — SCHEMA EVOLUTION across parquet generations (the lakehouse
# column-add migration every long-lived table lives through): an old
# generation of files written WITHOUT a column, a new generation
# written WITH it, one `mergeSchema` read across both, and a census
# proving the merge semantics — old-generation rows surface the added
# column as NULL, new-generation values ride through intact, and
# nothing is dropped or duplicated. q286 pins cross-FORMAT
# losslessness; this pins cross-GENERATION schema widening, the other
# axis a 100 TB table mutates along.
#
# Layout: generations are hive partition directories (gen=1, gen=2 —
# partition discovery recovers `gen` as a column, the production
# layout for staged migrations); the split is the fixed date cutoff
# 1998-01-01 on o_orderdate; the added column is priority_rank =
# first digit of o_orderpriority (int). The merged read is asserted
# in pytest to still push filters down to the scan — schema merging
# must not cost pushdown.
#
# Scale shape: one write per generation + one merged scan + one
# 2-row census aggregate. mergeSchema's cost at scale is footer-read
# fan-in, not data — and the pinned semantics are what a metastore
# schema registry would enforce.
# ---------------------------------------------------------------------------


def _register_q370() -> None:
    @_register(
        "q370_schema_evolution",
        oracle="""
        WITH g AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderdate < DATE '1998-01-01'
                        THEN 1 ELSE 2 END AS gen,
                   CASE WHEN o_orderdate < DATE '1998-01-01'
                        THEN NULL
                        ELSE CAST(substr(o_orderpriority, 1, 1)
                                  AS BIGINT) END AS priority_rank
            FROM orders
        )
        SELECT CAST(gen AS BIGINT) AS gen,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum,
               CAST(SUM(CASE WHEN priority_rank IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rank_null,
               CAST(COALESCE(SUM(priority_rank), 0) AS BIGINT)
                   AS rank_sum
        FROM g GROUP BY gen
        """,
    )
    def q370_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Write two parquet generations of orders (the newer with an
        added priority_rank column), read them back through ONE
        mergeSchema scan, and census the widening semantics per
        generation. See block comment."""
        import tempfile

        from etl_globalretail_spark.sources.readers import load_table

        o = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        )
        cutoff = F.lit("1998-01-01").cast("date")
        work = tempfile.mkdtemp(prefix="q370_evo_")
        try:
            o.filter(F.col("o_orderdate") < cutoff).select(
                "o_orderkey", "o_orderdate"
            ).write.parquet(os.path.join(work, "gen=1"))
            o.filter(F.col("o_orderdate") >= cutoff).select(
                "o_orderkey", "o_orderdate",
                F.substring("o_orderpriority", 1, 1).cast("long")
                .alias("priority_rank"),
            ).write.parquet(os.path.join(work, "gen=2"))
            merged = (
                spark.read.option("mergeSchema", "true").parquet(work)
            )
            out = merged.groupBy(
                F.col("gen").cast("long").alias("gen")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("o_orderkey").cast("long").alias("key_checksum"),
                F.sum(
                    F.when(F.col("priority_rank").isNull(), 1)
                    .otherwise(0)
                ).cast("long").alias("n_rank_null"),
                F.coalesce(F.sum("priority_rank"), F.lit(0))
                .cast("long").alias("rank_sum"),
            )
            # 2-row census: materialize so the finally can delete the
            # generation files the lazy plan would re-read
            from etl_globalretail_spark.sources.artifacts import materialize

            return materialize(out)
        finally:
            shutil.rmtree(work, ignore_errors=True)


_register_q370()


# ---------------------------------------------------------------------------
# q374 — Z-ORDER (Morton-curve) clustering layout + min-max file-skipping
# audit. The layout family's missing axis: hive partitioning (above)
# prunes on ONE directory key and compaction (q-compaction family) fixes
# file SIZES, but a 100 TB lakehouse also clusters DATA WITHIN files so
# that per-file min/max statistics (parquet row-group stats, Delta/Iceberg
# file stats) can skip files for predicates on MULTIPLE columns at once —
# Delta's OPTIMIZE ZORDER BY, Iceberg's sort-order rewrite (Morton 1966;
# the space-filling-curve locality argument in Moro et al., "Z-ordering
# for multi-dimensional queries").
#
# Mechanism, exactly as production table formats do it: quantize each
# clustering column to a 16-bit rank-space code, bit-interleave the two
# codes into a 32-bit Morton value, SORT the table by (morton, pk) and
# cut it into equal-row files; per-file (min, max) of each column is then
# the pruning index. The audit runs the same selective predicate
# (user_id in the [40%, 50%] quantile band of its domain) against BOTH
# layouts — Morton vs. the natural time-ordered layout an append-only
# ingest produces — and reports files hit, rows scanned, and the skip
# ratio. The Morton layout bounds BOTH dimensions per file (a file spans
# a curve segment ⇒ a small rectangle of (user, time) space), so a
# single-column predicate hits ~√F of F files instead of all of them;
# time-ordered files each span the full user domain and prune nothing.
#
# Determinism & portability: quantization, interleave, rank, file cut,
# bounds, and censuses are ALL integer arithmetic (shifts/&/div) —
# bit-identical in both engines; the interleave expression is ONE shared
# SQL string evaluated by Spark's F.expr and DuckDB verbatim. Domain
# min/max are driver scalars on the Spark side (1-row agg, the documented
# scalar class) and a CTE in the oracle — exact integers, so they agree.
#
# Scale shape: one scan → map-only quantize/interleave (persisted once;
# consumed by both layout legs) → per-layout two-phase global row number
# (`operators/ranks.global_row_number`; repartitionByRange on the curve
# key — NEVER a single-task global sort; at cluster scale the ranged
# partitions ARE the file writer tasks) → |files|-grain censuses → two
# 1-row aggregates. Output: 2 rows.
# ---------------------------------------------------------------------------

_Q374_FILES = 32


def _morton32_sql(qx: str, qy: str) -> str:
    """Bit-interleave two 16-bit codes into a 32-bit Morton value —
    x bits at odd positions, y at even. Pure integer shifts/masks:
    the SAME text is valid Spark SQL and DuckDB SQL."""
    terms = []
    for i in range(16):
        terms.append(f"((({qx} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({qy} >> {i}) & 1) * {1 << (2 * i)})")
    return "(" + " + ".join(terms) + ")"


def _register_q374() -> None:
    morton = _morton32_sql("qx", "qy")
    oracle = f"""
        WITH ev AS (
            SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events
        ),
        st AS (
            SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
                   MIN(tms) AS mnt, MAX(tms) AS mxt,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM ev
        ),
        params AS (
            SELECT mnu, mxu, mnt, mxt, n_total,
                   (n_total + {_Q374_FILES - 1}) // {_Q374_FILES} AS rpf,
                   mnu + ((mxu - mnu) * 40) // 100 AS lo,
                   mnu + ((mxu - mnu) * 50) // 100 AS hi
            FROM st
        ),
        q AS (
            SELECT event_id, user_id, tms,
                   ((user_id - mnu) * 65535) // greatest(1, mxu - mnu) AS qx,
                   ((tms - mnt) * 65535) // greatest(1, mxt - mnt) AS qy
            FROM ev, params
        ),
        m AS (
            SELECT event_id, user_id, tms, {morton} AS morton FROM q
        ),
        zr AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (ORDER BY morton, event_id) AS rn
            FROM m
        ),
        lr AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (ORDER BY tms, event_id) AS rn
            FROM m
        ),
        zf AS (
            SELECT (rn - 1) // rpf AS file_id,
                   MIN(user_id) AS mn, MAX(user_id) AS mx,
                   COUNT(*) AS n_rows,
                   SUM(CASE WHEN user_id BETWEEN lo AND hi
                       THEN 1 ELSE 0 END) AS n_true
            FROM zr, params GROUP BY 1
        ),
        lf AS (
            SELECT (rn - 1) // rpf AS file_id,
                   MIN(user_id) AS mn, MAX(user_id) AS mx,
                   COUNT(*) AS n_rows,
                   SUM(CASE WHEN user_id BETWEEN lo AND hi
                       THEN 1 ELSE 0 END) AS n_true
            FROM lr, params GROUP BY 1
        ),
        census AS (
            SELECT 'zorder' AS layout,
                   CAST(COUNT(*) AS BIGINT) AS n_files,
                   CAST(SUM(CASE WHEN mn <= hi AND mx >= lo
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
                   CAST(SUM(CASE WHEN mn <= hi AND mx >= lo
                        THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
                   CAST(SUM(n_true) AS BIGINT) AS true_rows
            FROM zf, params
            UNION ALL
            SELECT 'time_linear' AS layout,
                   CAST(COUNT(*) AS BIGINT) AS n_files,
                   CAST(SUM(CASE WHEN mn <= hi AND mx >= lo
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
                   CAST(SUM(CASE WHEN mn <= hi AND mx >= lo
                        THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
                   CAST(SUM(n_true) AS BIGINT) AS true_rows
            FROM lf, params
        )
        SELECT layout, n_files, files_hit, rows_scanned, true_rows,
               CAST((n_files - files_hit) * 1000 // n_files AS BIGINT)
                   AS skip_permil
        FROM census
    """

    @_register("q374_zorder_layout", oracle=oracle)
    def q374_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Morton-interleave clustering vs time-linear layout: per-file
        min/max pruning audit for a selective user_id band predicate.
        See block comment."""
        from etl_globalretail_spark.operators.ranks import global_row_number
        from etl_globalretail_spark.sources.readers import load_table

        ev = load_table(spark, "events", sf_dir).select(
            "event_id", "user_id", F.unix_millis("ts").alias("tms")
        )
        st = ev.agg(
            F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
            F.min("tms").alias("mnt"), F.max("tms").alias("mxt"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        ).collect()[0]  # 1-row driver scalar (documented class)
        mnu, mxu, mnt, mxt, n_total = (
            st["mnu"], st["mxu"], st["mnt"], st["mxt"], st["n_total"]
        )
        rpf = (n_total + _Q374_FILES - 1) // _Q374_FILES
        lo = mnu + ((mxu - mnu) * 40) // 100
        hi = mnu + ((mxu - mnu) * 50) // 100

        base = ev.select(
            "event_id", "user_id", "tms",
            F.expr(
                f"((user_id - {mnu}) * 65535) div greatest(1, {mxu - mnu})"
            ).alias("qx"),
            F.expr(
                f"((tms - {mnt}) * 65535) div greatest(1, {mxt - mnt})"
            ).alias("qy"),
        ).withColumn("morton", F.expr(_morton32_sql("qx", "qy")))
        base = base.persist()  # consumed by BOTH layout rank legs

        def census(order: list[tuple[str, str]], layout: str):
            ranked, _n = global_row_number(base, order, out="rn")
            files = (
                ranked.withColumn("file_id", F.expr(f"(rn - 1) div {rpf}"))
                .groupBy("file_id")
                .agg(
                    F.min("user_id").alias("mn"),
                    F.max("user_id").alias("mx"),
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum(
                        F.col("user_id").between(lo, hi).cast("long")
                    ).alias("n_true"),
                )
            )
            hit = (F.col("mn") <= hi) & (F.col("mx") >= lo)
            return files.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(hit.cast("long")).alias("files_hit"),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0)))
                .cast("long").alias("rows_scanned"),
                F.sum("n_true").cast("long").alias("true_rows"),
            )

        z = census([("morton", "asc"), ("event_id", "asc")], "zorder")
        lin = census([("tms", "asc"), ("event_id", "asc")], "time_linear")
        out = z.unionByName(lin).withColumn(
            "skip_permil",
            F.expr("CAST((n_files - files_hit) * 1000 div n_files AS BIGINT)"),
        )
        return out.select(
            "layout", "n_files", "files_hit", "rows_scanned",
            "true_rows", "skip_permil",
        )


_register_q374()


# ---------------------------------------------------------------------------
# q399 — TAMPER-EVIDENT LOAD AUDIT (hash-chain / Merkle-list over the
# loaded rows — the verifiable-pipeline primitive behind audit logs,
# QLDB-style ledgers and artifact attestation): after a load, emit a
# per-shard hash-chain head and a global root such that changing ANY
# row, reordering within a shard, or dropping a shard flips the root.
# The reference loads rows with no integrity evidence; at 100 TB an
# auditor cannot re-read the corpus, only re-derive the root.
#
# Chain: rows are md5-digested; within shard s (o_orderkey mod 16),
# under the orderkey total order, head_s = fold md5(prev ‖ digest_i)
# from the literal seed 'genesis'; root = md5(head_1 ‖ … ‖ head_16 in
# shard order). The fold is inherently sequential PER SHARD — exactly
# the shape applyInPandas distributes (one Arrow batch per shard,
# shards in parallel, zero cross-shard state); the ≤16 heads then fold
# into the root driver-side. This is also this module's Python-surface
# carrier for a SEQUENTIAL (non-mergeable) per-group kernel.
#
# Oracle: DuckDB replays each shard chain as a recursive CTE over the
# ROW_NUMBER index and folds the root with an ordered string_agg.
# ---------------------------------------------------------------------------


def _register_q399() -> None:
    @_register(
        "q399_hash_chain_audit",
        oracle="""
        WITH RECURSIVE rows_d AS MATERIALIZED (
            SELECT CAST(o_orderkey % 16 AS BIGINT) AS shard,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderkey % 16 ORDER BY o_orderkey
                   ) AS rn,
                   md5(CAST(o_orderkey AS VARCHAR) || '|'
                       || CAST(o_custkey AS VARCHAR) || '|'
                       || CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                               AS VARCHAR) || '|'
                       || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                       || '|' || o_orderpriority) AS digest
            FROM orders
        ),
        maxrn AS MATERIALIZED (
            SELECT shard, CAST(MAX(rn) AS BIGINT) AS mx
            FROM rows_d GROUP BY shard
        ),
        chain AS (
            SELECT shard, rn, md5('genesis' || digest) AS h
            FROM rows_d WHERE rn = 1
            UNION ALL
            SELECT r.shard, r.rn, md5(c.h || r.digest)
            FROM chain c JOIN rows_d r
              ON r.shard = c.shard AND r.rn = c.rn + 1
        ),
        heads AS MATERIALIZED (
            SELECT c.shard, m.mx AS n_rows, c.h AS chain_head
            FROM chain c JOIN maxrn m
              ON m.shard = c.shard AND c.rn = m.mx
        ),
        root AS (
            SELECT md5(string_agg(chain_head, '' ORDER BY shard)) AS root
            FROM heads
        )
        SELECT h.shard, h.n_rows, h.chain_head, r.root
        FROM heads h CROSS JOIN root r
        """,
    )
    def q399_hash_chain_audit(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-shard md5 hash-chain heads + global root over the orders
        load. See block comment for the sequential-fold posture."""
        import pandas as pd

        from etl_globalretail_spark.sources.readers import load_table

        o = load_table(spark, "orders", sf_dir).select(
            (F.col("o_orderkey") % 16).cast("long").alias("shard"),
            F.col("o_orderkey").alias("k"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                    .cast("string"),
                    F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd"),
                    F.col("o_orderpriority"),
                )
            ).alias("digest"),
        )

        def _chain(pdf: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            pdf = pdf.sort_values("k")
            h = "genesis"
            for d in pdf["digest"]:
                h = hashlib.md5((h + d).encode()).hexdigest()
            return pd.DataFrame(
                {
                    "shard": [int(pdf["shard"].iloc[0])],
                    "n_rows": [len(pdf)],
                    "chain_head": [h],
                }
            )

        heads = (
            o.groupBy("shard")
            .applyInPandas(
                _chain, "shard long, n_rows long, chain_head string"
            )
        ).collect()  # ≤ 16 shard heads — bounded driver rows
        import hashlib

        heads.sort(key=lambda r: r["shard"])
        root = hashlib.md5(
            "".join(r["chain_head"] for r in heads).encode()
        ).hexdigest()
        return spark.createDataFrame(
            [(r["shard"], r["n_rows"], r["chain_head"], root)
             for r in heads],
            "shard long, n_rows long, chain_head string, root string",
        )


_register_q399()
