"""Distributed replacements for partition-less (single-task) windows.

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels the WHOLE frame
through one task (``WindowExec: No Partition Defined``) — fine on a
bounded aggregate, a scale-killer at fact grain (VERDICT r5 item 2: q141's
ntile and q149's row_number ran the global sort over all of lineitem).

Both helpers here are the standard two-phase decomposition, the same
device as ``sources.readers.global_index`` generalized to multi-column
(asc/desc) total orders and to running prefix aggregates:

1. ``repartitionByRange`` on the sort keys → disjoint, ORDERED key
   ranges; ``sortWithinPartitions`` orders each range internally — all
   parallel, no single-partition exchange anywhere.
2. One tiny job collects a ≤ ``n_ranges``-row per-partition scalar
   (row counts, or the partition's max/min) — the same class of
   driver-side scalar as the documented k-centroid collects.
3. A per-partition window (PARTITIONED BY the range id) plus the scalar
   stitched in reproduces the single-window answer exactly: global
   row_number = partition offset + in-partition row_number; exclusive
   prefix max/min = combine(in-partition exclusive prefix, running
   aggregate of all earlier partitions).

Determinism: ``repartitionByRange`` samples boundaries with a
per-execution seed, so the ranged frame is materialized ONCE
(``artifacts.materialize``) before the scalar job and the window job read
it — otherwise the two jobs could re-plan DIFFERENT boundaries and
compose offsets from one partitioning with ranks from another (the
``global_index`` determinism note). Given the pin, the composition is
hash-identical to the single-window form for any boundary placement,
because the sort order is total (callers pass a unique tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_globalretail_spark.sources.artifacts import materialize

_PID = "__rk_pid"


def _sort_exprs(order: list[tuple[str, str]]) -> list[Column]:
    return [
        F.col(name).desc() if direction == "desc" else F.col(name).asc()
        for name, direction in order
    ]


def _ranged(df: DataFrame, order: list[tuple[str, str]], n_ranges: int):
    exprs = _sort_exprs(order)
    ranged = (
        df.repartitionByRange(n_ranges, *exprs)
        .sortWithinPartitions(*exprs)
        .withColumn(_PID, F.spark_partition_id())
        .transform(materialize)
    )
    return ranged, exprs


def global_row_number(
    df: DataFrame,
    order: list[tuple[str, str]],
    out: str = "rn",
    n_ranges: int = 16,
) -> tuple[DataFrame, int]:
    """1-based global row number under a multi-column total order.

    Returns ``(frame_with_out_column, total_row_count)`` — the count is a
    free by-product of the offsets job, so callers needing ``n`` (ntile
    arithmetic, percentile ranks) don't pay a second pass.

    ``order`` must be a TOTAL order (include a unique tie-break): with
    ties, which duplicate gets which rank would depend on boundary
    placement.
    """
    ranged, exprs = _ranged(df, order, n_ranges)
    counts = {
        r[_PID]: r["count"] for r in ranged.groupBy(_PID).count().collect()
    }
    offsets, acc = {}, 0
    for pid in range(n_ranges):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy(_PID).orderBy(*exprs)
    ranked = ranged.withColumn(
        out, (off[F.col(_PID)] + F.row_number().over(w)).cast("long")
    ).drop(_PID)
    return ranked, acc


def global_prefix_agg(
    df: DataFrame,
    order: list[tuple[str, str]],
    value_col: str,
    agg: str = "max",
    out: str = "prefix",
    n_ranges: int = 16,
) -> DataFrame:
    """Exclusive running max/min of ``value_col`` over the global total
    order — NULL for the global first row, exactly
    ``agg(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    The sort-scan skyline primitive (q176/q260): per-partition exclusive
    prefix window, combined with a carry-in (the running aggregate of all
    EARLIER partitions' totals, a ≤ n_ranges-row driver scalar) via
    greatest/least, whose null-skipping is precisely the combine this
    needs (first row of partition p sees only the carry; partition 0's
    carry is NULL).
    """
    if agg not in ("max", "min"):
        raise ValueError(f"agg must be 'max' or 'min', got {agg!r}")
    ranged, exprs = _ranged(df, order, n_ranges)
    vtype = ranged.schema[value_col].dataType
    per = {
        r[_PID]: r["v"]
        for r in ranged.groupBy(_PID)
        .agg((F.max(value_col) if agg == "max" else F.min(value_col)).alias("v"))
        .collect()
    }
    carry, running = {}, None
    for pid in range(n_ranges):
        carry[pid] = running
        v = per.get(pid)
        if v is not None:
            if running is None:
                running = v
            else:
                running = max(running, v) if agg == "max" else min(running, v)
    carry_map = F.create_map(
        *[
            x
            for pid, v in carry.items()
            for x in (F.lit(pid), F.lit(v).cast(vtype))
        ]
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part_prefix = (
        F.max(value_col).over(w) if agg == "max" else F.min(value_col).over(w)
    )
    combine = F.greatest if agg == "max" else F.least
    return ranged.withColumn(
        out, combine(part_prefix, carry_map[F.col(_PID)])
    ).drop(_PID)
