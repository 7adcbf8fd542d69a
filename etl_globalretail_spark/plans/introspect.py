"""Physical-plan introspection — the engine's own plan-discipline API.

PLANS.md and the plan-lint tests assert properties of executed plans
(filters reach the scan, no stray exchanges, codegen coverage); this
module exposes those probes as functions, so pipelines can ASSERT their
physical contract in code ("this scan must be 2 columns wide", "this
stage is map-only") instead of eyeballing `.explain()` output — the
difference between a plan regression caught in CI and one discovered on
the 100 TB bill.

String-parses the executedPlan tree (the same surface `.explain
("formatted")` prints); no private JVM APIs beyond queryExecution().
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_string(df: DataFrame) -> str:
    # Scan metadata (PushedFilters/ReadSchema lists) is truncated to 100
    # chars by default, which amputates the closing bracket and defeats
    # parsing — widen the limit for the duration of the toString.
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "100000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def scan_report(df: DataFrame) -> list[dict]:
    """One dict per file scan in the executed plan: location fragment,
    pushed filters, partition filters, and the columns actually read.

    The read-schema width is the first thing to check on any new query:
    a scan reading 11 columns for a 2-column aggregate means column
    pruning broke (usually a premature ``select('*')`` or a UDF over the
    whole row).
    """
    plan = _plan_string(df)
    reports = []
    for m in re.finditer(r"FileScan \w+ [^\n]*", plan):
        node = m.group(0)
        out = {"node": node[:160]}
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", node)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", node)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", node)
        out["pushed_filters"] = (
            [f.strip() for f in pushed.group(1).split(",") if f.strip()]
            if pushed else []
        )
        out["partition_filters"] = (
            [f.strip() for f in part.group(1).split(",") if f.strip()]
            if part else []
        )
        out["read_columns"] = (
            [c.split(":")[0].strip() for c in schema.group(1).split(",") if c.strip()]
            if schema else []
        )
        reports.append(out)
    return reports


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (reused exchanges
    count once — they appear as ReusedExchange). The first scale question
    for any operator: how many times does the data cross the network?"""
    plan = _plan_string(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (the ``*(N)`` markers). Fewer,
    wider spans = more of the plan runs as fused generated code; a span
    count that jumps after an edit usually means an expression fell back
    to interpreted eval.

    Under AQE the markers only exist in the FINAL plan, which
    materializes when the query first executes — so this probe runs the
    frame (a count action) if no marker is visible yet. Use on small/
    sampled frames when auditing."""
    spans = set(re.findall(r"\*\((\d+)\)", _plan_string(df)))
    if not spans and "AdaptiveSparkPlan" in _plan_string(df):
        # df.count() would plan a SEPARATE query; only executing THIS
        # frame finalizes its own adaptive plan.
        df.collect()
        spans = set(re.findall(r"\*\((\d+)\)", _plan_string(df)))
    return len(spans)


def assert_map_only(df: DataFrame) -> None:
    """Raise if the plan contains any shuffle — the contract for scoring/
    filtering passes that must stream at input parallelism."""
    n = exchange_count(df)
    if n:
        raise AssertionError(
            f"expected a map-only plan, found {n} exchange(s):\n"
            + _plan_string(df)[:2000]
        )


def assert_scan_width(df: DataFrame, max_columns: int) -> None:
    """Raise if any file scan reads more than ``max_columns`` columns —
    the column-pruning regression guard."""
    for rep in scan_report(df):
        if len(rep["read_columns"]) > max_columns:
            raise AssertionError(
                f"scan reads {len(rep['read_columns'])} columns "
                f"(max {max_columns}): {rep['read_columns']}"
            )
