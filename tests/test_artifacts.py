"""Reliable-artifact tier (VERDICT r3 item 4).

Every lineage-cutting artifact site routes through
``sources/artifacts.materialize``: localCheckpoint by default,
reliable DFS-backed ``checkpoint()`` when
``SPARK_GRAFT_RELIABLE_ARTIFACTS=1``. These tests drive the same
artifact-heavy queries through BOTH tiers and assert identical row
multisets — the 100 TB fault-tolerance story with a correctness proof.
"""

from __future__ import annotations

import os

import pytest

from etl_globalretail_spark.plans.analytics import _EDGE_MEMO_ATTR
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources import artifacts

# One query per artifact pattern the verdict named:
# - q154: the session-memoized co-purchase edge artifact (edge memo)
# - q212: per-round k-core frames (iterative _checkpoint loop)
# - q208: the span-store checkpoint in corpus.py
# - q249: incremental-view stored state (scd.py)
_ARTIFACT_QUERIES = [
    "q154_triangle_count",
    "q212_kcore_peeling",
    "q208_source_overlap_matrix",
    "q249_incremental_view",
]


def _rows(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def _reset_session_artifacts(spark):
    # the edge artifact is memoized per session — drop it so the next
    # call re-materializes on the currently-selected tier
    if hasattr(spark, _EDGE_MEMO_ATTR):
        delattr(spark, _EDGE_MEMO_ATTR)


@pytest.mark.parametrize("name", _ARTIFACT_QUERIES)
def test_reliable_tier_hash_equal(spark, sf_dir, name, monkeypatch):
    _reset_session_artifacts(spark)
    monkeypatch.delenv(artifacts.FLAG, raising=False)
    local_rows = _rows(spark, sf_dir, name)
    assert local_rows  # non-trivial fixture

    _reset_session_artifacts(spark)
    monkeypatch.setenv(artifacts.FLAG, "1")
    assert artifacts.reliable_enabled()
    reliable_rows = _rows(spark, sf_dir, name)
    _reset_session_artifacts(spark)  # don't leak a reliable-tier memo

    assert reliable_rows == local_rows


def test_reliable_tier_sets_checkpoint_dir(spark, sf_dir, monkeypatch):
    monkeypatch.setenv(artifacts.FLAG, "1")
    _reset_session_artifacts(spark)
    _rows(spark, sf_dir, "q154_triangle_count")
    ckdir = spark.sparkContext.getCheckpointDir()
    assert ckdir, "reliable tier must configure a checkpoint dir"
    assert os.path.isdir(ckdir.removeprefix("file:"))
    _reset_session_artifacts(spark)


def test_flag_parsing(monkeypatch):
    for v, expect in [("1", True), ("true", True), ("YES", True),
                      ("on", True), ("0", False), ("", False),
                      ("off", False)]:
        monkeypatch.setenv(artifacts.FLAG, v)
        assert artifacts.reliable_enabled() is expect
    monkeypatch.delenv(artifacts.FLAG)
    assert artifacts.reliable_enabled() is False
