"""Pins the engine semantics the q280 oracle replays (see the block
comment in streaming/stateful.py): late-filter lag, strict boundary
predicate, strict timeout firing, eviction + restart."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from etl_globalretail_spark.streaming.stateful import evicting_user_totals

_SCHEMA = (
    "user_id long, event_type string, ts timestamp, value double"
)
_SEQ = [0]


def _run_waves(spark, tmp_path, waves_rows):
    """Stage rows as mtime-ordered single-file waves and run the evicting
    state machine; returns the full emission list."""
    work = str(tmp_path / f"ev{_SEQ[0]}")
    _SEQ[0] += 1
    sdir = os.path.join(work, "stream")
    os.makedirs(sdir)
    for i, rows in enumerate(waves_rows):
        tmp = os.path.join(work, f"w{i}")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(tmp)
        dst = os.path.join(sdir, f"wave_{i}.parquet")
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
    )
    name = f"evict_test_sink_{_SEQ[0]}"
    q = (
        evicting_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    shutil.rmtree(work, ignore_errors=True)
    return rows


_M = dt.datetime(2024, 1, 2, 0, 0, 0)  # global max -> W = M - 30 min
_W = _M - dt.timedelta(minutes=30)


def test_eviction_and_late_acceptance(spark, tmp_path):
    """u1: wave-0 only, idle past the margin -> evicted in batch 1.
    u2: out-of-order wave-1 row far below W -> ACCEPTED (late filter
    lags one batch). u3: max-carrier, absent from wave 1 but within the
    margin -> survives."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    waves = [
        [(1, "a", t0, 1.0), (2, "a", t0, 1.0), (3, "a", _M, 1.0)],
        [(2, "a", t0 + dt.timedelta(minutes=1), 1.0)],
        [(3, "a", _M, 1.0)],
    ]
    traj = {}
    for r in _run_waves(spark, tmp_path, waves):
        traj.setdefault(r.user_id, []).append((r.kind, r.n))
    assert sorted(traj[1]) == [("evicted", 1), ("update", 1)]
    assert sorted(traj[2]) == [("update", 1), ("update", 2)]  # late row in
    assert sorted(traj[3]) == [("update", 1), ("update", 2)]  # no eviction


def test_late_filter_boundary_is_strict(spark, tmp_path):
    """Batch-2 input is filtered against W with a STRICT predicate at
    microsecond resolution: ts == W dropped, ts = W + 500 us kept."""
    probes = [
        (10, _W + dt.timedelta(seconds=1), True),
        (11, _W + dt.timedelta(milliseconds=1), True),
        (12, _W + dt.timedelta(microseconds=500), True),
        (13, _W, False),
        (14, _W - dt.timedelta(milliseconds=1), False),
    ]
    waves = [
        [(9, "a", _M, 1.0)],
        [(8, "a", _M - dt.timedelta(hours=5), 1.0)],
        [(u, "a", t, 1.0) for u, t, _ in probes],
    ]
    got = {r.user_id for r in _run_waves(spark, tmp_path, waves)}
    for u, _, kept in probes:
        assert (u in got) == kept, u


def test_eviction_margin_boundary_is_strict(spark, tmp_path):
    """Timeout fires iff armed timestamp is STRICTLY behind W: a user
    whose wave-0 max is exactly W - margin survives; 1 ms older evicts."""
    margin = dt.timedelta(minutes=10)
    waves = [
        [
            (1, "a", _W - margin, 1.0),  # t == W -> NOT fired (strict)
            (2, "a", _W - margin - dt.timedelta(milliseconds=1), 1.0),
            (9, "a", _M, 1.0),
        ],
        [(8, "a", _M - dt.timedelta(hours=5), 1.0)],
        [(9, "a", _M, 1.0)],
    ]
    kinds = {}
    for r in _run_waves(spark, tmp_path, waves):
        kinds.setdefault(r.user_id, set()).add(r.kind)
    assert kinds[1] == {"update"}
    assert kinds[2] == {"update", "evicted"}


def test_post_eviction_restart(spark, tmp_path):
    """An evicted group reappearing in a surviving wave-2 row restarts
    from zero — the restart's totals count only the new row."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    waves = [
        [(1, "a", t0, 1.0), (1, "a", t0 + dt.timedelta(minutes=5), 2.0),
         (9, "a", _M, 1.0)],
        [(8, "a", t0, 1.0)],
        [(1, "a", _M - dt.timedelta(minutes=5), 7.0)],  # above W: survives
    ]
    traj = {}
    for r in _run_waves(spark, tmp_path, waves):
        traj.setdefault(r.user_id, []).append((r.kind, r.n, r.cents))
    assert sorted(traj[1]) == [
        ("evicted", 2, 300),  # totals at eviction
        ("update", 1, 700),   # restart: only the wave-2 row
        ("update", 2, 300),   # pre-eviction cumulative
    ]
