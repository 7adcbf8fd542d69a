"""q346 streaming HLL: the streamed register sketch equals a driver
whole-table recompute (merge law executed by the engine across 3 real
micro-batches), and the batch audit column is the true distinct count."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.operators.profiling import (
    _Q341_C,
    _Q341_LC,
    _Q341_M,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q346_stream_equals_batch_sketch(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "user_id").collect()
    )
    by_type: dict[str, set] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], set()).add(r["user_id"])
    got = {
        r["event_type"]: r
        for r in ALL_QUERIES["q346_streaming_hll"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for et, users in by_type.items():
        regs: dict[int, int] = {}
        for u in users:
            h = int(
                hashlib.md5(f"hllu-{u}".encode()).hexdigest()[:13], 16
            )
            b, w = h % _Q341_M, h // _Q341_M
            rho = 45 if w == 0 else 45 - w.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        v = _Q341_M - len(regs)
        denom = sum(1 << (45 - m) for m in regs.values()) + v * (1 << 45)
        est = _Q341_C // denom
        if v > 0 and est < 5 * _Q341_M // 2:
            est = _Q341_LC[v - 1]
        r = got[et]
        assert r["n_batches"] == 3
        assert r["n_exact"] == len(users)
        assert r["v_empty"] == v
        assert r["est_hll"] == est
        assert r["err_ppm"] < 195_000  # 3-sigma HLL bound, m = 256
