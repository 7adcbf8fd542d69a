"""q341 HyperLogLog: driver recompute of the whole sketch (md5 hash,
registers, integer harmonic sum, linear-counting branch) plus the
estimator laws — the audit column is the true distinct count and the
relative error stays inside the published HLL bound for m = 256."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.operators.profiling import (
    _Q341_C,
    _Q341_LC,
    _Q341_M,
)
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _hll_estimate(keys) -> tuple[int, int]:
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"hll-{k}".encode()).hexdigest()[:13], 16)
        b, w = h % _Q341_M, h // _Q341_M
        rho = 45 if w == 0 else 45 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    v = _Q341_M - len(regs)
    denom = sum(1 << (45 - m) for m in regs.values()) + v * (1 << 45)
    est = _Q341_C // denom
    if v > 0 and est < 5 * _Q341_M // 2:
        est = _Q341_LC[v - 1]
    return est, v


def test_q341_matches_driver_hll_recompute(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    rows = o.select("o_orderpriority", "o_custkey").collect()
    by_prio: dict[str, set] = {}
    for r in rows:
        by_prio.setdefault(r["o_orderpriority"], set()).add(r["o_custkey"])
    got = {
        r["priority"]: r
        for r in ALL_QUERIES["q341_hll_distinct"](spark, sf_dir).collect()
    }
    assert set(got) == set(by_prio)
    for prio, keys in by_prio.items():
        est, v = _hll_estimate(keys)
        row = got[prio]
        assert row["m_buckets"] == _Q341_M
        assert row["n_exact"] == len(keys)
        assert row["v_empty"] == v
        assert row["est_hll"] == est
        # 3-sigma HLL bound: 3 * 1.04 / sqrt(256) = 19.5% rel. error
        assert row["err_ppm"] == abs(est - len(keys)) * 10**6 // len(keys)
        assert row["err_ppm"] < 195_000
