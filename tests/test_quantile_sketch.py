"""q345 quantile sketch: full driver recompute of the hash-Bernoulli
sample and its weighted-rank estimates, the merge law (sharded sketches
union to the whole-corpus sketch verbatim), and the rank-error bound."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.operators.profiling import _Q345_PHIS
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _load(spark, sf_dir):
    rows = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .collect()
    )
    base = []
    for r in rows:
        import math

        cents = math.floor(float(r["l_extendedprice"]) * 100)
        rid = r["l_orderkey"] * 10 + r["l_linenumber"]
        h = int(
            hashlib.md5(
                f"{r['l_orderkey']}-{r['l_linenumber']}".encode()
            ).hexdigest()[:13],
            16,
        )
        base.append((cents, rid, h))
    return base


def test_q345_matches_driver_recompute_and_merge_law(spark, sf_dir):
    base = _load(spark, sf_dir)
    n = len(base)
    s = 1 << max(0, n.bit_length() - 11)
    sample = sorted(
        [(c, i) for c, i, h in base if h % s == 0]
    )
    got = {
        r["phi_ppm"]: r
        for r in ALL_QUERIES["q345_quantile_sketch"](spark, sf_dir).collect()
    }
    assert set(got) == set(_Q345_PHIS)
    for phi in _Q345_PHIS:
        r = got[phi]
        assert (r["n_rows"], r["scale_s"]) == (n, s)
        assert r["sample_n"] == len(sample)
        target = (phi * n + 999999) // 10**6
        pos = max(1, min(len(sample), (target + s - 1) // s))
        est = sample[pos - 1][0]
        assert r["est_cents"] == est
        assert r["count_lt"] == sum(1 for c, _, _ in base if c < est)
        assert r["count_le"] == sum(1 for c, _, _ in base if c <= est)
        err = max(0, max(r["count_lt"] + 1 - target, target - r["count_le"]))
        assert r["rank_err_ppm"] == err * 10**6 // n
        # 3-sigma Bernoulli-sample rank bound at ~2^11 effective rows
        assert r["rank_err_ppm"] < 60_000

    # merge law: sharding the corpus arbitrarily and unioning the
    # per-shard samples IS the whole-corpus sample (fixed coin)
    shard_a = [(c, i) for c, i, h in base if i % 3 == 0 and h % s == 0]
    shard_b = [(c, i) for c, i, h in base if i % 3 != 0 and h % s == 0]
    assert sorted(shard_a + shard_b) == sample
