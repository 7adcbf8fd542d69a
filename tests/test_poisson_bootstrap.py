"""q360 Poisson bootstrap: full driver recompute of every replicate
(md5 draws, CDF-threshold weights, truncated means) plus the bootstrap
laws — n_eff concentrates around n (Poisson(1) row weights), replicate
means bracket the point estimate, and the CDF table is the Poisson(1)
distribution."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from etl_globalretail_spark.plans.analytics import _Q360_CDF, _Q360_R
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q360_cdf_table_is_poisson1():
    for k, v in enumerate(_Q360_CDF):
        want = math.floor(
            sum(math.exp(-1) / math.factorial(i) for i in range(k + 1))
            * 10**6
        )
        assert v == want
    assert _Q360_CDF[0] == 367879
    assert _Q360_CDF[-1] >= 999989  # cdf(<=7) of Poisson(1)


def test_q360_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .filter("event_type = 'purchase'")
        .select("event_id", "value").collect()
    )
    pts = [
        (r["event_id"], math.floor(float(r["value"]) * 100)) for r in rows
    ]
    reps = defaultdict(lambda: [0, 0])  # n_eff, weighted cents
    for eid, cents in pts:
        for r in range(_Q360_R):
            u = int(
                hashlib.md5(f"boot{r}-{eid}".encode()).hexdigest()[:15],
                16,
            ) % 10**6
            w = sum(1 for c in _Q360_CDF if c <= u)
            reps[r][0] += w
            reps[r][1] += w * cents
    got = {
        r["replicate"]: r
        for r in ALL_QUERIES["q360_poisson_bootstrap"](
            spark, sf_dir
        ).collect()
    }
    n = len(pts)
    total = sum(c for _, c in pts)
    assert got[-1]["n_eff"] == n
    assert got[-1]["mean_milli"] == total * 1000 // n
    means = []
    for r in range(_Q360_R):
        ne, wc = reps[r]
        assert got[r]["n_eff"] == ne
        assert got[r]["mean_milli"] == wc * 1000 // ne
        means.append(wc * 1000 // ne)
        # Poisson(1) total: n_eff within 5 sigma of n
        assert abs(ne - n) < 5 * math.isqrt(n) + 5
    assert min(means) <= got[-1]["mean_milli"] <= max(means)
