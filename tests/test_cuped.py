"""q357 CUPED: full driver recompute (per-user pre/post cents, pooled
raw-moment theta, truncating adjusted means) plus the CUPED law — the
adjustment preserves the POOLED mean up to the milli quantization (the
covariate is mean-centered pooled, so arm-weighted adjustments cancel)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime

from etl_globalretail_spark.plans.analytics import _tdiv
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q357_matches_driver_recompute(spark, sf_dir):
    cut = datetime(2024, 1, 16)
    rows = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "ts", "value").collect()
    )
    per = defaultdict(lambda: [0, 0])
    for r in rows:
        cents = math.floor(float(r["value"]) * 100)
        per[r["user_id"]][0 if r["ts"] < cut else 1] += cents
    n = len(per)
    sx = sum(v[0] for v in per.values())
    sy = sum(v[1] for v in per.values())
    sxy = sum(v[0] * v[1] for v in per.values())
    sxx = sum(v[0] * v[0] for v in per.values())
    t_ppm = _tdiv((n * sxy - sx * sy) * 10**6, n * sxx - sx * sx)
    xbar_milli = _tdiv(sx * 1000, n)
    got = {
        r["arm"]: r
        for r in ALL_QUERIES["q357_cuped_adjustment"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {0, 1}
    for arm in (0, 1):
        users = {u: v for u, v in per.items() if u % 2 == arm}
        na = len(users)
        sxa = sum(v[0] for v in users.values())
        sya = sum(v[1] for v in users.values())
        r = got[arm]
        assert (r["n_users"], r["sum_x_cents"], r["sum_y_cents"]) == (
            na, sxa, sya,
        )
        assert r["theta_ppm"] == t_ppm
        assert r["mean_y_milli"] == _tdiv(sya * 1000, na)
        want_adj = _tdiv(sya * 1000, na) - _tdiv(
            t_ppm * (_tdiv(sxa * 1000, na) - xbar_milli), 10**6
        )
        assert r["mean_adj_milli"] == want_adj
    # CUPED law: user-weighted adjusted means pool back to the raw
    # pooled mean up to quantization slack (one milli per division)
    pooled_raw = sy * 1000 // n
    pooled_adj = sum(
        got[a]["mean_adj_milli"] * got[a]["n_users"] for a in (0, 1)
    ) // n
    assert abs(pooled_adj - pooled_raw) <= max(
        4, abs(t_ppm) // 1000 + 4
    )
