"""q358 Siegel repeated median: full driver recompute (per-point inner
medians, outer median, truncated slopes) plus the orientation-free
slope law ((a) div (b) == (-a) div (-b) under truncation) and the
estimator-in-range law."""

from __future__ import annotations

import math
from collections import defaultdict

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_slope_is_orientation_free():
    for a, b in [(7, 3), (-7, 3), (7, -3), (-7, -3), (5, 2), (-5, 2)]:
        assert _tdiv(a, b) == _tdiv(-a, -b)


def test_q358_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "ts", "value").collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        d = int(r["ts"].timestamp()) // 86400
        daily[r["event_type"]][d] += math.floor(float(r["value"]) * 100)
    got = {
        r["event_type"]: r
        for r in ALL_QUERIES["q358_siegel_repeated_median"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(daily)
    for et, series in daily.items():
        pts = sorted(series.items())
        meds = []
        for xi, yi in pts:
            slopes = sorted(
                (_tdiv((yj - yi) * 10**6, xj - xi), xj)
                for xj, yj in pts if xj != xi
            )
            meds.append((slopes[(len(slopes) + 1) // 2 - 1][0], xi))
        meds.sort()
        est = meds[(len(meds) + 1) // 2 - 1][0]
        r = got[et]
        assert r["n_days"] == len(pts)
        assert r["siegel_slope_micro"] == est
        assert r["min_med_micro"] == min(m for m, _ in meds)
        assert r["max_med_micro"] == max(m for m, _ in meds)
        assert r["min_med_micro"] <= est <= r["max_med_micro"]
