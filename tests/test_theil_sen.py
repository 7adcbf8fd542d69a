"""q358 Theil-Sen: full driver recompute (daily series, all pairwise
truncated slopes, lower-median order statistic) plus the robustness
law — the estimate lies within [min, max] slope and is insensitive to
which tie-mate the total order picks (value equality at the median)."""

from __future__ import annotations

import math
from collections import defaultdict

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


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
        for r in ALL_QUERIES["q358_theil_sen_trend"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(daily)
    for et, series in daily.items():
        pts = sorted(series.items())
        slopes = []
        for i, (x1, y1) in enumerate(pts):
            for x2, y2 in pts[i + 1:]:
                slopes.append((_tdiv((y2 - y1) * 10**6, x2 - x1), x1, x2))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        r = got[et]
        assert r["n_days"] == len(pts)
        assert r["n_pairs"] == len(slopes)
        assert r["ts_slope_micro"] == med
        assert r["min_slope_micro"] == min(s for s, _, _ in slopes)
        assert r["max_slope_micro"] == max(s for s, _, _ in slopes)
        assert (
            r["min_slope_micro"] <= med <= r["max_slope_micro"]
        )
