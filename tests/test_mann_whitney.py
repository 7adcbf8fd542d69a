"""q359 Mann-Whitney U: full driver recompute via a BRUTE-FORCE pair
count (U_A = #\\{a > b\\} + #ties/2, the definition — independent of the
midrank formulation), plus a scipy-free z cross-check and the U_A +
U_B = n_a·n_b identity."""

from __future__ import annotations

import math
from collections import Counter

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q359_matches_bruteforce_definition(spark, sf_dir):
    rows = (
        load_table(spark, "orders", sf_dir)
        .filter("o_orderstatus IN ('F', 'O')")
        .select("o_orderstatus", "o_totalprice").collect()
    )
    a = Counter(
        math.floor(float(r["o_totalprice"]) * 100)
        for r in rows if r["o_orderstatus"] == "F"
    )
    b = Counter(
        math.floor(float(r["o_totalprice"]) * 100)
        for r in rows if r["o_orderstatus"] == "O"
    )
    na, nb = sum(a.values()), sum(b.values())
    # 2U_A = 2·#{a>b} + #{a==b} — the definition, no ranks involved
    bs = sorted(b.items())
    import bisect

    bkeys = [k for k, _ in bs]
    bpref = [0]
    for _, c in bs:
        bpref.append(bpref[-1] + c)
    u2 = 0
    for av, ac in a.items():
        i = bisect.bisect_left(bkeys, av)
        u2 += 2 * ac * bpref[i]
        if i < len(bkeys) and bkeys[i] == av:
            u2 += ac * bs[i][1]
    (got,) = ALL_QUERIES["q359_mann_whitney_u"](spark, sf_dir).collect()
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["u2_a"] == u2
    assert got["mean_u2"] == na * nb
    # U_A + U_B = na·nb identity (doubled form)
    ties = Counter(a) + Counter(b)
    tiesum = sum(t**3 - t for t in ties.values() if t >= 2)
    assert got["n_tie_values"] == sum(
        1 for t in ties.values() if t >= 2
    )
    n = na + nb
    var = na * nb / 3.0 * ((n + 1.0) - tiesum / (n * (n - 1.0)))
    z = (u2 - na * nb) / math.sqrt(var)
    assert abs(got["z_score"] - z) < 1e-9
