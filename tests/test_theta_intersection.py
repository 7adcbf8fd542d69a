"""q352 theta intersection: full driver recompute of both KMV sketches
and the theta estimator, plus the theta laws — the common sample is the
true intersection's below-theta slice (no false positives: equal hashes
mean equal keys under the shared md5 space), and estimates are exact
when both sides keep fewer than k."""

from __future__ import annotations

import hashlib

from etl_globalretail_spark.operators.profiling import _KMV_H, _KMV_K
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _hv(u) -> int:
    return int(hashlib.md5(f"{u}kmv".encode()).hexdigest()[:13], 16)


def test_q352_matches_driver_recompute(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "user_id").collect()
    )
    ha = sorted({_hv(r["user_id"]) for r in rows
                 if r["event_type"] == "click"})
    hb = sorted({_hv(r["user_id"]) for r in rows
                 if r["event_type"] == "purchase"})
    ska, skb = ha[:_KMV_K], hb[:_KMV_K]
    th_a = ska[-1] if len(ska) >= _KMV_K else _KMV_H
    th_b = skb[-1] if len(skb) >= _KMV_K else _KMV_H
    theta = min(th_a, th_b)
    sa = {h for h in ska if h < theta}
    sb = {h for h in skb if h < theta}
    (got,) = ALL_QUERIES["q352_theta_intersection"](
        spark, sf_dir
    ).collect()
    assert (got["n_kept_a"], got["n_kept_b"]) == (len(ska), len(skb))
    assert got["theta"] == theta
    assert got["n_common_sample"] == len(sa & sb)
    assert got["n_union_sample"] == len(sa | sb)
    assert got["est_intersection"] == len(sa & sb) * _KMV_H // theta
    exact_i = len(set(ha) & set(hb))
    exact_u = len(set(ha) | set(hb))
    assert got["exact_intersection"] == exact_i
    assert got["est_jaccard_ppm"] == (
        len(sa & sb) * 10**6 // max(len(sa | sb), 1)
    )
    assert got["exact_jaccard_ppm"] == exact_i * 10**6 // exact_u
    # theta law: the common sample is the true intersection's
    # below-theta slice
    assert sa & sb == {h for h in set(ha) & set(hb) if h < theta}
