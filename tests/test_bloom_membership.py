"""q328 Bloom membership: driver recompute of the whole filter (md5
positions, adaptive sizing) plus the defining Bloom laws — zero false
negatives, positives ⊇ members, FPR consistent with the confusion
counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.profiling import _Q328_K
from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _pos(j: int, key: int, m: int) -> int:
    h = hashlib.md5(f"bl{j}-{key}".encode()).hexdigest()[:15]
    return int(h, 16) % m


def test_q328_matches_driver_bloom_recompute(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    members = {
        r["o_custkey"]
        for r in o.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey").distinct().collect()
    }
    custs = [r["c_custkey"] for r in c.select("c_custkey").collect()]
    m = 4 << len(members).bit_length()
    bits = {_pos(j, k, m) for k in members for j in range(_Q328_K)}
    bloom_pos = {
        k for k in custs
        if all(_pos(j, k, m) in bits for j in range(_Q328_K))
    }
    fp = len(bloom_pos - members)
    negatives = len(custs) - len(members)
    want = (
        len(custs), len(members), len(bloom_pos),
        len(bloom_pos & members), fp,
        fp * 1000000 // max(negatives, 1), m,
    )
    got = ALL_QUERIES["q328_bloom_membership"](spark, sf_dir).collect()[0]
    assert tuple(got) == want


def test_q328_bloom_laws(spark, sf_dir):
    r = ALL_QUERIES["q328_bloom_membership"](spark, sf_dir).collect()[0]
    # NO false negatives: every true member passes the filter
    assert r["n_true_positive"] == r["n_members"]
    # positives = members + false positives, never fewer
    assert r["n_bloom_positive"] == r["n_true_positive"] + r["n_false_positive"]
    assert r["n_bloom_positive"] >= r["n_members"]
    # the selective slice leaves a real non-member population
    assert r["n_members"] < r["n_customers"]
    # fpr consistent with the counts
    neg = r["n_customers"] - r["n_members"]
    assert r["fpr_ppm"] == r["n_false_positive"] * 1000000 // max(neg, 1)
