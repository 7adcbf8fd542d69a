"""q327 LM-score filtering: driver recompute of the rank-free quartile
threshold from q232's scores, plus the retention invariants (dropped
fraction just under a quarter; kept ∪ dropped = scored; threshold is
the realized k-th order statistic)."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q327_matches_score_frame_recompute(spark, sf_dir):
    scores = ALL_QUERIES["q232_bigram_lm_score"](spark, sf_dir).collect()
    by_lang: dict[str, list[int]] = {}
    for r in scores:
        by_lang.setdefault(r["lang"], []).append(r["lm_score_ppm"])
    want = {}
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        k = n // 4
        thr = vals[max(k - 1, 0)] if k > 0 else vals[0]
        # thr = k-th smallest (cc >= k rule): with k>=1 that's vals[k-1]
        dropped = sum(1 for v in vals if v < thr)
        kept = n - dropped
        want[lang] = (n, thr, dropped, kept,
                      sum(v for v in vals if v >= thr))
    got = {
        r["lang"]: (r["n_docs"], r["threshold_ppm"], r["n_dropped"],
                    r["n_kept"], r["kept_score_sum"])
        for r in ALL_QUERIES["q327_lm_score_filter"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_q327_retention_invariants(spark, sf_dir):
    rows = ALL_QUERIES["q327_lm_score_filter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_dropped"] + r["n_kept"] == r["n_docs"], r["lang"]
        # strict-below-threshold drop: never MORE than the quartile
        assert r["n_dropped"] <= r["n_docs"] // 4, r["lang"]
        assert r["n_kept"] >= 1
        assert r["kept_score_sum"] >= r["n_kept"] * r["threshold_ppm"]
