"""q350 classifier calibration: consistency with q308's (label, decile)
census (same trained scorer — the shared-pipeline refactor's contract)
plus the ECE identities — summary row totals equal the corpus, per-bin
gaps reweight to the ECE, and probabilities stay in [0, 1e6]."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q350_consistent_with_q308_and_ece_identity(spark, sf_dir):
    cal = ALL_QUERIES["q350_classifier_calibration"](
        spark, sf_dir
    ).collect()
    census = ALL_QUERIES["q308_quality_classifier"](
        spark, sf_dir
    ).collect()
    bins = [r for r in cal if r["bucket"] >= 0]
    (tot,) = [r for r in cal if r["bucket"] == -1]
    # same trained weights => same decile histogram
    q308_bins: dict[int, int] = {}
    q308_pos: dict[int, int] = {}
    for r in census:
        q308_bins[r["bucket"]] = q308_bins.get(r["bucket"], 0) + r["n_docs"]
        if r["label"] == 1:
            q308_pos[r["bucket"]] = (
                q308_pos.get(r["bucket"], 0) + r["n_docs"]
            )
    assert {r["bucket"]: r["n_docs"] for r in bins} == q308_bins
    assert {
        r["bucket"]: r["n_pos"] for r in bins if r["n_pos"]
    } == q308_pos
    # summary row identities
    assert tot["n_docs"] == sum(r["n_docs"] for r in bins)
    assert tot["n_pos"] == sum(r["n_pos"] for r in bins)
    assert tot["sum_p_ppm"] == sum(r["sum_p_ppm"] for r in bins)
    ece = (
        sum(abs(r["sum_p_ppm"] - 10**6 * r["n_pos"]) for r in bins)
        // tot["n_docs"]
    )
    assert tot["gap_ppm"] == ece
    assert 0 <= ece <= 10**6
    for r in bins:
        assert 0 <= r["sum_p_ppm"] <= 10**6 * r["n_docs"]
        assert r["gap_ppm"] == (
            abs(r["sum_p_ppm"] - 10**6 * r["n_pos"]) // r["n_docs"]
        )
