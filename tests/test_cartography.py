"""q356 dataset cartography: the census partitions the corpus (cell
counts sum to q308's doc total), trajectory bands are internally
consistent (sums inside band bounds), and labels split as q308 reports;
a pure-Python trajectory recompute would duplicate q308's pinned
full-trajectory test — here we pin the COMPOSITION instead."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q356_partitions_corpus_and_bands_consistent(spark, sf_dir):
    carto = ALL_QUERIES["q356_dataset_cartography"](
        spark, sf_dir
    ).collect()
    census = ALL_QUERIES["q308_quality_classifier"](
        spark, sf_dir
    ).collect()
    n_total = sum(r["n_docs"] for r in census)
    n_pos = sum(r["n_docs"] for r in census if r["label"] == 1)
    assert sum(r["n_docs"] for r in carto) == n_total
    assert sum(
        r["n_docs"] for r in carto if r["label"] == 1
    ) == n_pos
    for r in carto:
        lo_c = r["conf_band"] * 100000
        hi_c = lo_c + 100000
        assert lo_c * r["n_docs"] <= r["sum_conf_ppm"] < hi_c * r["n_docs"]
        lo_v = r["var_band"] * 100000
        hi_v = lo_v + 100000
        assert lo_v * r["n_docs"] <= r["sum_var_ppm"] < hi_v * r["n_docs"]
        assert 0 <= r["conf_band"] <= 10
        assert 0 <= r["var_band"] <= 10
