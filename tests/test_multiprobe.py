"""q315 multi-probe LSH: the probed candidate set strictly contains
q82's single bucket, so the top-k cosine list must dominate q82's
pointwise and recall of the exact top-k (q27) must be >= the
single-bucket recall; at least one probed hit should come from a
Hamming-1 bucket on the test corpus (otherwise probing demonstrated
nothing)."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES


def test_q315_dominates_single_bucket(spark, sf_dir):
    single = ALL_QUERIES["q82_ann_lsh_exact"](spark, sf_dir).collect()
    multi = ALL_QUERIES["q315_ann_multiprobe"](spark, sf_dir).collect()
    s = [r["cos_sim"] for r in sorted(single, key=lambda r: r["rank"])]
    m = [r["cos_sim"] for r in sorted(multi, key=lambda r: r["rank"])]
    assert len(m) >= len(s)
    for i, sv in enumerate(s):
        assert m[i] >= sv, (i, m[i], sv)
    # probing reached beyond the home bucket
    assert any(r["probe_hamming"] == 1 for r in multi)
    # every hit is from a probed bucket (hamming <= 1)
    assert all(r["probe_hamming"] in (0, 1) for r in multi)


def test_q315_recall_at_least_single_bucket(spark, sf_dir):
    exact = {
        r["vec_id"]
        for r in ALL_QUERIES["q27_ann_bruteforce"](spark, sf_dir).collect()
    }
    single = {
        r["vec_id"]
        for r in ALL_QUERIES["q82_ann_lsh_exact"](spark, sf_dir).collect()
    }
    multi = {
        r["vec_id"]
        for r in ALL_QUERIES["q315_ann_multiprobe"](spark, sf_dir).collect()
    }
    assert len(multi & exact) >= len(single & exact)
