"""q312 fuzzy decontamination: the census must equal a driver recompute
from the q66 verified pair set, and the fuzzy tier must be able to flag
docs the exact tier (q87) misses in principle (they share a verified
near-dup link, not necessarily >= 5 exact shingles)."""

from __future__ import annotations

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def test_q312_census_matches_pair_crossings(spark, sf_dir):
    pairs = ALL_QUERIES["q66_minhash_pairs_exact"](spark, sf_dir).collect()
    flagged = set()
    for r in pairs:
        ab, bb = r["id_a"] % 17 == 0, r["id_b"] % 17 == 0
        if ab != bb:
            flagged.add(r["id_b"] if ab else r["id_a"])
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang"
    ).collect()
    expect = {}
    for r in docs:
        if r["doc_id"] % 17 == 0:
            continue
        n, c, s = expect.get(r["lang"], (0, 0, 0))
        hit = r["doc_id"] in flagged
        expect[r["lang"]] = (
            n + 1, c + (1 if hit else 0), s + (r["doc_id"] if hit else 0)
        )
    got = {
        r["lang"]: (
            r["n_docs"], r["n_fuzzy_contaminated"],
            r["sum_contaminated_ids"],
        )
        for r in ALL_QUERIES["q312_fuzzy_decontamination"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
    # non-degenerate on the test corpus: at least one flag exists
    assert sum(v[1] for v in got.values()) >= 1
