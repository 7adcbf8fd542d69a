"""q348 postings compression: full driver recompute of the bigram
inverted index, delta gaps, and varint byte counts, plus the coding
laws — varint never exceeds raw on 8-byte ids (<= 8 bytes/gap ... true
since gaps < 2^56 here) and dense postings compress harder."""

from __future__ import annotations

from collections import defaultdict

from etl_globalretail_spark.plans.registry import ALL_QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _varint_len(g: int) -> int:
    return (g.bit_length() + 6) // 7


def test_q348_matches_driver_recompute(spark, sf_dir):
    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text").collect()
    )
    postings = defaultdict(set)
    for r in docs:
        w = r["text"].strip().split()
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            postings[f"{w[i]} {w[i + 1]}"].add(r["doc_id"])
    bands = defaultdict(lambda: [0, 0, 0])  # n_tokens, n_postings, varint
    for tok, ids in postings.items():
        ordered = sorted(ids)
        vb = _varint_len(ordered[0] + 1) + sum(
            _varint_len(b - a) for a, b in zip(ordered, ordered[1:])
        )
        band = len(ids).bit_length()
        bands[band][0] += 1
        bands[band][1] += len(ids)
        bands[band][2] += vb
    got = {
        r["df_band"]: r
        for r in ALL_QUERIES["q348_postings_compression"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(bands)
    for band, (nt, np_, vb) in bands.items():
        r = got[band]
        assert (r["n_tokens"], r["n_postings"]) == (nt, np_)
        assert r["raw_bytes"] == np_ * 8
        assert r["varint_bytes"] == vb
        assert r["size_permil"] == vb * 1000 // (np_ * 8)
        assert vb <= np_ * 8  # varint never loses on 8-byte ids
