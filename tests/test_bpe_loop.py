"""q413 iterated-BPE-merge invariants (round 10)."""

from __future__ import annotations

from etl_globalretail_spark.operators.corpus import QUERIES as CQ


def _merges(spark, sf_dir):
    rows = CQ["q413_bpe_merge_loop"](spark, sf_dir).collect()
    return sorted(
        (r["rnk"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in rows
    )


def test_q413_merge_table_invariants(spark, sf_dir):
    rows = _merges(spark, sf_dir)
    assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 6  # fixture vocab never runs dry in 6 rounds
    for _, a, b, merged, pc in rows:
        assert merged == a + b
        assert pc >= 1
    # the selected pair count never increases round over round: merging
    # the argmax can only shrink existing pair counts, and any NEW pair
    # needs an adjacent merged-symbol instance (≤ merges just applied)
    counts = [r[4] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # the same corpus yields the same table bit-for-bit
    assert rows == _merges(spark, sf_dir)


def test_q413_first_merge_agrees_with_q140(spark, sf_dir):
    # round 1 counts single-char adjacent pairs over the corpus word
    # stream — exactly q140's census; the argmax rows must agree.
    top = sorted(_merges(spark, sf_dir))[0]
    q140 = {
        r["rank"]: (r["pair"], r["cnt"])
        for r in CQ["q140_bpe_pair_counts"](spark, sf_dir).collect()
    }
    assert q140[1] == (top[1] + top[2], top[4])


def test_q414_encode_census_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_globalretail_spark.sources.readers import load_table

    rows = CQ["q414_bpe_encode"](spark, sf_dir).collect()
    assert rows
    d = load_table(spark, "documents", sf_dir)
    direct = {
        r["lang"]: (r["n"], r["c"])
        for r in d.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.length("w") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("w")).alias("c"),
        )
        .collect()
    }
    total_tokens = total_chars = 0
    for r in rows:
        n, c = direct[r["lang"]]
        # every word occurrence is encoded (the vocab join is total)
        assert r["n_words"] == n and r["chars_total"] == c
        # merges only ever shrink: n_words ≤ tokens ≤ chars
        assert r["n_words"] <= r["tokens_total"] <= r["chars_total"]
        assert r["tokens_per_kchar"] == r["tokens_total"] * 1000 // c
        total_tokens += r["tokens_total"]
        total_chars += r["chars_total"]
    # six corpus-argmax merges certainly fired somewhere
    assert total_tokens < total_chars
