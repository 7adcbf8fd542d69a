"""Property-based tests (hypothesis) for the cleansing library — SURVEY.md
§5 item 4: idempotence, totality, and date-parse round-trips.

Strategy note: one Spark job per hypothesis example would be minutes per
test; instead each property draws a BATCH of strings and runs one job over
the whole batch (examples capped accordingly).
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_globalretail_spark.functions import (
    clean_text,
    parse_multiformat_date,
    standardize_name,
    standardize_region,
)
from etl_globalretail_spark.functions.numeric import extract_discount_pct

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# Text including whitespace runs, unicode letters, punctuation, digits.
# Excluded: the few code points whose FULL case mapping expands to multiple
# characters (ß→Ss, ʼn→ʼN, ǰ→J̌, İ→i̇, ﬁ-style ligatures are above the cap).
# Titlecasing is genuinely non-idempotent on these in every engine — the
# expansion splits the cased letter from its modifier, so a second pass
# sees a different word structure. Real retail names don't carry them; the
# cleansing contract documents them as out of scope rather than pretending
# idempotence holds where Unicode says it can't.
texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs",),
        exclude_characters="ßŉǰİı",
        max_codepoint=0x2FF,
    ),
    max_size=40,
)
batches = st.lists(st.one_of(st.none(), texts), min_size=1, max_size=25)


def _run(spark, builder, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.o for r in df.select(builder(F.col("x")).alias("o")).collect()]


@given(vals=batches)
@settings(**_SETTINGS)
def test_clean_text_idempotent_and_total(spark, vals):
    once = _run(spark, clean_text, vals)
    # totality: never throws, never returns null (null/'' → sentinel)
    assert all(o is not None for o in once)
    twice = _run(spark, clean_text, once)
    # Idempotence holds except on the reference's own latent edge
    # (etl_completo.py:940-949, replicated for fidelity): a
    # whitespace-ONLY input passes its `if not valor` sentinel check,
    # then collapses to '' — which the SECOND pass maps to 'N/A'. The
    # fixpoint is reached by pass two; assert exactly that behavior.
    # "whitespace" here must be JAVA's \s ([ \t\n\x0B\f\r]) — Python's
    # str.strip()/isspace() also strips \x1c-\x1f etc., which the Spark
    # regexp does NOT treat as whitespace (hypothesis found '\x1f')
    java_ws = set(" \t\n\x0b\f\r")
    for v, o1, o2 in zip(vals, once, twice):
        if v is not None and v != "" and all(ch in java_ws for ch in v):
            assert (o1, o2) == ("", "N/A")
        else:
            assert o2 == o1
    # and 'N/A' itself is a true fixpoint
    assert _run(spark, clean_text, ["N/A"]) == ["N/A"]


@given(vals=batches)
@settings(**_SETTINGS)
def test_standardize_name_idempotent(spark, vals):
    once = _run(spark, standardize_name, vals)
    twice = _run(spark, standardize_name, once)
    assert twice == once


@given(vals=batches)
@settings(**_SETTINGS)
def test_standardize_region_idempotent_and_total(spark, vals):
    once = _run(spark, standardize_region, vals)
    assert all(o is not None for o in once)
    twice = _run(spark, standardize_region, once)
    assert twice == once


@given(vals=batches)
@settings(**_SETTINGS)
def test_extract_discount_pct_total_and_nonnegative(spark, vals):
    out = _run(spark, extract_discount_pct, vals)
    assert all(o is not None and o >= 0.0 for o in out)


@given(
    dates=st.lists(
        st.dates(
            min_value=datetime.date(1900, 1, 1),
            max_value=datetime.date(2099, 12, 31),
        ),
        min_size=1,
        max_size=25,
    ),
    fmt=st.sampled_from(["%Y-%m-%d", "%d/%m/%Y"]),
)
@settings(**_SETTINGS)
def test_date_parse_roundtrip_both_formats(spark, dates, fmt):
    """F9: any real date rendered in either accepted format parses back to
    itself; garbage and sentinels parse to null (totality)."""
    rendered = [d.strftime(fmt) for d in dates]
    out = _run(spark, parse_multiformat_date, rendered)
    assert out == dates
    junk = ["Data Inválida", "N/A", "NULL", "", "31/31/2020", "2020-13-45"]
    assert _run(spark, parse_multiformat_date, junk) == [None] * len(junk)


# ---------------------------------------------------------------------------
# Corpus-curation properties (operators/corpus.py)
# ---------------------------------------------------------------------------

from etl_globalretail_spark.operators.corpus import (  # noqa: E402
    normalized_text_key,
    repetition_stats,
)


@given(vals=batches)
@settings(**_SETTINGS)
def test_normalized_key_total_and_canonical(spark, vals):
    """The canonicalization behind the key is idempotent (fixpoint), so the
    md5 key of a doc equals the key of its own canonical form; and the key
    is total (an md5 hex string even for null-normalizing inputs)."""
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("x")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    rows = df.select(
        normalized_text_key(F.col("x")).alias("k1"),
        normalized_text_key(canon).alias("k2"),
    ).collect()
    for r in rows:
        assert (r.k1 is None) == (r.k2 is None)
        if r.k1 is not None:
            assert r.k1 == r.k2 and len(r.k1) == 32


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from("ab x"),  # tiny alphabet → real repeats
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_repetition_permil_bounded_and_scored_set(spark, docs):
    """rep_permil ∈ [1000/n_grams-ish floor, 1000]; docs with ≥2 tokens are
    scored exactly once, shorter docs never appear."""
    df = spark.createDataFrame(
        [(i, t, "xx", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(docs):
        # split(trim, \s+) semantics: empty text → [''] (1 token)
        n_toks = len(t.strip().split()) if t.strip() != "" else 1
        if n_toks >= 2:
            r = out[i]
            assert 0 < r.rep_permil <= 1000
            assert r.n_grams == n_toks - 1
            assert 1 <= r.max_cnt <= r.n_grams
        else:
            assert i not in out


# ---------------------------------------------------------------------------
# Morton interleave (sources/formats.py) — pure-python properties (the
# Spark column is the same loop; tested for equality in test_formats).
# ---------------------------------------------------------------------------


def _py_morton(x: int, y: int, bits: int = 20) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


@given(
    x=st.integers(min_value=0, max_value=(1 << 20) - 1),
    y=st.integers(min_value=0, max_value=(1 << 20) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_bijective_roundtrip(x, y):
    """The interleave is invertible: de-interleaving the z-value recovers
    (x, y) exactly — no two points share a key."""
    z = _py_morton(x, y)
    rx = sum(((z >> (2 * i + 1)) & 1) << i for i in range(20))
    ry = sum(((z >> (2 * i)) & 1) << i for i in range(20))
    assert (rx, ry) == (x, y)
    assert 0 <= z < 1 << 40


@given(
    x=st.integers(min_value=0, max_value=(1 << 20) - 2),
    y=st.integers(min_value=0, max_value=(1 << 20) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_monotone_in_each_dim(x, y):
    """Fixing one coordinate, the key is strictly increasing in the other
    — the property that makes per-file min/max selective per dimension."""
    assert _py_morton(x + 1, y) > _py_morton(x, y)
    if y < (1 << 20) - 1:
        assert _py_morton(x, y + 1) > _py_morton(x, y)


# ---------------------------------------------------------------------------
# Bloom filter (operators/joins.py) — the no-false-negative invariant under
# arbitrary key sets, on a live Spark frame.
# ---------------------------------------------------------------------------


@given(
    keys=st.lists(
        st.integers(min_value=-(1 << 40), max_value=1 << 40),
        min_size=1, max_size=60, unique=True,
    )
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_never_drops_build_keys(spark, keys):
    from etl_globalretail_spark.operators.joins import (
        bloom_prefilter,
        build_bloom,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    bitmap = build_bloom(df, "k", 1024)
    assert bloom_prefilter(df, "k", bitmap).count() == len(keys)
