"""The 'bits ∝ log N' production posture behind q311/q318, measured:
growing the sign-LSH code width shrinks candidate-pair mass
geometrically (Σ|bucket|² over 2^bits buckets), which is exactly the
knob that keeps the LSH mining tiers linear at 100 TB while the gate
pins bits = 4 for determinism. This turns the block-comment claim into
a measured law on the real embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.operators.similarity import (
    _Q82_BITS,
    _rademacher_bucket,
)
from etl_globalretail_spark.sources.readers import load_table


def _pair_mass(spark, sf_dir, bits: int) -> tuple[int, int]:
    """(Σ|bucket|·(|bucket|−1), n_nonempty_buckets) under `bits`-wide
    md5-Rademacher codes — the candidate mass q311's self-join pays."""
    e = load_table(spark, "embeddings", sf_dir)
    vd = F.col("embedding").cast("array<double>")
    sizes = (
        e.select(_rademacher_bucket(vd, bits).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row = sizes.agg(
        F.sum(F.col("n") * (F.col("n") - 1)).alias("mass"),
        F.count(F.lit(1)).alias("nb"),
    ).collect()[0]
    return int(row["mass"]), int(row["nb"])


def test_pair_mass_shrinks_as_bits_grow(spark, sf_dir):
    """Each extra bit roughly halves expected bucket size, quartering
    Σ|bucket|²: demand the measured mass drops by ≥ 2× per +2 bits
    (conservative against skew), and bucket count grows."""
    m4, nb4 = _pair_mass(spark, sf_dir, _Q82_BITS)      # the gate width
    m6, nb6 = _pair_mass(spark, sf_dir, _Q82_BITS + 2)  # production step
    m8, nb8 = _pair_mass(spark, sf_dir, _Q82_BITS + 4)
    assert m4 > 0
    assert m6 * 2 <= m4, (m4, m6)
    assert m8 * 2 <= m6, (m6, m8)
    assert nb4 <= nb6 <= nb8
    # multi-probe's constant: probing (bits+1) buckets at bits+2 still
    # costs less than single-bucket at the gate width once the mass
    # has shrunk 4× — the q318 trade stated as an inequality
    assert (_Q82_BITS + 3) * m6 // (2 ** 2) <= (_Q82_BITS + 1) * m4
