"""q332 JL projection: pure-Python recompute of the quantized ±1
projection and distortion histogram, plus the JL concentration law on
the real embeddings."""

from __future__ import annotations

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.similarity import (
    _JL_D,
    _JL_DPRIME,
    _jl_sign,
    QUERIES,
)


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import math

    vecs = {
        i: [int(math.floor(float(x) * 1000)) for x in emb]
        for i, emb in zip(
            tbl.column("vec_id").to_pylist(),
            tbl.column("embedding").to_pylist(),
        )
    }
    smat = [[_jl_sign(j, k) for k in range(_JL_D)] for j in range(_JL_DPRIME)]

    def project(xq):
        return [sum(s * x for s, x in zip(row, xq)) for row in smat]

    hist: dict[int, list[int]] = {}
    ratios = []
    for ida in sorted(vecs):
        if ida % 2 or ida + 1 not in vecs:
            continue
        xa, xb = vecs[ida], vecs[ida + 1]
        exact = sum((x - y) ** 2 for x, y in zip(xa, xb))
        ca, cb = project(xa), project(xb)
        proj = sum((x - y) ** 2 for x, y in zip(ca, cb))
        r = (
            1000000
            if exact == 0
            else (1000000 * proj) // (_JL_DPRIME * exact)
        )
        ratios.append(r)
        b = r // 250000
        cur = hist.setdefault(b, [0, r, r, 0])
        cur[0] += 1
        cur[1] = min(cur[1], r)
        cur[2] = max(cur[2], r)
        cur[3] += r
    return hist, ratios


def test_q332_matches_pure_python(spark, sf_dir):
    hist, ratios = _recompute(sf_dir)
    rows = QUERIES["q332_jl_projection"](spark, sf_dir).collect()
    assert len(rows) == len(hist)
    for r in rows:
        n, mn, mx, sm = hist[r["bucket"]]
        assert (r["n_pairs"], r["min_ppm"], r["max_ppm"], r["sum_ppm"]) == (
            n, mn, mx, sm,
        )
    assert sum(r["n_pairs"] for r in rows) == len(ratios)


def test_jl_concentration(spark, sf_dir):
    # The unbiased-estimator law: the mean distortion ratio over real
    # pairs sits near 1 (ppm 1e6), within the d'=16 chi-square spread.
    _, ratios = _recompute(sf_dir)
    mean = sum(ratios) / len(ratios)
    assert 700_000 < mean < 1_400_000
    # The md5-derived sign matrix is pseudo-random, not degenerate:
    # global balance within 20% of half, and no two rows identical.
    smat = [
        tuple(_jl_sign(j, k) for k in range(_JL_D))
        for j in range(_JL_DPRIME)
    ]
    pos = sum(1 for row in smat for s in row if s == 1)
    assert abs(pos - _JL_D * _JL_DPRIME / 2) < 0.2 * _JL_D * _JL_DPRIME
    assert len(set(smat)) == _JL_DPRIME
