"""q295 product quantization: full numpy recompute of the M-subspace
integer Lloyd chain (init ordering, both assignments, floor-mean update,
distortion/checksum audit) must match the Spark operator row-for-row, and
the codes must partition the corpus within every subspace."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

from etl_globalretail_spark.operators.clustering import (
    _PQ_DS,
    _PQ_ITERS,
    _PQ_K,
    _PQ_M,
    _Q122_SCALE,
    q295_pq_codebook,
)


def _numpy_fit(sf_dir: str):
    """Shared chain: quantized matrix, seed order, fitted codebooks and
    final codes per subspace."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = t["vec_id"]
    X = np.array(
        [
            [math.floor(float(v) * _Q122_SCALE) for v in emb]
            for emb in t["embedding"]
        ],
        dtype=np.int64,
    )
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    seeds = order[:_PQ_K]
    fitted = {}
    for m in range(_PQ_M):
        blk = X[:, m * _PQ_DS:(m + 1) * _PQ_DS]
        cents = {c: blk[seeds[c]].copy() for c in range(_PQ_K)}
        for it in range(_PQ_ITERS):
            cids = sorted(cents)
            cmat = np.array([cents[c] for c in cids], dtype=np.int64)
            diff = blk[:, None, :] - cmat[None, :, :]
            d2 = (diff * diff).sum(-1)
            a = np.argmin(d2, axis=1)
            if it < _PQ_ITERS - 1:
                cents = {
                    cids[ci]: np.floor(
                        blk[a == ci].sum(axis=0) / (a == ci).sum()
                    ).astype(np.int64)
                    for ci in range(len(cids))
                    if (a == ci).any()
                }
        fitted[m] = (cents, {i: cids[a[i]] for i in range(len(ids))})
    return ids, X, fitted


def _numpy_pq(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = t["vec_id"]
    X = np.array(
        [
            [math.floor(float(v) * _Q122_SCALE) for v in emb]
            for emb in t["embedding"]
        ],
        dtype=np.int64,
    )
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    seeds = order[:_PQ_K]
    out = {}
    for m in range(_PQ_M):
        blk = X[:, m * _PQ_DS:(m + 1) * _PQ_DS]
        cents = {c: blk[seeds[c]].copy() for c in range(_PQ_K)}
        for it in range(_PQ_ITERS):
            cids = sorted(cents)
            cmat = np.array([cents[c] for c in cids], dtype=np.int64)
            diff = blk[:, None, :] - cmat[None, :, :]
            d2 = (diff * diff).sum(-1)
            a = np.argmin(d2, axis=1)
            mind = d2[np.arange(len(a)), a]
            if it < _PQ_ITERS - 1:
                cents = {
                    cids[ci]: np.floor(
                        blk[a == ci].sum(axis=0) / (a == ci).sum()
                    ).astype(np.int64)
                    for ci in range(len(cids))
                    if (a == ci).any()
                }
        for ci, code in enumerate(cids):
            msk = a == ci
            if msk.any():
                out[(m, code)] = (
                    int(msk.sum()),
                    int(mind[msk].sum()),
                    int(cents[code].sum()),
                )
    return out


def test_q295_matches_numpy_recompute(spark, sf_dir):
    got = {
        (r["subspace"], r["code"]): (
            r["n_vectors"], r["distortion_q"], r["centroid_sum"]
        )
        for r in q295_pq_codebook(spark, sf_dir).collect()
    }
    assert got == _numpy_pq(sf_dir)


def test_q295_codes_partition_every_subspace(spark, sf_dir):
    rows = q295_pq_codebook(spark, sf_dir).collect()
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    per = {}
    for r in rows:
        per[r["subspace"]] = per.get(r["subspace"], 0) + r["n_vectors"]
        assert r["distortion_q"] >= 0
    assert set(per) == set(range(_PQ_M))
    assert all(v == n for v in per.values())


def test_q297_adc_matches_numpy_recompute(spark, sf_dir):
    from etl_globalretail_spark.operators.clustering import (
        _PQ_TOPK,
        q297_pq_adc_search,
    )

    ids, X, fitted = _numpy_fit(sf_dir)
    probe_i = min(range(len(ids)), key=lambda i: ids[i])
    probe = X[probe_i]
    adc = np.zeros(len(ids), dtype=np.int64)
    for m, (cents, codes) in fitted.items():
        pm = probe[m * _PQ_DS:(m + 1) * _PQ_DS]
        tbl = {
            c: int(((pm - cents[c]) ** 2).sum()) for c in cents
        }
        for i in range(len(ids)):
            adc[i] += tbl[codes[i]]
    exact = ((X - probe[None, :]) ** 2).sum(axis=1)
    order = sorted(range(len(ids)), key=lambda i: (adc[i], ids[i]))
    exact_top = {
        ids[i]
        for i in sorted(range(len(ids)), key=lambda i: (exact[i], ids[i]))[
            :_PQ_TOPK
        ]
    }
    want = {
        ids[i]: (r + 1, int(adc[i]), int(exact[i]), ids[i] in exact_top)
        for r, i in enumerate(order[:_PQ_TOPK])
    }
    got = {
        r["vec_id"]: (
            r["rank"], r["adc_dist_q"], r["exact_dist_q"], r["in_exact_topk"]
        )
        for r in q297_pq_adc_search(spark, sf_dir).collect()
    }
    assert got == want


def test_q297_probe_is_its_own_exact_nearest(spark, sf_dir):
    from etl_globalretail_spark.operators.clustering import q297_pq_adc_search

    rows = q297_pq_adc_search(spark, sf_dir).collect()
    assert len(rows) == 10
    probe_rows = [r for r in rows if r["exact_dist_q"] == 0]
    # the probe is in the corpus: exact distance 0, so if ADC surfaces it,
    # it must be flagged as a true-top-k member
    for r in probe_rows:
        assert r["in_exact_topk"]
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, 11))


def test_q302_ivfadc_matches_numpy_recompute(spark, sf_dir):
    from etl_globalretail_spark.operators.clustering import (
        _PQ_TOPK,
        _Q302_NPROBE,
        q302_ivf_adc_search,
    )

    ids, X, fitted = _numpy_fit(sf_dir)
    labels = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pydict()
    lab = dict(zip(labels["vec_id"], labels["label"]))
    probe_i = min(range(len(ids)), key=lambda i: ids[i])
    probe = X[probe_i]
    # coarse integer centroids per label (floor means) + nprobe cells
    bylab = {}
    for i, vid in enumerate(ids):
        bylab.setdefault(lab[vid], []).append(i)
    cellrank = sorted(
        (
            int(((probe - np.floor(
                X[rows].sum(axis=0) / len(rows)
            ).astype(np.int64)) ** 2).sum()),
            lb,
        )
        for lb, rows in bylab.items()
    )
    probed = {lb for _d, lb in cellrank[:_Q302_NPROBE]}
    adc = np.zeros(len(ids), dtype=np.int64)
    for m, (cents, codes) in fitted.items():
        pm = probe[m * _PQ_DS:(m + 1) * _PQ_DS]
        tbl = {c: int(((pm - cents[c]) ** 2).sum()) for c in cents}
        for i in range(len(ids)):
            adc[i] += tbl[codes[i]]
    exact = ((X - probe[None, :]) ** 2).sum(axis=1)
    cand = [i for i in range(len(ids)) if lab[ids[i]] in probed]
    order = sorted(cand, key=lambda i: (adc[i], ids[i]))[:_PQ_TOPK]
    exact_top = {
        ids[i]
        for i in sorted(range(len(ids)), key=lambda i: (exact[i], ids[i]))[
            :_PQ_TOPK
        ]
    }
    want = {
        ids[i]: (r + 1, lab[ids[i]], int(adc[i]), int(exact[i]),
                 ids[i] in exact_top)
        for r, i in enumerate(order)
    }
    got = {
        r["vec_id"]: (
            r["rank"], r["label"], r["adc_dist_q"], r["exact_dist_q"],
            r["in_exact_topk"],
        )
        for r in q302_ivf_adc_search(spark, sf_dir).collect()
    }
    assert got == want
    assert {v[1] for v in got.values()} <= probed  # hits live in probed cells
