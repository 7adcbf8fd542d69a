"""q336 Sobel edge energy: pure-Python recompute through the REAL
BMP/PPM round-trip, plus closed-form kernel laws."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow.parquet as pq

from etl_globalretail_spark.operators.multimodal import (
    _Q279_H,
    _Q279_NPIX,
    _Q279_REPS,
    _Q279_W,
    _sobel_energy,
    QUERIES,
    decode_image,
    encode_bmp,
    encode_ppm,
)


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    census: dict[tuple[str, str], list] = {}
    for doc_id, lang, text in zip(
        tbl.column("doc_id").to_pylist(),
        tbl.column("lang").to_pylist(),
        tbl.column("text").to_pylist(),
    ):
        hexpat = (
            hashlib.md5(text.encode()).hexdigest() * _Q279_REPS
        )[:_Q279_NPIX].encode()
        mime = (
            "image/bmp" if doc_id % 2 == 0 else "image/x-portable-pixmap"
        )
        enc = encode_bmp if mime == "image/bmp" else encode_ppm
        w, h, pix = decode_image(enc(_Q279_W, _Q279_H, hexpat))
        assert pix == hexpat  # the round-trip is lossless
        arr = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
        gray = arr[0::3] + arr[1::3] + arr[2::3]
        e = _sobel_energy(gray, w, h)
        cur = census.setdefault((lang, mime), [0, 0, None, None])
        cur[0] += 1
        cur[1] += e
        cur[2] = e if cur[2] is None else min(cur[2], e)
        cur[3] = e if cur[3] is None else max(cur[3], e)
    return census


def test_q336_matches_pure_python(spark, sf_dir):
    expected = _recompute(sf_dir)
    rows = QUERIES["q336_image_edge_energy"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, tot, mn, mx = expected[(r["lang"], r["mime"])]
        assert (r["n_images"], r["total_energy"],
                r["min_energy"], r["max_energy"]) == (n, tot, mn, mx)


def test_sobel_kernel_laws():
    # A flat image has zero gradient everywhere.
    assert _sobel_energy([7] * (6 * 5), 6, 5) == 0
    # A vertical step edge of height d: each interior row sees |Gx| =
    # 4d at the two columns straddling the step, zero |Gy|.
    w, h, d = 6, 5, 3
    img = [(0 if x < 3 else d) for _ in range(h) for x in range(w)]
    assert _sobel_energy(img, w, h) == (h - 2) * 2 * 4 * d
