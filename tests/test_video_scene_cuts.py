"""q323 scene-cut detection: pure-Python recompute through the REAL
Y4M round-trip, plus the structural law (cuts sit exactly on the
synthesized 3-frame shot boundaries that exist in each clip)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from etl_globalretail_spark.operators.multimodal import (
    _Q300_BASE_FRAMES,
    _Q300_H,
    _Q300_W,
    _Q323_SCENE,
    _Q323_THRESH,
    QUERIES,
    decode_y4m,
    encode_y4m,
)


def _recompute(sf_dir: str):
    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    w, h, plane = _Q300_W, _Q300_H, _Q300_W * _Q300_H
    out = {}
    for mid in ids:
        mid = int(mid)
        nframes = _Q300_BASE_FRAMES + mid % 5
        frames = []
        for f in range(nframes):
            p = np.arange(3 * plane, dtype=np.int64)
            pl = p // plane
            r = (p % plane) // w
            c = p % w
            v = (mid * 131 + (f // _Q323_SCENE) * 97 + f * 7
                 + pl * 17 + r * 13 + c * 7) % 256
            frames.append(v.astype(np.uint8).tobytes())
        _, _, decoded = decode_y4m(encode_y4m(w, h, frames))
        mats = [np.frombuffer(fr, np.uint8).astype(np.int64)
                for fr in decoded]
        n_cuts, first, total = 0, -1, 0
        for f in range(1, len(mats)):
            sad = int(np.abs(mats[f] - mats[f - 1]).sum())
            total += sad
            if sad > _Q323_THRESH:
                n_cuts += 1
                if first < 0:
                    first = f
        out[mid] = (len(mats), n_cuts, first, total)
    return out


def test_q323_matches_python_recompute(spark, sf_dir):
    want = _recompute(sf_dir)
    got = {
        r["media_id"]: (r["n_frames"], r["n_cuts"],
                        r["first_cut_idx"], r["sad_total"])
        for r in QUERIES["q323_video_scene_cuts"](spark, sf_dir).collect()
    }
    assert got == want


def test_q323_cuts_sit_on_shot_boundaries(spark, sf_dir):
    """The synthesis plants shots every 3 frames, so the detector must
    report exactly the boundaries that exist in each clip: n_cuts =
    |{f ∈ {3, 6, 9}: f < n_frames}| and the first cut is frame 3."""
    rows = QUERIES["q323_video_scene_cuts"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        boundaries = [f for f in (3, 6, 9) if f < r["n_frames"]]
        assert r["n_cuts"] == len(boundaries), r["media_id"]
        assert r["first_cut_idx"] == 3, r["media_id"]
