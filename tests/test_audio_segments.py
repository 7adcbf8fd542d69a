"""q325 audio activity segmentation: pure-Python recompute through the
REAL WAV round-trip, plus the structural law (the amp_f = (doc+f) mod 3
modulation makes every third frame silent, so segments are the runs
between those, shifted per doc)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from etl_globalretail_spark.operators.multimodal import (
    _Q299_FRAME,
    _Q299_SAMPLES,
    _Q299_SILENT,
    QUERIES,
    decode_wav,
    encode_wav,
)


def _recompute(sf_dir: str):
    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()
    out = {}
    for mid in ids:
        mid = int(mid)
        i = np.arange(_Q299_SAMPLES, dtype=np.int64)
        ampf = (mid + i // _Q299_FRAME) % 3
        base = (mid * 7919 + i * 104729) % 65536
        s = (base * ampf) // 4 - 8192 * ampf
        _, raw = decode_wav(encode_wav(s.astype("<i2")))
        x = np.frombuffer(raw, "<i2").astype(np.int64)
        energy = (x.reshape(-1, _Q299_FRAME) ** 2).sum(axis=1)
        active = energy >= _Q299_SILENT
        idx = np.flatnonzero(active)
        if len(idx):
            is_start = np.ones(len(idx), dtype=bool)
            is_start[1:] = np.diff(idx) > 1
            runs = np.bincount(np.cumsum(is_start))
            out[mid] = (len(energy), len(idx), int(is_start.sum()),
                        int(runs.max()), int(idx[0]), int(idx[-1]))
        else:
            out[mid] = (len(energy), 0, 0, 0, -1, -1)
    return out


def test_q325_matches_python_recompute(spark, sf_dir):
    want = _recompute(sf_dir)
    got = {
        r["media_id"]: (r["n_frames"], r["n_active"], r["n_segments"],
                        r["longest_run"], r["first_active"],
                        r["last_active"])
        for r in QUERIES["q325_audio_activity_segments"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_q325_segments_track_amp_modulation(spark, sf_dir):
    """amp_f = (doc + f) mod 3 silences exactly the frames where that
    is 0, so the active set is {f : (doc + f) mod 3 != 0} and the
    reported segments must be its maximal runs."""
    rows = QUERIES["q325_audio_activity_segments"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        mid, nf = r["media_id"], r["n_frames"]
        active = [f for f in range(nf) if (mid + f) % 3 != 0]
        runs, prev = [], None
        for f in active:
            if prev is None or f != prev + 1:
                runs.append(1)
            else:
                runs[-1] += 1
            prev = f
        assert r["n_active"] == len(active), mid
        assert r["n_segments"] == len(runs), mid
        assert r["longest_run"] == max(runs), mid
        assert r["first_active"] == active[0], mid
        assert r["last_active"] == active[-1], mid
