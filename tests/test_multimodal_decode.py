"""Pure-Python image codecs (BMP 24-bit BI_RGB, binary PPM) — the
de-stubbed decode leg (VERDICT r3 item 5). Round-trip identities,
header-arithmetic goldens, and the NotImplementedError contract for
compressed formats."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_globalretail_spark.operators.multimodal import (
    _decode_bmp,
    decode_image,
    encode_bmp,
    encode_ppm,
)


def _pixels(w: int, h: int, seed: int = 7) -> bytes:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("w,h", [(30, 34), (32, 32), (1, 1), (5, 3)])
def test_bmp_roundtrip(w, h):
    rgb = _pixels(w, h)
    payload = encode_bmp(w, h, rgb)
    assert payload[:2] == b"BM"
    # header arithmetic: declared file size matches, offset is 54,
    # stride is 4-byte aligned
    size, offset = struct.unpack_from("<I", payload, 2)[0], struct.unpack_from("<I", payload, 10)[0]
    stride = (w * 3 + 3) // 4 * 4
    assert size == len(payload) == 54 + stride * h
    assert offset == 54
    assert decode_image(payload) == (w, h, rgb)


def test_bmp_top_down_negative_height():
    w, h = 4, 3
    rgb = _pixels(w, h)
    payload = bytearray(encode_bmp(w, h, rgb))
    # rewrite as top-down: negate height, reverse the (unpadded-equal)
    # row blocks in the pixel data
    struct.pack_into("<i", payload, 22, -h)
    stride = (w * 3 + 3) // 4 * 4
    body = payload[54:]
    rows = [bytes(body[i * stride:(i + 1) * stride]) for i in range(h)]
    payload[54:] = b"".join(reversed(rows))
    assert _decode_bmp(bytes(payload)) == (w, h, rgb)


def test_ppm_roundtrip_and_comments():
    w, h = 6, 5
    rgb = _pixels(w, h)
    assert decode_image(encode_ppm(w, h, rgb)) == (w, h, rgb)
    # hand-built header with comments and odd whitespace
    payload = b"P6\n# a comment\n  " + str(w).encode() + b" # inline\n" \
        + str(h).encode() + b"\n255\n" + rgb
    assert decode_image(payload) == (w, h, rgb)


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-like")  # JPEG magic
    with pytest.raises(NotImplementedError):
        decode_image(b"P3\n1 1\n255\n0 0 0\n")  # ASCII PPM
    # 8-bit palettized BMP refused (bpp != 24)
    bad = bytearray(encode_bmp(2, 2, _pixels(2, 2)))
    struct.pack_into("<H", bad, 28, 8)
    with pytest.raises(NotImplementedError):
        decode_image(bytes(bad))


def test_q279_pixel_contract(spark, sf_dir):
    """The decoded pixel blob equals the documented closed form
    (ASCII of repeat(md5(text), 96) truncated to W*H*3) for a sample."""
    import hashlib

    from etl_globalretail_spark.operators.multimodal import (
        DECODED_SCHEMA,
        IMAGE_SCHEMA,
        _Q279_NPIX,
        _Q279_REPS,
        _decode_image_kernel,
        _encode_image_kernel,
    )
    from etl_globalretail_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    # total-order the sample: bare limit() picks different rows per action
    d = load_table(spark, "documents", sf_dir).orderBy("doc_id").limit(8)
    pattern = F.substring(
        F.repeat(F.md5(F.encode("text", "UTF-8")), _Q279_REPS), 1, _Q279_NPIX
    )
    src = d.select(
        F.col("doc_id").alias("media_id"), "lang",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/bmp"))
        .otherwise(F.lit("image/x-portable-pixmap")).alias("mime"),
        F.encode(pattern, "UTF-8").alias("pix"),
        "text",
    )
    rows = src.select("media_id", "mime", "text").collect()
    decoded = {
        r["media_id"]: bytes(r["pixels"])
        for r in src.drop("text")
        .mapInPandas(_encode_image_kernel, schema=IMAGE_SCHEMA)
        .mapInPandas(_decode_image_kernel, schema=DECODED_SCHEMA)
        .collect()
    }
    for r in rows:
        h = hashlib.md5(r["text"].encode()).hexdigest()
        expect = (h * _Q279_REPS)[:_Q279_NPIX].encode("ascii")
        assert decoded[r["media_id"]] == expect


# ---------------------------------------------------------------------------
# q298 dHash near-dup laws
# ---------------------------------------------------------------------------


def test_q298_every_variant_pairs_with_its_original(spark, sf_dir):
    """The synthesized variants perturb pixels only inside grid block
    (0,0), so each (original, original+OFFSET) pair differs in AT MOST one
    dHash bit and MUST be in the result."""
    import pyarrow.parquet as pq

    from etl_globalretail_spark.operators.multimodal import (
        _Q298_VARIANT_OFFSET,
        QUERIES,
    )

    rows = QUERIES["q298_image_dhash_neardup"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).to_pydict()["doc_id"]
    expected = [i for i in ids if i % 5 == 0]
    assert expected
    for i in expected:
        pair = (i, i + _Q298_VARIANT_OFFSET)
        assert pair in got, f"variant pair {pair} missing"
        assert got[pair] <= 1, (pair, got[pair])


def test_q298_banded_equals_quadratic_numpy(spark, sf_dir):
    """The banded plan must equal the brute-force quadratic recompute —
    the pigeonhole-losslessness proof, independently of the oracle."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from etl_globalretail_spark.operators.multimodal import (
        _Q279_NPIX,
        _Q279_REPS,
        _Q279_H,
        _Q279_W,
        _Q298_HAM,
        _Q298_VARIANT_OFFSET,
        _dhash_from_rgb,
        QUERIES,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    hashes = {}
    for doc_id, text in zip(t["doc_id"], t["text"]):
        base = (hashlib.md5(text.encode()).hexdigest() * _Q279_REPS)[
            :_Q279_NPIX
        ]
        hashes[doc_id] = _dhash_from_rgb(
            base.encode(), _Q279_W, _Q279_H
        )
        if doc_id % 5 == 0:
            chunks = []
            for r in range(5):
                chunks.append("z" * 12)
                chunks.append(base[90 * r + 12:90 * (r + 1)])
            chunks.append(base[450:])
            var = "".join(chunks)
            assert len(var) == _Q279_NPIX
            hashes[doc_id + _Q298_VARIANT_OFFSET] = _dhash_from_rgb(
                var.encode(), _Q279_W, _Q279_H
            )
    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(hashes[a] ^ hashes[b]).count("1") <= _Q298_HAM:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["q298_image_dhash_neardup"](spark, sf_dir).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q299 WAV codec + audio feature laws
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_chunk_walking():
    import struct

    import numpy as np

    from etl_globalretail_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.array([0, 1, -1, 32767, -32768, 12345, -12345], dtype="<i2")
    rate, raw = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert np.array_equal(np.frombuffer(raw, "<i2"), s)
    # unknown odd-sized chunk before fmt/data must be skipped (word-aligned)
    payload = encode_wav(s)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = payload[:12] + extra + payload[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    rate2, raw2 = decode_wav(patched)
    assert rate2 == 8000 and raw2 == raw


def test_wav_rejects_non_pcm():
    import struct

    import pytest

    from etl_globalretail_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")
    payload = bytearray(encode_wav([0, 1]))
    struct.pack_into("<H", payload, 20 + 2, 2)  # channels = 2 (stereo)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(payload))


def test_q299_silent_docs_census(spark, sf_dir):
    from etl_globalretail_spark.operators.multimodal import (
        _Q299_FRAME,
        _Q299_SAMPLES,
        QUERIES,
    )

    rows = QUERIES["q299_audio_frame_features"](spark, sf_dir).collect()
    assert rows
    n_frames = _Q299_SAMPLES // _Q299_FRAME
    silent = [r for r in rows if r["media_id"] % 5 == 0]
    assert silent
    for r in rows:
        assert r["n_frames"] == n_frames
        assert r["sample_rate"] == 8000
        if r["media_id"] % 5 == 0:  # amp 0: digital silence end to end
            assert r["total_energy"] == 0
            assert r["max_peak"] == 0
            assert r["n_silent_frames"] == n_frames
            assert r["zero_crossings"] == 0
        else:
            assert r["max_peak"] > 0
            assert r["n_silent_frames"] == 0


# ---------------------------------------------------------------------------
# q300 Y4M demuxer + frame-sampling laws
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_and_frame_params():
    from etl_globalretail_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    frames = [bytes(range(48)) * 3, bytes(reversed(range(48))) * 3]
    w, h, out = decode_y4m(encode_y4m(8, 6, frames))
    assert (w, h) == (8, 6) and out == frames
    # frame-level parameters after FRAME must be tolerated
    payload = encode_y4m(8, 6, frames).replace(
        b"FRAME\n", b"FRAME Xtag\n", 1
    )
    assert decode_y4m(payload)[2] == frames


def test_y4m_rejects_other_colorspaces():
    import pytest

    from etl_globalretail_spark.operators.multimodal import decode_y4m

    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H6 C420jpeg\n")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W8 H6\n")  # default C420 — rejected too
    with pytest.raises(NotImplementedError):
        decode_y4m(b"MPEG4 W8 H6\n")


def test_q300_sampler_keeps_exactly_even_frames(spark, sf_dir):
    from collections import defaultdict

    from etl_globalretail_spark.operators.multimodal import (
        _Q300_BASE_FRAMES,
        QUERIES,
    )

    rows = QUERIES["q300_video_frame_sample"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["media_id"]].append(r)
    assert per
    for mid, rs in per.items():
        nf = _Q300_BASE_FRAMES + mid % 5
        assert all(r["n_frames"] == nf for r in rs)
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))
        for r in rs:
            assert 0 <= r["y_min"] <= r["y_max"] <= 255
            assert r["y_min"] * 48 <= r["y_sum"] <= r["y_max"] * 48


# ---------------------------------------------------------------------------
# q306 resize laws
# ---------------------------------------------------------------------------


def test_q306_resize_matches_numpy_on_pattern(spark, sf_dir):
    """The census must equal a direct numpy box-filter recompute from the
    closed-form pattern — independently of both codec round-trips."""
    import hashlib
    from collections import defaultdict

    import numpy as np
    import pyarrow.parquet as pq

    from etl_globalretail_spark.operators.multimodal import (
        _Q279_H,
        _Q279_NPIX,
        _Q279_REPS,
        _Q279_W,
        _Q306_H2,
        _Q306_W2,
        QUERIES,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pydict()
    want = defaultdict(lambda: [0, 0, 0])  # n, vsum, wsum
    for doc_id, text, lang in zip(t["doc_id"], t["text"], t["lang"]):
        pat = (hashlib.md5(text.encode()).hexdigest() * _Q279_REPS)[
            :_Q279_NPIX
        ].encode()
        a = np.frombuffer(pat, np.uint8).astype(np.int64).reshape(
            _Q279_H, _Q279_W, 3
        )
        blocks = a[: _Q306_H2 * 2, : _Q306_W2 * 2].reshape(
            _Q306_H2, 2, _Q306_W2, 2, 3
        )
        v = (blocks.sum(axis=(1, 3)) // 4).ravel()
        mime = "image/bmp" if doc_id % 2 == 0 else "image/x-portable-pixmap"
        e = want[(lang, mime)]
        e[0] += 1
        e[1] += int(v.sum())
        e[2] += int((v * (np.arange(len(v)) + 1)).sum())
    got = {
        (r["lang"], r["mime"]): [r["n_images"], r["value_sum"],
                                 r["weighted_sum"]]
        for r in QUERIES["q306_image_resize"](spark, sf_dir).collect()
    }
    assert got == dict(want)
