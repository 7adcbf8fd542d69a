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
