"""Property-based (hypothesis) roundtrip laws for the pure-Python media
codecs — driver-side only (no Spark jobs per example, the
test_properties.py strategy note): any payload the encoders accept must
survive encode → decode byte-identically, across arbitrary sample
values, frame counts, and image dimensions."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_globalretail_spark.operators.multimodal import (
    decode_image,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_ppm,
    encode_wav,
    encode_y4m,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_samples(samples, rate):
    s = np.array(samples, dtype="<i2")
    got_rate, raw = decode_wav(encode_wav(s, rate=rate))
    assert got_rate == rate
    assert np.array_equal(np.frombuffer(raw, "<i2"), s)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=5),
    st.randoms(use_true_random=False),
)
def test_y4m_roundtrip_any_frames(w, h, nframes, rng):
    frames = [
        bytes(rng.randrange(256) for _ in range(3 * w * h))
        for _ in range(nframes)
    ]
    gw, gh, got = decode_y4m(encode_y4m(w, h, frames))
    assert (gw, gh) == (w, h)
    assert got == frames


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.randoms(use_true_random=False),
)
def test_bmp_and_ppm_roundtrip_any_pixels(w, h, rng):
    rgb = bytes(rng.randrange(256) for _ in range(3 * w * h))
    for enc in (encode_bmp, encode_ppm):
        gw, gh, got = decode_image(enc(w, h, rgb))
        assert (gw, gh, got) == (w, h, rgb), enc.__name__
