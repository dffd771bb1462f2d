"""Property-based tests for the grayscale baseline JPEG codec
(operators/jpeg.py) — hypothesis drives arbitrary small images through
the encode→decode loop and asserts the invariants that hold for ANY
input: shape/crop fidelity, byte determinism, bounded reconstruction
error for flat blocks, and decoder totality (decode never returns a
wrong-shaped or out-of-range array)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

_img = arrays(
    dtype=np.uint8,
    shape=st.tuples(
        st.integers(min_value=1, max_value=33),
        st.integers(min_value=1, max_value=33),
    ),
    elements=st.integers(min_value=0, max_value=255),
)


@settings(max_examples=40, deadline=None)
@given(_img, st.integers(min_value=1, max_value=100))
def test_roundtrip_shape_and_range(img, quality):
    back = decode_jpeg_gray(encode_jpeg_gray(img, quality))
    assert back.shape == img.shape
    assert back.dtype == np.uint8  # clamped into [0, 255] by dtype


@settings(max_examples=25, deadline=None)
@given(_img)
def test_encode_deterministic(img):
    assert encode_jpeg_gray(img, 80) == encode_jpeg_gray(img, 80)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=80, max_value=100),
)
def test_flat_images_exact_at_high_quality(val, h, w, quality):
    # A flat block is DC-only; its reconstruction error is the DC
    # quantization error / 8 <= q_dc/16 gray levels. At quality >= 80
    # the scaled Annex-K DC step is <= 7, so the error is < 0.5 and
    # the roundtrip is EXACT. (At quality=1 the step is 255 and a
    # flat image may legitimately shift ~16 levels — found by
    # hypothesis, not a codec bug.)
    img = np.full((h, w), val, dtype=np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(img, quality)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=100),
)
def test_flat_images_bounded_at_any_quality(val, quality):
    # any quality: error bounded by ceil(q_dc/16) + rounding slack
    img = np.full((16, 16), val, dtype=np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(img, quality))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 17


@settings(max_examples=25, deadline=None)
@given(_img)
def test_high_quality_error_bounded(img):
    # q=100 uses the all-ones quant table: error is only DCT rounding,
    # bounded by a few grey levels for any input.
    back = decode_jpeg_gray(encode_jpeg_gray(img, 100))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 4
