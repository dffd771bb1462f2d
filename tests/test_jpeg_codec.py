"""Grayscale baseline-JPEG codec tests (operators/jpeg.py, round 7):
roundtrip fidelity properties, verifying-parser refusals on planted
corruptions, and the Spark mapInPandas leg (attach_jpeg_media →
image_features_jpeg)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray


def test_flat_image_roundtrips_exactly():
    # a flat block quantizes to DC-only with zero error at any quality
    for val in (0, 77, 128, 255):
        img = np.full((24, 40), val, dtype=np.uint8)
        assert (decode_jpeg_gray(encode_jpeg_gray(img, 85)) == img).all()


def test_smooth_gradient_near_lossless_at_high_quality():
    y, x = np.mgrid[0:40, 0:56]
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2) / 4 * 255).astype(np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(img, quality=95))
    assert back.shape == img.shape
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 3


def test_non_multiple_of_8_dims_crop_back():
    img = (np.arange(13 * 21, dtype=np.int64) * 31 % 256).astype(
        np.uint8
    ).reshape(13, 21)
    back = decode_jpeg_gray(encode_jpeg_gray(img, 90))
    assert back.shape == (13, 21)


def test_quality_monotonicity():
    rng_img = (np.arange(32 * 32, dtype=np.int64) * 97 % 256).astype(
        np.uint8
    ).reshape(32, 32)
    errs = []
    for q in (20, 60, 95):
        back = decode_jpeg_gray(encode_jpeg_gray(rng_img, q))
        errs.append(np.abs(back.astype(int) - rng_img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_deterministic_bytes():
    img = (np.arange(16 * 16, dtype=np.int64) * 7 % 256).astype(
        np.uint8
    ).reshape(16, 16)
    assert encode_jpeg_gray(img, 80) == encode_jpeg_gray(img, 80)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8), quality=0)


def test_decoder_refuses_corruptions():
    img = np.full((16, 16), 200, dtype=np.uint8)
    payload = encode_jpeg_gray(img, 85)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x00" + payload[2:])

    # truncate inside the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg_gray(payload[:-6])

    # flip SOF0 to progressive (SOF2): must refuse, not misparse
    sof = payload.index(b"\xff\xc0")
    prog = bytearray(payload)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(prog))

    # claim 3 components in SOF0: out of the supported subset
    multi = bytearray(payload)
    # SOF0 body: len(2) precision(1) h(2) w(2) ncomp(1)
    multi[sof + 9] = 3
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_gray(bytes(multi))


def test_spark_jpeg_leg(spark):
    from pyprima_spark.operators.multimodal import (
        attach_jpeg_media,
        image_features_jpeg,
    )

    docs = spark.range(1, 9).withColumnRenamed("id", "doc_id")
    media = attach_jpeg_media(docs, quality=90)
    feats = image_features_jpeg(media).collect()
    assert len(feats) == 8
    for r in feats:
        d = int(r.doc_id)
        assert (r.width, r.height) == (16 + d % 17, 16 + d % 11)
        assert 0 <= r.mean_y <= 255
        # JFIF overhead alone is ~330 bytes of tables+markers
        assert r.n_bytes > 300


def test_spark_jpeg_features_match_local_decode(spark):
    """The distributed decode must equal a local decode of the same
    payloads — pins the Arrow binary round-trip."""
    from pyprima_spark.operators.multimodal import (
        attach_jpeg_media,
        image_features_jpeg,
    )

    docs = spark.range(3, 6).withColumnRenamed("id", "doc_id")
    media = attach_jpeg_media(docs, quality=75)
    local = {}
    for row in media.collect():
        arr = decode_jpeg_gray(bytes(row.payload))
        local[row.doc_id] = int(arr.astype(np.int64).sum() // arr.size)
    got = {
        r.doc_id: r.mean_y for r in image_features_jpeg(media).collect()
    }
    assert got == local
