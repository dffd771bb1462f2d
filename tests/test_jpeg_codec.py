"""Grayscale baseline-JPEG codec tests (operators/jpeg.py, round 7):
roundtrip fidelity properties, verifying-parser refusals on planted
corruptions, and the Spark mapInPandas leg (attach_jpeg_media →
image_features_jpeg)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyprima_spark.operators.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    encode_jpeg_rgb,
)


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

    # claim 2 components in SOF0: outside the 1-or-3 subset. Planted on
    # a COLOR payload so the 2-component claim survives the body-length
    # bounds check (a 1-component body is shorter than 2 components
    # need, which correctly trips "truncated" first — covered below).
    color = encode_jpeg_rgb(np.full((16, 16, 3), 120, dtype=np.uint8), 85)
    csof = color.index(b"\xff\xc0")
    multi = bytearray(color)
    # SOF0 body: len(2) precision(1) h(2) w(2) ncomp(1)
    multi[csof + 9] = 2
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_gray(bytes(multi))

    # claim 2 components on the 1-component body: too short for the
    # claim — the bounds check must refuse before indexing past the end
    short2 = bytearray(payload)
    short2[sof + 9] = 2
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(bytes(short2))

    # claim 3 components with a 1-component body: header/body mismatch
    multi3 = bytearray(payload)
    multi3[sof + 9] = 3
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(multi3))


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


# --- color (4:4:4) extension ------------------------------------------------


def test_color_roundtrip_smooth_near_lossless():
    from pyprima_spark.operators.jpeg import decode_jpeg_rgb, encode_jpeg_rgb

    y, x = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [
            ((np.sin(x / 9.0) + 1) / 2 * 255),
            ((np.cos(y / 7.0) + 1) / 2 * 255),
            (x + y) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    back = decode_jpeg_rgb(encode_jpeg_rgb(rgb, quality=95))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 6


def test_color_flat_and_crop():
    from pyprima_spark.operators.jpeg import decode_jpeg_rgb, encode_jpeg_rgb

    flat = np.full((13, 21, 3), (200, 30, 90), dtype=np.uint8)
    back = decode_jpeg_rgb(encode_jpeg_rgb(flat, 95))
    assert back.shape == (13, 21, 3)
    assert np.abs(back.astype(int) - flat.astype(int)).max() <= 1


def test_color_gray_cross_refusals():
    from pyprima_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_rgb,
        encode_jpeg_rgb,
    )

    g = np.full((16, 16), 77, dtype=np.uint8)
    c = np.full((16, 16, 3), 77, dtype=np.uint8)
    with pytest.raises(ValueError, match="color"):
        decode_jpeg_rgb(encode_jpeg_gray(g, 85))
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(encode_jpeg_rgb(c, 85))
    with pytest.raises(ValueError):
        encode_jpeg_rgb(g)  # wrong shape


def test_color_deterministic_and_channel_separation():
    from pyprima_spark.operators.jpeg import decode_jpeg_rgb, encode_jpeg_rgb

    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0] = 220  # strongly red
    payload = encode_jpeg_rgb(rgb, 90)
    assert payload == encode_jpeg_rgb(rgb, 90)
    back = decode_jpeg_rgb(payload)
    assert back[..., 0].mean() > 180 and back[..., 1].mean() < 60


def test_420_roundtrip_and_size_advantage():
    from pyprima_spark.operators.jpeg import decode_jpeg_rgb, encode_jpeg_rgb

    y, x = np.mgrid[0:40, 0:56]
    rgb = np.stack(
        [
            ((np.sin(x / 9.0) + 1) / 2 * 255),
            ((np.cos(y / 7.0) + 1) / 2 * 255),
            ((np.sin((x + y) / 11.0) + 1) / 2 * 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    p444 = encode_jpeg_rgb(rgb, 95, "444")
    p420 = encode_jpeg_rgb(rgb, 95, "420")
    assert len(p420) < len(p444)  # half the chroma blocks
    back = decode_jpeg_rgb(p420)
    assert back.shape == rgb.shape
    # luma stays tight; chroma replication costs more on gradients
    err = np.abs(back.astype(int) - rgb.astype(int))
    assert err.mean() <= 8 and err.max() <= 48


def test_420_flat_exact_and_odd_dims():
    from pyprima_spark.operators.jpeg import decode_jpeg_rgb, encode_jpeg_rgb

    flat = np.full((13, 21, 3), (200, 30, 90), dtype=np.uint8)
    back = decode_jpeg_rgb(encode_jpeg_rgb(flat, 95, "420"))
    assert back.shape == (13, 21, 3)
    assert (back == flat).all()


def test_bad_subsampling_arg_refused():
    from pyprima_spark.operators.jpeg import encode_jpeg_rgb

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_rgb(np.zeros((8, 8, 3), np.uint8), 85, "422")
