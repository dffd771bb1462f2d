"""Decoder-robustness tests (VERDICT r6 item 8 / ADVICE r5): the
stdlib PNG and GeoTIFF parsers are VERIFYING decoders — a corrupt
payload must raise, never decode wrong. Only the happy path was
oracled before; these tests plant the corruptions."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyprima_spark.operators.multimodal import decode_png_rgb, encode_png_rgb
from pyprima_spark.sources.geotiff import (
    decode_geotiff_gray,
    encode_geotiff_gray,
)


def _png() -> bytes:
    arr = (np.arange(4 * 5 * 3, dtype=np.uint8)).reshape(4, 5, 3)
    return encode_png_rgb(arr)


def test_png_roundtrip_then_corrupt_crc_raises():
    payload = _png()
    assert decode_png_rgb(payload) is not None
    # flip one byte inside the IDAT body: the chunk CRC must catch it
    idat = payload.index(b"IDAT")
    corrupted = bytearray(payload)
    corrupted[idat + 6] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png_rgb(bytes(corrupted))


def test_png_truncated_raises():
    payload = _png()
    with pytest.raises((ValueError, struct.error)):
        decode_png_rgb(payload[: len(payload) // 2])


def test_png_bad_magic_raises():
    payload = bytearray(_png())
    payload[0] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png_rgb(bytes(payload))


def _tiff() -> bytes:
    arr = np.arange(12, dtype="<f4").reshape(3, 4)
    return encode_geotiff_gray(arr, west=-10.0, north=50.0, pixel_size=0.5)


def test_geotiff_roundtrip_then_malformed_tag_raises():
    payload = _tiff()
    arr, west, north, ps = decode_geotiff_gray(payload)
    assert (west, north, ps) == (-10.0, 50.0, 0.5)
    # corrupt the compression tag value (tag 259) to a non-1 value:
    # the decoder must refuse rather than misparse the pixel strip
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    corrupted = bytearray(payload)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        tag, typ, cnt, val = struct.unpack_from("<HHII", payload, pos)
        if tag == 259:  # Compression
            struct.pack_into("<HHII", corrupted, pos, tag, typ, cnt, 5)
    with pytest.raises(ValueError, match="compressed"):
        decode_geotiff_gray(bytes(corrupted))


def test_geotiff_bad_magic_and_bad_geokey_raise():
    payload = _tiff()
    bad_magic = b"MM" + payload[2:]
    with pytest.raises(ValueError, match="TIFF"):
        decode_geotiff_gray(bad_magic)

    # corrupt the GeographicType GeoKey (2048 -> wrong EPSG): a raster
    # silently georeferenced in the wrong CRS corrupts every consumer
    corrupted = bytearray(payload)
    idx = payload.index(struct.pack("<HHHH", 2048, 0, 1, 4326))
    struct.pack_into("<HHHH", corrupted, idx, 2048, 0, 1, 4267)
    with pytest.raises(ValueError, match="4326"):
        decode_geotiff_gray(bytes(corrupted))


def test_geotiff_bad_sample_layout_raises():
    payload = _tiff()
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    corrupted = bytearray(payload)
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        tag, typ, cnt, val = struct.unpack_from("<HHII", payload, pos)
        if tag == 258:  # BitsPerSample -> unsupported 16
            struct.pack_into("<HHII", corrupted, pos, tag, typ, cnt, 16)
    with pytest.raises(ValueError, match="sample layout"):
        decode_geotiff_gray(bytes(corrupted))


def test_jpeg_truncated_dht_raises_valueerror():
    """Review r7 finding: a truncated DHT escaped as IndexError,
    breaking the ValueError verifying-parser contract."""
    from pyprima_spark.operators.jpeg import encode_jpeg_gray, decode_jpeg_gray

    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8), 85)
    dht = payload.index(b"\xff\xc4")
    (seg_len,) = struct.unpack_from(">H", payload, dht + 2)
    corrupted = bytearray(payload)
    # shrink the declared segment length so the table body is cut short
    struct.pack_into(">H", corrupted, dht + 2, 12)
    # re-splice: drop the now-orphaned table bytes so markers realign
    corrupted = corrupted[: dht + 2 + 12] + corrupted[dht + 2 + seg_len :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))
