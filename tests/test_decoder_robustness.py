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


def test_jpeg_truncated_sos_raises_valueerror():
    """ADVICE r7: a truncated SOS body escaped as IndexError at
    ``td_ta = body[2 + 2 * i]``; the verifying-parser contract says
    ValueError on anything outside the subset."""
    from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8), 85)
    sos = payload.index(b"\xff\xda")
    (seg_len,) = struct.unpack_from(">H", payload, sos + 2)
    corrupted = bytearray(payload)
    # shrink the declared SOS length so the component list is cut short
    struct.pack_into(">H", corrupted, sos + 2, 3)
    corrupted = corrupted[: sos + 2 + 3] + corrupted[sos + 2 + seg_len :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))


def test_jpeg_truncated_sof_raises_valueerror():
    """ADVICE r7: a short SOF0 body escaped as struct.error from
    ``struct.unpack_from``; must surface as ValueError instead."""
    from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8), 85)
    sof = payload.index(b"\xff\xc0")
    (seg_len,) = struct.unpack_from(">H", payload, sof + 2)
    corrupted = bytearray(payload)
    # leave only 4 body bytes — too short for the BHHB header
    struct.pack_into(">H", corrupted, sof + 2, 6)
    corrupted = corrupted[: sof + 2 + 6] + corrupted[sof + 2 + seg_len :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))


def test_jpeg_truncated_sof_component_list_raises_valueerror():
    """A SOF0 whose declared component count overruns the body must
    raise ValueError, not IndexError."""
    from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8), 85)
    sof = payload.index(b"\xff\xc0")
    corrupted = bytearray(payload)
    # grayscale SOF0 body is 9 bytes; claim 3 components (needs 15)
    corrupted[sof + 4 + 5] = 3
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))


def test_jpeg_truncated_dqt_raises_valueerror():
    """A DQT whose 64-entry table is cut short must raise ValueError."""
    from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8), 85)
    dqt = payload.index(b"\xff\xdb")
    (seg_len,) = struct.unpack_from(">H", payload, dqt + 2)
    corrupted = bytearray(payload)
    struct.pack_into(">H", corrupted, dqt + 2, 10)
    corrupted = corrupted[: dqt + 2 + 10] + corrupted[dqt + 2 + seg_len :]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(corrupted))
