"""Minimal MJPEG-in-AVI video container codec in pure stdlib + the
repo's own baseline JPEG codec (operators/jpeg.py).

Closes the last stubbed modality the same way WAV/PNG/GeoTIFF/JPEG
were closed: ffmpeg is absent, but the RIFF-AVI container (Microsoft's
public AVI spec) and Motion-JPEG (one baseline JPEG per frame — the
format `ffmpeg -c:v mjpeg` emits) need only ``struct``. The supported
subset is one video stream, 'MJPG' handler, grayscale baseline frames;
the verifying reader REFUSES anything else rather than misparse.

Real-decoder interop note: the writer emits spec-shaped RIFF chunks
(avih/strh/strf headers, '00dc' frame chunks, idx1 index) with
grayscale baseline JPEG payloads — valid MJPEG content a standard
decoder accepts; interop could not be probed in this container
(ffmpeg/PIL absent, probed 2026-08-15), so the claim tested here is
the verified self-roundtrip plus the JPEG codec's own spec tests.

Scale shape: a video is an opaque binary payload in a DataFrame
column; encode/decode run inside Arrow-batched mapInPandas on the
executor holding the payload (operators/multimodal.py contract) —
frames never leave their partition, only (tiny) per-frame feature rows
come back.
"""

from __future__ import annotations

import struct

import numpy as np

from pyprima_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray


def _chunk(ckid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode (h, w) uint8 grayscale frames as an MJPEG AVI. All frames
    must share one shape (the AVI header carries a single geometry)."""
    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")
    jpegs = [encode_jpeg_gray(f, quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per second
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), max_size,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, struct.unpack("<I", b"MJPG")[0],
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs)
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_mjpeg_avi(payload: bytes) -> tuple[list[np.ndarray], int]:
    """Parse an MJPEG AVI written by :func:`encode_mjpeg_avi` (or any
    single-stream grayscale-baseline MJPEG AVI in the subset). Returns
    (frames, fps). Raises ValueError on non-AVI/non-MJPG/short
    payloads instead of decoding wrong."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated AVI payload")

    fps = None
    handler_ok = False
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        nonlocal fps, handler_ok
        pos = 0
        while pos + 8 <= len(buf):
            ckid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) < size:
                raise ValueError(f"truncated chunk {ckid!r}")
            if ckid == b"LIST":
                walk(body[4:])
            elif ckid == b"strh":
                if body[:4] == b"vids":
                    if body[4:8] != b"MJPG":
                        raise ValueError(
                            f"unsupported video handler {body[4:8]!r}"
                        )
                    handler_ok = True
                    scale, rate = struct.unpack_from("<II", body, 20)
                    fps = rate // max(scale, 1)
            elif ckid[2:4] == b"dc":
                frames.append(decode_jpeg_gray(bytes(body)))
            pos += 8 + size + (size % 2)

    walk(payload[12 : 8 + riff_size])
    if not handler_ok:
        raise ValueError("no MJPG video stream header found")
    if not frames:
        raise ValueError("no frame chunks in movi list")
    return frames, fps or 0
