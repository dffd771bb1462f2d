"""MJPEG-AVI container codec tests (operators/video.py, round 7):
roundtrip, verifying-parser refusals, and the Spark leg
(attach_mjpeg_media → video_frame_features)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyprima_spark.operators.video import decode_mjpeg_avi, encode_mjpeg_avi


def _frames(n=5, h=24, w=32):
    return [
        ((np.arange(h * w, dtype=np.int64) * 13 + 31 * t) % 256)
        .astype(np.uint8)
        .reshape(h, w)
        for t in range(n)
    ]


def test_roundtrip_frame_count_fps_and_fidelity():
    frames = _frames()
    back, fps = decode_mjpeg_avi(encode_mjpeg_avi(frames, fps=12, quality=95))
    assert fps == 12 and len(back) == 5
    for a, b in zip(frames, back):
        assert a.shape == b.shape
        # the sawtooth test pattern has mod-256 wrap discontinuities
        # (hard high-frequency edges), so q95 quantization legitimately
        # costs a few levels — bound the envelope, not exactness
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 8


def test_flat_frames_roundtrip_exactly():
    frames = [np.full((16, 16), 40 * t % 256, dtype=np.uint8) for t in range(1, 5)]
    back, _ = decode_mjpeg_avi(encode_mjpeg_avi(frames, quality=85))
    assert all((a == b).all() for a, b in zip(frames, back))


def test_writer_input_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_mjpeg_avi([])
    with pytest.raises(ValueError, match="one \\(h, w\\)"):
        encode_mjpeg_avi(
            [np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)]
        )


def test_reader_refuses_corruptions():
    payload = encode_mjpeg_avi(_frames(3))

    with pytest.raises(ValueError, match="RIFF"):
        decode_mjpeg_avi(b"XXXX" + payload[4:])

    with pytest.raises(ValueError, match="truncated"):
        decode_mjpeg_avi(payload[: len(payload) // 2])

    # flip the stream handler to a compressed codec fourcc: must refuse
    corrupted = bytearray(payload)
    i = payload.index(b"vids") + 4
    corrupted[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="handler"):
        decode_mjpeg_avi(bytes(corrupted))

    # corrupt a frame's JPEG bytes: the verifying JPEG parser fires
    j = payload.index(b"00dc") + 8
    bad_frame = bytearray(payload)
    bad_frame[j] ^= 0xFF
    with pytest.raises(ValueError):
        decode_mjpeg_avi(bytes(bad_frame))


def test_spark_video_leg(spark):
    from pyprima_spark.operators.multimodal import (
        attach_mjpeg_media,
        video_frame_features,
    )

    docs = spark.range(1, 7).withColumnRenamed("id", "doc_id")
    media = attach_mjpeg_media(docs, fps=10)
    rows = video_frame_features(media, k=4).collect()
    assert len(rows) == 6 * 4
    for r in rows:
        d = int(r.doc_id)
        assert r.n_frames == 4 + d % 8
        assert (r.width, r.height) == (16 + d % 9, 16 + d % 5)
        assert r.fps == 10
        # evenly-spaced index rule shared with the frame_sample stub
        assert 0 <= r.frame_idx <= r.n_frames - 1
        assert 0 <= r.mean_y <= 255
    first_last = {
        (r.doc_id, r.frame_idx) for r in rows
    }
    for d in range(1, 7):
        n = 4 + d % 8
        assert (d, 0) in first_last and (d, n - 1) in first_last
