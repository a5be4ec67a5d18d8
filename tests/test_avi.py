"""AVI-MJPEG container tests: exact multi-frame round trips through the
pure-stdlib RIFF walk + JPEG codec, plus honest refusal of codecs that
genuinely need ffmpeg."""

from __future__ import annotations

import numpy as np
import pytest

from go_web_mapreduce_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _block_frames(vals_list):
    ones = np.ones((8, 8), np.int64)
    return [
        np.kron(np.asarray(v).reshape(2, 2), ones).astype(np.uint8)
        for v in vals_list
    ]


def test_multi_frame_roundtrip_exact():
    frames = _block_frames([[10, 20, 30, 40], [50, 60, 70, 80], [1, 2, 3, 4]])
    back = decode_avi_mjpeg(encode_avi_mjpeg(frames))
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_single_frame_and_odd_sized_jpeg_padding():
    """RIFF chunks are even-padded; frames whose JPEG happens to be
    odd-length must still round-trip."""
    rng = np.random.default_rng(2)
    for seed in range(6):
        vals = rng.integers(0, 256, 4)
        frames = _block_frames([vals])
        back = decode_avi_mjpeg(encode_avi_mjpeg(frames))
        assert np.array_equal(back[0], frames[0])


def test_header_frame_count_validated():
    frames = _block_frames([[9, 9, 9, 9], [8, 8, 8, 8]])
    data = bytearray(encode_avi_mjpeg(frames))
    avih = data.find(b"avih")
    import struct

    struct.pack_into("<I", data, avih + 8 + 16, 7)  # lie: 7 frames
    with pytest.raises(ValueError, match="declares 7 frames"):
        decode_avi_mjpeg(bytes(data))


def test_non_mjpeg_codec_refused():
    frames = _block_frames([[9, 9, 9, 9]])
    data = bytearray(encode_avi_mjpeg(frames))
    i = data.find(b"MJPG")  # strh handler comes first
    data[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="ffmpeg"):
        decode_avi_mjpeg(bytes(data))


def test_non_avi_refused():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_track_tolerated():
    """An AVI with an extra non-video stream header (camera files carry
    audio) must still decode its MJPEG frames."""
    import struct

    frames = _block_frames([[9, 9, 9, 9]])
    data = bytearray(encode_avi_mjpeg(frames))
    auds = b"strh" + struct.pack("<I", 8) + b"auds" + b"PCM "
    i = bytes(data).find(b"idx1")
    patched = bytearray(bytes(data[:i]) + auds + bytes(data[i:]))
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    back = decode_avi_mjpeg(bytes(patched))
    assert len(back) == 1 and np.array_equal(back[0], frames[0])
