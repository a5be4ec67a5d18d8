"""Multimodal plumbing tests: schemas, batch shapes, 1→1 and 1→N fan-out,
determinism, real BMP/WAV decode round trips, and the compressed-codec
stub contract."""

from __future__ import annotations

import pytest

from go_web_mapreduce_spark.operators.multimodal import (
    FRAME_SIZE,
    as_media_table,
    decode_bmp,
    decode_payload,
    decode_wav,
    encode_bmp,
    extract_features,
    resize_media,
    sample_frames,
)
from go_web_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return as_media_table(load_table(spark, sf_dir, "documents"))


def test_compressed_decode_is_an_explicit_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload("image/jpeg", b"\xff\xd8\xff")


def test_bmp_round_trip_exact():
    """encode→decode must return the original pixel array bit-for-bit,
    including odd widths that force row padding."""
    import numpy as np

    rng = np.random.default_rng(7)
    for w, h in ((16, 16), (5, 3), (1, 1), (7, 2)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert (back == px).all()


def test_wav_round_trip_exact(tmp_path):
    import io
    import wave

    import numpy as np

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=(441, 2), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(samples.tobytes())
    back = decode_payload("audio/wav", buf.getvalue())
    assert back.shape == (441, 2)
    assert (back == samples).all()


def test_resize_is_one_to_one_fixed_size(media):
    out = resize_media(media, width=8, height=4).collect()
    assert len(out) == media.count()
    assert all(len(r["thumb"]) == 32 and r["width"] == 8 and r["height"] == 4 for r in out)


def test_resize_deterministic(media):
    a = sorted((r["doc_id"], bytes(r["thumb"])) for r in resize_media(media).collect())
    b = sorted((r["doc_id"], bytes(r["thumb"])) for r in resize_media(media).collect())
    assert a == b


def test_resize_validates(media):
    with pytest.raises(ValueError):
        resize_media(media, width=0)


def test_frame_sampling_fan_out_and_offsets(media):
    frames = sample_frames(media, every_n=2).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    sizes = {r["doc_id"]: r["n_bytes"] for r in media.collect()}
    for doc_id, rows in by_doc.items():
        expected = -(-sizes[doc_id] // FRAME_SIZE)  # total frames
        assert len(rows) == len(range(0, expected, 2))
        for r in rows:
            assert r["offset_bytes"] == r["frame_no"] * FRAME_SIZE
            assert 0 < len(r["frame"]) <= FRAME_SIZE


def test_features_fixed_width(media):
    rows = extract_features(media).limit(5).collect()
    assert all(len(r["features"]) == 8 for r in rows)


def test_features_consistent_with_digest(media):
    """Every feature component must be the float32 of its digest slice —
    the invariant the hash-checked query (sum over digest) relies on."""
    import numpy as np

    for r in extract_features(media).limit(10).collect():
        want = [
            np.float32(int(r["digest"][4 * i : 4 * i + 4], 16) / 65535.0)
            for i in range(len(r["features"]))
        ]
        assert [np.float32(f) for f in r["features"]] == want
