"""Minimal AVI (RIFF) container with Motion-JPEG frames — pure stdlib.

The video sibling of the image codecs: an AVI-MJPEG file is a RIFF chunk
tree whose ``movi`` list carries one complete baseline JPEG per frame
(fourcc ``00dc``, handler ``MJPG``) — so with functions/jpeg.py already in
the tree, genuine video encode/decode needs only the container walk
(Microsoft AVI RIFF spec; public). No ffmpeg in this container, and none
needed for this layout.

Encoder: RIFF('AVI ') → LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' +
strf BITMAPINFOHEADER)) → LIST movi (00dc chunks, even-padded) → idx1.
Decoder: chunk walk validating the tree, frame extraction from movi,
per-frame JPEG decode; header/frame-count mismatches raise.

Scale posture: per-payload kernels invoked inside Arrow-batched
``mapInPandas`` (operators/multimodal.py) — same as BMP/PNG/GIF/JPEG.
"""

from __future__ import annotations

import struct

from go_web_mapreduce_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

AVI_FPS = 10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(frames) -> bytes:
    """Encode a list of (h, w) uint8 grayscale arrays as a valid AVI-MJPEG
    file: each frame becomes a complete baseline JPEG in a ``00dc`` chunk.
    All frames must share dimensions."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    jpegs = []
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        jpegs.append(encode_jpeg_gray(f))

    n = len(frames)
    us_per_frame = 1_000_000 // AVI_FPS
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * AVI_FPS, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, AVI_FPS, 0, n,
                      max_bytes, 0, 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame — offset is from the start of 'movi' type
    idx = bytearray()
    off = 4  # past the 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = hdrl + movi + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", b"AVI " + body)


def decode_avi_mjpeg(data: bytes):
    """Decode an AVI-MJPEG payload into a list of decoded frame arrays.
    Validates the RIFF tree, stream handler, and header frame count
    against the movi chunks; raises ValueError on other codecs."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    pos = 12
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    n_frames_hdr = None
    handler = None
    frames = []
    while pos + 8 <= min(end, len(data)):
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_start = pos + 8
        if fourcc == b"LIST":
            listtype = data[body_start : body_start + 4]
            if listtype in (b"hdrl", b"strl", b"movi"):
                # flatten into the list (chunks self-describe; the outer
                # RIFF size bounds the walk)
                pos = body_start + 4
                continue
            pos = body_start + size + (size % 2)
            continue
        if fourcc == b"avih":
            n_frames_hdr = struct.unpack_from("<I", data, body_start + 16)[0]
        elif fourcc == b"strh":
            # accept extra non-video streams (a camera AVI commonly carries
            # an audio track); only the VIDEO stream's codec matters
            if data[body_start : body_start + 4] == b"vids":
                handler = data[body_start + 4 : body_start + 8]
                if handler != b"MJPG":
                    raise ValueError(
                        f"codec {handler!r} requires ffmpeg; only MJPG decodes"
                    )
        elif fourcc in (b"00dc", b"00db"):
            frames.append(decode_jpeg(data[body_start : body_start + size]))
        pos = body_start + size + (size % 2)
    if handler is None:
        raise ValueError("AVI missing video stream header")
    if n_frames_hdr is not None and n_frames_hdr != len(frames):
        raise ValueError(
            f"header declares {n_frames_hdr} frames, movi has {len(frames)}"
        )
    if not frames:
        raise ValueError("AVI contains no frames")
    return frames
