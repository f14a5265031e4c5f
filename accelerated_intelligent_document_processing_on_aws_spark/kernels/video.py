"""Raw-frame video container for the multimodal stage (S5, frame-sample).

The sandbox ships no video codecs, so "video" is the simplest REAL
uncompressed container expressible with stdlib struct: magic ``RV01`` +
frame count + length-prefixed encoded frames, each frame an ordinary
BMP/PPM payload decoded by the real raster codec (``kernels/image.py``)
— the MJPEG shape with stdlib-decodable frames.  Container walk, frame
extraction and evenly-spaced frame sampling are real; swap
``decode_rawvideo`` for ffmpeg in production for compressed codecs.

``sample_frame_indices`` is the pipeline-relevant operator the brief
names ("frame-sample"): pick at most ``k`` evenly spaced frames with the
same pure-integer arithmetic as the image resize (``(j * n) // k``) so a
SQL oracle reproduces exactly which frames were decoded.
"""

from __future__ import annotations

import struct

import numpy as np

from .image import decode_image

MAGIC = b"RV01"


def encode_rawvideo(frames: list[bytes]) -> bytes:
    """List of encoded frame payloads (BMP/PPM bytes) -> container."""
    out = [MAGIC, struct.pack("<I", len(frames))]
    for fb in frames:
        out.append(struct.pack("<I", len(fb)))
        out.append(fb)
    return b"".join(out)


def frame_count(data: bytes) -> int:
    if bytes(data[:4]) != MAGIC:
        raise ValueError("not an RV01 payload")
    return struct.unpack_from("<I", bytes(data[4:8]), 0)[0]


def sample_frame_indices(n_total: int, k: int) -> list[int]:
    """At most ``k`` evenly spaced frame indices: ``(j * n) // k`` —
    strictly increasing when k <= n, pure integer (oracle-portable)."""
    k = min(k, n_total)
    return [(j * n_total) // k for j in range(k)]


def decode_rawvideo(
    data: bytes, sample_k: int | None = None
) -> tuple[int, list[np.ndarray]]:
    """Container bytes -> (total frame count, decoded RGB arrays).

    With ``sample_k`` set, only the evenly-sampled frames are DECODED —
    the walk still skips over every frame header (length arithmetic),
    but the raster parse runs per sampled frame only: at scale, decode
    cost is the budget, and sampling before decoding is the point.
    """
    if data is None:
        raise ValueError("cannot decode null payload")
    data = bytes(data)
    n = frame_count(data)
    want = set(range(n)) if sample_k is None else set(sample_frame_indices(n, sample_k))
    pos, frames = 8, []
    for i in range(n):
        size = struct.unpack_from("<I", data, pos)[0]
        if i in want:
            frames.append(decode_image(data[pos + 4 : pos + 4 + size]))
        pos += 4 + size
    return n, frames
