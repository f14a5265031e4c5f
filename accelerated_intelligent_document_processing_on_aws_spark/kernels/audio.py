"""Stdlib audio codec for the multimodal stage (S5 real decode, audio).

The sandbox ships no audio libraries, so decode covers the one format
fully expressible with ``struct`` + numpy: RIFF/WAVE 16-bit PCM.  The
parser walks the RIFF chunk list properly (chunk id + little-endian size,
even-byte padding, unknown chunks skipped) and reads ``fmt `` before
``data`` — real container parsing, not a hash stub; swap ``decode_wav``
for ffmpeg/soundfile in production for compressed codecs.

Reference analog: the reference treats media as opaque S3 payloads with
typed metadata and decodes on demand per stage (``idp_common/s3/__init__.py``
get_binary_content + ``idp_common/image/__init__.py`` decode-on-use); the
Spark rebuild keeps payloads as ``binary`` columns and decodes inside an
Arrow-batched ``mapInPandas`` (operators/multimodal.py).

``audio_features`` accumulates INTEGER sums (|sum| << 2^53) and divides
once, so features are FP-portable and hash-certifiable after one ROUND —
the same discipline as ``kernels/image.py`` image_features.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """int16 sample array (interleaved if multi-channel) -> RIFF/WAVE
    16-bit PCM bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE 16-bit PCM bytes -> (sample_rate, n_channels, int16
    samples, interleaved).  Walks the chunk list: unknown chunks (LIST,
    INFO, fact, ...) are skipped with even-byte padding per the spec."""
    if data is None:
        raise ValueError("cannot decode null payload")
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", data, 4)[0]
    sample_rate = n_channels = None
    pcm = None
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, n_channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0
            )
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_format} bits={bits}"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # chunks are even-byte aligned
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sample_rate, n_channels, np.frombuffer(pcm, dtype="<i2")


def audio_features(
    samples: np.ndarray, sample_rate: int, n_channels: int
) -> list[float]:
    """8 engine-portable features from int16 PCM: mean / min / max /
    mean-abs amplitude (scaled to [-1, 1]), zero-crossing rate (sign
    flips between consecutive samples, s >= 0 as the sign), duration in
    seconds, sample rate, total sample count.  Integer sums, one divide
    each — exact in float64, reproducible by a SQL oracle."""
    s = np.asarray(samples, dtype=np.int64)
    n = int(s.size)
    if n == 0:
        raise ValueError("empty PCM payload")
    nonneg = s >= 0
    crossings = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
    frames = n // max(n_channels, 1)
    return [
        int(s.sum()) / (32768.0 * n),
        int(s.min()) / 32768.0,
        int(s.max()) / 32768.0,
        int(np.abs(s).sum()) / (32768.0 * n),
        crossings / (n - 1.0) if n > 1 else 0.0,
        frames / float(sample_rate),
        float(sample_rate),
        float(n),
    ]
