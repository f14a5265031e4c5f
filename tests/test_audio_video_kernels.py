"""Audio (RIFF/WAVE PCM) + video (RV01 raw-frame) codecs — S5 real
decode for the remaining media kinds (round 3).

Reference analog: media arrive as opaque binary payloads with typed
metadata and are decoded on demand per stage (``idp_common/s3`` binary
fetch + ``idp_common/image`` decode-on-use); here the codecs are stdlib
struct + numpy, exercised end-to-end by q_multimodal_features' oracle.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernels.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.image import (
    encode_bmp,
    encode_ppm,
    image_features,
    image_sums,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.video import (
    decode_rawvideo,
    encode_rawvideo,
    frame_count,
    sample_frame_indices,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.multimodal import (
    _decode_one,
    synth_audio_payload,
    synth_video_payload,
)


def test_wav_roundtrip():
    s = ((np.arange(999) * 37) % 256 - 128).astype(np.int16) * 256
    sr, ch, out = decode_wav(encode_wav(s, 16000, 1))
    assert (sr, ch) == (16000, 1)
    assert np.array_equal(out, s)


def test_wav_roundtrip_stereo():
    s = (np.arange(400) % 64 - 32).astype(np.int16)
    sr, ch, out = decode_wav(encode_wav(s, 8000, 2))
    assert (sr, ch) == (8000, 2)
    assert np.array_equal(out, s)


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real WAVs carry LIST/INFO/fact chunks between fmt and data; the
    walker must skip them with even-byte padding."""
    s = np.array([100, -100, 200, -200, 300], dtype=np.int16)
    wav = encode_wav(s, 8000, 1)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    body = b"WAVE" + extra + wav[12:]
    wav2 = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, ch, out = decode_wav(wav2)
    assert sr == 8000 and np.array_equal(out, s)


def test_wav_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_wav(None)
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)
    # 8-bit PCM: unsupported, must raise not silently misparse
    s = np.array([1, 2], dtype=np.int16)
    wav = bytearray(encode_wav(s, 8000, 1))
    wav[34] = 8  # bits-per-sample field
    with pytest.raises(ValueError):
        decode_wav(bytes(wav))


def test_audio_features_closed_form():
    s = np.array([256, -256, 512, -512, 0], dtype=np.int16)
    f = audio_features(s, 8000, 1)
    assert f[0] == 0.0  # mean
    assert f[1] == -512 / 32768.0 and f[2] == 512 / 32768.0
    assert f[3] == (256 + 256 + 512 + 512 + 0) / (32768.0 * 5)
    # sign sequence: + - + - +  -> 4 crossings over 4 steps
    assert f[4] == 1.0
    assert f[5] == 5 / 8000.0 and f[6] == 8000.0 and f[7] == 5.0


def test_rawvideo_roundtrip_mixed_codecs():
    frames, arrs = [], []
    for f in range(5):
        arr = ((np.arange(20 * 12 * 3).reshape(20, 12, 3) + f) % 256).astype(np.uint8)
        arrs.append(arr)
        frames.append(encode_bmp(arr) if f % 2 else encode_ppm(arr))
    rv = encode_rawvideo(frames)
    assert frame_count(rv) == 5
    n, dec = decode_rawvideo(rv)
    assert n == 5 and all(np.array_equal(a, b) for a, b in zip(dec, arrs))


def test_frame_sampling_decodes_only_sampled():
    frames = [
        encode_bmp(np.full((4, 4, 3), f, dtype=np.uint8)) for f in range(6)
    ]
    rv = encode_rawvideo(frames)
    assert sample_frame_indices(6, 4) == [0, 1, 3, 4]
    assert sample_frame_indices(2, 4) == [0, 1]  # k clamped to n
    n, dec = decode_rawvideo(rv, sample_k=4)
    assert n == 6  # total count read from the header, not the sample
    assert [int(a[0, 0, 0]) for a in dec] == [0, 1, 3, 4]


def test_image_sums_matches_features():
    arr = ((np.arange(9 * 7 * 3).reshape(9, 7, 3) * 11) % 256).astype(np.uint8)
    sr, sg, sb, sl, lo, hi, n = image_sums(arr)
    f = image_features(arr)
    assert f[0] == sr / (255.0 * n) and f[3] == sl / (255000.0 * n)
    assert f[4] == lo / 255000.0 and f[5] == hi / 255000.0


def test_decode_one_audio_real_vs_synth():
    for mid in ["1", "17", "4242"]:
        payload = synth_audio_payload(mid)
        w, h, nf, feats = _decode_one(payload, "audio", (32, 32))
        assert w in (8000, 16000, 24000) and h == 1
        assert nf == feats[7] and 512 <= nf <= 2304
        assert -1.0 <= feats[0] <= 1.0 and 0.0 <= feats[4] <= 1.0


def test_decode_one_video_real_vs_synth():
    for mid in ["3", "99", "31337"]:
        payload = synth_video_payload(mid)
        w, h, nf, feats = _decode_one(payload, "video", (32, 32))
        assert 16 <= w < 64 and 16 <= h < 64 and 2 <= nf <= 7
        assert feats[6] <= 32 and feats[7] <= 32  # resized into the box
        assert 0.0 <= feats[3] <= 1.0  # luma mean


def test_decode_one_falls_back_on_unknown_container():
    # raw text bytes: no codec claims them -> documented md5 stub path
    w, h, nf, feats = _decode_one(b"not a media payload", "audio", (32, 32))
    assert 64 <= w < 256 and len(feats) == 8
