"""Image codec + resize kernel (S5 real decode, round 3).

Reference parity target: ``idp_common/image/__init__.py:13`` resize_image
— fit-within-box min-ratio scaling, floored dims, no upscale by default.
"""

from __future__ import annotations

import numpy as np
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernels.image import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    resize_nearest,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.multimodal import (
    _decode_one,
    synth_image_payload,
)


@pytest.mark.parametrize("w", [1, 16, 17, 18, 19, 63])  # all 4 paddings
def test_bmp_roundtrip_all_paddings(w):
    rng = np.random.RandomState(w)
    a = rng.randint(0, 256, size=(21, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(a)), a)


def test_ppm_roundtrip_and_comments():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(a)), a)
    # spec allows comments between header tokens
    with_comment = b"P6\n# a comment\n13 9\n# more\n255\n" + a.tobytes()
    assert np.array_equal(decode_ppm(with_comment), a)


def test_decode_image_sniffs_magic():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")
    with pytest.raises(ValueError):
        decode_image(None)


def test_resize_reference_semantics():
    a = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    # never upscale: already inside the box
    assert resize_nearest(a[:20, :30], 32, 32).shape == (20, 30, 3)
    # fit within bounds by min ratio, floored dims (ref resize_image)
    r = resize_nearest(a, 32, 32)
    scale = min(32 / 60, 32 / 40)
    assert r.shape == (int(40 * scale), int(60 * scale), 3)
    # aspect preserved within 1px flooring
    assert abs(r.shape[1] / r.shape[0] - 60 / 40) < 0.1
    # upscale only when asked
    assert resize_nearest(a[:8, :8], 32, 32, allow_upscale=True).shape == (32, 32, 3)


def test_resize_integer_sampling():
    # NN sampling must use (dst*size)//new_size — oracle-portable ints
    a = np.arange(10, dtype=np.uint8).reshape(10, 1, 1).repeat(3, axis=2).repeat(4, axis=1)
    r = resize_nearest(a, 4, 5)
    expect = [(y * 10) // 5 for y in range(5)]
    assert [int(v) for v in r[:, 0, 0]] == expect


def test_image_features_closed_form():
    # solid color: means are exact channel values
    a = np.full((6, 5, 3), 100, dtype=np.uint8)
    a[:, :, 1] = 200
    f = image_features(a)
    assert f[0] == 100 / 255.0 and f[1] == 200 / 255.0 and f[2] == 100 / 255.0
    luma = (299 * 100 + 587 * 200 + 114 * 100) / 255000.0
    assert f[3] == f[4] == f[5] == luma
    assert f[6] == 5.0 and f[7] == 6.0


def test_synth_payload_real_roundtrip():
    """The query-side payload builder emits REAL encoded bytes that the
    REAL decoder reproduces: dims and gradient match the md5 derivation."""
    import hashlib

    for mid in ("1", "42", "12345"):
        hb = hashlib.md5(mid.encode()).digest()
        w, h, nf, feats = _decode_one(synth_image_payload(mid), "image", (32, 32))
        assert (w, h) == (16 + hb[0] % 48, 16 + hb[1] % 48) and nf == 1
        scale = min(32 / w, 32 / h, 1.0)
        assert feats[6] == float(max(1, int(w * scale)))
        assert feats[7] == float(max(1, int(h * scale)))


def test_binarize_adaptive_matches_bruteforce():
    """The integral-image binarizer must equal the per-pixel definition
    (edge-clipped local mean window, gray*cnt > winsum - C*cnt) on seeded
    random images, including non-default block/C."""
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.image import (
        binarize_adaptive,
    )

    rng = np.random.RandomState(7)
    for h, w, block, c in ((9, 13, 15, 10), (20, 6, 5, 3), (3, 3, 15, 10)):
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = binarize_adaptive(arr, block=block, c=c)
        px = arr.astype(np.int64)
        g = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        r = block // 2
        for y in range(h):
            for x in range(w):
                win = g[max(0, y - r): y + r + 1, max(0, x - r): x + r + 1]
                want = 255 if g[y, x] * win.size > win.sum() - c * win.size else 0
                assert got[y, x] == want, (y, x)


def test_binarize_adaptive_properties():
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.image import (
        binarize_adaptive,
    )

    # uniform image: every pixel equals its local mean, so gray > mean - C
    # holds everywhere -> all white (reference ADAPTIVE_THRESH_MEAN_C
    # behavior for flat regions)
    flat = np.full((10, 10, 3), 77, dtype=np.uint8)
    assert (binarize_adaptive(flat) == 255).all()
    # output domain is {0, 255}; grayscale input accepted
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(12, 8), dtype=np.uint8)
    out = binarize_adaptive(gray)
    assert set(np.unique(out)) <= {0, 255}
    # even block size rejected
    import pytest

    with pytest.raises(ValueError):
        binarize_adaptive(flat, block=4)
