"""Hypothesis property tests for the pure-Python kernels (SURVEY.md §5
test strategy: the reference pins behavior with fixtures; we additionally
pin ALGEBRAIC invariants over arbitrary inputs, which fixtures cannot).

No Spark here — every kernel under test is the numpy/stdlib layer the
Arrow UDFs batch over, so hundreds of generated cases run in
milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.kernels.audio import (
    audio_features,
    decode_wav,
    encode_wav,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.image import (
    decode_image,
    encode_bmp,
    encode_ppm,
    resize_nearest,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.office import (
    docx_to_markdown,
    make_docx,
    make_xlsx,
    xlsx_to_markdown,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.video import (
    decode_rawvideo,
    encode_rawvideo,
    sample_frame_indices,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.wrap import (
    paginate,
    wrap_line,
    wrap_text,
)

rgb = st.integers(min_value=0, max_value=255)
dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@st.composite
def rasters(draw):
    # one fixed-size binary draw instead of h*w*3 integer draws: a 40x40
    # raster costs 4800 entropy-buffer entries as a list (6 of them in the
    # video test overran hypothesis's example-size budget -> flaky
    # FailedHealthCheck data_too_large), but a single bytes draw is compact
    # and uniform over uint8 all the same
    h, w = draw(dims)
    flat = draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    return np.frombuffer(flat, dtype=np.uint8).reshape(h, w, 3).copy()


class TestImageCodecs:
    @given(rasters())
    @settings(max_examples=60, deadline=None)
    def test_bmp_roundtrip_lossless(self, arr):
        assert np.array_equal(decode_image(encode_bmp(arr)), arr)

    @given(rasters())
    @settings(max_examples=60, deadline=None)
    def test_ppm_roundtrip_lossless(self, arr):
        assert np.array_equal(decode_image(encode_ppm(arr)), arr)

    @given(rasters(), st.integers(1, 64), st.integers(1, 64))
    @settings(max_examples=60, deadline=None)
    def test_resize_never_upscales_never_distorts(self, arr, tw, th):
        out = resize_nearest(arr, tw, th)
        h, w = arr.shape[:2]
        nh, nw = out.shape[:2]
        # never upscale: output fits the ORIGINAL dims
        assert nh <= h and nw <= w
        # fits the box whenever a downscale happened
        if (nh, nw) != (h, w):
            assert nw <= tw and nh <= th
        # every output pixel is an input pixel (nearest-neighbor, no blend)
        flat_in = {tuple(px) for px in arr.reshape(-1, 3)}
        assert all(tuple(px) in flat_in for px in out.reshape(-1, 3))


class TestAudioCodec:
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=2000),
        st.sampled_from([8000, 16000, 44100]),
        st.sampled_from([1, 2]),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_lossless(self, samples, sr, n_ch):
        if len(samples) % n_ch:
            samples = samples + [0]
        pcm = np.array(samples, dtype=np.int16)
        sr2, ch2, out = decode_wav(encode_wav(pcm, sr, n_ch))
        assert (sr2, ch2) == (sr, n_ch)
        assert np.array_equal(out, pcm)

    @given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=500))
    @settings(max_examples=60, deadline=None)
    def test_features_bounded(self, samples):
        f = audio_features(np.array(samples, dtype=np.int16), 8000, 1)
        mean, lo, hi, mean_abs, zcr = f[0], f[1], f[2], f[3], f[4]
        assert -1.0 <= lo <= mean <= hi <= 1.0
        assert 0.0 <= mean_abs <= 1.0 and 0.0 <= zcr <= 1.0


class TestVideoContainer:
    @given(st.lists(rasters(), min_size=1, max_size=6), st.integers(1, 8))
    @settings(max_examples=30, deadline=None)
    def test_container_roundtrip_and_sampling(self, frames, k):
        payload = encode_rawvideo([encode_ppm(f) for f in frames])
        n, decoded = decode_rawvideo(payload, sample_k=k)
        assert n == len(frames)
        idxs = sample_frame_indices(n, k)
        assert len(decoded) == len(idxs)
        for got, i in zip(decoded, idxs):
            assert np.array_equal(got, frames[i])

    @given(st.integers(1, 1000), st.integers(1, 16))
    def test_sample_indices_strictly_increasing_in_range(self, n, k):
        idxs = sample_frame_indices(n, k)
        assert idxs[0] == 0 and len(idxs) == min(k, n)
        assert all(0 <= i < n for i in idxs)
        assert all(b > a for a, b in zip(idxs, idxs[1:]))


printable = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    max_size=60,
)


class TestWrap:
    @given(printable, st.integers(1, 30))
    @settings(max_examples=100, deadline=None)
    def test_wrap_line_width_and_content(self, line, width):
        line = line.replace("\n", " ")
        out = wrap_line(line, width)
        # no emitted line exceeds width
        assert all(len(piece) <= width for piece in out)
        # lossless modulo whitespace: wraps split at spaces (dropping them)
        # or hard-split oversize words (dropping nothing), so the non-space
        # character stream is preserved exactly, in order
        assert "".join(out).replace(" ", "") == line.replace(" ", "")

    @given(printable, st.integers(1, 20), st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_paginate_covers_all_lines(self, text, width, lpp):
        pages = paginate(text, width, lpp)
        lines = wrap_text(text, width)
        assert sum(len(p.split("\n")) for p in pages) >= len(lines)
        assert "\n".join(pages).split("\n") == lines or lines == [""]


cell = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    max_size=12,
).map(lambda s: s.replace("|", " ").strip())


class TestOfficeRoundTrip:
    @given(
        st.lists(st.lists(cell, min_size=2, max_size=4), min_size=1, max_size=5)
    )
    @settings(max_examples=40, deadline=None)
    def test_xlsx_roundtrip_cells_survive(self, grid):
        width = max(len(r) for r in grid)
        grid = [r + [""] * (width - len(r)) for r in grid]
        md = xlsx_to_markdown(make_xlsx({"S": grid}))
        for row in grid:
            for c in row:
                # markdown escapes pipes; all our cells are pipe-free
                if c.strip():
                    assert c.strip() in md

    @given(st.lists(cell.filter(lambda s: s.strip()), min_size=1, max_size=6))
    @settings(max_examples=40, deadline=None)
    def test_docx_roundtrip_paragraphs_survive(self, paras):
        blocks = [("p", p) for p in paras]
        md = docx_to_markdown(make_docx(blocks))
        for p in paras:
            assert p.strip() in md


class TestComparatorProperties:
    @given(printable, printable)
    @settings(max_examples=150, deadline=None)
    def test_fuzzy_score_bounded_symmetric_reflexive(self, a, b):
        from accelerated_intelligent_document_processing_on_aws_spark.kernels import (
            compare,
        )

        s = compare.fuzzy_score(a, b)
        assert 0.0 <= s <= 1.0
        assert compare.fuzzy_score(a, b) == compare.fuzzy_score(b, a)
        assert compare.fuzzy_score(a, a) == 1.0

    @given(printable, printable)
    @settings(max_examples=100, deadline=None)
    def test_semantic_score_bounded_symmetric_reflexive(self, a, b):
        from accelerated_intelligent_document_processing_on_aws_spark.kernels import (
            compare,
        )

        s = compare.semantic_score(a, b)
        assert -1e-9 <= s <= 1.0 + 1e-9
        assert compare.semantic_score(a, b) == compare.semantic_score(b, a)
        if a.split():
            assert abs(compare.semantic_score(a, a) - 1.0) < 1e-9

    @given(st.integers(-10**9, 10**9))
    def test_numeric_formats_agree(self, n):
        from accelerated_intelligent_document_processing_on_aws_spark.kernels import (
            compare,
        )

        # $-prefixed, comma-grouped, and accounting-negative forms all
        # normalize to the same number
        assert compare.compare_numeric(f"{n:,}", str(n))
        assert compare.compare_numeric(f"${abs(n):,}", str(abs(n)))
        if n < 0:
            assert compare.compare_numeric(f"({abs(n)})", str(n))


class TestJsonSniffProperties:
    @given(
        st.dictionaries(
            st.text(st.characters(codec="ascii", exclude_characters='"\\'),
                    min_size=1, max_size=8),
            st.one_of(st.integers(-1000, 1000), st.booleans(),
                      st.text(st.characters(codec="ascii",
                              exclude_characters='"\\'), max_size=10)),
            min_size=1, max_size=5,
        ),
        printable,
        printable,
    )
    @settings(max_examples=80, deadline=None)
    def test_embedded_json_object_recovered(self, obj, pre, post):
        import json as _json

        from accelerated_intelligent_document_processing_on_aws_spark.kernels.json_sniff import (
            extract_json_from_text,
        )

        payload = _json.dumps(obj)
        # surround with prose that contains no braces of its own
        pre = pre.replace("{", "(").replace("}", ")")
        post = post.replace("{", "(").replace("}", ")")
        got = extract_json_from_text(f"{pre} {payload} {post}")
        assert got is not None
        assert _json.loads(got) == obj
