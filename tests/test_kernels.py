"""Kernel unit tests — mirror the reference's mocked-service unit structure
(SURVEY.md §5): each extraction kernel pinned by targeted fixtures plus a
property test for the span-offset contract."""

import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.kernels import (
    compare,
    html_main,
    ocr_blocks,
    pdfish,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.extract import (
    detect_kind,
    extract_turn,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.normalize import (
    normalize_for_compare,
    normalize_plain,
)


class TestNormalizePlain:
    def test_strip_and_join(self):
        text, spans = normalize_plain("  hello  \n\n  world  ")
        assert text == "hello\nworld"
        assert [(s[2], s[3]) for s in spans] == [(2, 7), (13, 18)]

    def test_offsets_into_original(self):
        src = "  a b  \n\tc d\t\n\n e "
        _, spans = normalize_plain(src)
        for _sid, _k, s, e, t in spans:
            assert src[s:e] == t

    def test_empty(self):
        assert normalize_plain("") == ("", [])
        assert normalize_plain("\n\n  \n") == ("", [])

    def test_compare_normalization(self):
        # comparator.py:86-101 semantics
        assert normalize_for_compare("Hello,  World!") == "hello world"
        assert normalize_for_compare("  A\tB\nC  ") == "a b c"


class TestOcrBlocks:
    PAYLOAD = json.dumps(
        {
            "Blocks": [
                {"BlockType": "LINE", "Text": "first line", "Confidence": 98.76},
                {"BlockType": "WORD", "Text": "skipped"},
                {
                    "BlockType": "LINE",
                    "Text": "pipe|here",
                    "Confidence": 55.55,
                    "TextType": "HANDWRITING",
                },
            ]
        }
    )

    def test_line_join(self):
        text, spans = ocr_blocks.extract_lines(self.PAYLOAD)
        assert text == "first line\npipe|here"
        for _sid, _k, s, e, t in spans:
            assert self.PAYLOAD[s:e] == t

    def test_confidence_table(self):
        # ocr/service.py:1516-1556: pipe-escape, 1dp, HANDWRITING tag
        tbl = ocr_blocks.text_confidence_table(self.PAYLOAD)
        lines = tbl.split("\n")
        assert lines[0] == "| Text | Confidence |"
        assert lines[2] == "| first line | 98.8 |"
        assert lines[3] == "| pipe\\|here (HANDWRITING) | 55.5 |"

    def test_malformed_json(self):
        assert ocr_blocks.extract_lines("{not json") == ("", [])
        assert ocr_blocks.extract_lines('{"Blocks": 5}') == ("", [])

    def test_synthetic_roundtrip(self):
        # ocr/service.py:1760-1793 → :1558-1630 parse
        blocks = ocr_blocks.synthetic_blocks(" a \n\n b ")
        text, _ = ocr_blocks.extract_lines(blocks)
        assert text == "a\nb"


class TestHtmlMain:
    def test_nav_footer_stripped(self):
        html = (
            '<html><body><nav><a href="/">home page link text</a></nav>'
            "<p>the real content paragraph with enough words</p>"
            "<footer>tiny footer text here now</footer></body></html>"
        )
        text, spans = html_main.extract_main(html)
        assert text == "the real content paragraph with enough words"
        kinds = {s[1] for s in spans}
        assert "boilerplate" in kinds

    def test_link_density(self):
        html = (
            '<p>word <a href="#">many linked words in this anchor body</a></p>'
            "<p>normal paragraph with plenty of plain words</p>"
        )
        text, _ = html_main.extract_main(html)
        assert text == "normal paragraph with plenty of plain words"

    def test_min_words(self):
        text, _ = html_main.extract_main("<p>too short</p><p>this one is long enough</p>")
        assert text == "this one is long enough"

    def test_span_offsets(self):
        html = "<div><p>  alpha beta gamma delta  </p></div>"
        _, spans = html_main.extract_main(html)
        content = [s for s in spans if s[1] == "content"]
        assert len(content) == 1
        _sid, _k, s, e, t = content[0]
        assert html[s:e] == t == "alpha beta gamma delta"


class TestPdfish:
    def test_layout(self):
        src = "[H1] Title\n[P] body text\n[TR] a|b\n[TR] c|d\n[PB]\n[H2] Next\nuntagged para"
        text, spans = pdfish.extract_layout(src)
        assert text.split("\n") == [
            "# Title",
            "body text",
            "| a | b |",
            "|---|---|",
            "| c | d |",
            "## Next",
            "untagged para",
        ]
        for _sid, _k, s, e, t in spans:
            assert src[s:e] == t
        assert [s[1] for s in spans] == [
            "heading",
            "content",
            "table",
            "table",
            "heading",
            "content",
        ]


class TestDispatch:
    def test_detect(self):
        assert detect_kind('{"Blocks": []}') == "ocr_blocks"
        assert detect_kind("<div>x</div>") == "html"
        assert detect_kind("[H1] x") == "pdfish"
        assert detect_kind("plain words") == "plain"

    def test_boundary(self):
        text, spans, kinds, boundary = extract_turn("<<DOC>>\nhello world line")
        assert boundary and text == "hello world line"
        src = "<<DOC>>\nhello world line"
        for _sid, _k, s, e, t in spans:
            assert src[s:e] == t

    def test_mixed_segments(self):
        src = "plain line\n-----\n[H1] Doc Title\n[P] para"
        text, spans, kinds, _ = extract_turn(src)
        assert kinds == ["plain", "pdfish"]
        assert text == "plain line\n# Doc Title\npara"
        for _sid, _k, s, e, t in spans:
            assert src[s:e] == t

    @given(st.text(alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_span_invariant_any_text(self, src):
        _text, spans, _kinds, _b = extract_turn(src)
        for _sid, _k, s, e, t in spans:
            assert 0 <= s <= e <= len(src)
            # span text must be the literal slice unless unfindable (ocr JSON escapes)
            if _k != "ocr_line" or t in src:
                assert src[s:e] == t


class TestComparators:
    # FIXTURES.md §5 cases; comparator.py:44-336 semantics
    def test_exact(self):
        assert compare.compare_exact("Hello, World!", "hello world")
        assert not compare.compare_exact("alpha", "beta")

    def test_numeric(self):
        assert compare.compare_numeric("$1,234.00", "1234")
        assert compare.compare_numeric("(5)", "-5")
        assert not compare.compare_numeric("abc", "1")

    def test_fuzzy(self):
        assert compare.compare_fuzzy("kitten", "sitten")  # ratio 5/6 ≈ .83
        assert not compare.compare_fuzzy("kitten", "dog")
        assert compare.fuzzy_score("", "") == 1.0

    def test_hungarian_optimal(self):
        cost = np.array([[4, 1, 3], [2, 0, 5], [3, 2, 2]])
        r, c = compare.hungarian_min(cost)
        assert cost[r, c].sum() == 5

    def test_hungarian_rectangular(self):
        cost = np.array([[1.0, 9.0, 9.0], [9.0, 1.0, 9.0]])
        r, c = compare.hungarian_min(cost)
        assert cost[r, c].sum() == 2.0

    def test_hungarian_match(self):
        tp, fp, fn, _ = compare.hungarian_match(
            ["alpha", "beta", "gamma"], ["gama", "alpha", "delta"]
        )
        assert (tp, fp, fn) == (2, 1, 1)

    def test_hungarian_empty(self):
        assert compare.hungarian_match([], []) == (0, 0, 0, 1.0)
        assert compare.hungarian_match(["x"], [])[:3] == (0, 0, 1)


class TestVectorizedComparators:
    def test_fuzzy_matrix_equals_scalar(self):
        import random
        import string

        from accelerated_intelligent_document_processing_on_aws_spark.kernels import compare

        rng = random.Random(7)
        rs = lambda n: "".join(  # noqa: E731
            rng.choice(string.ascii_letters + "  .,'") for _ in range(n)
        )
        exp = ["", "abc", rs(10), rs(25), "Hello, World!", "héllo wörld"]
        act = ["", "abd", rs(9), rs(25), "hello world", rs(40)]
        m = compare.fuzzy_matrix(exp, act)
        for i, e in enumerate(exp):
            for j, a in enumerate(act):
                assert abs(m[i, j] - compare.fuzzy_score(e, a)) < 1e-12, (e, a)

    def test_hungarian_min_optimal_vs_bruteforce(self):
        """Vectorized assignment must stay optimal: checked against
        exhaustive enumeration on random rectangular matrices."""
        import itertools

        import numpy as np

        from accelerated_intelligent_document_processing_on_aws_spark.kernels import compare

        rng = np.random.RandomState(3)
        for _ in range(200):
            n, m = rng.randint(1, 6), rng.randint(1, 6)
            c = rng.rand(n, m)
            rows, cols = compare.hungarian_min(c)
            got = c[rows, cols].sum()
            k = min(n, m)
            best = min(
                sum(c[r, p[i]] for i, r in enumerate(rs))
                for rs in itertools.combinations(range(n), k)
                for p in itertools.permutations(range(m), k)
            )
            assert abs(got - best) < 1e-9
