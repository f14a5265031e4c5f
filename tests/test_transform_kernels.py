"""Unit tests for the scalar transform kernels (P10 json sniff, P4
wrap/paginate, P5 csv->markdown) and their Spark wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.kernels.csv_table import (
    csv_to_markdown,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.json_sniff import (
    detect_format,
    extract_json_from_text,
    first_balanced_object,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.wrap import (
    paginate,
    wrap_line,
    wrap_text,
)


class TestJsonSniff:
    def test_fenced_json(self):
        t = 'noise\n```json\n{"a": 1, "b": [2, 3]}\n```\ntail'
        assert extract_json_from_text(t) == '{"a":1,"b":[2,3]}'

    def test_fenced_any_language(self):
        t = 'x\n```\n{"k": "v"}\n```'
        assert extract_json_from_text(t) == '{"k":"v"}'

    def test_brace_matching_with_strings(self):
        t = 'prefix {"msg": "has } brace and \\" quote", "n": 2} suffix'
        assert (
            extract_json_from_text(t)
            == '{"msg":"has } brace and \\" quote","n":2}'
        )

    def test_first_invalid_object_skipped(self):
        t = "{not json} then {\"ok\": true}"
        assert extract_json_from_text(t) == '{"ok":true}'

    def test_whole_text_array(self):
        assert extract_json_from_text("[1, 2, 3]") == "[1,2,3]"

    def test_none_cases(self):
        assert extract_json_from_text(None) is None
        assert extract_json_from_text("just words") is None
        assert first_balanced_object("{{{") is None

    def test_detect_format(self):
        assert detect_format('{"a":1}') == "json"
        assert detect_format("key: value\nother: 2") == "yaml"
        assert detect_format("plain words") == "text"
        assert detect_format("") == "text"


class TestWrap:
    def test_wrap_short(self):
        assert wrap_line("ab cd", 10) == ["ab cd"]

    def test_wrap_breaks_at_spaces(self):
        assert wrap_line("aaa bbb ccc", 7) == ["aaa bbb", "ccc"]

    def test_hard_split_long_word(self):
        assert wrap_line("abcdefghij", 4) == ["abcd", "efgh", "ij"]

    def test_wrap_text_preserves_newlines(self):
        assert wrap_text("ab\ncd ef", 5) == ["ab", "cd ef"]

    def test_paginate(self):
        text = "\n".join(f"line{i}" for i in range(5))
        pages = paginate(text, width=80, lines_per_page=2)
        assert len(pages) == 3
        assert pages[0] == "line0\nline1"
        assert pages[2] == "line4"

    def test_paginate_empty(self):
        assert paginate("", 80, 10) == [""]


class TestCsvTable:
    def test_basic_table(self):
        md = csv_to_markdown("a,b\n1,2\n3,4")
        assert md.splitlines() == [
            "| a | b |",
            "| --- | --- |",
            "| 1 | 2 |",
            "| 3 | 4 |",
        ]

    def test_quoted_comma_and_pipe_escape(self):
        md = csv_to_markdown('name,desc\n"x, y",has|pipe')
        assert "| x, y | has\\|pipe |" in md

    def test_ragged_rows_padded(self):
        md = csv_to_markdown("a,b,c\n1,2")
        assert "| 1 | 2 |  |" in md

    def test_empty(self):
        assert csv_to_markdown("") == ""
        assert csv_to_markdown("  \n ") == ""


class TestSparkWiring:
    def test_json_sniff_udf(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.transforms import (
            json_sniff_udf,
        )

        df = spark.createDataFrame(
            [(1, 'see ```json\n{"x": 1}\n```'), (2, "no json here"), (3, None)],
            ["id", "t"],
        )
        rows = {
            r.id: r
            for r in df.select(
                "id", json_sniff_udf(F.col("t")).alias("s")
            ).select("id", "s.json", "s.format").collect()
        }
        assert rows[1].json == '{"x":1}' and rows[1].format == "json"
        assert rows[2].json is None and rows[2].format == "text"
        assert rows[3].json is None and rows[3].format == "text"

    def test_explode_pages(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.transforms import (
            explode_pages,
        )

        text = "\n".join(f"l{i}" for i in range(7))
        df = spark.createDataFrame([(1, text)], ["id", "text"])
        out = explode_pages(df, "text", width=80, lines_per_page=3).collect()
        assert [(r.id, r.page_idx) for r in out] == [(1, 0), (1, 1), (1, 2)]
        assert out[0].page_text == "l0\nl1\nl2"

    def test_bool_normalize(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.transforms import (
            bool_normalize,
        )

        df = spark.createDataFrame(
            [("TRUE",), ("no",), (" 1 ",), ("maybe",), (None,)], ["v"]
        )
        got = [r.b for r in df.select(bool_normalize(F.col("v")).alias("b")).collect()]
        assert got == [True, False, True, None, None]

    def test_confidence_alerts(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.transforms import (
            confidence_alerts,
        )

        df = spark.createDataFrame(
            [
                (1, [{"name": "a", "conf": 95.0}, {"name": "b", "conf": 40.0}]),
                (2, [{"name": "c", "conf": 70.0}]),
            ],
            "id int, items array<struct<name:string, conf:double>>",
        )
        out = confidence_alerts(df, ["id"], "items", default_threshold=60.0).collect()
        assert len(out) == 1
        assert out[0].id == 1 and out[0].item_idx == 1 and out[0].conf == 40.0
