"""Reporting sink (S7 date-partitioned layout) + assessment/HITL flagging."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)
from accelerated_intelligent_document_processing_on_aws_spark.io.reporting import (
    metering_reporting,
    save_metering,
    save_sections,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.assess import (
    assess,
    review_queue,
)


def test_sections_layout_and_roundtrip(spark, tmp_path):
    out = extract_stage(gen_transcripts_df(spark, n_convs=10, mean_turns=6))
    path = str(tmp_path / "sections")
    save_sections(out, path)
    # Hive layout: classification=<type>/date=<yyyy-mm-dd>/
    classes = [d for d in os.listdir(path) if d.startswith("classification=")]
    assert classes
    dates = os.listdir(os.path.join(path, classes[0]))
    assert all(d.startswith("date=") or d.startswith(("_", ".")) for d in dates)
    back = spark.read.parquet(path)
    n_sections = out.select("conv_id", "section_id").distinct().count()
    assert back.count() == n_sections
    assert {"classification", "date", "section_text", "turn_idxs"} <= set(back.columns)


def test_metering_counts(spark, tmp_path):
    out = extract_stage(gen_transcripts_df(spark, n_convs=8, mean_turns=5))
    m = metering_reporting(out)
    rows = m.collect()
    assert sum(r.n_turns for r in rows) >= out.count()  # explode >= 1 kind/turn
    path = str(tmp_path / "metering")
    save_metering(out, path)
    assert spark.read.parquet(path).count() == len(rows)


def test_assess_flags_low_confidence(spark):
    out = extract_stage(gen_transcripts_df(spark, n_convs=15, mean_turns=6))
    a = assess(out)
    rows = a.select("confidence", "coverage", "span_trust", "needs_review").collect()
    assert all(0.0 <= r.confidence <= 1.0 for r in rows)
    assert all(r.needs_review == (r.confidence < 0.70) for r in rows)
    # both flagged and unflagged turns exist in a mixed corpus
    flags = {r.needs_review for r in rows}
    assert flags == {True, False}


def test_review_queue_orders_doubtful_first(spark):
    out = extract_stage(gen_transcripts_df(spark, n_convs=15, mean_turns=6))
    q = review_queue(assess(out)).collect()
    assert q == sorted(q, key=lambda r: (r.confidence, r.conv_id, r.turn_idx))
    assert all(r.confidence < 0.70 for r in q)


def test_save_evaluation_and_report_md(spark, tmp_path):
    from accelerated_intelligent_document_processing_on_aws_spark.io.reporting import (
        evaluation_report_md,
        save_evaluation,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_attributes,
    )

    rows = [
        ("c1", "name", "ACME Corp.", "acme corp"),
        ("c1", "total", "$1,500.00", "1500"),
        ("c1", "notes", "hello world", "goodbye moon"),
        ("c2", "name", "A", "A"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "attr", "expected", "actual"])
    ev = evaluate_attributes(
        df, {"name": "EXACT", "total": "NUMERIC_EXACT", "notes": "FUZZY"}
    )
    path = str(tmp_path / "eval")
    save_evaluation(ev, path)
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert {"attr", "method", "matched", "score"} <= set(back.columns)
    # Hive layout partitioned by attribute
    import os

    assert any(p.startswith("attr=") for p in os.listdir(path))

    md = {r.conv_id: r for r in evaluation_report_md(ev).collect()}
    assert md["c1"].n_attrs == 3 and md["c1"].n_matched == 2
    assert "| name | EXACT | MATCH |" in md["c1"].report_md
    assert "| notes | FUZZY | MISS |" in md["c1"].report_md
    assert "**2/3 matched (66.7%)**" in md["c1"].report_md
    assert "**1/1 matched (100.0%)**" in md["c2"].report_md


def test_table_ddl_matches_schema(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.io.reporting import (
        sections_reporting,
        table_ddl,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
        sectionize,
    )

    turns = extract_stage(gen_transcripts_df(spark, n_convs=5, mean_turns=4))
    df = sections_reporting(turns)
    ddl = table_ddl(df, "doc_sections", ["classification", "date"])
    assert ddl.startswith("CREATE EXTERNAL TABLE IF NOT EXISTS `doc_sections`")
    assert "`conv_id` STRING" in ddl
    assert "`n_turns` BIGINT" in ddl
    assert "PARTITIONED BY" in ddl and "`date` STRING" in ddl
    # partition cols must not appear in the main column list
    main = ddl.split("PARTITIONED BY")[0]
    assert "`classification`" not in main and "`date`" not in main
    assert ddl.endswith("STORED AS PARQUET")


def test_evaluate_document_attributes_full_outer(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_document_attributes,
    )

    golden = spark.createDataFrame(
        [("c1", "name", "ACME"), ("c1", "total", "$5"), ("c1", "extra", "x")],
        ["conv_id", "attr", "value"],
    )
    actual = spark.createDataFrame(
        [("c1", "name", "acme"), ("c1", "total", "5.0"), ("c1", "spurious", "y")],
        ["conv_id", "attr", "value"],
    )
    out = {
        r.attr: r.matched
        for r in evaluate_document_attributes(
            actual, golden, {"name": "EXACT", "total": "NUMERIC_EXACT"}
        ).collect()
    }
    assert out["name"] is True and out["total"] is True
    # golden-only attr (fn) and actual-only attr (fp) both present, unmatched
    assert out["extra"] is False and out["spurious"] is False
