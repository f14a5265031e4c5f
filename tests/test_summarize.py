"""G8 two-level summarization: deterministic extractive stub + TOC fan-in."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.summarize import (
    document_summary,
    extractive_summary,
    section_summaries,
)


def test_extractive_summary_word_boundary(spark):
    df = spark.createDataFrame(
        [("alpha beta gamma delta",), ("short",)], ["t"]
    )
    got = [
        r.s for r in df.select(extractive_summary(F.col("t"), 12).alias("s")).collect()
    ]
    assert got == ["alpha beta", "short"]


def test_document_summary_toc(spark):
    rows = [
        ("c1", 0, "report", "t0\nt1", 2),
        ("c1", 1, "chat", "t2", 1),
        ("c2", 0, "chat", "x", 1),
    ]
    turns = []
    for conv, sec, cls, text, _n in rows:
        for i, t in enumerate(text.split("\n")):
            turns.append((conv, sec * 10 + i, cls, t, sec))
    tdf = spark.createDataFrame(
        turns, ["conv_id", "turn_idx", "turn_class", "extracted_text", "section_id"]
    )
    summ = section_summaries(tdf)
    doc = {r.conv_id: r for r in document_summary(summ).collect()}
    assert doc["c1"].n_sections == 2
    md = doc["c1"].summary_md
    assert md.startswith("# Contents\n1. report\n2. chat\n")
    assert "## 1. report\nt0\nt1" in md
    assert "## 2. chat\nt2" in md
    assert doc["c2"].n_sections == 1


def test_summary_order_stable(spark):
    """Fan-in must be ordered by section_id regardless of row order."""
    rows = [
        ("c", 30, "c3", "third", 2),
        ("c", 10, "c1", "first", 0),
        ("c", 20, "c2", "second", 1),
    ]
    tdf = spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "turn_class", "extracted_text", "section_id"]
    ).repartition(3)
    md = document_summary(section_summaries(tdf)).collect()[0].summary_md
    assert md.index("1. c1") < md.index("2. c2") < md.index("3. c3")
