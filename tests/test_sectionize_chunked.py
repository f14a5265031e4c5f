"""Chunked (two-phase) sectionization must equal the single-window
implementation exactly — including across chunk boundaries where a run
continues (glue) or a boundary tag starts a new section."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
    sectionize,
    sectionize_chunked,
)


def _cmp(spark, df, chunk_size):
    cols = ["conv_id", "turn_idx", "section_id"]
    a = sectionize(df).select(cols).orderBy(cols[:2]).collect()
    b = sectionize_chunked(df, chunk_size).select(cols).orderBy(cols[:2]).collect()
    assert a == b


def _hand_rows(spark, rows):
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "turn_class", "is_boundary"]
    )


def test_glue_across_chunk_boundary(spark):
    # same class spanning the chunk split → one section
    rows = [("c", i, "chat", False) for i in range(10)]
    _cmp(spark, _hand_rows(spark, rows), chunk_size=4)


def test_class_change_at_chunk_boundary(spark):
    rows = [("c", i, "chat" if i < 4 else "report", False) for i in range(8)]
    _cmp(spark, _hand_rows(spark, rows), chunk_size=4)


def test_boundary_tag_first_turn_of_chunk(spark):
    rows = [("c", i, "chat", i == 4) for i in range(8)]
    _cmp(spark, _hand_rows(spark, rows), chunk_size=4)


def test_alternating_classes_every_turn(spark):
    rows = [("c", i, "a" if i % 2 else "b", False) for i in range(13)]
    _cmp(spark, _hand_rows(spark, rows), chunk_size=5)


def test_multi_conv_mixed(spark):
    rows = []
    for conv, k in (("c1", 17), ("c2", 3), ("c3", 29)):
        for i in range(k):
            rows.append((conv, i, ["x", "x", "y"][i % 3], i % 7 == 5))
    _cmp(spark, _hand_rows(spark, rows), chunk_size=6)


@pytest.mark.parametrize("chunk_size", [3, 10, 1000])
def test_generated_corpus_equivalence(spark, chunk_size):
    df = gen_transcripts_df(
        spark, n_convs=12, mean_turns=10, skew_convs=2, skew_factor=15
    )
    staged = extract_stage(df).drop("section_id")
    _cmp(spark, staged, chunk_size)
