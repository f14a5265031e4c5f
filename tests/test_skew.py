"""Long-conversation skew (north_rule): a mega-conversation must not
serialize the per-turn extraction stage through one task."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    extract_stage,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)


def test_mega_conv_spreads_across_tasks(spark):
    # one conversation holds ~85% of all turns
    df = gen_transcripts_df(
        spark, n_convs=20, mean_turns=5, skew_convs=1, skew_factor=120
    )
    counts = {r.conv_id: r.c for r in df.groupBy("conv_id").agg(F.count("*").alias("c")).collect()}
    mega_conv, mega_turns = max(counts.items(), key=lambda kv: kv[1])
    assert mega_turns > 0.5 * sum(counts.values())

    staged = extract_stage(df, PipelineConfig(n_buckets=16, with_sections=False))
    pid = staged.withColumn("pid", F.spark_partition_id())
    per_task = (
        pid.filter(F.col("conv_id") == mega_conv)
        .groupBy("pid")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    # the mega conversation's turns occupy many tasks, none holding them all
    assert len(per_task) >= 8
    assert max(r.c for r in per_task) < mega_turns * 0.5


def test_spread_does_not_change_results(spark):
    df = gen_transcripts_df(spark, n_convs=15, mean_turns=6, skew_convs=1, skew_factor=30)
    a = (
        extract_stage(df, PipelineConfig(turn_spread=1))
        .select("conv_id", "turn_idx", "extracted_text", "section_id")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    b = (
        extract_stage(df, PipelineConfig(turn_spread=32))
        .select("conv_id", "turn_idx", "extracted_text", "section_id")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b


def test_chunked_sectionize_pipeline_equivalence(spark):
    """PipelineConfig(section_chunk_size=...) must produce byte-identical
    results to the plain conv window — the mega-conversation defense
    changes the PLAN (windows keyed per (conv, chunk)), never the output."""
    df = gen_transcripts_df(
        spark, n_convs=12, mean_turns=8, skew_convs=1, skew_factor=40
    )
    cols = ["conv_id", "turn_idx", "extracted_text", "turn_class", "section_id"]
    plain = (
        extract_stage(df, PipelineConfig())
        .select(cols).orderBy("conv_id", "turn_idx").collect()
    )
    chunked = (
        extract_stage(df, PipelineConfig(section_chunk_size=7))
        .select(cols).orderBy("conv_id", "turn_idx").collect()
    )
    assert plain == chunked
