"""Post-extraction hook plug-in point (SURVEY §2.8: the reference's
post-processing Lambda hook, extraction/service.py:643-711, as a
DataFrame→DataFrame stage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    extract_stage,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)


def _redact(df):
    return df.withColumn(
        "extracted_text", F.regexp_replace("extracted_text", r"[0-9]", "#")
    ).withColumn("hooked", F.lit(True))


def test_post_extract_hook_applies(spark):
    turns = gen_transcripts_df(spark, n_convs=6, mean_turns=4)
    out = extract_stage(turns, PipelineConfig(post_extract_hook=_redact))
    rows = out.select("extracted_text", "hooked").collect()
    assert rows and all(r.hooked for r in rows)
    assert not any(any(ch.isdigit() for ch in (r.extracted_text or "")) for r in rows)


def test_hook_keeps_exchange_budget(spark):
    """A narrow hook must not add a shuffle: the two-exchange plan budget
    holds with the hook installed."""
    from tests.test_plans import n_ops, plan_of

    turns = gen_transcripts_df(spark, n_convs=6, mean_turns=4)
    p = plan_of(extract_stage(turns, PipelineConfig(post_extract_hook=_redact)))
    assert n_ops(p, "Exchange") == 2
