"""Structured Streaming micro-batch ingestion == batch extraction.

The stream (file source, availableNow, maxFilesPerTrigger throttle — the
reference's SQS/counter-semaphore analog, SURVEY.md §1.4) must produce
exactly the rows the batch stage produces for the same input."""

from __future__ import annotations

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    extract_stage,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.micro_batch import (
    run_stream_extraction,
)


def test_stream_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = gen_transcripts_df(spark, n_convs=15, mean_turns=5)
    # several input files so maxFilesPerTrigger actually batches
    df.repartition(6).write.parquet(inp)

    run_stream_extraction(
        spark, inp, outp, ckpt, max_files_per_trigger=2, timeout_sec=300
    )

    streamed = spark.read.parquet(outp)
    batch = extract_stage(
        spark.read.parquet(inp), PipelineConfig(with_sections=False)
    )
    key = lambda r: (r.conv_id, r.turn_idx)  # noqa: E731
    cols = ["conv_id", "turn_idx", "extracted_text", "turn_class", "pt"]
    got = sorted(streamed.select(cols).collect(), key=key)
    want = sorted(batch.select(cols).collect(), key=key)
    assert got == want
    assert len(got) > 0


def test_stream_is_incremental(spark, tmp_path):
    """A second availableNow run after new files arrive processes ONLY the
    new files (checkpoint tracks consumed input — the resume analog)."""
    inp = str(tmp_path / "in2")
    outp = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    d1 = gen_transcripts_df(spark, n_convs=6, mean_turns=4, seed=1)
    d1.coalesce(1).write.parquet(inp)
    run_stream_extraction(spark, inp, outp, ckpt, timeout_sec=300)
    n1 = spark.read.parquet(outp).count()
    assert n1 == d1.count()

    d2 = gen_transcripts_df(spark, n_convs=4, mean_turns=4, seed=2)
    d2.coalesce(1).write.mode("append").parquet(inp)
    run_stream_extraction(spark, inp, outp, ckpt, timeout_sec=300)
    n2 = spark.read.parquet(outp).count()
    assert n2 == n1 + d2.count()
