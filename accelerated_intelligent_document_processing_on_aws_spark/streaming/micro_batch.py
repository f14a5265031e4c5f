"""Structured Streaming ingestion — the Spark analog of the reference's
event-driven micro-batch front door.

Reference behavior (SURVEY.md §1.4): S3 event → EventBridge → SQS →
``queue_processor`` polls and throttles via a DynamoDB counter semaphore
(``src/lambda/queue_processor/index.py:27-65``, cap 100 from
``template.yaml:292-296``).  There is no true streaming — arrival-driven
batches with an admission cap.

Spark mapping: a file-source ``readStream`` over the transcripts directory;
``maxFilesPerTrigger`` plays the SQS/counter throttle; an
``availableNow`` trigger drains the backlog exactly once and stops (the
batch-catchup mode); the sink checkpoint directory replaces the DynamoDB
tracking table (exactly-once per input file).  The per-batch transformation
is the SAME ``extract_stage`` used by the batch pipeline, so stream and
batch runs produce identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..datagen.transcripts import transcripts_spark_schema
from ..pipeline import PipelineConfig, extract_stage


def read_transcripts_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of transcript turns (schema per input_hint)."""
    return (
        spark.readStream.schema(transcripts_spark_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def run_stream_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    max_files_per_trigger: int = 4,
    timeout_sec: int = 600,
) -> None:
    """Drain all currently-available input through the extraction stage and
    stop (``availableNow`` — the reference's queue-drain semantics).

    Sectionization is disabled per micro-batch: a conversation may span
    batches, so conv-level windows belong to the batch compactor
    (run_pipeline) — per-turn extraction + classification are
    batch-invariant and safe here.
    """
    import dataclasses

    stream = read_transcripts_stream(spark, input_dir, max_files_per_trigger)
    # carry EVERY caller-supplied config field (turn_spread included) —
    # only sectionization is overridden for the per-batch stage
    per_batch_cfg = dataclasses.replace(cfg, with_sections=False)
    out = extract_stage(stream, per_batch_cfg)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
