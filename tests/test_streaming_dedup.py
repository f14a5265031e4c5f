"""Streaming dedup (dropDuplicatesWithinWatermark): re-delivered turns and
byte-identical payloads are admitted once, state survives across
availableNow drains via the checkpoint, and the streamed content dedup
agrees with the batch ``dedup_corpus`` row count on the same input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    transcripts_spark_schema,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
    dedup_corpus,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.dedup_stream import (
    dedup_content_stream,
    dedup_turns_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, specs):
    # spec: (conv_id, turn_idx, role, text, seconds_after_T0)
    rows = [
        (c, i, r, t, None, T0 + dt.timedelta(seconds=s)) for c, i, r, t, s in specs
    ]
    df = spark.createDataFrame(rows, schema=transcripts_spark_schema())
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, inp, outp, ckpt, dedup):
    stream = (
        spark.readStream.schema(transcripts_spark_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        dedup(stream)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_turn_redelivery_dropped_across_drains(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(spark, inp, [("c1", 0, "user", "hello", 0), ("c1", 1, "agent", "hi", 5)])
    _drain(spark, inp, outp, ckpt, dedup_turns_stream)
    # second delivery: duplicate of (c1, 0) within the watermark horizon
    # plus one genuinely new turn
    _write(spark, inp, [("c1", 0, "user", "hello", 0), ("c1", 2, "user", "bye", 10)])
    _drain(spark, inp, outp, ckpt, dedup_turns_stream)

    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(outp).select("conv_id", "turn_idx").collect()
    )
    assert got == [("c1", 0), ("c1", 1), ("c1", 2)]


def test_content_dedup_matches_batch_corpus(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    specs = [
        ("c1", 0, "user", "same payload", 0),
        ("c2", 0, "user", "same payload", 3),  # dup under a different conv
        ("c3", 0, "user", "SAME   payload", 6),  # dup after normalization
        ("c4", 0, "user", "different payload", 9),
    ]
    _write(spark, inp, specs)
    _drain(spark, inp, outp, ckpt, dedup_content_stream)

    streamed = spark.read.parquet(outp)
    batch = dedup_corpus(
        spark.read.parquet(inp).withColumn("doc_id", F.col("conv_id")),
        "doc_id",
        "text",
    )
    assert streamed.count() == batch.count() == 2
    # the admitted payloads cover both distinct normalized fingerprints
    texts = {r.text for r in streamed.collect()}
    assert "different payload" in texts
