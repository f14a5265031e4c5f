"""applyInPandasWithState sectionization: state persists across
micro-batches (and across availableNow restarts via the checkpoint), and
section ids equal the batch gaps-and-islands result."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    transcripts_spark_schema,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
    sectionize,
)
from accelerated_intelligent_document_processing_on_aws_spark.streaming.stateful import (
    stream_sectionize,
)

IN_SCHEMA = "conv_id string, turn_idx int, turn_class string, is_boundary boolean"


def _run_stream(spark, inp, outp, ckpt):
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        stream_sectionize(stream)
        .writeStream.format("parquet")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_state_spans_micro_batches_and_restarts(spark, tmp_path):
    inp, outp, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    rows1 = [("c1", 0, "chat", False), ("c1", 1, "chat", False), ("c2", 0, "rep", False)]
    rows2 = [("c1", 2, "report", False), ("c1", 3, "report", False), ("c2", 1, "rep", True)]
    rows3 = [("c1", 4, "chat", False), ("c2", 2, "rep", False)]

    spark.createDataFrame(rows1, IN_SCHEMA).coalesce(1).write.parquet(inp)
    spark.createDataFrame(rows2, IN_SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    _run_stream(spark, inp, outp, ckpt)  # 2 files -> 2 micro-batches

    # restart with a new file: state must survive via the checkpoint
    spark.createDataFrame(rows3, IN_SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    _run_stream(spark, inp, outp, ckpt)

    got = {
        (r.conv_id, r.turn_idx): r.section_id
        for r in spark.read.parquet(outp).collect()
    }
    all_rows = rows1 + rows2 + rows3
    batch = sectionize(spark.createDataFrame(all_rows, IN_SCHEMA))
    want = {
        (r.conv_id, r.turn_idx): r.section_id for r in batch.collect()
    }
    assert got == want
    assert len(got) == len(all_rows)


def test_out_of_order_flagged(spark, tmp_path):
    inp, outp, ckpt = str(tmp_path / "in2"), str(tmp_path / "out2"), str(tmp_path / "ck2")
    # turn 2 arrives before turn 1
    rows = [("c", 0, "chat", False), ("c", 2, "chat", False)]
    spark.createDataFrame(rows, IN_SCHEMA).coalesce(1).write.parquet(inp)
    _run_stream(spark, inp, outp, ckpt)
    got = {r.turn_idx: r.section_id for r in spark.read.parquet(outp).collect()}
    assert got[0] == 0
    assert got[2] == -1  # deferred to the batch compactor
