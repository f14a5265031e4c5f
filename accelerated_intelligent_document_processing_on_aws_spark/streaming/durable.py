"""Durable streaming sink: the batch pipeline's partitioned-write +
lineage-commit path driven per micro-batch through ``foreachBatch``.

``micro_batch.run_stream_extraction`` proves the transformation parity
(stream and batch produce identical rows); this module closes the other
half of the north rule on the streaming path — every micro-batch lands as
its own ``ingest=stream-<batch_id>/pt=...`` partition tree (the
incremental pipeline's delta layout) with one lineage row per written
bucket, so a killed stream resumes from Spark's streaming checkpoint
WITHOUT rewriting or double-counting prior batches:

* Spark's streaming checkpoint replays an uncommitted batch with the SAME
  ``batch_id`` → the dynamic partition overwrite of
  ``ingest=stream-<id>`` makes the replay byte-idempotent;
* lineage appends may then duplicate rows for the replayed batch —
  harmless by design (``committed_partitions`` reads DISTINCT bucket ids,
  the same guarantee the batch pipeline's re-run path relies on);
* downstream consumers read the whole output dir (a union of immutable
  ingest partitions) or time-travel per batch via the partition value.

Scale shape: each micro-batch runs the identical plan the batch pipeline
runs on a delta — per-turn Arrow extraction before any shuffle, a salted
``pt`` fan-in for the write, one metadata-sized lineage aggregate off the
persisted write frame (``lineage_agg_rows``) — so throughput matches the
batch path at equal input size; the stream adds only Spark's offset
tracking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import pandas as pd
from pyspark.sql import SparkSession

from ..io.checkpoint import (
    CHECKPOINT_SCHEMA,
    CheckpointStore,
    lineage_agg_rows,
)
from ..io.tables import write_partitioned
from ..pipeline import PipelineConfig, extract_stage
from .micro_batch import read_transcripts_stream


def run_stream_durable(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    lineage_path: str,
    stream_checkpoint: str,
    cfg: PipelineConfig = PipelineConfig(),
    max_files_per_trigger: int = 4,
    timeout_sec: int = 600,
) -> dict:
    """Drain available input (``availableNow``), committing each
    micro-batch through the durable path.  Returns
    ``{"batches": n, "rows": total}`` for the batches THIS call ran
    (a fully-caught-up stream runs zero).

    Sectionization is disabled per batch (a conversation may span
    batches — conv-level windows belong to the batch compactor), same as
    ``run_stream_extraction``."""
    store = CheckpointStore(spark, lineage_path)
    per_batch_cfg = dataclasses.replace(cfg, with_sections=False)
    ran = {"batches": 0, "rows": 0}

    def _commit(batch_df, batch_id: int) -> None:
        from pyspark import StorageLevel

        snap = f"stream-{batch_id:08d}"
        out = extract_stage(batch_df, per_batch_cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            candidates = sorted(
                r.pt for r in out.select("pt").distinct().collect()
            )
            write_partitioned(out, f"{output_dir}/ingest={snap}", "pt")
            if candidates:
                rows = lineage_agg_rows(
                    out, candidates, f"stream-run-{batch_id}", snap
                )
                store.append(
                    spark.createDataFrame(
                        pd.DataFrame(rows), CHECKPOINT_SCHEMA
                    )
                )
                ran["rows"] += sum(r["row_count"] for r in rows)
            ran["batches"] += 1
        finally:
            out.unpersist()

    stream = read_transcripts_stream(spark, input_dir, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return ran


def stream_output(spark: SparkSession, output_dir: str):
    """Read the durable stream's full output (union of all ingest
    partitions) with the ingest id as a column."""
    return spark.read.option("basePath", output_dir).parquet(
        f"{output_dir}/ingest=*"
    )
