"""spark-submit entrypoint for the extraction pipeline (north_rule: the
job runs via ``spark-submit --py-files`` on a multi-executor cluster).

Package the library and submit:

    cd /root/repo && zip -qr /tmp/idp_spark.zip \
        accelerated_intelligent_document_processing_on_aws_spark
    spark-submit --master local[32] --py-files /tmp/idp_spark.zip \
        scripts/run_pipeline.py \
        --input  /data/transcripts \
        --output /data/extracted \
        --checkpoint /data/checkpoints/extraction \
        --buckets 64

On a cluster, swap ``--master`` for YARN/K8s; the script only uses the
session handed to it by spark-submit (it never hard-codes a master), so
executor/parallelism config is entirely submit-side.  Re-submitting after
a failure resumes from the lineage table (committed buckets are skipped).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser(description="transcript extraction pipeline")
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--output", required=True, help="extracted table dir")
    ap.add_argument("--checkpoint", required=True, help="lineage table dir")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt", default="idp")
    ap.add_argument("--no-sections", action="store_true")
    ap.add_argument("--turn-spread", type=int, default=16)
    ap.add_argument(
        "--section-chunk-size",
        type=int,
        default=None,
        help="two-phase chunked sectionization (mega-conversation defense): "
        "windows run per (conv, turn_idx div SIZE) instead of per conv",
    )
    ap.add_argument(
        "--format",
        default="parquet",
        choices=("parquet", "jsonl", "csv"),
        help="input feed format; jsonl/csv parse with corrupt-record routing",
    )
    ap.add_argument(
        "--dead-letter",
        default=None,
        help="parquet dir for malformed jsonl/csv records (replayable DLQ)",
    )
    ap.add_argument(
        "--incremental",
        action="store_true",
        help="append-only delta mode: process only input files not covered "
        "by a previous fully-committed run; deltas land under "
        "output/ingest=<snapshot>/ and history is never re-extracted",
    )
    args = ap.parse_args()

    # the session comes from spark-submit conf; enable the plan-shaping
    # options the engine relies on without overriding submit-side choices
    spark = (
        SparkSession.builder.appName("idp-extraction")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from accelerated_intelligent_document_processing_on_aws_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    cfg = PipelineConfig(
        n_buckets=args.buckets,
        salt=args.salt,
        with_sections=not args.no_sections,
        turn_spread=args.turn_spread,
        section_chunk_size=args.section_chunk_size,
    )
    summary = run_pipeline(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        cfg,
        input_format=args.format,
        dead_letter_path=args.dead_letter,
        incremental=args.incremental,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
