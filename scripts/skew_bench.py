"""Skew-stress benchmark: does a mega-conversation degrade the pipeline?

north_rule evidence: "extracted spans are written back as Iceberg
partitions keyed by a salted hash of conv_id to defuse long-conversation
skew".  This script measures that claim directly: two inputs with the
SAME total turn count — one balanced, one with ~75% of all turns in a
single conversation — run through the full durable pipeline
(extract + sectionize + partitioned write + lineage + commit) at
local[32].  If the salted spread works, turns/sec is ~equal on both;
without it the mega-conv would serialize onto one task.

The skewed input is also run with ``section_chunk_size`` (the two-phase
chunked sectionizer, the 10^8-turn-conversation defense) for the third
data point.

Usage: python scripts/skew_bench.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accelerated_intelligent_document_processing_on_aws_spark import (  # noqa: E402
    PipelineConfig,
    get_spark,
    run_pipeline,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (  # noqa: E402
    write_transcripts,
)

# ~318k turns each.  balanced: every conv ~2k turns.  skewed: conv-000000
# carries ~240k turns (~75% of the table), the rest ~2k each.
BALANCED = dict(n_convs=159, mean_turns=2000, skew_convs=0, skew_factor=1)
SKEWED = dict(n_convs=40, mean_turns=2000, skew_convs=1, skew_factor=120)


def _run(spark, inp: str, scratch: str, tag: str, **cfg_kw) -> dict:
    n = spark.read.parquet(inp).count()
    best = float("inf")
    for i in range(2):
        outp = f"{scratch}/out_{tag}_{i}"
        ckpt = f"{scratch}/ckpt_{tag}_{i}"
        t0 = time.time()
        run_pipeline(
            spark, inp, outp, ckpt, PipelineConfig(files_per_bucket=4, **cfg_kw)
        )
        best = min(best, time.time() - t0)
    return {"turns": n, "sec": round(best, 3), "tps": round(n / best, 1)}


def main() -> None:
    scratch = tempfile.mkdtemp(prefix="skew_bench_")
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bal, skw = f"{scratch}/balanced", f"{scratch}/skewed"
        write_transcripts(spark, bal, **BALANCED)
        write_transcripts(spark, skw, **SKEWED)
        r_bal = _run(spark, bal, scratch, "bal")
        r_skw = _run(spark, skw, scratch, "skw")
        r_chk = _run(spark, skw, scratch, "chk", section_chunk_size=10_000)
        r_ad = _run(
            spark,
            skw,
            scratch,
            "ad",
            section_chunk_size=10_000,
            adaptive_write_split=True,
        )
        out = {
            "balanced": r_bal,
            "skewed_75pct_one_conv": r_skw,
            "skewed_chunked_sectionize": r_chk,
            "skewed_chunked_adaptive_split": r_ad,
            "skew_tps_ratio": round(r_skw["tps"] / r_bal["tps"], 3),
            "skew_tps_ratio_defended": round(r_ad["tps"] / r_bal["tps"], 3),
        }
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
