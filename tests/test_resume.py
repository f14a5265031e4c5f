"""Resume / lineage semantics (north_rule: a killed run resumes from the
last committed snapshot without recomputing committed partitions).

Reference analog: the classification retry cache
(``classification/service.py:1455-1603``) — cached pages are skipped on
retry; we generalize to per-partition lineage + anti-join (SURVEY.md J4).

Kill simulation: run the pipeline to completion once (golden), then
reconstruct the on-disk state of a run killed mid-write — output dir with
some partition dirs missing, checkpoint containing lineage only for the
committed ones — and re-run.  Assertions:

* only the missing partitions are recomputed/written,
* committed partition files are byte-untouched (mtime + size),
* the resumed table equals the golden full run exactly.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    run_pipeline,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    write_transcripts,
)

CFG = PipelineConfig(n_buckets=8)


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    inp = str(root / "transcripts")
    write_transcripts(spark, inp, n_convs=30, mean_turns=6, skew_convs=1, skew_factor=10)
    return root, inp


def _snapshot_files(out_dir: str) -> dict[str, tuple[int, float]]:
    state = {}
    for r, _d, files in os.walk(out_dir):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            fp = os.path.join(r, f)
            st = os.stat(fp)
            state[os.path.relpath(fp, out_dir)] = (st.st_size, st.st_mtime)
    return state


def _rows(spark, path):
    return sorted(
        spark.read.parquet(path)
        .select("conv_id", "turn_idx", "extracted_text", "section_id")
        .collect()
    )


def test_full_then_noop_rerun(spark, paths):
    root, inp = paths
    out, cp = str(root / "out1"), str(root / "cp1")

    r1 = run_pipeline(spark, inp, out, cp, CFG)
    assert r1["partitions_written"] > 0 and not r1["resumed"]

    before = _snapshot_files(out)
    r2 = run_pipeline(spark, inp, out, cp, CFG)
    assert r2["partitions_written"] == 0 and r2["resumed"]
    assert _snapshot_files(out) == before, "no-op rerun must not rewrite anything"


def test_resume_after_kill(spark, paths):
    root, inp = paths
    golden_out, golden_cp = str(root / "gold_out"), str(root / "gold_cp")
    run_pipeline(spark, inp, golden_out, golden_cp, CFG)
    golden = _rows(spark, golden_out)
    all_pts = sorted(
        int(d.split("=")[1])
        for d in os.listdir(golden_out)
        if d.startswith("pt=")
    )
    assert len(all_pts) >= 4

    # ---- reconstruct killed-run state: 3 buckets never committed
    lost = set(all_pts[:3])
    out, cp = str(root / "out2"), str(root / "cp2")
    shutil.copytree(golden_out, out)
    for pt in lost:
        shutil.rmtree(os.path.join(out, f"pt={pt}"))
    cpdf = spark.read.parquet(golden_cp).filter(
        ~F.col("partition_id").isin([int(p) for p in lost])
    )
    cpdf.write.mode("overwrite").parquet(cp)

    committed_before = {
        k: v for k, v in _snapshot_files(out).items() if k.startswith("pt=")
    }

    r = run_pipeline(spark, inp, out, cp, CFG)
    assert r["resumed"] is True
    assert r["partitions_written"] == len(lost)

    after = _snapshot_files(out)
    for k, v in committed_before.items():
        assert after[k] == v, f"committed partition file {k} was rewritten"

    assert _rows(spark, out) == golden

    # lineage now covers every bucket for this snapshot
    cp_rows = (
        spark.read.parquet(cp)
        .filter(F.col("status") == "COMMITTED")
        .select("partition_id")
        .distinct()
        .collect()
    )
    assert sorted(x.partition_id for x in cp_rows) == all_pts
