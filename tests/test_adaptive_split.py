"""Skew-aware adaptive write sub-splitting (PipelineConfig.adaptive_write_split).

A hot bucket (one mega-conversation holding most of the table) must fan
out across more write tasks than a cold one, while cold buckets keep the
one-file-per-bucket layout.  Output must be identical to the flat path,
and resume must still key on pt alone.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    run_pipeline,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    write_transcripts,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def skewed_input(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("adaptive")
    inp = str(root / "transcripts")
    # one conversation carries ~80% of all turns
    write_transcripts(
        spark, inp, n_convs=12, mean_turns=120, skew_convs=1, skew_factor=60
    )
    return str(root), inp


def _files_per_bucket(outp: str) -> dict:
    out = {}
    for d in glob.glob(os.path.join(outp, "pt=*")):
        pt = int(d.rsplit("=", 1)[1])
        out[pt] = len(glob.glob(os.path.join(d, "*.parquet")))
    return out


def test_adaptive_split_fans_out_hot_bucket_only(spark, skewed_input):
    root, inp = skewed_input
    flat_out, flat_ck = f"{root}/flat_out", f"{root}/flat_ck"
    ad_out, ad_ck = f"{root}/ad_out", f"{root}/ad_ck"

    run_pipeline(
        spark, inp, flat_out, flat_ck, PipelineConfig(n_buckets=N_BUCKETS)
    )
    run_pipeline(
        spark,
        inp,
        ad_out,
        ad_ck,
        PipelineConfig(
            n_buckets=N_BUCKETS, adaptive_write_split=True, files_per_bucket=2
        ),
    )

    # identical rows either way
    cols = ["conv_id", "turn_idx", "extracted_text", "section_id", "pt"]
    flat = spark.read.parquet(flat_out).select(cols)
    adap = spark.read.parquet(ad_out).select(cols)
    assert flat.exceptAll(adap).isEmpty() and adap.exceptAll(flat).isEmpty()

    # the hot bucket fans out; cold buckets stay at one file
    counts = {
        r["pt"]: r["c"]
        for r in spark.read.parquet(ad_out)
        .groupBy("pt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    hot_pt = max(counts, key=counts.get)
    files = _files_per_bucket(ad_out)
    total = sum(counts.values())
    assert counts[hot_pt] / total > 0.5  # the fixture really is skewed
    assert files[hot_pt] > 2, files  # hot bucket exceeds files_per_bucket
    for pt, n in files.items():
        if pt != hot_pt:
            assert n <= 2, (pt, n)  # cold buckets never exceed the base


def test_adaptive_split_resume_still_keys_on_pt(spark, skewed_input):
    root, inp = skewed_input
    outp, ckpt = f"{root}/res_out", f"{root}/res_ck"
    cfg = PipelineConfig(
        n_buckets=N_BUCKETS, adaptive_write_split=True, files_per_bucket=2
    )
    r1 = run_pipeline(spark, inp, outp, ckpt, cfg)
    assert r1["partitions_committed"] == N_BUCKETS
    r2 = run_pipeline(spark, inp, outp, ckpt, cfg)
    assert r2["resumed"] is True and r2["partitions_written"] == 0


def test_adaptive_split_rejects_bucketed_table(spark, skewed_input):
    root, inp = skewed_input
    with pytest.raises(ValueError, match="adaptive_write_split"):
        run_pipeline(
            spark,
            inp,
            f"{root}/x_out",
            f"{root}/x_ck",
            PipelineConfig(
                n_buckets=N_BUCKETS,
                adaptive_write_split=True,
                bucketed_table="idp_bucketed_conflict",
            ),
        )
