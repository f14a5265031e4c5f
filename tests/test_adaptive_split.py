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


def test_adaptive_split_composes_with_bucketed_table(spark, skewed_input):
    """Round-4 VERDICT #6: the skew defense must survive on the bucketed
    publish path.  A hot (pt, conv-bucket) slice sub-splits into multiple
    files of the SAME bucket id (legal in a Spark bucketed table), rows
    are identical to the non-adaptive bucketed run, and the table's
    bucket spec is intact."""
    root, inp = skewed_input
    tbl_flat, tbl_ad = "idp_bkt_flat", "idp_bkt_adaptive"
    try:
        r_flat = run_pipeline(
            spark,
            inp,
            f"{root}/bf_out",
            f"{root}/bf_ck",
            PipelineConfig(
                n_buckets=N_BUCKETS, bucketed_table=tbl_flat, conv_buckets=4
            ),
        )
        r_ad = run_pipeline(
            spark,
            inp,
            f"{root}/ba_out",
            f"{root}/ba_ck",
            PipelineConfig(
                n_buckets=N_BUCKETS,
                bucketed_table=tbl_ad,
                conv_buckets=4,
                adaptive_write_split=True,
                files_per_bucket=2,
            ),
        )
        assert r_flat["partitions_committed"] == N_BUCKETS
        assert r_ad["partitions_committed"] == N_BUCKETS

        cols = ["conv_id", "turn_idx", "extracted_text", "section_id", "pt"]
        flat = spark.table(tbl_flat).select(cols)
        adap = spark.table(tbl_ad).select(cols)
        assert flat.exceptAll(adap).isEmpty() and adap.exceptAll(flat).isEmpty()

        # the adaptive table's hot pt holds MORE files than conv_buckets
        # (hot slices sub-split), and every file name still carries a
        # bucket id within the table spec
        loc = [
            r.data_type
            for r in spark.sql(f"DESCRIBE FORMATTED {tbl_ad}").collect()
            if r.col_name == "Location"
        ][0].removeprefix("file:")
        counts = {
            r["pt"]: r["c"]
            for r in adap.groupBy("pt").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        hot_pt = max(counts, key=counts.get)
        hot_files = glob.glob(os.path.join(loc, f"pt={hot_pt}", "*.parquet"))
        assert len(hot_files) > 4, hot_files  # > conv_buckets files
        import re as _re

        bucket_ids = set()
        for f in hot_files:
            m = _re.search(r"_(\d{5})[_.]", os.path.basename(f))
            assert m, f"bucketed file name missing bucket id: {f}"
            bucket_ids.add(int(m.group(1)))
        assert bucket_ids <= set(range(4))

        # bucketed-scan property intact: conv-keyed aggregate, no exchange
        import re

        agg = spark.table(tbl_ad).groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = agg._jdf.queryExecution().explainString(
            agg._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert not re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl_flat}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl_ad}")
