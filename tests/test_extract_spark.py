"""Differential tests: the Spark pipeline vs an independent pandas oracle on
the same deterministic batch (SURVEY.md §5.3 "oracle pattern") — per-turn
text equality + span-offset equality under stable (conv_id, turn_idx)
ordering, the north_rule invariant."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
    gen_transcripts_pdf,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.classify import (
    classify_text,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.extract import (
    extract_turn,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
    section_table,
)


def pandas_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent per-row oracle: kernel + classification + sectionization
    computed with plain pandas groupby (no Spark)."""
    rows = []
    for r in pdf.itertuples():
        et, spans, kinds, boundary = extract_turn(r.text)
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": r.turn_idx,
                "extracted_text": et,
                "spans": spans,
                "is_boundary": boundary,
                "turn_class": classify_text(et),
            }
        )
    out = pd.DataFrame(rows).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # gaps-and-islands section ids per conversation
    sec = []
    for _conv, grp in out.groupby("conv_id", sort=True):
        sid = -1
        prev = None
        for r in grp.itertuples():
            if prev is None or r.turn_class != prev or r.is_boundary:
                sid += 1
            prev = r.turn_class
            sec.append((r.Index, sid))
    for idx, s in sec:
        out.loc[idx, "section_id"] = s
    out["section_id"] = out["section_id"].astype("int64")
    return out


@pytest.fixture(scope="module")
def batch(spark):
    pdf = gen_transcripts_pdf(n_convs=30, mean_turns=10, skew_convs=2, skew_factor=10)
    sdf = gen_transcripts_df(spark, n_convs=30, mean_turns=10, skew_convs=2, skew_factor=10)
    out = extract_stage(sdf).cache()
    return pdf, out


def test_per_turn_text_equality(batch):
    pdf, out = batch
    oracle = pandas_oracle(pdf)
    got = (
        out.select("conv_id", "turn_idx", "extracted_text", "turn_class", "section_id")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(got) == len(oracle)
    # BYTE equality per turn, stable ordering
    pd.testing.assert_series_equal(
        got["extracted_text"].reset_index(drop=True),
        oracle["extracted_text"].reset_index(drop=True),
        check_names=False,
    )
    assert (got["turn_class"].values == oracle["turn_class"].values).all()
    assert (got["section_id"].values == oracle["section_id"].values).all()


def test_span_offsets_match_original(batch):
    pdf, out = batch
    got = (
        out.select("conv_id", "turn_idx", "text", "spans")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    checked = 0
    for row in got:
        for sp in row.spans:
            sliced = row.text[sp.start : sp.end]
            if sp.kind != "ocr_line" or sp.text in row.text:
                assert sliced == sp.text
                checked += 1
    assert checked > 100


def test_span_equality_vs_oracle(batch):
    pdf, out = batch
    oracle = pandas_oracle(pdf)
    got = (
        out.select("conv_id", "turn_idx", "spans").orderBy("conv_id", "turn_idx").collect()
    )
    for row, orow in zip(got, oracle.itertuples()):
        got_spans = [(s.span_id, s.kind, s.start, s.end, s.text) for s in row.spans]
        assert got_spans == orow.spans


def test_section_table_deterministic_concat(spark, batch):
    _pdf, out = batch
    sect = section_table(out).orderBy("conv_id", "section_id")
    rows = sect.collect()
    # section_text must equal in-order join of member turns' extracted text
    turns = {
        (r.conv_id, r.turn_idx): r.extracted_text
        for r in out.select("conv_id", "turn_idx", "extracted_text").collect()
    }
    for r in rows:
        expected = "\n".join(turns[(r.conv_id, i)] for i in r.turn_idxs)
        assert r.section_text == expected
        assert r.turn_idxs == sorted(r.turn_idxs)


def test_skewed_conversation_spreads_buckets(spark):
    sdf = gen_transcripts_df(spark, n_convs=3, mean_turns=5, skew_convs=1, skew_factor=40)
    out = extract_stage(sdf)
    # salted bucket col exists and the skewed conversation does not collapse
    # the bucket space on its own rows' partition layout
    n_buckets = out.select("pt").distinct().count()
    assert n_buckets > 1
