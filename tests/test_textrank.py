"""TextRank extractive summarization: hand-case centrality, teleport
floor for isolated sentences, per-doc score conservation, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.textrank import (
    sentence_rows,
    textrank,
    top_sentences,
)


@pytest.fixture(scope="module")
def spark():
    from accelerated_intelligent_document_processing_on_aws_spark import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


def test_hub_sentence_wins(spark):
    """A sentence sharing words with every other sentence outranks the
    peripheral ones."""
    doc = (
        "spark shuffles data between partitions. "
        "the shuffle moves data across executors for spark joins. "
        "cats enjoy long afternoon naps."
    )
    sents = sentence_rows(spark.createDataFrame([(1, doc)], ["doc_id", "text"]))
    assert sents.count() == 3
    scores = {r.sent_idx: r.score for r in textrank(sents).collect()}
    # sentence 1 links to 0 (spark/shuffle/data) and weakly nothing to 2;
    # sentence 2 is isolated -> teleport floor
    assert scores[1] > scores[2] and scores[0] > scores[2]
    n = 3
    assert scores[2] == pytest.approx((1 - 0.85) / n, abs=1e-9)


def test_isolated_doc_uniform(spark):
    """All-disjoint sentences: every rank settles at the teleport floor."""
    doc = "alpha beta. gamma delta. epsilon zeta."
    sents = sentence_rows(spark.createDataFrame([(7, doc)], ["doc_id", "text"]))
    out = textrank(sents).collect()
    assert all(r.score == pytest.approx(0.15 / 3, abs=1e-9) for r in out)


def test_scores_conserve_per_doc(spark):
    """With a connected graph, total rank mass per doc stays ~1 (power
    method with row-stochastic transitions and uniform teleport)."""
    doc = (
        "data pipeline quality checks run nightly. "
        "the nightly pipeline validates data quality. "
        "quality checks gate the data pipeline release. "
        "release gates depend on validation checks."
    )
    sents = sentence_rows(spark.createDataFrame([(3, doc)], ["doc_id", "text"]))
    total = textrank(sents).agg(F.sum("score")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=0.01)


def test_top_sentences_and_determinism(spark):
    """top_sentences returns top_n rows per doc ranked desc, idx tiebreak;
    two runs produce identical output (fixed iterations + rounding)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c. a b d. a c d. z y."),
            (2, "p q r. p q s. t u v."),
        ],
        ["doc_id", "text"],
    )
    sents = sentence_rows(docs)
    t1 = top_sentences(textrank(sents), top_n=2).collect()
    t2 = top_sentences(textrank(sents), top_n=2).collect()
    key = lambda r: (r.doc_id, r.tr_rank)  # noqa: E731
    assert sorted(t1, key=key) == sorted(t2, key=key)
    per_doc = {}
    for r in t1:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.tr_rank)
        assert [r.tr_rank for r in rows] == [1, 2]
        assert rows[0].score >= rows[1].score


def test_chunked_wordsoup_runs_on_documents(spark):
    """Fixed-width word-chunk sentences over the synthetic corpus (the
    q_textrank shape): every doc yields scores, all positive, plan is
    scale-safe."""
    from accelerated_intelligent_document_processing_on_aws_spark.plans import (
        assert_scale_safe,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(50)
    )
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    sents = (
        d.select("doc_id", words.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0), ((F.size("ws") + 11) / 12).cast("int") - 1
                )
            ).alias("sent_idx"),
            F.col("ws"),
        )
        .select(
            "doc_id",
            "sent_idx",
            F.slice(F.col("ws"), F.col("sent_idx") * 12 + 1, 12).alias("words"),
        )
    )
    scores = textrank(sents)
    assert_scale_safe(scores)
    rows = scores.collect()
    assert len(rows) == sents.count()
    assert all(r.score > 0 for r in rows)
