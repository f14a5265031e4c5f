"""Deterministic SEMANTIC comparator (hashing-vectorizer cosine, X8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
    compare_semantic,
    hashing_vector,
    semantic_score,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
    evaluate_turns,
)


def test_identical_text_scores_one():
    assert semantic_score("the quick brown fox", "The quick brown FOX!") == pytest.approx(1.0)


def test_word_order_invariant():
    assert semantic_score("alpha beta gamma", "gamma alpha beta") == pytest.approx(1.0)


def test_disjoint_text_scores_zero():
    assert semantic_score("aaa bbb ccc", "xxx yyy zzz") == pytest.approx(0.0)


def test_partial_overlap_between():
    s = semantic_score("alpha beta", "alpha zeta")
    assert 0.0 < s < 1.0


def test_empty_both_is_one():
    assert semantic_score("", "") == 1.0
    assert compare_semantic("", "") is True


def test_vector_normalized():
    import numpy as np

    v = hashing_vector("one two three four")
    assert np.linalg.norm(v) == pytest.approx(1.0)


def test_spark_semantic_method(spark):
    a = spark.createDataFrame(
        [("c", 0, "hello world today"), ("c", 1, "completely different text")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    g = spark.createDataFrame(
        [("c", 0, "world hello today"), ("c", 1, "unrelated words entirely")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    got = {
        r.turn_idx: r
        for r in evaluate_turns(a, g, method="SEMANTIC").collect()
    }
    assert got[0].matched and got[0].score == 1.0
    assert not got[1].matched
