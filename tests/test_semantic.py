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


def test_nw_score_hand_cases():
    """Textbook alignment scores with match=2, mismatch=-1, gap=-1."""
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
        nw_score,
    )

    assert nw_score(["a", "b", "c"], ["a", "b", "c"]) == 6
    assert nw_score([], ["a", "b"]) == -2
    assert nw_score(["a"], []) == -1
    # one deletion: align abc/ac -> 2 matches + 1 gap = 3
    assert nw_score(["a", "b", "c"], ["a", "c"]) == 3
    # total mismatch of equal length: max(all mismatch -3, gaps -6) = -3
    assert nw_score(["x", "y", "z"], ["p", "q", "r"]) == -3


def test_evaluate_alignment_shifted_turns(spark):
    """A dropped middle turn costs one gap instead of cascading misses;
    identical sequences score sim=1.0; full-outer covers one-sided ids."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_alignment,
    )

    actual = spark.createDataFrame(
        [("c1", 0, "hi"), ("c1", 1, "mid"), ("c1", 2, "bye"),
         ("c2", 0, "x"), ("c3", 0, "only-actual")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    golden = spark.createDataFrame(
        [("c1", 0, "hi"), ("c1", 1, "bye"),   # 'mid' dropped
         ("c2", 0, "x"), ("c4", 0, "only-golden")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    got = {r.id: r for r in evaluate_alignment(actual, golden).collect()}
    assert got["c2"].nw_score == 2 and got["c2"].sim == 1.0
    assert got["c1"].nw_score == 3  # 2 matches + 1 gap
    assert got["c3"].n_golden == 0 and got["c3"].nw_score == -1
    assert got["c4"].n_actual == 0 and got["c4"].nw_score == -1


def test_sw_score_hand_cases():
    """Local alignment: corrupted prefix/suffix is free, the best clean
    region scores; empty sides floor at 0 (never negative)."""
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
        sw_score,
    )

    assert sw_score(["a", "b", "c"], ["a", "b", "c"]) == 6
    assert sw_score([], ["a", "b"]) == 0
    assert sw_score(["a"], []) == 0
    # golden excerpt inside a noisy capture: NW charges the noise, SW doesn't
    assert sw_score(["x", "a", "b", "c", "y"], ["a", "b", "c"]) == 6
    # total mismatch: best region is empty -> 0 (NW would be -3)
    assert sw_score(["x", "y", "z"], ["p", "q", "r"]) == 0
    # one interior mismatch: match-mismatch-match beats split regions
    assert sw_score(["a", "q", "c"], ["a", "b", "c"]) == 3


def test_evaluate_local_alignment_excerpt(spark):
    """The golden sequence embedded in a noisy actual scores sim=1.0
    (one side contains the other); disjoint sequences score 0."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_local_alignment,
    )

    actual = spark.createDataFrame(
        [("c1", 0, "junk"), ("c1", 1, "hi"), ("c1", 2, "bye"),
         ("c1", 3, "junk2"), ("c2", 0, "p")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    golden = spark.createDataFrame(
        [("c1", 0, "hi"), ("c1", 1, "bye"), ("c2", 0, "z")],
        ["conv_id", "turn_idx", "extracted_text"],
    )
    got = {r.id: r for r in evaluate_local_alignment(actual, golden).collect()}
    assert got["c1"].sw_score == 4 and got["c1"].sim == 1.0
    assert got["c2"].sw_score == 0 and got["c2"].sim == 0.0
