"""Deterministic confidence assessment + review flagging (X7/P17 analog).

Reference lifecycle: Bedrock assessment scores every extracted attribute
(``assessment/granular_service.py:1381-1965``), then ProcessResults walks
the explainability tree and flags fields under a per-field/default
threshold for human review (``processresults_function/index.py:118-171``,
HITL Choice state ``workflow.asl.json:162``; default threshold 0.70,
``index.py:47,54-55``).

Rebuild: the LLM scorer becomes a deterministic density heuristic over the
extraction outputs — pure Catalyst, zero Python:

* coverage   — extracted chars / original chars (how much of the turn
               survived boilerplate stripping; empty turns score 0)
* span trust — fraction of spans whose offsets resolved (end > start;
               unresolvable OCR lines emit zero-width spans)
* class trust— 1.0 for a regex-classified turn, 0.5 for the fallback class

confidence = 0.5*coverage + 0.3*span_trust + 0.2*class_trust;
needs_review = confidence < threshold (HitlMetadata analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_REVIEW_THRESHOLD = 0.70
FALLBACK_CLASS = "chat"


def assess(
    df: DataFrame,
    threshold: float = DEFAULT_REVIEW_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """Append (coverage, span_trust, confidence, needs_review)."""
    raw_len = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("double")
    ext_len = F.length(F.coalesce(F.col("extracted_text"), F.lit(""))).cast("double")
    coverage = F.when(raw_len > 0, F.least(ext_len / raw_len, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    n_spans = F.size("spans")
    resolved = F.size(F.filter("spans", lambda s: s["end"] > s["start"]))
    span_trust = F.when(n_spans > 0, resolved.cast("double") / n_spans).otherwise(
        F.lit(0.0)
    )
    class_trust = F.when(
        F.col("turn_class") == F.lit(FALLBACK_CLASS), F.lit(0.5)
    ).otherwise(F.lit(1.0))
    confidence = F.round(
        F.lit(0.5) * coverage + F.lit(0.3) * span_trust + F.lit(0.2) * class_trust, 4
    )
    return (
        df.withColumn("coverage", F.round(coverage, 4))
        .withColumn("span_trust", F.round(span_trust, 4))
        .withColumn("confidence", confidence)
        .withColumn("needs_review", confidence < F.lit(threshold))
    )


def review_queue(assessed: DataFrame) -> DataFrame:
    """Turns flagged for human review, most doubtful first (the HITL
    work-queue projection)."""
    return (
        assessed.filter(F.col("needs_review"))
        .select(
            "conv_id", "turn_idx", "turn_class", "confidence", "coverage", "span_trust"
        )
        .orderBy(F.col("confidence").asc(), "conv_id", "turn_idx")
    )
