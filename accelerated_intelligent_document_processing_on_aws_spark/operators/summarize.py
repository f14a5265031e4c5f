"""Map-reduce summarization analog (G8).

Reference lifecycle (``summarization/service.py:378-560``): per-section
summaries fanned out on a 20-thread pool, then combined into one document
summary with a table of contents (``markdown_formatter.py:37-93``).  The
LLM summarizer is replaced by a deterministic extractive stub (first
``max_chars`` of the section text, cut at a word boundary) with the same
interface; the two-level aggregation shape is the operator under test.

Spark shape: two groupBy levels — (conv, section) then (conv) — the second
agg reuses the first's hash partitioning on conv_id, so Catalyst plans ONE
exchange for both levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sectionize import section_table


def extractive_summary(c, max_chars: int = 160):
    """Deterministic summary stub: first max_chars, cut at the last space
    (pure Catalyst — substring + regexp trim of the trailing word frag)."""
    head = F.substring(c, 1, max_chars)
    return F.when(F.length(c) <= max_chars, c).otherwise(
        F.regexp_replace(head, " [^ ]*$", "")
    )


def section_summaries(turns: DataFrame, max_chars: int = 160) -> DataFrame:
    """One summary row per (conv_id, section_id)."""
    st = section_table(turns)
    return st.select(
        "conv_id",
        "section_id",
        "classification",
        "n_turns",
        extractive_summary(F.col("section_text"), max_chars).alias("summary"),
    )


def document_summary(summaries: DataFrame) -> DataFrame:
    """Fan-in: markdown TOC + stitched per-section summaries per conv
    (markdown_formatter.py:37-93 analog; ordered, deterministic)."""
    sec = F.struct("section_id", "classification", "summary")
    toc_line = lambda s: F.format_string(  # noqa: E731
        "%d. %s", s["section_id"] + 1, s["classification"]
    )
    body_line = lambda s: F.format_string(  # noqa: E731
        "## %d. %s\n%s", s["section_id"] + 1, s["classification"], s["summary"]
    )
    secs = F.sort_array(F.collect_list(sec))
    return summaries.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_sections"),
        F.concat(
            F.lit("# Contents\n"),
            F.array_join(F.transform(secs, toc_line), "\n"),
            F.lit("\n\n"),
            F.array_join(F.transform(secs, body_line), "\n\n"),
        ).alias("summary_md"),
    )
