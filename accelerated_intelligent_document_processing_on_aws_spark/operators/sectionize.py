"""Sectionization: stable turn ordering + gaps-and-islands segmentation.

Reference semantics:

* Stable page ordering — numeric sort of page ids after concurrent
  completion (``ocr/service.py:462-472``,
  ``classification/service.py:1771-1787``) → a window ordered by
  ``turn_idx`` per ``conv_id`` (G1).
* Consecutive-run sectioning — a new section starts when the class changes
  OR the BIO boundary tag says 'start'
  (``classification/service.py:1823-1884`` ``_group_consecutive_pages``;
  BIO semantics :1604-1616) → lag + cumulative sum (G2).
* Section text concatenation — in-order "\\n" join of page texts
  (``extraction/service.py:773-788``) → ``sort_array(collect_list(struct))``
  then join, which is deterministic under parallelism (G3); a bare
  ``collect_list`` would be a latent flake.

Scale: exactly ONE shuffle (hash by conv_id for the window); the section
aggregate reuses the same partitioning, so Catalyst plans no second
exchange.  AQE skew-join/partition splitting handles mega-conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sectionize(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    class_col: str = "turn_class",
    boundary_col: str = "is_boundary",
) -> DataFrame:
    """Add ``section_id`` (0-based per conversation)."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    prev_cls = F.lag(F.col(class_col)).over(w)
    new_section = (
        prev_cls.isNull()
        | (F.col(class_col) != prev_cls)
        | F.col(boundary_col)
    ).cast("int")
    cum = Window.partitionBy(conv_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("section_id", F.sum(new_section).over(cum) - F.lit(1))


def section_table(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    class_col: str = "turn_class",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Collapse turns into one row per (conv_id, section_id).

    Deterministic ordered concat: sort_array over (turn_idx, text) structs.
    """
    pairs = F.struct(F.col(order_col).alias("i"), F.col(text_col).alias("t"))
    return (
        df.groupBy(conv_col, "section_id")
        .agg(
            F.first(class_col).alias("classification"),
            F.sort_array(F.collect_list(F.col(order_col))).alias("turn_idxs"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(pairs)), lambda s: s["t"]
                ),
                "\n",
            ).alias("section_text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
