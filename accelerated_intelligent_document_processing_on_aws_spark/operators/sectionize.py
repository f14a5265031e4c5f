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


def sectionize_chunked(
    df: DataFrame,
    chunk_size: int = 100_000,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    class_col: str = "turn_class",
    boundary_col: str = "is_boundary",
) -> DataFrame:
    """Two-phase gaps-and-islands: identical output to ``sectionize`` but
    the heavy window runs per (conv, chunk) so a 10^8-turn conversation
    parallelizes instead of sorting through one task.

    Phase 1 — local islands inside each ``chunk = turn_idx div chunk_size``
    (window keyed on (conv, chunk): mega-convs fan out across tasks).
    Phase 2 — a TINY per-chunk table (2 rows of metadata per chunk) gets a
    conv-level window assigning each chunk a section offset, plus a "glue"
    flag when a chunk's first run continues the previous chunk's last run
    (same class, no boundary tag) so the two local islands merge.
    Final id = local_id + offset.  The conv-level window now sorts
    n_chunks rows instead of n_turns — 10^8 turns become 10^3 chunk rows.
    """
    chunk = (F.col(order_col) / F.lit(chunk_size)).cast("long").alias("_chunk")
    d = df.withColumn("_chunk", chunk)

    w = Window.partitionBy(conv_col, "_chunk").orderBy(order_col)
    prev_cls = F.lag(F.col(class_col)).over(w)
    new_sec = (
        prev_cls.isNull() | (F.col(class_col) != prev_cls) | F.col(boundary_col)
    ).cast("int")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn("_local", F.sum(new_sec).over(cum) - F.lit(1))

    # chunk metadata: first/last turn's class, first turn's boundary flag,
    # number of local islands — one small row per (conv, chunk)
    meta = d.groupBy(conv_col, "_chunk").agg(
        F.min_by(class_col, F.col(order_col)).alias("_first_cls"),
        F.min_by(boundary_col, F.col(order_col)).alias("_first_bound"),
        F.max_by(class_col, F.col(order_col)).alias("_last_cls"),
        (F.max("_local") + 1).alias("_n_local"),
    )
    mw = Window.partitionBy(conv_col).orderBy("_chunk")
    glue = (
        F.lag("_last_cls").over(mw).isNotNull()
        & (F.col("_first_cls") == F.lag("_last_cls").over(mw))
        & (~F.col("_first_bound"))
    ).cast("long")
    # sections contributed by chunk k = n_local_k - glue_k (its first island
    # may merge into the previous chunk's last); global id of local island j
    # in chunk k = exclusive-cumsum(contrib)_k + j - glue_k
    meta = meta.withColumn("_glue", glue)
    contrib = F.col("_n_local") - F.col("_glue")
    mcum = mw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    meta = meta.withColumn(
        "_offset", F.sum(contrib).over(mcum) - contrib - F.col("_glue")
    )

    out = d.join(
        meta.select(conv_col, "_chunk", "_offset"), [conv_col, "_chunk"]
    ).withColumn("section_id", (F.col("_local") + F.col("_offset")).cast("long"))
    return out.drop("_chunk", "_local", "_offset")


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
