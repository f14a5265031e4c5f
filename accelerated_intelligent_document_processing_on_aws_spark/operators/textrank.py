"""TextRank extractive summarization (Mihalcea & Tarau 2004) as grouped
weighted PageRank over per-document sentence graphs.

A training-data pipeline uses this to pick the most central sentences of
each document (extractive summaries for seq2seq targets, salience-ranked
snippets for retrieval corpora) without any model call — the reference's
map-reduce summarization stage (SURVEY §2 G8, ``patterns/*/summarization``)
is the LLM-backed analog; this is the deterministic, certifiable one.

Operator contract / engine portability: edge weight = COUNT of shared
distinct words (an integer — the paper's log-length normalization is an
FP-divergent denominator, so out-strength sums here are exact integers),
out-strength-normalized transition weights and every iteration's ranks are
rounded to ``round_to`` decimals (the ``graph.pagerank`` discipline), so a
DuckDB oracle unrolling the same iterations lands on hash-identical
scores (q_textrank).

Scale shape (100 TB): every join and aggregate is keyed by
``(doc_id, sent_idx)`` — the graph is a UNION of millions of tiny
per-document graphs, so there is no global hot key and AQE coalesces the
doc-hashed partitions; the edge frame drops word arrays before it is
persisted (slim (doc, src, dst, weight) rows); each iteration shuffles
only the node-sized rank frame against the ONCE-partitioned edge cache
(the ``graph.pagerank`` / connected-components discipline).  Sentence
self-joins stay doc-local: a document with S sentences costs S^2 edge
candidates, bounded by chunking upstream (callers split giant docs the
same way ``curation.sliding_chunks`` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sentence_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = r"(?<=[.!?])\s+",
) -> DataFrame:
    """Explode documents into (id, sent_idx, sentence, words) rows by a
    sentence-boundary regex — the natural-text front end for ``textrank``
    (synthetic word-soup corpora use fixed-width word chunks instead)."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), pattern)).alias(
                "sent_idx", "sentence"
            ),
        )
        .filter(F.trim(F.col("sentence")) != "")
        .withColumn(
            "words",
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("sentence")), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ),
        )
    )


def textrank(
    sents: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "sent_idx",
    words_col: str = "words",
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 9,
) -> DataFrame:
    """Per-document TextRank scores over sentence rows
    ``(id_col, idx_col, words_col: array<string>)``.

    Graph: sentences of the same document are linked iff they share at
    least one distinct word; edge weight = number of shared distinct
    words (integer — see module docstring).  Rank update per iteration:
    ``r'(i) = (1-d)/n_doc + d * Σ_j (w_ji / strength_j) * r(j)`` with
    every rank (and each normalized weight) rounded to ``round_to``.
    Sentences with no links hold the teleport floor ``(1-d)/n_doc`` —
    TextRank keeps them in ``n_doc`` but they exchange no mass.

    Returns ``(id_col, idx_col, score)`` for every input sentence.
    """
    doc, idx = id_col, idx_col
    side = sents.select(
        F.col(doc),
        F.col(idx),
        F.array_distinct(F.col(words_col)).alias("_ws"),
    )
    n_w = Window.partitionBy(doc)
    base = (
        side.withColumn("n", F.count(F.lit(1)).over(n_w))
        .select(doc, idx, "n")
        .localCheckpoint(eager=False)
    )
    a, b = side.alias("a"), side.alias("b")
    raw = (
        a.join(
            b,
            (F.col(f"a.{doc}") == F.col(f"b.{doc}"))
            & (F.col(f"a.{idx}") != F.col(f"b.{idx}")),
        )
        .select(
            F.col(f"a.{doc}").alias(doc),
            F.col(f"a.{idx}").alias("src"),
            F.col(f"b.{idx}").alias("dst"),
            F.size(F.array_intersect(F.col("a._ws"), F.col("b._ws"))).alias(
                "_c"
            ),
        )
        .filter(F.col("_c") > 0)
    )
    # out-strength is an INTEGER sum (exact in any order); normalized
    # transition weights round once, then the word arrays are gone —
    # the persisted edge frame is slim and doc/src-partitioned so each
    # iteration's join reads it in place (graph.pagerank discipline)
    s_w = Window.partitionBy(doc, "src")
    edges = (
        raw.withColumn("_s", F.sum("_c").over(s_w))
        .select(
            doc,
            "src",
            "dst",
            F.round(F.col("_c").cast("double") / F.col("_s"), round_to).alias(
                "nw"
            ),
        )
        .repartition(doc, "src")
        .persist()
    )
    teleport = 1.0 - damping
    ranks = base.select(
        doc, idx, "n", F.round(F.lit(1.0) / F.col("n"), round_to).alias("rnk")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.select(
                    F.col(doc), F.col(idx).alias("src"), F.col("rnk")
                ),
                [doc, "src"],
            )
            .groupBy(F.col(doc), F.col("dst").alias(idx))
            .agg(F.sum(F.col("nw") * F.col("rnk")).alias("_in"))
        )
        ranks = (
            base.join(contrib, [doc, idx], "left")
            .select(
                doc,
                idx,
                "n",
                F.round(
                    F.lit(teleport) / F.col("n")
                    + F.lit(damping)
                    * F.coalesce(F.col("_in"), F.lit(0.0)),
                    round_to,
                ).alias("rnk"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select(doc, idx, F.col("rnk").alias("score")).localCheckpoint(
        eager=True
    )
    edges.unpersist()
    return out


def top_sentences(
    scores: DataFrame,
    id_col: str = "doc_id",
    idx_col: str = "sent_idx",
    top_n: int = 2,
) -> DataFrame:
    """Top-``top_n`` sentences per document by TextRank score (ties by
    ascending sentence index — earlier sentence wins, the extractive-
    summary convention).  Adds ``tr_rank``."""
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col(idx_col).asc()
    )
    return (
        scores.withColumn("tr_rank", F.row_number().over(w))
        .filter(F.col("tr_rank") <= top_n)
        .select(id_col, idx_col, "tr_rank", "score")
    )
