"""Token-budget batch packing for training-data pipelines.

Not in the reference (its unit of work is one document); this is the
standard sharded sequence-packing step a 100 TB corpus pipeline runs
before tokenized training: assign documents to batches so each batch
holds ~``budget`` tokens, deterministically and partition-invariantly.

Two variants:

* ``pack_token_budget`` — cumulative-sum packing:
  ``batch_id = floor(exclusive_cumsum(tokens) / budget)`` per shard.  A
  document beginning before a budget boundary may spill past it (standard
  "pack then split at token boundaries" semantics); the assignment is a
  pure function of (shard, order, tokens) so it is reproducible across
  runs and engines — one window per shard, fully SQL-expressible.
* ``pack_token_budget_greedy`` — exact greedy bin-close (a batch never
  exceeds the budget unless a single document alone does).  The running
  state is inherently sequential, so it runs as ``applyInPandas`` per
  shard (shards are independent; parallelism = shard count).

Scale: shard by a hash of the id (``n_shards`` >> executor count) so no
single packing window serializes the corpus; the window/fold is linear
per shard.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_shard(df: DataFrame, id_col: str, n_shards: int = 64) -> DataFrame:
    """Deterministic shard id (engine-portable md5 hash, like hash_sample)."""
    shard = F.conv(
        F.substring(F.md5(F.concat(F.lit("shard"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % n_shards
    return df.withColumn("shard", shard)


def pack_token_budget(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Append ``batch_id`` via exclusive-cumsum div budget per shard."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(
        "batch_id", F.floor(cum_excl / F.lit(budget)).cast("long")
    )


_GREEDY_SCHEMA_SUFFIX = [T.StructField("batch_id", T.LongType())]


def pack_token_budget_greedy(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Exact greedy packing: close the batch when the next document would
    overflow the budget (oversized single documents get their own batch)."""
    schema = T.StructType(list(df.schema.fields) + _GREEDY_SCHEMA_SUFFIX)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        batch, acc, out = 0, 0, []
        for tok in pdf[token_col]:
            t = int(tok)
            if acc > 0 and acc + t > budget:
                batch += 1
                acc = 0
            out.append(batch)
            acc += t
        pdf["batch_id"] = pd.Series(out, dtype="int64")
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, schema)


def batch_stats(packed: DataFrame, token_col: str, shard_col: str = "shard") -> DataFrame:
    """Per-batch rollup: document count + token total."""
    return packed.groupBy(shard_col, "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
    )


def context_window_stats(
    df: DataFrame,
    conv_col: str,
    order_cols: list[str],
    cost_col,
    budget: int,
) -> DataFrame:
    """Per-turn training-context capacity under a token budget: for each
    turn, how many of its immediately-preceding turns (and how much of
    their cost) fit in a ``budget``-sized context window — the quantity
    an SFT sample builder needs when it packs multi-turn conversations
    into fixed-length model inputs.

    Adds ``n_ctx`` (count of preceding turns whose suffix-sum of cost is
    ≤ budget) and ``ctx_cost`` (that suffix's total cost).

    Plan: NO arrays and NO self-join — the exclusive running cost sum
    ``P`` is strictly increasing within a conversation (costs are
    clamped ≥ 1), so "the longest suffix of previous turns with total
    cost ≤ B" is exactly the rows whose ``P`` lands in the RANGE frame
    ``[P_i - B, P_i - 1]``.  Two window passes sharing one partitioning
    → ONE shuffle on conv_id, O(1) running state per row (the
    streaming-friendly frame shape), per-conversation cost independent
    of conversation length — the mega-conversation skew case degrades
    gracefully.
    """
    cost = F.greatest(cost_col.cast("long"), F.lit(1).cast("long"))
    w = (
        Window.partitionBy(conv_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.withColumn("_cost", cost).withColumn(
        "_p", F.sum("_cost").over(w) - F.col("_cost")
    )
    wr = (
        Window.partitionBy(conv_col)
        .orderBy(F.col("_p"))
        .rangeBetween(-budget, -1)
    )
    return (
        base.withColumn(
            "n_ctx", F.coalesce(F.count(F.lit(1)).over(wr), F.lit(0)).cast("long")
        )
        .withColumn(
            "ctx_cost",
            F.coalesce(F.sum("_cost").over(wr), F.lit(0).cast("long")).cast("long"),
        )
        .drop("_cost", "_p")
    )


def context_windows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    text_col: str,
    n: int = 3,
    sep: str = " | ",
) -> DataFrame:
    """Rolling context assembly: each row paired with the concatenation of
    its last ``n`` items (itself included) in key order — the
    SFT-example builder that turns a transcript into (context, target)
    training rows without a self-join.

    Columns: ``key, item_id, ctx_len, context``.

    Scale shape: ONE key-ordered window with a bounded ROWS frame
    (``n-1 PRECEDING``) — state per row is n strings, never the whole
    conversation; contrast with a range self-join, which would shuffle
    the table twice and explode skewed keys.  Mega-conversations are
    bounded by the frame, not the key, so skew does not amplify."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    ctx = F.collect_list(F.col(text_col)).over(w)
    return df.select(
        F.col(key_col).alias("key"),
        F.col(tiebreak_col).alias("item_id"),
        F.size(ctx).alias("ctx_len"),
        F.array_join(ctx, sep).alias("context"),
    )
