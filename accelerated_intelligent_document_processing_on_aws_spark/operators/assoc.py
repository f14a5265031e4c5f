"""Association-rule mining (market-basket analysis): pairwise item
co-occurrence with support / confidence / lift.

Why this lives in a 100 TB engine: "which tools co-occur in the same
conversation", "which parts ship in the same order", "which error codes
fire together" are the same query — a basket/item co-occurrence join —
and at corpus scale the naive all-pairs blow-up is the thing that kills
it, not the arithmetic.  This operator is the classical apriori
*pair* pass (the 2-itemset lattice level, which in practice answers
most co-occurrence questions) expressed as DataFrame algebra.

Scale shape:
- the basket table is deduplicated once, then every downstream stage
  is keyed on ``basket`` — the per-basket size window, the frequent-item
  prune, and the pair self-join all reuse ONE hash partitioning of the
  (basket, item) frame;
- **apriori prefilter**: an item that appears in fewer than
  ``min_pair_count`` baskets cannot be in any qualifying pair, so
  infrequent items are pruned BEFORE the quadratic step (broadcast
  semi-join against the item-count frame — item cardinality is
  vocabulary-sized, not corpus-sized);
- **basket cap**: a degenerate basket with a million items contributes
  ~10^12 pairs; ``max_basket_items`` drops such baskets (one window
  count over the same basket partitioning — no extra exchange of the
  big frame), which is the standard skew defense for self-join
  co-occurrence at web scale.  The cap is measured on the POST-prune
  basket size — exactly the quantity that bounds the quadratic join —
  so a huge basket of mostly-rare items is kept once pruning has
  shrunk it;
- the pair aggregate itself is map-side combinable, and everything
  after it operates on the (bounded) rule frame.

No reference analog — the reference repo has no association mining;
this extends the corpus-analytics family (SURVEY.md §2 "beyond the
reference" training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows.

    For every unordered item pair {a, b} (emitted once with
    ``item_a < item_b``) co-occurring in at least ``min_pair_count``
    baskets:

    - ``support``    = n_ab / n_baskets
    - ``conf_a_b``   = P(b | a) = n_ab / n_a   (rule a → b)
    - ``conf_b_a``   = P(a | b) = n_ab / n_b   (rule b → a)
    - ``lift``       = support / (support_a · support_b)
                     = n_ab · n_baskets / (n_a · n_b)

    ``n_baskets`` counts ALL distinct baskets in the input (before any
    prune), so support/lift keep their textbook meaning; counts are
    exact int64 and every ratio is a single division, so the output is
    engine-portable without tolerance.

    Columns: ``item_a, item_b, n_a, n_b, n_ab, support, conf_a_b,
    conf_b_a, lift``.
    """
    # the deduped basket frame feeds FOUR consumers (total-basket count,
    # item counts, and both sides of the pair self-join); a lazy
    # localCheckpoint materializes it once — one input scan + one dedup
    # shuffle instead of four source re-scans (the corpus.py /
    # curation.py shared-frame pattern)
    b = (
        df.select(
            F.col(basket_col).alias("basket"),
            F.col(item_col).alias("item"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    # corpus-level scalar (1 row) — attached to the bounded rule frame
    # via broadcast; Catalyst constant-folds the join key, so this plans
    # as a one-row BroadcastNestedLoopJoin (whitelisted in the plan
    # sweep: the build side is a single row by construction)
    totals = b.agg(
        F.count_distinct("basket").alias("n_baskets")
    ).withColumn("_k", F.lit(1))

    # item frequencies (vocabulary-sized) + apriori prune set
    cnt = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    freq = cnt.filter(F.col("n_item") >= int(min_pair_count))

    pruned = b.join(
        F.broadcast(freq.select("item")), "item", "left_semi"
    ).withColumn(
        "_bsz", F.count(F.lit(1)).over(Window.partitionBy("basket"))
    ).filter(
        F.col("_bsz") <= int(max_basket_items)
    ).select("basket", "item")

    left = pruned.select("basket", F.col("item").alias("item_a"))
    right = pruned.select("basket", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_count))
    )

    out = (
        pairs.join(
            F.broadcast(
                cnt.select(
                    F.col("item").alias("item_a"),
                    F.col("n_item").alias("n_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                cnt.select(
                    F.col("item").alias("item_b"),
                    F.col("n_item").alias("n_b"),
                )
            ),
            "item_b",
        )
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(totals), "_k")
    )
    nb = F.col("n_baskets").cast("double")
    nab = F.col("n_ab").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        F.round(nab / nb, round_to).alias("support"),
        F.round(nab / F.col("n_a").cast("double"), round_to).alias(
            "conf_a_b"
        ),
        F.round(nab / F.col("n_b").cast("double"), round_to).alias(
            "conf_b_a"
        ),
        F.round(
            nab * nb
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            round_to,
        ).alias("lift"),
    )
