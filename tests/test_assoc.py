"""Hand-computed cases for association-rule mining (operators/assoc.py)."""

from __future__ import annotations

from pyspark.sql import Row

from accelerated_intelligent_document_processing_on_aws_spark.operators.assoc import (
    association_rules,
)


def _baskets(spark, pairs):
    return spark.createDataFrame([Row(b=b, i=i) for b, i in pairs])


def test_assoc_hand_computed(spark):
    df = _baskets(
        spark,
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (3, "x"),
         (3, "w"), (4, "y")],
    )
    rows = association_rules(df, "b", "i", min_pair_count=2).collect()
    assert len(rows) == 1
    (r,) = rows
    # {x,y} co-occur in baskets 1 and 2; x in 3 baskets, y in 3; 4 total
    assert (r.item_a, r.item_b, r.n_a, r.n_b, r.n_ab) == ("x", "y", 3, 3, 2)
    assert r.support == 0.5
    assert r.conf_a_b == round(2 / 3, 6)
    assert r.conf_b_a == round(2 / 3, 6)
    assert r.lift == round(2 * 4 / 9, 6)


def test_assoc_duplicate_rows_deduped(spark):
    # the same (basket, item) row twice must not double-count
    df = _baskets(spark, [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")])
    (r,) = association_rules(df, "b", "i", min_pair_count=2).collect()
    assert (r.n_a, r.n_b, r.n_ab) == (2, 2, 2)
    assert r.lift == round(2 * 2 / 4, 6)


def test_assoc_basket_cap_drops_degenerate_basket(spark):
    # baskets 8 and 9 hold every (frequent) item; the cap applies to the
    # POST-prune basket size — that is what bounds the quadratic pair
    # join — so both degenerate baskets drop and only 1 and 2 pair up
    big = [(b, f"i{k}") for b in (8, 9) for k in range(6)]
    small = [(1, "i0"), (1, "i1"), (2, "i0"), (2, "i1")]
    df = _baskets(spark, big + small)
    rows = association_rules(
        df, "b", "i", min_pair_count=2, max_basket_items=3
    ).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.item_a, r.item_b, r.n_ab) == ("i0", "i1", 2)
    # n_a / n_baskets still count the dropped baskets (textbook support)
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.support == round(2 / 4, 6)


def test_assoc_infrequent_items_pruned(spark):
    df = _baskets(spark, [(1, "a"), (1, "b"), (2, "c"), (2, "d")])
    assert association_rules(df, "b", "i", min_pair_count=2).count() == 0
