"""Token-budget batch packing: determinism, greedy bound, rollups."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def spark():
    from accelerated_intelligent_document_processing_on_aws_spark import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 50 + (i * 37) % 400) for i in range(200)]
    return spark.createDataFrame(rows, ["doc_id", "toks"]).cache()


def test_cumsum_packing_partition_invariant(spark, docs):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        pack_token_budget,
        with_shard,
    )

    def run(df):
        return sorted(
            (r.doc_id, r.shard, r.batch_id)
            for r in pack_token_budget(
                with_shard(df, "doc_id", 4), "doc_id", "toks", 1000
            ).collect()
        )

    assert run(docs) == run(docs.repartition(7))


def test_greedy_never_overflows_budget(spark, docs):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        batch_stats,
        pack_token_budget_greedy,
        with_shard,
    )

    budget = 1000
    packed = pack_token_budget_greedy(
        with_shard(docs, "doc_id", 4), "doc_id", "toks", budget
    )
    stats = batch_stats(packed, "toks").collect()
    # every doc <= budget here, so no batch may exceed it
    assert all(r.n_tokens <= budget for r in stats)
    assert sum(r.n_docs for r in stats) == 200
    # batches are reasonably full (greedy closes only on overflow)
    non_last = [r for r in stats if r.n_docs > 1]
    assert non_last


def test_greedy_oversized_doc_gets_own_batch(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        pack_token_budget_greedy,
    )

    df = spark.createDataFrame(
        [(0, 10, 0), (1, 5000, 0), (2, 10, 0)], ["doc_id", "toks", "shard"]
    )
    rows = {
        r.doc_id: r.batch_id
        for r in pack_token_budget_greedy(df, "doc_id", "toks", 100).collect()
    }
    assert rows[0] == 0 and rows[1] == 1 and rows[2] == 2


def test_cumsum_batches_are_budget_sized_on_average(spark, docs):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        batch_stats,
        pack_token_budget,
        with_shard,
    )

    packed = pack_token_budget(with_shard(docs, "doc_id", 4), "doc_id", "toks", 1000)
    stats = batch_stats(packed, "toks").collect()
    full = [r for r in stats if r.n_tokens >= 600]  # all but shard tails
    assert len(full) >= len(stats) // 2


def test_context_window_budget_semantics(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        context_window_stats,
    )

    # one conv, costs 10,20,30,40,50; budget 60
    rows = [("c", i, (i + 1) * 10) for i in range(5)]
    df = spark.createDataFrame(rows, "conv string, idx int, cost int")
    out = context_window_stats(
        df, "conv", ["idx"], F.col("cost"), budget=60
    )
    got = {r.idx: (r.n_ctx, r.ctx_cost) for r in out.collect()}
    # idx0: no prior. idx1: [10]. idx2: [10,20]=30. idx3: [10,20,30]=60.
    # idx4: [20,30,40]=90>60 -> [30,40]=70>60 -> [40]=40
    assert got == {0: (0, 0), 1: (1, 10), 2: (2, 30), 3: (3, 60), 4: (1, 40)}


def test_context_window_convs_isolated(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        context_window_stats,
    )

    rows = [("a", 0, 5), ("a", 1, 5), ("b", 0, 5), ("b", 1, 5)]
    df = spark.createDataFrame(rows, "conv string, idx int, cost int")
    out = context_window_stats(df, "conv", ["idx"], F.col("cost"), budget=100)
    got = {(r.conv, r.idx): r.n_ctx for r in out.collect()}
    assert got == {("a", 0): 0, ("a", 1): 1, ("b", 0): 0, ("b", 1): 1}


def test_context_window_null_and_zero_costs_clamped(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        context_window_stats,
    )

    # zero/null costs clamp to 1 so the prefix sum stays strictly
    # increasing (the property the RANGE frame relies on)
    rows = [("c", 0, None), ("c", 1, 0), ("c", 2, 4)]
    df = spark.createDataFrame(rows, "conv string, idx int, cost int")
    out = context_window_stats(df, "conv", ["idx"], F.col("cost"), budget=2)
    got = {r.idx: (r.n_ctx, r.ctx_cost) for r in out.collect()}
    assert got == {0: (0, 0), 1: (1, 1), 2: (2, 2)}


def test_context_windows_rolling_assembly(spark):
    """Each row carries the ordered concat of its last n items; early rows
    have shorter contexts; frame bounds state at n."""
    import datetime as dt

    from accelerated_intelligent_document_processing_on_aws_spark.operators.packing import (
        context_windows,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("c", f"t{i}", t0 + dt.timedelta(seconds=i), i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["conv", "txt", "ts", "idx"])
    got = {r.item_id: r for r in context_windows(df, "conv", "ts", "idx", "txt", n=3).collect()}
    assert got[0].context == "t0" and got[0].ctx_len == 1
    assert got[1].context == "t0 | t1"
    assert got[4].context == "t2 | t3 | t4" and got[4].ctx_len == 3
