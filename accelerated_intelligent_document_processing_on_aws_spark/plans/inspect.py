"""Physical-plan inspection: the scale-audit surface of the engine.

The brief's 100-TB discipline ("explain every operator, iterate until
it's the plan you'd want") is only repeatable if the plan properties are
*programmatically* checkable — tests/test_plans.py pins them for every
registry query, and this module is the public API those tests (and
users tuning their own pipelines) call:

* ``plan_of(df)``         — formatted explain string (ExplainMode FORMATTED)
* ``n_ops(plan, op)``     — count of a physical operator in the plan
* ``exchange_count(df)``  — shuffles the plan will run (the scale currency)
* ``pushed_filters(df)``  — predicate-pushdown evidence at each scan
* ``read_schemas(df)``    — column-pruning evidence at each scan
* ``python_eval_ops(df)`` — Arrow-batched vs row-at-a-time Python stages
* ``plan_report(df)``     — one dict with all of the above
* ``assert_scale_safe(df, ...)`` — raises unless the plan is free of
  CartesianProduct / BroadcastNestedLoopJoin / BatchEvalPython and
  within an optional exchange budget

Counterpart in the reference: there is none — a Step Functions + Lambda
pipeline has no query plan; its "physical plan" is the state machine
(``patterns/pattern-2/statemachine/workflow.asl.json``), fixed at deploy
time.  Catalyst's plan is chosen per-query, which is exactly why a
rebuild must audit it.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from pyspark.sql import DataFrame

# physical operators that are correctness-fine but scale-fatal: both
# materialize O(|L|x|R|) pairs, the exact shapes the banded/binned
# operators in operators/{similarity,rangejoin,dedup}.py exist to avoid
SCALE_UNSAFE_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")
# row-at-a-time Python (pickle per row); the Arrow-batched evaluator is
# ArrowEvalPython — 10-100x faster and the only one the engine permits
ROWWISE_PYTHON = "BatchEvalPython"


def plan_of(df: DataFrame) -> str:
    """Formatted physical plan (same text as ``df.explain('formatted')``)."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_ops(plan: str, op: str) -> int:
    """Count physical operators in a formatted explain: the detail section
    lists each node exactly once as ``(<id>) <Op>``."""
    return len(re.findall(rf"^\(\d+\) {op}\b", plan, re.MULTILINE))


def op_names(plan: str) -> List[str]:
    """All physical operator names in plan-id order."""
    return re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.MULTILINE)


def exchange_count(df_or_plan) -> int:
    """Number of shuffle exchanges the plan will run."""
    plan = df_or_plan if isinstance(df_or_plan, str) else plan_of(df_or_plan)
    return n_ops(plan, "Exchange")


def pushed_filters(df_or_plan) -> List[str]:
    """``PushedFilters`` lines of every scan — empty list means no
    predicate reached any source (fine for full scans, a bug for
    selective queries)."""
    plan = df_or_plan if isinstance(df_or_plan, str) else plan_of(df_or_plan)
    return [
        m.strip()
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.strip()
    ]


def read_schemas(df_or_plan) -> List[str]:
    """``ReadSchema`` of every scan — the column-pruning evidence (a scan
    reading all columns for a 2-column projection is wrong)."""
    plan = df_or_plan if isinstance(df_or_plan, str) else plan_of(df_or_plan)
    return re.findall(r"ReadSchema: (\S+)", plan)


def python_eval_ops(df_or_plan) -> Dict[str, int]:
    """Python evaluation stages by kind: ``ArrowEvalPython`` (vectorized,
    allowed), ``BatchEvalPython`` (row-at-a-time, forbidden in this
    engine), plus grouped-map/map-in-pandas operators."""
    plan = df_or_plan if isinstance(df_or_plan, str) else plan_of(df_or_plan)
    kinds = (
        "ArrowEvalPython",
        "BatchEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "FlatMapGroupsInPandasWithState",
    )
    return {k: n for k in kinds if (n := n_ops(plan, k))}


def codegen_op_fraction(df_or_plan) -> float:
    """Fraction of physical operators inside WholeStageCodegen spans
    (formatted mode tags them ``[codegen id : N]``).  Python/exchange/scan
    nodes legitimately sit outside; use as a trend metric, not a gate."""
    plan = df_or_plan if isinstance(df_or_plan, str) else plan_of(df_or_plan)
    detail = re.findall(r"^\(\d+\) .*$", plan, re.MULTILINE)
    if not detail:
        return 0.0
    tagged = sum(1 for line in detail if "[codegen id :" in line)
    return tagged / len(detail)


def plan_report(df: DataFrame) -> dict:
    """One-call scale audit of a DataFrame's physical plan."""
    plan = plan_of(df)
    return {
        "exchanges": exchange_count(plan),
        "scans": n_ops(plan, "Scan parquet") + n_ops(plan, "Scan ExistingRDD"),
        "pushed_filters": pushed_filters(plan),
        "read_schemas": read_schemas(plan),
        "python_eval": python_eval_ops(plan),
        "codegen_op_fraction": round(codegen_op_fraction(plan), 3),
        "broadcast_joins": n_ops(plan, "BroadcastHashJoin"),
        "sortmerge_joins": n_ops(plan, "SortMergeJoin"),
        "unsafe_joins": {
            op: n for op in SCALE_UNSAFE_JOINS if (n := n_ops(plan, op))
        },
        "rowwise_python": n_ops(plan, ROWWISE_PYTHON),
    }


def assert_scale_safe(
    df: DataFrame,
    max_exchanges: Optional[int] = None,
    allow_nested_loop: bool = False,
    allow_rowwise_python: bool = False,
) -> dict:
    """Raise AssertionError unless the plan survives a 100x scale-up:
    no all-pairs join, no row-at-a-time Python, optionally a shuffle
    budget.  Returns the ``plan_report`` for further checks."""
    rep = plan_report(df)
    if not allow_nested_loop and rep["unsafe_joins"]:
        raise AssertionError(
            f"scale-unsafe join(s) in plan: {rep['unsafe_joins']}"
        )
    if not allow_rowwise_python and rep["rowwise_python"]:
        raise AssertionError(
            f"row-at-a-time BatchEvalPython in plan ({rep['rowwise_python']} stage(s)); "
            "use Arrow-batched pandas UDFs"
        )
    if max_exchanges is not None and rep["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan runs {rep['exchanges']} exchanges, budget is {max_exchanges}"
        )
    return rep
