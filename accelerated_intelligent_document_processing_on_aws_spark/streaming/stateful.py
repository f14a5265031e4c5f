"""Stateful streaming sectionization — ``applyInPandasWithState``.

The batch sectionizer (G2) needs the whole conversation under one window;
a stream sees turns incrementally.  This operator keeps per-conversation
GroupState ``(next_turn_expected, last_class, next_section_id)`` and
assigns section ids incrementally with the SAME gaps-and-islands
semantics (new section on class change or boundary tag).

Ordering contract: ids are correct when each conversation's turns arrive
in turn_idx order across micro-batches (the file source with
``maxFilesPerTrigger`` over an append-ordered directory satisfies this;
within a batch the group is sorted explicitly).  Out-of-order arrivals are
passed through with ``section_id = -1`` and counted in the state so the
batch compactor (``run_pipeline``) can finalize them — the reference's
analog is pages re-sorted numerically after concurrent OCR completion
(``ocr/service.py:462-472``).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_turn", T.IntegerType()),
        T.StructField("last_class", T.StringType()),
        T.StructField("next_section", T.LongType()),
        T.StructField("out_of_order", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("turn_class", T.StringType()),
        T.StructField("is_boundary", T.BooleanType()),
        T.StructField("section_id", T.LongType()),
    ]
)


def _sectionize_group(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        next_turn, last_class, next_section, ooo = state.get
    else:
        next_turn, last_class, next_section, ooo = 0, None, 0, 0

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("turn_idx")
    out_sections = []
    for r in rows.itertuples():
        if r.turn_idx != next_turn:
            ooo += 1
            out_sections.append(-1)  # finalized by the batch compactor
            continue
        if last_class is None or r.turn_class != last_class or r.is_boundary:
            section = next_section
            next_section += 1
        else:
            section = next_section - 1
        last_class = r.turn_class
        next_turn += 1
        out_sections.append(section)

    state.update((next_turn, last_class, next_section, ooo))
    out = rows[["conv_id", "turn_idx", "turn_class", "is_boundary"]].copy()
    out["section_id"] = pd.Series(out_sections, index=rows.index, dtype="int64")
    yield out


def stream_sectionize(turns: DataFrame) -> DataFrame:
    """Streaming DataFrame (conv_id, turn_idx, turn_class, is_boundary) →
    + section_id, state kept per conv across micro-batches."""
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            _sectionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
