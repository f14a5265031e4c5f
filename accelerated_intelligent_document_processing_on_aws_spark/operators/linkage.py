"""Record linkage: blocked fuzzy matching over an entity-name dimension.

The classic data-integration pass (Fellegi & Sunter 1969 shape): dedupe
the corpus down to its DISTINCT names first, block candidate pairs on a
cheap key (first token here — standard blocking), score survivors with
Jaro-Winkler (``kernels/compare.py jaro_winkler``, the Winkler 1990
variant with 0.7 boost threshold and 4-char prefix cap — bit-identical
to DuckDB's native ``jaro_winkler_similarity``, which makes the oracle a
true DIFFERENTIAL check between independent implementations).

Scale shape (100 TB): linkage runs on the deduplicated name DIMENSION,
never the fact table — distinct entity names are vocabulary-bounded, so
the block self-join is dimension², not corpus², and the fact table never
shuffles (callers join the match table back by name afterwards, a
broadcast).  The JW scoring runs as an Arrow-batched pandas UDF over the
already-blocked pair rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.compare import jaro_winkler


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)]
    )


def record_linkage(
    df: DataFrame,
    name_col: str,
    threshold: float = 0.8,
    round_to: int = 4,
) -> DataFrame:
    """Match table ``(name_a, name_b, jw)`` over the distinct values of
    ``name_col``: pairs sharing a first token (the blocking key) whose
    Jaro-Winkler similarity, rounded to ``round_to``, clears
    ``threshold``.  ``name_a < name_b`` canonical order.  Rounding
    BEFORE the threshold makes the surviving set engine-portable."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("block", F.split(F.col("name"), " ").getItem(0))
    )
    a = names.select(
        F.col("name").alias("name_a"), F.col("block").alias("block")
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("block").alias("block")
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.round(
                jaro_winkler_udf(F.col("name_a"), F.col("name_b")), round_to
            ).alias("jw"),
        )
        .filter(F.col("jw") >= F.lit(threshold))
    )
