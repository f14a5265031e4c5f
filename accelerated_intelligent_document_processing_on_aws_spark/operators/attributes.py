"""Config-driven per-section attribute extraction (X6 deterministic twin).

Reference semantics: ``extraction/service.py:712-1161`` sends each section's
concatenated text to Bedrock with a per-class attribute config
(``config_library/pattern-2/*/config.yaml`` attributes; parsed at
``extraction/service.py:72-120``) and parses the returned JSON into
``{attribute: value}``.  The deterministic rebuild replaces the LLM with
config-driven regex capture — one generated Catalyst projection, the same
result shape ``(conv_id, section_id, attr, value)``.

Spark shape: the ``{attr: regex}`` config compiles into a literal
array<struct> of ``regexp_extract`` captures (group 1), exploded to attr
rows — zero Python, zero extra shuffles (the projection rides whatever
partitioning the section table already has).  Missing attributes surface
as NULL (reference: absent key in the extraction JSON).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_section_attributes(
    sections: DataFrame,
    config: Dict[str, str],
    text_col: str = "section_text",
    key_cols: Optional[List[str]] = None,
) -> DataFrame:
    """One row per (section, attribute): first regex capture group over the
    section text, NULL when the attribute's pattern does not match."""
    key_cols = key_cols or ["conv_id", "section_id"]
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("attr"),
                    F.regexp_extract(F.col(text_col), rx, 1).alias("value"),
                )
                for name, rx in config.items()
            ]
        )
    ).alias("kv")
    return sections.select(*key_cols, kv).select(
        *key_cols,
        F.col("kv.attr").alias("attr"),
        F.nullif(F.col("kv.value"), F.lit("")).alias("value"),
    )


def attributes_wide(
    attr_rows: DataFrame,
    config: Dict[str, str],
    key_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Pivot the attr rows back to one wide row per section (the reference's
    ``{attr: value}`` dict shape) — deterministic column order from config."""
    key_cols = key_cols or ["conv_id", "section_id"]
    return (
        attr_rows.groupBy(*key_cols)
        .pivot("attr", list(config.keys()))
        .agg(F.first("value"))
    )
