"""Analytics reporting sink (S7/S8).

Reference semantics (``reporting/save_reporting_data.py``): PyArrow →
snappy Parquet under Hive-style ``date=YYYY-MM-DD`` partitions
(:1251-1256), one table per section type (``save_document_sections``
:1094-1304), plus a metering table (:971) — Glue DDL (:358-479) so Athena
can query it.

Spark-native shape: ONE partitioned write per table —
``partitionBy("classification", "date")`` yields the same
``classification=X/date=Y`` Hive layout the reference builds by hand with
per-type key prefixes; the catalog DDL disappears (any Hive/Iceberg
catalog reads the layout natively).  No driver-side loops, no per-document
PUTs: the 3xN-object write pattern of the reference collapses into a
distributed columnar write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sectionize import section_table


def sections_reporting(turns: DataFrame) -> DataFrame:
    """Section-level reporting rows with a date partition column (min turn
    ts per section — the reference stamps document completion date,
    save_reporting_data.py:1114-1131)."""
    st = section_table(turns)
    # min ts per section for the date partition value; both aggregations
    # hash-partition on conv_id so the join adds no third exchange
    ts_per_sec = turns.groupBy("conv_id", "section_id").agg(
        F.min("ts").alias("section_ts")
    )
    return st.join(ts_per_sec, ["conv_id", "section_id"]).withColumn(
        "date", F.date_format("section_ts", "yyyy-MM-dd")
    )


def save_sections(turns: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the per-type, date-partitioned sections table."""
    (
        sections_reporting(turns)
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("classification", "date")
        .parquet(path)
    )


def metering_reporting(turns: DataFrame) -> DataFrame:
    """Usage counters per (date, payload kind): the metering-merge G6
    nested-dict sum (utils/__init__.py:73-96) as one explode + groupBy."""
    return (
        turns.select(
            F.date_format("ts", "yyyy-MM-dd").alias("date"),
            F.explode_outer("payload_kinds").alias("service_api"),
            F.size("spans").alias("n_spans"),
        )
        .fillna({"service_api": "none"})
        .groupBy("date", "service_api")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_spans").cast("long").alias("n_spans"),
        )
    )


def save_metering(turns: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        metering_reporting(turns)
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(path)
    )


_DDL_TYPES = {
    "string": "STRING", "long": "BIGINT", "integer": "INT", "int": "INT",
    "double": "DOUBLE", "float": "FLOAT", "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP", "date": "DATE", "binary": "BINARY",
}


def table_ddl(df: DataFrame, table_name: str, partition_cols: list[str] | None = None) -> str:
    """Hive/Athena-compatible ``CREATE EXTERNAL TABLE`` DDL for a reporting
    DataFrame (S8 analog of the reference's Glue table creation,
    ``save_reporting_data.py:358-479`` / ``_convert_schema_to_glue_columns``
    ``:321-356``) — on Iceberg the catalog handles this; for plain
    Hive-layout parquet this DDL registers the same table shape."""
    partition_cols = partition_cols or []
    cols, parts = [], []
    for f in df.schema.fields:
        t = _DDL_TYPES.get(f.dataType.typeName(), f.dataType.simpleString().upper())
        (parts if f.name in partition_cols else cols).append(f"  `{f.name}` {t}")
    ddl = f"CREATE EXTERNAL TABLE IF NOT EXISTS `{table_name}` (\n" + ",\n".join(cols) + "\n)"
    if parts:
        ddl += "\nPARTITIONED BY (\n" + ",\n".join(parts) + "\n)"
    ddl += "\nSTORED AS PARQUET"
    return ddl


def save_evaluation(
    evaluated: DataFrame,
    path: str,
    attr_col: str = "attr",
    mode: str = "overwrite",
) -> None:
    """Per-attribute evaluation results → Parquet, Hive-partitioned by
    attribute (``save_evaluation_results``, save_reporting_data.py:521-752:
    the reference writes per-attr result files per document; here it is one
    distributed partitioned write)."""
    (
        evaluated.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(attr_col)
        .parquet(path)
    )


def evaluation_report_md(
    evaluated: DataFrame,
    conv_col: str = "conv_id",
    attr_col: str = "attr",
) -> DataFrame:
    """Per-document markdown evaluation report
    (``save_reporting_data.py:521-752`` report writer analog): an
    attribute-by-attribute result table plus the match-rate footer, built
    with deterministic ordered concat — pure Catalyst, one groupBy."""
    row = F.struct(F.col(attr_col), F.col("method"), F.col("matched"), F.col("score"))
    line = lambda s: F.format_string(  # noqa: E731
        "| %s | %s | %s | %.4f |",
        s[attr_col],
        s["method"],
        F.when(s["matched"], F.lit("MATCH")).otherwise(F.lit("MISS")),
        s["score"],
    )
    rows = F.sort_array(F.collect_list(row))
    n = F.count(F.lit(1))
    n_match = F.sum(F.col("matched").cast("long"))
    return evaluated.groupBy(conv_col).agg(
        n.alias("n_attrs"),
        n_match.alias("n_matched"),
        F.concat(
            F.lit("# Evaluation report\n\n| Attribute | Method | Result | Score |\n"
                  "| --- | --- | --- | --- |\n"),
            F.array_join(F.transform(rows, line), "\n"),
            F.format_string(
                "\n\n**%d/%d matched (%.1f%%)**",
                n_match,
                n,
                F.round(n_match * F.lit(100.0) / n, 1),
            ),
        ).alias("report_md"),
    )
