"""Transcript ingestion sources: schema-enforced readers for the canonical
input table plus corrupt-record routing for semi-structured feeds.

The reference ingests documents through an S3-event → SQS → Lambda chain
(``src/lambda/queue_sender``, ``queue_processor/index.py``) where every
object is its own "row" and malformed inputs dead-letter to a queue.  The
Spark-first analog: *files are tables*, malformed records are routed by
the PERMISSIVE parser into a ``_corrupt_record`` column in the SAME scan
(no second pass, no per-object Lambda), and the clean side flows straight
into ``run_pipeline``.

Canonical input shape (BASELINE input_hint): ``conv_id string,
turn_idx int, role string, text string, tool string, ts timestamp``.

Scale notes:
* Readers never infer schema (an inference pass is a full extra scan of
  100 TB); the canonical schema is supplied to every format.
* ``split_corrupt`` filters one cached scan two ways — at scale prefer
  writing the bad side out via ``badRecordsPath``-style sinks, but the
  routing predicate itself is a column, so both sides stay one job each.
* Validation is ONE aggregate job (``validate_transcripts``) — counts,
  null keys, duplicate (conv_id, turn_idx) pairs, ts bounds — not a
  driver-side loop.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType = TRANSCRIPTS_SCHEMA,
) -> DataFrame:
    """Read a transcripts table in the canonical column order/types.

    ``fmt``: ``parquet`` (columnar, schema from footers — casts/reorders
    to canonical), ``jsonl`` or ``csv`` (schema supplied, PERMISSIVE:
    malformed records land whole in ``_corrupt_record`` instead of
    failing the job — route them with :func:`split_corrupt`).
    """
    cols = [f.name for f in schema.fields]
    if fmt == "parquet":
        df = spark.read.parquet(path)
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"parquet input missing canonical columns {missing}")
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    # jsonl/csv parse via a TEXT scan + from_json/from_csv with the
    # corrupt field INSIDE the parse schema — not the raw readers'
    # internal _corrupt_record column, which Spark refuses to let a plan
    # reference alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN would break
    # `bad.count()`-shaped queries).  Same single pass over the bytes;
    # the corrupt flag is an ordinary computed column with no pruning
    # restrictions.
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    if fmt == "jsonl":
        raw = spark.read.text(path)
        parsed = F.from_json(F.col("value"), _with_corrupt(schema), opts)
    elif fmt == "csv":
        header = ",".join(cols)
        raw = spark.read.text(path).filter(F.col("value") != header)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in _with_corrupt(schema).fields
        )
        parsed = F.from_csv(F.col("value"), ddl, opts)
    else:
        raise ValueError(f"unknown format {fmt!r} (parquet|jsonl|csv)")
    out = raw.select(F.col("value").alias("_raw"), parsed.alias("_p"))
    # two corruption shapes: a malformed line sets the in-schema corrupt
    # field; an EMPTY line parses to a NULL struct with no corrupt field
    # at all — both must dead-letter with the raw line preserved
    corrupt = F.when(
        F.col("_p").isNull(), F.col("_raw")
    ).otherwise(F.col("_p")[CORRUPT_COL])
    out = out.withColumn(CORRUPT_COL, corrupt)
    # a malformed line yields partial results (Jackson/univocity fill what
    # they can); null the payload fields on corrupt rows so routing is
    # all-or-nothing, like the reference's DLQ
    ok = F.col(CORRUPT_COL).isNull()
    return out.select(
        *[F.when(ok, F.col("_p")[f.name]).alias(f.name) for f in schema.fields],
        F.col(CORRUPT_COL),
    )


def split_corrupt(df: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """Route a PERMISSIVE-parsed frame into (clean, dead_letter).

    Clean rows drop the corrupt column; dead-letter rows stay full-width
    (raw record in ``_corrupt_record`` plus whatever fields parsed) for
    replay — the Spark analog of the reference's DLQ.  The bad side must
    NOT project the corrupt column alone: Spark forbids scans whose read
    schema is only the internal corrupt column (QUERY_ONLY_CORRUPT_RECORD
    _COLUMN), and column pruning would reduce a ``.select(corrupt)`` to
    exactly that.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad


def parse_json_envelope(
    df: DataFrame,
    payload_col: str,
    schema: T.StructType,
    prefix: str = "p_",
) -> DataFrame:
    """Parse an embedded JSON payload column against ``schema`` with
    corrupt routing: adds ``parse_ok`` plus one ``<prefix><field>`` column
    per schema field (all NULL when the payload is malformed).

    This is the ingestion twin of ``kernels/json_sniff`` — sniffing finds
    *that* a payload is JSON; the envelope parser enforces *what* it must
    contain.  Pure Catalyst (``from_json``), no Python.
    """
    # PERMISSIVE from_json returns a Row of NULLs (not a NULL struct) for
    # malformed input since Spark 3.0, so detect corruption the supported
    # way: a corrupt-record field inside the parse schema.  Two more
    # corruption shapes never reach that field and must be gated
    # explicitly: a NULL/empty/whitespace payload makes from_json return a
    # NULL struct (no corrupt-field hit at all — read_transcripts handles
    # the same case for line feeds), so parse_ok additionally requires the
    # payload to be non-null and the parsed struct itself to be non-null.
    parsed = F.from_json(
        F.col(payload_col),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    out = df.withColumn("_parsed", parsed)
    out = out.withColumn(
        "parse_ok",
        F.col(payload_col).isNotNull()
        & F.col("_parsed").isNotNull()
        & F.col("_parsed")[CORRUPT_COL].isNull(),
    )
    for f in schema.fields:
        out = out.withColumn(
            prefix + f.name,
            F.when(F.col("parse_ok"), F.col("_parsed")[f.name]),
        )
    return out.drop("_parsed")


def validate_transcripts(df: DataFrame, schema: T.StructType = TRANSCRIPTS_SCHEMA):
    """One-job data-quality report over an ingested transcripts frame:
    row count, NULL-key counts, duplicate (conv_id, turn_idx) pairs and
    ts bounds.  Returns a single-row DataFrame (collect it for a dict) —
    an aggregation, never a driver loop."""
    # duplicate keys via count - countDistinct: a real distinct aggregate
    # (partial per-partition dedup, scales) — never collect_set, whose
    # single aggregation buffer would hold every key of a 100 TB table
    dup = (F.count(F.lit(1)) - F.count_distinct(F.col("conv_id"), F.col("turn_idx"))).alias(
        "dup_turn_keys"
    )
    return df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("conv_id").isNull().cast("long")).alias("null_conv_id"),
        F.sum(F.col("turn_idx").isNull().cast("long")).alias("null_turn_idx"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        dup,
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )
