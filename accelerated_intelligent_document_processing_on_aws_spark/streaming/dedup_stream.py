"""Streaming deduplication — the streaming twin of the batch exact-dedup
family (``operators/dedup.py``).

Reference behavior: the queue front door admits each document once — the
DynamoDB tracking table drops re-delivered S3 events (SQS is
at-least-once).  The Spark analog is ``dropDuplicatesWithinWatermark``:
state holds one entry per key only until the event-time watermark passes,
so the dedup memory is BOUNDED by the watermark horizon — the property
that keeps state finite at 10^12-turn scale (an unbounded
``dropDuplicates`` would accumulate every key ever seen).

Two variants:

* key dedup (``dedup_turns_stream``) — one row per (conv_id, turn_idx)
  within the horizon: re-deliveries of the same turn are dropped;
* content dedup (``dedup_content_stream``) — one row per text
  fingerprint (md5, same fingerprint as ``dedup.exact_duplicates``):
  byte-identical payloads arriving under different ids are dropped.

At cluster scale the dedup state lives in the state store (RocksDB
provider for large horizons); the key spreads uniformly (md5 / high-card
conv keys), so no state-store partition hot-spots.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def dedup_turns_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Admit each (conv_id, turn_idx) once within the watermark horizon.

    A duplicate delivered within ``watermark_delay`` of the first copy's
    event time is dropped; after the watermark passes, the key's state is
    evicted (bounded memory — re-deliveries later than the horizon are the
    upstream's exactly-once problem, as with the reference's TTL'd
    tracking table)."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def dedup_content_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Admit each distinct text payload once within the watermark horizon.

    Fingerprint = ``functions.text.fingerprint`` (md5 of the
    comparator-normalized text) — the SAME fingerprint the batch
    ``exact_duplicates`` operator groups on, so batch and stream agree on
    what "duplicate" means.  The fingerprint column is internal and
    dropped from the output."""
    fp = fingerprint(F.coalesce(F.col(text_col), F.lit("")))
    return (
        stream.withColumn("_fp", fp)
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
