"""Data-layout operators: Z-order (Morton) interleaved clustering keys.

The lakehouse analog of Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort
orders: a space-filling-curve key that clusters rows so that a sort (or
range-partitioned write) by the single key gives file-level min/max
locality in EVERY participating dimension at once — the layout that
makes multi-dimensional predicate pruning work on 100 TB tables where
partitioning can only serve one dimension.

Everything here is a pure-Catalyst integer expression (shift/and/or on
longs — whole-stage codegen, no UDF): the key is computed in the write
pipeline at zero Python cost, and the same arithmetic is reproducible
in any engine, so Z-order outputs stay hash-certifiable against a SQL
oracle (``__spark_entry__.Q_ZORDER_SQL`` generates the identical bit
expression).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each (already-quantized,
    non-negative integer) column into one long: bit ``b`` of column
    ``i`` lands at position ``b * len(cols) + i``.

    Callers quantize first (:func:`quantize_mod` for exact integer
    dims, or a bounded-range bucketization for continuous ones) —
    quantization is the policy decision; the interleave is mechanical.
    ``bits * len(cols)`` must stay <= 63.  The expression is a flat
    OR-chain of ``bits x len(cols)`` shift/and terms: fully codegen'd,
    constant-folded where inputs are literals, and cheap relative to
    any write it precedes.
    """
    n = len(cols)
    if not (0 < bits * n <= 63):
        raise ValueError(f"bits*len(cols) must be in (0, 63], got {bits * n}")
    out = None
    for i, c in enumerate(cols):
        lc = c.cast("long")
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(lc, b).bitwiseAND(F.lit(1)), b * n + i
            )
            out = term if out is None else out.bitwiseOR(term)
    return out


def quantize_mod(c: Column, modulus: int) -> Column:
    """Exact integer quantization to ``[0, modulus)`` via ``pmod`` — the
    FP-free path for integer dimensions (ids, epoch seconds, bucket
    numbers), so the Z-key is bit-for-bit reproducible across engines.
    Continuous dimensions should instead bucket via an explicit
    ``floor((x - lo) / width)`` with literal bounds."""
    return F.pmod(c.cast("long"), F.lit(modulus))


def zonemap_stats(
    df,
    file_key: Column,
    value: Column,
    pred_lo: float,
    pred_hi: float,
):
    """Zone-map (min/max pruning) effectiveness audit: per candidate file/
    bucket, the value's min/max plus whether a ``[pred_lo, pred_hi]``
    range predicate could PRUNE that file without reading it — the design
    check behind choosing a clustering key (q_zorder's companion: z-order
    exists to make these min/max ranges narrow).  At 100 TB the same
    numbers come from parquet footer statistics; this computes them from
    the rows so layouts can be compared BEFORE a rewrite.

    Returns one row per file key: ``fk, n, vmin, vmax, pruned`` (pruned =
    the file's whole range falls outside the predicate) — metadata-sized
    output from ONE map-side-combined aggregate."""
    from pyspark.sql import functions as F  # noqa: F811 (module-level alias)

    return (
        df.select(file_key.alias("fk"), value.alias("v"))
        .groupBy("fk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .withColumn(
            "pruned",
            (F.col("vmax") < F.lit(pred_lo)) | (F.col("vmin") > F.lit(pred_hi)),
        )
    )
