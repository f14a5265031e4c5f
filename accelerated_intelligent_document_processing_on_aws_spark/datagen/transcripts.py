"""Deterministic synthetic transcripts generator (seed=42, no external data).

Produces the input table mandated by BASELINE.json's input_hint:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` with embedded extraction payloads per FIXTURES.md §1:
plain / ocr_blocks / html / pdfish / mixed, a skew tail of long
conversations, and occasional ``<<DOC>>`` boundary markers.

Pure numpy/pandas so the same rows are generated on the driver for golden
tests and inside benchmarks; Spark ingestion is just
``spark.createDataFrame(gen_transcripts_pdf(...))`` or a parquet round-trip
via ``write_transcripts``.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

SEED = 42
ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "browser", "python", "calculator"]
WORDS = (
    "the quick brown fox jumps over lazy dog invoice report balance sheet "
    "quarterly revenue total amount due spark window shuffle partition merge "
    "data table scan filter join agg stream batch row column key value hash"
).split()
PAYLOAD_KINDS = ["plain", "ocr_blocks", "html", "pdfish", "mixed"]
# cumulative weights for kind choice
_KIND_P = np.array([0.35, 0.20, 0.20, 0.15, 0.10])


def _words(rng: np.random.RandomState, n: int) -> str:
    return " ".join(rng.choice(WORDS, size=n))


def _gen_plain(rng) -> str:
    lines = []
    for _ in range(rng.randint(2, 7)):
        pad_l = " " * rng.randint(0, 4)
        pad_r = " " * rng.randint(0, 3)
        body = _words(rng, rng.randint(3, 10))
        if rng.rand() < 0.2:
            body = body.upper()
        lines.append(pad_l + body + pad_r)
        if rng.rand() < 0.3:
            lines.append(" " * rng.randint(0, 3))  # blank-ish line
    return "\n".join(lines)


def _gen_ocr_blocks(rng) -> str:
    blocks = []
    for _ in range(rng.randint(2, 8)):
        bt = "LINE" if rng.rand() < 0.8 else rng.choice(["WORD", "PAGE"])
        blocks.append(
            {
                "BlockType": bt,
                "Text": _words(rng, rng.randint(2, 8)),
                "Confidence": round(float(rng.uniform(55, 99.9)), 2),
                "TextType": "HANDWRITING" if rng.rand() < 0.15 else "PRINTED",
            }
        )
    return json.dumps({"Blocks": blocks})


def _gen_html(rng) -> str:
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.choice(WORDS, 4)
    )
    paras = []
    for _ in range(rng.randint(1, 4)):
        paras.append(f"<p>{_words(rng, rng.randint(6, 20))}</p>")
    linky = (
        f'<p>{_words(rng, 1)} <a href="#">{_words(rng, 6)}</a> '
        f'<a href="#">{_words(rng, 4)}</a></p>'
    )
    ad = f"<aside><p>{_words(rng, rng.randint(5, 12))}</p></aside>"
    footer = f"<footer><p>copyright {_words(rng, 3)}</p></footer>"
    title = _words(rng, rng.randint(2, 5)).upper() if rng.rand() < 0.4 else _words(rng, 3)
    return (
        f"<html><body><nav><ul>{nav_links}</ul></nav>"
        f"<h1>{title}</h1>"
        f'<div id="main">{"".join(paras)}{linky}</div>{ad}{footer}</body></html>'
    )


def _gen_pdfish(rng) -> str:
    lines = [f"[H1] {_words(rng, rng.randint(2, 5))}"]
    for _ in range(rng.randint(1, 3)):
        lines.append(f"[P] {_words(rng, rng.randint(5, 15))}")
    if rng.rand() < 0.6:
        ncols = rng.randint(2, 5)
        lines.append("[TR] " + "|".join(rng.choice(WORDS, ncols)))
        for _ in range(rng.randint(1, 4)):
            lines.append("[TR] " + "|".join(rng.choice(WORDS, ncols)))
    if rng.rand() < 0.3:
        lines.append("[PB]")
        lines.append(f"[H2] {_words(rng, 3)}")
        lines.append(f"[P] {_words(rng, rng.randint(5, 12))}")
    return "\n".join(lines)


_GENS = {
    "plain": _gen_plain,
    "ocr_blocks": _gen_ocr_blocks,
    "html": _gen_html,
    "pdfish": _gen_pdfish,
}


def _gen_payload(rng, kind: str) -> str:
    if kind == "mixed":
        parts = rng.choice(["plain", "ocr_blocks", "html", "pdfish"], size=rng.randint(2, 4), replace=False)
        return "\n-----\n".join(_GENS[k](rng) for k in parts)
    return _GENS[kind](rng)


def gen_transcripts_pdf(
    n_convs: int = 50,
    seed: int = SEED,
    mean_turns: int = 20,
    skew_convs: int = 1,
    skew_factor: int = 50,
    shuffle: bool = True,
) -> pd.DataFrame:
    """Generate the transcripts table as a pandas DataFrame.

    The first ``skew_convs`` conversations get ``skew_factor``× the mean
    turn count (the long-conversation skew tail the salted partitioning must
    defuse).  Rows are shuffled so stable-order windows are exercised.
    """
    rows = []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    for i in range(n_convs):
        rng = np.random.RandomState(seed + 1000 + i)
        conv_id = f"conv-{i:06d}"
        k = max(2, int(rng.poisson(mean_turns)))
        if i < skew_convs:
            k *= skew_factor
        for t in range(k):
            role = ROLES[t % len(ROLES)]
            kind = PAYLOAD_KINDS[int(rng.choice(len(PAYLOAD_KINDS), p=_KIND_P))]
            text = _gen_payload(rng, kind)
            if rng.rand() < 0.08:
                text = "<<DOC>>\n" + text
            tool = TOOLS[t % len(TOOLS)] if role == "tool" else None
            ts = base_ts + np.timedelta64(i * 86400 + t * 60, "s")
            rows.append((conv_id, np.int32(t), role, text, tool, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    if shuffle:
        perm = np.random.RandomState(seed).permutation(len(pdf))
        pdf = pdf.iloc[perm].reset_index(drop=True)
    return pdf


def transcripts_spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def gen_transcripts_df(spark, **kwargs):
    pdf = gen_transcripts_pdf(**kwargs)
    return spark.createDataFrame(pdf, schema=transcripts_spark_schema())


def write_transcripts(spark, path: str, **kwargs) -> None:
    gen_transcripts_df(spark, **kwargs).write.mode("overwrite").parquet(path)
