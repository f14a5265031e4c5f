"""Regenerate the committed golden extraction fixture.

Run ONLY when the extraction semantics deliberately change:

    python scripts/regen_golden.py

Writes tests/golden/extraction_tiny.json — per-turn extracted text, spans,
class, boundary, and section id for the seeded tiny transcripts table,
computed by the PURE-PYTHON kernels (no Spark).  tests/test_golden.py then
asserts the Spark pipeline reproduces it byte-exactly (SURVEY.md §5:
golden-file tests with EXACT/byte comparator semantics).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (  # noqa: E402
    gen_transcripts_pdf,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.classify import (  # noqa: E402
    classify_text,
)
from accelerated_intelligent_document_processing_on_aws_spark.kernels.extract import (  # noqa: E402
    extract_turn,
)

GOLDEN_GEN = dict(n_convs=25, mean_turns=6, skew_convs=2, skew_factor=8)
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "extraction_tiny.json")


def build() -> list:
    pdf = gen_transcripts_pdf(**GOLDEN_GEN)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rows = []
    section_state = {}
    for r in pdf.itertuples():
        text, spans, kinds, boundary = extract_turn(r.text)
        cls = classify_text(text)
        sid, prev = section_state.get(r.conv_id, (-1, None))
        if prev is None or cls != prev or boundary:
            sid += 1
        section_state[r.conv_id] = (sid, cls)
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": int(r.turn_idx),
                "extracted_text": text,
                "spans": [list(s) for s in spans],
                "payload_kinds": kinds,
                "is_boundary": bool(boundary),
                "turn_class": cls,
                "section_id": sid,
            }
        )
    return rows


if __name__ == "__main__":
    rows = build()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(rows, fh, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(rows)} golden rows to {OUT}")
