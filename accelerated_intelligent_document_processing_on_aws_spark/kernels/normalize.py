"""OCR-text normalization kernels.

Semantics modeled on the reference pipeline's Textract-parse fallback ladder
(reference: ``lib/idp_common_pkg/idp_common/ocr/service.py:1558-1630``
``_parse_textract_response`` — LINE-block join with ``"\\n"``) and the
evaluation comparator's whitespace/punctuation normalization
(``lib/idp_common_pkg/idp_common/evaluation/comparator.py:86-101``).

These are PURE functions over Python strings / pandas Series — no Spark
imports.  They are wired into Spark via Arrow-batched pandas UDFs in
``operators/extract.py`` and as pure-Catalyst expression twins in
``functions/text.py`` (the Catalyst twin is used whenever the semantics fit a
built-in expression so the hot path stays inside whole-stage codegen).

Span contract (stricter than the reference, which re-serializes text and
keeps no offsets — ``ocr/service.py:1630``): every emitted span carries
``(span_id, kind, start, end, text)`` where ``start:end`` index into the
ORIGINAL ``text`` value of the turn and ``text == original[start:end]``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

# A span is (span_id, kind, start, end, text).
Span = Tuple[int, str, int, int, str]

_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)


def collapse_ws(s: str) -> str:
    """Whitespace-collapse + strip (comparator.py:97-100 semantics).

    ``" ".join(s.split())`` is the C-level equivalent of
    ``_WS_RUN.sub(" ", s).strip()`` (str.split with no separator splits on
    Unicode whitespace runs and drops leading/trailing) and measured ~3x
    faster in the extraction hot loop."""
    return " ".join(s.split())


def normalize_for_compare(s: str) -> str:
    """EXACT-comparator canonical form: strip punctuation, collapse
    whitespace, lowercase (comparator.py:86-101)."""
    return collapse_ws(_PUNCT.sub("", s)).lower()


def normalize_plain(text: str, base: int = 0) -> Tuple[str, List[Span]]:
    """Normalize a plain-text payload.

    Reference semantics: the final fallback of ``_parse_textract_response``
    joins LINE texts with ``"\\n"``; for raw text the synthetic-block path
    (``ocr/service.py:1760-1793``) keeps non-empty lines.  So: split into
    lines, strip each line, drop empty lines, join with ``"\\n"``.

    Offsets point at the *stripped* line inside the original string.
    """
    spans: List[Span] = []
    out_lines: List[str] = []
    pos = 0
    sid = 0
    # one C-level split + cumulative offsets instead of a find() loop
    for raw in text.split("\n"):
        stripped = raw.strip()
        if stripped:
            s0 = base + pos + (len(raw) - len(raw.lstrip()))
            spans.append((sid, "ocr_line", s0, s0 + len(stripped), stripped))
            out_lines.append(stripped)
            sid += 1
        pos += len(raw) + 1
    return "\n".join(out_lines), spans
