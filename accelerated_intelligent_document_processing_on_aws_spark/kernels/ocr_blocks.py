"""Textract-shaped OCR block parsing.

Reference semantics (``lib/idp_common_pkg/idp_common/ocr/service.py``):

* ``_parse_textract_response`` (:1558-1630): filter blocks with
  ``BlockType == "LINE"`` and join their ``Text`` with ``"\\n"`` (the
  no-textractor fallback path, which is the deterministic one we pin).
* ``_generate_text_confidence`` (:1516-1556): LINE blocks rendered as a
  markdown two-column table ``| Text | Confidence |``, pipe characters in
  text escaped as ``\\|``, confidence rounded to 1 decimal, and
  ``(HANDWRITING)`` appended for handwritten TextType.
* Synthetic block construction from plain text (:1760-1793): non-empty
  lines become ``{"BlockType": "LINE", "Text": line, "Confidence": 99.0}``.

Pure-Python kernel; Spark wiring lives in ``operators/extract.py``.  A
pure-Catalyst twin of the LINE-join path (``from_json`` → ``filter`` →
``transform`` → ``array_join``) is in ``functions/text.py``.
"""

from __future__ import annotations

import json
from typing import List, Tuple

from .normalize import Span


def parse_blocks_json(payload: str) -> list:
    """Parse a ``{"Blocks": [...]}`` JSON payload; [] on any error."""
    try:
        obj = json.loads(payload)
    except (ValueError, TypeError):
        return []
    blocks = obj.get("Blocks") if isinstance(obj, dict) else None
    return blocks if isinstance(blocks, list) else []


def extract_lines(payload: str, base: int = 0) -> Tuple[str, List[Span]]:
    """LINE-filter → "\\n"-join, with span offsets into the original JSON
    string (each LINE's Text located as a substring, scanning forward so
    duplicate lines map to successive occurrences)."""
    blocks = parse_blocks_json(payload)
    texts: List[str] = []
    spans: List[Span] = []
    cursor = 0
    sid = 0
    for b in blocks:
        if not isinstance(b, dict) or b.get("BlockType") != "LINE":
            continue
        t = b.get("Text")
        if not isinstance(t, str) or t == "":
            continue
        texts.append(t)
        idx = payload.find(t, cursor)
        if idx >= 0:
            spans.append((sid, "ocr_line", base + idx, base + idx + len(t), t))
            cursor = idx + len(t)
        else:
            # not literally findable (JSON escapes) — zero-width span with
            # empty text, upholding the span contract
            # ``text == original[start:end]`` (the line text still reaches
            # the output through the extracted_text join)
            spans.append((sid, "ocr_line", base, base, ""))
        sid += 1
    return "\n".join(texts), spans


def text_confidence_table(payload: str) -> str:
    """Markdown ``| Text | Confidence |`` table (ocr/service.py:1516-1556)."""
    blocks = parse_blocks_json(payload)
    rows = ["| Text | Confidence |", "|------|------------|"]
    for b in blocks:
        if not isinstance(b, dict) or b.get("BlockType") != "LINE":
            continue
        t = b.get("Text")
        if not isinstance(t, str):
            continue
        conf = b.get("Confidence", 0.0)
        try:
            conf = round(float(conf), 1)
        except (TypeError, ValueError):
            conf = 0.0
        esc = t.replace("|", "\\|")
        tag = " (HANDWRITING)" if b.get("TextType") == "HANDWRITING" else ""
        rows.append(f"| {esc}{tag} | {conf} |")
    return "\n".join(rows)


def synthetic_blocks(text: str, confidence: float = 99.0) -> str:
    """Plain text → synthetic LINE blocks JSON (ocr/service.py:1760-1793)."""
    blocks = [
        {"BlockType": "LINE", "Text": ln.strip(), "Confidence": confidence}
        for ln in text.split("\n")
        if ln.strip()
    ]
    return json.dumps({"Blocks": blocks})
