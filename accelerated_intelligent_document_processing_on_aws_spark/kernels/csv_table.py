"""CSV text → markdown table (P5).

Reference semantics (``ocr/document_converter.py:113-162`` enhanced path,
``:920-968`` / ``:1109-1147`` ``_format_csv_as_table`` basic fallback):
parse CSV rows, first row is the header, emit a pipe table with a ``---``
separator row; pipe characters in cells are escaped.  The reference's
pandas dtype-inference niceties (thousands separators etc.) are part of the
"enhanced" path it itself falls back from — the deterministic fallback is
the contract we pin.

stdlib ``csv`` (C-accelerated) per Arrow batch, not ``pandas.read_csv``
per document: at 100 TB the per-cell dtype inference is wasted work for a
markdown rendering.
"""

from __future__ import annotations

import csv
import io
from typing import List


def _esc(cell: str) -> str:
    return cell.replace("|", "\\|")


def csv_to_markdown(text: str) -> str:
    """CSV string → markdown pipe table ('' for empty input)."""
    if not text or not text.strip():
        return ""
    rows: List[List[str]] = [
        r for r in csv.reader(io.StringIO(text)) if any(c.strip() for c in r)
    ]
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    header, body = rows[0], rows[1:]
    out = [
        "| " + " | ".join(_esc(c.strip()) for c in header) + " |",
        "|" + "|".join([" --- "] * width) + "|",
    ]
    for r in body:
        out.append("| " + " | ".join(_esc(c.strip()) for c in r) + " |")
    return "\n".join(out)
