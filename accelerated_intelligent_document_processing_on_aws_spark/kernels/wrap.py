"""Monospace text wrap + pagination (P4).

Reference semantics (``ocr/document_converter.py:38-111``): wrap text at a
fixed character width (word-aware: break at spaces, hard-split words longer
than the width), then chunk lines into pages of ``lines_per_page``.
Deterministic given the font constants; page count drives the synthetic
page explode (S3/S4 analog).
"""

from __future__ import annotations

from typing import List


def wrap_line(line: str, width: int) -> List[str]:
    """Word-aware wrap of one logical line; hard-splits oversized words."""
    if not line:
        return [""]
    out: List[str] = []
    cur = ""
    for word in line.split(" "):
        while len(word) > width:
            if cur:
                out.append(cur)
                cur = ""
            out.append(word[:width])
            word = word[width:]
        if not cur:
            cur = word
        elif len(cur) + 1 + len(word) <= width:
            cur = f"{cur} {word}"
        else:
            out.append(cur)
            cur = word
    out.append(cur)
    return out


def wrap_text(text: str, width: int = 80) -> List[str]:
    lines: List[str] = []
    for raw in (text or "").split("\n"):
        lines.extend(wrap_line(raw, width))
    return lines


def paginate(text: str, width: int = 80, lines_per_page: int = 50) -> List[str]:
    """Wrap then chunk into page strings (document_converter.py:38-111)."""
    lines = wrap_text(text, width)
    return [
        "\n".join(lines[i : i + lines_per_page])
        for i in range(0, len(lines), lines_per_page)
    ] or [""]
