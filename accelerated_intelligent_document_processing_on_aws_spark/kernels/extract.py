"""Per-turn main-content extraction dispatcher.

Mirrors the reference's file-type sniffing + per-type parse dispatch
(``lib/idp_common_pkg/idp_common/ocr/service.py:1632-1678`` magic-byte
detection; ``:1680-1728`` per-type conversion) over the payload dialects the
transcripts table embeds (FIXTURES.md §1):

    ocr_blocks  JSON starting with '{' containing a "Blocks" list
    html        contains an html-ish opening tag
    pdfish      first tagged line matches ^\\[(H[1-6]|P|TR|PB)\\]
    plain       everything else
    mixed       segments separated by a line of exactly '-----'
                (each segment re-detected and extracted independently;
                extracted texts joined with '\\n')

Boundary marker: a turn whose text starts with '<<DOC>>' opens a new
document section (BIO 'start' tag analog,
``classification/service.py:1604-1616``).  The marker itself is not part of
any payload.

This module is pure Python/pandas — Spark wiring in ``operators/extract.py``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from . import html_main, ocr_blocks, pdfish
from .normalize import Span, normalize_plain

DOC_BOUNDARY = "<<DOC>>"
SEGMENT_SEP = "-----"

_HTML_HINT = re.compile(r"<(?:html|body|div|p|nav|header|footer|aside|table|h[1-6]|ul|li)\b", re.IGNORECASE)
_PDFISH_HINT = re.compile(r"^\[(?:H[1-6]|P|TR|PB)\]", re.MULTILINE)


def detect_kind(payload: str) -> str:
    """File-type sniffing analog (ocr/service.py:1632-1678)."""
    stripped = payload.lstrip()
    if stripped.startswith("{") and '"Blocks"' in payload:
        return "ocr_blocks"
    if _HTML_HINT.search(payload):
        return "html"
    if _PDFISH_HINT.search(payload):
        return "pdfish"
    return "plain"


_EXTRACTORS = {
    "ocr_blocks": ocr_blocks.extract_lines,
    "html": html_main.extract_main,
    "pdfish": pdfish.extract_layout,
    "plain": normalize_plain,
}


def split_segments(text: str) -> List[Tuple[int, str]]:
    """Split on lines equal to SEGMENT_SEP; return (base_offset, segment)."""
    if SEGMENT_SEP not in text:  # overwhelmingly common: O(n) memchr scan
        return [(0, text)]
    segs: List[Tuple[int, str]] = []
    n = len(text)
    seg_start = 0
    pos = 0
    # one C-level split + cumulative offsets instead of a find() loop
    for ln in text.split("\n"):
        if ln.strip() == SEGMENT_SEP:
            segs.append((seg_start, text[seg_start:pos]))
            seg_start = min(pos + len(ln) + 1, n)
        pos += len(ln) + 1
    segs.append((seg_start, text[seg_start:]))
    return segs if len(segs) > 1 else [(0, text)]


def extract_turn(text: str):
    """Extract main content from one turn.

    Returns (extracted_text, spans, kinds, is_boundary) where ``spans`` is a
    list of (span_id, kind, start, end, text) with offsets into the ORIGINAL
    ``text`` argument, and ``kinds`` the list of detected payload kinds (one
    per segment).
    """
    if text is None:
        return "", [], [], False
    is_boundary = text.startswith(DOC_BOUNDARY)
    body_base = len(DOC_BOUNDARY) if is_boundary else 0
    body = text[body_base:]
    if is_boundary and body.startswith("\n"):
        body_base += 1
        body = body[1:]

    segs = split_segments(body)
    parts: List[str] = []
    spans: List[Span] = []
    kinds: List[str] = []
    sid = 0
    for off, seg in segs:
        if not seg.strip():
            continue
        kind = detect_kind(seg)
        kinds.append(kind)
        extracted, seg_spans = _EXTRACTORS[kind](seg, base=body_base + off)
        if extracted:
            parts.append(extracted)
        for (_sid, k, s, e, t) in seg_spans:
            spans.append((sid, k, s, e, t))
            sid += 1
    return "\n".join(parts), spans, kinds, is_boundary
