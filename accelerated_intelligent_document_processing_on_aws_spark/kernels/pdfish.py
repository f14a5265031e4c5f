"""PDF layout-block parsing over tagged text payloads.

Analog of the reference's markdown/page layout pipeline
(``lib/idp_common_pkg/idp_common/ocr/document_converter.py:1149-1397``
``_convert_markdown_to_pages`` / ``_analyze_table_structure`` /
``_ensure_table_headers``): the reference converts office/markdown input to
layout "pages" of headings, paragraphs and tables; we parse the synthetic
layout-tag dialect defined in FIXTURES.md §1.4:

    [H1] Title line          -> markdown heading  "# Title line"
    [H2]..[H6]               -> "## .." etc.
    [P] paragraph text       -> plain paragraph text
    [TR] cell|cell|cell      -> markdown table row "| cell | cell | cell |"
    [PB]                     -> page break (dropped from extracted text)

The first [TR] of a run is treated as the header row and a separator row is
synthesized below it (``_ensure_table_headers`` document_converter.py:1369).
Unknown/untagged lines are paragraphs.  Span kinds: heading / content /
table; offsets cover the payload text AFTER the tag (the visible text) in
the original string.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .normalize import Span

_TAG_LINE = re.compile(r"^\[(H[1-6]|P|TR|PB)\]\s?")


def extract_layout(text: str, base: int = 0) -> Tuple[str, List[Span]]:
    out: List[str] = []
    spans: List[Span] = []
    sid = 0
    in_table = False
    pos = 0
    # one C-level split + cumulative offsets instead of a find() loop
    for raw in text.split("\n"):
        m = _TAG_LINE.match(raw)
        tag = m.group(1) if m else None
        body_off = m.end() if m else 0
        rest = raw[body_off:]
        body = rest.strip()
        lstrip = len(rest) - len(rest.lstrip())
        s0 = base + pos + body_off + lstrip
        s1 = s0 + len(body)

        if tag == "PB":
            in_table = False
        elif tag and tag.startswith("H"):
            in_table = False
            if body:
                level = int(tag[1])
                out.append("#" * level + " " + body)
                spans.append((sid, "heading", s0, s1, body))
                sid += 1
        elif tag == "TR":
            cells = [c.strip() for c in body.split("|")]
            row = "| " + " | ".join(cells) + " |"
            if not in_table:
                out.append(row)
                out.append("|" + "---|" * len(cells))
                in_table = True
            else:
                out.append(row)
            if body:
                spans.append((sid, "table", s0, s1, body))
                sid += 1
        else:  # [P] or untagged
            in_table = False
            if body:
                out.append(body)
                spans.append((sid, "content", s0, s1, body))
                sid += 1
        pos += len(raw) + 1
    return "\n".join(out), spans
