"""HTML boilerplate stripping — link/text-density main-content classifier.

The reference delegates "what is the real content of this page" to external
models (Textract LAYOUT / Bedrock, ``ocr/service.py:928-933``,
``classification/service.py:1008-1180``).  Our deterministic replacement is a
boilerpipe-style block classifier (Kohlschütter et al., WSDM 2010,
"Boilerplate Detection using Shallow Text Features" — public knowledge):

1. Segment the HTML into blocks at block-level tag boundaries.
2. Per block compute shallow features:
   * ``link_density``  = chars of anchor text / chars of text
   * ``word_count``
   * whether the block is inside a structural boilerplate region
     (``nav`` / ``header`` / ``footer`` / ``aside`` / ``script`` / ``style``)
3. A block is CONTENT iff it is not inside a structural region,
   ``link_density <= max_link_density`` and ``word_count >= min_words``.

Thresholds come from the rule config (FIXTURES.md §3: ``max_link_density``
default 0.33, ``min_words`` default 4).  Pure Python over one string; Arrow
batching happens in the Spark wiring.

Span offsets index the ORIGINAL html string: a content span covers the
block's visible-text region (first to last text char of the block).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .normalize import Span, collapse_ws

BLOCK_TAGS = (
    "p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|table|tr|td|th|nav|header|footer|"
    "aside|article|section|main|body|html|head|title|script|style|blockquote|pre|br"
)
STRUCTURAL_BOILER = {"nav", "header", "footer", "aside", "script", "style", "head", "title"}

_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*)?)(/?)>")
# set membership beats a regex match in the per-tag hot loop (tag names are
# already lowercased before the check)
_BLOCK_TAG_SET = frozenset(BLOCK_TAGS.split("|"))
DEFAULT_MAX_LINK_DENSITY = 0.33
DEFAULT_MIN_WORDS = 4


class _Block:
    __slots__ = ("parts", "link_chars", "start", "end", "boiler_depth")

    def __init__(self, boiler_depth: int):
        self.parts: List[str] = []
        self.link_chars = 0
        self.start = -1
        self.end = -1
        self.boiler_depth = boiler_depth

    def text(self) -> str:
        return collapse_ws("".join(self.parts))


def segment_blocks(html: str):
    """Tokenize html into text blocks with link-char accounting.

    Returns a list of (text, link_density, word_count, start, end,
    in_boiler) tuples; start/end are offsets of the visible text region in
    the original string.
    """
    blocks: List[_Block] = []
    boiler_depth = 0
    anchor_depth = 0
    cur = _Block(0)
    pos = 0

    def flush():
        # append the finished block; caller recreates `cur` AFTER adjusting
        # boiler_depth so the next block sees the post-tag structural depth.
        # `start >= 0` ⟺ some visible (non-whitespace) run was added ⟺
        # text() would be non-empty — an O(1) test instead of collapsing
        # whitespace at every tag boundary (most inter-tag blocks are empty)
        if cur.start >= 0:
            blocks.append(cur)

    for m in _TAG.finditer(html):
        # text run before this tag
        run = html[pos : m.start()]
        if run:
            vis = run
            ls = vis.lstrip()
            if ls:
                rs = ls.rstrip()
                s = pos + (len(vis) - len(ls))
                if cur.start < 0:
                    cur.start = s
                cur.end = s + len(rs)
                cur.parts.append(vis)
            elif cur.parts:
                # interior whitespace-only run: keep as separator; a
                # LEADING ws-only run is dropped (collapse_ws strips it)
                cur.parts.append(vis)
            if anchor_depth > 0:
                cur.link_chars += len(collapse_ws(vis))
        pos = m.end()
        closing, name, _attrs, selfclose = m.groups()
        if not name.islower():  # C-level check beats an unconditional alloc
            name = name.lower()
        if name == "a":
            if closing:
                anchor_depth = max(0, anchor_depth - 1)
            elif not selfclose:
                anchor_depth += 1
            continue
        if name in _BLOCK_TAG_SET:
            if name in STRUCTURAL_BOILER:
                if closing:
                    boiler_depth = max(0, boiler_depth - 1)
                elif not selfclose and name != "br":
                    boiler_depth += 1
            if cur.start >= 0:
                blocks.append(cur)
                cur = _Block(boiler_depth)
            else:
                # reuse the empty block (the common inter-tag case —
                # ~35 allocations/doc otherwise); leading ws-only parts
                # were never appended, so clearing state is free
                if cur.parts:
                    cur.parts.clear()
                cur.link_chars = 0
                cur.boiler_depth = boiler_depth
    tail = html[pos:]
    if tail and tail.strip():
        s = pos + (len(tail) - len(tail.lstrip()))
        e = pos + len(tail.rstrip())
        if cur.start < 0:
            cur.start = s
        cur.end = e
        cur.parts.append(tail)
        if anchor_depth > 0:
            cur.link_chars += len(collapse_ws(tail))
    flush()

    out = []
    for b in blocks:
        t = b.text()
        n = len(t)
        ld = (b.link_chars / n) if n else 1.0
        wc = len(t.split())  # == len(_WORD.findall(t)) for \S+ runs, faster
        out.append((t, ld, wc, b.start, b.end, b.boiler_depth > 0))
    return out


def extract_main(
    html: str,
    base: int = 0,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    min_words: int = DEFAULT_MIN_WORDS,
) -> Tuple[str, List[Span]]:
    """Classify blocks → join content blocks with "\\n"; spans for both
    content and boilerplate blocks (kind ∈ {content, boilerplate})."""
    content: List[str] = []
    spans: List[Span] = []
    sid = 0
    for t, ld, wc, s, e, in_boiler in segment_blocks(html):
        is_content = (not in_boiler) and ld <= max_link_density and wc >= min_words
        kind = "content" if is_content else "boilerplate"
        spans.append((sid, kind, base + s, base + e, html[s:e]))
        sid += 1
        if is_content:
            content.append(t)
    return "\n".join(content), spans
