"""LLM-output JSON extraction: find the JSON payload inside free text.

Reference semantics (``lib/idp_common_pkg/idp_common/utils/__init__.py:98-235``
``extract_json_from_text``): a 4-strategy ladder —

1. ```json fenced code block
2. any ``` fenced block that parses as JSON
3. first balanced ``{...}`` object found by brace matching (string- and
   escape-aware)
4. the whole text if it parses

plus format detection (``:405-490``): 'json' / 'yaml' / 'text', and the
YAML twin (``extract_yaml_from_text``, reference ``:260-402``) — fenced
``yaml`` block first, then any fenced block, then the whole text; parsed
values are re-serialized to the same compact canonical JSON the JSON
sniffer emits (guarded import: degrades to None if pyyaml is absent).

Pure-Python kernel; Spark wiring in ``operators/transforms.py``.
"""

from __future__ import annotations

import json
import re
from typing import Optional, Tuple

_FENCE_JSON = re.compile(r"```json\s*\n(.*?)```", re.DOTALL | re.IGNORECASE)
_FENCE_ANY = re.compile(r"```(?:[a-zA-Z0-9_-]*)\s*\n(.*?)```", re.DOTALL)
_YAMLISH = re.compile(r"^\s*[A-Za-z_][A-Za-z0-9_]*\s*:\s+\S", re.MULTILINE)


def _try_parse(s: str) -> Optional[str]:
    """Return canonical JSON (sorted keys OFF — preserve order, compact
    separators) if s parses as a JSON object/array, else None."""
    s = s.strip()
    if not s:
        return None
    try:
        obj = json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return None
    if isinstance(obj, (dict, list)):
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
    return None


def first_balanced_object(text: str) -> Optional[str]:
    """First balanced {...} via string-aware brace scan (strategy 3)."""
    start = text.find("{")
    while start != -1:
        depth = 0
        in_str = False
        esc = False
        for i in range(start, len(text)):
            c = text[i]
            if esc:
                esc = False
                continue
            if c == "\\":
                esc = in_str
                continue
            if c == '"':
                in_str = not in_str
                continue
            if in_str:
                continue
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    cand = text[start : i + 1]
                    parsed = _try_parse(cand)
                    if parsed is not None:
                        return parsed
                    break
        start = text.find("{", start + 1)
    return None


def extract_json_from_text(text: Optional[str]) -> Optional[str]:
    """4-strategy JSON sniffing; returns compact canonical JSON or None."""
    if not text:
        return None
    m = _FENCE_JSON.search(text)
    if m:
        parsed = _try_parse(m.group(1))
        if parsed is not None:
            return parsed
    for m in _FENCE_ANY.finditer(text):
        parsed = _try_parse(m.group(1))
        if parsed is not None:
            return parsed
    parsed = first_balanced_object(text)
    if parsed is not None:
        return parsed
    return _try_parse(text)


_FENCE_YAML = re.compile(r"```ya?ml\s*\n(.*?)```", re.DOTALL | re.IGNORECASE)


def _try_parse_yaml(s: str) -> Optional[str]:
    """Canonical compact JSON if s parses as a YAML mapping/sequence."""
    try:
        import yaml
    except ImportError:  # pragma: no cover - pyyaml present in this env
        return None
    s = s.strip()
    if not s:
        return None
    try:
        obj = yaml.safe_load(s)
    except yaml.YAMLError:
        return None
    if isinstance(obj, (dict, list)):
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False, default=str)
    return None


def extract_yaml_from_text(text: Optional[str]) -> Optional[str]:
    """YAML twin of the 4-strategy sniffer (utils/__init__.py:260-402):
    ```yaml fenced block → any fenced block → whole text; returns compact
    canonical JSON of the parsed document (comparable with the JSON path)
    or None."""
    if not text:
        return None
    m = _FENCE_YAML.search(text)
    if m:
        parsed = _try_parse_yaml(m.group(1))
        if parsed is not None:
            return parsed
    for m in _FENCE_ANY.finditer(text):
        parsed = _try_parse_yaml(m.group(1))
        if parsed is not None:
            return parsed
    return _try_parse_yaml(text)


def detect_format(text: Optional[str]) -> str:
    """'json' | 'yaml' | 'text' (utils/__init__.py:405-490 analog)."""
    if not text or not text.strip():
        return "text"
    if _try_parse(text) is not None or extract_json_from_text(text) is not None:
        return "json"
    if _YAMLISH.search(text):
        return "yaml"
    return "text"


def sniff(text: Optional[str]) -> Tuple[Optional[str], str]:
    return extract_json_from_text(text), detect_format(text)
