"""Config ingestion: the reference's primary user-extensibility surface.

The reference drives classification, extraction, and evaluation from a
YAML config document (shape: ``config_library/pattern-2/
bank-statement-sample/config.yaml:16-50`` — a ``classes`` list whose
entries carry ``name``, ``description``, optional per-class regex, and an
``attributes`` list with ``name`` / ``evaluation_method`` /
``evaluation_threshold``), parsed at ``extraction/service.py:72-120`` and
``classification/service.py`` into per-service dicts.

This module loads the same document shape (YAML via pyyaml when present,
JSON always) into the dict shapes the rebuild's operators already accept:

* ``classes_config``    → ordered ``[(class_name, regex | None)]`` for
  ``kernels/classify.Classifier`` / ``functions.text.turn_class_col``
  (regex key: ``document_page_content_regex``, the reference's
  classification short-circuit, ``classification/models.py:36-68``).
* ``attributes_config`` → ``{attr_name: extraction_regex}`` for
  ``operators/attributes.extract_section_attributes``.  When an attribute
  declares no explicit ``extraction_regex``, a deterministic
  name-derived pattern ``(?m)^name:\\s*([^\\n]+)`` is generated — the
  labeled-line convention the reference's prompts elicit.
* ``evaluation_config`` → ``{attr_name: method}`` for
  ``operators/evaluate.evaluate_attributes`` (plus per-attr thresholds
  via ``evaluation_thresholds``).

The loader is config-as-data only — no code paths are eval'd.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Tuple


def parse_config(text: str) -> dict:
    """Parse a config document: JSON first (always available), then YAML
    (pyyaml, present in this environment; import-gated)."""
    text = text.strip()
    try:
        obj = json.loads(text)
    except (ValueError, TypeError):
        obj = None
    if obj is None:
        try:
            import yaml

            obj = yaml.safe_load(text)
        except ImportError as exc:  # pragma: no cover - pyyaml baked in
            raise ValueError("config is not JSON and pyyaml is unavailable") from exc
    if not isinstance(obj, dict):
        raise ValueError(f"config document must be a mapping, got {type(obj).__name__}")
    return obj


def load_config(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as fh:
        return parse_config(fh.read())


def _classes(cfg: dict) -> List[dict]:
    classes = cfg.get("classes") or []
    if not isinstance(classes, list):
        raise ValueError("config 'classes' must be a list")
    return classes


def classes_config(cfg: dict) -> List[Tuple[str, Optional[str]]]:
    """Ordered (class_name, content_regex) pairs; first match wins, a
    regex-less class is the fallback (reference short-circuit order)."""
    return [
        (c["name"], c.get("document_page_content_regex")) for c in _classes(cfg)
    ]


def _attrs(cfg: dict, class_name: Optional[str]) -> List[dict]:
    out: List[dict] = []
    for c in _classes(cfg):
        if class_name is not None and c["name"] != class_name:
            continue
        for a in c.get("attributes") or []:
            out.append(a)
            # group / list attributes flatten to their leaves, the shape
            # the reference's evaluation walks (nested names stay unique
            # per the config contract)
            out.extend(a.get("groupAttributes") or [])
            out.extend((a.get("listItemTemplate") or {}).get("itemAttributes") or [])
    return out


def _derived_regex(name: str) -> str:
    return r"(?m)^" + re.escape(name) + r":[ \t]*([^\n]+)"


def attributes_config(cfg: dict, class_name: Optional[str] = None) -> Dict[str, str]:
    """{attr: regex} for the deterministic extraction twin; explicit
    ``extraction_regex`` wins, else the labeled-line derived pattern."""
    out: Dict[str, str] = {}
    for a in _attrs(cfg, class_name):
        if "groupAttributes" in a or "listItemTemplate" in a:
            continue  # containers themselves carry no value
        out[a["name"]] = a.get("extraction_regex") or _derived_regex(a["name"])
    return out


def evaluation_config(cfg: dict, class_name: Optional[str] = None) -> Dict[str, str]:
    """{attr: evaluation_method} (EXACT/FUZZY/NUMERIC_EXACT/SEMANTIC...)."""
    return {
        a["name"]: a["evaluation_method"]
        for a in _attrs(cfg, class_name)
        if a.get("evaluation_method")
    }


def evaluation_thresholds(
    cfg: dict, class_name: Optional[str] = None
) -> Dict[str, float]:
    """{attr: threshold} — reference stores thresholds as strings
    ('0.8'); parse leniently, skip absent/invalid."""
    out: Dict[str, float] = {}
    for a in _attrs(cfg, class_name):
        t = a.get("evaluation_threshold")
        if t is None:
            continue
        try:
            out[a["name"]] = float(t)
        except (TypeError, ValueError):
            continue
    return out
