"""Config-driven regex page/turn classification.

Deterministic replacement for the reference's Bedrock/UDOP page classifiers
(``classification/service.py:1008-1339``), using its own regex short-circuit
path as the model: per-class compiled ``document_page_content_regex``
searched against the page text, first match wins
(``classification/models.py:36-68``, ``classification/service.py:570-596``).

The class list is a small ordered config (broadcast to executors when used
from Spark); ``classify_text`` is the pure kernel, and
``functions/text.py::turn_class_col`` generates the equivalent pure-Catalyst
``rlike`` cascade so classification normally never leaves the JVM.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

# Ordered (class_name, content_regex); first match wins; None regex = fallback.
DEFAULT_CLASSES: List[Tuple[str, Optional[str]]] = [
    ("report", r"QUARTERLY REPORT|BALANCE SHEET|ANNUAL REPORT"),
    ("invoice", r"INVOICE|AMOUNT DUE|BILL TO"),
    ("letter", r"DEAR\s+[A-Z]|SINCERELY|REGARDS,"),
    ("chat", None),
]


class Classifier:
    def __init__(self, classes: List[Tuple[str, Optional[str]]] = None):
        self.classes = classes or DEFAULT_CLASSES
        self._compiled = [
            (name, re.compile(rx) if rx else None) for name, rx in self.classes
        ]
        self.fallback = next(
            (name for name, rx in self.classes if rx is None), "unknown"
        )

    def classify_text(self, text: str) -> str:
        if text:
            for name, rx in self._compiled:
                if rx is not None and rx.search(text):
                    return name
        return self.fallback


_DEFAULT = Classifier()


def classify_text(text: str) -> str:
    return _DEFAULT.classify_text(text)
