"""Config ingestion (reference config_library YAML shape → operator dicts)."""

from __future__ import annotations

import json

import pytest

from accelerated_intelligent_document_processing_on_aws_spark.config import (
    attributes_config,
    classes_config,
    evaluation_config,
    evaluation_thresholds,
    load_config,
    parse_config,
)

SAMPLE_YAML = """
notes: sample
classes:
  - name: statement
    description: monthly statement
    document_page_content_regex: "STATEMENT|BALANCE"
    attributes:
      - name: account
        description: account id
        evaluation_method: EXACT
      - name: period
        evaluation_method: FUZZY
        evaluation_threshold: '0.8'
      - name: address
        attributeType: group
        groupAttributes:
          - name: city
            evaluation_method: FUZZY
            evaluation_threshold: '0.9'
          - name: zip
            evaluation_method: EXACT
      - name: transactions
        listItemTemplate:
          itemAttributes:
            - name: amount
              evaluation_method: NUMERIC_EXACT
  - name: other
    attributes:
      - name: head
        extraction_regex: "^(\\\\w+)"
        evaluation_method: EXACT
"""


def test_yaml_and_json_parse_equivalently():
    cfg = parse_config(SAMPLE_YAML)
    cfg2 = parse_config(json.dumps(cfg))
    assert cfg == cfg2


def test_classes_ordered_with_fallback():
    cfg = parse_config(SAMPLE_YAML)
    assert classes_config(cfg) == [
        ("statement", "STATEMENT|BALANCE"),
        ("other", None),
    ]


def test_attributes_flatten_groups_and_lists():
    cfg = parse_config(SAMPLE_YAML)
    ac = attributes_config(cfg, "statement")
    # containers excluded, leaves flattened in
    assert set(ac) == {"account", "period", "city", "zip", "amount"}
    # derived labeled-line regex for attrs without extraction_regex
    assert ac["account"] == r"(?m)^account:[ \t]*([^\n]+)"
    # explicit regex wins
    assert attributes_config(cfg, "other")["head"] == r"^(\w+)"


def test_evaluation_config_and_thresholds():
    cfg = parse_config(SAMPLE_YAML)
    ev = evaluation_config(cfg)
    assert ev["account"] == "EXACT" and ev["amount"] == "NUMERIC_EXACT"
    th = evaluation_thresholds(cfg)
    assert th == {"period": 0.8, "city": 0.9}


def test_rejects_non_mapping():
    with pytest.raises(ValueError):
        parse_config("- just\n- a list\n")


def test_committed_fixture_loads():
    import __spark_entry__ as em

    cfg = load_config(em._CONFIG_FIXTURE)
    classes = classes_config(cfg)
    assert classes[-1] == ("misc", None)  # fallback class present
    assert attributes_config(cfg, "batchy")["row_total"].startswith(r"(?m)^row_total:")
    assert evaluation_config(cfg)["first_join"] == "EXACT"
