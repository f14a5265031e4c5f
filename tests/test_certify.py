"""Certification melt (certify.py): engine-identical long-format rules.

The oracle sweeps certify every real suite end-to-end; these unit tests
pin the melt CONTRACT itself — lane assignment, null tokens, signed-zero
collapse, schema-drift failure — against a handmade member on both
engines.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import certify


def test_kind_of_lanes():
    assert certify.kind_of("double") == "num"
    assert certify.kind_of("float") == "num"
    assert certify.kind_of("decimal(18,4)") == "num"
    for t in ("bigint", "int", "string", "boolean", "date", "void"):
        assert certify.kind_of(t) == "str", t


def test_parse_schema_roundtrip_and_validation():
    s = certify.parse_schema("a=num b=str")
    assert s == [("a", "num"), ("b", "str")]
    with pytest.raises(ValueError):
        certify.parse_schema("a=weird")


def test_melt_matches_duckdb_on_handmade_member(spark):
    """One member with every lane type: the Spark melt and the SQL melt
    must produce the identical multiset, including NULL tokens and the
    -0.0 collapse."""
    rows = [
        (1, 0.25, "x", True, None),
        (2, None, None, None, -0.0),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, score double, label string, flag boolean, z double"
    )
    schema = certify.melt_kinds(df.dtypes)
    assert dict(schema) == {
        "id": "str", "score": "num", "label": "str", "flag": "str", "z": "num"
    }
    melted = certify.melt_spark(df, "q_fake", schema).orderBy(
        "query", "metric", "value_num", "value_str"
    )
    got = [tuple(r) for r in melted.collect()]

    member_sql = (
        "SELECT * FROM (VALUES "
        "(1, 0.25, 'x', TRUE, NULL), "
        "(2, NULL, NULL, NULL, -0.0)"
        ") t(id, score, label, flag, z)"
    )
    sql = certify.suite_sql(
        ["q_fake"], {"q_fake": member_sql}, {"q_fake": "id=str score=num label=str flag=str z=num"}
    )
    want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert sorted(got) == sorted(want)
    # the -0.0 collapsed to +0.0 on both sides
    zrows = [r for r in got if r[1] == "z" and r[3] == ""]
    assert zrows and all(str(r[2]) == "0.0" for r in zrows)
    # NULLs became the token in the right lane
    assert ("q_fake", "label", 0.0, "null") in got
    assert ("q_fake", "score", 0.0, "null") in got


def test_melt_schema_drift_fails_loudly(spark):
    df = spark.createDataFrame([(1,)], "renamed bigint")
    with pytest.raises(ValueError, match="melt schema drift"):
        certify.melt_spark(df, "q_fake", [("id", "str")])


def test_registry_suites_cover_every_member_exactly_once():
    """No member in two suites, every suite member resolves to a callable
    and has a frozen melt schema and an oracle."""
    import __spark_entry__ as em

    seen = {}
    sqls = em._member_sql()
    for suite, members in em._SUITES.items():
        assert 2 <= len(members) <= 7, (suite, len(members))
        for m in members:
            assert m not in seen, f"{m} in both {seen.get(m)} and {suite}"
            seen[m] = suite
            assert callable(getattr(em, m)), m
            assert m in em._MELT_SCHEMAS, m
            assert m in sqls, m
    # and no suite member also holds its own registry slot
    reg = set(em._QUERIES_WINDOW_R5) | set(em._QUERIES_PAST_WINDOW)
    assert not (set(seen) & reg), sorted(set(seen) & reg)
