"""Jaro-Winkler kernel vs textbook/DuckDB values; blocked record-linkage
operator shape and determinism."""

from __future__ import annotations

import duckdb
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
    jaro_similarity,
    jaro_winkler,
)


@pytest.fixture(scope="module")
def spark():
    from accelerated_intelligent_document_processing_on_aws_spark import get_spark

    yield get_spark(master="local[4]", shuffle_partitions=8)


PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("abc", "abc"),
    ("", "abc"),
    ("duane", "dwayne"),
    ("abcdxxxxxx", "abcdyyyyyy"),  # jaro 0.6 <= 0.7: boost must NOT apply
    ("abcdefgh", "abcdefgz"),      # prefix cap at 4
    ("blue anvil", "blue bolt"),
]


def test_jaro_winkler_matches_duckdb_bit_for_bit():
    """Independent implementations agree to the last ulp — the property
    that makes DuckDB's native function a differential oracle."""
    con = duckdb.connect()
    for a, b in PAIRS:
        want_jw, want_j = con.execute(
            "SELECT jaro_winkler_similarity(?, ?), jaro_similarity(?, ?)",
            [a, b, a, b],
        ).fetchone()
        assert jaro_winkler(a, b) == want_jw, (a, b)
        assert jaro_similarity(a, b) == want_j, (a, b)


def test_jaro_winkler_textbook_values():
    assert jaro_similarity("martha", "marhta") == pytest.approx(17 / 18)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332)


def test_record_linkage_blocked_pairs(spark):
    """Only same-block pairs appear, all above threshold, canonical order,
    deterministic across runs."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.linkage import (
        record_linkage,
    )

    df = spark.createDataFrame(
        [
            (1, "blue anvil"),
            (2, "blue anvill"),
            (3, "blue bolt"),
            (4, "red anvil"),      # different block than the blues
            (5, "blue anvil"),     # exact dup collapses in distinct
        ],
        ["id", "name"],
    )
    got = record_linkage(df, "name", threshold=0.8).collect()
    pairs = {(r.name_a, r.name_b): r.jw for r in got}
    assert ("blue anvil", "blue anvill") in pairs
    assert pairs[("blue anvil", "blue anvill")] >= 0.95
    assert all(a.split(" ")[0] == b.split(" ")[0] for a, b in pairs)
    assert all(a < b for a, b in pairs)
    assert not any("red" in a for a, _ in pairs)
    again = {(r.name_a, r.name_b): r.jw for r in record_linkage(df, "name", threshold=0.8).collect()}
    assert again == pairs


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.text(alphabet="abcdef gh", min_size=0, max_size=24)


@settings(max_examples=300, deadline=None)
@given(_words, _words)
def test_jaro_winkler_differential_vs_duckdb(a, b):
    """Property-based differential: our implementation equals DuckDB's
    native one on arbitrary strings (shared alphabet stresses the match
    window and transposition paths)."""
    con = duckdb.connect()
    want = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert jaro_winkler(a, b) == want, (a, b)


def _nw_brute(a, b, match=2, mismatch=-1, gap=-1):
    """Exponential reference: best score over all alignments by plain
    recursion (only for tiny inputs)."""
    import functools

    @functools.lru_cache(maxsize=None)
    def go(i, j):
        if i == len(a):
            return (len(b) - j) * gap
        if j == len(b):
            return (len(a) - i) * gap
        s = match if a[i] == b[j] else mismatch
        return max(go(i + 1, j + 1) + s, go(i + 1, j) + gap, go(i, j + 1) + gap)

    return go(0, 0)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abc"), max_size=7),
    st.lists(st.sampled_from("abc"), max_size=7),
)
def test_nw_score_matches_bruteforce(a, b):
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
        nw_score,
    )

    assert nw_score(a, b) == _nw_brute(tuple(a), tuple(b))
