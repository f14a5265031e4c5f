"""Exact-substring duplicate-span detection (operators/dedup.py
duplicate_spans — Lee et al. 2022 arXiv:2107.06499 reformulated as
positional k-gram fingerprints + gaps-and-islands merge).

Hand-built corpus with KNOWN duplicated substrings so every assertion is
a closed-form expectation, not a re-implementation of the operator."""

from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
    duplicate_span_stats,
    duplicate_spans,
)

K = 4

# words 1..12 of A and B share a 12-word prefix; C is unique; D repeats
# its own 4-gram twice (intra-doc dup); E is shorter than K words.
SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
DOCS = [
    (1, SHARED + " one uniqueword1 tailA tailB"),
    (2, SHARED + " two uniqueword2 tailC tailD"),
    (3, "completely different words nothing shared here at all ever"),
    (4, "x1 rep1 rep2 rep3 rep4 x2 x3 rep1 rep2 rep3 rep4 x4"),
    (5, "too short"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_shared_prefix_merges_to_one_maximal_span(spark):
    spans = {
        r.id: (r.span_start, r.span_end)
        for r in duplicate_spans(_df(spark), "doc_id", "text", k=K)
        .filter("id in (1, 2)")
        .collect()
    }
    # stride-1 windows 1..9 are all duplicated (shared 12-word prefix),
    # windows merge into ONE maximal span covering words 1..12
    assert spans == {1: (1, 13), 2: (1, 13)}


def test_unique_and_short_docs_emit_nothing(spark):
    got = duplicate_spans(_df(spark), "doc_id", "text", k=K).filter(
        "id in (3, 5)"
    )
    assert got.count() == 0


def test_intra_doc_repeat_counts_as_duplicate(spark):
    rows = (
        duplicate_spans(_df(spark), "doc_id", "text", k=K)
        .filter("id = 4")
        .orderBy("span_start")
        .collect()
    )
    # "rep1 rep2 rep3 rep4" occurs at words 2..5 and 8..11: two maximal
    # spans (gap of x2 x3 between them keeps them separate)
    assert [(r.span_start, r.span_end) for r in rows] == [(2, 6), (8, 12)]


def test_stats_rollup(spark):
    stats = {
        r.id: (r.n_dup_spans, r.dup_words, r.first_dup_start)
        for r in duplicate_span_stats(_df(spark), "doc_id", "text", k=K).collect()
    }
    assert stats == {
        1: (1, 12, 1),
        2: (1, 12, 1),
        4: (2, 8, 2),
    }


def test_adjacent_windows_merge_not_just_overlapping(spark):
    # doc 10 carries "a1..a4" and "b1..b4" back-to-back; doc 11 carries the
    # same two 4-grams separated by filler.  In doc 10 the duplicated
    # windows are [1,5) and [5,9) — ADJACENT, zero overlap — and must merge
    # (start == prev_end is not a gap); in doc 11 they are [2,6) and [7,11)
    # with a real gap, so they stay two spans.  The bridging windows
    # ("a3 a4 b1 b2" vs "a4 q b1 b2") differ between docs, so only the two
    # 4-grams themselves are duplicated.
    docs = [
        (10, "a1 a2 a3 a4 b1 b2 b3 b4"),
        (11, "z0 a1 a2 a3 a4 q0 b1 b2 b3 b4"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = duplicate_spans(df, "doc_id", "text", k=K).collect()
    assert {(r.id, r.span_start, r.span_end) for r in rows} == {
        (10, 1, 9),
        (11, 2, 6),
        (11, 7, 11),
    }


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantee + degenerate cases: any shared substring of
    length >= w + k - 1 yields a shared selected fingerprint; short and
    empty docs degrade to global-min / empty selections."""
    from pyspark.sql import Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "the common passage lives here"  # len 29 >= w+k-1 = 8
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"prefix one {shared} suffix alpha"),
            Row(doc_id=1, text=f"other start {shared} different end"),
            Row(doc_id=2, text="tiny"),  # < k chars -> no k-grams
            Row(doc_id=3, text="sixchr"),  # 2 k-grams < w -> global min
            Row(doc_id=4, text=None),
        ]
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(df, "doc_id", "text").collect()}
    assert rows[2]["n_kgrams"] == 0 and rows[2]["n_selected"] == 0
    assert rows[3]["n_kgrams"] == 2 and rows[3]["n_selected"] == 1
    assert rows[4]["n_kgrams"] == 0
    # the digest summarizes the set; verify overlap via the full sets
    from pyspark.sql import functions as F
    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        shingle_hash32,
    )

    def selected_set(text):
        one = spark.createDataFrame([Row(doc_id=0, text=text)])
        t = F.coalesce(F.col("text"), F.lit(""))
        m = F.length(t) - F.lit(4)
        hashes = F.transform(
            F.sequence(F.lit(1), m), lambda i: shingle_hash32(F.substring(t, i, 5))
        )
        sel = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m - F.lit(3)),
                lambda j: F.array_min(F.slice(hashes, j, 4)),
            )
        )
        return set(one.select(sel.alias("s")).collect()[0]["s"])

    s0 = selected_set(f"prefix one {shared} suffix alpha")
    s1 = selected_set(f"other start {shared} different end")
    assert s0 & s1, "shared >= w+k-1 substring must share a fingerprint"


def test_cdc_chunks_tiling_and_shift_resistance(spark):
    """CDC invariants: chunks tile the text exactly, fingerprints match
    the substring md5, min_len gates boundaries, and a front insertion
    preserves later chunk fingerprints (the property fixed windows lack)."""
    import hashlib

    from pyspark.sql import Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        cdc_chunks,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = {0: base, 1: "", 2: "tiny", 3: "INSERTED PREFIX!! " + base}
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    rows = cdc_chunks(df, "doc_id", "text", min_len=16).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by  # empty doc -> no chunks
    for did, t in texts.items():
        if not t:
            continue
        ch = sorted(by[did], key=lambda r: r["chunk_idx"])
        pos = 0
        for j, r in enumerate(ch):
            assert r["chunk_idx"] == j and r["start"] == pos
            pos += r["chunk_len"]
            frag = t[r["start"] : r["start"] + r["chunk_len"]]
            assert hashlib.md5(frag.encode()).hexdigest() == r["chunk_fp"]
            if j < len(ch) - 1:  # all but the tail respect min_len
                assert r["chunk_len"] >= 16
        assert pos == len(t)
    fps0 = {r["chunk_fp"] for r in by[0]}
    fps3 = {r["chunk_fp"] for r in by[3]}
    assert fps0 & fps3, "front insertion must preserve later chunk fps"
