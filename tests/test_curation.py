"""Unit tests for operators/curation.py (chunk dedup, decontamination,
repetition gate, PII redaction, sliding chunks, domain stats)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
    chunk_dedup,
    decontaminate,
    redact_pii,
    repetition_stats,
    sliding_chunks,
    url_domain_stats,
    word_chunks,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_word_chunks_short_and_empty(spark):
    d = _docs(spark, ["a b c", ""])
    rows = word_chunks(d, "doc_id", "text", 10).collect()
    got = {(r.doc_id, r.chunk_idx): r.chunk for r in rows}
    assert got == {(0, 0): "a b c", (1, 0): ""}


def test_chunk_dedup_keeps_first_occurrence_and_reassembles(spark):
    shared = " ".join(f"a{i}" for i in range(10))
    uniq1 = " ".join(f"b{i}" for i in range(10))
    uniq2 = " ".join(f"c{i}" for i in range(10))
    d = _docs(spark, [f"{shared} {uniq1}", f"{shared} {uniq2}"])
    out = {r.doc_id: r for r in chunk_dedup(d, "doc_id", "text", 10).collect()}
    assert out[0].total_chunks == 2 and out[0].kept_chunks == 2
    assert out[0].dedup_text == f"{shared} {uniq1}"
    # doc 1 loses the shared chunk (doc 0 saw it first) but keeps order
    assert out[1].total_chunks == 2 and out[1].kept_chunks == 1
    assert out[1].dedup_text == uniq2


def test_chunk_dedup_within_doc_duplicates(spark):
    blk = " ".join(f"x{i}" for i in range(10))
    d = _docs(spark, [f"{blk} {blk}"])
    r = chunk_dedup(d, "doc_id", "text", 10).collect()[0]
    assert r.total_chunks == 2 and r.kept_chunks == 1
    assert r.dedup_text == blk


def test_decontaminate_flags_shared_4gram(spark):
    ev = _docs(spark, ["secret eval answer phrase here"])
    tr = spark.createDataFrame(
        [
            Row(doc_id=10, text="intro secret eval answer phrase outro"),
            Row(doc_id=11, text="totally clean text with no overlap at all"),
        ]
    )
    out = {r.doc_id: r for r in decontaminate(tr, ev, "doc_id", "text", k=4).collect()}
    assert out[10].contaminated == 1 and out[10].n_hits >= 1
    assert out[11].contaminated == 0 and out[11].n_hits == 0


def test_repetition_stats_gates_degenerate_docs(spark):
    diverse = " ".join(f"w{i}" for i in range(60))
    loop = "spam " * 60
    d = _docs(spark, [diverse, loop.strip()])
    out = {r.doc_id: r for r in repetition_stats(d, "doc_id", "text").collect()}
    assert out[0].keep_doc == 1
    assert out[0].distinct_ratio == 1.0 and out[0].n_words == 60
    assert out[1].keep_doc == 0
    assert out[1].top_word_frac == 1.0 and out[1].top_bigram_frac == 1.0


def test_redact_pii_replaces_all_occurrences(spark):
    d = _docs(
        spark,
        ["mail a.user@x.example.com or b@y.example.org call 555-123-4567 now"],
    )
    r = d.select(redact_pii(F.col("text")).alias("t")).collect()[0]
    assert r.t == "mail <EMAIL> or <EMAIL> call <PHONE> now"


def test_sliding_chunks_offsets_and_tail(spark):
    d = _docs(spark, [" ".join(f"t{i}" for i in range(25))])
    rows = sliding_chunks(d, "doc_id", "text", size=20, stride=10).collect()
    got = {(r.chunk_id): (r.start_word, r.n_chunk_words) for r in rows}
    assert got == {0: (0, 20), 1: (10, 15), 2: (20, 5)}


def test_curate_corpus_cascade_reasons(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        curate_corpus,
    )

    diverse = "the of and to in is " + " ".join(f"w{i}" for i in range(54))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=diverse),  # kept
            Row(doc_id=1, text=diverse),  # exact dup of 0 -> duplicate
            Row(doc_id=2, text="der die und das ist nicht " * 12),  # lang (de)
            Row(doc_id=3, text="the point is short"),  # short (en, < 40 words)
            Row(doc_id=4, text=("the " * 60).strip()),  # repetition (en)
        ]
    )
    cont = spark.createDataFrame([Row(doc_id=0, contaminated=0)])
    out = {
        r.doc_id: r
        for r in curate_corpus(
            docs, "doc_id", "text", contaminated=cont, allowed_langs=("en",)
        ).collect()
    }
    assert out[0].reason == "" and out[0].keep_doc == 1
    assert out[1].reason == "duplicate"
    assert out[2].reason == "lang"
    assert out[3].reason == "short"
    assert out[4].reason == "repetition"


def test_curate_corpus_contamination_flag(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        curate_corpus,
    )

    diverse = "the of and to in is " + " ".join(f"w{i}" for i in range(54))
    docs = spark.createDataFrame([Row(doc_id=7, text=diverse)])
    cont = spark.createDataFrame([Row(doc_id=7, contaminated=1)])
    r = curate_corpus(docs, "doc_id", "text", contaminated=cont).collect()[0]
    assert r.reason == "contaminated" and r.keep_doc == 0


def test_url_domain_stats_counts_urls_and_docs(spark):
    d = _docs(
        spark,
        [
            "see https://a.example.com/x and https://a.example.com/y",
            "also http://b.example.org/z plain words",
        ],
    )
    out = {r.domain: r for r in url_domain_stats(d, "doc_id", "text").collect()}
    assert out["a.example.com"].n_urls == 2 and out["a.example.com"].n_docs == 1
    assert out["b.example.org"].n_urls == 1 and out["b.example.org"].n_docs == 1


def test_lm_score_bits_hand_case(spark):
    """Hand-computed add-alpha bigram model: corpus ['a b a b', 'a b',
    'z z', 'solo'] has V=4 distinct tokens, bigram counts (a,b)=3,
    (b,a)=1, (z,z)=1 and left counts a=3, b=1, z=1; with alpha=0.5 the
    smoothed conditionals are p(b|a)=3.5/5, p(a|b)=1.5/3, p(z|z)=1.5/3.
    The 1-token doc carries no bigram and is excluded."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        lm_score_bits,
    )

    d = _docs(spark, ["a b a b", "a b", "z z", "solo"])
    got = {
        r.doc_id: (r.n_bigrams, r.bits_per_bigram)
        for r in lm_score_bits(d, "doc_id", "text", alpha=0.5).collect()
    }
    b_ab = -math.log2(3.5 / 5.0)
    b_ba = -math.log2(1.5 / 3.0)
    b_zz = -math.log2(1.5 / 3.0)
    assert set(got) == {0, 1, 2}
    assert got[0][0] == 3
    assert got[0][1] == pytest.approx(round((2 * b_ab + b_ba) / 3, 6), abs=1e-6)
    assert got[1] == (1, pytest.approx(round(b_ab, 6), abs=1e-6))
    assert got[2] == (1, pytest.approx(round(b_zz, 6), abs=1e-6))


def test_lm_score_rare_text_scores_higher(spark):
    """A doc made of corpus-typical bigrams scores fewer bits than a doc
    of one-off bigrams (the CCNet head/tail ordering)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        lm_score_bits,
    )

    common = "the cat sat on the mat"
    d = _docs(spark, [common, common, common, "zq xv wk jy qn"])
    got = {r.doc_id: r.bits_per_bigram for r in
           lm_score_bits(d, "doc_id", "text").collect()}
    assert got[3] > got[0]


def test_span_corpus_dedup_removes_all_frequent_occurrences(spark):
    """The C4-style remove-all rule: a 5-word span present in >=3 docs
    disappears from EVERY doc (incl. repeats within one doc), infrequent
    spans survive, and span order is preserved."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        span_corpus_dedup,
    )

    boiler = "all rights reserved contact us"
    docs = [
        f"{boiler} unique alpha text here now",
        f"{boiler} other beta words appear here",
        f"{boiler} {boiler}",          # two occurrences in one doc
        "completely fresh gamma content stands alone",
    ]
    got = {
        r.doc_id: r
        for r in span_corpus_dedup(
            _docs(spark, docs), "doc_id", "text", span_words=5, min_df=3
        ).collect()
    }
    assert got[0].clean_text == "unique alpha text here now"
    assert got[0].n_spans == 2 and got[0].n_removed == 1
    assert got[1].clean_text == "other beta words appear here"
    assert got[2].clean_text == "" and got[2].n_removed == 2
    assert got[3].clean_text == docs[3]
    assert got[3].n_removed == 0


def test_span_corpus_dedup_empty_and_short_docs(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        span_corpus_dedup,
    )

    got = {
        r.doc_id: r
        for r in span_corpus_dedup(
            _docs(spark, ["", "one two"]), "doc_id", "text"
        ).collect()
    }
    assert got[0].clean_text == "" and got[0].n_spans == 1
    assert got[1].clean_text == "one two" and got[1].n_removed == 0


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Docs made of target-distribution n-grams must outweigh docs made of
    source-only n-grams, and a doc IN the target slice scores high."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        dsir_weights,
    )

    target_text = "the quick brown fox jumps over the lazy dog again"
    source_text = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(
            [target_text, target_text, source_text, source_text,
             "the quick brown fox runs", "lorem ipsum dolor sit whatever"]
        )]
    )
    target = docs.filter(F.col("doc_id") < 2)
    got = {r.doc_id: r.weight for r in
           dsir_weights(docs, target, "doc_id", "text").collect()}
    # target-like doc 4 must outrank source-like doc 5
    assert got[4] > got[5]
    assert got[0] > got[2]


def test_dsir_weights_deterministic_under_repartition(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        dsir_weights,
    )

    docs = _docs(spark, [f"tok{i} tok{i+1} tok{i+2} common words here"
                         for i in range(30)])
    tgt = docs.filter(F.col("doc_id") % 3 == 0)
    a = sorted((r.doc_id, r.n_grams, r.weight) for r in
               dsir_weights(docs, tgt, "doc_id", "text").collect())
    b = sorted((r.doc_id, r.n_grams, r.weight) for r in
               dsir_weights(docs.repartition(7), tgt.repartition(3),
                            "doc_id", "text").collect())
    assert a == b and len(a) == 30


def test_line_corrections_rules(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        line_corrections,
    )

    page = "\n".join(
        [
            "A real first paragraph with several words",
            "HOME | ABOUT | CONTACT",  # all-caps nav
            "We use cookies to improve your experience",  # boiler term
            "12, 34/5 (6)",  # digits/punct only
            "ok go",  # < 3 words
            "Copyright 2024 All Rights Reserved",  # boiler term
            "And a second real paragraph closing the page",
        ]
    )
    out = line_corrections(_docs(spark, [page, ""]), "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_lines"] == 7
    assert rows[0]["n_kept"] == 2
    assert rows[0]["clean_text"] == (
        "A real first paragraph with several words\n"
        "And a second real paragraph closing the page"
    )
    # empty doc: one empty line, dropped by the digits/punct-only rule
    assert rows[1]["n_lines"] == 1 and rows[1]["n_kept"] == 0
    assert rows[1]["clean_text"] == ""


def test_line_corrections_plan_has_no_exchange(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        line_corrections,
    )

    out = line_corrections(_docs(spark, ["a b c\nd"]), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # single narrow projection


def test_canonical_url_rules(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        canonical_url,
    )

    cases = {
        # fragment + tracking params + caps host + www + default port
        "HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&q=1&utm_medium=y#top":
            "https://ex.com/A/b?q=1",
        # only tracking params -> query dropped entirely
        "http://ex.com/p?utm_campaign=c": "http://ex.com/p",
        # leading tracking param, real param kept
        "http://ex.com/p?fbclid=f&x=2": "http://ex.com/p?x=2",
        # default port http, trailing slash
        "http://www.ex.com:80/path/": "http://ex.com/path",
        # non-default port preserved; path case preserved
        "https://Ex.com:8443/CaseKept": "https://ex.com:8443/CaseKept",
        # bare host, trailing slash dropped
        "https://ex.com/": "https://ex.com",
    }
    df = spark.createDataFrame(
        [Row(u=k) for k in cases]
    ).select("u", canonical_url(F.col("u")).alias("c"))
    for r in df.collect():
        assert r["c"] == cases[r["u"]], (r["u"], r["c"])


def test_soft_dedup_weights_inverse_frequency(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        soft_dedup_weights,
    )

    # doc 0/1/2 share one normalized fingerprint (punct/case differences
    # collapse); doc 3 is unique
    out = soft_dedup_weights(
        _docs(spark, ["Hello, World", "hello world!", "HELLO WORLD", "other"]),
        "doc_id",
        "text",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_dups"] == 3 and abs(rows[0]["weight"] - 1 / 3) < 1e-6
    assert rows[0]["fp"] == rows[1]["fp"] == rows[2]["fp"]
    assert rows[3]["n_dups"] == 1 and rows[3]["weight"] == 1.0


def test_canonical_url_idempotent_on_adversarial_inputs(spark):
    """canonical_url(canonical_url(u)) == canonical_url(u) over a seeded
    grid of adversarial URLs (every combination of caps/www/port/params/
    fragment/trailing cruft) — one Spark job, batched."""
    import itertools

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        canonical_url,
    )

    schemes = ["http://", "HTTPS://", "https://"]
    hosts = ["WWW.Ex.COM", "ex.com", "www.sub.ex.org"]
    ports = ["", ":80", ":443", ":8443"]
    paths = ["", "/", "/A/b", "/p/"]
    queries = [
        "",
        "?utm_source=a",
        "?q=1",
        "?utm_medium=m&q=1",
        "?q=1&utm_campaign=c&fbclid=f",
        "?gclid=g&utm_term=t",
    ]
    frags = ["", "#x", "#frag?fake=1"]
    urls = [
        "".join(p)
        for p in itertools.product(schemes, hosts, ports, paths, queries, frags)
    ]
    df = spark.createDataFrame([Row(u=u) for u in urls]).select(
        canonical_url(F.col("u")).alias("c1")
    )
    twice = df.select(
        F.col("c1"), canonical_url(F.col("c1")).alias("c2")
    ).filter(F.col("c1") != F.col("c2"))
    bad = twice.collect()
    assert bad == [], bad[:5]


def test_line_corrections_output_is_subset_of_input_lines(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        line_corrections,
    )

    texts = [
        "keep this real sentence\nDROP ALL CAPS\nanother kept line here",
        "",
        "1 2 3\nmixed Line with Words",
        "only cookies mentioned here\nso is javascript code",
    ]
    out = line_corrections(_docs(spark, texts), "doc_id", "text").collect()
    for r in out:
        src_lines = texts[r["doc_id"]].split("\n")
        kept = r["clean_text"].split("\n") if r["clean_text"] else []
        assert r["n_lines"] == len(src_lines)
        assert r["n_kept"] == len(kept)
        assert all(k in src_lines for k in kept)
        # order preserved
        idxs = [src_lines.index(k) for k in kept]
        assert idxs == sorted(idxs)


def test_soft_dedup_weights_sum_to_one_per_fingerprint(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        soft_dedup_weights,
    )

    texts = ["a b", "A b!", "a  b", "c", "d e f", "D E F"]
    out = soft_dedup_weights(_docs(spark, texts), "doc_id", "text")
    sums = out.groupBy("fp").agg(F.sum("weight").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4, r


def test_quality_classifier_hand_case(spark):
    import hashlib
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        quality_classifier_scores,
    )

    def bucket(g, n=64):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n

    # doc 0: words a b -> grams {a, b, 'a b'}; doc 1: single word c.
    # weight exactly the buckets of doc-0's grams
    grams0 = ["a", "b", "a b"]
    weights = {b: 0.25 for b in {bucket(g) for g in grams0}}
    out = quality_classifier_scores(
        _docs(spark, ["a b", "c"]), "doc_id", "text", weights,
        bias=0.5, n_buckets=64,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 0: each of its 3 grams hits a weighted bucket -> logit 0.5+3*0.25
    exp0 = 0.5 + sum(0.25 for _ in grams0)
    assert rows[0]["n_grams"] == 3
    assert abs(rows[0]["logit"] - round(exp0, 6)) < 1e-9
    assert abs(rows[0]["score"] - round(1 / (1 + math.exp(-exp0)), 6)) < 1e-9
    # doc 1: its gram's bucket is unweighted unless it collides
    exp1 = 0.5 + (0.25 if bucket("c") in weights else 0.0)
    assert abs(rows[1]["logit"] - round(exp1, 6)) < 1e-9


def test_rouge_n_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        rouge_n,
    )
    from pyspark.sql import Row as _R

    df = spark.createDataFrame(
        [
            # expected bigrams: {a b, b c, c a, a b} (a b twice);
            # actual bigrams: {a b, b d} -> clipped overlap = 1 (a b)
            _R(doc_id=0, expected="a b c a b", actual="a b d"),
            # identical -> perfect scores
            _R(doc_id=1, expected="x y z", actual="x y z"),
            # actual empty -> all zeros but n_expected counted
            _R(doc_id=2, expected="p q", actual=""),
            # both empty -> zero row survives via the id-universe join
            _R(doc_id=3, expected="", actual=""),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in rouge_n(df, "doc_id", "expected", "actual", n=2).collect()
    }
    assert (out[0]["n_expected"], out[0]["n_actual"], out[0]["n_overlap"]) == (4, 2, 1)
    assert abs(out[0]["rouge_recall"] - 0.25) < 1e-9
    assert abs(out[0]["rouge_precision"] - 0.5) < 1e-9
    assert out[1]["rouge_f1"] == 1.0
    assert out[2]["n_expected"] == 1 and out[2]["rouge_recall"] == 0.0
    assert out[3]["n_expected"] == 0 and out[3]["rouge_f1"] == 0.0


def test_bleu_hand_cases(spark):
    import math

    from pyspark.sql import Row as _R

    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        bleu_n,
    )

    df = spark.createDataFrame(
        [
            # identical -> bleu 1
            _R(doc_id=0, expected="a b c d e", actual="a b c d e"),
            # candidate = strict prefix: all precisions 1, bp = exp(1-5/4)
            _R(doc_id=1, expected="a b c d e", actual="a b c d"),
            # no overlap at all -> 0
            _R(doc_id=2, expected="a b c d e", actual="x y z w v"),
            # short candidate (2 words): effective orders = 2, perfect
            # sub-match, bp = exp(1-5/2)
            _R(doc_id=3, expected="a b c d e", actual="a b"),
            # empty-ish candidate ('' tokenizes to one empty token)
            _R(doc_id=4, expected="a b c", actual=""),
        ]
    )
    out = {r["doc_id"]: r for r in bleu_n(df, "doc_id", "expected", "actual").collect()}
    assert out[0]["bleu"] == 1.0
    assert abs(out[1]["bleu"] - round(math.exp(1 - 5 / 4), 6)) < 1e-9
    assert out[2]["bleu"] == 0.0
    assert abs(out[3]["bleu"] - round(math.exp(1 - 5 / 2), 6)) < 1e-9
    # '' -> one empty-string token, no overlap with real words -> 0
    assert out[4]["bleu"] == 0.0 and out[4]["len_cand"] == 1


def test_line_repetition_stats_hand_case(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        line_repetition_stats,
    )

    texts = [
        # 4 lines, 'nav bar' duplicated: dup_line_frac = 1/4 = 0.25,
        # dup chars = 1*7 of total 7+7+11+9 = 34
        "nav bar\nnav bar\nreal text a\nclosing b",
        # heavy duplication: 3x same line of 4 -> dlf 0.5, dcf 2*9/27... 
        "same line\nsame line\nsame line",
        "",
        "single unique line",
    ]
    out = {r["doc_id"]: r for r in line_repetition_stats(_docs(spark, texts), "doc_id", "text").collect()}
    assert out[0]["n_lines"] == 4
    assert abs(out[0]["dup_line_frac"] - 0.25) < 1e-9
    assert abs(out[0]["dup_line_char_frac"] - 7 / 34) < 1e-6
    # line gate passes (0.25 <= 0.30) but the char gate fails
    # (7/34 = 0.206 > 0.20) -> dropped
    assert out[0]["keep_doc"] == 0
    assert out[1]["n_lines"] == 3
    assert abs(out[1]["dup_line_frac"] - 2 / 3) < 1e-6
    assert abs(out[1]["dup_line_char_frac"] - 2 / 3) < 1e-6
    assert out[1]["keep_doc"] == 0
    assert out[2]["n_lines"] == 0 and out[2]["keep_doc"] == 1
    assert out[3]["keep_doc"] == 1 and out[3]["dup_line_frac"] == 0.0
    # no blank lines anywhere above -> each doc is ONE paragraph
    assert out[0]["n_paras"] == 1 and out[0]["dup_para_frac"] == 0.0


def test_paragraph_repetition_gates(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        line_repetition_stats,
    )

    texts = [
        # 3 paragraphs, one duplicated: dpf = 1/3; para chars 5+5+6 = 16
        # (the dup para is 'promo' = 5 chars) -> dpcf = 5/16 > 0.20 -> drop
        "promo\n\npromo\n\nunique",
        # distinct paragraphs, duplicate LINES across paragraphs: the
        # paragraph gates pass, the line gates catch it
        "same\nsame\n\nother",
        # clean two-paragraph doc -> keep
        "first paragraph here\n\nsecond paragraph there",
    ]
    out = {
        r["doc_id"]: r
        for r in line_repetition_stats(
            _docs(spark, texts), "doc_id", "text"
        ).collect()
    }
    assert out[0]["n_paras"] == 3
    assert abs(out[0]["dup_para_frac"] - 1 / 3) < 1e-6
    assert abs(out[0]["dup_para_char_frac"] - 5 / 16) < 1e-6
    assert out[0]["keep_doc"] == 0
    assert out[1]["dup_para_frac"] == 0.0  # 'same\nsame' != 'other'
    assert abs(out[1]["dup_line_frac"] - 1 / 3) < 1e-6
    assert out[1]["keep_doc"] == 0  # dup_line_char_frac 4/12 > 0.20
    assert out[2]["keep_doc"] == 1 and out[2]["n_paras"] == 2


def test_mixture_weights_temperature_scaling(spark):
    from pyspark.sql import Row as _R

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        mixture_weights,
    )

    # 90/10 split: alpha<1 must up-sample the small domain
    rows = [_R(domain="big", n=1) for _ in range(90)] + [
        _R(domain="small", n=1) for _ in range(10)
    ]
    out = {
        r["domain"]: r
        for r in mixture_weights(
            spark.createDataFrame(rows), "domain", alpha=0.5
        ).collect()
    }
    assert abs(out["big"]["raw_share"] - 0.9) < 1e-9
    assert out["small"]["upsample_ratio"] > 1.0 > out["big"]["upsample_ratio"]
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5
    # alpha=1 -> proportional sampling
    out1 = {
        r["domain"]: r
        for r in mixture_weights(
            spark.createDataFrame(rows), "domain", alpha=1.0
        ).collect()
    }
    assert abs(out1["big"]["upsample_ratio"] - 1.0) < 1e-6


def _chrf_py(expected: str, actual: str, max_n: int = 6, beta: float = 2.0):
    """Pure-python oracle of the documented chrf_score spec."""
    import re

    se = re.sub(r"\s+", "", expected or "")
    sa = re.sub(r"\s+", "", actual or "")
    b2 = beta * beta
    fs = []
    for n in range(1, max_n + 1):
        ge = [se[i : i + n] for i in range(len(se) - n + 1)]
        ga = [sa[i : i + n] for i in range(len(sa) - n + 1)]
        if not ge and not ga:
            continue
        ce: dict = {}
        for g in ge:
            ce[g] = ce.get(g, 0) + 1
        ov = 0
        ca: dict = {}
        for g in ga:
            ca[g] = ca.get(g, 0) + 1
        for g, c in ca.items():
            ov += min(c, ce.get(g, 0))
        p = ov / len(ga) if ga else 0.0
        r = ov / len(ge) if ge else 0.0
        fs.append((1 + b2) * p * r / (b2 * p + r) if (b2 * p + r) > 0 else 0.0)
    return round(sum(fs) / len(fs), 6) if fs else 0.0


def test_chrf_hand_and_differential(spark):
    from pyspark.sql import Row as _R

    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        chrf_score,
    )

    cases = [
        ("the cat sat on the mat", "the cat sat on the mat"),  # identical
        ("the cat sat", "thecatsat"),  # whitespace-invariant -> 1.0
        ("abcdef", "uvwxyz"),  # disjoint alphabets -> 0.0
        ("hello world", "hello wurld"),  # partial char overlap
        ("a", "a b"),  # short strings, few effective orders
        ("", ""),  # both empty
        ("xy", ""),  # one side empty
        ("repeat repeat repeat", "repeat"),  # clipping
    ]
    df = spark.createDataFrame(
        [_R(doc_id=i, expected=e, actual=a) for i, (e, a) in enumerate(cases)]
    )
    out = {
        r["doc_id"]: r
        for r in chrf_score(df, "doc_id", "expected", "actual").collect()
    }
    for i, (e, a) in enumerate(cases):
        assert abs(out[i]["chrf"] - _chrf_py(e, a)) < 1e-9, (i, e, a)
    assert out[0]["chrf"] == 1.0
    assert out[1]["chrf"] == 1.0  # whitespace removed before gramming
    assert out[2]["chrf"] == 0.0
    assert out[5]["chrf"] == 0.0 and out[5]["len_ref"] == 0
    # char lengths are post-strip
    assert out[1]["len_ref"] == 9 and out[1]["len_cand"] == 9


def test_char_entropy_hand_cases(spark):
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        char_entropy_stats,
    )

    texts = [
        "aaaa",  # one symbol -> exactly 0 bits (and +0.0, not -0.0)
        "abab",  # two equiprobable symbols -> exactly 1 bit
        "abcd",  # four equiprobable -> 2 bits (boundary: keep at min 2.0)
        "",  # empty -> 0 bits, dropped
        "the quick brown fox jumps over the lazy dog",  # English-ish, keep
    ]
    out = {
        r["doc_id"]: r
        for r in char_entropy_stats(
            _docs(spark, texts), "doc_id", "text"
        ).collect()
    }
    assert out[0]["entropy_bits"] == 0.0 and out[0]["keep_doc"] == 0
    assert math.copysign(1.0, out[0]["entropy_bits"]) == 1.0  # +0.0
    assert out[1]["entropy_bits"] == 1.0 and out[1]["n_distinct"] == 2
    assert out[2]["entropy_bits"] == 2.0 and out[2]["keep_doc"] == 1
    assert out[3]["n_chars"] == 0 and out[3]["keep_doc"] == 0
    assert out[4]["keep_doc"] == 1 and out[4]["entropy_bits"] > 3.0


def test_bm25_hand_case(spark):
    """Two-doc corpus, query {x}: idf and length normalization computed
    by hand.  N=2, df(x)=1 -> idf = ln(1 + 1.5/1.5) = ln 2; doc0 has
    tf=2, dl=4, avgdl=3 -> denom = 2 + 1.2*(0.25 + 0.75*4/3) = 3.5;
    score = ln2 * 4.4 / 3.5.  Doc1 (no hit) is absent by definition."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        bm25_scores,
    )

    d = _docs(spark, ["x a x b", "c d"])
    out = {r["doc_id"]: r for r in bm25_scores(d, "doc_id", "text", ["x"]).collect()}
    assert set(out) == {0}
    expected = math.log(2.0) * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 4 / 3))
    assert abs(out[0]["bm25"] - round(expected, 6)) < 1e-9
    assert out[0]["n_hits"] == 1

    # rarer term outranks a common one at equal tf/dl
    d2 = _docs(spark, ["rare common", "zz common", "yy common"])
    sc = {r["doc_id"]: r["bm25"] for r in
          bm25_scores(d2, "doc_id", "text", ["rare", "common"]).collect()}
    assert sc[0] > sc[1] == sc[2]


def test_bm25_and_entropy_edge_guards(spark):
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        bm25_scores,
        char_entropy_stats,
    )

    # empty corpus: no crash, empty result (avgdl aggregate returns null)
    empty = _docs(spark, ["a b"]).filter("doc_id < 0")
    assert bm25_scores(empty, "doc_id", "text", ["x"]).count() == 0

    # empty docs drop even at min_bits=0 (the documented contract)
    out = {
        r["doc_id"]: r["keep_doc"]
        for r in char_entropy_stats(
            _docs(spark, ["", "ab"]), "doc_id", "text", min_bits=0.0
        ).collect()
    }
    assert out[0] == 0 and out[1] == 1


def test_curriculum_buckets_rank_coherent(spark):
    """Buckets are 0..n-1, monotone in the measure, tie-coherent (equal
    measures share a bucket), and roughly balanced."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        curriculum_buckets,
    )

    rows = [(i, (i * 7) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = curriculum_buckets(df, "doc_id", "n_tok", n_buckets=10).collect()
    assert len(out) == 200
    assert {r.bucket for r in out} == set(range(10))
    by_measure = {}
    for r in out:
        by_measure.setdefault(r.n_tok, set()).add(r.bucket)
    assert all(len(v) == 1 for v in by_measure.values())  # tie-coherent
    ms = sorted(by_measure)
    bks = [by_measure[m].pop() for m in ms]
    assert bks == sorted(bks)  # monotone in the measure


def test_budget_select_prefix_semantics(spark):
    """Selection keeps the highest-score prefix whose cumulative cost fits;
    an over-budget doc does NOT let smaller later docs in."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        budget_select,
    )

    rows = [
        (1, "web", 0.9, 40),
        (2, "web", 0.8, 50),
        (3, "web", 0.7, 30),   # cum 120 > 100 -> cut here
        (4, "web", 0.6, 5),    # would fit, but prefix semantics exclude it
        (5, "books", 0.5, 60),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "q", "tok"])
    got = budget_select(df, "doc_id", "source", "q", "tok", budget=100).collect()
    assert {(r.id, r.cum_cost) for r in got} == {(1, 40), (2, 90), (5, 60)}


def test_dataset_split_stable_and_partitioned(spark):
    """Split assignment is a pure function of the id (stable under corpus
    growth and repartitioning), covers all rows, and lands near the
    requested fractions."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        dataset_split,
    )

    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in dataset_split(small, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in dataset_split(big.repartition(13), "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())  # growth never moves rows
    from collections import Counter

    c = Counter(s2.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.85 <= c["train"] / 2000 <= 0.95


def test_exact_k_sample_sizes_and_stability(spark):
    """Exactly k rows per stratum (or all rows when the stratum is
    smaller); membership is stable under repartitioning."""
    import pyspark.sql.functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        exact_k_sample,
    )

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("s")
    )
    tiny = spark.range(2).select(
        F.col("id").alias("doc_id"), F.lit(99).alias("s")
    )
    full = df.unionByName(tiny)
    got = exact_k_sample(full, "doc_id", "s", k=10).collect()
    from collections import Counter

    sizes = Counter(r.s for r in got)
    assert sizes[0] == sizes[1] == sizes[2] == 10 and sizes[99] == 2
    a = {(r.doc_id, r.smp_rank) for r in got}
    b = {
        (r.doc_id, r.smp_rank)
        for r in exact_k_sample(full.repartition(13), "doc_id", "s", k=10).collect()
    }
    assert a == b


def test_dictionary_tag_counts(spark):
    """Literal-dictionary occurrence counts; zero-hit terms emit no rows;
    overlapping substrings count by non-overlapping replace semantics."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        dictionary_tag,
    )

    df = spark.createDataFrame(
        [(1, "spark shuffles spark data"), (2, "no keywords here"), (3, None)],
        ["doc_id", "text"],
    )
    got = {(r.id, r.term): r.hits for r in dictionary_tag(df, "doc_id", "text", ["spark", "data", "zzz"]).collect()}
    assert got == {(1, "spark"): 2, (1, "data"): 1}


def test_ql_dirichlet_hand_case(spark):
    """Two-doc corpus, query {a, z} (z unseen -> dropped): score is the
    exact Dirichlet-smoothed log-likelihood; doc without any query term
    is omitted; higher-tf doc ranks higher at equal length."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        ql_dirichlet_scores,
    )

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c d"), (3, "e f g")], ["doc_id", "text"]
    )
    mu = 10.0
    got = {
        r.doc_id: r
        for r in ql_dirichlet_scores(
            df, "doc_id", "text", ["a", "z"], mu=mu
        ).collect()
    }
    assert set(got) == {1, 2}
    p_a = 3 / 9  # cf(a)=3, total=9
    s1 = math.log((2 + mu * p_a) / (3 + mu))
    s2 = math.log((1 + mu * p_a) / (3 + mu))
    assert got[1].ql == round(s1, 6)
    assert got[2].ql == round(s2, 6)
    assert got[1].ql > got[2].ql
    assert got[1].n_hits == 1 and got[2].n_hits == 1


def test_ql_dirichlet_absent_term_background(spark):
    """Query {a, b} against a doc containing only a: the absent term
    contributes the background ln(mu p_b / (dl+mu)) — matching the
    direct formula summed over BOTH terms."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        ql_dirichlet_scores,
    )

    df = spark.createDataFrame([(1, "a a"), (2, "b b")], ["doc_id", "text"])
    mu = 4.0
    got = {
        r.doc_id: r
        for r in ql_dirichlet_scores(
            df, "doc_id", "text", ["a", "b"], mu=mu
        ).collect()
    }
    p = 2 / 4
    want1 = math.log((2 + mu * p) / (2 + mu)) + math.log((0 + mu * p) / (2 + mu))
    assert got[1].ql == round(want1, 6)
    assert got[1].ql == got[2].ql  # symmetric corpus
    assert got[1].n_hits == 1


def test_ql_dirichlet_no_live_terms_empty(spark):
    """All query terms unseen -> empty result with the right schema."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        ql_dirichlet_scores,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    out = ql_dirichlet_scores(df, "doc_id", "text", ["zz"])
    assert out.columns == ["doc_id", "n_hits", "ql"]
    assert out.count() == 0


def test_naive_bayes_separable_labels(spark):
    """Two cleanly separable vocabularies reclassify perfectly; the
    winning score equals the hand-computed smoothed log-likelihood."""
    import math

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        naive_bayes_classify,
    )

    df = spark.createDataFrame(
        [
            (1, "cat cat dog", "pets"),
            (2, "dog cat", "pets"),
            (3, "tax form fee", "forms"),
            (4, "fee tax tax", "forms"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r.id: r for r in naive_bayes_classify(df, "doc_id", "text", "lang").collect()}
    assert all(out[i].predicted == out[i].label for i in (1, 2, 3, 4))
    # doc 2 under 'pets': V=5, N_pets=5, prior .5
    # p(dog)=(2+1)/10, p(cat)=(3+1)/10
    want = math.log(0.5) + math.log(3 / 10) + math.log(4 / 10)
    assert out[2].score == round(want, 6)


def test_naive_bayes_tie_breaks_ascending_label(spark):
    """Symmetric corpus: identical scores resolve to the ascending
    label in every row (the engine-portable contract)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        naive_bayes_classify,
    )

    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "x", "b")], ["doc_id", "text", "lang"]
    )
    out = {r.id: r for r in naive_bayes_classify(df, "doc_id", "text", "lang").collect()}
    assert out[1].predicted == "a" and out[2].predicted == "a"


def test_effective_sample_size_extremes(spark):
    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        effective_sample_size,
    )

    # equal weights: ESS == n
    eq = spark.createDataFrame([_Row(w=0.5) for _ in range(8)])
    r = effective_sample_size(eq, "w").collect()[0]
    assert r.n == 8 and r.ess == 8.0 and r.ess_ratio == 1.0
    # one dominant weight: ESS collapses toward 1
    dom = spark.createDataFrame(
        [_Row(w=1000.0)] + [_Row(w=0.001) for _ in range(99)]
    )
    r2 = effective_sample_size(dom, "w").collect()[0]
    assert r2.n == 100 and r2.ess < 1.01
    assert r2.ess_ratio < 0.02


def test_compression_ratio_differential_and_ordering(spark):
    import zlib

    from accelerated_intelligent_document_processing_on_aws_spark.operators.curation import (
        compression_ratio,
    )

    texts = {
        1: "spam spam spam spam spam spam spam spam spam spam",
        2: "The quick brown fox jumps over the lazy dog near a riverbank.",
        3: "",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = {r.doc_id: r for r in compression_ratio(df, "doc_id", "text").collect()}
    for did, t in texts.items():
        b = t.encode("utf-8")
        assert out[did].n_bytes == len(b)
        if b:
            assert out[did].ratio == round(len(zlib.compress(b, 6)) / len(b), 6)
    assert out[3].ratio is None
    # repetitive text compresses harder than prose
    assert out[1].ratio < out[2].ratio
