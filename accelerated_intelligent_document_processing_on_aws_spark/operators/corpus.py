"""Corpus-level text analytics: positional inverted index + collocation
mining (PMI).

Reference parity: the reference has no search-index or collocation code —
these extend the training-data-pipeline family (brief requirement) with
the two corpus structures an LLM-data platform builds right after dedup:
a posting-list index for exact-phrase / provenance lookups over the kept
corpus, and collocation statistics for tokenizer/vocabulary auditing.

Scale shape (both):
* tokenization is one JVM-side projection (``split`` over the normalized
  text materialized as a column first — Catalyst re-evaluates expressions
  *closed over* by HOF lambdas per element, see dedup.shingle_rows);
* every shuffle is a groupBy/join on the term key with map-side partial
  aggregation;
* nothing collects to the driver except deliberate scalar literals
  (corpus token count) — one count job each, same pattern as tf-idf's
  ``n_docs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_for_compare
from .common import ensure_min_partitions


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, term) — one row per token of the normalized text, with
    its 0-based position in the token sequence.  The words array is
    materialized BEFORE posexplode so the split runs once per document,
    and posexplode receives the array as an EXPRESSION in the same select
    (an intermediate aliased column would trigger the
    InferFiltersFromGenerate re-inlining trap documented in
    dedup.shingle_rows)."""
    w = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        F.split(normalized_for_compare(F.col(text_col)), " ").alias("_w"),
    )
    return w.select(
        "id",
        F.posexplode(F.filter(F.col("_w"), lambda t: t != F.lit(""))).alias(
            "pos", "term"
        ),
    )


def positional_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_token_len: int = 1,
) -> DataFrame:
    """Positional inverted index over the normalized corpus: one row per
    (term, doc), with term frequency, per-term document frequency, and
    the sorted 0-based token positions serialized as a CSV string.

    Columns: ``term, doc_id, tf, df, positions``.

    ``min_token_len`` drops tokens shorter than the bound *inside the
    explode lambda* — at web scale the sub-length tokens are exactly the
    stopword-class terms whose posting lists dominate the index, so the
    filter runs before any row is generated, not as a post-hoc prune.

    Plan: one scan, one explode, ONE groupBy(term, doc) with map-side
    combine (positions collect per compound key, never per term alone,
    so no single reducer ever holds a hot term's full posting list
    while building it), then a ``Window.partitionBy(term)`` for
    document frequency whose exchange IS the by-term clustering a
    sharded posting-list write wants and whose state is a single count
    (no row buffering).  The measured alternative — a per-term
    aggregate joined back — plans the scan+explode subtree TWICE
    (column pruning differentiates the branches, so Catalyst cannot
    reuse the exchange), and pinning postings first just trades the
    window's shuffle for an equally-sized cache write.  Per-term skew
    is bounded by the hottest surviving term's posting rows; the
    ``min_token_len`` gate removes the stopword-class terms that
    dominate that tail.  Positions are serialized (not an array column)
    so the row is engine-portable and the output is a plain columnar
    table.
    """
    toks = _token_rows(df, id_col, text_col)
    if min_token_len > 1:
        toks = toks.filter(F.length("term") >= min_token_len)
    postings = toks.groupBy("term", F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )
    wt = Window.partitionBy("term")
    return postings.select(
        "term",
        "doc_id",
        F.col("tf").cast("long").alias("tf"),
        F.count(F.lit(1)).over(wt).cast("long").alias("df"),
        "positions",
    )


def collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` adjacent-bigram collocations by pointwise mutual
    information over the normalized corpus.

    PMI(x, y) = ln( c_xy * N / (c_x * c_y) ) with N = total token count;
    bigrams below ``min_count`` occurrences are dropped (the standard
    sparse-PMI guard — a hapax pair always has inflated PMI).

    Columns: ``w1, w2, pair_count, left_count, right_count, pmi``.

    Plan: bigrams come straight off the per-doc token ARRAY via
    ``zip_with(slice, slice)`` — zero self-joins, zero windows over the
    exploded rows; unigram counts aggregate the same array exploded once.
    The tokenized base materializes ONCE (lazy localCheckpoint, forced
    by the N scalar action — the dedup-sketch pattern) so its three
    consumers (N, bigrams, unigrams) never re-run the normalize+split
    scan.  The unigram table is vocabulary-sized, so both count lookups
    join broadcast; the only wide shuffle is the bigram groupBy
    (map-side combine absorbs repeats).  N is a deliberate scalar
    literal (one sum job over per-doc token counts — a metadata-sized
    aggregate).  The final top-k is a real ``orderBy().limit()`` so
    Catalyst plans TakeOrderedAndProject, never a global sort.
    """
    base = (
        ensure_min_partitions(df)
        .select(
            F.filter(
                F.split(normalized_for_compare(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            ).alias("_w")
        )
        .localCheckpoint(eager=False)
    )
    # scalar literal: corpus token count (one agg job, metadata-sized);
    # this action also materializes the checkpoint for the two branches
    n_tokens = base.agg(F.sum(F.size("_w"))).collect()[0][0] or 0
    n = F.size(F.col("_w"))
    bigrams = base.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(F.col("_w"), 1, n - 1),
                    F.slice(F.col("_w"), 2, n - 1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                ),
            ).otherwise(F.array()),
        ).alias("_b")
    ).select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    pair = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    uni = (
        base.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        pair.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("left_count"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("right_count"))),
            "w2",
        )
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.col("left_count").cast("long").alias("left_count"),
            F.col("right_count").cast("long").alias("right_count"),
            F.round(
                F.log(
                    F.col("pair_count")
                    * F.lit(float(n_tokens))
                    / (F.col("left_count") * F.col("right_count"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)


def bpe_merge_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 30,
) -> DataFrame:
    """Byte-pair-encoding merge statistics (Sennrich et al. 2016, one
    training iteration): frequency of every adjacent symbol pair across
    the corpus, weighted by word frequency — the quantity BPE maximizes
    when it picks the next merge.  Columns: ``c1, c2, pair_count``,
    top ``top_k`` by count (ties broken by pair, ascending).

    Scale shape — the reason tokenizer training is feasible at 100 TB:
    the corpus collapses to its WORD-FREQUENCY table first (one
    corpus-size shuffle with map-side combine; vocabulary is zipf-tiny
    next to the corpus), and the per-character pair explode runs over
    distinct words only, so its cost is O(vocab · word_len), independent
    of corpus size.  Iterated BPE = re-running the pair count over the
    re-segmented vocab table, never over the corpus again.
    """
    words = (
        _token_rows(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("term") >= 2)
    )
    pairs = words.select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("term") - 1),
                lambda i: F.struct(
                    F.col("term").substr(i, F.lit(1)).alias("c1"),
                    F.col("term").substr(i + F.lit(1), F.lit(1)).alias(
                        "c2"
                    ),
                ),
            )
        ).alias("p"),
    )
    counts = (
        pairs.select(F.col("p.c1").alias("c1"), F.col("p.c2").alias("c2"), "wc")
        .groupBy("c1", "c2")
        .agg(F.sum("wc").alias("pair_count"))
    )
    return counts.orderBy(
        F.col("pair_count").desc(), F.col("c1").asc(), F.col("c2").asc()
    ).limit(top_k)


def bigram_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adjacent-bigram frequency table over the normalized corpus:
    ``term`` = the two tokens joined by one space, ``wc`` = corpus-wide
    occurrence count.  The weighted-items input shape for the
    count-min sketch (sketches.cms_table).

    Same zero-join plan as :func:`collocations`: bigrams come straight
    off the per-doc token array via ``zip_with(slice, slice)``, then one
    groupBy with map-side combine — the table that leaves the scan stage
    is already vocabulary², not corpus, sized.
    """
    base = ensure_min_partitions(df).select(
        F.filter(
            F.split(normalized_for_compare(F.col(text_col)), " "),
            lambda t: t != F.lit(""),
        ).alias("_w")
    )
    n = F.size(F.col("_w"))
    bigrams = base.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(F.col("_w"), 1, n - 1),
                    F.slice(F.col("_w"), 2, n - 1),
                    lambda x, y: F.concat(x, F.lit(" "), y),
                ),
            ).otherwise(F.array()),
        ).alias("term")
    )
    return bigrams.groupBy("term").agg(F.count(F.lit(1)).alias("wc"))


def skipgram_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Window-±``window`` co-occurrence counts with PMI — the word2vec /
    GloVe preprocessing table (collocations generalizes adjacent-only
    bigrams to skip-grams).  A pair is counted once per (position,
    distance): for token i and each d in 1..window, (term[i],
    term[i+d]) — direction-sensitive, matching the asymmetric-context
    formulation.

    Columns: ``w1, w2, pair_count, pmi`` — top ``top_k`` by PMI (ties by
    pair), pairs below ``min_count`` dropped.

    Plan: pairs come off the per-doc token array via a nested
    ``transform`` (outer over positions, inner over distances) flattened
    JVM-side — ZERO self-joins (the naive formulation joins token rows
    on id with a |pos_a-pos_b| band — a doc-keyed join that explodes on
    long docs).  The token array materializes once for its three
    consumers (N, pair counts, unigram counts) via the collocations
    localCheckpoint pattern; unigrams broadcast into the PMI lookup.
    """
    base = (
        ensure_min_partitions(df)
        .select(
            F.filter(
                F.split(normalized_for_compare(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            ).alias("_w")
        )
        .localCheckpoint(eager=False)
    )
    n_tokens = base.agg(F.sum(F.size("_w"))).collect()[0][0] or 0
    n = F.size(F.col("_w"))
    # outer transform over 1-based positions, inner over distances; the
    # inner sequence clamps at the array end so no filter pass is needed
    # outer positions stop at n-1 (guarded by the n>=2 filter below) so
    # the inner distance sequence 1..least(window, n-i) is never empty
    pair_arrays = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(window), n - i)),
            lambda d: F.struct(
                F.element_at(F.col("_w"), i).alias("w1"),
                F.element_at(F.col("_w"), i + d).alias("w2"),
            ),
        ),
    )
    pairs = base.filter(n >= 2).select(
        F.explode(F.flatten(pair_arrays)).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    uni = (
        base.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        pc.join(
            F.broadcast(
                uni.select(F.col("w").alias("w1"), F.col("c").alias("_c1"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("w2"), F.col("c").alias("_c2"))
            ),
            "w2",
        )
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    F.col("pair_count")
                    * F.lit(float(n_tokens))
                    / (F.col("_c1") * F.col("_c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_k)


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word-k-grams that appear in NO other document — the memorization /
    uniqueness signal a curation pipeline reads next to quality scores
    (novelty ≈ 0 means the doc is stitched from corpus boilerplate;
    novelty ≈ 1 means nothing about it is shared).

    Columns: ``id, n_grams, n_novel, novelty`` (rounded 4).

    Plan: distinct shingles explode once (dedup.shingle_rows, pure JVM);
    document frequency rides a count window over g (one shuffle that
    also serves as the gram-keyed exchange); a gram is novel iff its df
    is exactly 1 — note df counts DOCUMENTS because shingle_rows is
    distinct-per-doc — then one doc-keyed aggregate.  No joins, no
    second pass over text.
    """
    from .dedup import shingle_rows

    sh = shingle_rows(df, id_col, text_col, k)
    wg = Window.partitionBy("g")
    flagged = sh.withColumn(
        "_novel", (F.count(F.lit(1)).over(wg) == 1).cast("long")
    )
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("_novel").cast("long").alias("n_novel"),
        F.round(
            F.sum("_novel").cast("double") / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("novelty"),
    )


def source_js_divergence(
    df: DataFrame,
    source_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions — the corpus-drift / mixture-audit table (how far
    apart two domains' token distributions sit, symmetric and bounded
    by ln 2; the distance DSIR-style selection and mixture reweighting
    reason about).

    Columns: ``source_a, source_b, n_shared_terms, jsd`` for every
    unordered source pair SHARING at least one term; a fully-disjoint
    pair has no row (its jsd is the ln 2 maximum by definition — callers
    wanting explicit rows cross the source dim and coalesce).

    Algebra (exact, join-friendly): terms present in both sources
    contribute ``p·ln(2p/(p+q)) + q·ln(2q/(p+q))``; terms private to a
    side contribute ``ln 2`` per unit mass, recovered as
    ``ln2·((1-Σp) + (1-Σq))`` from the shared-mass sums — so an INNER
    join on the term suffices and no full-outer / zero-fill pass exists
    in the plan.

    Scale shape: the corpus collapses to its per-source term-frequency
    table first (one shuffle, map-side combine; vocab·sources rows);
    per-source totals broadcast back; the pair join runs on the term
    key with a source inequality — vocab-sized inputs, never corpus-
    sized.  20 sources → 190 pairs; thousands of domains still produce
    a dim-scale result.
    """
    toks = (
        ensure_min_partitions(df)
        .select(
            F.col(source_col).alias("src"),
            F.explode(
                F.filter(
                    F.split(normalized_for_compare(F.col(text_col)), " "),
                    lambda t: t != F.lit(""),
                )
            ).alias("w"),
        )
    )
    counts = toks.groupBy("src", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("src").agg(F.sum("c").alias("n"))
    probs = counts.join(F.broadcast(totals), "src").select(
        "src", "w", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    a, b = probs.alias("a"), probs.alias("b")
    pq = F.col("a.p") + F.col("b.p")
    shared = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(
                F.col("a.p") * F.log(F.lit(2.0) * F.col("a.p") / pq)
                + F.col("b.p") * F.log(F.lit(2.0) * F.col("b.p") / pq)
            ).alias("_s"),
            F.sum("a.p").alias("_pm"),
            F.sum("b.p").alias("_qm"),
        )
    )
    ln2 = float(__import__("math").log(2.0))
    return shared.select(
        "source_a",
        "source_b",
        "n_shared_terms",
        F.round(
            F.lit(0.5)
            * (
                F.col("_s")
                + F.lit(ln2)
                * ((F.lit(1.0) - F.col("_pm")) + (F.lit(1.0) - F.col("_qm")))
            ),
            round_to,
        ).alias("jsd"),
    )


def kneser_ney_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    min_count: int = 5,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram estimates (Kneser & Ney 1995; Chen &
    Goodman 1999) over the normalized corpus — the n-gram LM estimation
    pass a training-data pipeline runs to score corpus slices, build
    lightweight rerankers, or feed perplexity-based quality filters
    without any neural model:

      ``pkn(w|v) = max(c(vw)-d, 0)/c(v) + d*N1+(v.)/c(v) * pcont(w)``
      ``pcont(w) = N1+(.w) / |distinct bigrams|``

    Columns: ``v, w, c_vw, c_v, n1_fwd`` (distinct continuations of v),
    ``n1_bwd`` (distinct left contexts of w), ``pcont, pkn`` (6 dp).
    Rows are bigrams with ``c_vw >= min_count``; counts/backoff stats are
    computed over ALL bigrams first, so the filter only bounds output.

    Scale shape (100 TB): bigrams leave the scan stage already reduced to
    the types table (one groupBy with map-side combine — the
    ``bigram_counts`` plan); c(v)/N1+(v.) ride ONE v-keyed window and
    N1+(.w) one w-keyed window over that types-sized frame; the distinct-
    bigram total attaches as a one-row broadcast.  Nothing corpus-sized
    survives the first aggregate.  ``discount`` defaults to 0.75 (the
    standard fixed-discount choice), exactly representable in float64 so
    both engines' arithmetic agrees before the final ROUND."""
    base = ensure_min_partitions(df).select(
        F.filter(
            F.split(normalized_for_compare(F.col(text_col)), " "),
            lambda t: t != F.lit(""),
        ).alias("_w")
    )
    n = F.size(F.col("_w"))
    pairs = base.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice(F.col("_w"), 1, n - 1),
                    F.slice(F.col("_w"), 2, n - 1),
                    lambda x, y: F.struct(x.alias("v"), y.alias("w")),
                ),
            ).otherwise(F.array()),
        ).alias("_p")
    ).select(F.col("_p.v").alias("v"), F.col("_p.w").alias("w"))
    types = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    wv = Window.partitionBy("v")
    ww = Window.partitionBy("w")
    stats = (
        types.withColumn("c_v", F.sum("c_vw").over(wv))
        .withColumn("n1_fwd", F.count(F.lit(1)).over(wv))
        .withColumn("n1_bwd", F.count(F.lit(1)).over(ww))
    )
    total = types.agg(F.count(F.lit(1)).alias("_tt"))
    d = float(discount)
    return (
        stats.join(F.broadcast(total))
        .filter(F.col("c_vw") >= min_count)
        .select(
            "v",
            "w",
            "c_vw",
            "c_v",
            "n1_fwd",
            "n1_bwd",
            F.round(F.col("n1_bwd") / F.col("_tt"), 6).alias("pcont"),
            F.round(
                F.greatest(F.col("c_vw") - F.lit(d), F.lit(0.0)) / F.col("c_v")
                + F.lit(d) * F.col("n1_fwd") / F.col("c_v")
                * (F.col("n1_bwd") / F.col("_tt")),
                6,
            ).alias("pkn"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    group_col: str,
    text_col: str,
    vocab_size: int = 500,
    round_to: int = 6,
) -> DataFrame:
    """Per-group vocabulary coverage against the corpus's own top-K
    term list: token-level and type-level OOV rates — the tokenizer
    health check a pretraining mix runs per source (a source whose
    token OOV rate spikes against the corpus vocabulary is in the wrong
    language, the wrong domain, or broken extraction, and will shred a
    fixed vocab/merge-table downstream; the reference has no corpus
    surface — this generalizes its per-document confidence gates the
    way audit.zipf_fit does).

    Vocabulary = the ``vocab_size`` most frequent terms corpus-wide
    (count-desc, term-asc tiebreak — deterministic in both engines).

    Columns: ``group, tokens, oov_tokens, oov_rate, types, oov_types,
    type_oov_rate``.

    Scale shape: tokens collapse to (group, term) counts in the first
    map-side-combined aggregate; the vocabulary is a top-K
    (TakeOrderedAndProject, never a global sort) BROADCAST to the
    left-join — the corpus-sized side never reshuffles; final rollup is
    group-sized."""
    toks = ensure_min_partitions(df).select(
        F.col(group_col).alias("group"),
        F.split(normalized_for_compare(F.col(text_col)), " ").alias("_w"),
    ).select(
        "group",
        F.explode(
            F.filter(F.col("_w"), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    gt = toks.groupBy("group", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        gt.groupBy("term")
        .agg(F.sum("tf").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("_inv"))
    )
    j = gt.join(F.broadcast(vocab), "term", "left")
    oov = F.col("_inv").isNull()
    g = j.groupBy("group").agg(
        F.sum("tf").alias("tokens"),
        F.sum(F.when(oov, F.col("tf")).otherwise(0)).alias("oov_tokens"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.when(oov, 1).otherwise(0)).alias("oov_types"),
    )
    return g.select(
        "group",
        "tokens",
        "oov_tokens",
        F.round(
            F.col("oov_tokens") / F.col("tokens").cast("double"), round_to
        ).alias("oov_rate"),
        "types",
        "oov_types",
        F.round(
            F.col("oov_types") / F.col("types").cast("double"), round_to
        ).alias("type_oov_rate"),
    )


def good_turing_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Simple Good-Turing frequency-of-frequencies table (Good 1953;
    the Katz-backoff building block): for every observed term frequency
    ``r``, the number of types ``n_r`` seen exactly r times and the
    Turing-smoothed count ``r* = (r+1)·n_{r+1}/n_r`` — the corpus-level
    estimate of how much probability mass the empirical counts steal
    from unseen events (the unseen mass itself is row r=1's
    ``n_r / N``).  A vocabulary whose n_1 share balloons after an
    extraction change signals shredded tokenization long before
    downstream perplexity does.

    Columns: ``r, n_r, r_star, p_gt`` — ``r_star``/``p_gt`` are NULL
    where no r+1 class exists (the simple-GT convention; production
    smoothers regress log n_r vs log r to fill the gaps).  ``p_gt =
    r*/N`` with N = total corpus tokens.

    Scale shape: tokens → (term, count) with map-side combine → the
    frequency-of-frequencies aggregate collapses to at most
    max-frequency rows (metadata-sized); the r+1 lookup is a broadcast
    self-join on that tiny frame; N folds in as an eager literal (the
    tf-idf n_docs pattern — no one-row cross join)."""
    tc = _token_rows(df, id_col, text_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("_c")
    )
    ff = tc.groupBy(F.col("_c").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    ff = ff.localCheckpoint(eager=True)  # fans out to total + both join sides
    total = ff.agg(F.sum(F.col("r") * F.col("n_r"))).first()[0]
    if not total:
        return ff.select(
            "r", "n_r", F.lit(None).cast("double").alias("r_star"),
            F.lit(None).cast("double").alias("p_gt"),
        )
    nxt = ff.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("_n_next"))
    j = ff.join(F.broadcast(nxt), "r", "left")
    r_star = (F.col("r") + 1) * F.col("_n_next") / F.col("n_r")
    return j.select(
        "r",
        "n_r",
        F.round(r_star, round_to).alias("r_star"),
        F.round(r_star / F.lit(float(total)), round_to).alias("p_gt"),
    )


def heaps_law_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_ranges: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978): regress
    ``ln V(N) = ln K + β·ln N`` over the per-document cumulative
    (tokens-so-far N_i, distinct-types-so-far V_i) curve in ``id_col``
    order — the corpus-health scalar that tells a pretraining mix
    whether vocabulary is still growing sub-linearly as expected
    (β ≈ 0.4-0.6 for natural text) or has gone flat (mass duplication)
    / linear (gibberish or id-like tokens).

    Returns ONE row: ``n_docs, total_tokens, vocab, beta, k, r2``.

    Scale shape — the cumulative curve is a DISTRIBUTED prefix sum,
    never a single global window: each term contributes one row at its
    first-occurrence document (min(id) per term — map-side-combined);
    per-doc (new_types, tokens) rows are bucketed into ``n_ranges``
    order-preserving id ranges (floor over the id span — monotonic in
    id, so range order IS id order); partial sums per range cumulate
    over the metadata-sized range list, and the within-range window is
    partitioned BY range — no stage ever moves the corpus through one
    task.  The regression itself is moment algebra (Σx, Σy, Σxy, Σx²)
    in one final aggregate, the ols_fit_groups pattern."""
    toks = _token_rows(df, id_col, text_col)
    per_doc = toks.groupBy("id").agg(F.count(F.lit(1)).alias("_dl"))
    firsts = (
        toks.groupBy("term")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    docs = per_doc.join(firsts, "id", "left").select(
        "id", "_dl", F.coalesce(F.col("_new"), F.lit(0)).alias("_new")
    )
    lo, hi = docs.agg(F.min("id"), F.max("id")).first()
    if lo is None:
        return docs.limit(0).select(
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("total_tokens"),
            F.lit(0).cast("long").alias("vocab"),
            F.lit(None).cast("double").alias("beta"),
            F.lit(None).cast("double").alias("k"),
            F.lit(None).cast("double").alias("r2"),
        )
    width = max(1, (int(hi) - int(lo) + 1) // n_ranges + 1)
    docs = docs.withColumn(
        "_rng", ((F.col("id") - F.lit(int(lo))) / F.lit(width)).cast("long")
    )
    rng = docs.groupBy("_rng").agg(
        F.sum("_dl").alias("_sdl"), F.sum("_new").alias("_snew")
    )
    w = Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    offs = rng.select(
        "_rng",
        F.coalesce(F.sum("_sdl").over(w), F.lit(0)).alias("_odl"),
        F.coalesce(F.sum("_snew").over(w), F.lit(0)).alias("_onew"),
    )
    win = Window.partitionBy("_rng").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = docs.join(F.broadcast(offs), "_rng").select(
        "id",
        (F.sum("_dl").over(win) + F.col("_odl")).alias("_N"),
        (F.sum("_new").over(win) + F.col("_onew")).alias("_V"),
    ).filter((F.col("_N") > 0) & (F.col("_V") > 0))
    pts = cum.select(
        "_N", "_V",
        F.log(F.col("_N").cast("double")).alias("_x"),
        F.log(F.col("_V").cast("double")).alias("_y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("_N").alias("total_tokens"),
        F.max("_V").alias("vocab"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    beta = cxy / vx
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.round(beta, round_to).alias("beta"),
        F.round(F.exp(F.col("sy") / n - beta * F.col("sx") / n), round_to)
        .alias("k"),
        F.round(
            F.when(vy > 0, cxy * cxy / (vx * vy)).otherwise(F.lit(None)),
            round_to,
        ).alias("r2"),
    )


def burrows_delta(
    df: DataFrame,
    group_col: str,
    text_col: str,
    top_terms: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Burrows' Delta stylometric distance between corpus groups
    (Burrows 2002; the standard authorship-attribution measure): over
    the ``top_terms`` most frequent terms corpus-wide, each group's
    relative term frequency is z-scored ACROSS groups (population
    mean/std, groups missing a term counting as frequency 0), and

        Delta(g1, g2) = mean_t | z_{t,g1} - z_{t,g2} |

    — two sources with the same topical vocabulary but different
    function-word rhythm separate here when plain TF-IDF cosine
    cannot.  The corpus-mix audit: a "new" source whose Delta to an
    existing source is near zero is the same crawl relabeled.

    Columns: ``g1, g2, n_terms, delta`` (one row per unordered group
    pair, g1 < g2; terms with zero cross-group variance are excluded
    from the mean — n_terms reports how many survived).

    Scale shape: the corpus collapses to (group, term) counts in one
    map-side-combined aggregate; the top-K vocabulary is a
    TakeOrderedAndProject broadcast back; everything after the join is
    vocabulary×groups-sized (metadata) — the z-score grid, the pair
    join, and the final mean never touch corpus-scale rows."""
    toks = _token_rows(df, group_col, text_col).withColumnRenamed(
        "id", "group"
    )
    gt = toks.groupBy("group", "term").agg(F.count(F.lit(1)).alias("_c"))
    gt = gt.localCheckpoint(eager=True)  # fans out: totals, vocab, grid
    totals = gt.groupBy("group").agg(F.sum("_c").alias("_tot"))
    vocab = (
        gt.groupBy("term")
        .agg(F.sum("_c").alias("_cc"))
        .orderBy(F.desc("_cc"), F.asc("term"))
        .limit(top_terms)
        .select("term")
    )
    # full vocab × group grid (metadata-sized): absent terms are f=0
    grid = (
        totals.crossJoin(F.broadcast(vocab))
        .join(gt, ["group", "term"], "left")
        .select(
            "group",
            "term",
            (
                F.coalesce(F.col("_c"), F.lit(0)).cast("double")
                / F.col("_tot")
            ).alias("_f"),
        )
    )
    n_groups = totals.count()
    stats = grid.groupBy("term").agg(
        (F.sum("_f") / F.lit(float(n_groups))).alias("_mean"),
        F.sum(F.col("_f") * F.col("_f")).alias("_sf2"),
    ).select(
        "term",
        "_mean",
        # greatest(.,0) guards the FP-cancellation case where the
        # population variance of an (all-equal) column lands at -1e-18:
        # sqrt would return NaN in Spark but NULL/error in other engines
        F.sqrt(
            F.greatest(
                F.col("_sf2") / F.lit(float(n_groups))
                - F.col("_mean") * F.col("_mean"),
                F.lit(0.0),
            )
        ).alias("_std"),
    )
    z = (
        grid.join(F.broadcast(stats), "term")
        .filter(F.col("_std") > 0)
        .select(
            "term",
            "group",
            ((F.col("_f") - F.col("_mean")) / F.col("_std")).alias("_z"),
        )
    )
    a = z.select("term", F.col("group").alias("g1"), F.col("_z").alias("_z1"))
    b = z.select("term", F.col("group").alias("g2"), F.col("_z").alias("_z2"))
    return (
        a.join(b, "term")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.round(
                F.sum(F.abs(F.col("_z1") - F.col("_z2")))
                / F.count(F.lit(1)),
                round_to,
            ).alias("delta"),
        )
    )


#: RAKE phrase-boundary stopwords (fixed, deliberately small — the
#: operator takes any set; oracles embed the same literal list)
RAKE_STOPWORDS = (
    "the", "of", "and", "a", "an", "to", "in", "is", "it", "that",
    "this", "for", "on", "with", "as", "are", "was", "be", "by", "at",
    "or", "from", "not", "but", "we",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: tuple = RAKE_STOPWORDS,
    top_k: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores
    ``degree/frequency`` where degree sums the lengths of every phrase
    the word occurs in (co-occurrence incl. self) and frequency counts
    its phrase occurrences; a phrase scores the sum of its words'
    scores.  Returns each document's ``top_k`` phrases.

    Unlike TF-IDF/TextRank (corpus- or graph-relative), RAKE is
    document-local and phrase-shaped — the cheap keyphrase extractor for
    corpus labeling at 10^12 turns.

    Plan shape: tokens explode once; phrase runs come from the
    gaps-and-islands cumsum over ONE (doc ORDER BY pos) window; word
    stats are a map-side-combined aggregate of the phrase-token frame,
    broadcast back onto it; per-doc top-k is a bounded row_number.
    Ties break (score DESC, phrase ASC) for determinism.

    Columns: ``id, phrase, n_words, score, rank``.
    """
    toks = _token_rows(df, id_col, text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    w = Window.partitionBy("id").orderBy("pos")
    marked = toks.withColumn("_stop", F.array_contains(sw, F.col("term")))
    islands = marked.withColumn(
        "_isl", F.sum(F.col("_stop").cast("int")).over(w)
    ).filter(~F.col("_stop"))
    phrases = islands.groupBy("id", "_isl").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
    )
    # word stats over phrase-member tokens: freq = occurrences, degree =
    # sum of owning-phrase lengths (needs the phrase length per token)
    ptoks = islands.join(
        phrases.select("id", "_isl", "n_words"), ["id", "_isl"]
    ).select("term", "n_words")
    scores = ptoks.groupBy("term").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("n_words").alias("_deg"),
    ).select(
        "term",
        (F.col("_deg").cast("double") / F.col("_freq").cast("double")).alias(
            "_wscore"
        ),
    )
    pscore = (
        islands.join(F.broadcast(scores), "term")
        .groupBy("id", "_isl")
        .agg(F.sum("_wscore").alias("_raw"))
    )
    ranked = phrases.join(pscore, ["id", "_isl"]).select(
        "id",
        "phrase",
        "n_words",
        F.round("_raw", round_to).alias("score"),
    )
    wr = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        ranked.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
    )


def chao1_richness(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Chao1 nonparametric vocabulary-size estimate (Chao 1984): how many
    distinct terms the corpus WOULD show with unbounded sampling, from
    the singleton/doubleton counts alone -- the "how much vocabulary is
    the crawl still missing" audit that complements the Heaps-law fit
    (which extrapolates the curve; Chao1 bounds the asymptote).

    Bias-corrected estimator (defined even when no doubletons exist):
    ``chao1 = d + f1 * (f1 - 1) / (2 * (f2 + 1))``.

    Returns one row: ``d, f1, f2, chao1``.  Plan: tokens explode once,
    term counts aggregate map-side to the vocabulary dimension, and the
    f-statistics are one aggregate over that bounded frame.
    """
    counts = (
        _token_rows(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    ).select(
        "d",
        "f1",
        "f2",
        F.round(
            F.col("d")
            + F.col("f1") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
            round_to,
        ).alias("chao1"),
    )


def diversity_index(
    df: DataFrame,
    group_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group lexical diversity: Shannon entropy (nats), Simpson's
    diversity ``1 - sum(p^2)``, distinct-term richness, and Pielou
    evenness ``shannon / ln(richness)`` over the group's token
    distribution -- the ecology indices applied to corpus sources,
    flagging domains whose text is template spam (low entropy) before
    they flood a training mix.

    Returns ``(group, n_tokens, richness, shannon, simpson, evenness)``.
    Plan: one token explode carrying the group, one (group, term)
    aggregate with map-side combine -- vocabulary-bounded after it --
    then the per-group total rides a window on the same partitioning
    (no join back) and one final aggregate.
    """
    w = ensure_min_partitions(df).select(
        F.col(group_col).alias("group"),
        F.split(normalized_for_compare(F.col(text_col)), " ").alias("_w"),
    )
    rows = w.select(
        "group",
        F.explode(
            F.filter(F.col("_w"), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    per_term = rows.groupBy("group", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    win = Window.partitionBy("group")
    scored = per_term.select(
        "group", "c", F.sum("c").over(win).alias("_n")
    )
    agg = scored.groupBy("group").agg(
        F.max("_n").alias("n_tokens"),
        F.count(F.lit(1)).alias("richness"),
        F.round(
            -F.sum(
                (F.col("c") / F.col("_n").cast("double"))
                * F.log(F.col("c") / F.col("_n").cast("double"))
            ),
            round_to,
        ).alias("shannon"),
        F.round(
            1.0
            - F.sum(
                (F.col("c") / F.col("_n").cast("double"))
                * (F.col("c") / F.col("_n"))
            ),
            round_to,
        ).alias("simpson"),
    )
    return agg.select(
        "group",
        "n_tokens",
        "richness",
        "shannon",
        "simpson",
        F.round(
            F.when(
                F.col("richness") > 1,
                F.col("shannon") / F.log(F.col("richness").cast("double")),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("evenness"),
    )


def hill_tail_index(
    df: DataFrame,
    id_col: str,
    value_col,
    k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index (Hill 1975) from the
    top ``k`` order statistics: ``1/alpha = mean(ln(x_i / x_kth))`` over
    the values strictly above the (k+1)-th largest -- the heavy-tail
    audit that says whether document sizes (or user activity) have
    finite variance before a partitioner bets on it.  Complements
    q_zipf (rank-frequency slope on the whole distribution; Hill uses
    only the tail, where it counts).

    Returns one row: ``k, x_kth, alpha`` (``x_kth`` = the smallest of
    the top k+1 values, the conditioning threshold; ``k`` = rows
    strictly above it, < the requested k under boundary ties).  Ties
    break by id so the cut is a total order.  Plan:
    TakeOrderedAndProject of k+1 rows -- the data is scanned once and
    never shuffled.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    top = (
        df.select(
            F.col(id_col).alias("_id"), v.cast("double").alias("_v")
        )
        .filter(F.col("_v").isNotNull() & (F.col("_v") > 0))
        .orderBy(F.desc("_v"), F.asc("_id"))
        .limit(int(k) + 1)
    )
    thr = top.agg(F.min("_v").alias("x_kth"))
    return (
        top.join(F.broadcast(thr), F.lit(True))
        .filter(F.col("_v") > F.col("x_kth"))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("x_kth").alias("x_kth"),
            F.round(
                1.0 / F.avg(F.log(F.col("_v") / F.col("x_kth"))), round_to
            ).alias("alpha"),
        )
        .select("k", "x_kth", "alpha")
    )


def mattr(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Moving-average type-token ratio (Covington & McFall 2010): mean
    TTR over every length-``window`` sliding token window — the
    lexical-diversity measure that, unlike raw TTR or Heaps'-law fits,
    does NOT shrink mechanically with document length (so it can rank
    long and short documents on one scale; the repetitive-generation
    screen next to the Gopher repetition gates).

    Computed WITHOUT materializing windows: a token occurrence at
    position j with previous occurrence at p is distinct-in-window for
    exactly the window ends ``i ∈ [max(j, p+w, w), min(j+w−1, L)]``, so
    ``MATTR = Σ_occ max(0, hi−lo+1) / ((L−w+1)·w)`` — per-occurrence
    closed form.  Documents shorter than ``window`` tokens are dropped
    (MATTR undefined).

    Columns: ``<id_col>, n_tokens, mattr``.

    Plan: one posexplode, ONE lag window partitioned by (doc, token) —
    thousands of tiny partitions, never global — one per-doc count
    window sharing the same doc-keyed exchange, one aggregate.
    """
    from ..functions.text import normalized_for_compare

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(normalized_for_compare(F.col(text_col)), " ")
        ).alias("_p0", "_tok"),
    ).select("_id", (F.col("_p0") + 1).alias("_pos"), "_tok")
    w_prev = Window.partitionBy("_id", "_tok").orderBy("_pos")
    w_doc = Window.partitionBy("_id")
    w = int(window)
    staged = toks.select(
        "_id",
        "_pos",
        F.coalesce(F.lag("_pos").over(w_prev), F.lit(0)).alias("_prev"),
        F.count(F.lit(1)).over(w_doc).alias("_len"),
    )
    lo = F.greatest(
        F.col("_pos"), F.col("_prev") + F.lit(w), F.lit(w)
    )
    hi = F.least(F.col("_pos") + F.lit(w - 1), F.col("_len"))
    contrib = F.greatest(F.lit(0), hi - lo + F.lit(1))
    return (
        staged.filter(F.col("_len") >= w)
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.max("_len").cast("long").alias("n_tokens"),
            F.round(
                F.sum(contrib).cast("double")
                / (
                    (F.max("_len") - F.lit(w) + F.lit(1)).cast("double")
                    * F.lit(float(w))
                ),
                round_to,
            ).alias("mattr"),
        )
    )


def yules_k(
    df: DataFrame,
    group_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Yule's characteristic K (Yule 1944) per group:
    ``K = 10⁴·(Σ_w f_w² − N)/N²`` over token frequencies — the
    repetitiveness constant that, unlike raw TTR, is essentially
    length-invariant (Yule built it to compare authors across works of
    different sizes; here it compares sources across corpora of
    different sizes).  High K = a few words dominate (templated or
    spammy text); the source-level companion to the per-document
    q_mattr.

    Returns one row per group: ``<group_col>, n_tokens, vocab, k``
    (NULL when the group has no tokens).

    Plan: (group, token) counts — map-side combined, vocabulary-
    bounded — then ONE per-group aggregate; ``Σ_m m²·V_m = Σ_w f_w²``
    makes the frequency-spectrum sum a plain square sum, no second
    grouping.
    """
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.split(normalized_for_compare(F.col(text_col)), " ")
        ).alias("_w"),
    ).filter(F.length("_w") > 0)
    wf = toks.groupBy("_g", "_w").agg(F.count(F.lit(1)).alias("_f"))
    a = wf.groupBy(F.col("_g").alias(group_col)).agg(
        F.sum("_f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("_f").cast("double") * F.col("_f")).alias("_f2"),
    )
    n = F.col("n_tokens").cast("double")
    k = F.lit(10000.0) * (F.col("_f2") - n) / (n * n)
    return a.select(
        group_col,
        "n_tokens",
        "vocab",
        F.round(F.when(F.col("n_tokens") > 0, k), round_to).alias("k"),
    )
