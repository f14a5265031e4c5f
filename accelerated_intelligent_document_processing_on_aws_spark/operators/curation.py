"""Training-corpus curation operators: chunk-level dedup, benchmark
decontamination, repetition-quality gates, PII redaction, sliding-window
chunking, URL/domain stats.

These extend the reference's document operators (SURVEY.md §2.6) with the
ops a large-scale training-data pipeline needs.  The reference has no
equivalents (its dedup surface stops at whole-document compare,
``lib/idp_common_pkg/idp_common/evaluation/comparator.py``); the designs
here follow the public corpus-curation literature (CCNet-style paragraph
dedup, n-gram benchmark decontamination, Gopher repetition rules) and the
same Catalyst-first discipline as ``operators/dedup.py``.

Scale notes (100 TB):

* Everything is pure Catalyst — split/slice/transform HOFs for chunking,
  md5 for hashing, hash-partitioned window/groupBy exchanges.  No Python
  in any path, so whole-stage codegen covers every stage.
* ``chunk_dedup`` shuffles by chunk *hash* (balanced by construction —
  md5 keys cannot skew), then by doc id to reassemble: two exchanges,
  both equi-hash, no joins back to the corpus.
* ``decontaminate`` broadcasts the *eval-set* shingles: benchmark
  suites are tiny by definition (thousands of docs), so the 100-TB train
  side never shuffles — the contamination join is map-side.
* ``repetition_stats`` is the two-level aggregate shape (partial
  map-side combine on (doc, token) then (doc)): the token explosion never
  leaves its executor un-combined.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_for_compare, word_ngrams

# ASCII-only regexes, identical semantics under Java regex and RE2 (the
# DuckDB oracle) — same dialect-parity rule as __spark_entry__.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
URL_HOST_RE = "https?://([A-Za-z0-9.-]+)"


def _words(text_col: str) -> Column:
    return F.split(F.coalesce(F.col(text_col), F.lit("")), " ")


def word_chunks(
    df: DataFrame, id_col: str, text_col: str, size: int
) -> DataFrame:
    """Fixed word-window chunking: one row per ``size``-word chunk.

    Output: (id_col, chunk_idx int, chunk string).  A doc with fewer than
    ``size`` words yields one (short) chunk; empty text yields one empty
    chunk — the convention the SQL oracles mirror.
    """
    # words materialized BEFORE the chunk lambda: Catalyst re-evaluates
    # expressions closed over by HOF lambdas per element, but an attribute
    # reference is free (same discipline as dedup.shingle_rows)
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n_chunks = F.ceil(F.size(F.col("_w")) / F.lit(float(size))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - F.lit(1), F.lit(0))),
        lambda i: F.array_join(F.slice(F.col("_w"), i * size + 1, size), " "),
    )
    return w.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, size: int = 10
) -> DataFrame:
    """CCNet-style chunk-level exact dedup with document reassembly.

    Each doc is split into ``size``-word chunks; a chunk survives only at
    its first global occurrence (ordered by (id, chunk_idx) — fully
    deterministic).  Docs are then reassembled from surviving chunks in
    original order.

    Output: (id_col, total_chunks, kept_chunks, dedup_text).

    Plan: window partitioned by md5(chunk) (first-occurrence pick — the
    hash key is balanced by construction), then one groupBy(id) with
    sort_array(collect_list(struct)) reassembly (the G3 ordered-concat
    pattern — never a bare collect_list).
    """
    ch = word_chunks(df, id_col, text_col, size)
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy(
        F.col(id_col), F.col("chunk_idx")
    )
    ch = ch.withColumn("_keep", F.row_number().over(w) == F.lit(1))
    kept_struct = F.when(
        F.col("_keep"), F.struct(F.col("chunk_idx"), F.col("chunk"))
    )
    return ch.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_chunks"),
        F.sum(F.col("_keep").cast("long")).alias("kept_chunks"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept_struct)),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("dedup_text"),
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Distinct word k-gram shingles per document: (id_col, gram).

    Docs shorter than ``k`` words contribute their whole text as the one
    shingle (the ``greatest(..., 1)`` convention shared with
    ``dedup.ngram_jaccard_pairs`` and its oracle).
    """
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size(F.col("_w"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(F.col("_w"), i, k), " "),
    )
    return w.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
) -> DataFrame:
    """Per-train-doc count of word ``k``-grams shared with the eval set —
    (id_col, n_hits), ONLY for docs with at least one hit (the join-side
    subset).  The eval shingle set is broadcast (benchmarks are tiny by
    definition) so the train side never shuffles for the check; the one
    exchange is the per-doc hit count.  :func:`decontaminate` fans this
    back over all train ids; :func:`curate_corpus` consumes it directly
    (absent ids count as clean) and skips that extra join."""
    ev = word_shingles(eval_df, id_col, text_col, k).select("gram").distinct()
    tg = word_shingles(train, id_col, text_col, k)
    return (
        tg.join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag train docs sharing any word
    ``k``-gram with the eval set.

    Output: one row per train doc — (id_col, n_hits = distinct shared
    shingles, contaminated int 0/1).

    Plan: broadcast contamination check (:func:`contamination_hits`) plus
    the left join fanning the hit counts back onto every train id.
    """
    hits = contamination_hits(train, eval_df, id_col, text_col, k)
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 40,
    min_distinct_ratio: float = 0.35,
    max_top_word_frac: float = 0.10,
    max_top_bigram_frac: float = 0.06,
) -> DataFrame:
    """Gopher-style repetition quality gate.

    Per doc: word count, distinct-word ratio, most-frequent-word
    fraction, most-frequent-bigram fraction, and a keep flag under the
    given thresholds (defaults follow the published Gopher rules adapted
    to this corpus' scale).

    Output: (id_col, n_words, distinct_ratio, top_word_frac,
    top_bigram_frac, keep_doc int).

    Plan (round 4, VERDICT #7): ONE two-level aggregate — the word and
    bigram explosions union into a single kind-tagged token stream, so
    groupBy(doc, kind, token) with map-side partial combine then
    groupBy(doc) with conditional aggregates covers both gram orders in
    two exchanges total (the previous shape ran the pair of aggregates
    per order PLUS a doc-key join: 5 exchanges).  Values are identical.
    """
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size(F.col("_w"))

    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(1), F.lit(1))),
        lambda i: F.array_join(F.slice(F.col("_w"), i, 2), " "),
    )
    tagged = w.select(
        F.col(id_col), F.lit("w").alias("_kind"), F.explode("_w").alias("_tok")
    ).unionByName(
        w.select(
            F.col(id_col),
            F.lit("b").alias("_kind"),
            F.explode(bigrams).alias("_tok"),
        )
    )
    c = tagged.groupBy(id_col, "_kind", "_tok").agg(F.count(F.lit(1)).alias("c"))
    is_w = F.col("_kind") == "w"
    joined = c.groupBy(id_col).agg(
        F.sum(F.when(is_w, F.col("c"))).alias("n_words"),
        F.sum(is_w.cast("long")).alias("n_distinct"),
        F.max(F.when(is_w, F.col("c"))).alias("top_word"),
        F.sum(F.when(~is_w, F.col("c"))).alias("n_bigrams"),
        F.max(F.when(~is_w, F.col("c"))).alias("top_bigram"),
    )
    distinct_ratio = F.col("n_distinct") / F.col("n_words")
    top_word_frac = F.col("top_word") / F.col("n_words")
    top_bigram_frac = F.col("top_bigram") / F.col("n_bigrams")
    keep = (
        (F.col("n_words") >= min_words)
        & (distinct_ratio >= min_distinct_ratio)
        & (top_word_frac <= max_top_word_frac)
        & (top_bigram_frac <= max_top_bigram_frac)
    )
    return joined.select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_word_frac, 6).alias("top_word_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        keep.cast("int").alias("keep_doc"),
    )


def redact_pii(c: Column) -> Column:
    """Replace emails then phone numbers with typed placeholder tags.
    Pure Catalyst regexp_replace (replaces ALL occurrences)."""
    out = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(c: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts for a text column."""
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
    return n_emails, n_phones


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Overlapping sliding-window chunking (RAG-style) with offsets.

    Output: (id_col, chunk_id, start_word, n_chunk_words, chunk_fp) —
    offsets-only plus a fingerprint, so the full chunk text never rides a
    shuffle (the same offsets-over-text rule the extraction pipeline uses
    for spans, ``operators/extract.py``).
    """
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size(F.col("_w"))
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
    )
    ex = w.select(
        F.col(id_col),
        F.col("_w"),
        F.explode(starts).alias("start_word"),
    )
    piece = F.slice(F.col("_w"), F.col("start_word") + 1, size)
    return ex.select(
        F.col(id_col),
        (F.col("start_word") / stride).cast("int").alias("chunk_id"),
        F.col("start_word").cast("int").alias("start_word"),
        F.size(piece).cast("int").alias("n_chunk_words"),
        F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
    )


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    contaminated: DataFrame | None = None,
    allowed_langs: tuple = ("en", "es", "de", "fr"),
    min_words: int = 40,
    min_distinct_ratio: float = 0.35,
    max_top_word_frac: float = 0.10,
    max_top_bigram_frac: float = 0.06,
) -> DataFrame:
    """Full curation cascade in one operator: language gate → length gate
    → repetition gate → exact-dup keeper → (optional) decontamination.

    Output: one row per doc — (id_col, n_words, reason, keep_doc) where
    ``reason`` names the FIRST failing gate in cascade order ('' = kept).

    ``contaminated`` is an optional (id_col, contaminated int) frame (e.g.
    from :func:`decontaminate`); absent ids count as clean.

    Plan: every stage is a hash exchange on either the doc id or the
    fingerprint — the repetition aggregates, the keeper window and the
    joins all co-partition after the first id shuffle (AQE reuses it); no
    stage materializes the corpus more than once.
    """
    from ..functions.text import fingerprint, lang_id

    rep = repetition_stats(df, id_col, text_col)
    w = Window.partitionBy("_fp").orderBy(id_col)
    marked = df.select(
        F.col(id_col),
        lang_id(F.coalesce(F.col(text_col), F.lit(""))).alias("_lang"),
        fingerprint(F.col(text_col)).alias("_fp"),
    ).withColumn("_keeper", (F.row_number().over(w) == F.lit(1)).cast("int"))
    out = marked.join(rep, id_col)
    if contaminated is not None:
        out = out.join(
            contaminated.select(F.col(id_col), F.col("contaminated")),
            id_col,
            "left",
        )
        cont = F.coalesce(F.col("contaminated"), F.lit(0))
    else:
        cont = F.lit(0)
    rep_bad = (
        (F.col("distinct_ratio") < min_distinct_ratio)
        | (F.col("top_word_frac") > max_top_word_frac)
        | (F.col("top_bigram_frac") > max_top_bigram_frac)
    )
    reason = (
        F.when(~F.col("_lang").isin(list(allowed_langs)), "lang")
        .when(F.col("n_words") < min_words, "short")
        .when(rep_bad, "repetition")
        .when(F.col("_keeper") == 0, "duplicate")
        .when(cont == 1, "contaminated")
        .otherwise("")
    )
    return out.select(
        F.col(id_col),
        F.col("n_words"),
        reason.alias("reason"),
        (reason == "").cast("int").alias("keep_doc"),
    )


def url_domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-domain URL stats: (domain, n_urls, n_docs) over URLs found in
    the text column.  regexp_extract_all with a capture group pulls hosts
    directly — one pass, no UDF; the aggregate is a plain hash groupBy on
    the domain key."""
    hosts = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(URL_HOST_RE), F.lit(1)
    )
    u = df.select(F.col(id_col), F.explode(hosts).alias("domain"))
    return u.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(F.col(id_col)).alias("n_docs"),
    )


def lm_score_bits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality score (Wenzek et al. 2019,
    arXiv:1911.00359): CCNet filters web text by perplexity under a KenLM
    n-gram model; the deterministic rebuild trains an add-alpha-smoothed
    BIGRAM model on the corpus itself and scores each doc by
    bits-per-bigram, ``mean(-log2((c(w1,w2)+a) / (c(w1)+a*V)))`` —
    low = typical text, high = atypical/noisy (the CCNet head/middle/tail
    split thresholds on exactly this axis).  Docs with fewer than two
    tokens carry no bigram evidence and are excluded.

    Output: (id_col, n_bigrams, bits_per_bigram) — score rounded to 6 dp.

    Plan shape (100 TB): doc text never shuffles — only slim
    (id, w1, w2) rows explode out.  The model "training" is one
    map-side-combining groupBy over the bigram stream; the unigram table
    derives from the bigram table (no second pass over the corpus); the
    vocabulary size is a 1-row broadcast.  Scoring joins back on the
    bigram key — an equi-join AQE can skew-split when a hot bigram
    (boilerplate) dominates.
    """
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n = F.size(F.col("_w"))
    pairs = F.transform(
        F.sequence(F.lit(1), n - F.lit(1)),
        lambda i: F.struct(
            F.element_at(F.col("_w"), i).alias("w1"),
            F.element_at(F.col("_w"), i + F.lit(1)).alias("w2"),
        ),
    )
    bg = (
        w.filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(F.col(id_col), F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    # the bigram-count table IS the trained model: materialize it once
    # (lazy localCheckpoint) so the scoring join and the derived unigram
    # table share one RDD instead of each re-scanning the corpus —
    # model-sized state, corpus scanned once to build it
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=False)
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # the vocabulary size is the model's one scalar of state: computed
    # eagerly in a single aggregate job (the "training" pass, like
    # train_ivf_centroids' bounded sample) and folded into the scoring
    # expression as a literal — a 1-row frame attached lazily would plan a
    # BroadcastNestedLoopJoin (a trivially-true join condition after
    # constant folding), which the whole-registry plan sweep bans
    v_size = int(
        w.select(F.explode("_w").alias("_t"))
        .agg(F.countDistinct("_t").alias("v"))
        .first()["v"]
        or 0
    )
    bits = -F.log2(
        (F.col("c2") + F.lit(alpha))
        / (F.col("c1") + F.lit(alpha) * F.lit(float(v_size)))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(bits), 6).alias("bits_per_bigram"),
        )
    )


def span_corpus_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_words: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """C4-style repeated-span removal (Raffel et al. 2020 §2.2 dedups
    repeated three-sentence spans; MassiveText/RefinedWeb strip repeated
    lines): each document is segmented into disjoint ``span_words``-word
    spans, and EVERY occurrence of any span whose corpus-wide occurrence
    count reaches ``min_df`` is removed — boilerplate repeats across
    documents, content does not.  (remove-all variant; ``chunk_dedup`` is
    the keep-first-occurrence twin.)

    Output: (id_col, clean_text, n_spans, n_removed) — surviving spans
    re-joined in original order.

    Plan shape (100 TB): document text NEVER shuffles.  Only slim
    (id, span_idx, md5) rows explode out; the frequent-span table is one
    map-side-combining groupBy over the hashes; the per-doc removed-index
    set is a left-semi join plus collect_set — both on slim rows — and
    spans are stripped back on the doc row with an indexed higher-order
    filter after ONE equi-join on id (AQE broadcasts the removed-set side
    when small, which at boilerplate's df distribution it is).  md5 keys
    make the frequent set portable to the DuckDB oracle."""
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    n_spans = F.ceil(F.size(F.col("_w")) / F.lit(float(span_words))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), F.greatest(n_spans - F.lit(1), F.lit(0))),
        lambda i: F.array_join(
            F.slice(F.col("_w"), i * span_words + 1, span_words), " "
        ),
    )
    base = w.select(F.col(id_col), spans.alias("_spans"))
    slim = base.select(
        F.col(id_col), F.posexplode("_spans").alias("_i", "_s")
    ).select(
        F.col(id_col), F.col("_i"), F.md5(F.encode(F.col("_s"), "UTF-8")).alias("_h")
    )
    # slim fans out to BOTH the frequency pass and the removed-set join —
    # unpinned, the corpus text scan + span build would run twice in the
    # lazy plan.  (id, idx, md5) rows are slim by construction: pin once,
    # the dedup-sketch discipline.
    slim = slim.localCheckpoint(eager=True)
    freq = (
        slim.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_df)
        .select("_h")
    )
    removed = (
        slim.join(freq, "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("_i").alias("_rm"))
    )
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_spans"), lambda x, i: ~F.array_contains(rm, i.cast("int"))
    )
    return base.join(removed, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size("_spans").alias("n_spans"),
        F.size(rm).alias("n_removed"),
    )


def _hashed_grams(df: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """Word unigram + bigram occurrences hashed into ``n_buckets`` feature
    buckets (engine-portable md5-prefix hash, same convention as
    ``dedup.shingle_hash32``): (id_col, b)."""
    w = df.select(F.col(id_col), _words(text_col).alias("_w"))
    bigrams = word_ngrams(F.col("_w"), 2)  # empty array when < 2 words
    grams = w.select(F.col(id_col), F.explode("_w").alias("_g")).unionByName(
        w.select(F.col(id_col), F.explode(bigrams).alias("_g"))
    )
    return grams.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("b"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    each source document by how much more likely its hashed n-gram features
    are under the TARGET distribution than the source distribution —
    ``w(x) = sum_g [ln p_tgt(bucket(g)) - ln p_src(bucket(g))]`` over the
    doc's unigram+bigram occurrences, add-alpha smoothed.  High weight =
    resembles the target; data selection keeps the top of this ranking.

    Output: (id_col, n_grams, weight) — weight rounded to 6 dp.

    Plan shape (100 TB): the feature space is FIXED at ``n_buckets``
    hash buckets, so both model tables are bounded regardless of corpus
    size; the two totals fold in as literals from one metadata-sized
    aggregate (the "training" pass, same discipline as ``lm_score_bits``),
    and scoring is one BROADCAST join of the bucket weights onto the slim
    (id, bucket) stream plus a map-side-combining per-doc sum — the
    corpus text never shuffles."""
    g_src = _hashed_grams(df, id_col, text_col, n_buckets)
    g_tgt = _hashed_grams(target, id_col, text_col, n_buckets)
    # the bucket-count model is metadata-sized (<= n_buckets rows) but
    # costs a full gram scan to build; materialize it ONCE so the totals
    # action below and the scoring join don't each re-scan the corpus
    counts = (
        g_src.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .join(
            g_tgt.groupBy("b").agg(F.count(F.lit(1)).alias("c_t")), "b", "full"
        )
        .select(
            "b",
            F.coalesce("c_s", F.lit(0)).alias("c_s"),
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("c_s").alias("s"), F.sum("c_t").alias("t")
    ).first()
    s_tot = float(tot["s"] or 0) + alpha * n_buckets
    t_tot = float(tot["t"] or 0) + alpha * n_buckets
    lam = counts.select(
        "b",
        (
            F.log((F.col("c_t") + F.lit(alpha)) / F.lit(t_tot))
            - F.log((F.col("c_s") + F.lit(alpha)) / F.lit(s_tot))
        ).alias("lam"),
    )
    return (
        g_src.join(F.broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("lam"), 6).alias("weight"),
        )
    )


# Boilerplate-term line filter (RefinedWeb-style line-wise corrections):
# ASCII-only, identical under Java regex and RE2 (the DuckDB oracle).
BOILER_LINE_RE = "cookies?|javascript|all rights reserved"


def line_corrections(
    df: DataFrame, id_col: str, text_col: str, min_words: int = 3
) -> DataFrame:
    """Line-wise boilerplate corrections (RefinedWeb, arXiv:2306.01116
    §"line-wise corrections"; the page-level complement of the extraction
    pipeline's block classifier, ``kernels/html_main.py``).

    Drops, per line: (1) lines with fewer than ``min_words`` alphanumeric
    words, (2) ALL-CAPS lines (nav menus / headers), (3) digit-and-
    punctuation-only lines (pagination / phone cruft), (4) lines matching
    boilerplate terms (cookie banners, script warnings, copyright tails).

    Output: (id_col, n_lines, n_kept, clean_text) — surviving lines
    rejoined with newlines.

    Plan shape (100 TB): a single narrow projection — the line explosion
    never happens (higher-order ``filter`` over the split array runs
    inside one codegen stage), so the operator adds ZERO exchanges and
    text never rides a shuffle."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")

    def _keep(x: Column) -> Column:
        n_words = F.size(
            F.regexp_extract_all(x, F.lit("[A-Za-z0-9]+"), F.lit(0))
        )
        all_caps = (F.upper(x) == x) & x.rlike("[A-Za-z]")
        numeric_only = x.rlike("^[0-9 .,/()-]*$")
        boiler = F.lower(x).rlike(BOILER_LINE_RE)
        return (
            (n_words >= min_words) & ~all_caps & ~numeric_only & ~boiler
        )

    kept = F.filter(lines, _keep)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


# URL canonicalization: tracking params stripped by name, scheme+host
# lowered, www. and default ports removed, fragment and trailing
# slash/query cruft dropped.  ASCII-only regexes, Java/RE2-identical.
TRACKING_PARAM_RE = "(utm_[a-z]+|fbclid|gclid)=[^&]*"
URL_HEAD_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url(c: Column) -> Column:
    """Canonical form of a URL column, pure Catalyst (no UDF):

    1. strip the fragment (``#...``),
    2. strip tracking query params by name (``utm_*``, ``fbclid``,
       ``gclid``) wherever they sit in the query string,
    3. lowercase scheme+host (path/query stay case-sensitive),
    4. drop ``www.`` and scheme-default ports (http:80 / https:443),
    5. drop one trailing ``/`` or ``?``.

    Every step is a regexp over the value — whole-stage codegen end to
    end, so canonicalize-then-groupBy URL dedup shuffles only the
    canonical key."""
    u = F.regexp_replace(c, "#.*$", "")  # 1
    u = F.regexp_replace(u, "&" + TRACKING_PARAM_RE, "")  # 2: non-leading
    u = F.regexp_replace(u, "[?]" + TRACKING_PARAM_RE + "&", "?")  # leading
    u = F.regexp_replace(u, "[?]" + TRACKING_PARAM_RE + "$", "")  # only
    head = F.regexp_extract(u, URL_HEAD_RE, 1)
    tail = F.substr(u, F.length(head) + F.lit(1))
    h = F.lower(head)
    h = F.regexp_replace(h, "^(http://|https://)www[.]", "$1")
    h = F.when(
        h.startswith("http://"), F.regexp_replace(h, ":80$", "")
    ).when(
        h.startswith("https://"), F.regexp_replace(h, ":443$", "")
    ).otherwise(h)
    tail = F.regexp_replace(tail, "[/?]$", "")
    return F.concat(h, tail)


def url_dedup_stats(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """URL-level dedup ledger: canonicalize, then one hash groupBy on the
    canonical key — (canon_url, n_urls, n_docs).  The CommonCrawl-style
    first stage of web-corpus dedup: at 100 TB the only shuffled bytes
    are the canonical URL strings themselves."""
    u = df.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canon_url")
    )
    return u.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(F.col(id_col)).alias("n_docs"),
    )


def soft_dedup_weights(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """SoftDeDup (He et al. 2024, arXiv:2407.06654): instead of DELETING
    duplicates, reweight each document by the inverse frequency of its
    normalized fingerprint — ``w = 1/n_dups`` — so the corpus keeps its
    coverage but duplicated content stops dominating the sampling
    distribution.  The soft complement of ``dedup.dedup_corpus``.

    Output: (id_col, fp, n_dups, weight).

    Plan shape (100 TB): one window over the fingerprint hash (md5 keys
    cannot skew) — a single exchange, no join-back, text never shuffles
    (the fingerprint is computed before the exchange)."""
    fp = F.md5(
        normalized_for_compare(F.coalesce(F.col(text_col), F.lit("")))
    )
    w = Window.partitionBy("fp")
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .withColumn("n_dups", F.count(F.lit(1)).over(w))
        .select(
            F.col(id_col),
            F.col("fp"),
            F.col("n_dups").cast("long").alias("n_dups"),
            F.round(F.lit(1.0) / F.col("n_dups"), 6).alias("weight"),
        )
    )


def quality_classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict,
    bias: float = 0.0,
    n_buckets: int = 4096,
) -> DataFrame:
    """Classifier-based quality filtering (the GPT-3 / PaLM pipeline
    stage: a linear classifier over hashed n-gram features scores each
    document's resemblance to a high-quality corpus; Brown et al. 2020
    arXiv:2005.14165 Appendix A).  ``weights`` maps feature bucket →
    learned weight; ``score = sigmoid(bias + sum_g w[bucket(g)])`` over
    the doc's unigram+bigram occurrences.

    Output: (id_col, n_grams, logit, score) — logit/score rounded 6 dp.

    Plan shape (100 TB): the weight table is FIXED at ``n_buckets`` rows
    regardless of corpus size — one BROADCAST join onto the slim
    (id, bucket) gram stream plus a map-side-combining per-doc sum; the
    corpus text never shuffles (same shape as ``dsir_weights`` scoring,
    which is this classifier with target/source log-ratio weights)."""
    spark = df.sparkSession
    g = _hashed_grams(df, id_col, text_col, n_buckets)
    wdf = spark.createDataFrame(
        [(int(b), float(w)) for b, w in sorted(weights.items())],
        "b long, w double",
    )
    logit = F.lit(float(bias)) + F.sum(F.coalesce(F.col("w"), F.lit(0.0)))
    return (
        g.join(F.broadcast(wdf), "b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(logit, 6).alias("logit"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias(
                "score"
            ),
        )
    )


def line_repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher line- AND paragraph-level repetition gates (Rae et al.
    2021, Table A1): fraction of duplicate lines/paragraphs and fraction
    of characters inside duplicates — the page-level repetition signals
    complementing ``repetition_stats``' word/bigram fractions.  Lines
    split on ``\\n``, paragraphs on a blank line (``\\n\\n``); blocks are
    trimmed, empties dropped.  Thresholds follow the paper: duplicate
    line/paragraph fraction <= 0.30, duplicate line/paragraph character
    fraction <= 0.20 — ``keep_doc`` requires all four.

    Output: (id_col, n_lines, dup_line_frac, dup_line_char_frac,
    n_paras, dup_para_frac, dup_para_char_frac, keep_doc).

    Plan shape (100 TB): two narrow projections — the split block arrays
    are materialized as ATTRIBUTES first (a HOF lambda that closes over
    an expression re-evaluates it per element — inlined, every distinct
    block would re-split the whole text: the word_chunks discipline),
    then all counting happens in higher-order transforms/aggregates (the
    per-distinct-block recount is O(B²) in the doc's own block count,
    never a shuffle); zero exchanges, text never leaves its task."""

    def split_blocks(sep: str):
        return F.filter(
            F.transform(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep),
                lambda x: F.trim(x),
            ),
            lambda x: x != F.lit(""),
        )

    pre = df.select(
        "*",
        split_blocks("\n").alias("_lines"),
        split_blocks("\n\n").alias("_paras"),
    )

    def block_stats(col_name: str):
        blocks = F.col(col_name)
        db = F.array_distinct(blocks)
        nb = F.size(blocks)
        nd = F.size(db)
        tot_chars = F.aggregate(
            blocks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        dup_chars = F.aggregate(
            F.transform(
                db,
                lambda d: (
                    F.size(F.filter(blocks, lambda x: x == d)) - F.lit(1)
                ).cast("long")
                * F.length(d),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        bf = F.when(
            nb > 0, (nb - nd).cast("double") / nb
        ).otherwise(F.lit(0.0))
        cf = F.when(
            tot_chars > 0, dup_chars.cast("double") / tot_chars
        ).otherwise(F.lit(0.0))
        return nb, bf, cf

    nl, dlf, dlcf = block_stats("_lines")
    np_, dpf, dpcf = block_stats("_paras")
    return pre.select(
        F.col(id_col),
        nl.cast("int").alias("n_lines"),
        F.round(dlf, 6).alias("dup_line_frac"),
        F.round(dlcf, 6).alias("dup_line_char_frac"),
        np_.cast("int").alias("n_paras"),
        F.round(dpf, 6).alias("dup_para_frac"),
        F.round(dpcf, 6).alias("dup_para_char_frac"),
        (
            (dlf <= 0.30) & (dlcf <= 0.20) & (dpf <= 0.30) & (dpcf <= 0.20)
        ).cast("int").alias("keep_doc"),
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.7,
    token_col: str = None,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights (the GPT-3/LLaMA data-
    mixture stage, Brown et al. 2020 §2.2): sampling weight of domain d
    is ``n_d^alpha / sum_d' n_d'^alpha`` — alpha < 1 up-samples small
    domains relative to their raw share, alpha = 1 is proportional
    sampling.  ``n_d`` is the row count, or the token sum when
    ``token_col`` is given.

    Output: (domain_col, n_docs, n_units, raw_share, weight,
    upsample_ratio = weight/raw_share), weights rounded 6 dp.

    Plan shape (100 TB): one map-side-combining groupBy on the domain
    key produces a domains-sized table; the normalization runs over that
    metadata-sized frame via a single-row broadcast-style window (sum
    over an empty partition spec on ~dozens of rows — trivially safe at
    this cardinality)."""
    unit = (
        F.sum(F.col(token_col)).alias("n_units")
        if token_col
        else F.count(F.lit(1)).alias("n_units")
    )
    agg = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"), unit
    )
    w = Window.partitionBy()
    powered = F.pow(F.col("n_units").cast("double"), F.lit(float(alpha)))
    raw_share = F.col("n_units") / F.sum("n_units").over(w)
    weight = powered / F.sum(powered).over(w)
    return agg.select(
        F.col(domain_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_units").cast("long").alias("n_units"),
        F.round(raw_share, 6).alias("raw_share"),
        F.round(weight, 6).alias("weight"),
        F.round(weight / raw_share, 6).alias("upsample_ratio"),
    )


def char_entropy_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_bits: float = 2.0,
) -> DataFrame:
    """Character-distribution Shannon entropy per document — the classic
    gibberish / degenerate-page signal (low entropy = repeated-character
    or boilerplate junk; used as a quality gate in CommonCrawl-derived
    curation pipelines alongside the Gopher rules).

    ``H = -sum_c (n_c/N) * log2(n_c/N)`` over the document's character
    multiset (every character counts, including spaces).  ``keep_doc``
    requires at least ``min_bits`` bits; empty docs score 0.0 and drop.

    Output: (id_col, n_chars, n_distinct, entropy_bits, keep_doc).

    Plan shape (100 TB): zero exchanges — characters never explode into
    rows; the char array is materialized as an ATTRIBUTE before any HOF
    closes over it (inlined, every distinct char would re-split the
    text), counting runs in higher-order transforms over it
    (O(distinct · N) per doc, distinct is alphabet-bounded ~100), and the
    distinct array is SORTED before the accumulating sum so the IEEE
    summation order is deterministic and mirrored by the DuckDB oracle."""
    pre = df.select(
        "*",
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), ""),
            lambda x: x != F.lit(""),
        ).alias("_chars"),
    )
    chars = F.col("_chars")
    n = F.size(chars)
    dc = F.array_sort(F.array_distinct(chars))
    # 0.0 - sum (not unary minus): an all-one-char doc sums to 0.0 and
    # -0.0 vs 0.0 would hash-differ between engines
    ent = F.lit(0.0) - F.aggregate(
        F.transform(
            dc,
            lambda d: (
                F.size(F.filter(chars, lambda x: x == d)).cast("double") / n
            )
            * F.log2(
                F.size(F.filter(chars, lambda x: x == d)).cast("double") / n
            ),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ent = F.when(n > 0, ent).otherwise(F.lit(0.0))
    # empty docs drop regardless of threshold (the documented contract;
    # without the n > 0 guard a min_bits <= 0 would keep them)
    keep = ((n > 0) & (ent >= F.lit(float(min_bits)))).cast("int")
    return pre.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(dc).cast("long").alias("n_distinct"),
        F.round(ent, 6).alias("entropy_bits"),
        keep.alias("keep_doc"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query-term
    set (Robertson & Walker 1994; the Lucene-default ranking function) —
    the retrieval-based corpus-selection primitive complementing
    ``dsir_weights`` (which selects by distribution match rather than by
    query relevance).

    ``score(d) = sum_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the positive Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))``; tokens
    are whitespace-split verbatim (normalize upstream if desired).

    Output: (id_col, n_hits = matching query terms, bm25) — only docs
    containing at least one query term (absent docs score 0 by
    definition); bm25 rounded 6 dp.

    Plan shape (100 TB): the query-term filter lands BEFORE any
    aggregation, so the token stream shrinks to query-term rows at the
    scan side; per-term df is a query-terms-sized frame broadcast back;
    N and avgdl are computed eagerly as ONE metadata row (exact integer
    sum / count, then a single double division — cross-engine-
    deterministic) and folded into the plan as literals (the q_tfidf
    n_docs pattern: no 1-row cross join, so the plan stays free of
    BroadcastNestedLoopJoin and the constants reach codegen).  The
    corpus is scanned twice (token pass + stats action), both
    column-pruned to (id, text) — cheaper at scale than shuffling every
    token to compute lengths in one pass."""
    # token array staged as an ATTRIBUTE: computing size(toks) in the
    # same select as explode(toks) puts it in the projection above the
    # Generate, where it re-runs the split+filter per exploded row
    pre = df.select(
        F.col(id_col),
        F.filter(_words(text_col), lambda x: x != F.lit("")).alias("_tk"),
    )
    dl = pre.select(F.col(id_col), F.size("_tk").alias("_dl"))
    n_docs, avgdl = dl.agg(
        F.count(F.lit(1)),
        F.sum("_dl").cast("double") / F.count(F.lit(1)),
    ).first()
    if not n_docs or avgdl is None:
        # empty corpus: no hit rows can exist; any non-zero constant
        # keeps the (never-evaluated) expressions well-typed
        n_docs, avgdl = 0, 1.0
    hits = (
        pre.select(F.col(id_col), F.size("_tk").alias("_dl"),
                   F.explode("_tk").alias("_term"))
        .filter(F.col("_term").isin(list(query_terms)))
    )
    tf = hits.groupBy(id_col, "_term").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    # tf fans out to BOTH dfreq and the scoring join — without a
    # materialization the corpus token scan would run twice in the lazy
    # plan.  tf is query-terms × docs (slim by construction), so pin it
    # once, the same discipline as the dedup sketch frames.
    tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
    j = tf.join(F.broadcast(dfreq), "_term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(int(n_docs)) - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    den = F.col("_tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("_dl") / F.lit(float(avgdl))
    )
    contrib = idf * (F.col("_tf") * F.lit(float(k1 + 1.0))) / den
    return (
        j.select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.round(F.sum("_c"), 6).alias("bm25"),
        )
    )


def ql_dirichlet_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list,
    mu: float = 2000.0,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet-prior smoothing (Zhai &
    Lafferty 2001, SIGIR) — the language-modeling counterpart to
    ``bm25_scores``: each document is scored by the log-likelihood of
    the query under the document's smoothed unigram LM,

        score(d) = Σ_{t∈Q} ln( (tf_{t,d} + μ·P(t|C)) / (dl_d + μ) )

    with collection model ``P(t|C) = cf_t / |C|`` (collection term
    frequency over total corpus tokens).  Unlike BM25 the sum runs over
    EVERY query term — absent terms contribute the background
    ``ln(μ·P(t|C) / (dl+μ))`` — so two docs differ only through their
    tf vector and length, the property that makes QL rank-equivalent to
    a KL-divergence retrieval model.

    Output: ``(id_col, n_hits, ql)`` for documents containing at least
    one query term (docs with zero hits score pure background — a
    length-only function, omitted by contract like bm25's absent docs);
    ql rounded 6 dp.  Query terms with cf=0 are skipped (their smoothed
    probability is 0 for every doc — undefined log, and they cannot
    discriminate).

    Plan shape (100 TB): identical to bm25_scores — the query-term
    filter shrinks the token stream at the scan; collection stats
    (cf_t, |C|) are ONE eager metadata action folded into the plan as
    literals (exact integer counts, one double division each — cross-
    engine-deterministic); the per-doc score is then a single groupBy
    over the hits frame with the absent-term background added as a
    closed-form expression of dl (no doc×term expansion, no second
    shuffle)."""
    terms = sorted(set(query_terms))
    pre = df.select(
        F.col(id_col),
        F.filter(_words(text_col), lambda x: x != F.lit("")).alias("_tk"),
    )
    # one eager metadata action: total corpus tokens + per-term cf.
    # NB the lambda factory: a 2-arg lambda (x, t=term) would make
    # PySpark bind the ARRAY INDEX to the second parameter (HOF lambdas
    # dispatch on arity), silently comparing tokens to positions
    def _eq(term):
        return lambda x: x == F.lit(term)

    stats_row = pre.select(
        F.size("_tk").alias("_dl"),
        *[
            F.size(F.filter("_tk", _eq(t))).alias(f"_cf_{i}")
            for i, t in enumerate(terms)
        ],
    ).agg(
        F.sum("_dl").alias("_total"),
        *[F.sum(f"_cf_{i}").alias(f"_cf_{i}") for i in range(len(terms))],
    ).first()
    total = int(stats_row["_total"] or 0)
    cf = {t: int(stats_row[f"_cf_{i}"] or 0) for i, t in enumerate(terms)}
    live = [t for t in terms if cf[t] > 0]
    if not live or total == 0:
        return (
            df.select(F.col(id_col))
            .limit(0)
            .select(
                id_col,
                F.lit(0).cast("long").alias("n_hits"),
                F.lit(0.0).alias("ql"),
            )
        )
    p_c = {t: cf[t] / total for t in live}
    hits = (
        pre.select(
            F.col(id_col),
            F.size("_tk").alias("_dl"),
            F.explode("_tk").alias("_term"),
        )
        .filter(F.col("_term").isin(live))
    )
    tf = hits.groupBy(id_col, "_term").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    den = F.col("_dl") + F.lit(float(mu))
    # present-term contribution minus the background it replaces, so the
    # full Σ over all query terms = Σ_present delta + Σ_all background —
    # the background sum is a closed form of dl alone
    mu_p = F.create_map(
        *[x for t in live for x in (F.lit(t), F.lit(mu * p_c[t]))]
    )[F.col("_term")]
    delta = F.log((F.col("_tf") + mu_p) / den) - F.log(mu_p / den)
    bg_terms = [mu * p_c[t] for t in live]
    per_doc = tf.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.sum(delta).alias("_delta"),
        F.first("_dl").alias("_dl"),
    )
    bg = sum(
        (F.log(F.lit(c) / (F.col("_dl") + F.lit(float(mu)))) for c in bg_terms),
        F.lit(0.0),
    )
    return per_doc.select(
        id_col,
        "n_hits",
        F.round(F.col("_delta") + bg, 6).alias("ql"),
    )


def curriculum_buckets(
    df: DataFrame,
    id_col: str,
    measure_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Curriculum-learning bucket assignment (Bengio et al. 2009): rank the
    corpus by an integer difficulty measure (token count, the classic
    short-to-long curriculum; any integer score works) and cut it into
    ``n_buckets`` rank-deciles — the pass that orders training data
    easy-to-hard before sharding.

    Global ntile is NOT scale-safe (one unpartitioned window = the whole
    corpus through one task).  Instead: the exact histogram of the
    measure (groupBy measure — distinct-values-sized, metadata at any
    corpus size for integer measures) gets an exclusive cumulative count,
    and every row joins its measure's ``bucket = floor(n * cum_before /
    total)`` back via broadcast.  Ties are coherent by construction
    (equal measures share a bucket — they never straddle a boundary,
    which also makes the assignment engine-portable: no tie-splitting
    order to disagree on).

    Columns: input + ``bucket`` (0-based)."""
    hist = df.groupBy(F.col(measure_col).alias("_m")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = Window.orderBy("_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy()
    cuts = hist.select(
        "_m",
        (F.sum("_c").over(wcum) - F.col("_c")).alias("_before"),
        F.sum("_c").over(wtot).alias("_total"),
    ).select(
        "_m",
        F.floor(F.lit(n_buckets) * F.col("_before") / F.col("_total"))
        .cast("int")
        .alias("bucket"),
    )
    return df.join(
        F.broadcast(cuts), F.col(measure_col) == F.col("_m")
    ).drop("_m")


def budget_select(
    df: DataFrame,
    id_col: str,
    group_col: str,
    score_col: str,
    cost_col: str,
    budget: int,
) -> DataFrame:
    """Token-budget corpus selection: per group (source/domain), take
    documents in descending ``score_col`` order until the cumulative
    ``cost_col`` (token count) exceeds ``budget`` — the
    quality-first-under-a-budget pass that turns "we can afford 2B
    tokens of web text" into a concrete document set.

    A row survives iff the cumulative cost INCLUDING it stays within
    budget (prefix semantics — one over-budget doc doesn't open the door
    for smaller later ones; that keeps the selected set a pure function
    of the ordering and portable across engines).  Ordering tie-breaks by
    ascending id.

    Columns: ``id, group, score, cost, cum_cost``.

    Scale shape (100 TB): ONE per-group window (sort by score within the
    group's hash partition — the token_packing cumsum discipline; groups
    are sources/domains, so per-group data is large but the window is a
    single sort-based aggregation, no join, no global sort).  Skewed
    mega-groups are handled upstream the same way packing does it
    (split the group key); the output is budget-bounded by construction."""
    w = (
        Window.partitionBy("group")
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("group"),
            F.col(score_col).alias("score"),
            F.col(cost_col).alias("cost"),
        )
        .withColumn("cum_cost", F.sum("cost").over(w))
        .filter(F.col("cum_cost") <= F.lit(budget))
    )


def dictionary_tag(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
) -> DataFrame:
    """Dictionary tagging: occurrence counts of a fixed term list per
    document — the keyword/PII-lexicon/blocklist pass (domain tagging,
    compliance term sweeps) for dictionaries small enough to inline.
    Counting is pure Catalyst string arithmetic per term
    (``(len(text) - len(replace(text, term))) / len(term)`` — no regex,
    no UDF), so the whole tag table falls out of ONE projection +
    explode; rows emit only for terms that actually occur.

    Columns: ``id, term, hits``.

    Scale shape (100 TB): the dictionary is a literal expression (zero
    joins, zero broadcast state); cost is O(len(text) * n_terms) scan
    CPU inside whole-stage codegen; output is corpus x dictionary
    bounded by occurrence.  Dictionaries beyond a few hundred terms
    belong in an Aho-Corasick pandas UDF instead — this is the
    inline-literal fast path."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    tagged = F.array(
        *[
            F.struct(
                F.lit(term).alias("term"),
                (
                    (F.length(t) - F.length(F.replace(t, F.lit(term))))
                    / F.lit(len(term))
                )
                .cast("int")
                .alias("hits"),
            )
            for term in terms
        ]
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tagged).alias("_t"))
        .select("id", F.col("_t.term").alias("term"), F.col("_t.hits").alias("hits"))
        .filter(F.col("hits") > 0)
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    bin_width: float = 256.0,
    round_to: int = 6,
) -> DataFrame:
    """Cross-source score harmonization by quantile normalization: each
    row's value is replaced by the GLOBAL value at the same within-group
    quantile, so every source ends up with the pooled distribution —
    the fix for 'source A's quality scores run hot' before a single
    threshold is applied corpus-wide (the microarray-normalization
    classic, applied to curation scores).

    Mapping is exact order-statistic arithmetic, no interpolation:
    within-group rank r (ties broken by ``id_col`` — deterministic),
    global position ``k = ceil(r·N / n_g)`` computed as INTEGER
    arithmetic ``(r·N + n_g − 1) div n_g``, and the normalized value is
    the k-th smallest global value — found by joining k into the
    per-distinct-value cumulative-count intervals ``[cum−t+1, cum]``
    via the repo's bucketized range join (never a nested-loop).

    Columns: ``id, group, value, k, normalized``.

    Scale shape: one shuffle for the per-group rank window; the global
    interval frame is value-cardinality (built with the mann_whitney_u
    distinct-value discipline — the corpus never crosses an
    unpartitioned window); the bin equi-join fans each interval to
    ``~len/bin_width`` rows.  Pick bin_width near N/V (average run of
    equal values)."""
    from .rangejoin import range_join

    d = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(value_col).cast("double").alias("value"),
    ).localCheckpoint(eager=False)
    wg = Window.partitionBy("group")
    wr = Window.partitionBy("group").orderBy("value", "id")
    ranked = d.select(
        "id",
        "group",
        "value",
        F.row_number().over(wr).alias("_r"),
        F.count(F.lit(1)).over(wg).alias("_ng"),
    )
    n_total = d.groupBy().agg(F.count(F.lit(1)).alias("_N"))
    points = ranked.crossJoin(F.broadcast(n_total)).select(
        "id",
        "group",
        "value",
        F.floor(
            (F.col("_r") * F.col("_N") + F.col("_ng") - 1) / F.col("_ng")
        ).alias("k"),
        F.lit(1).alias("_key"),
    )
    vc = d.groupBy("value").agg(F.count(F.lit(1)).alias("_t"))
    wv = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    intervals = vc.select(
        F.col("value").alias("normalized"),
        (F.sum("_t").over(wv) - F.col("_t") + 1).alias("_lo"),
        F.sum("_t").over(wv).alias("_hi"),
        F.lit(1).alias("_key"),
    )
    out = range_join(
        points,
        intervals,
        on=["_key"],
        point_col="k",
        start_col="_lo",
        end_col="_hi",
        bin_width=float(bin_width),
    )
    return out.select("id", "group", "value", "k", "normalized")


def naive_bayes_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Multinomial Naive Bayes with Laplace smoothing, trained and
    applied over the same frame (the resubstitution audit: how
    separable are the labels under a bag-of-words model — a label
    whose own training rows misclassify is noise, the cheap
    label-quality gate before spending GPU time on a real classifier).

    ``score(d, c) = ln P(c) + Σ_t tf_{t,d} · ln p(t|c)`` with
    ``p(t|c) = (n_{t,c}+1) / (N_c + V)``.  The smoothed-absent-term
    algebra is folded closed-form so NO doc×class×vocab grid ever
    exists:

        score = ln P(c) − dl_d · ln(N_c + V) + Σ_{t: n_{t,c}>0} tf·ln(n_{t,c}+1)

    (absent terms add ln(1) = 0 to the hit sum).  Prediction is the
    round-9 score argmax, ties broken by label ascending — the
    engine-portable contract.

    Columns: ``id, label, predicted, score`` (winning score, round 6).

    Scale shape: tokens collapse to (doc, term, tf) and (class, term)
    counts map-side; the ONE corpus-scale join is doc-term ⋈
    class-term on the term key (AQE picks broadcast when the model
    side is small); class constants (priors, smoothed denominators)
    are class-count-sized driver metadata folded in as literals, like
    the IVF centroid table."""
    import math

    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.explode(
            F.filter(_words(text_col), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    doc_term = toks.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    class_term = toks.groupBy("label", "term").agg(
        F.count(F.lit(1)).alias("ntc")
    )
    class_term = class_term.localCheckpoint(eager=True)  # model table
    vocab_size = class_term.select("term").distinct().count()
    cls = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("docs"))
        .collect()
    )
    n_docs = sum(r.docs for r in cls)
    tok_per_class = {
        r.label: r.ntc
        for r in class_term.groupBy("label")
        .agg(F.sum("ntc").alias("ntc"))
        .collect()
    }
    classes = sorted(r.label for r in cls)
    prior = {r.label: r.docs / n_docs for r in cls}
    denom = {
        c: math.log(tok_per_class.get(c, 0) + vocab_size) for c in classes
    }
    # hit sums: one equi-join on term, then (doc, class)-keyed aggregate
    hits = (
        doc_term.join(
            class_term.select(
                "term", F.col("label").alias("_c"), "ntc"
            ),
            "term",
        )
        .groupBy("id", "_c")
        .agg(F.sum(F.col("tf") * F.log(F.col("ntc") + 1)).alias("_h"))
        .groupBy("id")
        .pivot("_c", classes)
        .agg(F.first("_h"))
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.size(F.filter(_words(text_col), lambda x: x != F.lit(""))).alias(
            "_dl"
        ),
    ).join(hits, "id", "left")
    # per-class score columns; argmax via struct array (round-9 rank,
    # tie -> ascending label encoded as descending index)
    k = len(classes)
    scores = [
        (
            F.lit(math.log(prior[c]))
            - F.col("_dl") * F.lit(denom[c])
            + F.coalesce(F.col(f"`{c}`"), F.lit(0.0))
        ).alias(f"_s_{i}")
        for i, c in enumerate(classes)
    ]
    scored = base.select("id", "label", "_dl", *scores)
    arr = F.array(
        *[
            F.struct(
                F.round(F.col(f"_s_{i}"), 9).alias("r"),
                F.lit(k - i).alias("tb"),
                F.col(f"_s_{i}").alias("s"),
                F.lit(c).alias("c"),
            )
            for i, c in enumerate(classes)
        ]
    )
    best = F.array_max(arr)
    return scored.select(
        "id",
        "label",
        best["c"].alias("predicted"),
        F.round(best["s"], round_to).alias("score"),
    )


def effective_sample_size(weighted: DataFrame, weight_col: str) -> DataFrame:
    """Kish effective sample size of a weighted corpus:
    ``ESS = (sum w)^2 / sum w^2`` — the number of EQUALLY-weighted
    examples the weighted mix is statistically worth.  The one-row audit
    to run after ANY reweighting (SoftDeDup, DSIR, IPW): an aggressive
    scheme that collapses ESS to 2% of n bought its bias reduction with
    almost all of the data's variance-reduction power.

    Returns ``n, sum_w, ess, ess_ratio`` (ratio to the unweighted n).
    ONE map-side-combined aggregate.
    """
    w = F.col(weight_col).cast("double")
    return weighted.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(w), 6).alias("sum_w"),
        F.round(
            (F.sum(w) * F.sum(w)) / F.sum(w * w), 6
        ).alias("ess"),
        F.round(
            (F.sum(w) * F.sum(w)) / F.sum(w * w) / F.count(F.lit(1)),
            6,
        ).alias("ess_ratio"),
    )


def compression_ratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    level: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """zlib compression ratio per document (compressed bytes / raw
    bytes): the cheap redundancy oracle the Gopher/FineWeb lineage uses
    as a quality signal — boilerplate and templated spam compress far
    below prose (ratio ≪ human text), random noise compresses above 1.
    The whole-document complement to the n-gram repetition gates
    (``gopher_repetition``), catching long-range duplication those
    windows miss.

    Returns ``<id_col>, n_bytes, ratio`` (ratio NULL for empty text).

    Plan: ONE Arrow-batched pandas UDF (zlib is C-speed; the batch
    transfer dominates) — no shuffle at all; the operator is
    embarrassingly parallel and composes with any upstream scan.
    NOT SQL-expressible (no zlib in DuckDB), so its registry entry is
    rows-only by design; correctness is pinned by the differential
    pytest against the same zlib on literal texts.
    """
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            b = (t or "").encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, lvl)) / len(b)

        return s.map(one)

    return df.select(
        F.col(id_col),
        F.octet_length(F.coalesce(F.col(text_col), F.lit(""))).alias(
            "n_bytes"
        ),
        F.round(_ratio(F.col(text_col)), round_to).alias("ratio"),
    )
