"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship extraction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL twin where the semantics are
SQL-expressible (pandas-UDF kernels and approximate ops are rows-only).

Cross-engine parity rules used throughout:
- DuckDB ``regexp_replace`` needs the ``'g'`` flag; Spark replaces all.
- ASCII character classes (no ``\\w``) so Java regex == RE2.
- Money aggregates summed as DECIMAL(18,4) (exact) then rounded and cast
  to DOUBLE, so FP summation order cannot flip the hash.
- Every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------- helpers

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(c, scale=4):
    return F.sum(F.col(c).cast(f"decimal(18,{scale})"))


# DuckDB twins of functions/text.py expressions (keep in sync)
_NORM_SQL = (
    "lower(trim(regexp_replace(regexp_replace(coalesce(text,''),"
    " '[^a-zA-Z0-9_ \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+', ' ', 'g')))"
)
_TOK_SQL = "len(regexp_extract_all(coalesce(text,''), '[^ \\t\\n\\r]+'))"
_PUNCT_SQL = (
    "len(regexp_extract_all(coalesce(text,''), '[^a-zA-Z0-9 \\t\\n\\r]'))"
    " / greatest(length(coalesce(text,'')), 1)"
)


def _stop_sql(lang_words):
    # DuckDB standard strings do NOT process backslash escapes, so a single
    # backslash in the SQL text reaches RE2 as the regex escape \b.
    words = "|".join(lang_words)
    return f"len(regexp_extract_all(lower(coalesce(text,'')), '\\b(?:{words})\\b'))"


# ---------------------------------------------------------------- queries

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style rollup (G6/G9 partial+final agg pattern)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").alias("_sq"),
            _dec_sum("l_extendedprice").alias("_sp"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            F.round(F.col("_sq").cast("double") / F.col("count_order"), 4).alias("avg_qty"),
            "count_order",
        )
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_customer_revenue(spark, sf_dir):
    """Broadcast-dim join + top-10 (J3/J6 broadcast-join pattern)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    out = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(_dec_sum("o_totalprice", 2).alias("_rev"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "n_orders",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )
    return out


Q_CUSTOMER_REVENUE_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


def q_region_revenue(spark, sf_dir):
    """Star-join rollup through two broadcast dims (J3 chain)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    out = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(_dec_sum("o_totalprice", 2).alias("_rev"))
        .select("r_name", F.col("_rev").cast("double").alias("revenue"))
    )
    return out


Q_REGION_REVENUE_SQL = """
SELECT r_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (G2 window-cumsum pattern): new
    session when the gap to the previous event of the same user > 30 min."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800)
    ).cast("int")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("session_id", F.sum(new_sess).over(cum))
    out = (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )
    return out


Q_EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (SELECT f.user_id, f.event_id, f.new_sess FROM flagged f)
)
SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


def q_events_islands(spark, sf_dir):
    """Consecutive same-type runs per user — the exact sectionization
    window (G2, classification/service.py:1823-1884 analog) on a
    driver-provided table."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    change = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("int")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = e.withColumn("island", F.sum(change).over(cum))
    out = (
        isl.groupBy("user_id")
        .agg(
            F.max("island").alias("n_islands"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )
    return out


Q_EVENTS_ISLANDS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
              OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
isl AS (
  SELECT user_id,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, MAX(island) AS n_islands, COUNT(*) AS n_events
FROM isl GROUP BY user_id ORDER BY user_id
"""


def q_events_metering(spark, sf_dir):
    """Metering merge analog (G6, utils/__init__.py:73-96): JSON counter
    extraction + groupBy sum."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("total_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )
    return out


Q_EVENTS_METERING_SQL = """
SELECT event_type,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS total_k,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_doc_normalize(spark, sf_dir):
    """P8 comparator normalization (comparator.py:86-101), pure Catalyst."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        normalized_for_compare,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        normalized_for_compare(F.coalesce(F.col("text"), F.lit(""))).alias("norm_text"),
    )


Q_DOC_NORMALIZE_SQL = f"SELECT doc_id, {_NORM_SQL} AS norm_text FROM documents"


def q_doc_line_join(spark, sf_dir):
    """P1/P3 plain-text LINE-join fallback (ocr/service.py:1622-1630) as
    higher-order functions."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import line_join

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", line_join(F.coalesce(F.col("text"), F.lit(""))).alias("joined")
    )


Q_DOC_LINE_JOIN_SQL = """
SELECT doc_id,
       array_to_string(
         list_filter(list_transform(str_split(coalesce(text,''), chr(10)), x -> trim(x)),
                     x -> x <> ''),
         chr(10)) AS joined
FROM documents
"""


def q_doc_token_stats(spark, sf_dir):
    """Token counting + punctuation ratio (quality-scoring features)."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        punct_ratio,
        token_count,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    )


Q_DOC_TOKEN_STATS_SQL = f"""
SELECT doc_id, {_TOK_SQL} AS n_tokens, ROUND({_PUNCT_SQL}, 6) AS punct_ratio
FROM documents
"""


def q_doc_lang_id(spark, sf_dir):
    """Stopword-vote language id (text-analysis op; deterministic
    tie-break)."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import lang_id

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return d.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


def _lang_id_sql():
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import STOPWORDS

    en = _stop_sql(STOPWORDS["en"])
    es = _stop_sql(STOPWORDS["es"])
    de = _stop_sql(STOPWORDS["de"])
    fr = _stop_sql(STOPWORDS["fr"])
    cjk = "len(regexp_extract_all(coalesce(text,''), '[\\x{4e00}-\\x{9fff}]')) > 0"
    return f"""
SELECT doc_id,
  CASE WHEN {cjk} THEN 'zh'
       WHEN greatest({en},{es},{de},{fr}) = 0 THEN 'unknown'
       WHEN {en} = greatest({en},{es},{de},{fr}) THEN 'en'
       WHEN {es} = greatest({en},{es},{de},{fr}) THEN 'es'
       WHEN {de} = greatest({en},{es},{de},{fr}) THEN 'de'
       ELSE 'fr' END AS lang_guess
FROM documents
"""


def q_doc_quality(spark, sf_dir):
    """Composite quality score (length/punct/stopword heuristic)."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        quality_score,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


def _quality_sql():
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import STOPWORDS

    stop = _stop_sql(STOPWORDS["en"])
    return f"""
SELECT doc_id,
  ROUND(0.4 * least(CAST({_TOK_SQL} AS DOUBLE) / 100.0, 1.0)
      + 0.3 * (1.0 - least(CAST({_PUNCT_SQL} AS DOUBLE) * 4.0, 1.0))
      + 0.3 * least(CAST({stop} AS DOUBLE) / greatest({_TOK_SQL}, 1) * 5.0, 1.0), 4)
  AS quality
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprint = md5 of normalized text (rolling-hash class)."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


Q_DOC_FINGERPRINT_SQL = f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents"


def q_doc_classify(spark, sf_dir):
    """Regex class cascade (P13, classification/service.py:570-596)."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        turn_class_col,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return d.select("doc_id", turn_class_col(F.col("text")).alias("doc_class"))


def _classify_sql():
    from accelerated_intelligent_document_processing_on_aws_spark.kernels.classify import (
        DEFAULT_CLASSES,
    )

    whens = []
    fallback = "unknown"
    for name, rx in DEFAULT_CLASSES:
        if rx is None:
            fallback = name
            continue
        whens.append(f"WHEN regexp_matches(coalesce(text,''), '{rx}') THEN '{name}'")
    return (
        "SELECT doc_id, CASE "
        + " ".join(whens)
        + f" ELSE '{fallback}' END AS doc_class FROM documents"
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups via fingerprint hash-groupBy."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        exact_duplicates,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return exact_duplicates(d, "doc_id", "text").select(
        "fp", "n_docs", "keeper_id"
    )


Q_DEDUP_EXACT_SQL = f"""
SELECT md5({_NORM_SQL}) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 for the first 10 vectors (exact ANN
    baseline; zip_with/aggregate JVM-side math)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return brute_force_topk(e, q, "vec_id", "embedding", k=5)


Q_KNN_COSINE_SQL = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT qid, e.vec_id AS nid, qv, CAST(e.embedding AS DOUBLE[]) AS ev
  FROM q, embeddings e WHERE e.vec_id <> qid
),
scored AS (
  SELECT qid, nid,
    ROUND(list_inner_product(qv, ev)
          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(ev, ev))),
          6) AS sim
  FROM pairs
),
ranked AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
  FROM scored
)
SELECT qid AS query_id, nid AS neighbor_id, rn AS rank, sim
FROM ranked WHERE rn <= 5
"""


def q_transcript_extract(spark, sf_dir):
    """Flagship non-SQL op: full extraction pipeline (pandas-UDF kernels +
    classification + sectionization) over deterministic synthetic
    transcripts (rows-only driver check)."""
    from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
    from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
        gen_transcripts_df,
    )

    df = gen_transcripts_df(spark, n_convs=40, mean_turns=8, skew_convs=2, skew_factor=10)
    out = extract_stage(df)
    return out.select(
        "conv_id",
        "turn_idx",
        "turn_class",
        "section_id",
        F.length("extracted_text").alias("n_extracted_chars"),
        F.size("spans").alias("n_spans"),
    ).orderBy("conv_id", "turn_idx")


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates (rows-only: approximate op)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    ).filter(F.length("text") > 0)
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


def q_simhash(spark, sf_dir):
    """SimHash near-dup pairs (rows-only: hash-dependent op)."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        simhash_pairs,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    ).filter(F.length("text") > 0)
    return simhash_pairs(d, "doc_id", "text", max_hamming=6).orderBy("id_a", "id_b")


def q_evaluate_exact(spark, sf_dir):
    """Evaluation harness (J1 golden join + EXACT comparator + G9 rollup):
    actual = text, expected = UPPER(text) — normalization-insensitive
    match must be 100%."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_turns,
        metrics_rollup,
    )

    d = (
        _t(spark, sf_dir, "documents")
        .withColumn("text", F.coalesce(F.col("text"), F.lit("")))
        .select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text",
        )
    )
    actual = d.select("conv_id", "turn_idx", F.col("text").alias("extracted_text"))
    golden = d.select(
        "conv_id", "turn_idx", F.upper(F.col("text")).alias("extracted_text")
    )
    ev = evaluate_turns(actual, golden, method="EXACT")
    return metrics_rollup(ev).select("n", "tp", "fp", "fn", "precision", "recall", "f1")


Q_EVALUATE_EXACT_SQL = """
SELECT COUNT(*) AS n, COUNT(*) AS tp, 0 AS fp, 0 AS fn,
       1.0 AS precision, 1.0 AS recall, 1.0 AS f1
FROM documents
"""


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extraction pipeline semantics over the sf0.001 documents
    table treated as single-turn conversations — normalize, classify,
    fingerprint, quality — plus corpus rollup by language."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
        turn_class_col,
    )

    d = _t(spark, SF_DEFAULT, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    enriched = d.select(
        "doc_id",
        "lang",
        turn_class_col(F.col("text")).alias("doc_class"),
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )
    return (
        enriched.groupBy("lang", "doc_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .orderBy("lang", "doc_class")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q_customer_revenue": q_customer_revenue,
        "q_region_revenue": q_region_revenue,
        "q_events_sessionize": q_events_sessionize,
        "q_events_islands": q_events_islands,
        "q_events_metering": q_events_metering,
        "q_doc_normalize": q_doc_normalize,
        "q_doc_line_join": q_doc_line_join,
        "q_doc_token_stats": q_doc_token_stats,
        "q_doc_lang_id": q_doc_lang_id,
        "q_doc_quality": q_doc_quality,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_doc_classify": q_doc_classify,
        "q_dedup_exact": q_dedup_exact,
        "q_knn_cosine": q_knn_cosine,
        "q_evaluate_exact": q_evaluate_exact,
        "q_transcript_extract": q_transcript_extract,
        "q_minhash_lsh": q_minhash_lsh,
        "q_simhash": q_simhash,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": Q1_SQL,
        "q_customer_revenue": Q_CUSTOMER_REVENUE_SQL,
        "q_region_revenue": Q_REGION_REVENUE_SQL,
        "q_events_sessionize": Q_EVENTS_SESSIONIZE_SQL,
        "q_events_islands": Q_EVENTS_ISLANDS_SQL,
        "q_events_metering": Q_EVENTS_METERING_SQL,
        "q_doc_normalize": Q_DOC_NORMALIZE_SQL,
        "q_doc_line_join": Q_DOC_LINE_JOIN_SQL,
        "q_doc_token_stats": Q_DOC_TOKEN_STATS_SQL,
        "q_doc_lang_id": _lang_id_sql(),
        "q_doc_quality": _quality_sql(),
        "q_doc_fingerprint": Q_DOC_FINGERPRINT_SQL,
        "q_doc_classify": _classify_sql(),
        "q_dedup_exact": Q_DEDUP_EXACT_SQL,
        "q_knn_cosine": Q_KNN_COSINE_SQL,
        "q_evaluate_exact": Q_EVALUATE_EXACT_SQL,
        # q_transcript_extract / q_minhash_lsh / q_simhash: non-SQL ops,
        # rows-only driver check by design.
    }
