"""Physical-plan shape assertions (.explain-driven, SURVEY.md §4).

These pin the scale-critical plan properties so a regression (lost
broadcast, extra shuffle, filter not pushed, Python sneaking into a
Catalyst-only path) fails CI rather than silently costing 10x at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark import (
    PipelineConfig,
    extract_stage,
)
from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)


from accelerated_intelligent_document_processing_on_aws_spark.plans import (
    assert_scale_safe,
    n_ops,
    plan_of,
)


@pytest.fixture(scope="module")
def turns(spark):
    return gen_transcripts_df(spark, n_convs=10, mean_turns=5)


def test_extract_stage_exchange_budget(spark, turns):
    """Exactly two exchanges end-to-end: the salted bucket repartition and
    the conv_id window — nothing else may shuffle."""
    full = extract_stage(turns)
    assert n_ops(plan_of(full), "Exchange") == 2
    nosect = extract_stage(turns, PipelineConfig(with_sections=False))
    assert n_ops(plan_of(nosect), "Exchange") == 1


def test_extraction_udf_is_arrow_batched(spark, turns):
    """The kernel runs as ArrowEvalPython (vectorized), never as row-wise
    BatchEvalPython."""
    p = plan_of(extract_stage(turns, PipelineConfig(with_sections=False)))
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p


def test_dim_join_broadcasts(spark):
    """Small-dim joins must plan BroadcastHashJoin, not sort-merge."""
    import __spark_entry__ as em

    p = plan_of(em.q_customer_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_filter_pushdown_reaches_scan(spark):
    """A column filter must appear as PushedFilters in the parquet scan."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = d.filter(F.col("doc_id") > 100).select("doc_id", "lang")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in p
    # column pruning: text column must NOT be read for this projection
    assert "ReadSchema" in p and "text" not in p.split("ReadSchema")[1].split("\n")[0]


def test_exact_eval_is_pure_catalyst(spark):
    """EXACT/NUMERIC comparators must not invoke Python at all."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
        evaluate_turns,
    )

    a = spark.createDataFrame([("c", 0, "x")], ["conv_id", "turn_idx", "extracted_text"])
    g = spark.createDataFrame([("c", 0, "x")], ["conv_id", "turn_idx", "extracted_text"])
    p = plan_of(evaluate_turns(a, g, method="EXACT"))
    # no UDF evaluation nodes (the createDataFrame scan itself mentions
    # "PythonRDD" — that's the test fixture, not the operator)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # FUZZY is pure Catalyst too since the F.levenshtein rewrite
    p2 = plan_of(evaluate_turns(a, g, method="FUZZY"))
    assert "ArrowEvalPython" not in p2 and "BatchEvalPython" not in p2
    assert "levenshtein" in p2
    # SEMANTIC is the one comparator that goes through an Arrow batch UDF
    p3 = plan_of(evaluate_turns(a, g, method="SEMANTIC"))
    assert "ArrowEvalPython" in p3


def test_whole_stage_codegen_covers_text_functions(spark):
    """functions/text.py expressions stay inside WholeStageCodegen spans."""
    from accelerated_intelligent_document_processing_on_aws_spark.functions.text import (
        fingerprint,
        quality_score,
        token_count,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = d.select(
        token_count(F.col("text")).alias("t"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("f"),
    )
    p = plan_of(q)
    # formatted mode marks codegen'd operators with "[codegen id : N]";
    # the Project computing all three expressions must carry one
    assert "[codegen id :" in p.split("(3) Project")[1][:40]


def test_well_split_scan_skips_spread_exchange(spark, tmp_path):
    """A file-backed scan with >= parallelism splits needs no pre-extraction
    shuffle: parquet byte-splits are even and the UDF is per-row, so the
    only exchange left is the conv-keyed sectionization window."""
    from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
    from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
        gen_transcripts_df,
    )

    path = str(tmp_path / "wide")
    gen_transcripts_df(spark, n_convs=30, mean_turns=5).repartition(16).write.parquet(path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    p = plan_of(extract_stage(df))
    assert n_ops(p, "Exchange") == 1


def test_embed_neardup_is_equi_join(spark):
    """The certified embedding near-dup path must plan the banded-LSH
    EQUI-join on (band, bucket) — an all-pairs BroadcastNestedLoopJoin is
    O(n^2) and fatal at scale (round-2 judge finding)."""
    import __spark_entry__ as em

    df = getattr(em, "q_embed_neardup")(spark, "/root/testdata/sf0.001")
    p = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # and the LSH top-k path likewise
    p2 = plan_of(getattr(em, "q_lsh_topk")(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in p2
    assert "CartesianProduct" not in p2


def test_ivf_topk_is_broadcast_equi_join(spark):
    """IVF candidates must meet on an equi-join on cell with the (small)
    probe side broadcast — the corpus never shuffles and there is no
    all-pairs nested-loop fallback."""
    import __spark_entry__ as em

    df = getattr(em, "q_ivf_topk")(spark, "/root/testdata/sf0.001")
    p = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_range_joins_are_equi_joins(spark):
    """Bucketized range joins must never fall back to the nested-loop plan
    Spark gives a raw range predicate."""
    import __spark_entry__ as em

    for q in ("q_range_join", "q_interval_overlap"):
        p = plan_of(getattr(em, q)(spark, "/root/testdata/sf0.001"))
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "CartesianProduct" not in p, q


def test_new_catalyst_queries_have_no_python(spark):
    """Session windows, quantiles, pivot, rollup, stratified sampling,
    incremental dedup and tf-idf are pure-Catalyst paths — no Arrow or
    row-wise Python may appear in their plans."""
    import __spark_entry__ as em

    for q in (
        "q_session_window",
        "q_value_quantiles",
        "q_events_pivot",
        "q_events_rollup",
        "q_sample_stratified",
        "q_dedup_incremental",
        "q_tfidf_terms",
    ):
        p = plan_of(getattr(em, q)(spark, "/root/testdata/sf0.001"))
        assert "ArrowEvalPython" not in p, q
        assert "BatchEvalPython" not in p, q


def test_curation_queries_pure_catalyst_no_nested_loop(spark):
    """The corpus-curation ops (chunk dedup, decontamination, repetition
    gate, PII redaction, sliding chunks, domain stats) are pure Catalyst:
    no Python eval anywhere, and no nested-loop/cartesian join may appear
    (every join is an equi-join on a hash key)."""
    import __spark_entry__ as em

    for q in (
        "q_chunk_dedup",
        "q_decontaminate",
        "q_quality_repetition",
        "q_pii_redact",
        "q_text_chunks",
        "q_domain_stats",
        "q_curate_corpus",
    ):
        p = plan_of(getattr(em, q)(spark, "/root/testdata/sf0.001"))
        assert "ArrowEvalPython" not in p, q
        assert "BatchEvalPython" not in p, q
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "CartesianProduct" not in p, q


def test_decontaminate_broadcasts_eval_shingles(spark):
    """The contamination join must broadcast the (small) eval shingle set
    so the train side never shuffles for the check."""
    import __spark_entry__ as em

    p = plan_of(getattr(em, "q_decontaminate")(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p


def test_incremental_dedup_is_anti_join_on_fingerprints(spark):
    """dedup_against must plan a LeftAnti hash join keyed on the md5
    fingerprint, with the corpus side reduced by an aggregate (distinct)
    below the join."""
    import __spark_entry__ as em

    p = plan_of(getattr(em, "q_dedup_incremental")(spark, "/root/testdata/sf0.001"))
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_no_query_plans_nested_loop_or_rowwise_python(spark):
    """Whole-registry sweep: NO query may plan a CartesianProduct or a
    row-at-a-time BatchEvalPython, and BroadcastNestedLoopJoin may appear
    only where a tiny broadcast side meets a non-equi predicate by
    design: the brute-force ANN baselines (q_knn_cosine and
    q_rrf_fusion's two base rankings — tiny query side broadcast over
    the never-shuffled corpus; scale paths are q_lsh_topk / q_ivf_topk),
    the group-pair joins of q_prop_ztest and q_welch_ttest (BOTH sides
    are per-group aggregates, group-cardinality² rows regardless of
    corpus size), and q_chi2's margin cross-join (R×C contingency grid
    reconstructed from two category-cardinality margin frames — the
    zero-observation cells are required or chi2 deflates).
    Pins the audit run in round 3 so a future query cannot silently
    regress to an all-pairs or per-row-Python plan."""
    import __spark_entry__ as em

    bnlj_allowed = {
        "q_knn_cosine",
        "q_rrf_fusion",
        "q_prop_ztest",
        "q_welch_ttest",
        "q_chi2",
        # one-row corpus-total attach onto the bounded rule frame
        # (constant-key broadcast; build side is a single row)
        "q_assoc_rules",
        # one-row Bloom bitmap replicated to the probe side (build side
        # is exactly one metadata-sized row by construction — the probe
        # table never shuffles, which is the operator's whole point)
        "q_bloom_filter",
        # contains the documented brute-force exact baseline as the
        # recall denominator (the approximate side is the LSH equi-join)
        "q_ann_recall",
        # candidate generation is the documented brute-force baseline
        # (top-10 per query); the MMR rounds themselves are equi-joins
        # over candidate-sized frames
        "q_mmr_select",
        # one-row distinct-bigram total attached to the types-sized
        # stats frame (the q_assoc_rules constant-attach shape)
        "q_kn_bigrams",
        # inherits q_prop_ztest's group-pair join (both sides per-group
        # aggregates — group-cardinality² rows regardless of corpus size)
        "q_fdr_correction",
        # 1-row scalar attaches (the q_assoc_rules constant-attach
        # shape): Fleiss joins the 1-row pair-count total to the 1-row
        # category-square total; effect-size joins three 1-row moment/
        # rank frames; Bradley-Terry attaches the 1-row normalization
        # total to the items-sized strengths each MM round
        "q_fleiss_kappa",
        "q_effect_size",
        "q_bradley_terry",
        # same 1-row scalar-attach shape: Krippendorff joins the 1-row
        # unit-sums total to the 1-row category-square total
        "q_krippendorff",
        # 1-row attaches again: Simpson joins the pooled-diff row to the
        # strata frame; Platt broadcasts the 1-row (a, b) params onto the
        # data each Newton step; the stump attaches the 1-row total to
        # the bounded distinct-value frame
        "q_simpsons",
        "q_platt",
        "q_stump",
        # 1-row estimate joined to the 1-row percentile-bounds frame
        "q_bootstrap_ci",
        # 1-row threshold attached to the (k+1)-row top frame
        "q_hill_tail",
        # 1-row global prior attached to the (cat, fold) encoding table
        "q_target_encode",
        # 1-row params / bounds attaches (the q_platt shape)
        "q_huber",
        "q_rolling_distinct",
        # four 1-row scalar frames (exact, estimate, key counts) chained
        "q_join_size",
        # Newton-param 1-row broadcast each step (the q_platt shape)
        "q_ipw_ate",
        "q_smd_balance",
        # PAV minimax runs j<=i<=k interval joins over the BINS frame
        # (n_bins³ = 1000 rows at the default — metadata algebra, the
        # Hungarian/BH-FDR class, corpus-size-independent)
        "q_isotonic_fit",
        # 1-row global-count broadcast onto the ranked frame (the value
        # lookup itself is the bucketized range join — bin EQUI-join)
        "q_quantile_norm",
        # groups×top-50-vocab grid materialization (absent terms must
        # count as frequency 0 for the z-scores): both sides are
        # aggregate outputs — n_groups rows × top_terms rows, metadata-
        # sized by construction, corpus-size-independent
        "q_burrows_delta",
        # 1-row scalar attaches (the q_fleiss_kappa shape): the MI/chi2
        # aggregate joins the 1-row entropy frames
        "q_mutual_info",
        # i<j pair join over the ~30-row day frame (the q_prop_ztest
        # group-pair class — both sides per-day aggregates, days² pairs
        # regardless of corpus size)
        "q_kendall_tau",
        # 1-row scalar attaches (the q_fleiss_kappa shape): the tie
        # census / grand-total frames join the k-row group frame
        "q_kruskal",
        # 1-row k-count broadcast onto the per-(block, treatment) frame
        # (the q_platt params-onto-data shape) + 1-row tie census
        "q_friedman",
        # 1-row edge-count and node-count frames attached to the
        # community-sized terms frame
        "q_modularity",
        # 1-row n attached to the bounded audit sample (KS/AD rank math
        # needs the total alongside each rank)
        "q_ad_uniform",
        "q_exp_fit",
        # inherits q_prop_ztest's group-pair join (the q_fdr_correction
        # class — both sides per-group aggregates)
        "q_holm",
        # 1-row H(label) frame attached to the feature-cardinality IG
        # frame (the q_fleiss_kappa scalar-attach shape)
        "q_info_gain",
        # 1-row shrink-factor frame attached to the k-row source-means
        # frame (the q_fleiss_kappa scalar-attach shape)
        "q_james_stein",
        # 1-row sample-size frame attached to the audit-sized ranked
        # sample (the pairing split needs n/2 alongside every rank)
        "q_sim_pairs",
        # 1-row rounded-beta params broadcast onto the per-day residual
        # frame (the q_platt params-onto-data shape)
        "q_durbin_watson",
        # contains the brute-force exact denominator (the q_ann_recall
        # shape) for the six-config IVF-PQ recall sweep
        "q_ivfpq_recall",
    }
    for name, f in em.queries().items():
        p = plan_of(f(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name
        # a certification suite unions its members' plans, so it inherits
        # BNLJ permission iff one of its members carries it
        allowed = name in bnlj_allowed or any(
            m in bnlj_allowed for m in em._SUITES.get(name, ())
        )
        if not allowed:
            assert "BroadcastNestedLoopJoin" not in p, name


def test_plan_report_and_scale_gate(spark):
    """plans.plan_report surfaces the audit facts (pushdown, pruning,
    python-eval kinds, join strategies) and assert_scale_safe enforces the
    registry-wide gate programmatically."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = d.filter(F.col("doc_id") < 10).select("doc_id", "text")
    rep = assert_scale_safe(q, max_exchanges=0)
    assert rep["pushed_filters"], "filter must reach the scan"
    assert any("doc_id" in s and "text" in s for s in rep["read_schemas"])
    assert rep["python_eval"] == {}

    # an all-pairs theta join must be rejected
    a = d.select(F.col("doc_id").alias("ia"))
    b = d.select(F.col("doc_id").alias("ib"))
    theta = a.join(b, F.col("ia") < F.col("ib"))
    with pytest.raises(AssertionError, match="scale-unsafe"):
        assert_scale_safe(theta)

    # the extraction pipeline itself passes the gate within its budget
    full = extract_stage(gen_transcripts_df(spark, n_convs=6, mean_turns=4))
    rep2 = assert_scale_safe(full, max_exchanges=2)
    assert "ArrowEvalPython" in rep2["python_eval"]


def test_chunked_sectionize_single_big_exchange(spark):
    """The mega-conversation path must move the BIG frame through exactly
    one exchange (hash by (conv, chunk) for the local window); the chunk
    metadata aggregates shuffle only a tiny table and the join-back must
    broadcast — never shuffle the corpus a second time."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
        sectionize_chunked,
    )

    df = (
        gen_transcripts_df(spark, n_convs=10, mean_turns=6)
        .withColumn("turn_class", F.lit("a"))
        .withColumn("is_boundary", F.lit(False))
    )
    p = plan_of(sectionize_chunked(df, chunk_size=4))
    assert n_ops(p, "Exchange") <= 3  # big window + two tiny meta shuffles
    assert n_ops(p, "BroadcastHashJoin") == 1
    assert n_ops(p, "SortMergeJoin") == 0
