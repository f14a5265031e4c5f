"""Tests for the second operator batch: Hungarian list evaluation,
multimodal binary plumbing, section rollup determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.kernels.compare import (
    hungarian_match,
    hungarian_min,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluate import (
    evaluate_lists,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators.multimodal import (
    N_FEATURES,
    decode_features,
    media_from_documents,
)


class TestHungarianKernel:
    def test_identity_square(self):
        import numpy as np

        cost = np.array([[1, 2, 3], [2, 1, 3], [3, 2, 1]], dtype=float)
        r, c = hungarian_min(cost)
        assert list(r) == [0, 1, 2] and list(c) == [0, 1, 2]

    def test_rectangular(self):
        import numpy as np

        # 2 rows, 3 cols: best picks col of min cost per row w/o conflict
        cost = np.array([[10.0, 1.0, 9.0], [1.0, 10.0, 9.0]])
        r, c = hungarian_min(cost)
        assignment = dict(zip(r.tolist(), c.tolist()))
        assert assignment == {0: 1, 1: 0}

    def test_match_counts(self):
        tp, fp, fn, mean = hungarian_match(
            ["alpha beta", "gamma delta"], ["gamma delta", "alpha beta"]
        )
        assert (tp, fp, fn) == (2, 0, 0) and mean == 1.0

    def test_unbalanced(self):
        tp, fp, fn, _ = hungarian_match(["a b c"], ["a b c", "zzz qqq xxx"])
        assert (tp, fp, fn) == (1, 1, 0)

    def test_empty_sides(self):
        assert hungarian_match([], []) == (0, 0, 0, 1.0)
        assert hungarian_match([], ["x"])[:3] == (0, 1, 0)
        assert hungarian_match(["x"], [])[:3] == (0, 0, 1)


class TestEvaluateLists:
    def test_perfect_and_perturbed(self, spark):
        rows = [
            ("g1", ["one two three", "four five six"], ["four five six", "one two three"]),
            ("g2", ["hello world"], ["totally different text"]),
            ("g3", [], []),
        ]
        df = spark.createDataFrame(rows, ["group_id", "expected", "actual"])
        got = {r.group_id: r for r in evaluate_lists(df).collect()}
        assert got["g1"].tp == 2 and got["g1"].fp == 0 and got["g1"].fn == 0
        assert got["g2"].tp == 0 and got["g2"].fp == 1 and got["g2"].fn == 1
        assert got["g3"].tp == 0 and got["g3"].mean_score == 1.0


class TestMultimodal:
    def test_decode_features_shape(self, spark):
        docs = spark.createDataFrame(
            [(1, "hello"), (2, "world"), (3, None)], ["doc_id", "text"]
        )
        media = media_from_documents(docs)
        assert media.schema["payload"].dataType.typeName() == "binary"
        out = decode_features(media).collect()
        assert len(out) == 3
        for r in out:
            assert 64 <= r.width < 256 and 64 <= r.height < 256
            assert len(r.features) == N_FEATURES
            assert r.kind in ("image", "audio", "video")
            if r.kind == "image":
                assert r.n_frames == 1
            else:
                assert 1 <= r.n_frames <= 32

    def test_decode_deterministic(self, spark):
        docs = spark.createDataFrame([(1, "same text")], ["doc_id", "text"])
        a = decode_features(media_from_documents(docs)).collect()[0]
        b = decode_features(media_from_documents(docs)).collect()[0]
        assert a == b


class TestSectionRollupDeterminism:
    def test_order_stable_under_shuffled_input(self, spark):
        """G3: sort_array(collect_list(struct)) must make concat order
        independent of on-disk row order."""
        from accelerated_intelligent_document_processing_on_aws_spark import extract_stage
        from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
            gen_transcripts_df,
        )
        from accelerated_intelligent_document_processing_on_aws_spark.operators.sectionize import (
            section_table,
        )

        df = gen_transcripts_df(spark, n_convs=12, mean_turns=6)
        out = extract_stage(df)
        t1 = section_table(out).orderBy("conv_id", "section_id").collect()
        # re-run over a differently-partitioned copy of the same rows
        out2 = extract_stage(df.repartition(7, "turn_idx"))
        t2 = section_table(out2).orderBy("conv_id", "section_id").collect()
        assert [
            (r.conv_id, r.section_id, r.section_text) for r in t1
        ] == [(r.conv_id, r.section_id, r.section_text) for r in t2]


class TestSectionAttributes:
    def test_regex_capture_and_pivot(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.attributes import (
            attributes_wide,
            extract_section_attributes,
        )

        secs = spark.createDataFrame(
            [
                ("c1", 0, "invoice: INV-42\ntotal: $1,500.00"),
                ("c1", 1, "no structured fields here"),
            ],
            ["conv_id", "section_id", "section_text"],
        )
        cfg = {"invoice": "invoice: (\\S+)", "total": "total: (\\S+)"}
        rows = {
            (r.conv_id, r.section_id, r.attr): r.value
            for r in extract_section_attributes(secs, cfg).collect()
        }
        assert rows[("c1", 0, "invoice")] == "INV-42"
        assert rows[("c1", 0, "total")] == "$1,500.00"
        assert rows[("c1", 1, "invoice")] is None and rows[("c1", 1, "total")] is None

        wide = {
            (r.conv_id, r.section_id): (r.invoice, r.total)
            for r in attributes_wide(
                extract_section_attributes(secs, cfg), cfg
            ).collect()
        }
        assert wide[("c1", 0)] == ("INV-42", "$1,500.00")
        assert wide[("c1", 1)] == (None, None)

    def test_no_python_in_plan(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.attributes import (
            extract_section_attributes,
        )

        secs = spark.createDataFrame(
            [("c", 0, "x: 1")], ["conv_id", "section_id", "section_text"]
        )
        plan = (
            extract_section_attributes(secs, {"x": "x: ([0-9]+)"})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestIncrementalDedupAndStratifiedSample:
    def test_dedup_against_drops_known_fingerprints(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
            dedup_against,
        )

        corpus = spark.createDataFrame(
            [(1, "Hello,   World!"), (2, "unique old doc")], ["doc_id", "text"]
        )
        new = spark.createDataFrame(
            [
                (10, "hello world"),       # dup of 1 after normalization
                (11, "brand new doc"),     # survives
                (12, "brand new doc"),     # intra-batch dup of 11: BOTH kept
                (13, "unique old doc"),    # dup of 2
            ],
            ["doc_id", "text"],
        )
        got = sorted(r.doc_id for r in dedup_against(new, corpus, "doc_id", "text").collect())
        # anti-join dedups against the CORPUS only — intra-batch dedup is
        # dedup_corpus's job (documented division of labor)
        assert got == [11, 12]

    def test_stratified_sample_is_deterministic_and_respects_rates(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
            hash_sample,
            stratified_hash_sample,
        )

        rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
        df = spark.createDataFrame(rows, ["id", "stratum"])
        kept = stratified_hash_sample(
            df, "id", "stratum", {"a": 100, "b": 0}, default_pct=50
        )
        ids = sorted(r.id for r in kept.collect())
        assert ids == [i for i in range(2000) if i % 2 == 0]  # all a, no b

        # per-stratum selection == global hash_sample at that stratum's
        # rate restricted to the stratum (same md5 bucket function)
        kept25 = stratified_hash_sample(df, "id", "stratum", {"a": 25}, default_pct=25)
        glob25 = hash_sample(df, "id", 25)
        assert sorted(r.id for r in kept25.collect()) == sorted(
            r.id for r in glob25.collect()
        )

        # repartitioning cannot change the sample (pure function of key)
        re = sorted(
            r.id
            for r in stratified_hash_sample(
                df.repartition(13, "stratum"), "id", "stratum", {"a": 25}, 25
            ).collect()
        )
        assert re == sorted(r.id for r in kept25.collect())


def test_next_conversion_hand_case(spark):
    import datetime as _dt

    from pyspark.sql import Row as _Row

    from accelerated_intelligent_document_processing_on_aws_spark.operators.funnel import (
        next_conversion,
    )

    t0 = _dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(sec):
        return t0 + _dt.timedelta(seconds=sec)

    rows = [
        # user 1: view at 0 -> purchase at 100 (converted, lat 100)
        _Row(user_id=1, event_id=1, ts=ts(0), event_type="view"),
        _Row(user_id=1, event_id=2, ts=ts(100), event_type="purchase"),
        # user 2: view at 0 -> purchase at 5000 (outside 3600 window)
        _Row(user_id=2, event_id=3, ts=ts(0), event_type="view"),
        _Row(user_id=2, event_id=4, ts=ts(5000), event_type="purchase"),
        # user 3: purchase BEFORE the view only -> not converted
        _Row(user_id=3, event_id=5, ts=ts(0), event_type="purchase"),
        _Row(user_id=3, event_id=6, ts=ts(10), event_type="view"),
        # user 1 second view at 50 -> same purchase at 100 (lat 50)
        _Row(user_id=1, event_id=7, ts=ts(50), event_type="view"),
    ]
    r = next_conversion(
        spark.createDataFrame(rows),
        "user_id", "ts", "event_type", "view", "purchase", 3600,
        tiebreak_col="event_id",
    ).collect()[0]
    assert r.n_from == 4
    assert r.n_converted == 2
    assert r.conv_rate == 0.5
    assert r.avg_latency_sec == 75.0
