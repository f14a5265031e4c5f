"""Ingestion sources: schema-enforced readers, corrupt-record routing
(the Spark analog of the reference's SQS dead-letter path,
``src/lambda/queue_processor/index.py``), envelope parsing, one-job
validation."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from accelerated_intelligent_document_processing_on_aws_spark.datagen.transcripts import (
    gen_transcripts_df,
)
from accelerated_intelligent_document_processing_on_aws_spark.sources import (
    TRANSCRIPTS_SCHEMA,
    parse_json_envelope,
    read_transcripts,
    split_corrupt,
    validate_transcripts,
)


def _write_jsonl(path: str, rows, garbage=()):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for g in garbage:
            f.write(g + "\n")


def test_jsonl_read_routes_corrupt_rows(spark, tmp_path):
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
         "tool": None, "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo",
         "tool": "search", "ts": "2026-01-01T00:00:05"},
    ]
    garbage = ['{"conv_id": "c2", "turn_idx": ', "not json at all"]
    p = str(tmp_path / "in")
    _write_jsonl(p, rows, garbage)
    df = read_transcripts(spark, p, fmt="jsonl")
    good, bad = split_corrupt(df)
    assert good.count() == 2
    assert bad.count() == 2
    assert good.columns == [f.name for f in TRANSCRIPTS_SCHEMA.fields]
    # dead-letter keeps the raw record for replay
    raws = {r["_corrupt_record"] for r in bad.collect()}
    assert "not json at all" in raws
    # types enforced by the supplied schema (no inference pass)
    assert dict(good.dtypes)["turn_idx"] == "int"
    assert dict(good.dtypes)["ts"] == "timestamp"


def test_csv_read_routes_corrupt_rows(spark, tmp_path):
    p = str(tmp_path / "csv")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.csv"), "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n")
        f.write("c1,0,user,hello,,2026-01-01T00:00:00\n")
        f.write("c1,notanint,user,bad row,,2026-01-01T00:00:01\n")
    good, bad = split_corrupt(read_transcripts(spark, p, fmt="csv"))
    assert good.count() == 1
    assert bad.count() == 1


def test_parquet_read_casts_to_canonical(spark, tmp_path):
    p = str(tmp_path / "pq")
    # ts as string and turn_idx as long: reader must cast, not fail
    gen_transcripts_df(spark, n_convs=3, mean_turns=4).withColumn(
        "turn_idx", F.col("turn_idx").cast("long")
    ).withColumn("ts", F.col("ts").cast("string")).write.parquet(p)
    df = read_transcripts(spark, p, fmt="parquet")
    assert [f.name for f in df.schema.fields] == [
        f.name for f in TRANSCRIPTS_SCHEMA.fields
    ]
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_parse_json_envelope_ok_and_corrupt(spark):
    sch = T.StructType(
        [T.StructField("lang", T.StringType()), T.StructField("n", T.IntegerType())]
    )
    df = spark.createDataFrame(
        [
            ("a", '{"lang":"en","n":3}'),
            ("b", '{"lang":"fr","n":'),
            ("c", "junk"),
            # NULL / empty / whitespace payloads: from_json returns a NULL
            # struct with NO corrupt-field hit for these — they must still
            # dead-letter (round-4 fix; previously parse_ok=true, all-null)
            ("d", None),
            ("e", ""),
            ("f", "   "),
        ],
        ["id", "payload"],
    )
    out = parse_json_envelope(df, "payload", sch).orderBy("id").collect()
    assert [r["parse_ok"] for r in out] == [True] + [False] * 5
    assert out[0]["p_lang"] == "en" and out[0]["p_n"] == 3
    assert all(r["p_lang"] is None and r["p_n"] is None for r in out[1:])


def test_validate_transcripts_one_job(spark):
    base = gen_transcripts_df(spark, n_convs=4, mean_turns=5)
    # inject a duplicate key and a null text
    dup = base.limit(1)
    df = base.unionByName(dup).withColumn(
        "text", F.when(F.col("turn_idx") == 0, F.lit(None)).otherwise(F.col("text"))
    )
    rep = validate_transcripts(df).collect()[0].asDict()
    assert rep["rows"] == base.count() + 1
    assert rep["dup_turn_keys"] == 1
    assert rep["null_text"] >= 1
    assert rep["null_conv_id"] == 0


def test_clean_jsonl_flows_into_pipeline(spark, tmp_path):
    """End-to-end: a JSONL feed with garbage rows ingests, routes, and the
    clean side runs the full extraction pipeline unchanged."""
    import accelerated_intelligent_document_processing_on_aws_spark as pkg

    rows = [
        {"conv_id": f"c{i}", "turn_idx": j, "role": "user",
         "text": f"turn {j} of c{i}", "tool": None,
         "ts": f"2026-01-01T00:00:{j:02d}"}
        for i in range(3)
        for j in range(4)
    ]
    p = str(tmp_path / "feed")
    _write_jsonl(p, rows, garbage=["{{{{", ""])
    good, bad = split_corrupt(read_transcripts(spark, p, fmt="jsonl"))
    out = pkg.extract_stage(good)
    assert out.count() == len(rows)
    assert "extracted_text" in out.columns


def test_run_pipeline_jsonl_with_dead_letter(spark, tmp_path):
    """Full run_pipeline over a jsonl feed: malformed records land in the
    DLQ parquet, clean rows produce the extracted table, resume still
    early-returns."""
    import accelerated_intelligent_document_processing_on_aws_spark as pkg

    rows = [
        {"conv_id": f"c{i}", "turn_idx": j, "role": "user",
         "text": f"turn {j} of c{i}", "tool": None,
         "ts": f"2026-01-01T00:00:{j:02d}"}
        for i in range(4)
        for j in range(3)
    ]
    inp = str(tmp_path / "feed")
    _write_jsonl(inp, rows, garbage=['{"conv_id": broken', "plain garbage"])
    outp, ckpt, dlq = (
        str(tmp_path / "out"), str(tmp_path / "ckpt"), str(tmp_path / "dlq")
    )
    s1 = pkg.run_pipeline(
        spark, inp, outp, ckpt, input_format="jsonl", dead_letter_path=dlq
    )
    assert s1["dead_letter_rows"] == 2
    assert spark.read.parquet(outp).count() == len(rows)
    assert spark.read.parquet(dlq).count() == 2
    s2 = pkg.run_pipeline(
        spark, inp, outp, ckpt, input_format="jsonl", dead_letter_path=dlq
    )
    assert s2["resumed"] and s2["partitions_written"] == 0
    # the resumed run never re-read the feed, so the DLQ did not grow
    assert spark.read.parquet(dlq).count() == 2


def test_dead_letter_idempotent_on_partial_resume(spark, tmp_path):
    """A PARTIALLY-resumed retry (some buckets committed, candidates
    remain) re-derives the DLQ from the whole feed; the per-snapshot
    overwrite must replace — not duplicate — the bad rows on every
    retry of a crashed run."""
    import accelerated_intelligent_document_processing_on_aws_spark as pkg
    from accelerated_intelligent_document_processing_on_aws_spark.io.checkpoint import (
        CheckpointStore,
    )

    rows = [
        {"conv_id": f"c{i}", "turn_idx": j, "role": "user",
         "text": f"turn {j} of c{i}", "tool": None,
         "ts": f"2026-01-01T00:00:{j:02d}"}
        for i in range(6)
        for j in range(3)
    ]
    inp = str(tmp_path / "feed")
    _write_jsonl(inp, rows, garbage=['{"conv_id": broken', "plain garbage"])
    outp, ckpt, dlq = (
        str(tmp_path / "out"), str(tmp_path / "ckpt"), str(tmp_path / "dlq")
    )
    s1 = pkg.run_pipeline(
        spark, inp, outp, ckpt, input_format="jsonl", dead_letter_path=dlq
    )
    assert s1["dead_letter_rows"] == 2

    # simulate a crashed run that committed only HALF the buckets: a fresh
    # checkpoint store seeded with a strict subset of the lineage rows
    full = spark.read.parquet(ckpt)
    some = sorted(r.partition_id for r in full.select("partition_id").collect())
    half = some[: len(some) // 2]
    ckpt2 = str(tmp_path / "ckpt2")
    CheckpointStore(spark, ckpt2).append(
        full.filter(F.col("partition_id").isin(half))
    )
    for _ in range(2):  # two partial-resume retries
        s = pkg.run_pipeline(
            spark, inp, outp, ckpt2, input_format="jsonl",
            dead_letter_path=dlq,
        )
        assert s["resumed"]
        # the retry re-ran the DLQ pass, but overwrite kept it exact
        assert spark.read.parquet(dlq).count() == 2


def test_ingest_fuzz_never_crashes_and_partitions_feed(spark, tmp_path):
    """Fuzz the jsonl ingest path with a seeded grab-bag of malformed
    records: arbitrary junk, truncated JSON, wrong types, embedded
    newline-free control noise.  Invariants: read_transcripts +
    split_corrupt never raise, every input line lands on exactly one
    side, and every clean row carries a non-null conv_id/turn_idx."""
    import json
    import random

    from accelerated_intelligent_document_processing_on_aws_spark.sources.ingest import (
        read_transcripts,
        split_corrupt,
    )

    rng = random.Random(42)
    lines = []
    n_good = 0
    for i in range(200):
        roll = rng.random()
        if roll < 0.4:  # well-formed
            lines.append(json.dumps({
                "conv_id": f"c{i%7}", "turn_idx": i, "role": "user",
                "text": f"turn {i}", "tool": None,
                "ts": "2025-01-01T00:00:00",
            }))
            n_good += 1
        elif roll < 0.55:  # truncated JSON
            lines.append(json.dumps({"conv_id": f"c{i}", "turn_idx": i})[:-rng.randint(1, 5)])
        elif roll < 0.7:  # junk
            lines.append("".join(rng.choice("{}[]:,\"abcxyz489 ") for _ in range(rng.randint(1, 40))))
        elif roll < 0.85:  # wrong type for turn_idx
            lines.append(json.dumps({
                "conv_id": f"c{i}", "turn_idx": "not-an-int", "role": "user",
                "text": "x", "tool": None, "ts": "2025-01-01T00:00:00",
            }))
        else:  # empty-ish
            lines.append(rng.choice(["", " ", "null", "[]", "123"]))
    feed = tmp_path / "feed.jsonl"
    feed.write_text("\n".join(lines) + "\n")

    good, bad = split_corrupt(read_transcripts(spark, str(feed), fmt="jsonl"))
    g, b = good.collect(), bad.collect()
    n_input = sum(1 for ln in lines if ln.strip())  # blank lines are skipped by the text scan
    assert len(g) + len(b) >= n_good  # no line silently lost from the good set
    assert len(g) <= n_input and len(b) <= n_input
    for r in g:
        assert r["conv_id"] is not None and r["turn_idx"] is not None
    # every malformed flavor above must land SOMETHING in the DLQ
    assert len(b) > 0
    # well-formed rows all survive
    assert len(g) >= n_good * 0.95
