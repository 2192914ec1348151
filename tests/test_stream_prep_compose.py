"""End-to-end STREAMING LLM-prep composition under restart (VERDICT r8
item 7): jsonl feed → dead-letter split → quality gate →
stream_near_dup_dedup → decontamination → tokenize → txlog sink, as
one checkpointed multi-stage pipeline run in TWO phases with a restart
between them — and the final committed table must equal the BATCH
``prep_corpus`` output on the same feed.

Every piece existed (jsonl_stream, quarantine channel, quality_gate,
the streaming min-claimant dedup with its batching-independence
contract, decontaminate/tokenize, the txlog ACID sink); this pins that
they COMPOSE: checkpoints resume cleanly, the second phase's backlog
flows through every stage, and the stream/batch equivalence survives
the whole pipeline, not just the dedup core. Ids are assigned
monotonically with arrival (file1 < file2), which is the documented
precondition for stream-survivor == batch-survivor equality; the
corpus-global stages (vocab, split assignment) run at PUBLICATION time
over the final survivor table on both sides, which is the honest
design — a vocabulary cannot be computed per micro-batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

# distinct-ratio must clear the quality gate (>= 0.2), so the long
# shared texts use fully distinct tokens
_LONG_A = " ".join(f"alpha{i} quick{(i * 7) % 97}" for i in range(30))
_LONG_B = " ".join(f"beta{i} slow{(i * 11) % 89}" for i in range(30))
_BENCH_GRAM = "the quick brown fox jumps over the lazy dog tonight"  # >8 tokens


def _feed_files() -> tuple[list[str], list[str]]:
    """Two jsonl files, ids monotone with arrival. Covers: corrupt
    lines, blank separators, quality-gate failures (short docs), exact
    dups, near-dups (shared long text, small suffix delta), and a
    benchmark-contaminated doc."""

    def d(i, text):
        return json.dumps({"doc_id": i, "text": text})

    f1 = [
        d(1, _LONG_A + " original"),
        d(2, "tiny"),  # quality gate: < 5 tokens
        d(3, _LONG_B + " first"),
        "utterly broken {",  # quarantine
        d(4, _LONG_A + " original"),  # exact dup of 1
        "",  # blank separator line
        d(5, "a genuinely unique document about parquet row groups and shuffles today"),
        d(6, f"leading words then {_BENCH_GRAM} trailing words here"),  # contaminated
    ]
    f2 = [
        d(11, _LONG_A + " original"),  # exact dup of 1, later batch
        d(12, _LONG_B + " first"),  # exact dup of 3, later batch
        d(13, _LONG_B + " variant"),  # near-dup of 3 (LSH decides; both sides agree)
        "[1, 2, 3]",  # non-object -> quarantine
        d(14, "another standalone document covering adaptive query execution and broadcast joins"),
        "   ",  # whitespace separator
    ]
    return f1, f2


def _run_stage_a(spark, feed_dir, staging_dir, qdir, ckpt):
    """Feed ingestion micro-batches: dead-letter split + quality gate,
    gated clean rows appended to the staging corpus."""
    from frontpage_spark.ext.prep import quality_gate
    from frontpage_spark.sources import jsonl_stream

    stream = jsonl_stream(spark, feed_dir, SCHEMA)

    def body(batch, epoch_id):
        batch.filter(F.col("_corrupt_record").isNotNull()).select(
            F.col("_corrupt_record").alias("raw"),
            F.current_timestamp().alias("quarantined_at"),
        ).write.mode("append").parquet(qdir)
        clean = batch.filter(F.col("_corrupt_record").isNull()).select(
            "doc_id", "text"
        )
        quality_gate(clean).write.mode("append").parquet(staging_dir)

    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stage A did not drain"


def _run_stage_b(spark, staging_dir, out_dir, sig_dir, ckpt):
    from frontpage_spark.incremental import stream_near_dup_dedup

    q = stream_near_dup_dedup(
        spark,
        staging_dir,
        out_dir,
        sig_dir,
        ckpt,
        schema=SCHEMA,
    )
    assert q.awaitTermination(180), "stage B did not drain"


def test_streaming_prep_composes_and_restarts(spark, tmp_path):
    from frontpage_spark.ext import txlog
    from frontpage_spark.ext.prep import decontaminate, prep_corpus, tokenize_ids
    from frontpage_spark.ext.sampling import assign_split
    from frontpage_spark.sources import jsonl_source

    feed = tmp_path / "feed"
    feed.mkdir()
    staging = str(tmp_path / "staging")
    out_dir = str(tmp_path / "survivors")
    sig_dir = str(tmp_path / "sigs")
    qdir = str(tmp_path / "quarantine")
    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")
    table = str(tmp_path / "published")

    f1, f2 = _feed_files()
    bench = spark.createDataFrame([(_BENCH_GRAM,)], "text string")

    # ---- phase 1: only file1 exists; both stages drain, then STOP
    (feed / "f1.jsonl").write_text("\n".join(f1) + "\n")
    _run_stage_a(spark, str(feed), staging, qdir, ckpt_a)
    _run_stage_b(spark, staging, out_dir, sig_dir, ckpt_b)
    phase1_survivors = {
        r["doc_id"] for r in spark.read.parquet(out_dir).select("doc_id").collect()
    }
    assert 1 in phase1_survivors and 4 not in phase1_survivors

    # ---- phase 2: file2 lands; RESTART both stages from checkpoints
    (feed / "f2.jsonl").write_text("\n".join(f2) + "\n")
    _run_stage_a(spark, str(feed), staging, qdir, ckpt_a)
    _run_stage_b(spark, staging, out_dir, sig_dir, ckpt_b)

    # ---- stage C (publication-time batch over the survivor table):
    # decontaminate, tokenize, split, commit to the txlog table
    survivors = spark.read.parquet(out_dir).select("doc_id", "text")
    cleaned = decontaminate(survivors, bench)
    published = tokenize_ids(cleaned).select(
        "doc_id",
        "text",
        "ids",
        F.size("ids").cast("long").alias("n_tokens"),
        assign_split(F.col("doc_id").cast("string"), (0.8, 0.1)).alias("split"),
    )
    v = txlog.append(published, table)
    assert v >= 1

    # ---- batch mirror: same feed through jsonl_source + prep_corpus
    batch_clean = jsonl_source(spark, str(feed), SCHEMA)
    batch_docs = batch_clean.filter(F.col("_corrupt_record").isNull()).select(
        "doc_id", "text"
    )
    expected, funnel = prep_corpus(batch_docs, bench)

    def canon(df):
        rows = df.select("doc_id", "text", "ids", "n_tokens", "split").collect()
        return sorted(
            (r["doc_id"], r["text"], tuple(r["ids"]), r["n_tokens"], r["split"])
            for r in rows
        )

    got = canon(txlog.read(spark, table))
    want = canon(expected)
    assert got == want, (
        f"stream-composed table != batch prep_corpus: "
        f"got {[(g[0],) for g in got]}, want {[(w[0],) for w in want]}"
    )
    # the pipeline did real work: dups, gated, and contaminated docs gone
    ids = {g[0] for g in got}
    assert 1 in ids and 5 in ids and 14 in ids
    assert 2 not in ids  # quality-gated
    assert 4 not in ids and 11 not in ids and 12 not in ids  # dup losers
    assert 6 not in ids  # contaminated
    # quarantine holds exactly the two corrupt lines, byte-for-byte
    raws = sorted(r["raw"] for r in spark.read.parquet(qdir).collect())
    assert raws == ["[1, 2, 3]", "utterly broken {"]
    # funnel sanity on the batch side (same shape the CLI reports)
    stages = {r["stage"]: r["n"] for r in funnel.collect()}
    assert stages["input"] > stages["quality"] >= stages["near_dedup"]
