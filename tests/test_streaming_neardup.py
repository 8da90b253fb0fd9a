"""Streaming near-dup suppression against the growing band index:
in-batch exact + near dedup, cross-batch suppression via the index
directory, id-type transparency, and replay idempotence of the
batch-partitioned writes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.streaming.neardup import neardup_batch, run_neardup_stream

WORDS = " ".join(f"w{i:02d}" for i in range(40))
NEAR = " ".join([f"w{i:02d}" for i in range(36)] + [f"X{i:02d}" for i in range(4)])
OTHER = " ".join(f"z{i:02d}" for i in range(40))
NOVEL = " ".join(f"n{i:02d}" for i in range(40))


def test_within_and_across_batches(spark, tmp_path):
    inp, outp, idx, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "idx", "ckpt")
    )
    # batch 1: 2 = exact dup of 1, 3 = near dup of 1, 4 = distinct
    b1 = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [WORDS, WORDS, NEAR, OTHER]}
    )
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_neardup_stream(spark, inp, outp, idx, ckpt)
    got1 = sorted(r.doc_id for r in spark.read.parquet(outp).collect())
    assert got1 == [1, 4]

    # batch 2: 10 = re-crawl of 1 (exact), 11 = near dup of 1,
    # 12 = novel -> only 12 survives, and the index grows by 12's rows
    b2 = pd.DataFrame(
        {"doc_id": [10, 11, 12], "text": [WORDS, NEAR, NOVEL]}
    )
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_neardup_stream(spark, inp, outp, idx, ckpt)
    got2 = sorted(r.doc_id for r in spark.read.parquet(outp).collect())
    assert got2 == [1, 4, 12]
    idx_docs = {
        r.doc_id
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 4, 12}


def test_neardup_batch_is_pure_dataframe_logic(spark):
    """The per-batch function composes in batch code (no stream):
    chains collapse to their minimum id."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 6, 7], "text": [WORDS, WORDS, NEAR]})
    )
    got = sorted(r.doc_id for r in neardup_batch(docs, None).collect())
    assert got == [5]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch id (foreachBatch is at-least-once)
    overwrites its own partition instead of duplicating output."""
    inp, outp, idx = (str(tmp_path / d) for d in ("in", "out", "idx"))
    df = pd.DataFrame({"doc_id": [1, 2], "text": [WORDS, OTHER]})
    spark.createDataFrame(df).write.parquet(inp)
    bdf = spark.read.parquet(inp)

    # simulate the foreachBatch body running twice with batch_id 0
    for _ in range(2):
        survivors = neardup_batch(bdf, None)
        (
            survivors.withColumn("ingest_batch", F.lit(0))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(outp)
        )
    assert spark.read.parquet(outp).count() == 2


def test_string_ids(spark, tmp_path):
    inp, outp, idx, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "idx", "ckpt")
    )
    b1 = pd.DataFrame(
        {"doc_id": ["sha1:b", "sha1:a"], "text": [WORDS, WORDS]}
    )
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_neardup_stream(spark, inp, outp, idx, ckpt)
    got = [r.doc_id for r in spark.read.parquet(outp).collect()]
    assert got == ["sha1:a"]


def test_history_claims_before_in_batch_rivalry(spark):
    """Triangle C-A-B (probed n_match: C~A 11, A~B 11, C~B 7 at the
    8-of-16 default): history holds C; the batch has A (near C) and
    B (near A, NOT near C). History must claim A FIRST so B survives —
    settling in-batch rivalry first would drop B as A's loser and then
    lose A to history, discarding B's effectively-novel content."""
    from ocr_spark.functions.dedup import minhash_band_index

    W = [f"w{i:02d}" for i in range(40)]
    doc_c = " ".join(W[:36] + [f"c{i:02d}" for i in range(4)])
    doc_a = " ".join(W)
    doc_b = " ".join(W[12:] + [f"b{i:02d}" for i in range(12)])
    history = minhash_band_index(
        spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [doc_c]}))
    )
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [20, 21], "text": [doc_a, doc_b]})
    )
    got = sorted(r.doc_id for r in neardup_batch(batch, history).collect())
    assert got == [21]
