"""Streaming vocabulary heavy hitters: merged answer equals the batch
operator over everything ingested, replay idempotence of the
batch-partitioned counts, and compaction equivalence."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.functions.text import vocab_topk
from ocr_spark.streaming.heavyhitters import (
    COMPACTED_BATCH,
    compact_state,
    run_vocab_stream,
    topk_from_state,
    vocab_counts_batch,
)


def _b(texts):
    return pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts}
    )


def test_stream_equals_batch_operator(spark, tmp_path):
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    b1 = _b(["apple apple banana", "cherry apple"])
    b2 = _b(["banana banana date", "apple"])
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_vocab_stream(spark, inp, st, ckpt)
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_vocab_stream(spark, inp, st, ckpt)
    got = [tuple(r) for r in topk_from_state(spark, st, k=10).collect()]
    full = spark.createDataFrame(pd.concat([b1, b2], ignore_index=True))
    want = [tuple(r) for r in vocab_topk(full, k=10).collect()]
    assert got == want
    assert got[0] == ("apple", 4)


def test_replay_is_idempotent(spark, tmp_path):
    st = str(tmp_path / "state")
    b = spark.createDataFrame(_b(["x x y", "y z"]))
    for _ in range(3):  # the same batch id lands three times
        (
            vocab_counts_batch(b)
            .withColumn("ingest_batch", F.lit(7))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(st)
        )
    got = {r.token: r.n for r in topk_from_state(spark, st, 10).collect()}
    assert got == {"x": 2, "y": 2, "z": 1}


def test_compact_preserves_answers(spark, tmp_path):
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    for texts in (["a a b"], ["b c"], ["c c c a"]):
        spark.createDataFrame(_b(texts)).write.parquet(inp, mode="append")
        run_vocab_stream(spark, inp, st, ckpt)
    before = [tuple(r) for r in topk_from_state(spark, st, 10).collect()]
    compact_state(spark, st)
    after = [tuple(r) for r in topk_from_state(spark, st, 10).collect()]
    assert after == before
    parts = {
        r.ingest_batch
        for r in spark.read.parquet(st).select("ingest_batch").distinct().collect()
    }
    assert parts == {COMPACTED_BATCH}
    # ingest continues after compaction: new batches merge on top
    spark.createDataFrame(_b(["a d"])).write.parquet(inp, mode="append")
    run_vocab_stream(spark, inp, st, ckpt)
    got = {r.token: r.n for r in topk_from_state(spark, st, 10).collect()}
    assert got["a"] == 4 and got["d"] == 1
