"""Streaming vocabulary heavy hitters — continuous-ingest token
counting whose merged answer equals the batch operator
(``text.vocab_topk``) over everything ingested so far.

State is a parquet count table, not the state store: each micro-batch
writes its OWN token counts PARTITIONED BY the micro-batch id with
dynamic partition overwrite — a replayed batch (foreachBatch is
at-least-once) rewrites its own partition instead of double-counting,
restoring exactly-once counts (the ``streaming/neardup.py`` state
discipline). Counts are additive, so the global answer is one
groupBy-sum over the state dir; per-batch partitions are the
mergeable unit (the sketch-family shape, here with EXACT counts —
token state is vocabulary-bounded, not corpus-bounded).

The state dir grows one partition per batch; ``compact_state``
re-bases it onto a single merged partition (run it while the stream
is stopped — batches already committed to the checkpoint can no
longer replay, so folding them into the base is safe).

Reference analog: none (the reference has no streaming); this extends
the beyond-reference streaming family (SURVEY.md §2.8 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import words_col

COMPACTED_BATCH = -1  # ingest_batch value of the compacted base


def vocab_counts_batch(docs: DataFrame) -> DataFrame:
    """(token, n) for ONE micro-batch — explode + one count shuffle
    with map-side partials, exactly the batch operator's count stage."""
    return (
        docs.select(F.explode(words_col()).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def topk_from_state(spark: SparkSession, state_dir: str, k: int = 100) -> DataFrame:
    """Global top-k from the state dir: groupBy-sum across the batch
    partitions (counts are additive), then the batch operator's exact
    ordering (n DESC, token ASC) — equal to ``vocab_topk`` over the
    union of all ingested batches, pinned by tests."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def compact_state(spark: SparkSession, state_dir: str) -> None:
    """Fold all batch partitions into the single COMPACTED_BATCH
    partition, bounding the merge fan-in. localCheckpoint severs the
    read's lineage from the files the overwrite is about to delete
    (the safe self-overwrite pattern). Run only while the stream is
    stopped; replays of already-committed batches cannot occur."""
    merged = (
        spark.read.parquet(state_dir)
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
        .withColumn("ingest_batch", F.lit(COMPACTED_BATCH))
        .localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        # pin STATIC overwrite: this write must replace the WHOLE
        # state dir. Under a session that set the global default to
        # dynamic, overwrite+partitionBy would replace only the
        # ingest_batch=-1 partition and leave every per-batch
        # partition in place — permanently double-counting all tokens.
        .option("partitionOverwriteMode", "static")
        .partitionBy("ingest_batch")
        .parquet(state_dir)
    )


def run_vocab_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """availableNow drain: count each document file batch into its own
    state partition (replay-idempotent dynamic overwrite via the
    shared state_config scaffold)."""
    from ocr_spark.streaming.state_config import (
        run_partitioned_drain,
        write_batch_partition,
    )

    def _process(bdf: DataFrame, batch_id: int) -> None:
        write_batch_partition(vocab_counts_batch(bdf), batch_id, state_dir)

    return run_partitioned_drain(spark, input_dir, checkpoint_dir, _process)
