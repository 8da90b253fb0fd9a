"""Streaming training-window emission — the interleaved chunker
(:func:`ocr_spark.functions.interleave.chunk_interleaved`) run
continuously as a crawl lands, so the chunk sidecar the loaders read
materializes incrementally instead of in a nightly batch pass.

A document arrives as ONE nested row (doc_id, spans), so its window
cumsum is batch-local and exact — chunking never needs cross-batch
state, which is why this stream carries none beyond the
batch-partitioned output itself: each micro-batch's chunks land in
their own ``ingest_batch`` partition with dynamic overwrite
(replay-idempotent, the shared ``state_config`` discipline), and the
merged state equals the batch operator over everything ingested.

Duplicate-id caveat, pinned in tests: if the SAME doc_id arrives in
two batches (a re-crawl), streaming chunks each occurrence
independently — which is the correct per-crawl semantics — while the
batch operator over the concatenated input would merge both rows'
spans into one cumsum. The merged-equals-batch invariant therefore
holds per (ingest_batch, doc_id); dedup re-crawls upstream
(``streaming/neardup.py`` / url_dedup) or downstream (latest
``ingest_batch`` wins) before packing.

Reference analog: none (the reference has no streaming); extends the
beyond-reference streaming family (SURVEY.md §2.8 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.functions.interleave import MEDIA_TOKEN_COST, chunk_interleaved


def run_chunk_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_tokens: int = 2048,
    media_token_cost: int = MEDIA_TOKEN_COST,
    text_cost=None,
):
    """availableNow drain: chunk each span-table file batch into its
    own state partition (replay-idempotent dynamic overwrite via the
    shared scaffold). Chunk knobs — including ``text_cost`` (the
    chunker's column-parameterized cost callable, e.g. the BPE
    budget) — are fixed per stream: mixing budgets in one state dir
    would corrupt it the same way a mismatched resume would; start a
    new state dir to re-chunk."""
    from ocr_spark.streaming.state_config import (
        run_partitioned_drain,
        write_batch_partition,
    )

    def _process(bdf: DataFrame, batch_id: int) -> None:
        write_batch_partition(
            chunk_interleaved(bdf, max_tokens, media_token_cost, text_cost),
            batch_id,
            state_dir,
        )

    return run_partitioned_drain(spark, input_dir, checkpoint_dir, _process)


def audit_state(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    max_tokens: int = 2048,
    media_token_cost: int = MEDIA_TOKEN_COST,
    text_cost=None,
) -> DataFrame:
    """Post-drain conservation audit: the accumulated chunk state
    vs the FULL ingested span table (same ``text_cost`` as the
    stream, or every text-bearing doc reads as token loss), via
    :func:`~ocr_spark.functions.interleave.chunk_integrity`'s
    materialized-sidecar mode (full-outer, so lost, inflated AND
    phantom chunks all fail). Valid when doc_ids are unique across
    the ingest (the module caveat); a re-crawled id shows up here as
    a not-ok row — which is the right alarm, since packing would
    double that document."""
    from ocr_spark.functions.interleave import chunk_integrity

    docs = spark.read.parquet(input_dir)
    chunks = spark.read.parquet(state_dir).drop("ingest_batch")
    return chunk_integrity(
        docs, max_tokens, media_token_cost, chunks=chunks,
        text_cost=text_cost,
    )
