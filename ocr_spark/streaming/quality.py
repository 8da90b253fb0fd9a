"""Streaming ingest-quality monitor — continuous-crawl gating whose
merged verdicts equal the batch operators (quality_score + lang_id +
encoding_profile) over everything ingested so far.

The production shape: a crawl lands in micro-batches; each batch's
per-document gate verdicts are written PARTITIONED BY the micro-batch
id with dynamic partition overwrite, so a replayed batch (foreachBatch
is at-least-once) rewrites its own partition instead of duplicating
verdicts — exactly-once state from at-least-once execution (the
``streaming/heavyhitters.py`` / ``neardup.py`` state discipline).
Verdict rows are per-doc and additive-by-union, so corpus-level
ingest stats are one aggregation over the state dir.

All three signals are scan-stage column expressions computed in ONE
row-preserving projection — no doc_id joins, so duplicate ids (a
re-crawled page landing twice) yield exactly one verdict row per
input row instead of a join fan-out, and the pinned merged-equals-
batch invariant holds for ANY input.

Reference analog: none (the reference has no streaming); extends the
beyond-reference streaming family (SURVEY.md §2.8 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import lang_pred_expr, quality_score
from ocr_spark.functions.unicode_norm import encoding_suspect_col


def quality_verdicts_batch(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """(doc_id, quality, lang_pred, enc_suspect, keep) for ONE batch —
    the curate funnel's gate stage as a per-document verdict table.
    keep = quality >= min_quality AND NOT enc_suspect AND (lang_pred
    in ``langs`` when given), coalesced to a DEFINITE False when
    quality is NULL (NULL text): a three-valued NULL verdict would
    vanish from BOTH where(keep) and where(~keep) partitions of the
    audit trail. Every doc is emitted with its verdict, one row per
    input row (row-preserving projection, no joins — duplicate ids
    cannot fan out)."""
    v = (
        quality_score(docs.select("doc_id", "text"), keep=("text",))
        .select("doc_id", "text", "quality")
        .withColumn("lang_pred", F.expr(lang_pred_expr()))
        .withColumn("enc_suspect", encoding_suspect_col(F.col("text")))
    )
    keep = (F.col("quality") >= min_quality) & (~F.col("enc_suspect"))
    if langs:
        keep = keep & F.col("lang_pred").isin(*langs)
    return v.select(
        "doc_id",
        "quality",
        "lang_pred",
        "enc_suspect",
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def stats_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """One row of global ingest stats over every batch partition:
    (n_docs, n_kept, n_suspect, mean_quality) — verdicts are
    per-doc rows, so the union aggregate equals the batch operators
    over the union of all ingested batches (test-pinned)."""
    v = spark.read.parquet(state_dir)
    return v.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(F.col("enc_suspect").cast("long")).alias("n_suspect"),
        F.avg("quality").alias("mean_quality"),
    )


def run_quality_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.3,
    langs: tuple[str, ...] | None = None,
):
    """availableNow drain: verdict each document file batch into its
    own state partition (replay-idempotent dynamic overwrite via the
    shared :func:`~ocr_spark.streaming.state_config.write_batch_partition`
    / :func:`~ocr_spark.streaming.state_config.run_partitioned_drain`
    scaffold)."""
    from ocr_spark.streaming.state_config import (
        run_partitioned_drain,
        write_batch_partition,
    )

    def _process(bdf: DataFrame, batch_id: int) -> None:
        write_batch_partition(
            quality_verdicts_batch(bdf, min_quality, langs),
            batch_id,
            state_dir,
        )

    return run_partitioned_drain(spark, input_dir, checkpoint_dir, _process)
