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

All three signals are scan-stage column expressions; the per-batch
plan is two doc_id equi-joins of micro-batch-sized frames (the same
composition jobs/curate.py runs corpus-wide).

Reference analog: none (the reference has no streaming); extends the
beyond-reference streaming family (SURVEY.md §2.8 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.text import lang_id, quality_score
from ocr_spark.functions.unicode_norm import encoding_profile


def quality_verdicts_batch(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """(doc_id, quality, lang_pred, enc_suspect, keep) for ONE batch —
    the curate funnel's gate stage as a per-document verdict table.
    keep = quality >= min_quality AND NOT enc_suspect AND (lang_pred
    in ``langs`` when given). Every doc is emitted with its verdict
    (the audit trail a drop-only gate loses)."""
    q = quality_score(docs).select("doc_id", "quality")
    lid = lang_id(docs).select("doc_id", "lang_pred")
    enc = encoding_profile(docs).select(
        "doc_id", F.col("suspect").alias("enc_suspect")
    )
    v = q.join(lid, "doc_id").join(enc, "doc_id")
    keep = (F.col("quality") >= min_quality) & (~F.col("enc_suspect"))
    if langs:
        keep = keep & F.col("lang_pred").isin(*langs)
    return v.select("doc_id", "quality", "lang_pred", "enc_suspect", keep.alias("keep"))


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
    own state partition (replay-idempotent dynamic overwrite)."""
    schema = spark.read.parquet(input_dir).schema

    def _process(bdf: DataFrame, batch_id: int) -> None:
        (
            quality_verdicts_batch(bdf, min_quality, langs)
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(state_dir)
        )

    src = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
