"""Streaming near-duplicate suppression against a growing MinHash
band index — the continuous-ingest analog of ``jobs/dedup.py``'s
--against-index flow.

Each micro-batch:

1. in-batch EXACT dedup (content hash, lowest doc_id wins — the same
   representative rule as ``exact_dedup``);
2. cross-batch NEAR dedup: survivors joined against the maintained
   index (``dedup_against_index`` — history text never rescanned);
3. in-batch NEAR dedup among what history did not claim: the batch's
   own band index self-joined, lower doc_id survives (chains collapse
   to their minimum — a doc matching only a dropped doc is still
   dropped, since the dropped doc's index rows participate).
   History-first ordering matches ``jobs/dedup.py`` (its stage 1.5
   runs before the in-batch cluster pass): a doc whose only in-batch
   rival is itself a dup of history must survive, not be transitively
   dropped by a doc that history then claims;
4. survivors appended to the output and their band-index rows appended
   to the index directory, both PARTITIONED BY the micro-batch id with
   dynamic partition overwrite — a replayed batch (foreachBatch is
   at-least-once) rewrites its own partition instead of duplicating
   rows, restoring exactly-once output.

State is the index directory itself, not the state store: the index
is the same persistable artifact the batch job maintains, so batch
and streaming ingest can share one index lineage — the batch job's
--against-index accepts a streaming-maintained directory directly
(merge/join normalize away the ingest_batch partition column). The
reverse seeding (starting a stream from a batch-written flat index)
needs the artifact rewritten under an ingest_batch partition first:
``idx.withColumn("ingest_batch", F.lit(-1)).write.partitionBy(
"ingest_batch").parquet(stream_index_dir)`` — appending partitioned
files into a flat directory breaks parquet partition discovery.
At production scale
the index lives in an Iceberg table bucketed by (band, key); the scan
of it here is pruned to the joined buckets either way.

Reference analog: the incremental split-job protocol
(/root/reference/webapp/jobs.py:139-283) is the reference's
hand-rolled micro-batching; near-dup suppression itself is
beyond-reference (SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.dedup import (
    dedup_against_index,
    exact_dedup,
    minhash_band_index,
)


def _read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The index dir is absent/empty until the first batch commits.

    ONLY path-not-found is treated as "no index yet" — any other read
    failure (permissions, corrupt footer, transient FS error) must
    fail the batch so the checkpoint replays it, instead of silently
    skipping cross-batch dedup and contaminating output + index with
    duplicates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(index_dir).drop("ingest_batch")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def neardup_batch(
    docs: DataFrame,
    index: DataFrame | None,
    min_match: int | None = None,
) -> DataFrame:
    """One micro-batch's survivors: in-batch exact, against-index
    near, then in-batch near dedup (steps 1-3 above — history claims
    docs BEFORE in-batch rivalry is settled, matching the batch job).
    Pure DataFrame logic, callable from batch code too."""
    docs = docs.select("doc_id", "text")
    reps = exact_dedup(docs).select(F.col("rep_doc_id").alias("doc_id"))
    survivors = docs.join(reps, "doc_id")

    if index is not None:
        hits = (
            dedup_against_index(survivors, index, min_match=min_match)
            .select(F.col("new_doc_id").alias("doc_id"))
            .distinct()
        )
        survivors = survivors.join(hits, "doc_id", "left_anti")

    own_idx = minhash_band_index(survivors)
    self_losers = (
        dedup_against_index(survivors, own_idx, min_match=min_match)
        .where(F.col("corpus_doc_id") < F.col("new_doc_id"))
        .select(F.col("new_doc_id").alias("doc_id"))
        .distinct()
    )
    return survivors.join(self_losers, "doc_id", "left_anti")


def run_neardup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    min_match: int | None = None,
):
    """availableNow drain: near-dup-suppress document files against
    the maintained band index, growing it with each batch's survivors.
    ``min_match``: agreeing signature components (of 16) to count as a
    near-dup; default k//2 (estimated Jaccard >= 0.5)."""
    from ocr_spark.streaming.state_config import (
        run_partitioned_drain,
        write_batch_partition,
    )

    def _process(bdf: DataFrame, batch_id: int) -> None:
        s = bdf.sparkSession
        index = _read_index(s, index_dir)
        survivors = neardup_batch(bdf, index, min_match=min_match).persist()
        try:
            write_batch_partition(survivors, batch_id, output_dir)
            write_batch_partition(
                minhash_band_index(survivors), batch_id, index_dir
            )
        finally:
            survivors.unpersist()

    return run_partitioned_drain(spark, input_dir, checkpoint_dir, _process)
