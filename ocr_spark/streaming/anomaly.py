"""Streaming ingest-rate anomaly monitor — continuous bucket-count
state whose flags equal the batch ``anomaly_flags`` over everything
ingested so far.

The production shape: an event log lands in micro-batches; each
batch's per-(event_type, hour-bucket) partial counts are written
PARTITIONED BY the micro-batch id with dynamic partition overwrite
(the ``streaming/quality.py`` / ``heavyhitters.py`` state
discipline), so a replayed batch rewrites its own partition instead
of double-counting — exactly-once state from at-least-once
execution. Counts are ADDITIVE across batches: a bucket whose events
straddle two micro-batches merges by summation, so flags computed
from merged state equal the batch operator on the full event union
(test-pinned: ``flags_from_state == anomaly_flags(all ingested)``).

Flag computation deliberately stays OUT of the hot ingest path: the
stream maintains counts only (tiny, |types| x |buckets| rows per
batch); ``flags_from_state`` runs the shared window predicate
(:func:`ocr_spark.functions.anomaly.flags_from_counts` — ONE flag
definition for batch and streaming) on demand, the way a monitoring
dashboard refreshes. State size is bounded by the time range, never
by event volume.

Reference analog: none (the reference has no streaming); extends the
beyond-reference streaming family (SURVEY.md §2.8 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.anomaly import (
    DEFAULT_TAU2,
    DEFAULT_WINDOW,
    flags_from_counts,
)


def bucket_counts_batch(events: DataFrame, step_s: int = 3600) -> DataFrame:
    """(event_type, bucket_start, n_events) partial counts for ONE
    micro-batch — the same bucket expression as resample_fill (floor
    epoch-seconds division, BIGINT bucket ids), NULL ts/type rows
    excluded like the batch path. Partial-by-design: merging batches
    is a sum, never a dedup."""
    if step_s < 1:
        raise ValueError("step_s must be >= 1")
    live = events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    bucket = (
        F.floor(F.unix_timestamp("ts") / F.lit(float(step_s))) * step_s
    ).cast("long")
    return (
        live.select("event_type", bucket.alias("bucket_start"))
        .groupBy("event_type", "bucket_start")
        .agg(F.count("*").cast("long").alias("n_events"))
    )


_META_NAME = "_anomaly_meta.json"  # '_' prefix: parquet readers skip it


def _meta_path(state_dir: str) -> str:
    return state_dir.rstrip("/") + "/" + _META_NAME


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FS API — the
    sidecar must live WITH the state (s3a://, hdfs://, file:///), not
    on the driver's local disk: a driver-local open() would silently
    bypass the grid-mismatch guard for any non-local state URI."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return fs, jpath


def _write_meta(spark: SparkSession, state_dir: str, step_s: int) -> None:
    import json

    fs, p = _hadoop_fs(spark, _meta_path(state_dir))
    fs.mkdirs(p.getParent())
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"step_s": step_s}).encode("utf-8")))
    finally:
        out.close()


def _read_meta(spark: SparkSession, state_dir: str) -> int | None:
    import json

    fs, p = _hadoop_fs(spark, _meta_path(state_dir))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = spark._jvm.org.apache.commons.io.IOUtils.toString(  # type: ignore[union-attr]
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return int(json.loads(raw)["step_s"])


def flags_from_state(
    spark: SparkSession,
    state_dir: str,
    step_s: int | None = None,
    window: int = DEFAULT_WINDOW,
    tau2: int = DEFAULT_TAU2,
) -> DataFrame:
    """The monitor read side: merge every batch partition's partial
    counts (sum — additive state) and run the SHARED flag predicate.
    Equals ``anomaly_flags`` over the union of all ingested events
    (the pinned invariant).

    The bucket step is READ FROM the state's metadata sidecar (the
    bloom-filter (m_bits, k) validation precedent): reading counts at
    a different step than they were written would silently drop every
    off-grid bucket, so an explicit ``step_s`` that contradicts the
    recorded one raises instead of guessing."""
    recorded = _read_meta(spark, state_dir)
    if step_s is None:
        if recorded is None:
            raise ValueError(
                f"{state_dir} carries no {_META_NAME} sidecar and no "
                "step_s was given — pass the step the state was "
                "written at"
            )
        step_s = recorded
    elif recorded is not None and recorded != step_s:
        raise ValueError(
            f"state was written at step_s={recorded} but is being "
            f"read at step_s={step_s}"
        )
    counts = spark.read.parquet(state_dir).select(
        "event_type", "bucket_start", "n_events"
    )
    return flags_from_counts(
        counts, step_s=step_s, window=window, tau2=tau2
    )


def run_anomaly_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    step_s: int = 3600,
):
    """availableNow drain: bucket-count each event file batch into its
    own state partition (replay-idempotent dynamic overwrite via the
    shared :func:`~ocr_spark.streaming.state_config.write_batch_partition`
    / :func:`~ocr_spark.streaming.state_config.run_partitioned_drain`
    scaffold)."""
    from ocr_spark.streaming.state_config import (
        run_partitioned_drain,
        write_batch_partition,
    )

    recorded = _read_meta(spark, state_dir)
    if recorded is not None and recorded != step_s:
        raise ValueError(
            f"state at {state_dir} was written at step_s={recorded}; "
            f"refusing to append counts at step_s={step_s}"
        )
    _write_meta(spark, state_dir, step_s)

    def _process(bdf: DataFrame, batch_id: int) -> None:
        write_batch_partition(
            bucket_counts_batch(bdf, step_s), batch_id, state_dir
        )

    return run_partitioned_drain(spark, input_dir, checkpoint_dir, _process)
