"""Per-query state-store configuration for the stateful streams.

Structured Streaming reads ``spark.sql.streaming.stateStore.*`` confs
from the session at query START (each StreamingQuery clones the
session state), so the way to configure a single query is: set the
confs, start the query, restore the previous values — the running
query keeps its cloned copy. ``state_confs`` packages that protocol.

At production scale the HDFS-backed default provider keeps all state
on the executor heap; RocksDB
(``provider="rocksdb"``) spills to local disk with changelog
checkpointing and is the right choice whenever distinct-key count is
unbounded (streaming dedup over an open-ended corpus). TTL bounds the
same growth semantically: state a group hasn't touched for
``ttl_ms`` is dropped (processing-time timeout), trading exactly-once
suppression of arbitrarily-late duplicates for bounded state.
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import partial

from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

_ALIASES = {"rocksdb": ROCKSDB_PROVIDER}


@contextmanager
def state_confs(spark: SparkSession, provider: str | None):
    """Set the state-store provider for queries started inside the
    block; restore the previous session value on exit (started
    queries keep their cloned conf)."""
    if provider is None:
        yield
        return
    cls = _ALIASES.get(provider, provider)
    try:
        old = spark.conf.get(_PROVIDER_CONF)
    except Exception:
        old = None
    spark.conf.set(_PROVIDER_CONF, cls)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)


def arm_ttl(fn, ttl_ms: int | None):
    """(state function, timeoutConf) for an optional processing-time
    TTL — the one shared arming protocol for every stateful stream, so
    a timeout-contract fix lands once instead of drifting per stream."""
    if ttl_ms is None:
        return fn, GroupStateTimeout.NoTimeout
    return partial(fn, ttl_ms=ttl_ms), GroupStateTimeout.ProcessingTimeTimeout


def _zero_batch_step(prev, progress):
    """One step of the drain-termination rule -> (done, new_prev).

    Done = two DISTINCT completed zero-input batches whose sources'
    end offsets did not move between them. One zero-input batch alone
    is not proof the backlog is drained: a mid-drain batch that read
    only EMPTY files reports numInputRows == 0 while the file-log
    offset still advanced — its successor batch then shows different
    end offsets and the drain continues. (FileStreamSource reports no
    usable 'latestOffset' — it renders as the string "None" — so
    offset-vs-latest comparison cannot detect catch-up here.)

    ``prev`` is the (batchId, endOffsets) of the last distinct
    zero-input batch seen, or None."""
    if progress is None or progress.get("numInputRows", 0) != 0:
        return False, prev
    ends = tuple(str(s.get("endOffset")) for s in (progress.get("sources") or []))
    bid = progress.get("batchId")
    if prev is not None and bid != prev[0] and ends == prev[1]:
        return True, prev
    if prev is None or bid != prev[0]:
        prev = (bid, ends)
    return False, prev


def _is_stop_interrupt(exc: Exception) -> bool:
    """Our own stop() interrupting an in-flight wake-up batch renders
    as an interrupt/cancellation — anything else is a real failure."""
    msg = str(exc)
    return any(
        t in msg
        for t in ("InterruptedException", "interrupted", "cancelled", "SparkContext was shut down")
    )


def drain_query(q, ttl_active: bool) -> None:
    """Block until an availableNow drain finishes.

    Without timeouts, availableNow self-terminates: plain
    awaitTermination. With processing-time timeouts armed the engine
    NEVER self-terminates — FlatMapGroupsWithState keeps requesting
    wake-up batches while any timeout is registered, so availableNow
    busy-loops empty batches (and processAllAvailable never settles).
    The drain therefore polls progress and stops the query once two
    distinct completed batches read zero input without the source
    offsets moving (``_zero_batch_step``): a mid-drain batch that
    merely read only empty files must not end the drain while backlog
    remains, and expired timeouts fired inside these same wake-up
    batches. (Zero-input progress events are throttled by
    spark.sql.streaming.noDataProgressEventInterval — the session
    factory lowers it so this poll settles in seconds.)"""
    import time

    if not ttl_active:
        q.awaitTermination()
        return
    prev = None
    while q.isActive:
        done, prev = _zero_batch_step(prev, q.lastProgress)
        if done:
            break
        time.sleep(0.2)
    exc = q.exception()
    if exc is not None:
        raise exc
    q.stop()
    try:
        q.awaitTermination()
    except Exception as e:  # re-raise real failures, swallow our stop
        if not _is_stop_interrupt(e):
            raise


# ---------------------------------------------------------------------------
# batch-partitioned state drain (the replay-idempotence scaffold)
# ---------------------------------------------------------------------------


def write_batch_partition(df, batch_id: int, state_dir: str) -> None:
    """THE replay-idempotent state write: the frame lands in its OWN
    ``ingest_batch`` partition with dynamic partition overwrite, so a
    replayed micro-batch (foreachBatch is at-least-once) rewrites its
    partition instead of duplicating rows — exactly-once state from
    at-least-once execution. One definition shared by every
    batch-partitioned stream (heavyhitters / quality / neardup);
    hardening the recipe happens here, not in three copies."""
    from pyspark.sql import functions as F

    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(state_dir)
    )


def run_partitioned_drain(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, process
):
    """availableNow foreachBatch drain scaffold shared by the
    batch-partitioned state streams: schema-probed parquet source,
    checkpointed, self-terminating (no processing-time timeouts, so
    plain awaitTermination drains cleanly). ``process(bdf, batch_id)``
    owns the state writes (typically via
    :func:`write_batch_partition`)."""
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
