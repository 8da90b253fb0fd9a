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

from pyspark.sql import SparkSession

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


def drain_query(q, ttl_active: bool) -> None:
    """Block until an availableNow drain finishes.

    Without timeouts, availableNow self-terminates: plain
    awaitTermination. With processing-time timeouts armed the engine
    NEVER self-terminates — FlatMapGroupsWithState keeps requesting
    wake-up batches while any timeout is registered, so availableNow
    busy-loops empty batches (and processAllAvailable never settles).
    The drain therefore polls progress and stops the query at the
    first completed ZERO-input batch: all available data has been
    consumed by then, and expired timeouts fired inside these same
    batches."""
    import time

    if not ttl_active:
        q.awaitTermination()
        return
    while q.isActive:
        p = q.lastProgress
        if p is not None and p.get("numInputRows", 0) == 0:
            break
        time.sleep(0.2)
    exc = q.exception()
    if exc is not None:
        raise exc
    q.stop()
    try:
        q.awaitTermination()
    except Exception:
        # our own stop() can interrupt an in-flight wake-up batch;
        # the drain itself already completed
        pass
