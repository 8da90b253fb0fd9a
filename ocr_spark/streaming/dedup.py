"""Stateful streaming dedup: first-seen-wins exact dedup across
micro-batches via ``applyInPandasWithState``.

The training-data use case: documents stream in continuously; only
content never seen before (by text hash) should reach the sink. State
= one flag per content hash, partitioned by the hash — uniform keys,
so state is evenly spread across executors and lookups are local to
the hash partition. Within a batch, the lowest doc_id wins
(deterministic, mirroring exact_dedup's representative choice).

At production scale pass ``state_store_provider="rocksdb"`` (disk-
backed store — the watermark-less state grows with distinct-content
count) and bound state growth with ``state_ttl_ms`` (a content hash
unseen for that long is forgotten; a later duplicate re-emits — the
explicit bounded-state trade) or periodic snapshot-compaction into a
bloom-filter broadcast.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ocr_spark.streaming.state_config import arm_ttl, drain_query, state_confs
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

def _out_schema(id_type) -> StructType:
    """Output schema parameterized on the corpus's doc_id type —
    id-type-agnostic like the batch operators (a long cast would NULL
    every string id in the emitted keep rows)."""
    return StructType(
        [
            # nullable: a NULL-text doc hashes to a NULL key (md5(NULL)
            # = NULL in both engines) and that group is still emitted —
            # a non-nullable field here would fail the batch and poison
            # the checkpoint instead
            StructField("text_md5", StringType(), True),
            StructField("doc_id", id_type, True),
            StructField("text", StringType(), True),
        ]
    )
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType(), True)])


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    if ttl_ms is not None and state.hasTimedOut:
        state.remove()  # TTL: forget the hash; a later dup re-emits
        return
    if state.exists:
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # seen again: refresh TTL
        return  # content hash already emitted in an earlier batch
    best = None
    fallback = None  # first row seen, if every doc_id is NULL
    for pdf in pdfs:
        if fallback is None and len(pdf):
            fallback = pdf.iloc[0]
        # min over NON-NULL ids, mirroring SQL min(doc_id) (NULLs are
        # skipped; the rep is NULL only when all ids are). idxmin on a
        # mixed None/str column raises TypeError and an all-None group
        # returns nan -> loc KeyError — either would fail the batch and
        # the checkpoint would replay it forever.
        ids = pdf["doc_id"].dropna()
        if ids.empty:
            continue
        row = pdf.loc[ids.idxmin()]
        if best is None or row["doc_id"] < best["doc_id"]:
            best = row
    if best is None:
        best = fallback
    if best is None:
        # defensively: an invocation with no rows must not mark the
        # hash seen (that would suppress a future real first sighting)
        return
    state.update((1,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    doc_id = best["doc_id"]
    yield pd.DataFrame(
        {
            "text_md5": [key[0]],
            "doc_id": [None if pd.isna(doc_id) else doc_id],
            "text": [best["text"]],
        }
    )


def distinct_docs_stream(
    docs: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame -> first-seen distinct docs by content hash.

    ``state_ttl_ms``: forget a content hash untouched for that long
    (processing-time timeout; each new sighting refreshes it) — bounds
    state on an unbounded corpus at the price of re-emitting a dup
    that arrives after the TTL."""
    keyed = docs.select(
        F.md5("text").alias("text_md5"),
        "doc_id",
        "text",
    )
    fn, timeout = arm_ttl(_first_seen, state_ttl_ms)
    return keyed.groupBy("text_md5").applyInPandasWithState(
        fn,
        outputStructType=_out_schema(docs.schema["doc_id"].dataType),
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_distinct_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_store_provider: str | None = None,
    state_ttl_ms: int | None = None,
):
    """availableNow drain of the stateful dedup over document files.

    ``state_store_provider``: "rocksdb" (or a provider class name);
    None keeps the session default. ``state_ttl_ms``: see
    distinct_docs_stream."""
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = distinct_docs_stream(src, state_ttl_ms)
    with state_confs(spark, state_store_provider):
        q = (
            out.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    drain_query(q, ttl_active=state_ttl_ms is not None)
    return q
