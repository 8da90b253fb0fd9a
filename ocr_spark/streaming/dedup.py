"""Stateful streaming dedup: first-seen-wins exact dedup across
micro-batches via ``applyInPandasWithState``.

The training-data use case: documents stream in continuously; only
content never seen before (by text hash) should reach the sink. State
= one flag per content hash, partitioned by the hash — uniform keys,
so state is evenly spread across executors and lookups are local to
the hash partition. Within a batch, the lowest doc_id wins
(deterministic, mirroring exact_dedup's representative choice).

At production scale the state store is RocksDB-backed
(``spark.sql.streaming.stateStore.providerClass``) and the watermark-
less state grows with distinct-content count — for an unbounded
corpus you bound it with a TTL timeout (state.setTimeoutDuration) or
periodic snapshot-compaction into a bloom-filter broadcast.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("text_md5", StringType(), False),
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType(), True)])


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        return  # content hash already emitted in an earlier batch
    best = None
    for pdf in pdfs:
        i = pdf["doc_id"].idxmin()
        row = pdf.loc[i]
        if best is None or row["doc_id"] < best["doc_id"]:
            best = row
    state.update((1,))
    yield pd.DataFrame(
        {"text_md5": [key[0]], "doc_id": [best["doc_id"]], "text": [best["text"]]}
    )


def distinct_docs_stream(docs: DataFrame) -> DataFrame:
    """Streaming DataFrame -> first-seen distinct docs by content hash."""
    keyed = docs.select(
        F.md5("text").alias("text_md5"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_distinct_stream(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
):
    """availableNow drain of the stateful dedup over document files."""
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = distinct_docs_stream(src)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
