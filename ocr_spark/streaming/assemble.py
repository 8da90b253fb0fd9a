"""Stateful page assembly: the Structured-Streaming re-expression of
the reference's incremental split-job protocol
(/root/reference/webapp/jobs.py:139-283).

The reference pushes one page at a time through a cursor and merges
each result into shared state under a lock until the document is
complete. Here, pages arrive as a stream in ANY order across ANY
number of micro-batches; per-doc state (keyed by doc_id, hash-
partitioned -> uniform state distribution) accumulates pages and the
completed document is emitted exactly once, pages re-ordered by
page_number. Duplicate page deliveries are ignored (at-least-once
upstream -> exactly-once assembly), mirroring finalize's dedup-by-
token (jobs.py:221-224).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ocr_spark.streaming.state_config import arm_ttl, drain_query, state_confs
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

def _out_schema(id_type) -> StructType:
    """Output schema parameterized on the corpus's doc_id type —
    id-type-agnostic like the batch operators (a long cast would NULL
    string ids and collapse every doc into one NULL state group)."""
    return StructType(
        [
            StructField("doc_id", id_type, False),
            StructField("n_pages", IntegerType(), True),
            StructField("text", StringType(), True),
        ]
    )
ASSEMBLE_STATE_SCHEMA = StructType(
    [
        StructField("page_numbers", ArrayType(IntegerType()), True),
        StructField("texts", ArrayType(StringType()), True),
        # the doc's page count PERSISTS in state: producers may stamp
        # total_pages on only one page's row, and the completing batch
        # may carry NULL totals — deriving total per-batch would strand
        # a complete doc forever
        StructField("total_pages", IntegerType(), True),
        StructField("done", BooleanType(), True),
    ]
)


def _assemble(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    if ttl_ms is not None and state.hasTimedOut:
        # TTL eviction: an incomplete doc whose pages stopped arriving
        # — drop the partial state (bounded-state trade: a page landing
        # after eviction restarts the doc from scratch)
        state.remove()
        return
    if state.exists:
        nums, texts, total, done = state.get
        nums, texts = list(nums), list(texts)
        total = None if total is None or pd.isna(total) else int(total)
    else:
        nums, texts, total, done = [], [], None, False
    if done:
        # late duplicate pages after completion: ignored. The TTL must
        # be RE-ARMED even here — GroupState clears a key's timeout on
        # every function invocation, so returning without setting it
        # would cancel the eviction and keep the completed doc's state
        # forever (exactly the unbounded growth the TTL exists to stop).
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return
    seen = set(nums)
    for pdf in pdfs:
        for r in pdf.itertuples():
            # NULL page_number is unplaceable -> drop the row; NULL
            # total_pages keeps the page but can't complete the doc.
            # Either would otherwise raise inside applyInPandasWithState
            # and poison the stream permanently (the checkpoint replays
            # the same batch on every restart).
            if pd.isna(r.page_number):
                continue
            if not pd.isna(r.total_pages):
                total = int(r.total_pages)
            p = int(r.page_number)
            if p in seen:
                continue  # duplicate delivery
            seen.add(p)
            nums.append(p)
            # NULL page_text must not poison the state or the final
            # join (a None here raises inside applyInPandasWithState
            # with the bad pages already persisted) — coalesce to ''.
            t = r.page_text
            texts.append("" if t is None or (isinstance(t, float) and pd.isna(t)) else t)
    if total is not None and len(nums) >= total:
        order = sorted(range(len(nums)), key=lambda i: nums[i])
        full = " ".join(texts[i] for i in order)
        state.update(([], [], total, True))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"doc_id": [key[0]], "n_pages": [len(nums)], "text": [full]}
        )
    else:
        state.update((nums, texts, total, False))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)


def assemble_docs_stream(
    pages: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming (doc_id, page_number, total_pages, page_text) ->
    completed (doc_id, n_pages, text), one row per doc, exactly once.

    ``state_ttl_ms``: evict per-doc state untouched for that long
    (processing-time timeout) — bounds state for never-completing docs
    at the price of restarting a doc whose pages resume after the TTL.
    """
    # NULL doc_id pages are unassemblable (no doc to complete) and the
    # output field is non-nullable — a NULL key group would fail the
    # batch with its pages already persisted in state, and the
    # checkpoint would replay the poison batch forever. Filter them in
    # the plan (scan-stage, zero Python cost), mirroring the NULL
    # page_number drop below.
    keyed = pages.where(F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.col("page_number").cast("int"),
        F.col("total_pages").cast("int"),
        "page_text",
    )
    fn, timeout = arm_ttl(_assemble, state_ttl_ms)
    return keyed.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType=_out_schema(pages.schema["doc_id"].dataType),
        stateStructType=ASSEMBLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_assemble_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_store_provider: str | None = None,
    state_ttl_ms: int | None = None,
):
    """availableNow drain of the page assembler.

    ``state_store_provider``: "rocksdb" (or a provider class name) for
    the disk-backed store — the production choice for unbounded doc_id
    spaces; None keeps the session default. ``state_ttl_ms``: see
    assemble_docs_stream."""
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    with state_confs(spark, state_store_provider):
        q = (
            assemble_docs_stream(src, state_ttl_ms)
            .writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    drain_query(q, ttl_active=state_ttl_ms is not None)
    return q
