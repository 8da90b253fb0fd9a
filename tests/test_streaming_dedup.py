"""Stateful streaming dedup (applyInPandasWithState): duplicates are
suppressed within a batch AND across restarts via the state store."""

from __future__ import annotations

import pandas as pd

from ocr_spark.streaming.dedup import run_distinct_stream


def test_first_seen_within_and_across_batches(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    b1 = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 10],
            "text": ["same", "same", "other", "third"],
        }
    )
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_distinct_stream(spark, inp, outp, ckpt)
    got1 = {r.text: r.doc_id for r in spark.read.parquet(outp).collect()}
    # within-batch: lowest doc_id wins per content hash
    assert got1 == {"same": 1, "other": 2, "third": 10}

    # batch 2: re-sends old content + one new text -> only the new one
    b2 = pd.DataFrame({"doc_id": [99, 100], "text": ["same", "brand new"]})
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_distinct_stream(spark, inp, outp, ckpt)
    got2 = {r.text: r.doc_id for r in spark.read.parquet(outp).collect()}
    assert got2 == {"same": 1, "other": 2, "third": 10, "brand new": 100}
