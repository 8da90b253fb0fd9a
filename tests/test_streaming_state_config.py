"""State-store config surface: RocksDB provider + TTL passthrough on
the stateful streams (VERDICT r2 #9)."""

from __future__ import annotations

import time

import pandas as pd

from ocr_spark.streaming.assemble import run_assemble_stream
from ocr_spark.streaming.dedup import run_distinct_stream
from ocr_spark.streaming.state_config import ROCKSDB_PROVIDER

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.parquet(path, mode="append")


def test_rocksdb_provider_passthrough(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")], inp)
    q = run_distinct_stream(
        spark, inp, outp, ckpt, state_store_provider="rocksdb"
    )
    # the query ran on RocksDB: provider-specific custom metrics are in
    # the progress events
    assert "rocksdb" in repr(q.lastProgress).lower()
    # dedup semantics unchanged under the other provider
    got = {r.doc_id for r in spark.read.parquet(outp).collect()}
    assert got == {1, 3}
    # the session conf was restored after start (per-query only)
    assert spark.conf.get(_PROVIDER_CONF, None) != ROCKSDB_PROVIDER


def test_assemble_accepts_provider_and_ttl(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(
        [(1, 1, 1, "solo")],
        "doc_id long, page_number long, total_pages long, page_text string",
    ).write.parquet(inp, mode="append")
    q = run_assemble_stream(
        spark, inp, outp, ckpt,
        state_store_provider="rocksdb", state_ttl_ms=3_600_000,
    )
    assert "rocksdb" in repr(q.lastProgress).lower()
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {1: (1, "solo")}
    assert spark.conf.get(_PROVIDER_CONF, None) != ROCKSDB_PROVIDER


def test_distinct_ttl_evicts_and_reemits(spark, tmp_path):
    """TTL is the documented bounded-state trade: a content hash idle
    past the TTL is forgotten, so a LATER duplicate re-emits."""
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    time.sleep(0.2)
    # batch 2 carries only an unrelated key: doc 1's state has no data
    # this batch, so its expired timeout fires and the hash is dropped
    _write_docs(spark, [(2, "other")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    time.sleep(0.2)
    # batch 3: the duplicate arrives AFTER eviction -> re-emitted
    _write_docs(spark, [(9, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(outp).collect()
    )
    assert rows == [(1, "dup-me"), (2, "other"), (9, "dup-me")]


def test_distinct_without_ttl_suppresses_late_dups(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt)
    _write_docs(spark, [(9, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt)
    assert [r.doc_id for r in spark.read.parquet(outp).collect()] == [1]
