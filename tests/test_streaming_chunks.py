"""Streaming chunk emission: merged state equals the batch chunker
over everything ingested (unique ids), replay idempotence via the
batch-partitioned state, the duplicate-id divergence pinned, and the
post-drain conservation audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.functions.interleave import chunk_interleaved
from ocr_spark.streaming.chunks import audit_state, run_chunk_stream

_NESTED_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def _doc(doc_id, spans):
    return (doc_id, [tuple(s) for s in spans])


def _b1():
    return [
        _doc("d1", [("text", "a b c d e f", "", 0),
                    ("picture", "", "img-1", 1),
                    ("text", "g h i j", "", 2)]),
        _doc("d2", [("text", "one two three", "", 0)]),
    ]


def _b2():
    return [
        _doc("d3", [("text", " ".join(f"w{i}" for i in range(20)), "", 0),
                    ("picture", "", "img-3", 1)]),
    ]


def test_stream_equals_batch_chunker(spark, tmp_path):
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    spark.createDataFrame(_b1(), _NESTED_SCHEMA).write.parquet(
        inp, mode="append"
    )
    run_chunk_stream(spark, inp, st, ckpt, max_tokens=4,
                     media_token_cost=3)
    spark.createDataFrame(_b2(), _NESTED_SCHEMA).write.parquet(
        inp, mode="append"
    )
    run_chunk_stream(spark, inp, st, ckpt, max_tokens=4,
                     media_token_cost=3)

    got = sorted(map(tuple, spark.read.parquet(st)
                     .drop("ingest_batch").collect()))
    want = sorted(map(tuple, chunk_interleaved(
        spark.createDataFrame(_b1() + _b2(), _NESTED_SCHEMA),
        max_tokens=4, media_token_cost=3).collect()))
    assert got == want and len(got) > 3
    # post-drain audit: every ingested doc conserved, no phantoms
    audit = audit_state(spark, inp, st, max_tokens=4, media_token_cost=3)
    assert audit.where("NOT ok").count() == 0
    assert audit.count() == 3


def test_stream_replay_idempotent(spark, tmp_path):
    """Re-running the same drain (fresh checkpoint = full replay)
    rewrites each batch's partition instead of duplicating chunks."""
    inp, st, ck1, ck2 = (str(tmp_path / d)
                         for d in ("in", "state", "ck1", "ck2"))
    spark.createDataFrame(_b1(), _NESTED_SCHEMA).write.parquet(
        inp, mode="append"
    )
    run_chunk_stream(spark, inp, st, ck1, max_tokens=4,
                     media_token_cost=3)
    first = sorted(map(tuple, spark.read.parquet(st).collect()))
    run_chunk_stream(spark, inp, st, ck2, max_tokens=4,
                     media_token_cost=3)
    assert sorted(map(tuple, spark.read.parquet(st).collect())) == first


def test_duplicate_id_divergence_pinned(spark, tmp_path):
    """A re-crawled doc_id chunks per OCCURRENCE in streaming (each
    batch sees one whole row) — the audit flags it, because packing
    would double the document."""
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    row = [_doc("dup", [("text", "a b c d", "", 0),
                        ("text", "e f g h", "", 1)])]
    spark.createDataFrame(row, _NESTED_SCHEMA).write.parquet(
        inp, mode="append"
    )
    run_chunk_stream(spark, inp, st, ckpt, max_tokens=4,
                     media_token_cost=3)
    spark.createDataFrame(row, _NESTED_SCHEMA).write.parquet(
        inp, mode="append"
    )
    run_chunk_stream(spark, inp, st, ckpt, max_tokens=4,
                     media_token_cost=3)
    state = spark.read.parquet(st)
    # two occurrences -> each chunked independently in its own batch
    assert state.where("doc_id = 'dup'").count() == 4  # 2 chunks x 2
    assert state.select("ingest_batch").distinct().count() == 2
    audit = audit_state(spark, inp, st, max_tokens=4, media_token_cost=3)
    bad = audit.where("NOT ok").collect()
    assert [r.doc_id for r in bad] == ["dup", "dup"]
