"""Stateful page assembly: out-of-order, cross-batch, duplicate-
tolerant — the streaming version of the reference's split-job merge."""

from __future__ import annotations

import pandas as pd

from ocr_spark.streaming.assemble import run_assemble_stream


def _pages(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "page_number", "total_pages", "page_text"]
    )


def test_assembly_across_batches(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: doc 1 incomplete (pages 3,1 of 3, out of order);
    # doc 2 complete (1 of 1); a duplicate delivery of doc2 page 1
    b1 = _pages(
        [
            (1, 3, 3, "three"),
            (1, 1, 3, "one"),
            (2, 1, 1, "solo"),
            (2, 1, 1, "solo"),  # at-least-once redelivery (same payload)
        ]
    )
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    got1 = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got1 == {2: (1, "solo")}

    # batch 2: doc 1's missing page arrives (+ a dup of page 3)
    b2 = _pages([(1, 2, 3, "two"), (1, 3, 3, "three-dup")])
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    got2 = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got2 == {1: (3, "one two three"), 2: (1, "solo")}

    # batch 3: stray late page for the finished doc -> nothing new
    b3 = _pages([(1, 1, 3, "one-late")])
    spark.createDataFrame(b3).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 2


def test_null_page_number_and_total_do_not_poison_state(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # a NULL page_number row is dropped; a NULL total_pages row still
    # contributes its page; the doc completes once a row carries the
    # real total
    b1 = _pages([(9, None, 2, "ghost"), (9, 1, None, "one"), (9, 2, 2, "two")])
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {9: (2, "one two")}


def test_total_pages_persists_in_state(spark, tmp_path):
    # producers may stamp total_pages on only one page's row; the doc
    # must still complete when the FINISHING batch carries NULL totals
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(_pages([(5, 1, 2, "one")])).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 0  # incomplete
    spark.createDataFrame(_pages([(5, 2, None, "two")])).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {5: (2, "one two")}


def test_null_page_text_does_not_poison_state(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    b1 = _pages([(7, 1, 2, None), (7, 2, 2, "tail")])
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {7: (2, " tail")}  # NULL coalesced to '', doc completes
