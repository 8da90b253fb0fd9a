"""Stateful page assembly: out-of-order, cross-batch, duplicate-
tolerant — the streaming version of the reference's split-job merge."""

from __future__ import annotations

from ocr_spark.streaming.assemble import run_assemble_stream

# Explicit schema: an all-None column (e.g. batch 2 of the
# total_pages-persistence test) has no inferable type — without this,
# pandas inference writes it as BOOLEAN into the appended parquet file
# and the streaming read dies on schema merge (bigint vs boolean).
_SCHEMA = "doc_id long, page_number long, total_pages long, page_text string"


def _write(spark, rows, path):
    spark.createDataFrame(rows, schema=_SCHEMA).write.parquet(path, mode="append")


def test_assembly_across_batches(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: doc 1 incomplete (pages 3,1 of 3, out of order);
    # doc 2 complete (1 of 1); a duplicate delivery of doc2 page 1
    b1 = [
        (1, 3, 3, "three"),
        (1, 1, 3, "one"),
        (2, 1, 1, "solo"),
        (2, 1, 1, "solo"),  # at-least-once redelivery (same payload)
    ]
    _write(spark, b1, inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    got1 = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got1 == {2: (1, "solo")}

    # batch 2: doc 1's missing page arrives (+ a dup of page 3)
    _write(spark, [(1, 2, 3, "two"), (1, 3, 3, "three-dup")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    got2 = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got2 == {1: (3, "one two three"), 2: (1, "solo")}

    # batch 3: stray late page for the finished doc -> nothing new
    _write(spark, [(1, 1, 3, "one-late")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 2


def test_null_page_number_and_total_do_not_poison_state(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # a NULL page_number row is dropped; a NULL total_pages row still
    # contributes its page; the doc completes once a row carries the
    # real total
    _write(spark, [(9, None, 2, "ghost"), (9, 1, None, "one"), (9, 2, 2, "two")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {9: (2, "one two")}


def test_total_pages_persists_in_state(spark, tmp_path):
    # producers may stamp total_pages on only one page's row; the doc
    # must still complete when the FINISHING batch carries NULL totals
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(spark, [(5, 1, 2, "one")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 0  # incomplete
    _write(spark, [(5, 2, None, "two")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {5: (2, "one two")}


def test_null_page_text_does_not_poison_state(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write(spark, [(7, 1, 2, None), (7, 2, 2, "tail")], inp)
    run_assemble_stream(spark, inp, outp, ckpt)
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {7: (2, " tail")}  # NULL coalesced to '', doc completes
