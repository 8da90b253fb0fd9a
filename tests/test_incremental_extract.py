"""Incremental extraction (daily-crawl shape): only new/changed docs
reach the kernel; unchanged results carry forward; deleted docs drop.
The driver contract pins incremental == full extraction over the synth
corpus; these tests pin the branch semantics the contract can't see."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline.extract import (
    doc_input_hash,
    doc_input_hash_sql,
    extract_main_content,
    incremental_extract,
)
from ocr_spark.schema import DOC_SCHEMA
from ocr_spark.sources.synth import synthesize_spans, synth_spans_sql

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spans(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return synthesize_spans(docs).cache()


def _mk(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _span(i, text, kind="text"):
    return {"kind": kind, "text": text, "media_ref": "", "offset": i}


def test_input_hash_matches_duckdb_twin(spark, spans):
    got = sorted(map(tuple, doc_input_hash(spans).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(doc_input_hash_sql(synth_spans_sql())).fetchall())
    )
    assert got == want and len(got) == 500


def test_input_hash_order_insensitive_and_null_safe(spark):
    a = _mk(spark, [("d", [_span(0, "x"), _span(1, "y")])])
    b = _mk(spark, [("d", [_span(1, "y"), _span(0, "x")])])  # shuffled
    ha = doc_input_hash(a).collect()[0].input_hash
    hb = doc_input_hash(b).collect()[0].input_hash
    assert ha == hb  # canonical offset order, not array order
    # NULL vs '' text must hash differently (the \x00 sentinel)
    c = _mk(spark, [("d", [_span(0, None)])])
    d = _mk(spark, [("d", [_span(0, "")])])
    assert (
        doc_input_hash(c).collect()[0].input_hash
        != doc_input_hash(d).collect()[0].input_hash
    )
    # a NULL spans array still gets a stable key
    e = _mk(spark, [("d", None)])
    assert doc_input_hash(e).collect()[0].input_hash is not None


def test_input_hash_offset_ties_deterministic_vs_twin(spark):
    """Offset TIES (duplicate offsets, NULL offsets both coalesced to
    -1) must serialize in the same order on both engines: the
    secondary sort key is the full serialized span string, so Spark's
    array_sort and DuckDB's string_agg ORDER BY agree even where a
    single-key sort would be stable on one side and unspecified on
    the other."""
    rows = [
        (
            "7",
            [
                {"kind": "text", "text": "bbb", "media_ref": "", "offset": 5},
                {"kind": "text", "text": "aaa", "media_ref": "", "offset": 5},
                {"kind": "img", "text": None, "media_ref": "m2", "offset": None},
                {"kind": "img", "text": None, "media_ref": "m1", "offset": None},
            ],
        )
    ]
    got = doc_input_hash(_mk(spark, rows)).collect()[0].input_hash
    # array order must not matter even among tied offsets
    rev = [("7", list(reversed(rows[0][1])))]
    assert doc_input_hash(_mk(spark, rev)).collect()[0].input_hash == got
    con = duckdb.connect()
    flat = (
        "SELECT '7' AS doc_id, kind, text, media_ref, \"offset\" FROM ("
        "VALUES ('text', 'bbb', '', 5), ('text', 'aaa', '', 5), "
        "('img', NULL, 'm2', NULL), ('img', NULL, 'm1', NULL)"
        ") t(kind, text, media_ref, \"offset\")"
    )
    want = con.execute(doc_input_hash_sql(flat)).fetchall()[0][1]
    assert got == want


def test_incremental_branches(spark):
    """new / changed / unchanged / deleted, all in one run."""
    old = _mk(
        spark,
        [
            ("keep", [_span(0, "same words here")]),
            ("edit", [_span(0, "old content")]),
            ("gone", [_span(0, "deleted doc")]),
        ],
    )
    new = _mk(
        spark,
        [
            ("keep", [_span(0, "same words here")]),
            ("edit", [_span(0, "new content")]),
            ("born", [_span(0, "brand new doc")]),
        ],
    )
    out = incremental_extract(
        new, doc_input_hash(old), extract_main_content(old)
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {"keep", "edit", "born"}  # 'gone' dropped
    assert all(r.recomputed == 0 for r in by_doc["keep"])
    assert all(r.recomputed == 1 for r in by_doc["edit"])
    assert all(r.recomputed == 1 for r in by_doc["born"])
    # the changed doc reflects TODAY's content, not the carried rows
    assert [r.text for r in by_doc["edit"]] == ["new content"]


def test_incremental_equals_full_extraction(spark, spans):
    """The headline invariant at corpus scale: output == full
    re-extraction, with only the delta recomputed."""
    even = spans.where(F.expr("CAST(doc_id AS BIGINT) % 2 = 0"))
    out = incremental_extract(
        spans, doc_input_hash(even), extract_main_content(even)
    )
    got = sorted(
        map(tuple, out.select("doc_id", "kind", "text", "media_ref", "offset").collect())
    )
    want = sorted(map(tuple, extract_main_content(spans).collect()))
    assert got == want
    flags = out.groupBy("recomputed").count().collect()
    n = {r.recomputed: r["count"] for r in flags}
    assert n[0] > 0 and n[1] > 0  # both branches really ran
