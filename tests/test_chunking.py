"""Training-window chunking: exact window semantics on a hand corpus,
knob validation, DuckDB-twin parity on the real corpus, and the
zero-shuffle plan shape."""

from __future__ import annotations

import duckdb
import pytest

from ocr_spark.functions.chunking import chunk_documents, chunk_documents_sql
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).collect()
    return sorted((r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out)


def test_window_semantics(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 words
    got = _chunks(spark, [(1, text)], max_tokens=4, overlap=1)
    # stride 3: starts 0,3,6 cover w9? start 6 -> w6..w9 -> yes, 3 windows
    assert got == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w3 w4 w5 w6"),
        (1, 2, 4, "w6 w7 w8 w9"),
    ]
    # exact multiple: 10 words, max 4, stride 2 -> last start 6 (w6..w9),
    # ceil((10-4)/2)=3 -> 4 windows, none degenerate
    got = _chunks(spark, [(1, text)], max_tokens=4, overlap=2)
    assert [g[1] for g in got] == [0, 1, 2, 3]
    assert got[-1] == (1, 3, 4, "w6 w7 w8 w9")


def test_short_doc_single_window_and_ws_collapse(spark):
    got = _chunks(spark, [(7, "  a\t\tb \n c  ")], max_tokens=5, overlap=0)
    assert got == [(7, 0, 3, "a b c")]


def test_empty_null_docs_yield_no_chunks(spark):
    got = _chunks(spark, [(1, ""), (2, "   "), (3, None), (4, "x")])
    assert got == [(4, 0, 1, "x")]


def test_knob_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for kw in ({"max_tokens": 0}, {"max_tokens": 4, "overlap": 4},
               {"max_tokens": 4, "overlap": -1}):
        with pytest.raises(ValueError):
            chunk_documents(df, **kw)
        with pytest.raises(ValueError):
            chunk_documents_sql(**kw)


def test_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        map(tuple, chunk_documents(docs, max_tokens=64, overlap=16).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                chunk_documents_sql(max_tokens=64, overlap=16)
            ).fetchall(),
        )
    )
    assert got == want
    # the corpus genuinely exercises multi-chunk docs
    assert len(got) > docs.count()


def test_plan_is_scan_stage_only(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_str(chunk_documents(docs), "simple")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    fmt = plan_str(chunk_documents(docs), "formatted")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in fmt, fmt


# ---------------------------------------------------------------------------
# split_sentences
# ---------------------------------------------------------------------------


def test_split_sentences_semantics(spark):
    import pandas as pd

    from ocr_spark.functions.chunking import split_sentences

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "One sentence. Two!  Three?! No terminator tail",
                None,
                "no punct at all",
            ],
        }
    )
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    got = {(r.doc_id, r.sent_idx): r.sentence for r in split_sentences(df).collect()}
    assert got == {
        (1, 1): "One sentence.",
        (1, 2): "Two!",
        (1, 3): "Three?!",
        (1, 4): "No terminator tail",
        (3, 1): "no punct at all",
    }


def test_split_sentences_cross_engine(spark):
    import duckdb
    import pandas as pd

    from ocr_spark.functions.chunking import (
        split_sentences,
        split_sentences_sql,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "A. B! C? D?! E.\t F.\nG",
                "Mr. Smith went. east",
                "trailing dot.",
                ".. leading",
            ],
        }
    )
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    con = duckdb.connect()
    con.register("t_ss", pdf)
    got = sorted(map(tuple, split_sentences(df).collect()))
    want = sorted(map(tuple, con.execute(split_sentences_sql("t_ss")).fetchall()))
    assert got == want and len(got) > 0


def test_split_sentences_plan_is_scan_stage(spark):
    from ocr_spark.functions.chunking import split_sentences
    from ocr_spark.plans import plan_str

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in plan_str(split_sentences(docs), "simple")


def test_split_sentences_deletes_literal_sentinel(spark):
    """A raw 0x1e byte in dirty input must not act as a boundary —
    both twins delete it before splitting."""
    import duckdb
    import pandas as pd

    from ocr_spark.functions.chunking import (
        split_sentences,
        split_sentences_sql,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1], "text": ["foo\x1ebar baz. tail"]}
    )
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    got = sorted(map(tuple, split_sentences(df).collect()))
    assert got == [(1, 1, "foobar baz."), (1, 2, "tail")]
    con = duckdb.connect()
    con.register("t_sent", pdf)
    want = sorted(map(tuple, con.execute(split_sentences_sql("t_sent")).fetchall()))
    assert got == want
