"""Keyword-taxonomy tagging: label semantics (ties, multi-topic
terms, none-fallback), validation, cross-engine parity, plan shape
(pre-shuffle vocabulary cut + broadcast dim)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.keywords import keyword_tag, keyword_tag_sql
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"
TAX = {
    "db": ["table", "query", "join", "hash"],
    "stream": ["stream", "window", "batch"],
    "infra": ["spark", "scan"],
}


def test_labels_and_none_fallback(spark):
    rows = [
        (1, "table query join everywhere"),          # db 3
        (2, "stream stream window vs table"),        # stream 3 > db 1
        (3, "totally unrelated words here"),         # none
        (4, None),                                   # none (NULL text)
        (5, "TABLE Query"),                          # case-insensitive db 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.topic, r.score) for r in keyword_tag(df, TAX).collect()}
    assert got == {
        1: ("db", 3),
        2: ("stream", 3),
        3: ("none", 0),
        4: ("none", 0),
        5: ("db", 2),
    }


def test_tie_breaks_topic_ascending(spark):
    df = spark.createDataFrame(
        [(1, "table stream")], "doc_id long, text string"
    )
    got = keyword_tag(df, TAX).collect()[0]
    assert (got.topic, got.score) == ("db", 1)  # db < stream at tie


def test_term_in_multiple_topics_credits_both(spark):
    tax = {"a_topic": ["shared"], "b_topic": ["shared", "extra"]}
    df = spark.createDataFrame(
        [(1, "shared extra"), (2, "shared")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.topic, r.score) for r in keyword_tag(df, tax).collect()}
    assert got[1] == ("b_topic", 2)
    assert got[2] == ("a_topic", 1)  # 1-1 tie -> name ascending


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        keyword_tag(df, {})
    with pytest.raises(ValueError):
        keyword_tag(df, {"ok": []})
    with pytest.raises(ValueError):
        keyword_tag(df, {"bad topic!": ["x"]})
    with pytest.raises(ValueError):
        keyword_tag(df, {"ok": ["two words"]})
    with pytest.raises(ValueError):
        keyword_tag_sql("documents", {"ok": ["it's"]})


def test_cross_engine(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    got = sorted(map(tuple, keyword_tag(docs, TAX).collect()))
    want = sorted(
        map(tuple, con.execute(keyword_tag_sql("documents", TAX)).fetchall())
    )
    assert got == want
    assert len(got) == docs.count()  # every doc labeled, incl. 'none'


def test_plan_broadcasts_dim_and_no_nested_loop(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_str(keyword_tag(docs, TAX))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_none_topic_name_is_reserved(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        keyword_tag(df, {"none": ["table"]})
