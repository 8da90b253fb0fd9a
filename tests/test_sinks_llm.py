"""Sinks (S6-S11) and LLM-response parsing (P4-P6)."""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions import llm_parse as lp
from ocr_spark.pipeline import sinks

RESPONSES = [
    '{"a": "x", "n": 12}',
    '```json\n{"a": "fenced", "n": 1}\n```',
    '```\n{"a": "plainfence"}\n```',
    'noise before {"a": "embedded", "n": 7} noise after',
    "no json here at all",
    '  {"a": "padded"}  ',
    "```{\"a\": \"oneline\"}```",
    "",
]


@pytest.fixture(scope="module")
def resp_df(spark):
    pdf = pd.DataFrame({"rid": range(len(RESPONSES)), "response": RESPONSES})
    return spark.createDataFrame(pdf)


def test_parse_llm_response_semantics(resp_df):
    out = resp_df.select(
        "rid",
        lp.json_candidate(F.col("response")).alias("body"),
        lp.extract_field(lp.json_candidate(F.col("response")), "a").alias("a"),
    ).collect()
    by = {r.rid: r for r in out}
    assert json.loads(by[0].body) == {"a": "x", "n": 12}
    assert by[1].a == "fenced"
    assert by[2].a == "plainfence"
    assert by[3].a == "embedded"
    assert by[4].body is None
    assert by[5].a == "padded"
    assert by[6].a == "oneline"
    assert by[7].body is None


def test_parse_matches_duckdb(resp_df):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"rid": range(len(RESPONSES)), "response": RESPONSES}))
    body = lp.json_candidate_sql("response")
    sql = (
        f"SELECT rid, {body} AS body, "
        f"{lp.extract_field_sql(body, 'a')} AS a FROM t ORDER BY rid"
    )
    want = con.execute(sql).fetchall()
    got = sorted(
        map(
            tuple,
            resp_df.select(
                "rid",
                lp.json_candidate(F.col("response")).alias("body"),
                lp.extract_field(lp.json_candidate(F.col("response")), "a").alias("a"),
            ).collect(),
        )
    )
    # JSON whitespace canonicalization may differ between engines for
    # the body; compare parsed bodies + extracted fields
    for g, w in zip(got, sorted(want)):
        assert g[0] == w[0]
        gb = json.loads(g[1]) if g[1] else None
        wb = json.loads(w[1]) if w[1] else None
        assert gb == wb, (g, w)
        assert g[2] == w[2]


def test_strip_think(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": ["<think>reasoning...</think>\nanswer", "plain"]})
    )
    out = [r[0] for r in df.select(lp.strip_think(F.col("x"))).collect()]
    assert out == ["answer", "plain"]


def test_write_results_bucketed(spark, tmp_path):
    df = spark.range(100).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.col("id").alias("v")
    )
    sinks.write_results(df, str(tmp_path / "out"), n_buckets=4)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 100
    assert back.select("bucket").distinct().count() == 4
    # dynamic-partition overwrite of the same data is idempotent
    sinks.write_results(df, str(tmp_path / "out"), n_buckets=4)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100


def test_csv_incremental_header_once(spark, tmp_path):
    df1 = spark.createDataFrame(pd.DataFrame({"a": ["1"], "b": ["x"]}))
    df2 = spark.createDataFrame(pd.DataFrame({"a": ["2"], "b": ["y"]}))
    path = str(tmp_path / "csv")
    sinks.write_csv_incremental(df1, path)
    sinks.write_csv_incremental(df2, path)
    back = sinks.read_csv_table(spark, path)
    assert sorted((r.a, r.b) for r in back.collect()) == [("1", "x"), ("2", "y")]


def test_export_csv_bom(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"a": ["é", "b"]}))
    p = sinks.export_csv_bom(df, str(tmp_path / "x.csv"))
    raw = open(p, "rb").read()
    assert raw.startswith(sinks.UTF8_BOM)
    assert "é" in raw.decode("utf-8-sig")


def test_export_excel_gated(spark, tmp_path):
    df = spark.range(1)
    with pytest.raises(NotImplementedError):
        sinks.export_excel(df, str(tmp_path / "x.xlsx"))


def test_json_envelope(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ["d1"], "conf": [0.9]}))
    p = sinks.write_json_envelope(
        df, {"schema_version": "v1", "ocr_engine": "none"}, str(tmp_path / "r.json")
    )
    env = json.load(open(p))
    assert env["meta"]["schema_version"] == "v1"
    assert env["documents"] == [{"doc_id": "d1", "conf": 0.9}]


# ---------------------------------------------------------------------------
# JSONL corpus source
# ---------------------------------------------------------------------------


def test_read_jsonl_docs_corrupt_capture(spark, tmp_path):
    from ocr_spark.sources.read import read_jsonl_docs

    p = tmp_path / "dump"
    p.mkdir()
    (p / "part0.jsonl").write_text(
        '{"doc_id": "a", "text": "hello world", "source": "web", "lang": "en"}\n'
        'this is not json at all\n'
        '{"doc_id": "b", "text": 42, "source": "web", "lang": "en"}\n'
        '{"doc_id": "c", "text": "ok", "source": null, "lang": "vi"}\n'
    )
    df = read_jsonl_docs(spark, str(p))
    # regression: projecting ONLY the corrupt/ok columns must work
    # uncached (the raw json source throws
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN here)
    assert df.where(~F.col("ok")).count() == 1
    assert df.select("_corrupt_record").where(
        F.col("_corrupt_record").isNotNull()
    ).count() == 1
    df = df.cache()
    try:
        all_rows = df.collect()
        assert len(all_rows) == 4  # every input line present, no drops
        rows = {r.doc_id: r for r in all_rows if r.doc_id is not None}
        # clean rows parse fully
        assert rows["a"].ok and rows["a"].text == "hello world"
        assert rows["c"].ok and rows["c"].source is None
        # JSON-number-where-string-expected coerces, stays ok
        assert rows["b"].ok and rows["b"].text == "42"
        # broken JSON: row kept, raw line preserved, flagged
        bad = [r for r in all_rows if not r.ok]
        assert len(bad) == 1
        assert "not json at all" in bad[0]._corrupt_record
        assert bad[0].doc_id is None
    finally:
        df.unpersist()


def test_read_jsonl_docs_glob_and_recursion(spark, tmp_path):
    from ocr_spark.sources.read import read_jsonl_docs

    root = tmp_path / "tree"
    (root / "sub").mkdir(parents=True)
    (root / "sub" / "a.jsonl").write_text('{"doc_id": "x", "text": "t"}\n')
    (root / "sub" / "skip.txt").write_text('{"doc_id": "y", "text": "t"}\n')
    df = read_jsonl_docs(spark, str(root), glob="*.jsonl")
    assert [r.doc_id for r in df.collect()] == ["x"]
