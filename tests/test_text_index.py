"""Persisted inverted text index: stored-index BM25/phrase answers
must equal the scan-path operators row-for-row; queries must
partition-prune to the probe buckets; job CLI end-to-end."""

from __future__ import annotations

import json
import os
import re
import sys
from unittest.mock import patch

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.tfidf import (
    bm25_from_index,
    bm25_topk,
    phrase_from_index,
    phrase_search,
    term_bucket_py,
    write_text_index,
)
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def index_dir(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tidx") / "idx")
    write_text_index(docs, d, min_term_len=2, n_buckets=16)
    return d


def test_index_layout_and_stats(spark, docs, index_dir):
    assert any(
        p.startswith("bucket=")
        for p in os.listdir(f"{index_dir}/postings")
    )
    st = spark.read.parquet(f"{index_dir}/stats").collect()[0]
    assert st["n_docs"] == docs.where("text IS NOT NULL").count()
    assert st["n_buckets"] == 16 and st["min_term_len"] == 2
    # every posting row sits in the bucket the Python twin computes
    rows = spark.read.parquet(f"{index_dir}/postings").select(
        "bucket", "term"
    ).distinct().collect()
    assert rows and all(
        r["bucket"] == term_bucket_py(r["term"], 16) for r in rows
    )


def test_bm25_from_index_equals_scan_path(spark, docs, index_dir):
    for q in (["spark", "window", "merge"], ["table"], ["fast", "big"]):
        got = [tuple(r) for r in bm25_from_index(spark, index_dir, q, k=15).collect()]
        want = [tuple(r) for r in bm25_topk(docs, q, k=15).collect()]
        assert got == want and len(got) > 0, q


def test_phrase_from_index_equals_scan_path(spark, docs, index_dir):
    for ph in (["fast", "table"], ["table", "table"], ["table"]):
        got = sorted(map(tuple, phrase_from_index(spark, index_dir, ph).collect()))
        want = sorted(map(tuple, phrase_search(docs, ph).collect()))
        assert got == want and len(got) > 0, ph


def test_query_scan_is_partition_pruned(spark, index_dir):
    """The probe plan's PartitionFilters must pin the bucket set —
    the scan reads the query terms' partitions, not the index."""
    p = plan_str(bm25_from_index(spark, index_dir, ["spark", "merge"]))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "bucket" in m.group(1) and m.group(1).strip()


def test_unknown_term_yields_empty_not_error(spark, index_dir):
    assert phrase_from_index(spark, index_dir, ["zzzunseen"]).count() == 0


def _run(argv):
    import jobs.text_index as job

    printed = []
    with patch.object(sys, "argv", ["text_index.py", *argv]), patch.object(
        SparkSession, "stop", lambda self: None
    ), patch("builtins.print", lambda s: printed.append(s)):
        job.main()
    return json.loads(printed[-1])


def test_job_build_then_query(spark, docs, tmp_path):
    idx = str(tmp_path / "idx")
    b = _run(
        ["--build", "--input", f"{SF_DIR}/documents.parquet",
         "--index", idx, "--buckets", "8", "--master", "local[4]"]
    )
    assert b["n_docs"] == docs.where("text IS NOT NULL").count()
    assert b["n_postings"] > b["n_terms"] > 0
    out = str(tmp_path / "hits")
    q = _run(
        ["--bm25", "spark window merge", "--index", idx, "--output", out,
         "--k", "15", "--master", "local[4]"]
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(tuple, bm25_topk(docs, ["spark", "window", "merge"], k=15).collect())
    )
    assert got == want and q["n_results"] == 15
    out2 = str(tmp_path / "hits2")
    p = _run(["--phrase", "fast table", "--index", idx, "--output", out2,
              "--master", "local[4]"])
    got2 = sorted(map(tuple, spark.read.parquet(out2).collect()))
    want2 = sorted(map(tuple, phrase_search(docs, ["fast", "table"]).collect()))
    assert got2 == want2 and p["n_results"] == len(want2) > 0


def test_incremental_update_equals_full_rebuild(spark, docs, tmp_path):
    """build(half) + update(other half) must answer every query
    exactly like build(all): postings row set, stats, BM25 top-k and
    phrase hits all equal."""
    from pyspark.sql import functions as F

    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")
    write_text_index(half_a, inc_dir, min_term_len=2, n_buckets=8)
    from ocr_spark.functions.tfidf import update_text_index

    update_text_index(spark, inc_dir, half_b)
    write_text_index(docs, full_dir, min_term_len=2, n_buckets=8)
    # stats equal
    si = spark.read.parquet(f"{inc_dir}/stats").collect()[0]
    sf = spark.read.parquet(f"{full_dir}/stats").collect()[0]
    assert tuple(si) == tuple(sf)
    # postings row sets equal (order-free)
    pi = sorted(
        (r["bucket"], r["term"], r["doc_id"], r["tf"], tuple(r["ps"]), r["dl"])
        for r in spark.read.parquet(f"{inc_dir}/postings").collect()
    )
    pf = sorted(
        (r["bucket"], r["term"], r["doc_id"], r["tf"], tuple(r["ps"]), r["dl"])
        for r in spark.read.parquet(f"{full_dir}/postings").collect()
    )
    assert pi == pf
    # query answers equal (and equal the scan path)
    got = [tuple(r) for r in bm25_from_index(
        spark, inc_dir, ["spark", "window", "merge"], k=15).collect()]
    want = [tuple(r) for r in bm25_topk(
        docs, ["spark", "window", "merge"], k=15).collect()]
    assert got == want
    gp = sorted(map(tuple, phrase_from_index(
        spark, inc_dir, ["fast", "table"]).collect()))
    wp = sorted(map(tuple, phrase_search(docs, ["fast", "table"]).collect()))
    assert gp == wp


def test_job_update_mode(spark, docs, tmp_path):
    from pyspark.sql import functions as F

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    docs.where(F.col("doc_id") < 250).write.parquet(a_dir)
    docs.where(F.col("doc_id") >= 250).write.parquet(b_dir)
    idx = str(tmp_path / "idx")
    _run(["--build", "--input", a_dir, "--index", idx,
          "--buckets", "8", "--master", "local[4]"])
    u = _run(["--update", "--input", b_dir, "--index", idx,
              "--master", "local[4]"])
    assert u["mode"] == "update"
    assert u["n_docs"] == docs.where("text IS NOT NULL").count()


def test_empty_corpus_index_queries_cleanly(spark, tmp_path):
    """An index over zero live docs (sum_dl NULL in stats) must answer
    queries with empty results, not crash."""
    d = str(tmp_path / "empty")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_text_index(empty, d, min_term_len=2, n_buckets=4)
    assert bm25_from_index(spark, d, ["anything"], k=5).count() == 0
    assert phrase_from_index(spark, d, ["anything"]).count() == 0


def test_bucket_function_has_one_definition(spark):
    """term_bucket_py must equal the stored bucket column for every
    term — both sides delegate to hashing.py's single definition."""
    from ocr_spark.functions.hashing import md5_long, md5_long_py

    terms = ["spark", "table", "a1b2", "zzz", "0"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r["term"]: r["h"] for r in
           df.select("term", md5_long(F.col("term")).alias("h")).collect()}
    assert got == {t: md5_long_py(t) for t in terms}


def test_update_onto_empty_base_rebuilds_partitioned_layout(spark, docs, tmp_path):
    d = str(tmp_path / "grow")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_text_index(empty, d, min_term_len=2, n_buckets=8)
    from ocr_spark.functions.tfidf import update_text_index

    update_text_index(spark, d, docs)
    assert any(p.startswith("bucket=") for p in os.listdir(f"{d}/postings"))
    got = [tuple(r) for r in bm25_from_index(
        spark, d, ["spark", "window", "merge"], k=15).collect()]
    want = [tuple(r) for r in bm25_topk(
        docs, ["spark", "window", "merge"], k=15).collect()]
    assert got == want
