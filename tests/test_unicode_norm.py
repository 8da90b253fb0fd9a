"""NFC normalization: CPython-vs-utf8proc cross-engine parity on
hostile inputs, hash-equal-after-normalize (the dedup motivation),
NULL safety, and the single-UDF-node zero-shuffle plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.unicode_norm import normalize_nfc, normalize_nfc_sql
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"

# NFC landmines, spelled as ASCII ESCAPES so no editor/tool can
# silently pre-normalize the source file: decomposed accents,
# mis-ordered combining marks (NFC must canonically reorder),
# decomposed Hangul, ligature (NFC keeps it - only NFKC folds),
# NULLs, empty, astral plane.
HOSTILE = [
    "cafe\u0301",                    # decomposed -> caf\xe9
    "e\u0301\u0323",                 # acute(230)+dot(220): reorder+compose
    "s\u0307\u0323",                 # reorder across classes
    "\u1100\u1161\u11a8",            # decomposed Hangul jamo
    "\ufb01le",                      # ligature: unchanged under NFC
    "already caf\xe9 fine",          # composed: unchanged
    "",
    None,
    "\U0001d49c\u0301 astral",
    "mixed caf\xe9 and cafe\u0301",
]

EXPECT_0 = "caf\xe9"
EXPECT_1 = "\u1eb9\u0301"           # e + dot-below composed, acute appended
EXPECT_3 = "\uac01"                 # composed Hangul syllable GAG
EXPECT_4 = "\ufb01le"


def test_cross_engine_parity_on_hostile_inputs(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HOSTILE)], "doc_id long, text string"
    )
    got = sorted(
        map(tuple, normalize_nfc(df).select("doc_id", "text", "changed").collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, t) for i, t in enumerate(HOSTILE)]
    )
    want = sorted(map(tuple, con.execute(normalize_nfc_sql("t")).fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] == EXPECT_0 and by_id[0][2] is True
    assert by_id[1][1] == EXPECT_1 and by_id[1][2] is True
    assert by_id[3][1] == EXPECT_3 and by_id[3][2] is True
    assert by_id[4][1] == EXPECT_4 and by_id[4][2] is False  # NFC keeps ligature
    assert by_id[7][1] is None and by_id[7][2] is False      # NULL-safe


def test_normalize_makes_visually_equal_docs_hash_equal(spark):
    """The dedup motivation: composed and decomposed spellings must
    collide after normalization."""
    df = spark.createDataFrame(
        [(1, "caf\xe9 au lait"), (2, "cafe\u0301 au lait")],
        "doc_id long, text string",
    )
    before = df.select(F.md5("text").alias("h")).distinct().count()
    after = normalize_nfc(df).select(F.md5("text").alias("h")).distinct().count()
    assert before == 2 and after == 1


def test_column_passthrough_and_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", "s")], "doc_id long, text string, source string"
    )
    out = normalize_nfc(df)
    assert out.columns == ["doc_id", "text", "source", "changed"]
    with pytest.raises(ValueError):
        normalize_nfc(df.withColumn("_nfc_tmp", F.lit(1)))
    # a pre-existing 'changed' column would be silently overwritten on
    # the Spark side but duplicated by the SQL twin — must refuse
    with pytest.raises(ValueError):
        normalize_nfc(out)


def test_matches_oracle_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(map(tuple, normalize_nfc(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(normalize_nfc_sql()).fetchall()))
    assert got == want


def test_plan_single_udf_node_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    plan = plan_str(normalize_nfc(docs), "simple")
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan
