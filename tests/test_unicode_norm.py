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


# ---------------------------------------------------------------------------
# encoding_profile
# ---------------------------------------------------------------------------


def test_encoding_profile_signals(spark):
    from ocr_spark.functions.unicode_norm import encoding_profile

    rows = [
        (1, "clean ascii text"),
        (2, "damaged caf" + chr(0xC3) + chr(0xA9) + " here"),  # mojibake e-acute
        (3, "lost " + chr(0xFFFD) + chr(0xFFFD) + " bytes"),   # replacement
        (4, "ctrl" + chr(0x01) + "and c1" + chr(0x85)),        # control + C1
        (5, "S" + chr(0xE3) + "o Paulo"),  # legit a-tilde: letter follows
        (6, None),
        (7, "smart quote wreck " + chr(0xE2) + chr(0x20AC) + chr(0x2122)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in encoding_profile(df).collect()}
    assert not got[1].suspect
    assert got[2].n_mojibake == 1 and got[2].suspect
    assert got[3].n_replacement == 2 and got[3].suspect
    assert got[4].n_ctrl == 2 and got[4].suspect
    assert not got[5].suspect  # legit accented word uncounted
    assert not got[6].suspect and got[6].n_ctrl == 0  # NULL text emitted
    assert got[7].n_mojibake == 1 and got[7].suspect
    assert len(got) == 7


def test_encoding_profile_cross_engine(spark):
    """Hostile mixed sample through both engines — the \\xhh escape
    and literal-char dialect surfaces under test."""
    import duckdb
    import pandas as pd

    from ocr_spark.functions.unicode_norm import (
        encoding_profile,
        encoding_profile_sql,
    )

    texts = [
        "clean",
        "caf" + chr(0xC3) + chr(0xA9),
        chr(0xFFFD) + chr(0x00) + chr(0x1F) + chr(0x9F) + "\t\n ok",
        "A" + chr(0xC2) + chr(0xAB) + "B" + chr(0xE2) + chr(0x20AC) + "C",
        None,
    ]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t_enc_df", pdf)
    got = sorted(map(tuple, encoding_profile(df).collect()))
    want = sorted(
        map(tuple, con.execute(encoding_profile_sql("t_enc_df")).fetchall())
    )
    assert got == want


def test_encoding_profile_plan_is_scan_stage(spark):
    from ocr_spark.functions.unicode_norm import encoding_profile
    from ocr_spark.plans import plan_str as _plan

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(encoding_profile(df), "simple")
    assert "Exchange" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------------------
# fix_mojibake
# ---------------------------------------------------------------------------

def _sloppy(cp: int) -> str:
    # damaged rendering of a codepoint: UTF-8 bytes read as cp1252
    # (latin-1 fallback for the five unmapped bytes) — derived, not
    # hand-typed, same rule as the operator's own table.
    out = []
    for b in chr(cp).encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def test_fix_mojibake_repairs_and_counts(spark):
    from ocr_spark.functions.unicode_norm import fix_mojibake

    rows = [
        (0, "clean text"),
        (1, "caf" + _sloppy(0xE9) + " au lait"),          # é
        (2, _sloppy(0x201C) + "hi" + _sloppy(0x201D)),     # “hi”
        (3, "price " + _sloppy(0x20AC) + "5"),             # €
        (4, None),
        (5, ""),
        # cascade regression: a GENUINE A-tilde followed by a damaged
        # NBSP — after the NBSP repair the text would read 'A-tilde +
        # NBSP', i.e. exactly the damaged form of a-grave; the direct
        # replace chain destroyed both chars ('IRM\xe04'). The sentinel
        # scheme must keep the genuine char and repair only the NBSP.
        (6, "IRM" + chr(0xC3) + _sloppy(0xA0) + "4"),
        # scrub-merge cascade regression: genuine A-tilde +
        # NONCHARACTER + NBSP — deleting the noncharacter would merge
        # the neighbors into the damaged form of a-grave and "repair"
        # them away; substitution with U+FFFD must keep both.
        (7, "X" + chr(0xC3) + chr(0xFDD5) + "\xa0" + "Y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert got[0].fixed_text == "clean text" and got[0].n_fixes == 0
    assert got[1].fixed_text == "caf\xe9 au lait" and got[1].n_fixes == 1
    assert got[2].fixed_text == "“hi”" and got[2].n_fixes == 2
    assert got[3].fixed_text == "price €5" and got[3].n_fixes == 1
    assert got[4].fixed_text is None and got[4].n_fixes == 0
    assert got[5].fixed_text == "" and got[5].n_fixes == 0
    assert got[6].fixed_text == "IRM" + chr(0xC3) + "\xa0" + "4"
    assert got[6].n_fixes == 1
    assert got[7].fixed_text == "X" + chr(0xC3) + chr(0xFFFD) + "\xa0" + "Y"
    assert got[7].n_fixes == 1  # the noncharacter substitution counts


def test_fix_mojibake_cross_engine(spark):
    import pandas as pd

    from ocr_spark.functions.unicode_norm import fix_mojibake, fix_mojibake_sql

    texts = [
        "clean",
        "caf" + _sloppy(0xE9),
        _sloppy(0x201C) + "q" + _sloppy(0x201D) + _sloppy(0x2026),
        _sloppy(0x20AC) + _sloppy(0x2122) + _sloppy(0xA0),
        # double-encoded euro: damaged form of the damaged form — a
        # single pass heals exactly one level (here: none of the
        # second-level digraphs are targets), both engines identically
        "".join(_sloppy(ord(c)) for c in _sloppy(0x20AC)),
        "stray " + chr(0xC3) + " alone",  # not a known pair: untouched
        None,
        "",
        "IRM" + chr(0xC3) + _sloppy(0xA0) + "4",  # cascade regression
        # hostile: pre-existing noncharacters (sentinel aliases) are
        # scrubbed identically by both engines
        chr(0xFDD0) + "x" + chr(0xFDEF) + _sloppy(0xE9),
    ]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t_moji_df", pdf)
    got = sorted(map(tuple, fix_mojibake(df).collect()))
    want = sorted(
        map(tuple, con.execute(fix_mojibake_sql("t_moji_df")).fetchall())
    )
    assert got == want


def test_fix_mojibake_plan_is_scan_stage(spark):
    from ocr_spark.functions.unicode_norm import fix_mojibake
    from ocr_spark.plans import plan_str as _plan

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(fix_mojibake(df), "simple")
    assert "Exchange" not in p and "ArrowEvalPython" not in p
