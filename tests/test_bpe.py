"""BPE: trainer determinism/tie-breaks, replace-chain == symbol-wise
encoding (differential vs the pure-Python reference), placeholder
hygiene, SQL-literal escaping, cross-engine token counts."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.bpe import (
    PUA_BASE,
    bpe_token_counts,
    bpe_token_counts_sql,
    encode_word_py,
    surface_forms,
    train_bpe,
    train_bpe_from_counts,
)
from ocr_spark.functions.bpe_merges import MERGES_SF001

SF_DIR = "/root/testdata/sf0.001"


def test_trainer_classic_example():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(wc, 4)
    # 'es' (9) then 'es'+'t' (9) dominate, as in the Sennrich example
    assert merges[0] == ("e", "s")
    assert merges[1] == (chr(PUA_BASE), "t")
    surf = surface_forms(merges)
    assert surf[chr(PUA_BASE + 1)] == "est"
    assert encode_word_py("newest", merges[:2]) == ["n", "e", "w", "est"]


def test_trainer_tie_break_is_pair_ascending():
    # 'xy' and 'ab' both occur once -> lexicographic 'ab' merges first
    merges = train_bpe_from_counts({"xy": 1, "ab": 1}, 1)
    assert merges == [("a", "b")]


def test_trainer_is_deterministic():
    wc = {f"w{i}ord{i%7}": i + 1 for i in range(200)}
    assert train_bpe_from_counts(wc, 32) == train_bpe_from_counts(wc, 32)


def test_replace_chain_equals_symbolwise_encoding():
    """The engine applies merges as chained replace() calls; pin that
    against the symbol-wise reference on seeded random words."""
    import random

    rng = random.Random(42)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    wc = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    merges = train_bpe_from_counts(wc, 24)

    def symbolwise(word):
        syms = list(word)
        for i, (a, b) in enumerate(merges):
            new = chr(PUA_BASE + i)
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        surf = surface_forms(merges)
        return [surf.get(s, s) for s in syms]

    for w in words:
        assert encode_word_py(w, merges) == symbolwise(w), w


def test_encode_strips_pua_input():
    merges = [("a", "b")]
    assert encode_word_py("a\ue000b", merges) == ["ab"]


def test_token_counts_cross_engine_and_escaping(spark):
    """Corpus with apostrophes and backslashes in words — the inlined
    merge literals must be escaped per dialect."""
    texts = ["don't don't won't c:\\path d'or d'or d'or"] * 3
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    merges = train_bpe(df, n_merges=12)
    assert any("'" in a + b or "\\" in a + b for a, b in merges)
    got = [tuple(r) for r in bpe_token_counts(df, merges, k=20).collect()]
    con = duckdb.connect()
    con.register("bpe_pdf", pdf)
    con.execute("CREATE VIEW bpe_t AS SELECT * FROM bpe_pdf")
    want = [
        tuple(r)
        for r in con.execute(
            bpe_token_counts_sql("bpe_t", merges, k=20)
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_baked_merges_on_contract_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = [
        tuple(r) for r in bpe_token_counts(docs, MERGES_SF001, k=50).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            bpe_token_counts_sql("documents", MERGES_SF001, k=50)
        ).fetchall()
    ]
    # 64 merges collapse the 26-letter alphabet into 42 distinct
    # surviving tokens on this corpus — fewer than k
    assert got == want and len(got) == len(want) > 0
    # trained merges actually fire: multi-char tokens in the top-50
    assert any(len(t) > 1 for t, _ in got)


def test_empty_merges_rejected(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        bpe_token_counts(docs, [], k=5)
    with pytest.raises(ValueError):
        bpe_token_counts_sql("documents", [], k=5)


def test_doc_token_counts_equal_per_word_reference(spark):
    """The whole-text chained replace must equal summing the
    pure-Python per-word encoder — pair matches never span
    whitespace."""
    from ocr_spark.functions.bpe import (
        bpe_doc_token_counts,
        bpe_doc_token_counts_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_doc_token_counts(docs, MERGES_SF001).collect()
    }
    import re

    from ocr_spark.schema import WS

    ws_re = re.compile(WS + "+")
    for r in docs.limit(40).collect():
        words = [w for w in ws_re.split(r.text) if w != ""]
        want = sum(len(encode_word_py(w, MERGES_SF001)) for w in words)
        assert got[r.doc_id] == want, r.doc_id
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want_all = dict(
        con.execute(
            bpe_doc_token_counts_sql("documents", MERGES_SF001)
        ).fetchall()
    )
    assert got == want_all


def test_doc_token_counts_null_text(spark):
    from ocr_spark.functions.bpe import bpe_doc_token_counts

    df = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_bpe_tokens for r in
           bpe_doc_token_counts(df, [("a", "b")]).collect()}
    assert out == {1: None, 2: 1}


def test_non_pua_high_codepoints_are_kept(spark):
    """Only [U+E000, U+F8FF] is placeholder space — emoji, fullwidth
    forms, and CJK-compat chars above it are REAL text and must
    survive both the Python reference and the engine identically
    (the >= E000 filter bug the review pass executed and confirmed)."""
    from ocr_spark.functions.bpe import (
        bpe_doc_token_counts,
        bpe_doc_token_counts_sql,
    )

    merges = [("a", "b")]
    text = "a\U0001f600b ａ ab"
    assert encode_word_py("a\U0001f600b", merges) == ["a", "\U0001f600", "b"]
    assert encode_word_py("ａ", merges) == ["ａ"]
    pdf = pd.DataFrame({"doc_id": [1], "text": [text]})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    got = [tuple(r) for r in bpe_doc_token_counts(df, merges).collect()]
    assert got == [(1, 5)]  # a, emoji, b | fullwidth-a | merged ab
    con = duckdb.connect()
    con.register("pua_pdf", pdf)
    want = [
        tuple(r)
        for r in con.execute(
            bpe_doc_token_counts_sql("pua_pdf", merges)
        ).fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# bpe_fertility_by_lang
# ---------------------------------------------------------------------------


def test_fertility_matches_oracle(spark):
    import duckdb

    from ocr_spark.functions.bpe import (
        bpe_fertility_by_lang,
        bpe_fertility_by_lang_sql,
    )
    from ocr_spark.functions.bpe_merges import MERGES_SF001

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        map(tuple, bpe_fertility_by_lang(docs, MERGES_SF001).collect())
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                bpe_fertility_by_lang_sql("documents", MERGES_SF001)
            ).fetchall(),
        )
    )
    assert got == want


def test_fertility_semantics(spark):
    """Fertility >= 1.0 always (a word is >= 1 token); an untrained-
    vocabulary language fragments into MORE tokens per word than the
    language the merges were trained on; NULL/empty docs count 0/0
    but still appear in n_docs."""
    from ocr_spark.functions.bpe import bpe_fertility_by_lang
    from ocr_spark.functions.bpe_merges import MERGES_SF001

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.lang_pred: r for r in bpe_fertility_by_lang(docs, MERGES_SF001).collect()}
    for r in rows.values():
        assert r.fertility_ppm >= 1_000_000
        assert r.n_ws_tokens > 0 and r.n_bpe_tokens >= r.n_ws_tokens

    null_docs = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "the a of and to in is was for on")],
        "doc_id long, text string",
    )
    got = {r.lang_pred: r for r in bpe_fertility_by_lang(null_docs, MERGES_SF001).collect()}
    assert got["und"].n_docs == 2  # NULL + whitespace-only
    assert got["und"].n_ws_tokens == 0 and got["und"].fertility_ppm is None
    assert got["en"].n_docs == 1
