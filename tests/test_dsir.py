"""DSIR-style importance weighting: hand-checked fixed-point scores,
selection-signal sanity, degenerate inputs, and string-id transparency.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.dsir import dsir_weights
from ocr_spark.functions.lm import P_SCALE

# Two "domains" with disjoint vocabulary: target-looking docs repeat
# one bigram, background-looking docs another.
T_TEXT = "alpha beta " * 5  # bigrams: (alpha,beta) x5, (beta,alpha) x4
B_TEXT = "gamma delta " * 5


@pytest.fixture(scope="module")
def corpus(spark):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [T_TEXT, T_TEXT, B_TEXT, B_TEXT],
        }
    )
    return spark.createDataFrame(df).persist()


def test_hand_checked_scores(spark, corpus):
    """Target = docs 1-2. Every feature of doc 1 appears in the target
    with p_t ~ 2x its background p_r (target has half the mass), so
    its score is positive; background docs mirror negative.

    Exact check for doc 1: its 9 bigrams are (a,b) x5 + (b,a) x4.
    target totals: 18 bigrams; c_t(a,b)=10, c_t(b,a)=8.
    raw totals: 36; c_r(a,b)=10, c_r(b,a)=8.
    contribution(a,b) = (1e6*10)//18 - (1e6*10)//36 = 555555 - 277777
    per occurrence; (b,a) = (1e6*8)//18 - (1e6*8)//36 = 444444 - 222222.
    score = 5*(555555-277777) + 4*(444444-222222) = 2277778.
    """
    target = corpus.where(F.col("doc_id") <= 2)
    rows = {r.doc_id: (r.n_feats, r.score_scaled) for r in dsir_weights(corpus, target).collect()}
    assert rows[1] == (9, 5 * (555555 - 277777) + 4 * (444444 - 222222))
    assert rows[1] == rows[2]
    # background docs: c_t = 0 for their features -> pure negative
    assert rows[3][1] < 0 and rows[3] == rows[4]


def test_self_target_is_zero(corpus):
    """Target == raw == docs: p_t == p_r for every feature, so every
    score is exactly 0 (the fixed-point difference cancels)."""
    rows = dsir_weights(corpus, corpus).collect()
    assert all(r.score_scaled == 0 for r in rows)
    assert all(r.n_feats == 9 for r in rows)


def test_short_docs_score_zero(spark, corpus):
    one_word = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["solo"]})
    )
    rows = dsir_weights(one_word, corpus).collect()
    assert [(r.n_feats, r.score_scaled) for r in rows] == [(0, 0)]


def test_empty_target(spark, corpus):
    """An empty target domain contributes 0 per feature; scores are
    pure negated background probabilities (no crash, no NULLs)."""
    empty = corpus.where(F.lit(False))
    rows = {r.doc_id: r.score_scaled for r in dsir_weights(corpus, empty).collect()}
    assert all(v < 0 for v in rows.values())
    # doc 1: -(5*(1e6*10)//36 + 4*(1e6*8)//36)
    assert rows[1] == -(5 * ((P_SCALE * 10) // 36) + 4 * ((P_SCALE * 8) // 36))


def test_string_ids(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["sha1:a", "sha1:b"], "text": [T_TEXT, B_TEXT]})
    )
    target = df.where(F.col("doc_id") == "sha1:a")
    rows = {r.doc_id: r.score_scaled for r in dsir_weights(df, target).collect()}
    assert set(rows) == {"sha1:a", "sha1:b"}
    assert rows["sha1:a"] > 0 > rows["sha1:b"]


def test_separate_raw_background(spark, corpus):
    """Explicit raw corpus: docs scored against target/raw tables built
    from OTHER corpora (the production shape — score a new batch
    against maintained artifacts)."""
    target = corpus.where(F.col("doc_id") <= 2)
    raw = corpus.where(F.col("doc_id") >= 3)
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7, 8], "text": [T_TEXT, B_TEXT]})
    )
    rows = {r.doc_id: r.score_scaled for r in dsir_weights(batch, target, raw=raw).collect()}
    # doc 7's features: in target only -> positive; doc 8: in raw only -> negative
    assert rows[7] > 0 > rows[8]


# ---------------------------------------------------------------------------
# corpus_drift (snapshot monitoring)
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def con():
    import duckdb

    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return c


def test_drift_self_is_zero(docs):
    from ocr_spark.functions.dsir import corpus_drift

    out = corpus_drift(docs, docs).collect()
    assert len(out) == 20
    assert all(r.l1_scaled == 0 for r in out)
    assert all(r.n_feats_a == r.n_feats_b for r in out)


def test_drift_disjoint_groups_score_full(spark):
    """A group present in only one snapshot drifts against the empty
    distribution — l1 ~ 1e6 (its whole probability mass), never
    dropped."""
    from ocr_spark.functions.dsir import corpus_drift

    a = spark.createDataFrame(
        [(1, "alpha beta gamma", "sA"), (2, "alpha beta", "sBoth")],
        "doc_id long, text string, source string",
    )
    b = spark.createDataFrame(
        [(3, "delta epsilon zeta", "sB"), (4, "alpha beta", "sBoth")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in corpus_drift(a, b).collect()}
    assert set(out) == {"sA", "sB", "sBoth"}
    assert out["sBoth"].l1_scaled == 0
    # integer div flooring can shave at most 1 unit per feature
    assert out["sA"].l1_scaled >= 999_998 and out["sB"].l1_scaled >= 999_998
    assert out["sA"].n_feats_b == 0 and out["sB"].n_feats_a == 0


def test_drift_null_group_and_hostile_ids(spark, con):
    """Session-10 review regression: (a) a NULL group present in both
    snapshots must match itself (null-safe join) — identical content
    scores 0 drift, not ~2e6; (b) the DuckDB twin routes the group
    through the featurizer, so NULL doc_ids aren't dropped and
    duplicate doc_ids don't fan counts out — both engines agree."""
    from ocr_spark.functions.dsir import corpus_drift, corpus_drift_sql

    rows = [
        (None, "alpha beta gamma delta", None),
        (7, "alpha beta gamma delta", None),
        (7, "epsilon zeta eta theta", "s1"),  # duplicate doc_id
        (None, "iota kappa lambda mu", "s1"),  # NULL doc_id
    ]
    schema = "doc_id long, text string, source string"
    snap = spark.createDataFrame(rows, schema)
    out = {r.source: r for r in corpus_drift(snap, snap).collect()}
    assert set(out) == {None, "s1"}
    assert all(r.l1_scaled == 0 for r in out.values())

    con.execute("CREATE OR REPLACE VIEW hostile AS SELECT * FROM (VALUES "
                "(NULL, 'alpha beta gamma delta', NULL), "
                "(7, 'alpha beta gamma delta', NULL), "
                "(7, 'epsilon zeta eta theta', 's1'), "
                "(NULL, 'iota kappa lambda mu', 's1')"
                ") t(doc_id, text, source)")
    got = sorted(map(tuple, corpus_drift(snap, snap).collect()),
                 key=lambda t: (t[0] is None, t[0]))
    oracle = sorted(
        map(tuple, con.execute(corpus_drift_sql("hostile", "hostile")).fetchall()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert [tuple(map(int, r[1:])) for r in got] == [
        tuple(map(int, r[1:])) for r in oracle
    ]
    assert [r[0] for r in got] == [r[0] for r in oracle]


def test_drift_matches_duckdb_twin(docs, con):
    from ocr_spark.functions.dsir import corpus_drift, corpus_drift_sql

    a = docs.where("doc_id < 250")
    b = docs.where("doc_id >= 250")
    got = sorted(map(tuple, corpus_drift(a, b).collect()))
    oracle = sorted(
        map(
            tuple,
            con.execute(
                corpus_drift_sql(
                    "(SELECT * FROM documents WHERE doc_id < 250)",
                    "(SELECT * FROM documents WHERE doc_id >= 250)",
                )
            ).fetchall(),
        )
    )
    assert got == oracle and len(got) == 20
    # mixed split: every source present on both sides, drift strictly
    # between identical (0) and disjoint (~2e6)
    for (_, na, nb, l1) in got:
        assert na > 0 and nb > 0 and 0 < l1 < 2_000_000
