"""Bigram LM fluency scoring: exact-integer semantics, hand-checked
probabilities, cross-LM unseen handling, DuckDB twin equality."""

from __future__ import annotations

import duckdb
import pytest

from ocr_spark.functions.lm import (
    P_SCALE,
    bigram_lm_score,
    bigram_lm_score_sql,
    fluency_buckets,
    fluency_buckets_sql,
)
from ocr_spark.plans import plan_str as _plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_lm_score_hand_check(spark):
    # corpus: one doc "a b a b" -> bigrams ab, ba, ab
    # c(a,b)=2, c(b,a)=1; prefix counts c(a,*)=2, c(b,*)=1
    # score = (1e6*2)//2 + (1e6*1)//1 + (1e6*2)//2 = 3e6, n=3
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    row = bigram_lm_score(df).collect()[0]
    assert (row.n_bigrams, row.sum_scaled) == (3, 3 * P_SCALE)


def test_lm_rare_transition_scores_lower(spark):
    # shared prefix 'the': 'the cat' is the common transition, 'the
    # zzz' the rare one -> the common doc outscores the rare doc
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "the cat"), (3, "the zzz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.sum_scaled for r in bigram_lm_score(df).collect()}
    assert got[1] == got[2] == (P_SCALE * 2) // 3
    assert got[3] == P_SCALE // 3
    assert got[1] > got[3]


def test_lm_cross_scoring_unseen_bigrams_are_zero(spark):
    lm = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "totally novel words"), (11, "x y")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.sum_scaled)
        for r in bigram_lm_score(batch, lm_docs=lm).collect()
    }
    assert got[10] == (2, 0)  # LM never saw these transitions
    assert got[11] == (1, P_SCALE)  # c(x,y)=2 over c(x,*)=2 -> 1.0


def test_lm_short_and_empty_docs_emit_zero_rows(spark):
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, None), (4, "two words")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.sum_scaled)
        for r in bigram_lm_score(df).collect()
    }
    assert got[1] == (0, 0) and got[2] == (0, 0) and got[3] == (0, 0)
    assert got[4] == (1, P_SCALE)
    assert len(got) == 4  # every doc emitted, none dropped


def test_lm_matches_duckdb_twin(docs):
    got = sorted(map(tuple, bigram_lm_score(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(bigram_lm_score_sql()).fetchall()))
    assert got == want and len(got) == 500


def test_lm_partition_invariant(docs):
    a = sorted(map(tuple, bigram_lm_score(docs).collect()))
    b = sorted(map(tuple, bigram_lm_score(docs.repartition(13)).collect()))
    assert a == b


def test_lm_plan_no_nested_loop(docs):
    p = _plan(bigram_lm_score(docs), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# fluency_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


def test_fluency_buckets_order_and_exhaustiveness(spark):
    """Buckets respect mean_scaled (monotone), every doc gets exactly
    one bucket, and under CROSS-scoring (LM from a fluent corpus)
    gibberish full of unseen transitions sinks to the tail while
    in-distribution text rises. (Self-LM on a tiny corpus cannot
    punish unique transitions — a bigram seen once IS its prefix's
    only continuation — hence the explicit lm_docs here.)"""
    lm_rows = [
        (100 + i, "the cat sat on the mat and the dog sat on the rug")
        for i in range(4)
    ]
    rows = [
        (1, "the cat sat on the mat"),          # pure in-distribution
        (2, "the cat sat on zq xv pj wk"),      # half unseen
        (3, "zq xv pj wk rn mh bd"),            # all unseen -> 0
        (5, ""),                                # no bigrams -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm_df = spark.createDataFrame(lm_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in fluency_buckets(df, lm_docs=lm_df).collect()}
    assert set(out) == {1, 2, 3, 5}
    order = {"tail": 0, "middle": 1, "head": 2}
    pairs = sorted(out.values(), key=lambda r: r.mean_scaled)
    for lo, hi in zip(pairs, pairs[1:]):
        assert order[lo.bucket] <= order[hi.bucket]
    assert out[1].mean_scaled > out[2].mean_scaled > out[3].mean_scaled
    assert out[1].bucket == "head"
    assert out[3].bucket == "tail" and out[3].mean_scaled == 0
    assert out[5].bucket == "tail" and out[5].n_bigrams == 0


def test_fluency_buckets_matches_duckdb_twin(docs):
    got = sorted(map(tuple, fluency_buckets(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = sorted(
        map(tuple, con.execute(fluency_buckets_sql("documents")).fetchall())
    )
    assert got == oracle and len(got) == 500
    buckets = {b for (_, _, _, b) in got}
    assert buckets == {"head", "middle", "tail"}


def test_fluency_buckets_partition_invariant(docs):
    a = sorted(map(tuple, fluency_buckets(docs).collect()))
    b = sorted(map(tuple, fluency_buckets(docs.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------


def test_collocations_semantics(spark):
    """'new york' appears 4x as a pair; 'the the' is frequent but its
    unigrams are everywhere, so the collocation outranks it."""
    import pandas as pd

    from ocr_spark.functions.lm import collocations

    texts = ["the new york the times the", "new york the new york",
             "the new york the"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3), "text": texts}),
        schema="doc_id long, text string",
    )
    out = [(r.w1, r.w2) for r in collocations(df, k=3, min_count=2).collect()]
    assert out[0] == ("new", "york")
    got = {(r.w1, r.w2): (r.n_ab, r.n_a, r.n_b) for r in
           collocations(df, k=10, min_count=2).collect()}
    assert got[("new", "york")] == (4, 4, 4)


def test_collocations_min_count_floors_hapax(spark):
    from ocr_spark.functions.lm import collocations

    df = spark.createDataFrame(
        [(1, "rare pair once but common common common common")],
        "doc_id long, text string",
    )
    pairs = {(r.w1, r.w2) for r in collocations(df, k=10, min_count=2).collect()}
    assert ("rare", "pair") not in pairs
    assert ("common", "common") in pairs


def test_collocations_cross_engine(spark, docs):
    import duckdb

    from ocr_spark.functions.lm import collocations, collocations_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    got = [tuple(r) for r in collocations(docs, k=40, min_count=3).collect()]
    want = [
        tuple(r)
        for r in con.execute(collocations_sql("documents", 40, 3)).fetchall()
    ]
    assert got == want and len(got) == 40


def test_collocations_plan_topk_no_nested_loop(docs):
    from ocr_spark.functions.lm import collocations
    from ocr_spark.plans import plan_str

    p = plan_str(collocations(docs, k=10))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram scoring
# ---------------------------------------------------------------------------


def test_kn_score_hand_check(spark):
    # self-LM over "a b a b": c(a,b)=2, c(b,a)=1, c(a,*)=2, c(b,*)=1,
    # nf(a)=nf(b)=1, np(a)=np(b)=1, n_bi_types=2, D=3/4.
    # P_KN(b|a) = (2-.75)/2 + (.75*1/2)*(1/2) = 0.8125 -> 812500
    # P_KN(a|b) = (1-.75)/1 + (.75*1/1)*(1/2) = 0.625  -> 625000
    from ocr_spark.functions.lm import kn_bigram_score

    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    row = kn_bigram_score(df).collect()[0]
    assert (row.n_bigrams, row.sum_kn_scaled) == (3, 812500 * 2 + 625000)


def test_kn_unseen_bigram_with_seen_continuation_scores_positive(spark):
    """The KN signature: an unseen transition whose SECOND word is a
    known continuation gets continuation mass; gibberish second words
    and unseen prefixes get exactly 0."""
    from ocr_spark.functions.lm import kn_bigram_score

    lm_corpus = spark.createDataFrame(
        [(1, "x y x y")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "w y"), (11, "x q"), (12, "x x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.sum_kn_scaled)
        for r in kn_bigram_score(batch, lm_docs=lm_corpus).collect()
    }
    assert got[10] == (1, 0)  # unseen prefix 'w'
    assert got[11] == (1, 0)  # 'q' never continues anything
    # 'x x' unseen as a bigram, but 'x' is a known continuation:
    # term2 = ((3e6*1*1) div (4*2)) div 2 = 187500
    assert got[12] == (1, 187500)


def test_kn_self_lm_distribution_sums_to_one(spark):
    """Over a closed vocabulary, sum_w2 P_KN(w2|w1) == 1 exactly (up
    to fixed-point floor loss < n_continuations ulps) — the property
    that distinguishes real KN from an ad-hoc backoff."""
    from ocr_spark.functions.lm import kn_bigram_score

    # LM: every transition among {a,b,c} observed with varied counts
    text = "a b a c a b b c b a c a c b c c a a"
    lm_corpus = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # probe doc enumerating all 3 transitions out of prefix 'a'
    probe = spark.createDataFrame(
        [(10, "a a"), (11, "a b"), (12, "a c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.sum_kn_scaled
        for r in kn_bigram_score(probe, lm_docs=lm_corpus).collect()
    }
    total = sum(got.values())
    # floor loss: each of the 3 terms drops < 2 units (two chained divs)
    assert 1_000_000 - 6 <= total <= 1_000_000


def test_kn_matches_duckdb_twin(docs):
    from ocr_spark.functions.lm import kn_bigram_score, kn_bigram_score_sql

    got = sorted(map(tuple, kn_bigram_score(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(kn_bigram_score_sql()).fetchall()))
    assert got == want


def test_kn_plan_no_nested_loop(docs):
    from ocr_spark.functions.lm import kn_bigram_score

    p = _plan(kn_bigram_score(docs), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p or p.count(
        "BroadcastNestedLoopJoin"
    ) == 1  # the single-row n_bi_types broadcast only
