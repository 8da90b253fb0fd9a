"""TF-IDF top terms: semantics, determinism, log-variant ranking,
plan shape, cross-engine twin."""

from __future__ import annotations

import math

import duckdb
import pytest

from ocr_spark.functions.tfidf import (
    bm25_topk,
    bm25_topk_sql,
    tfidf_top_terms,
    tfidf_top_terms_sql,
)
from ocr_spark.plans import plan_str as _plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana banana banana date"),
        (3, "apple date date cherry cherry cherry"),
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tf_df_and_weighting(tiny):
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.score)
        for r in tfidf_top_terms(tiny, k=10).collect()
    }
    # N=4 (doc 4's NULL text excluded; doc 5's '' counted, yields no
    # terms); 'banana' in docs 1,2 → df=2, tf=3 in doc 2
    tf, df, score = out[(2, "banana")]
    assert (tf, df) == (3, 2)
    assert score == pytest.approx(3 * (4 + 1.0) / (2 + 1.0), abs=1e-6)
    # rare 'date' (df=2) outranks nothing here, but higher tf wins:
    # doc 1 = apple tf=2 > banana/cherry tf=1
    r1 = {r.term: r.rank for r in tfidf_top_terms(tiny, k=10).collect()
          if r.doc_id == 1}
    assert r1["apple"] == 1
    # (tf=1, df=2) tie between banana/cherry: term-ascending break
    assert r1["banana"] == 2 and r1["cherry"] == 3
    # docs with NULL/empty text produce no rows
    assert not any(d in (4, 5) for d, _ in out)


def test_topk_and_deterministic_ties(docs):
    out = tfidf_top_terms(docs, k=3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    for rows in per_doc.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(ranks) + 1)) and len(rows) <= 3
        # ranking follows (score desc, term asc)
        ordered = sorted(rows, key=lambda r: r.rank)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.score > b.score) or (a.score == b.score and a.term < b.term)


def test_log_variant_scores(tiny):
    """idf='log' scores are ln(rational weight) within float tolerance
    and stay off the contract path by design."""
    rat = {(r.doc_id, r.term): r for r in tfidf_top_terms(tiny, k=10).collect()}
    log = {(r.doc_id, r.term): r for r in
           tfidf_top_terms(tiny, k=10, idf="log").collect()}
    assert set(rat) == set(log)
    for key, r in rat.items():
        expected = r.tf * math.log((4 + 1.0) / (r.df + 1.0))
        assert log[key].score == pytest.approx(expected, abs=1e-5)
    with pytest.raises(ValueError):
        tfidf_top_terms(tiny, idf="bogus")


def test_plan_shape(docs):
    """One corpus scan (df comes from a window over the tf table, not
    a join back to a re-exploded corpus), map-side partial tf agg,
    and the only broadcast/nested-loop is the 1-row N."""
    plan = _plan(tfidf_top_terms(docs), "simple")
    # exactly 2 parquet scans: the term pipeline + the 1-row N agg
    assert plan.count("Scan parquet") == 2
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row N only
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_matches_duckdb_twin(docs):
    got = sorted(map(tuple, tfidf_top_terms(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(tfidf_top_terms_sql()).fetchall()))
    assert got == oracle and len(got) > 0


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------


def test_bm25_semantics_tiny(tiny):
    """Hand-checkable ranking: for the single-term query 'banana',
    doc 2 (tf=3, short) must out-rank doc 1 (tf=1); docs without the
    term never appear; n_hits counts matched query terms."""
    out = {r.doc_id: r for r in bm25_topk(tiny, ["banana"], k=10).collect()}
    assert set(out) == {1, 2}
    assert out[2].score_scaled > out[1].score_scaled
    assert out[1].n_hits == 1 and out[2].n_hits == 1


def test_bm25_length_normalization(spark):
    """Equal tf, different dl: BM25's b-term must prefer the shorter
    document (same count is stronger evidence in less text)."""
    rows = [
        (1, "needle " + "filler " * 3),
        (2, "needle " + "filler " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score_scaled for r in bm25_topk(df, ["needle"], 5).collect()}
    assert out[1] > out[2]


def test_bm25_query_validation(tiny):
    with pytest.raises(ValueError):
        bm25_topk(tiny, [])
    with pytest.raises(ValueError):
        bm25_topk(tiny, ["two words"])
    with pytest.raises(ValueError):
        bm25_topk(tiny, ["a"])  # below min_term_len


def test_bm25_matches_duckdb_twin(docs):
    q = ["scan", "join", "customer"]
    got = sorted(map(tuple, bm25_topk(docs, q, k=25).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = sorted(
        map(tuple, con.execute(bm25_topk_sql("documents", q, k=25)).fetchall())
    )
    assert got == oracle and len(got) == 25


def test_bm25_plan_shape(docs):
    """Posting list cut to query terms before the shuffle (isin filter
    below the tf aggregate); global top-k is TakeOrdered, not a full
    sort; no nested-loop join beyond the 1-row totals broadcast."""
    plan = _plan(bm25_topk(docs, ["scan", "join"], k=10), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row totals
    assert "partial_count" in plan


def test_bm25_twin_validates_like_engine():
    """The SQL generator shares the engine's query validation (review
    fix): empty or unmatchable terms raise instead of emitting broken
    SQL, and accepted terms are alnum-only so literals need no
    escaping."""
    with pytest.raises(ValueError):
        bm25_topk_sql("documents", [])
    with pytest.raises(ValueError):
        bm25_topk_sql("documents", ["o'brien"])
    with pytest.raises(ValueError):
        bm25_topk_sql("documents", ["a"])


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def phrase_tiny(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick brown shoes, and a quick brown fox too"),
        (3, "brown quick fox — right words, wrong order"),
        (4, "quick... brown!! fox?? punctuation does not break tokens"),
        (5, "fox fox fox fox"),
        (6, None),
        (7, "Quick Brown FOX is case-insensitive"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_semantics(phrase_tiny):
    from ocr_spark.functions.tfidf import phrase_search

    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(
            phrase_tiny, ["quick", "brown", "fox"]
        ).collect()
    }
    # doc 1 matches once at token 2; doc 3 has the words out of order
    # (no row); punctuation is stripped by the tokenizer (doc 4);
    # matching is case-insensitive (doc 7)
    assert out == {1: (1, 2), 2: (1, 6), 4: (1, 1), 7: (1, 1)}


def test_phrase_search_duplicate_terms_and_overlaps(phrase_tiny):
    from ocr_spark.functions.tfidf import phrase_search

    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(phrase_tiny, ["fox", "fox"]).collect()
    }
    # "fox fox fox fox" has 3 OVERLAPPING starts: 1, 2, 3
    assert out == {5: (3, 1)}


def test_phrase_search_single_term(phrase_tiny):
    from ocr_spark.functions.tfidf import phrase_search

    out = {
        r.doc_id: r.n_matches
        for r in phrase_search(phrase_tiny, ["fox"]).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 4, 7: 1}


def test_phrase_search_validation(phrase_tiny):
    from ocr_spark.functions.tfidf import phrase_search

    with pytest.raises(ValueError):
        phrase_search(phrase_tiny, [])
    with pytest.raises(ValueError):
        phrase_search(phrase_tiny, ["two words"])
    with pytest.raises(ValueError):
        phrase_search(phrase_tiny, ["bad-term"])


def test_phrase_search_cross_engine(phrase_tiny, docs):
    from ocr_spark.functions.tfidf import phrase_search, phrase_search_sql

    con = duckdb.connect()
    con.register("pt_pdf", phrase_tiny.toPandas())
    con.execute("CREATE VIEW pt AS SELECT * FROM pt_pdf")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    for tbl, df, ph in [
        ("pt", phrase_tiny, ["quick", "brown", "fox"]),
        ("pt", phrase_tiny, ["fox", "fox"]),
        ("documents", docs, ["fast", "table"]),
        ("documents", docs, ["table"]),
    ]:
        got = sorted(map(tuple, phrase_search(df, ph).collect()))
        want = sorted(
            map(tuple, con.execute(phrase_search_sql(tbl, ph)).fetchall())
        )
        assert got == want, ph
    assert len(phrase_search(docs, ["fast", "table"]).collect()) > 0


def test_phrase_search_plan_filters_before_shuffle(docs):
    """The isin() cut must sit below the first Exchange — postings
    for non-phrase terms never shuffle."""
    from ocr_spark.functions.tfidf import phrase_search

    p = _plan(phrase_search(docs, ["fast", "table"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # the term filter appears in the plan (scan-stage projection side)
    assert "fast" in p and "table" in p
