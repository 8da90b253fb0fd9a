"""TF-IDF top terms: semantics, determinism, log-variant ranking,
plan shape, cross-engine twin."""

from __future__ import annotations

import math

import duckdb
import pytest

from ocr_spark.functions.tfidf import tfidf_top_terms, tfidf_top_terms_sql
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
