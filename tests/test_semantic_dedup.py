"""SemDeDup-style semantic pruning: independent pure-Python oracle
(same sequential fold order as both engines), full-row accounting,
DuckDB-twin parity, and the trained-path plan shape (no assignment
join, no nested-loop pair join)."""

from __future__ import annotations

import duckdb

from ocr_spark.functions.ivf_centroids import TRAINED_CENTROIDS_SF001 as CENTS
from ocr_spark.functions.similarity import semantic_dedup, semantic_dedup_sql
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"
# the synthetic embedding corpus is near-orthogonal (max pairwise
# cosine ~0.48 at sf0.001) — 0.35 is the tau that exercises both
# outcomes, matching the embedding_near_dups contract knob
TAU = 0.35


def _fold_dot(a, b):
    # sequential left fold, the exact order _dot_expr/_dot_sql use
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


def _python_oracle(rows):
    """brute-force SemDeDup over (vec_id, embedding) rows."""
    import math

    out = {}
    assigned = {}
    for vid, emb in rows:
        nrm = math.sqrt(_fold_dot(emb, emb))
        unit = [float(x) / nrm for x in emb]
        dots = [_fold_dot(unit, c) for c in CENTS]
        assigned[vid] = (dots.index(max(dots)), emb, nrm)
    for vid, (cell, emb, nrm) in assigned.items():
        dup = False
        for vid2, (cell2, emb2, nrm2) in assigned.items():
            if vid2 < vid and cell2 == cell:
                if _fold_dot(emb, emb2) / (nrm * nrm2) >= TAU:
                    dup = True
                    break
        out[vid] = (cell, not dup)
    return out


def test_matches_python_oracle_and_row_accounting(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        r.vec_id: (r.centroid, r.kept)
        for r in semantic_dedup(emb, CENTS, tau=TAU).collect()
    }
    rows = [
        (int(r.vec_id), list(r.embedding))
        for r in emb.select("vec_id", "embedding").collect()
    ]
    assert got == _python_oracle(rows)
    # every input vector accounted for exactly once, never dropped
    assert len(got) == len(rows)
    # the corpus genuinely exercises both outcomes
    kept = [k for k, (_, keep) in got.items() if keep]
    assert 0 < len(kept) < len(got)


def test_matches_duckdb_twin(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(map(tuple, semantic_dedup(emb, CENTS, tau=TAU).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.execute(semantic_dedup_sql(CENTS, tau=TAU)).fetchall()))
    assert got == want


def test_trained_plan_shape(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = plan_str(semantic_dedup(emb, CENTS, tau=TAU), "simple")
    # assignment is a scan-stage argmax; the only joins are the
    # within-cell equi pair join and the kept-flag left join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Join") <= 2, plan
