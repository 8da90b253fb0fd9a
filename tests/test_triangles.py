"""Triangle counting: crafted graphs, an independent brute-force
oracle, DuckDB twin parity, plan shape."""

from __future__ import annotations

from itertools import combinations

import duckdb
import pandas as pd

from ocr_spark.functions.graph import triangle_counts, triangle_counts_sql
from ocr_spark.plans import plan_str

_SCHEMA = "src long, dst long"


def _counts(spark, edges):
    df = spark.createDataFrame(edges, schema=_SCHEMA)
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def _brute(edges):
    und = {tuple(sorted((a, b))) for a, b in edges if a != b}
    nodes = {v for e in und for v in e}
    out = {}
    for x, y, z in combinations(sorted(nodes), 3):
        if (
            (x, y) in und and (x, z) in und and (y, z) in und
        ):
            for v in (x, y, z):
                out[v] = out.get(v, 0) + 1
    return out


def test_single_triangle(spark):
    assert _counts(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}


def test_square_has_no_triangles(spark):
    assert _counts(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_k4_counts(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    # K4 has 4 triangles; each node sits in C(3,2) = 3 of them
    assert _counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_direction_multiplicity_selfloops_collapse(spark):
    edges = [
        (1, 2), (2, 1), (1, 2),  # same undirected edge three times
        (2, 3), (3, 1),
        (1, 1),  # self-loop dropped
    ]
    assert _counts(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_matches_brute_force_and_duckdb(spark, tmp_path):
    """Pseudo-random graph (hash-selected third of K15, plus dup and
    reversed edges): engine == independent python brute force ==
    DuckDB twin."""
    edges = [
        (a, b)
        for a, b in combinations(range(15), 2)
        if (a * 31 + b * 17) % 3 == 0
    ]
    edges += [(b, a) for a, b in edges[:10]] + edges[:5]  # dups/reversals
    want = _brute(edges)
    got = _counts(spark, edges)
    assert got == want and sum(want.values()) % 3 == 0 and want

    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    path = str(tmp_path / "edges.parquet")
    pdf.to_parquet(path)
    con = duckdb.connect()
    odf = con.execute(
        triangle_counts_sql(f"SELECT * FROM '{path}'")
    ).fetchdf()
    assert {int(r.node): int(r.n_triangles) for r in odf.itertuples()} == want


def test_plan_no_nested_loop(spark):
    df = spark.createDataFrame([(1, 2)], schema=_SCHEMA)
    p = plan_str(triangle_counts(df), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# clustering coefficients
# ---------------------------------------------------------------------------

from ocr_spark.functions.graph import (  # noqa: E402
    clustering_coefficients,
    clustering_coefficients_sql,
)


def _coeffs(spark, edges):
    df = spark.createDataFrame(edges, schema=_SCHEMA)
    return {
        r.node: (r.degree, r.n_triangles, r.coeff_ppm)
        for r in clustering_coefficients(df).collect()
    }


def test_k4_coefficient_is_one(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert _coeffs(spark, k4) == {v: (3, 3, 1_000_000) for v in range(4)}


def test_star_and_path_have_zero_coefficient_but_rows(spark):
    # star center degree 3, no triangles; leaves degree 1 -> coeff 0
    star = [(0, 1), (0, 2), (0, 3)]
    got = _coeffs(spark, star)
    assert got == {0: (3, 0, 0), 1: (1, 0, 0), 2: (1, 0, 0), 3: (1, 0, 0)}


def test_half_closed_wedge(spark):
    # node 0 neighbors {1,2,3}; only (1,2) closed: C(0) = 1/3
    edges = [(0, 1), (0, 2), (0, 3), (1, 2)]
    got = _coeffs(spark, edges)
    assert got[0] == (3, 1, 333_333)
    assert got[1] == (2, 1, 1_000_000)
    assert got[3] == (1, 0, 0)


def test_coeffs_match_duckdb(spark, tmp_path):
    edges = [
        (a, b)
        for a, b in combinations(range(12), 2)
        if (a * 31 + b * 17) % 3 == 0
    ]
    got = _coeffs(spark, edges)
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    path = str(tmp_path / "edges.parquet")
    pdf.to_parquet(path)
    con = duckdb.connect()
    odf = con.execute(
        clustering_coefficients_sql(f"SELECT * FROM '{path}'")
    ).fetchdf()
    want = {
        int(r.node): (int(r.degree), int(r.n_triangles), int(r.coeff_ppm))
        for r in odf.itertuples()
    }
    assert got == want
    assert any(c for _, _, c in got.values())  # non-vacuous
