"""Driver-contract conformance: every queries() entry matches its
oracle_sql() twin exactly (rows, column names, values) — the same
check the grading driver runs, here at sf0.001 for speed."""

from __future__ import annotations

import importlib.util
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


ENTRY = _load_entry()
QUERIES = ENTRY.queries()
ORACLES = ENTRY.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_oracle_coverage():
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracle: {missing}"
    stale = set(ORACLES) - set(QUERIES)
    assert not stale, f"oracles without query: {stale}"


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "kind", "text", "media_ref", "offset"]


def _canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (2, "nan")
        return (1, repr(v))
    return (1, repr(v))


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    got = sdf.select(*spark_cols).collect()
    oracle = con.execute(ORACLES[name]).df()
    assert sorted(oracle.columns) == spark_cols, (
        f"{name}: columns {sorted(oracle.columns)} != {spark_cols}"
    )
    want_rows = [
        tuple(r) for r in oracle[spark_cols].itertuples(index=False, name=None)
    ]
    got_rows = [tuple(r) for r in got]
    assert len(got_rows) == len(want_rows), f"{name}: row count"
    gs = sorted([tuple(_canon(v) for v in r) for r in got_rows])
    ws = sorted([tuple(_canon(v) for v in r) for r in want_rows])
    for i, (g, w) in enumerate(zip(gs, ws)):
        assert g == w, f"{name}: row {i}: {g} != {w}"
