"""SCD2 history construction: run collapsing, missing-snapshot and
NULL-attr semantics, duplicate resolution, DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.scd import scd2_history, scd2_history_sql
from ocr_spark.plans import plan_str

_SCHEMA = "user_id long, snap_day long, status string"


def _hist(spark, rows, attrs=("status",)):
    df = spark.createDataFrame(rows, schema=_SCHEMA)
    out = scd2_history(df, key="user_id", snap="snap_day", attrs=attrs)
    # sort on (key, valid_from): unique per output row and never NULL
    # (tuples with None don't sort)
    return sorted(
        (
            (r.user_id, r.status, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )


def test_runs_collapse_and_interval_bounds(spark):
    rows = [
        (1, 1, "new"),
        (1, 2, "new"),
        (1, 3, "active"),
        (1, 4, "active"),
        (1, 5, "churned"),
    ]
    assert _hist(spark, rows) == [
        (1, "new", 1, 3, False),
        (1, "active", 3, 5, False),
        (1, "churned", 5, None, True),
    ]


def test_missing_snapshots_extend_the_run(spark):
    # key absent at days 2-4: "not observed" — the day-1 state runs
    # until the next OBSERVED change at day 5
    rows = [(1, 1, "new"), (1, 5, "active")]
    assert _hist(spark, rows) == [
        (1, "new", 1, 5, False),
        (1, "active", 5, None, True),
    ]


def test_reverting_state_opens_a_new_run(spark):
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "a")]
    got = _hist(spark, rows)
    assert got == [
        (1, "a", 1, 2, False),
        (1, "b", 2, 3, False),
        (1, "a", 3, None, True),
    ]


def test_null_attr_is_a_real_state(spark):
    # NULL status differs from '' and from 'x'; the chr(0) sentinel
    # keeps NULL distinct and a NULL->value transition is a change
    rows = [(1, 1, None), (1, 2, ""), (1, 3, None)]
    got = _hist(spark, rows)
    assert [(g[1], g[2]) for g in got] == [(None, 1), ("", 2), (None, 3)]


def test_duplicate_key_snap_resolves_deterministically(spark):
    # two observations at the same (key, snap): max attr value wins
    rows = [(1, 1, "b"), (1, 1, "a"), (1, 2, "b")]
    assert _hist(spark, rows) == [(1, "b", 1, None, True)]


def test_empty_attrs_rejected():
    with pytest.raises(ValueError):
        scd2_history_sql(attrs=())


def test_plan_has_one_exchange(spark):
    """The whole pipeline (dup-resolution + change flag + lead) runs
    under ONE hash shuffle on the key — the dedup is a lag filter
    inside the key partitioning, never a (key, snap) row_number."""
    df = spark.createDataFrame([(1, 1, "a")], schema=_SCHEMA)
    p = plan_str(scd2_history(df, snap="snap_day"), "simple")
    assert p.count("Exchange") == 1, p


def test_matches_duckdb_twin(spark, tmp_path):
    """Parity on a multi-key corpus with NULL keys/snaps (excluded),
    NULL attrs, duplicates, gaps, and multi-attr state."""
    rows = []
    for u in range(6):
        for d in range(1, 15):
            if (u + d) % 4 == 0:
                continue  # missing snapshots
            status = ["new", "active", "active", "churned"][(u + d // 3) % 4]
            tier = None if (u + d) % 5 == 0 else f"t{(u + d) % 3}"
            rows.append((u, d, status, tier))
    rows += [(None, 1, "x", "t"), (2, None, "x", "t")]  # excluded
    rows += [(3, 3, "zzz", "dup")]  # duplicate (key, snap)
    pdf = pd.DataFrame(rows, columns=["user_id", "snap_day", "status", "tier"])
    path = str(tmp_path / "obs.parquet")
    pdf.to_parquet(path)

    def canon(rows_iter):
        # None-safe deterministic sort (tuples with None don't sort);
        # integral floats -> int so DuckDB's NaN-able numeric columns
        # (valid_to comes back float64) compare AND sort like Spark's
        # longs
        def val(v):
            if pd.isna(v):
                return None
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float) and v.is_integer():
                v = int(v)
            return v

        items = [tuple(val(v) for v in r) for r in rows_iter]
        return sorted(
            items, key=lambda t: tuple((v is None, repr(v)) for v in t)
        )

    sdf = scd2_history(
        spark.read.parquet(path),
        key="user_id",
        snap="snap_day",
        attrs=("status", "tier"),
    )
    cols = sorted(sdf.columns)
    got = canon(sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW obs AS SELECT * FROM '{path}'")
    odf = con.execute(
        scd2_history_sql(
            table="obs", key="user_id", snap="snap_day", attrs=("status", "tier")
        )
    ).fetchdf()
    want = canon(odf[cols].itertuples(index=False))
    assert got == want
    assert len(got) > 20  # non-vacuous
