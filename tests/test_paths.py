"""Session path mining: step order under tied timestamps, gap
boundary, truncation, top-k tie-break, DuckDB twin parity."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.paths import (
    session_paths,
    session_paths_sql,
    transition_profile,
    transition_profile_sql,
)

_BASE = dt.datetime(2024, 3, 1)
_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    """rows: (event_id, seconds_offset, user_id, event_type)."""
    return spark.createDataFrame(
        [
            (i, _BASE + dt.timedelta(seconds=s), u, t)
            for i, s, u, t in rows
        ],
        schema=_SCHEMA,
    )


def _paths(spark, rows, **kw):
    out = session_paths(_ev(spark, rows), **kw)
    return [(r.path, r.n_sessions, r.n_users) for r in out.collect()]


def test_steps_ordered_by_ts_then_event_id(spark):
    # two events share a timestamp: event_id breaks the tie
    rows = [
        (2, 0, 1, "b"),
        (1, 0, 1, "a"),
        (3, 5, 1, "c"),
    ]
    assert _paths(spark, rows, gap_s=60) == [("a>b>c", 1, 1)]


def test_null_event_id_orders_first_in_both_engines(spark, tmp_path):
    """A NULL event_id tied on ts sorts as -1 — BEFORE any real id —
    in both engines (Spark ASC is NULLS FIRST, DuckDB's is NULLS
    LAST; the coalesce sentinel closes the divergence)."""
    pdf = pd.DataFrame(
        [
            (5, _BASE, 1, "b"),
            (None, _BASE, 1, "a"),  # NULL id, same ts
            (7, _BASE + dt.timedelta(seconds=3), 1, "c"),
        ],
        columns=["event_id", "ts", "user_id", "event_type"],
    ).astype({"ts": "datetime64[us]", "event_id": "Int64"})
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    df = spark.read.parquet(path)

    out = session_paths(df, gap_s=60)
    assert [(r.path, r.n_sessions) for r in out.collect()] == [("a>b>c", 1)]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(session_paths_sql(gap_s=60)).fetchdf()
    assert list(odf["path"]) == ["a>b>c"]


def test_gap_boundary_inclusive(spark):
    # exactly gap_s later still joins; one second later splits
    rows = [
        (0, 0, 1, "a"),
        (1, 60, 1, "b"),     # exactly +gap: same session
        (2, 121, 1, "c"),    # +61 s after b: new session
    ]
    assert sorted(_paths(spark, rows, gap_s=60)) == [
        ("a>b", 1, 1),
        ("c", 1, 1),
    ]


def test_truncation_marker(spark):
    rows = [(i, i, 1, f"e{i}") for i in range(5)]
    [(path, n, u)] = _paths(spark, rows, gap_s=60, max_steps=3)
    assert path == "e0>e1>e2>…" and n == 1 and u == 1


def test_topk_tiebreak_is_path_ascending(spark):
    # three singleton paths, k=2: counts tie at 1, path ASC decides
    rows = [(0, 0, 1, "c"), (1, 9000, 1, "a"), (2, 18000, 1, "b")]
    got = _paths(spark, rows, gap_s=60, k=2)
    assert got == [("a", 1, 1), ("b", 1, 1)]


def test_n_users_counts_distinct(spark):
    rows = [
        (0, 0, 1, "a"),
        (1, 9000, 1, "a"),  # same user, second session
        (2, 0, 2, "a"),
    ]
    assert _paths(spark, rows, gap_s=60) == [("a", 3, 2)]


def test_parameter_validation():
    with pytest.raises(ValueError):
        session_paths_sql(gap_s=0)
    with pytest.raises(ValueError):
        session_paths_sql(k=0)
    with pytest.raises(ValueError):
        session_paths_sql(max_steps=0)


def test_plan_shape(spark):
    """Two Exchanges only (user_id for sessionization — the
    (user, session) aggregate reuses it via subset-clustered
    distribution — and path for the final count), with the top-k as
    TakeOrderedAndProject, never a global sort."""
    from ocr_spark.plans import plan_str

    df = _ev(spark, [(0, 0, 1, "a")])
    p = plan_str(session_paths(df), "simple")
    assert p.count("Exchange") == 2, p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_matches_duckdb_twin(spark, tmp_path):
    """Parity on a corpus with tied timestamps, exact-gap boundaries,
    truncation-length sessions, and NULL ts/user/type rows."""
    rows = []
    eid = 0
    for u in range(8):
        t = _BASE + dt.timedelta(minutes=u)
        for i in range(30):
            rows.append((eid, t, u, ["view", "click", "buy"][i % 3]))
            eid += 1
            # tiny step / exactly-gap / over-gap rotation
            t += dt.timedelta(seconds=[1, 1800, 1801][i % 3])
    # tied (ts, user): event_id disambiguates
    rows.append((eid, _BASE, 0, "dup"))
    eid += 1
    # one long dense session (> max_steps): exercises truncation
    for i in range(10):
        rows.append(
            (eid, _BASE + dt.timedelta(seconds=i), 99, ["x", "y"][i % 2])
        )
        eid += 1
    # hostile NULLs
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    ).astype({"ts": "datetime64[us]"})
    nulls = pd.DataFrame(
        [
            (eid, pd.NaT, 1, "view"),
            (eid + 1, _BASE, None, "view"),
            (eid + 2, _BASE, 1, None),
        ],
        columns=pdf.columns,
    ).astype({"ts": "datetime64[us]"})
    pdf = pd.concat([pdf, nulls], ignore_index=True)
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    sdf = session_paths(
        spark.read.parquet(path), gap_s=1800, k=50, max_steps=5
    )
    cols = sorted(sdf.columns)
    got = sorted(tuple(r) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(
        session_paths_sql(gap_s=1800, k=50, max_steps=5)
    ).fetchdf()
    want = sorted(tuple(r) for r in odf[cols].itertuples(index=False))
    assert got == want
    assert any("…" in p for p, _, _ in [(r[cols.index("path")], 0, 0) for r in got])


def test_transitions_stay_within_sessions(spark):
    # a>b inside one session; the cross-gap b->c pair must NOT count
    rows = [
        (0, 0, 1, "a"),
        (1, 5, 1, "b"),
        (2, 9000, 1, "c"),
        (3, 9005, 1, "a"),
    ]
    out = transition_profile(_ev(spark, rows), gap_s=60)
    got = {(r.from_type, r.to_type): (r.n_transitions, r.p_ppm) for r in out.collect()}
    assert got == {("a", "b"): (1, 1_000_000), ("c", "a"): (1, 1_000_000)}


def test_transition_ppm_is_conditional_on_from_type(spark):
    # from 'a': 2x ->b, 1x ->c  => 666666 / 333333 ppm (floored)
    rows = [
        (0, 0, 1, "a"), (1, 1, 1, "b"),
        (2, 2, 1, "a"), (3, 3, 1, "b"),
        (4, 4, 1, "a"), (5, 5, 1, "c"),
    ]
    out = transition_profile(_ev(spark, rows), gap_s=60)
    got = {(r.from_type, r.to_type): r.p_ppm for r in out.collect()}
    assert got[("a", "b")] == 666_666
    assert got[("a", "c")] == 333_333


def test_transition_matches_duckdb_twin(spark, tmp_path):
    rows = []
    eid = 0
    for u in range(6):
        t = _BASE + dt.timedelta(minutes=u)
        for i in range(25):
            rows.append((eid, t, u, ["view", "click", "buy", "view"][i % 4]))
            eid += 1
            t += dt.timedelta(seconds=[1, 1800, 1801][i % 3])
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    ).astype({"ts": "datetime64[us]"})
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    sdf = transition_profile(spark.read.parquet(path), gap_s=1800)
    cols = sorted(sdf.columns)
    got = sorted(tuple(r) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(transition_profile_sql(gap_s=1800)).fetchdf()
    want = sorted(tuple(r) for r in odf[cols].itertuples(index=False))
    assert got == want
    assert len(got) > 3


def test_transition_shares_session_skeleton_with_paths(spark):
    """Conservation: total transitions == sum over sessions of
    (len(session) - 1). Computed against session_paths' own output
    (uncapped steps), so the two operators are pinned to ONE
    sessionization."""
    # per-user deltas: 40 s inside a session, +600 s every 7th step
    # (session break) — sessions of ~7 events across 3 users
    rows = [
        (i, (i // 3) * 40 + 600 * ((i // 3) // 7), 1 + i % 3,
         ["a", "b", "c"][i % 3])
        for i in range(60)
    ]
    ev = _ev(spark, rows)
    n_trans = (
        transition_profile(ev, gap_s=60)
        .groupBy()
        .sum("n_transitions")
        .collect()[0][0]
    ) or 0
    assert n_trans > 0  # the corpus must actually produce transitions
    paths = session_paths(ev, gap_s=60, k=1000, max_steps=10_000).collect()
    expect = sum((p.path.count(">") ) * p.n_sessions for p in paths)
    assert n_trans == expect
