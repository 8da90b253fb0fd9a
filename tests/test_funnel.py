"""Conversion funnel: ordered-step semantics, strict-tie and window
rules, plan shape (one sort, no self-join), cross-engine twin."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from ocr_spark.functions.funnel import funnel_counts, funnel_counts_sql
from ocr_spark.plans import plan_str as _plan

SF_DIR = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 3, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + dt.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _counts(df, **kw):
    return {r.step_name: r.n_users for r in funnel_counts(df, **kw).collect()}


def test_order_matters(spark):
    rows = [
        # u1 converts in order
        (1, "signup", 0), (1, "click", 1), (1, "purchase", 2),
        # u2 has all three but purchase precedes click → stops at click
        (2, "signup", 0), (2, "purchase", 1), (2, "click", 2),
        # u3 clicks before signing up and never again → stops at signup
        (3, "click", 0), (3, "signup", 1),
        # u4 never signs up → counted nowhere
        (4, "click", 0), (4, "purchase", 1),
    ]
    c = _counts(_ev(spark, rows))
    assert c == {"signup": 3, "click": 2, "purchase": 1}


def test_simultaneous_events_do_not_chain(spark):
    # click at the exact signup instant is not "after" it
    rows = [(1, "signup", 0), (1, "click", 0), (1, "purchase", 1)]
    c = _counts(_ev(spark, rows))
    assert c == {"signup": 1, "click": 0, "purchase": 0}
    # ...but one microsecond later is
    df = _ev(spark, [(1, "signup", 0), (1, "purchase", 1)])
    later = _ev(spark, [(1, "click", 0)]).selectExpr(
        "user_id", "event_type", "ts + INTERVAL 1 MICROSECOND AS ts"
    )
    c2 = _counts(df.unionByName(later))
    assert c2 == {"signup": 1, "click": 1, "purchase": 1}


def test_window_cutoff(spark):
    rows = [
        (1, "signup", 0), (1, "click", 24), (1, "purchase", 24 * 8),  # late
        (2, "signup", 0), (2, "click", 24), (2, "purchase", 24 * 6),  # in time
    ]
    c = _counts(_ev(spark, rows), within_days=7)
    assert c == {"signup": 2, "click": 2, "purchase": 1}


def test_greedy_earliest_is_optimal(spark):
    """A later signup would put the purchase in-window, but the chain
    through the EARLIEST signup already completes each step as early
    as possible — re-chaining from the later signup cannot help a
    user who already converted, and the early click still counts."""
    rows = [
        (1, "signup", 0), (1, "click", 1),
        (1, "signup", 24 * 6), (1, "purchase", 24 * 6 + 1),
    ]
    c = _counts(_ev(spark, rows), within_days=7)
    # purchase at h145 <= t1(h0) + 7 days → converted
    assert c == {"signup": 1, "click": 1, "purchase": 1}


def test_funnel_is_monotone_on_real_log(events):
    rows = sorted(funnel_counts(events).collect(), key=lambda r: r.step)
    assert all(a.n_users >= b.n_users for a, b in zip(rows, rows[1:]))
    assert rows[0].n_users > 0


def test_plan_one_sort_no_join(events):
    plan = _plan(funnel_counts(events), "simple")
    assert "Join" not in plan and "CartesianProduct" not in plan
    # all k window passes share one user-partitioned exchange+sort;
    # remaining exchanges are the per-user agg + the 1-row final agg
    assert plan.count("Sort") == 1
    assert plan.count("Window") == 3


def test_matches_duckdb_twin(events):
    got = sorted(map(tuple, funnel_counts(events).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = sorted(map(tuple, con.execute(funnel_counts_sql()).fetchall()))
    assert got == want


def test_validates_steps(events):
    with pytest.raises(ValueError):
        funnel_counts(events, steps=("signup",))


def test_retention_semantics(spark):
    from ocr_spark.functions.funnel import retention_cohorts

    # u1 first event Wed Mar 6 → cohort Mon Mar 4; active weeks 0 and 2
    # u2 first event Mon Mar 4 → same cohort; active week 0 only
    # u3 first event Mar 12 → cohort Mon Mar 11; active week 0
    rows = [
        (1, dt.datetime(2024, 3, 6)), (1, dt.datetime(2024, 3, 19)),
        (2, dt.datetime(2024, 3, 4)),
        (3, dt.datetime(2024, 3, 12)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert out == {
        ("2024-03-04", 0): 2,
        ("2024-03-04", 2): 1,
        ("2024-03-11", 0): 1,
    }


def test_retention_matches_duckdb_twin(events):
    from ocr_spark.functions.funnel import retention_cohorts, retention_cohorts_sql

    got = sorted(map(tuple, retention_cohorts(events).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = sorted(map(tuple, con.execute(retention_cohorts_sql()).fetchall()))
    assert got == want and len(got) >= 4


def test_retention_no_join_single_distinct_agg(events):
    from ocr_spark.functions.funnel import retention_cohorts

    plan = _plan(retention_cohorts(events), "simple")
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_funnel_and_retention_accept_string_user_ids(spark):
    # the operator layer is id-type-agnostic: 'uuid:...' user ids must
    # flow through, not silently NULL-cast to an empty funnel
    from ocr_spark.functions.funnel import funnel_counts, retention_cohorts

    rows = [
        ("uuid:a", "signup", "2024-01-01 10:00:00", 1.0),
        ("uuid:a", "click", "2024-01-02 10:00:00", 1.0),
        ("uuid:a", "purchase", "2024-01-03 10:00:00", 1.0),
        ("uuid:b", "signup", "2024-01-01 10:00:00", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, ts string, value double"
    )
    got = {r.step: r.n_users for r in funnel_counts(ev).collect()}
    assert got == {1: 2, 2: 1, 3: 1}
    cohorts = retention_cohorts(ev).collect()
    assert sum(r.n_users for r in cohorts if r.week_offset == 0) == 2
