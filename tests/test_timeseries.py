"""As-of join + running aggregates: crafted edge semantics and the
no-pair-blowup plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from ocr_spark.functions.timeseries import (
    asof_join_events,
    running_user_stats,
)

SF_DIR = "/root/testdata/sf0.001"


from ocr_spark.plans import plan_str as _plan


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, v)
            for i, (s, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_asof_matches_most_recent_prior(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "click", 0.0),     # id 0
            (10, 1, "click", 0.0),    # id 1  <- most recent prior
            (20, 1, "purchase", 5.0), # id 2
            (30, 1, "click", 0.0),    # id 3 (after; must not match)
        ],
    )
    [row] = asof_join_events(ev).collect()
    assert row.event_id == 2
    assert row.matched_event_id == 1
    assert row.lag_us == 10_000_000


def test_asof_tie_is_inclusive(spark):
    # a click at EXACTLY the purchase timestamp matches (as-of <=)
    ev = _ev(spark, [(20, 1, "click", 0.0), (20, 1, "purchase", 5.0)])
    [row] = asof_join_events(ev).collect()
    assert row.matched_event_id == 0
    assert row.lag_us == 0


def test_asof_tied_right_rows_pick_max_event_id(spark):
    # two clicks at the same (user, ts): the greatest event_id wins,
    # deterministically, matching the SQL twin's pre-join max-dedup
    ev = _ev(
        spark,
        [
            (10, 1, "click", 0.0),     # id 0
            (10, 1, "click", 0.0),     # id 1  <- tied, higher id wins
            (20, 1, "purchase", 5.0),  # id 2
        ],
    )
    [row] = asof_join_events(ev).collect()
    assert row.matched_event_id == 1


def test_asof_unmatched_left_keeps_row(spark):
    ev = _ev(
        spark,
        [
            (10, 1, "purchase", 5.0),  # user 1 has no click at all
            (5, 2, "purchase", 5.0),   # user 2's click is later only
            (9, 2, "click", 0.0),
        ],
    )
    rows = {r.user_id: r for r in asof_join_events(ev).collect()}
    assert len(rows) == 2
    assert rows[1].matched_event_id == -1 and rows[1].lag_us == -1
    assert rows[2].matched_event_id == -1 and rows[2].matched_ts == ""


def test_asof_does_not_cross_users(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "click", 0.0),
            (20, 2, "purchase", 5.0),  # other user's click must not match
        ],
    )
    [row] = asof_join_events(ev).collect()
    assert row.matched_event_id == -1


def test_null_ts_rows_are_excluded_and_null_user_never_matches(spark):
    """The pinned NULL contract: NULL-ts events vanish from every
    event-time operator (both engines), and a NULL-user purchase is
    never attributed to a NULL-user click (SQL equality semantics)."""
    ev = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 3, 1, 0), 1, "click", 1.0),
            (1, None, 1, "purchase", 2.0),                      # NULL ts
            (2, dt.datetime(2024, 3, 1, 1), None, "click", 3.0),
            (3, dt.datetime(2024, 3, 1, 2), None, "purchase", 4.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    asof = asof_join_events(ev).collect()
    # the NULL-ts purchase is gone; the NULL-user purchase stays but
    # cannot match the NULL-user click
    assert {r.event_id for r in asof} == {3}
    [r] = asof
    assert r.matched_event_id == -1
    run = running_user_stats(ev).collect()
    assert {r.event_id for r in run} == {0, 2, 3}


def test_asof_plan_has_one_shuffle_and_no_join(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _plan(asof_join_events(ev), "simple")
    # union + window carry: exactly one Exchange (on user_id), and no
    # join operator anywhere — the |L|x|R| range-join blowup shape is
    # structurally impossible
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_running_stats_accumulate(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view", 1.0),
            (10, 1, "view", 2.5),
            (25, 1, "view", 0.25),
        ],
    )
    rows = sorted(running_user_stats(ev).collect(), key=lambda r: r.running_n)
    assert [r.running_n for r in rows] == [1, 2, 3]
    assert [r.running_cents for r in rows] == [100, 350, 375]
    assert [r.gap_us for r in rows] == [-1, 10_000_000, 15_000_000]


def test_running_stats_tied_ts_assignment_is_deterministic(spark):
    # two events of one user at the same ts order by event_id, so the
    # running values land on specific rows in both engines
    ev = _ev(spark, [(10, 1, "view", 1.0), (10, 1, "view", 2.0)])
    rows = {r.event_id: r for r in running_user_stats(ev).collect()}
    assert rows[0].running_n == 1 and rows[0].running_cents == 100
    assert rows[1].running_n == 2 and rows[1].running_cents == 300
    assert rows[0].gap_us == -1 and rows[1].gap_us == 0


def test_running_stats_single_shuffle(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = _plan(running_user_stats(ev), "simple")
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# resample_fill
# ---------------------------------------------------------------------------


def test_resample_fill_semantics(spark):
    from ocr_spark.functions.timeseries import resample_fill

    rows = [
        (1, "2024-01-01 00:10:00", "click", 1.50),
        (2, "2024-01-01 00:40:00", "click", 2.25),
        # hour 01 empty -> gap bucket
        (3, "2024-01-01 02:05:00", "click", 4.00),
        (4, "2024-01-01 00:30:00", "view", None),  # NULL value -> 0 cents
        (5, None, "click", 9.99),                  # NULL ts excluded
        (6, "2024-01-01 03:00:00", None, 1.0),     # NULL type excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    z = {
        (r.event_type, r.bucket_start): r
        for r in resample_fill(df, 3600, "zero").collect()
    }
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert len(z) == 4  # click x3 dense hours + view x1
    h0 = z[("click", base)]
    assert (h0.n_events, h0.sum_value_cents, h0.filled) == (2, 375, False)
    gap = z[("click", base + 3600)]
    assert (gap.n_events, gap.sum_value_cents, gap.filled) == (0, 0, True)
    assert z[("view", base)].sum_value_cents == 0

    f = {
        (r.event_type, r.bucket_start): r
        for r in resample_fill(df, 3600, "ffill").collect()
    }
    # gap bucket CARRIES the previous hour's sum; still marked filled
    assert (f[("click", base + 3600)].sum_value_cents,
            f[("click", base + 3600)].filled) == (375, True)
    assert f[("click", base + 7200)].sum_value_cents == 400


def test_resample_fill_matches_oracle_both_modes(spark):
    import duckdb

    from ocr_spark.functions.timeseries import resample_fill, resample_fill_sql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    for mode in ("zero", "ffill"):
        got = sorted(map(tuple, resample_fill(ev, 3600, mode).collect()))
        want = sorted(
            map(tuple, con.execute(resample_fill_sql("events", 3600, mode)).fetchall())
        )
        assert got == want and len(got) > 0


def test_resample_fill_rejects_bad_args(spark):
    from ocr_spark.functions.timeseries import resample_fill, resample_fill_sql

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import pytest as _pt

    with _pt.raises(ValueError):
        resample_fill(ev, 3600, "interpolate")
    with _pt.raises(ValueError):
        resample_fill(ev, 0)
    with _pt.raises(ValueError):
        resample_fill_sql("events", 3600, "interpolate")


def test_asof_and_running_accept_string_user_ids(spark):
    from ocr_spark.functions.timeseries import (
        asof_join_events,
        running_user_stats,
    )

    rows = [
        (1, "uuid:a", "click", "2024-01-01 10:00:00", 1.0),
        (2, "uuid:a", "purchase", "2024-01-01 11:00:00", 5.0),
        (3, "uuid:b", "purchase", "2024-01-01 11:00:00", 2.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string, ts string, value double",
    )
    asof = {r.event_id: r.matched_event_id for r in asof_join_events(ev).collect()}
    assert asof == {2: 1, 3: -1}  # uuid:b purchase has no prior click
    run = {(r.user_id, r.event_id): r.running_n for r in running_user_stats(ev).collect()}
    assert run == {("uuid:a", 1): 1, ("uuid:a", 2): 2, ("uuid:b", 3): 1}
