"""Banded interval join: semantics vs the naive non-equi join,
inclusive bounds, the oversized-interval fallback, and the plan shape
(no nested loop on the banded path)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_spark.functions.rangejoin import (
    attribution_join_events,
    attribution_join_events_sql,
    banded_range_join,
)
from ocr_spark.plans import plan_str as _plan

SF_DIR = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_matches_naive_nonequi_join(spark):
    points = spark.createDataFrame(
        [(i, i % 3, _ts(i * 7)) for i in range(40)],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100 + j, j % 3, _ts(j * 20), _ts(j * 20 + 45)) for j in range(10)],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    got = _pairs(
        banded_range_join(points, intervals, band_seconds=600).select(
            "interval_id", "event_id"
        )
    )
    naive = _pairs(
        points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") <= F.col("i.end_ts")),
        )
        .select("interval_id", "p.event_id")
    )
    assert got == naive and len(got) > 0


def test_bounds_inclusive_and_band_edges(spark):
    """Points exactly at start, end, and at band boundaries match."""
    band = 600
    points = spark.createDataFrame(
        [
            (1, 1, _ts(0)),       # == start
            (2, 1, _ts(30)),      # interior, crosses a band edge
            (3, 1, _ts(35)),      # == end
            (4, 1, _ts(35.001)),  # just past end
            (5, 1, _ts(10)),      # exactly on a band boundary
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, 1, _ts(0), _ts(35))],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    got = _pairs(
        banded_range_join(points, intervals, band_seconds=band).select("event_id")
    )
    assert got == [(1,), (2,), (3,), (5,)]


def test_null_and_inverted_rows_drop(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, None, _ts(5)), (3, 1, None)],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (9, 1, _ts(0), _ts(10)),
            (10, 1, _ts(10), _ts(0)),  # inverted: matches nothing
            (11, None, _ts(0), _ts(10)),
            (12, 1, None, _ts(10)),
        ],
        "interval_id long, user_id long, start_ts timestamp, end_ts timestamp",
    )
    got = _pairs(
        banded_range_join(points, intervals).select("interval_id", "event_id")
    )
    assert got == [(9, 1)]


def test_oversize_fallback_equals_banded(events):
    """Forcing every interval down the broadcast path (max_bands=1)
    and a mixed split both reproduce the default result."""
    base = _pairs(attribution_join_events(events))
    assert _pairs(attribution_join_events(events, max_bands=1)) == base
    assert (
        _pairs(attribution_join_events(events, band_seconds=172_800, max_bands=2))
        == base
    )


def test_keyless_join(spark):
    points = spark.createDataFrame(
        [(i, _ts(i * 10)) for i in range(10)], "event_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, _ts(15), _ts(45))],
        "interval_id long, start_ts timestamp, end_ts timestamp",
    )
    got = _pairs(
        banded_range_join(points, intervals, keys=()).select("event_id")
    )
    assert got == [(2,), (3,), (4,)]


def test_banded_path_has_no_nested_loop(events):
    """With no oversized intervals the plan must be a pure equi-join
    on (band, keys): no BroadcastNestedLoopJoin, no CartesianProduct
    feeding real rows (the empty big-side leg is pruned by AQE at
    runtime; statically we pin the banded leg's join operators)."""
    df = attribution_join_events(events)
    plan = _plan(df, "simple")
    # one banded equi-join leg + the (empty-at-runtime) broadcast leg
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_matches_duckdb_twin(events):
    got = _pairs(attribution_join_events(events))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    oracle = sorted(map(tuple, con.execute(attribution_join_events_sql()).fetchall()))
    assert got == oracle and len(got) > 0


def test_attribution_accepts_string_user_ids(spark):
    from ocr_spark.functions.rangejoin import attribution_join_events

    rows = [
        (1, "uuid:a", "signup", "2024-01-01 10:00:00"),
        (2, "uuid:a", "purchase", "2024-01-02 10:00:00"),
        (3, "uuid:b", "purchase", "2024-01-02 10:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string"
    )
    got = [tuple(r) for r in attribution_join_events(ev).collect()]
    assert got == [(1, 2, "uuid:a")]
