"""Cross-engine fuzz for the event-time operators (as-of join,
running stats, sessionization, window counts): random event tables
with DELIBERATE (user, ts) ties, NULL-free and tie-heavy regimes —
the divergence net the text/validator fuzz harnesses proved out,
extended to the time axis."""

from __future__ import annotations

import datetime as dt
import math
import random

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions import sessionize as sess
from ocr_spark.functions import timeseries as tsr

N_TABLES = 12
EVENTS_PER_TABLE = 120


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _random_events(rng: random.Random, n: int) -> pd.DataFrame:
    """A hostile little event log: few users, second-quantized
    timestamps (ties guaranteed), sub-hour AND multi-hour gaps so
    sessions both merge and split, mixed event types."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        # ~5% NULL timestamps and NULL users: the contract is that
        # NULL-ts rows are excluded identically in both engines, and
        # NULL-user rows group together (never equality-match in asof)
        if rng.random() < 0.05:
            rows.append(
                (i, None, rng.randint(1, 4),
                 rng.choice(["click", "purchase", "view"]),
                 round(rng.uniform(0, 100), 2), "{}")
            )
            continue
        user = rng.randint(1, 4) if rng.random() > 0.05 else None
        # coarse offsets force (user, ts) collisions across types
        offset = rng.choice(
            [
                rng.randint(0, 50),                # tie-heavy cluster
                rng.randint(0, 3600 * 30),         # spread
                3600 * rng.randint(0, 30),         # exact hour marks
            ]
        )
        rows.append(
            (
                i,
                base + dt.timedelta(seconds=offset),
                user,
                rng.choice(["click", "purchase", "view"]),
                round(rng.uniform(0, 100), 2),
                "{}",
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def _sort_key(row):
    # rows can carry None in nullable columns (NULL-user groups);
    # plain sorted() would TypeError comparing None with a value
    return tuple((v is None, repr(v)) for v in row)


def _assert_same(spark_df, con, sql):
    cols = sorted(spark_df.columns)
    got = sorted(map(tuple, spark_df.select(*cols).collect()), key=_sort_key)
    odf = con.execute(sql).df()
    assert sorted(odf.columns) == cols
    want = sorted(
        (
            tuple(
                None if (isinstance(v, float) and math.isnan(v)) else v
                for v in r
            )
            for r in odf[cols].itertuples(index=False, name=None)
        ),
        key=_sort_key,
    )
    assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_event_operator_fuzz_across_engines(spark, con):
    rng = random.Random(31337)
    for t in range(N_TABLES):
        pdf = _random_events(rng, EVENTS_PER_TABLE)
        df = spark.createDataFrame(pdf)
        con.register("ev_fuzz_df", pdf)
        con.execute(
            "CREATE OR REPLACE VIEW ev_fuzz AS SELECT * FROM ev_fuzz_df"
        )
        _assert_same(
            tsr.asof_join_events(df), con, tsr.asof_join_events_sql("ev_fuzz")
        )
        _assert_same(
            tsr.running_user_stats(df),
            con,
            tsr.running_user_stats_sql("ev_fuzz"),
        )
        _assert_same(
            sess.sessionize(df, gap="2 hours"),
            con,
            sess.sessionize_sql("ev_fuzz", gap="2 hours"),
        )
