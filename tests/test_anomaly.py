"""Rolling integer z-score anomaly flags: crafted spikes, warmup and
variance-zero semantics, DuckDB twin parity, plan shape."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from ocr_spark.functions.anomaly import anomaly_flags, anomaly_flags_sql
from ocr_spark.plans import plan_str

_BASE = dt.datetime(2024, 3, 1)


def _events_pdf(counts_by_hour, event_type="click"):
    """One event per unit of count, spread inside each hour."""
    rows = []
    eid = 0
    for h, n in enumerate(counts_by_hour):
        for i in range(n):
            rows.append(
                (
                    eid,
                    _BASE + dt.timedelta(hours=h, seconds=i),
                    1,
                    event_type,
                    1.0,
                )
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"})


def _flags(spark, counts, window=4, tau2=9):
    df = spark.createDataFrame(_events_pdf(counts))
    out = anomaly_flags(df, step_s=3600, window=window, tau2=tau2)
    return sorted(
        (r.bucket_start, r.n_events, r.is_anomaly, r.window_full)
        for r in out.collect()
    )


def test_spike_over_noisy_base_is_flagged(spark):
    # trailing window {3,4,3,4}: mean 3.5, var 0.25 -> tau=3 bound is
    # |x-3.5| > 1.5, so 6 flags and 5 does not
    counts = [3, 4, 3, 4, 6, 3, 4, 3, 5]
    got = _flags(spark, counts)
    hour4 = got[4]
    assert hour4[1] == 6 and hour4[2] is True
    hour8 = got[8]
    assert hour8[1] == 5 and hour8[2] is False


def test_warmup_buckets_never_flag(spark):
    counts = [1, 100, 100, 1]  # wild swings inside the warmup
    got = _flags(spark, counts, window=8)
    assert all(not a for _, _, a, _ in got)
    assert all(not f for _, _, _, f in got)


def test_variance_zero_window_flags_any_deviation(spark):
    counts = [5, 5, 5, 5, 5, 6]
    got = _flags(spark, counts, window=5)
    assert got[-1][1] == 6 and got[-1][2] is True
    # ... and an exactly-equal value does not flag
    counts2 = [5, 5, 5, 5, 5, 5]
    got2 = _flags(spark, counts2, window=5)
    assert got2[-1][2] is False


def test_empty_buckets_join_the_baseline(spark):
    # an hour with NO events is a 0 observation: after a quiet day,
    # a burst flags against the zero-filled baseline
    counts = [2] + [0] * 6 + [9]
    got = _flags(spark, counts, window=4)
    assert got[-1][1] == 9 and got[-1][2] is True


def test_parameter_validation():
    with pytest.raises(ValueError):
        anomaly_flags_sql(window=1)
    with pytest.raises(ValueError):
        anomaly_flags_sql(tau2=-1)


def test_matches_duckdb_twin(spark, tmp_path):
    """Parity on a multi-type corpus with NULL ts / NULL type rows,
    gaps, and a genuine spike per type."""
    frames = []
    for ty, pattern in [
        ("click", [3, 4, 3, 4, 3, 4, 12, 3]),
        ("view", [0, 1, 0, 1, 0, 1, 0, 9]),
        ("error", [2, 2, 2, 2, 2, 2, 2, 2]),
    ]:
        frames.append(_events_pdf(pattern, event_type=ty))
    pdf = pd.concat(frames, ignore_index=True)
    pdf["event_id"] = range(len(pdf))
    # hostile rows: NULL ts, NULL type (excluded by both engines)
    nulls = pd.DataFrame(
        [
            (99990, pd.NaT, 1, "click", 1.0),
            (99991, _BASE, 1, None, 1.0),
        ],
        columns=pdf.columns,
    ).astype({"ts": "datetime64[us]"})
    pdf = pd.concat([pdf, nulls], ignore_index=True)
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    sdf = anomaly_flags(spark.read.parquet(path), window=4)
    cols = sorted(sdf.columns)
    got = sorted(tuple(r) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(anomaly_flags_sql(window=4)).fetchdf()
    want = sorted(tuple(r) for r in odf[cols].itertuples(index=False))
    assert got == want
    assert any(r[cols.index("is_anomaly")] for r in got)  # non-vacuous


def test_plan_has_no_nested_loop(spark):
    df = spark.createDataFrame(_events_pdf([3, 4, 3, 4, 6]))
    p = plan_str(anomaly_flags(df), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
