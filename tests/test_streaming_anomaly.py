"""Streaming anomaly monitor: merged count state reproduces the batch
anomaly_flags exactly; replay idempotence; cross-batch bucket merge."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from ocr_spark.functions.anomaly import anomaly_flags, flags_from_counts
from ocr_spark.streaming.anomaly import (
    bucket_counts_batch,
    flags_from_state,
    run_anomaly_stream,
)
from ocr_spark.streaming.state_config import write_batch_partition

_BASE = dt.datetime(2024, 3, 1)


def _events(counts_by_hour, start_eid=0, event_type="click"):
    rows = []
    eid = start_eid
    for h, n in enumerate(counts_by_hour):
        for i in range(n):
            rows.append(
                (eid, _BASE + dt.timedelta(hours=h, seconds=i), 1,
                 event_type, 1.0)
            )
            eid += 1
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).astype({"ts": "datetime64[us]"})


def test_merged_state_equals_batch_flags(spark, tmp_path):
    """Two drained micro-batches SPLIT MID-BUCKET (hour 3's events
    land in both) — merged state must still equal anomaly_flags over
    the full union, proving count additivity."""
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    full = _events([3, 4, 3, 6, 3, 4, 12, 3])
    cut = len(_events([3, 4, 3, 3]))  # first 3 events of hour 3
    b1, b2 = full.iloc[:cut], full.iloc[cut:]
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_anomaly_stream(spark, inp, st, ckpt, step_s=3600)
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_anomaly_stream(spark, inp, st, ckpt, step_s=3600)

    got = sorted(
        map(tuple, flags_from_state(spark, st, window=4).collect())
    )
    want = sorted(
        map(
            tuple,
            anomaly_flags(
                spark.createDataFrame(full), window=4
            ).collect(),
        )
    )
    assert got == want
    assert any(r[-2] for r in got)  # the hour-6 spike is flagged


def test_replay_is_idempotent(spark, tmp_path):
    st = str(tmp_path / "state")
    b = spark.createDataFrame(_events([2, 3, 2]))
    for _ in range(3):  # same batch id lands three times
        write_batch_partition(bucket_counts_batch(b), 7, st)
    merged = (
        spark.read.parquet(st)
        .groupBy("event_type", "bucket_start")
        .sum("n_events")
        .collect()
    )
    assert sorted(r[-1] for r in merged) == [2, 2, 3]


def test_flags_from_counts_gap_densifies(spark):
    """A maintained count table with an EMPTY bucket gap: the spine
    zero-fills it, matching the raw-event operator's semantics."""
    counts = spark.createDataFrame(
        [("click", 0, 2), ("click", 7200, 9)],  # hour 1 missing
        "event_type string, bucket_start long, n_events long",
    )
    rows = {
        r.bucket_start: r.n_events
        for r in flags_from_counts(counts, window=2).collect()
    }
    assert rows == {0: 2, 3600: 0, 7200: 9}


def test_off_grid_counts_raise_instead_of_silently_dropping(spark):
    import pytest

    counts = spark.createDataFrame(
        [("click", 0, 2), ("click", 5000, 9)],  # 5000 not on 3600 grid
        "event_type string, bucket_start long, n_events long",
    )
    with pytest.raises(ValueError, match="off the step_s"):
        flags_from_counts(counts, step_s=3600, window=2)


def test_state_records_step_and_rejects_mismatched_reads(spark, tmp_path):
    import pytest

    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    spark.createDataFrame(_events([2, 3])).write.parquet(inp, mode="append")
    run_anomaly_stream(spark, inp, st, ckpt, step_s=900)

    # read side defaults to the recorded step: the two event hours
    # densify into five 900 s buckets (absolute epoch ids)
    got = sorted(r.bucket_start for r in flags_from_state(spark, st, window=2).collect())
    assert len(got) == 5
    assert [b - a for a, b in zip(got, got[1:])] == [900] * 4
    # ...and a contradictory explicit step raises
    with pytest.raises(ValueError, match="written at step_s=900"):
        flags_from_state(spark, st, step_s=3600, window=2)
    # appending at a different step is refused too
    with pytest.raises(ValueError, match="refusing to append"):
        run_anomaly_stream(spark, inp, st, str(tmp_path / "c2"), step_s=60)
