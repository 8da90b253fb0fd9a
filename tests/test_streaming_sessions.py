"""Streaming sessionization: the batch plan under a watermark must
emit exactly the batch operator's rows for every finalized session."""

from __future__ import annotations

from ocr_spark.functions.sessionize import sessionize
from ocr_spark.streaming.sessions import stream_sessions


def _key(r):
    return (r.user_id, r.session_start)


def test_stream_sessions_match_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = {
        _key(r): (r.n_events, r.sum_value_cents, r.duration_us)
        for r in sessionize(events).collect()
    }
    assert want

    inp, outp, ckpt = (str(tmp_path / d) for d in ("ev", "out", "ckpt"))
    events.write.parquet(inp)
    stream_sessions(spark, inp, outp, ckpt)
    streamed = spark.read.parquet(outp).collect()
    # append mode emits only sessions the watermark has closed; every
    # emitted session must match its batch twin exactly, and the
    # 30-day corpus with an 8h gap + 1h watermark must close most
    got = {
        _key(r): (r.n_events, r.sum_value_cents, r.duration_us)
        for r in streamed
    }
    assert got, "stream emitted no finalized sessions"
    assert len(got) == len(streamed), "duplicate session emitted"
    for k, v in got.items():
        assert k in want, f"session {k} not in batch result"
        assert v == want[k]
    assert len(got) >= 0.9 * len(want)


def test_stream_sessions_incremental_two_drains(spark, tmp_path):
    """A session split across two availableNow drains merges in keyed
    state: the finalized output still equals the batch result."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = "2024-01-15"
    inp, outp, ckpt = (str(tmp_path / d) for d in ("ev", "out", "ckpt"))
    events.where(f"ts < '{cut}'").write.parquet(inp, mode="append")
    stream_sessions(spark, inp, outp, ckpt)
    events.where(f"ts >= '{cut}'").write.parquet(inp, mode="append")
    stream_sessions(spark, inp, outp, ckpt)

    want = {
        _key(r): (r.n_events, r.sum_value_cents, r.duration_us)
        for r in sessionize(events).collect()
    }
    got = {
        _key(r): (r.n_events, r.sum_value_cents, r.duration_us)
        for r in spark.read.parquet(outp).collect()
    }
    assert got
    for k, v in got.items():
        assert k in want, f"session {k} not in batch result"
        assert v == want[k]
