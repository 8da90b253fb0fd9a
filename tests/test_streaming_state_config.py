"""State-store config surface: RocksDB provider + TTL passthrough on
the stateful streams (VERDICT r2 #9)."""

from __future__ import annotations

import time

import pandas as pd

from ocr_spark.streaming.assemble import run_assemble_stream
from ocr_spark.streaming.dedup import run_distinct_stream
from ocr_spark.streaming.state_config import ROCKSDB_PROVIDER

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.parquet(path, mode="append")


def test_rocksdb_provider_passthrough(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "aaa"), (2, "aaa"), (3, "bbb")], inp)
    q = run_distinct_stream(
        spark, inp, outp, ckpt, state_store_provider="rocksdb"
    )
    # the query ran on RocksDB: provider-specific custom metrics are in
    # the progress events
    assert "rocksdb" in repr(q.lastProgress).lower()
    # dedup semantics unchanged under the other provider
    got = {r.doc_id for r in spark.read.parquet(outp).collect()}
    assert got == {1, 3}
    # the session conf was restored after start (per-query only)
    assert spark.conf.get(_PROVIDER_CONF, None) != ROCKSDB_PROVIDER


def test_assemble_accepts_provider_and_ttl(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(
        [(1, 1, 1, "solo")],
        "doc_id long, page_number long, total_pages long, page_text string",
    ).write.parquet(inp, mode="append")
    q = run_assemble_stream(
        spark, inp, outp, ckpt,
        state_store_provider="rocksdb", state_ttl_ms=3_600_000,
    )
    assert "rocksdb" in repr(q.lastProgress).lower()
    got = {r.doc_id: (r.n_pages, r.text) for r in spark.read.parquet(outp).collect()}
    assert got == {1: (1, "solo")}
    assert spark.conf.get(_PROVIDER_CONF, None) != ROCKSDB_PROVIDER


def test_distinct_ttl_evicts_and_reemits(spark, tmp_path):
    """TTL is the documented bounded-state trade: a content hash idle
    past the TTL is forgotten, so a LATER duplicate re-emits."""
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    time.sleep(0.2)
    # batch 2 carries only an unrelated key: doc 1's state has no data
    # this batch, so its expired timeout fires and the hash is dropped
    _write_docs(spark, [(2, "other")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    time.sleep(0.2)
    # batch 3: the duplicate arrives AFTER eviction -> re-emitted
    _write_docs(spark, [(9, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt, state_ttl_ms=1)
    rows = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(outp).collect()
    )
    assert rows == [(1, "dup-me"), (2, "other"), (9, "dup-me")]


def test_distinct_without_ttl_suppresses_late_dups(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_docs(spark, [(1, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt)
    _write_docs(spark, [(9, "dup-me")], inp)
    run_distinct_stream(spark, inp, outp, ckpt)
    assert [r.doc_id for r in spark.read.parquet(outp).collect()] == [1]


class _FakeState:
    """Minimal GroupState stand-in for unit-testing state functions."""

    def __init__(self, value=None):
        self._value = value
        self.hasTimedOut = False
        self.timeout_calls = []

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_calls.append(ms)


def test_assemble_done_path_rearms_ttl():
    """GroupState clears a key's timeout on every invocation, so the
    late-duplicate early-return must re-arm it — otherwise one late
    page makes a completed doc's state immortal."""
    import pandas as pd

    from ocr_spark.streaming.assemble import _assemble

    state = _FakeState()
    page = pd.DataFrame(
        {"doc_id": [7], "page_number": [1], "total_pages": [1], "page_text": ["x"]}
    )
    out = list(_assemble((7,), iter([page]), state, ttl_ms=60000))
    assert len(out) == 1 and state._value[3] is True
    assert state.timeout_calls == [60000]

    # late duplicate after completion: no output, but the TTL must be
    # re-armed by this invocation too
    out2 = list(_assemble((7,), iter([page]), state, ttl_ms=60000))
    assert out2 == []
    assert state.timeout_calls == [60000, 60000]


def test_first_seen_seen_again_rearms_ttl():
    import pandas as pd

    from ocr_spark.streaming.dedup import _first_seen

    state = _FakeState()
    batch = pd.DataFrame({"doc_id": [3, 1], "text": ["t", "t"]})
    out = list(_first_seen(("md5",), iter([batch]), state, ttl_ms=5000))
    assert len(out) == 1 and out[0]["doc_id"][0] == 1
    assert state.timeout_calls == [5000]
    out2 = list(_first_seen(("md5",), iter([batch]), state, ttl_ms=5000))
    assert out2 == [] and state.timeout_calls == [5000, 5000]


def test_zero_batch_step_drain_rule():
    from ocr_spark.streaming.state_config import _zero_batch_step

    def prog(bid, rows, off):
        return {
            "batchId": bid,
            "numInputRows": rows,
            "sources": [{"endOffset": f"{{'logOffset': {off}}}"}],
        }

    # data batch: never done
    done, prev = _zero_batch_step(None, prog(0, 5, 1))
    assert not done and prev is None
    # first zero-input batch: remembered, not yet done
    done, prev = _zero_batch_step(prev, prog(1, 0, 2))
    assert not done and prev == (1, ("{'logOffset': 2}",))
    # same progress entry re-polled: no-op
    done, prev = _zero_batch_step(prev, prog(1, 0, 2))
    assert not done
    # mid-drain zero-input batch that still ADVANCED the offset (an
    # empty-files batch with backlog remaining): drain must continue
    done, prev = _zero_batch_step(prev, prog(2, 0, 3))
    assert not done and prev == (2, ("{'logOffset': 3}",))
    # second distinct zero-input batch with unmoved offsets: done
    done, prev = _zero_batch_step(prev, prog(3, 0, 3))
    assert done
