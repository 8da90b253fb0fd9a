"""Streaming ingest-quality monitor: merged verdicts equal the batch
gate over everything ingested; replay idempotence of the
batch-partitioned state."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.streaming.quality import (
    quality_verdicts_batch,
    run_quality_stream,
    stats_from_state,
)


def _b(ids, texts):
    return pd.DataFrame({"doc_id": ids, "text": texts})


GOOD = "the a of and to in is was for on with as at by it that this " * 6
BAD_ENC = GOOD + chr(0xFFFD) + chr(0xFFFD)
LOWQ = "!?!;" * 60


def test_stream_equals_batch_gate(spark, tmp_path):
    inp, st, ckpt = (str(tmp_path / d) for d in ("in", "state", "ckpt"))
    b1 = _b([1, 2], [GOOD, BAD_ENC])
    b2 = _b([3, 4], [LOWQ, GOOD + " more words here"])
    spark.createDataFrame(b1).write.parquet(inp, mode="append")
    run_quality_stream(spark, inp, st, ckpt)
    spark.createDataFrame(b2).write.parquet(inp, mode="append")
    run_quality_stream(spark, inp, st, ckpt)

    got = sorted(
        map(
            tuple,
            spark.read.parquet(st)
            .select("doc_id", "quality", "lang_pred", "enc_suspect", "keep")
            .collect(),
        )
    )
    full = spark.createDataFrame(pd.concat([b1, b2], ignore_index=True))
    want = sorted(map(tuple, quality_verdicts_batch(full).collect()))
    assert got == want

    s = stats_from_state(spark, st).collect()[0]
    assert s.n_docs == 4 and s.n_suspect == 1
    verdicts = {r[0]: r[4] for r in got}
    assert verdicts[1] and verdicts[4]       # clean docs kept
    assert not verdicts[2]                   # encoding damage gated
    assert not verdicts[3]                   # low quality gated
    assert s.n_kept == 2


def test_replay_is_idempotent(spark, tmp_path):
    st = str(tmp_path / "state")
    b = spark.createDataFrame(_b([1, 2], [GOOD, LOWQ]))
    for _ in range(3):  # same batch id lands three times
        (
            quality_verdicts_batch(b)
            .withColumn("ingest_batch", F.lit(5))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(st)
        )
    s = stats_from_state(spark, st).collect()[0]
    assert s.n_docs == 2 and s.n_kept == 1  # no double-counting


def test_lang_gate_passthrough(spark, tmp_path):
    df = spark.createDataFrame(
        _b([1, 2], ["der die das und ist nicht mit ein eine zu " * 8, GOOD])
    )
    got = {
        r.doc_id: (r.lang_pred, r.keep)
        for r in quality_verdicts_batch(df, langs=("en",)).collect()
    }
    assert got[1][0] == "de" and not got[1][1]  # German gated out
    assert got[2] == ("en", True)


def test_verdicts_are_row_preserving_and_null_text_definite(spark):
    """Duplicate doc_ids must yield one verdict per input row (no
    join fan-out) and NULL text must get a DEFINITE keep=False, not a
    three-valued NULL that vanishes from both audit partitions."""
    df = spark.createDataFrame(
        [(1, GOOD), (1, GOOD), (1, LOWQ), (2, None)],
        "doc_id long, text string",
    )
    v = quality_verdicts_batch(df)
    rows = v.collect()
    assert len(rows) == 4  # k rows in, k verdicts out
    null_v = [r for r in rows if r.doc_id == 2][0]
    assert null_v.keep is False and null_v.lang_pred == "und"
    assert not null_v.enc_suspect
    # every row lands in exactly one audit partition
    from pyspark.sql import functions as F

    assert v.where(F.col("keep")).count() + v.where(~F.col("keep")).count() == 4


def test_verdicts_plan_has_no_join(spark):
    from ocr_spark.plans import plan_str as _plan

    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    assert "Join" not in _plan(quality_verdicts_batch(df), "simple")
