"""T1-T5: checkpoint-resumable runs — crash mid-run, resume, output
identical to a single-shot run with no duplicates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline.runner import (
    ExtractionRun,
    RunConfig,
    cleanup_orphan_runs,
    list_runs,
)
from ocr_spark.sources.synth import synthesize_spans


@pytest.fixture()
def docs(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthesize_spans(d)


def _nested_rows(df):
    out = []
    for r in df.collect():
        spans = tuple((s.kind, s.text, s.media_ref, s.offset) for s in (r.spans or []))
        out.append((r.doc_id, spans))
    return sorted(out)


def test_single_shot_run(spark, docs, tmp_path):
    run = ExtractionRun(spark, docs, str(tmp_path / "out"), RunConfig("r1", n_buckets=8))
    s = run.run()
    assert s["buckets_done"] == 8
    assert s["n_docs"] == 500
    assert s["parse_failures"] == 0
    out = run.output()
    assert out.select("doc_id").distinct().count() == 500


def test_crash_and_resume_equals_single_shot(spark, docs, tmp_path):
    ref = ExtractionRun(spark, docs, str(tmp_path / "ref"), RunConfig("ref", n_buckets=8))
    ref.run()
    expected = _nested_rows(ref.output().drop("bucket"))

    run = ExtractionRun(
        spark, docs, str(tmp_path / "out"),
        RunConfig("r2", n_buckets=8, buckets_per_commit=2),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        run.run(fail_after_groups=2)
    assert len(run.done_buckets()) == 4  # two groups of two committed

    s = run.run()  # resume
    assert s["buckets_done"] == 8
    got = _nested_rows(run.output().drop("bucket"))
    assert got == expected
    # no duplicate docs
    assert run.output().groupBy("doc_id").count().where(F.col("count") > 1).count() == 0


def test_resume_is_noop_when_done(spark, docs, tmp_path):
    run = ExtractionRun(spark, docs, str(tmp_path / "out"), RunConfig("r3", n_buckets=4))
    run.run()
    recs_before = {
        b: json.load(open(run._record_path(b))) for b in run.done_buckets()
    }
    run.run()  # all buckets recorded -> nothing reprocessed
    recs_after = {
        b: json.load(open(run._record_path(b))) for b in run.done_buckets()
    }
    assert recs_before == recs_after


def test_size_weighted_run_matches_default(spark, docs, tmp_path):
    ref = ExtractionRun(spark, docs, str(tmp_path / "ref"), RunConfig("sw0", n_buckets=4))
    ref.run()
    sw = ExtractionRun(
        spark, docs, str(tmp_path / "sw"),
        RunConfig("sw1", n_buckets=4, size_weighted_partitions=8),
    )
    s = sw.run()
    assert s["n_docs"] == 500
    assert _nested_rows(ref.output().select("doc_id", "spans")) == _nested_rows(
        sw.output().select("doc_id", "spans")
    )


def test_commit_group_is_single_pass(spark, docs, tmp_path):
    """One commit group = exactly one kernel execution (MapInArrow)
    and no doc_id join — output and metrics come from the same pass."""
    run = ExtractionRun(spark, docs, str(tmp_path / "out"), RunConfig("rp", n_buckets=8))
    plan = run._group_df([0, 1])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1, plan
    assert "Join" not in plan, plan


def test_resume_rejects_config_mismatch(spark, docs, tmp_path):
    """Resuming a run_id with a different bucket function would skip
    buckets that now hold different docs — must fail fast instead."""
    run = ExtractionRun(
        spark, docs, str(tmp_path / "out"),
        RunConfig("cm1", n_buckets=8, buckets_per_commit=4),
    )
    with pytest.raises(RuntimeError):
        run.run(fail_after_groups=1)
    bad = ExtractionRun(
        spark, docs, str(tmp_path / "out"), RunConfig("cm1", n_buckets=16)
    )
    with pytest.raises(ValueError, match="corrupt"):
        bad.run()
    # same config resumes fine
    assert run.run()["buckets_done"] == 8


def test_empty_commit_groups_do_not_crash(spark, docs, tmp_path):
    """n_buckets >> corpus: groups whose buckets hold zero docs must
    commit cleanly (explicit read schema — no parquet inference over
    zero files)."""
    few = docs.limit(3)
    run = ExtractionRun(
        spark, few, str(tmp_path / "out"),
        RunConfig("e1", n_buckets=32, buckets_per_commit=4),
    )
    s = run.run()
    assert s["buckets_done"] == 32
    assert s["n_docs"] == 3
    assert run.output().select("doc_id").distinct().count() == 3


def test_abort_then_resume_equals_single_shot(spark, docs, tmp_path):
    """T6: an aborted run is resumable; output identical to one-shot."""
    ref = ExtractionRun(spark, docs, str(tmp_path / "ref"), RunConfig("aref", n_buckets=8))
    ref.run()
    expected = _nested_rows(ref.output().select("doc_id", "spans"))

    run = ExtractionRun(
        spark, docs, str(tmp_path / "out"),
        RunConfig("ab1", n_buckets=8, buckets_per_commit=2),
    )
    with pytest.raises(RuntimeError):
        run.run(fail_after_groups=1)
    run.abort("operator cancel")
    assert run.is_aborted()
    s = run.run()  # resume clears the marker and finishes pending work
    assert not run.is_aborted()
    assert s["buckets_done"] == 8
    assert _nested_rows(run.output().select("doc_id", "spans")) == expected


def test_cleanup_orphan_runs(spark, docs, tmp_path):
    """T6: stale lineage dirs are GC'd; kept runs and output survive."""
    out = str(tmp_path / "out")
    keep = ExtractionRun(spark, docs, out, RunConfig("live", n_buckets=4))
    keep.run()
    stale = ExtractionRun(
        spark, docs, out, RunConfig("stale", n_buckets=4, buckets_per_commit=1)
    )
    with pytest.raises(RuntimeError):
        stale.run(fail_after_groups=1)  # orphaned: partial lineage left behind
    assert set(list_runs(out)) == {"live", "stale"}
    removed = cleanup_orphan_runs(out, keep={"live"})
    assert removed == ["stale"]
    assert list_runs(out) == ["live"]
    # output table untouched; the kept run still resumes as a no-op
    assert keep.output().select("doc_id").distinct().count() == 500
    assert keep.run()["buckets_done"] == 4


def test_lineage_metrics_consistency(spark, docs, tmp_path):
    run = ExtractionRun(spark, docs, str(tmp_path / "out"), RunConfig("r4", n_buckets=4))
    s = run.run()
    out = run.output()
    n_spans_out = out.select(F.explode("spans")).count()
    assert s["n_spans_out"] == n_spans_out
    assert s["n_spans_in"] >= s["n_spans_out"]
    assert os.path.exists(f"{tmp_path}/out/_lineage/r4/manifest.json")
