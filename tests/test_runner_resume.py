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
    # a different input shaping (gates on/off) is the same hazard:
    # done-bucket records would cover a differently-filtered input
    gated = ExtractionRun(
        spark, docs, str(tmp_path / "out"),
        RunConfig("cm1", n_buckets=8, buckets_per_commit=4,
                  input_config={"integrity_gate": True}),
    )
    with pytest.raises(ValueError, match="corrupt"):
        gated.run()
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


def test_null_doc_id_row_stays_in_its_commit_group(spark, docs, tmp_path):
    """A NULL doc_id row must bucket IDENTICALLY on the input side
    (pre-kernel filter) and the output side (post-kernel recompute,
    where the kernel has rendered the id as ''). With the old
    hash(NULL)=42 input-side bucketing, the row migrated to a foreign
    bucket at write time and the dynamic-partition overwrite clobbered
    that bucket's previously committed data."""
    from ocr_spark.pipeline.runner import _bucket_col

    nullable_doc = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    null_row = spark.createDataFrame(
        [(None, [{"kind": "text", "text": "orphan", "media_ref": "", "offset": 0}])],
        schema=nullable_doc,
    )
    corpus = docs.select("doc_id", "spans").unionByName(null_row)

    # both sides must agree: input-side bucket of the NULL row equals
    # the bucket of the kernel's rendered '' id
    n_buckets = 8
    got = corpus.where(F.col("doc_id").isNull()).select(
        _bucket_col(n_buckets).alias("b")
    ).collect()
    want = spark.createDataFrame([("",)], schema="doc_id string").select(
        _bucket_col(n_buckets).alias("b")
    ).collect()
    assert got[0].b == want[0].b

    run = ExtractionRun(
        spark, corpus, str(tmp_path / "out"),
        RunConfig("rnull", n_buckets=n_buckets, buckets_per_commit=2),
    )
    s = run.run()
    out = run.output()
    # the NULL-id row surfaces as exactly one ''-id error row, nothing lost
    assert s["n_docs"] == 501
    assert out.count() == 501
    err = out.where(F.col("doc_id") == "").collect()
    assert len(err) == 1 and err[0].parse_failed == 1
    assert err[0].bucket == want[0].b  # written inside its own group
    # and every real doc committed exactly once (no clobbered buckets)
    assert out.where(F.col("doc_id") != "").select("doc_id").distinct().count() == 500
    assert s["parse_failures"] == 1


# ---------------------------------------------------------------------------
# staged bucketed input (stage_input=True)
# ---------------------------------------------------------------------------


def _rows(spark, path):
    df = spark.read.parquet(path)
    return sorted(
        (r.doc_id, r.bucket, len(r.spans or [])) for r in df.collect()
    )


def test_staged_run_matches_unstaged(spark, docs, tmp_path):
    ref = ExtractionRun(
        spark, docs, str(tmp_path / "ref"), RunConfig("su0", n_buckets=8)
    )
    ref.run()
    st = ExtractionRun(
        spark,
        docs,
        str(tmp_path / "st"),
        RunConfig("su1", n_buckets=8, buckets_per_commit=2, stage_input=True),
    )
    st.run()
    assert _rows(spark, str(tmp_path / "ref")) == _rows(spark, str(tmp_path / "st"))
    # staging scratch is GC'd after completion (marker included)
    assert not os.path.exists(str(tmp_path / "st" / "_staging" / "su1"))
    assert not os.path.exists(f"{st.lineage_dir}/staged.json")


def test_staged_group_scan_partition_prunes(spark, docs, tmp_path):
    from ocr_spark.plans import plan_str

    run = ExtractionRun(
        spark,
        docs,
        str(tmp_path / "out"),
        RunConfig("sp1", n_buckets=8, buckets_per_commit=2, stage_input=True),
    )
    run.write_manifest()
    plan = plan_str(run._group_df([0, 1]), "formatted")
    # the group filter must land on the staged PARTITION column, not a
    # recomputed full-scan hash predicate
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    # staging is written exactly once; a second group reuses it
    marker = f"{run.lineage_dir}/staged.json"
    assert os.path.exists(marker)
    before = json.load(open(marker))
    run._group_df([2, 3]).count()
    assert json.load(open(marker)) == before


def test_staged_crash_and_resume_equals_single_shot(spark, docs, tmp_path):
    ref = ExtractionRun(
        spark, docs, str(tmp_path / "ref"), RunConfig("sc0", n_buckets=8)
    )
    ref.run()
    out = str(tmp_path / "out")
    cfg = RunConfig("sc1", n_buckets=8, buckets_per_commit=2, stage_input=True)
    broken = ExtractionRun(spark, docs, out, cfg)
    with pytest.raises(RuntimeError):
        broken.run(fail_after_groups=2)
    # staging survives the crash (resume must not pay it twice)
    assert os.path.exists(f"{out}/_staging/sc1")
    resumed = ExtractionRun(spark, docs, out, cfg)
    summary = resumed.run()
    assert summary["buckets_done"] == 8
    assert _rows(spark, str(tmp_path / "ref")) == _rows(spark, out)


def test_cleanup_orphan_runs_removes_stale_staging(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    cfg = RunConfig("stale-st", n_buckets=4, buckets_per_commit=1, stage_input=True)
    broken = ExtractionRun(spark, docs, out, cfg)
    with pytest.raises(RuntimeError):
        broken.run(fail_after_groups=1)
    assert os.path.exists(f"{out}/_staging/stale-st")
    removed = cleanup_orphan_runs(out, keep=frozenset())
    assert "stale-st" in removed
    assert not os.path.exists(f"{out}/_staging/stale-st")


def test_staged_run_survives_empty_corpus(spark, docs, tmp_path):
    # an EMPTY input stages as _SUCCESS-only parquet; the staged read
    # must use the explicit schema (inference would throw and, with
    # the marker already written, wedge every resume)
    empty = docs.where("1 = 0")
    run = ExtractionRun(
        spark,
        empty,
        str(tmp_path / "out"),
        RunConfig("se1", n_buckets=4, buckets_per_commit=2, stage_input=True),
    )
    summary = run.run()
    assert summary["buckets_done"] == 4 and summary["n_docs"] == 0
    # and resume stays a no-op, not a crash
    assert ExtractionRun(
        spark,
        empty,
        str(tmp_path / "out"),
        RunConfig("se1", n_buckets=4, buckets_per_commit=2, stage_input=True),
    ).run()["n_docs"] == 0


def test_checksum_lineage_and_verify_output(spark, docs, tmp_path):
    """checksum_output records a per-bucket content checksum; a
    clean table verifies, a tampered bucket is flagged, and the
    checksum is identical between a crash-resume run and a
    single-shot run (order-insensitive: partitioning/attempt
    boundaries can't move it)."""
    run = ExtractionRun(
        spark, docs, str(tmp_path / "out"),
        RunConfig("rc", n_buckets=4, checksum_output=True),
    )
    run.run()
    recs = {}
    for b in range(4):
        with open(f"{tmp_path}/out/_lineage/rc/bucket-{b:05d}.json") as f:
            recs[b] = json.load(f)
    assert all("checksum60" in r for r in recs.values())
    assert all(0 <= r["checksum60"] < (1 << 60) for r in recs.values())
    assert run.verify_output() == []

    # crash-resume run over the same docs: same per-bucket checksums
    run2 = ExtractionRun(
        spark, docs, str(tmp_path / "out2"),
        RunConfig("rc2", n_buckets=4, buckets_per_commit=1, checksum_output=True),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        run2.run(fail_after_groups=2)
    run2.run()
    for b in range(4):
        with open(f"{tmp_path}/out2/_lineage/rc2/bucket-{b:05d}.json") as f:
            assert json.load(f)["checksum60"] == recs[b]["checksum60"]

    # tamper: rewrite one bucket's partition with a doc dropped
    victim = next(b for b, r in recs.items() if r["n_docs"] > 1)
    part = f"{tmp_path}/out/bucket={victim}"
    kept = spark.read.parquet(part)
    drop_id = kept.select("doc_id").orderBy("doc_id").first().doc_id
    tampered = kept.where(F.col("doc_id") != drop_id).collect()
    import shutil

    shutil.rmtree(part)
    spark.createDataFrame(tampered, kept.schema).write.parquet(part)
    assert run.verify_output() == [victim]


def test_verify_output_skips_records_without_checksums(spark, docs, tmp_path):
    run = ExtractionRun(
        spark, docs, str(tmp_path / "out"), RunConfig("rn", n_buckets=4)
    )
    run.run()
    assert run.verify_output() == []  # nothing auditable, not a failure
