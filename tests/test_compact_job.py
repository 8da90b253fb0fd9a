"""Small-files compaction job: metadata-only planning, bucket-scoped
rewrite, row-identical before/after."""

from __future__ import annotations

import glob
import json
import os
import sys
from unittest.mock import patch

from pyspark.sql import SparkSession

from ocr_spark.pipeline.sinks import write_results


def _bucket_files(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("bucket="):
            out[d] = sorted(glob.glob(f"{path}/{d}/*.parquet"))
    return out


def _fragmented_table(spark, path, batches=6, rows=40):
    """Append several micro-batches → many small files per bucket."""
    for b in range(batches):
        df = spark.range(b * rows, (b + 1) * rows).selectExpr(
            "id AS doc_id", "repeat('x', 50) AS text"
        )
        write_results(df, path, mode="append", n_buckets=4)
    return spark.read.parquet(path)


def _run(path, *extra):
    import jobs.compact as job

    argv = ["compact.py", "--path", path, "--target-mb", "128", *extra]
    printed = []
    with patch.object(sys, "argv", argv), patch.object(
        SparkSession, "stop", lambda self: None
    ), patch("builtins.print", lambda s: printed.append(s)):
        job.main()
    return json.loads(printed[-1])


def test_compaction_merges_without_changing_rows(spark, tmp_path):
    path = str(tmp_path / "table")
    before_df = _fragmented_table(spark, path)
    before_rows = sorted(map(tuple, before_df.collect()))
    files_before = _bucket_files(path)
    assert all(len(fs) >= 6 for fs in files_before.values())  # fragmented

    s = _run(path)
    assert s["rewritten"] and len(s["rewritten"]) == len(s["planned"])
    files_after = _bucket_files(path)
    # every planned bucket collapsed to its ideal file count (1 here:
    # tiny data, 128 MB target) — and the table is row-identical
    for p in s["planned"]:
        assert len(files_after[p["bucket"]]) == p["ideal_files"] == 1
    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows


def test_compaction_is_idempotent_and_skips_clean_buckets(spark, tmp_path):
    path = str(tmp_path / "table")
    _fragmented_table(spark, path)
    s1 = _run(path)
    assert s1["rewritten"]
    # second run: nothing left to do — already at ideal layout
    s2 = _run(path)
    assert s2["planned"] == [] and s2["rewritten"] == []


def test_dry_run_touches_nothing(spark, tmp_path):
    path = str(tmp_path / "table")
    _fragmented_table(spark, path)
    before = _bucket_files(path)
    s = _run(path, "--dry-run")
    assert s["planned"] and s["rewritten"] == [] and s["dry_run"]
    assert _bucket_files(path) == before
