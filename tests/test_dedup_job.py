"""End-to-end corpus dedup job: exact pass + near-dup cluster pass."""

from __future__ import annotations

import json
import sys
from unittest.mock import patch

import pandas as pd
from pyspark.sql import SparkSession


def test_dedup_job(spark, tmp_path, capsys):
    words = [f"w{i:02d}" for i in range(40)]
    base = " ".join(words)
    near = " ".join(words[:39] + ["CHANGED"])
    distinct = " ".join(f"z{i:02d}" for i in range(40))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [base, base, near, distinct, distinct],
        }
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "keep")
    spark.createDataFrame(df).write.parquet(inp)

    sys.path.insert(0, "/root/repo/jobs")
    import dedup as job

    argv = ["dedup.py", "--input", inp, "--output", out, "--tau", "0.5"]
    # the CLI stops its session on exit; keep the shared test session alive
    with patch.object(sys, "argv", argv), patch.object(SparkSession, "stop", lambda self: None):
        job.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # exact: 2 (dup of 1) and 5 (dup of 4) removed; near: 3 clusters
    # with 1 (jaccard ~0.91) -> removed; keep = {1, 4}
    assert summary["n_input"] == 5
    assert summary["n_after_exact"] == 3
    assert summary["n_keep"] == 2

    from ocr_spark.pipeline.session import get_spark

    s = get_spark("local[4]")
    keep = sorted(r.doc_id for r in s.read.parquet(out).collect())
    assert keep == [1, 4]


def test_dedup_job_string_ids(spark, tmp_path, capsys):
    """'sha1:...' ids must survive the whole job — the round-2 long
    cast NULLed them and printed a silently-empty keep-list."""
    words = [f"w{i:02d}" for i in range(40)]
    base = " ".join(words)
    near = " ".join(words[:39] + ["CHANGED"])
    distinct = " ".join(f"z{i:02d}" for i in range(40))
    ids = [f"sha1:{i:040x}" for i in range(1, 6)]
    df = pd.DataFrame({"doc_id": ids, "text": [base, base, near, distinct, distinct]})
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "keep")
    spark.createDataFrame(df).write.parquet(inp)

    sys.path.insert(0, "/root/repo/jobs")
    import dedup as job

    argv = ["dedup.py", "--input", inp, "--output", out, "--tau", "0.5"]
    with patch.object(sys, "argv", argv), patch.object(SparkSession, "stop", lambda self: None):
        job.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_input"] == 5
    assert summary["n_after_exact"] == 3
    assert summary["n_keep"] == 2

    from ocr_spark.pipeline.session import get_spark

    s = get_spark("local[4]")
    keep = sorted(r.doc_id for r in s.read.parquet(out).collect())
    assert keep == [ids[0], ids[3]]


def test_batch_cli_job(spark, tmp_path, capsys):
    import shutil

    src = str(tmp_path / "tree" / "nested")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        100
    ).write.parquet(src)
    out = str(tmp_path / "out")

    sys.path.insert(0, "/root/repo/jobs")
    import batch_cli as job

    argv = ["batch_cli.py", "--input", str(tmp_path / "tree"), "--glob",
            "*.parquet", "--output", out, "--synthesize"]
    with patch.object(sys, "argv", argv), patch.object(SparkSession, "stop", lambda self: None):
        job.main()
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["total_files"] == 100
    assert meta["parse_failures"] == 0
    assert 0.0 < meta["strip_ratio"] < 1.0

    from ocr_spark.pipeline.session import get_spark

    s = get_spark("local[4]")
    assert s.read.parquet(f"{out}/spans").count() == meta["n_spans_out"]
    env = json.load(open(f"{out}/parsing_results.json"))
    assert env["meta"]["total_files"] == 100
    assert len(env["documents"]) == 100
