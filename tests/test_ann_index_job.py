"""Persisted IVF-PQ index: build/search job end-to-end, equality with
the in-memory search, and the partition-pruned probe scan."""

from __future__ import annotations

import json
import os
import sys
from unittest.mock import patch

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ocr_spark.functions.ivf_centroids import TRAINED_CENTROIDS_SF001 as CENTS
from ocr_spark.functions.pq import ivfpq_nprobe_topk, search_ivfpq_index
from ocr_spark.functions.pq_codebooks import PQ_CODEBOOKS_SF001 as CB
from ocr_spark.plans import plan_str

SF_DIR = "/root/testdata/sf0.001"


def _run(argv):
    import jobs.ann_index as job

    printed = []
    with patch.object(sys, "argv", ["ann_index.py", *argv]), patch.object(
        SparkSession, "stop", lambda self: None
    ), patch("builtins.print", lambda s: printed.append(s)):
        job.main()
    return json.loads(printed[-1])


def test_build_then_search_matches_in_memory(spark, tmp_path):
    emb = f"{SF_DIR}/embeddings.parquet"
    idx_dir = str(tmp_path / "idx")
    b = _run(["--build", "--input", emb, "--index", idx_dir, "--master", "local[4]"])
    n = spark.read.parquet(emb).count()
    assert b["n_vectors"] == n and 1 < b["n_cells"] <= len(CENTS)
    # centroid-partitioned layout on disk
    assert any(d.startswith("centroid=") for d in os.listdir(idx_dir))
    # queries = the first 5 corpus vectors -> stored-index search must
    # equal the in-memory nprobe search exactly
    qdir = str(tmp_path / "q")
    spark.read.parquet(emb).where(F.col("vec_id") < 5).write.parquet(qdir)
    out_dir = str(tmp_path / "hits")
    s = _run(
        ["--search", "--index", idx_dir, "--queries", qdir, "--output", out_dir,
         "--nprobe", "2", "--master", "local[4]"]
    )
    assert s["n_queries"] == 5
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(
        map(
            tuple,
            ivfpq_nprobe_topk(
                spark.read.parquet(emb), CENTS, CB, nprobe=2
            ).collect(),
        )
    )
    assert got == want and s["n_results"] == len(got) > 0


def test_search_scan_is_partition_pruned(spark, tmp_path):
    from ocr_spark.functions.pq import build_ivfpq_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx_dir = str(tmp_path / "idx")
    build_ivfpq_index(emb, CENTS, CB).write.partitionBy("centroid").parquet(idx_dir)
    hits = search_ivfpq_index(
        spark.read.parquet(idx_dir),
        emb.where(F.col("vec_id") < 2),
        CENTS,
        CB,
        nprobe=1,
    )
    plan = plan_str(hits, "formatted")
    # the index scan carries a non-empty centroid partition filter
    # (the whole point of the centroid-partitioned layout)
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("centroid" in f for f in filters), plan


def test_search_arg_validation(spark, tmp_path):
    import pytest as _pt

    with _pt.raises(SystemExit):
        _run(["--build", "--index", str(tmp_path / "x")])  # missing --input
    with _pt.raises(SystemExit):
        _run(["--search", "--index", str(tmp_path / "x")])  # missing queries/output
