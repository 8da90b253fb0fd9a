"""Corpus health report job: table shapes, drift wiring, alerting
summary."""

from __future__ import annotations

import json
import sys
from unittest.mock import patch

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, tmp_path, extra_args=()):
    import jobs.report as job

    out = str(tmp_path / "report")
    argv = [
        "report.py",
        "--docs", f"{SF_DIR}/documents.parquet",
        "--output", out,
        *extra_args,
    ]
    printed = []
    with patch.object(sys, "argv", argv), patch.object(
        SparkSession, "stop", lambda self: None
    ), patch("builtins.print", lambda s: printed.append(s)):
        job.main()
    return out, json.loads(printed[-1])


def test_report_tables_and_counts(spark, tmp_path):
    out, s = _run(spark, tmp_path)
    assert set(s["rows"]) == {
        "source_stats",
        "length_sketch",
        "length_quantiles",
        "lang_mix",
        "quality",
        "source_overlap",
        "checksum",
        "encoding",
        "scripts",
    }
    stats = spark.read.parquet(f"{out}/source_stats")
    assert stats.count() == 20  # one row per source
    assert stats.where("n_docs != 25").count() == 0
    assert stats.where("n_tokens <= 0").count() == 0
    qs = {r.q_permille: r.est for r in spark.read.parquet(f"{out}/length_quantiles").collect()}
    assert set(qs) == {500, 900, 990}
    assert 0 < qs[500] <= qs[900] <= qs[990]
    quality = spark.read.parquet(f"{out}/quality")
    assert quality.count() == 20
    assert quality.where(
        (F.col("mean_quality") < 0) | (F.col("mean_quality") > 1)
    ).count() == 0
    overlap = spark.read.parquet(f"{out}/source_overlap")
    assert overlap.count() == 190  # C(20, 2) pairs, zeros included
    assert overlap.where(
        (F.col("est_jaccard_permille") < 0)
        | (F.col("est_jaccard_permille") > 1000)
    ).count() == 0


def test_report_drift_against_previous(spark, tmp_path):
    """--previous adds the drift table; a shifted previous snapshot
    (half the docs) drifts > 0 for every source, and the summary
    carries the max for alerting."""
    prev_dir = str(tmp_path / "prev.parquet")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        "doc_id < 250"
    ).write.parquet(prev_dir)
    out, s = _run(spark, tmp_path, ("--previous", prev_dir))
    drift = spark.read.parquet(f"{out}/drift")
    assert drift.count() == 20
    assert drift.where("l1_scaled <= 0").count() == 0
    assert s["max_drift"]["l1_scaled"] == (
        drift.agg(F.max("l1_scaled")).collect()[0][0]
    )


def test_report_sketch_is_mergeable_artifact(spark, tmp_path):
    """The persisted length_sketch is the raw mergeable bin table:
    merging it with itself doubles every count (cell addition)."""
    from ocr_spark.functions.sketches import hist_sketch_merge

    out, _ = _run(spark, tmp_path)
    sk = spark.read.parquet(f"{out}/length_sketch")
    doubled = hist_sketch_merge(sk.unionByName(sk))
    joined = sk.alias("a").join(doubled.alias("b"), "bin")
    assert joined.where(F.expr("b.n != 2 * a.n")).count() == 0


def test_report_bpe_token_stats(spark, tmp_path):
    from ocr_spark.functions.bpe import bpe_doc_token_counts
    from ocr_spark.functions.bpe_merges import MERGES

    out, s = _run(spark, tmp_path, ["--bpe-tokens", "--master", "local[4]"])
    assert "bpe_token_stats" in s["rows"]
    t = spark.read.parquet(f"{out}/bpe_token_stats")
    got = {r["source"]: (r["n_bpe_tokens"], r["n_docs"]) for r in t.collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F

    want = {
        r["source"]: (r["t"], r["n"])
        for r in bpe_doc_token_counts(docs, MERGES)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_bpe_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 1


def test_report_encoding_and_scripts_tables(spark, tmp_path):
    out, s = _run(spark, tmp_path)
    enc = spark.read.parquet(f"{out}/encoding")
    assert enc.count() == 20  # one row per source
    # synthetic corpus is clean ASCII: zero damage everywhere
    assert enc.where(
        (F.col("n_suspect") != 0)
        | (F.col("n_replacement") != 0)
        | (F.col("n_mojibake") != 0)
        | (F.col("n_ctrl") != 0)
    ).count() == 0
    scripts = spark.read.parquet(f"{out}/scripts")
    # per (source, script) counts partition the corpus
    assert scripts.agg(F.sum("n_docs")).collect()[0][0] == 500
    assert {r.script for r in scripts.select("script").distinct().collect()} \
        <= {"latin", "none"}


def test_report_duplication_and_fertility_tables(spark, tmp_path):
    out, s = _run(spark, tmp_path, ("--bpe-tokens", "--duplication"))
    dup = spark.read.parquet(f"{out}/duplication")
    assert dup.count() == 20
    assert dup.where(
        (F.col("mean_dup_ppm") < -1) | (F.col("mean_dup_ppm") > 1_000_000)
    ).count() == 0
    assert dup.where(
        F.col("n_measured") + F.col("n_windowless") != 25
    ).count() == 0  # partitioned per source
    fert = spark.read.parquet(f"{out}/fertility")
    assert fert.count() >= 1
    assert fert.where(F.col("fertility_ppm") < 1_000_000).count() == 0
    # non-vacuous: at least one language actually measured (an
    # all-NULL fertility column would pass the filter above)
    assert fert.where(F.col("fertility_ppm").isNotNull()).count() >= 1
    # one encode pass serves both tables: totals must reconcile
    bpe = spark.read.parquet(f"{out}/bpe_token_stats")
    assert (
        bpe.agg(F.sum("n_bpe_tokens")).collect()[0][0]
        == fert.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )


def test_report_diversity_table(spark, tmp_path):
    out, s = _run(spark, tmp_path, ("--diversity",))
    assert "diversity" in s["rows"]
    div = spark.read.parquet(f"{out}/diversity")
    assert div.count() == 20  # one row per source
    assert div.where(
        (F.col("diversity_ppm") <= 0) | (F.col("diversity_ppm") > 1_000_000)
    ).count() == 0
    # equals the operator applied directly
    from ocr_spark.functions.text import ngram_diversity

    direct = sorted(
        map(tuple, ngram_diversity(spark.read.parquet(f"{SF_DIR}/documents.parquet")).collect())
    )
    assert sorted(map(tuple, div.collect())) == direct


def test_report_checksum_table_and_corpus_fold(spark, tmp_path):
    """The per-source checksum table matches the DuckDB twin on the
    same parquet, and the summary's corpus_checksum equals the modular
    fold of the per-source rows — so persisted shard audits roll up to
    exactly what a corpus-level audit would compute."""
    import duckdb

    from ocr_spark.functions.audit import table_checksum_sql

    out, s = _run(spark, tmp_path)
    got = {
        r.source: (r.n_rows, r.checksum60)
        for r in spark.read.parquet(f"{out}/checksum").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        src: (n, c)
        for src, n, c in con.execute(table_checksum_sql()).fetchall()
    }
    assert got == want
    fold = sum(c for _, c in got.values()) % (1 << 60)
    assert s["corpus_checksum"]["checksum60"] == fold
    assert s["corpus_checksum"]["n_rows"] == sum(n for n, _ in got.values())


def test_report_skew_table(spark, tmp_path):
    out, s = _run(spark, tmp_path, ("--skew-key", "source"))
    assert "skew" in s["rows"]
    skew = spark.read.parquet(f"{out}/skew")
    # 20 synth sources -> one row each, ranks dense from 1
    assert sorted(r.rank for r in skew.collect()) == list(range(1, 21))
    from ocr_spark.functions.skew import key_skew_stats

    direct = sorted(map(tuple, key_skew_stats(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        "source", top_k=20).collect()))
    assert sorted(map(tuple, skew.collect())) == direct
