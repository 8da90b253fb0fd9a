"""Bucketed co-located joins: correctness + the zero-Exchange plan
that makes per-doc joins survive 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline.bucketing import colocated_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


from ocr_spark.plans import plan_str as _plan


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("n"))
    dims = docs.select("doc_id", "lang", "source")
    write_bucketed(stats, "b_stats", "doc_id", 8, path=str(tmp_path / "s"))
    write_bucketed(dims, "b_dims", "doc_id", 8, path=str(tmp_path / "d"))
    try:
        joined = colocated_join(spark, "b_stats", "b_dims", "doc_id")
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # both sides pre-bucketed
        assert "Bucketed: true" in _plan(joined, "formatted")
        # and it is the correct join
        assert joined.count() == docs.count()
        bad = joined.join(docs, "doc_id").where(
            (F.col("n") != F.length("text")) | (joined.lang != docs.lang)
        )
        assert bad.count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_stats")
        spark.sql("DROP TABLE IF EXISTS b_dims")


def test_mismatched_bucket_counts_fall_back_to_shuffle(
    spark, tmp_path, no_broadcast
):
    """Sanity check of the mechanism: unequal bucket counts cannot
    co-locate, so at least one side must shuffle — proving the
    zero-Exchange plan above really came from bucketing."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_bucketed(
        docs.select("doc_id", "n_chars"), "b_a", "doc_id", 8,
        path=str(tmp_path / "a"),
    )
    write_bucketed(
        docs.select("doc_id", "lang"), "b_b", "doc_id", 4,
        path=str(tmp_path / "b"),
    )
    try:
        plan = _plan(colocated_join(spark, "b_a", "b_b", "doc_id"), "simple")
        assert "Exchange" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_a")
        spark.sql("DROP TABLE IF EXISTS b_b")
