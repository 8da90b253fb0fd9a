"""S11 writer facade: one interface, Iceberg + parquet backends.

The sandbox ships no Iceberg jar, so the Iceberg branch is covered by
a capability-gated test that skips cleanly when the runtime lacks it
(it runs for real on a cluster with the iceberg-spark-runtime jar) —
the selection logic and the parquet discipline are tested everywhere.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.pipeline.writer import ResultsWriter, iceberg_available


def _df(spark, ids, tag):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [str(i) for i in ids], "payload": [f"{tag}{i}" for i in ids]})
    )


def test_parquet_backend_bucket_layout(spark, tmp_path):
    out = str(tmp_path / "t1")
    w = ResultsWriter(spark, path=out, n_buckets=4)
    w.write(_df(spark, range(40), "a"))
    assert w.backend == "parquet"
    dirs = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert dirs == {f"bucket={k}" for k in range(4)}
    assert w.read().count() == 40


def test_parquet_backend_append_and_replace(spark, tmp_path):
    out = str(tmp_path / "t2")
    w = ResultsWriter(spark, path=out, n_buckets=4)
    w.write(_df(spark, range(10), "a"))
    w.write(_df(spark, range(10, 20), "a"), mode="append")
    assert w.read().count() == 20
    # replace_partitions: only the buckets present in the new frame
    # are overwritten — dynamic partition overwrite discipline
    one = _df(spark, [3], "new")  # lands in exactly one bucket
    w.write(one, mode="replace_partitions")
    got = w.read()
    bucket_of_3 = got.where(F.col("doc_id") == "3").select("bucket").collect()[0][0]
    survivors = got.where(F.col("bucket") != bucket_of_3).count()
    replaced = got.where(F.col("bucket") == bucket_of_3).count()
    assert replaced == 1  # that bucket now holds only the new row
    assert survivors > 0  # other buckets untouched
    assert got.count() == survivors + 1


def test_parquet_overwrite_is_full_replace(spark, tmp_path):
    # mode='overwrite' must match Iceberg createOrReplace: stale
    # buckets from earlier writes are dropped, not left behind
    out = str(tmp_path / "t3")
    w = ResultsWriter(spark, path=out, n_buckets=8)
    w.write(_df(spark, range(40), "old"))  # populates all 8 buckets
    w.write(_df(spark, [1], "new"))  # one doc -> one bucket
    got = w.read().collect()
    assert len(got) == 1 and got[0].payload == "new1"


def test_target_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        ResultsWriter(spark)
    with pytest.raises(ValueError):
        ResultsWriter(spark, path="x", table="c.d.t")
    # an unconfigured catalog must fail fast, not mid-write
    with pytest.raises(RuntimeError, match="catalog"):
        ResultsWriter(spark, table="nosuch.db.t")
    w = ResultsWriter(spark, path=str(tmp_path / "v"))
    with pytest.raises(ValueError):
        w.write(_df(spark, [1], "a"), mode="truncate")


def test_iceberg_write_shape_pinned(spark):
    """Shape verification of the Iceberg branch WITHOUT the jar: the
    DataFrameWriterV2 the production write commits with is built lazily
    (no catalog touched until the action), so we can pin the transform
    list it carries — the exact `bucket(N, doc_id)` partitioning a real
    cluster's createOrReplace would snapshot — via the JVM builder's
    own state, plus the equivalent DDL string."""
    w = ResultsWriter(
        spark, table="prod.db.results", n_buckets=16, check_catalog=False
    )
    df = _df(spark, range(4), "a")
    jw = w.iceberg_writer(df)._jwriter
    fld = jw.getClass().getDeclaredField("partitioning")
    fld.setAccessible(True)
    assert fld.get(jw).toString() == "Some(List(bucket(16, doc_id)))"
    tbl = jw.getClass().getDeclaredField("tableName")
    tbl.setAccessible(True)
    assert str(tbl.get(jw)) == "List(prod, db, results)"  # parsed identifier
    assert w.ddl(df) == (
        "CREATE TABLE prod.db.results (doc_id string, payload string) "
        "USING iceberg PARTITIONED BY (bucket(16, doc_id))"
    )
    # a custom bucket key/count flows through to the transform
    w2 = ResultsWriter(
        spark, table="prod.db.r2", n_buckets=64, bucket_by="media_ref",
        check_catalog=False,
    )
    df2 = spark.createDataFrame(pd.DataFrame({"media_ref": ["x"]}))
    jw2 = w2.iceberg_writer(df2)._jwriter
    assert fld.get(jw2) is not None
    f2 = jw2.getClass().getDeclaredField("partitioning")
    f2.setAccessible(True)
    assert f2.get(jw2).toString() == "Some(List(bucket(64, media_ref)))"
    # write() on the unchecked instance still fails fast at catalog
    # resolution (never a partial write)
    with pytest.raises(Exception):
        w.write(df)


def test_iceberg_backend_roundtrip(spark, tmp_path):
    """Runs only where the Iceberg runtime is on the classpath (a real
    cluster); skips cleanly in the sandbox."""
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    if not iceberg_available(spark, "it"):
        pytest.skip("Iceberg runtime not on the classpath")
    w = ResultsWriter(spark, table="it.db.results", n_buckets=4)
    w.write(_df(spark, range(20), "a"))
    assert w.read().count() == 20
    w.write(_df(spark, range(20, 30), "a"), mode="append")
    assert w.read().count() == 30
    w.write(_df(spark, [5], "new"), mode="replace_partitions")
    assert w.read().where("payload = 'new5'").count() == 1
