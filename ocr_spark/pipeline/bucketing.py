"""Bucketed tables: co-located joins with no shuffle at read time.

The single biggest cost of a 100 TB per-doc join (extraction output x
metrics x media table, all keyed doc_id) is the shuffle of BOTH sides.
Bucketing pre-shuffles ONCE at write time: every table written with
the same (key, n_buckets) lays its rows out so bucket i of table A
only ever joins bucket i of table B — Catalyst then plans a
SortMergeJoin with ZERO Exchange. (A per-bucket in-memory Sort
remains: Spark 3+ deliberately ignores write-time ``sortBy`` order at
read time — multi-bucket-per-task reads would break it — so the sort
is per-partition and cheap, while the expensive network shuffle is
the part bucketing removes.)

Backend mapping:
- sandbox / Hive-layout: ``df.write.bucketBy(N, key).sortBy(key)
  .saveAsTable(...)`` (datasource bucketing, used here);
- Iceberg production: ``partitionedBy(bucket(N, key))`` (already the
  ResultsWriter layout) + storage-partitioned joins
  (``spark.sql.sources.v2.bucketing.enabled``) give the identical
  no-shuffle plan on the cluster sink.

Rules that make co-location actually kick in (encoded in the test):
equal bucket counts on both sides, join keys = bucket keys, and the
broadcast threshold not hijacking the plan (a broadcast join is fine
too — but the point of bucketing is the case where BOTH sides are too
big to broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) table.
    ``path`` makes it external — data lands there, only metadata in
    the session catalog."""
    if sort:
        # one file per bucket: readers only trust write-time sort
        # order when a bucket is a single file (multi-file buckets are
        # concatenated, breaking order), so pre-partition on the
        # bucket hash — repartition and bucketBy share the same
        # murmur3 pmod, making the shuffle and the layout coincide
        df = df.repartition(n_buckets, F.col(key))
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left: str,
    right: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts Catalyst plans this shuffle-free; plan-assert with
    ``"Exchange" not in ocr_spark.plans.plan_str(df, "simple")``
    (``df.explain()`` prints and returns None — it can't back an
    assertion)."""
    return spark.table(left).join(spark.table(right), key, how)
