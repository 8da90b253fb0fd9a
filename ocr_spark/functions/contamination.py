"""Benchmark decontamination: flag training documents sharing w-gram
shingles with a benchmark/eval set (the GPT-3/Llama "13-gram overlap"
check).

Scale shape (the only one that survives 100 TB):

- per-document shingle sets are deduplicated INSIDE the array
  (``array_distinct``) before exploding — no distinct-shuffle over the
  exploded corpus;
- shingles are folded to the portable 60-bit md5 hash, so the join key
  is uniform (no hot shingle key) and fixed-width;
- the benchmark side is tiny by definition (an eval set, not a
  corpus): its distinct hash set is BROADCAST, so the corpus-side scan
  never shuffles — the only Exchange is the final per-doc count
  aggregation, with map-side partials.

Emits only documents with at least one overlapping shingle (the
removal worklist); ``contaminated`` flags those at/over
``min_overlap``. Hash collisions (2^-60 per pair) can only ADD a
spurious overlap; the DuckDB twin hashes identically, so the gate
compares like for like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.dedup import shingles_expr, shingles_sql
from ocr_spark.functions.hashing import md5_long_expr, md5_long_sql

CONTAM_W = 13  # the standard decontamination n-gram width
MIN_OVERLAP = 2


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for every doc in ``docs``
    sharing >=1 distinct w-gram with ``benchmark``.

    Pass ``broadcast_benchmark=False`` only if the benchmark side is
    genuinely too large to broadcast (rare); the join then falls back
    to a shuffle on the uniform 60-bit hash key.
    """
    dsh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(shingles_expr(w)))).alias("sh"),
    ).select("doc_id", F.expr(md5_long_expr("sh")).alias("h"))
    bsh = (
        benchmark.select(F.explode(F.expr(shingles_expr(w))).alias("sh"))
        .select(F.expr(md5_long_expr("sh")).alias("h"))
        .distinct()
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    return (
        dsh.join(bsh, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )


def contamination_sql(
    table: str = "documents",
    bench_table: str = "documents",
    w: int = CONTAM_W,
    min_overlap: int = MIN_OVERLAP,
) -> str:
    return f"""
      SELECT dsh.doc_id AS doc_id,
             count(*) AS n_overlap,
             count(*) >= {min_overlap} AS contaminated
      FROM (
        SELECT doc_id, {md5_long_sql('sh')} AS h
        FROM (SELECT doc_id, unnest(list_distinct({shingles_sql(w)})) AS sh
              FROM {table})
      ) dsh
      JOIN (
        SELECT DISTINCT {md5_long_sql('sh')} AS h
        FROM (SELECT unnest({shingles_sql(w)}) AS sh FROM {bench_table})
      ) bsh USING (h)
      GROUP BY dsh.doc_id
    """
