#!/usr/bin/env python3
"""spark-submit entry: build and probe a persisted IVF-PQ ANN index.

The stored-artifact shape of the repo's ANN family (the similarity
module's in-memory paths made durable, the way jobs/dedup.py persists
the MinHash band index):

build mode (--build):
  read the embeddings table, assign every vector to its trained
  coarse cell and PQ-encode it in ONE scan, and write
  (vec_id, centroid, codes) partitioned by centroid. Raw vectors are
  NOT stored — the index is the codes (~32x smaller), which is the
  entire point of PQ at 10^12-vector scale.

search mode (--search):
  read a raw query batch (vec_id, embedding), rank each query's
  top --nprobe cells, and probe ONLY those cells' partitions — the
  probe-cell union is collected driver-side (a query batch is tiny)
  and applied as a partition filter, so the scan reads nprobe/k of
  the index files and never the corpus-sized remainder. PQ asymmetric
  distance (per-query distance tables, per-candidate array lookups)
  ranks the candidates.

Coarse centroids and PQ codebooks are the repo's baked sample-trained
artifacts (retrain with scripts/train_ivf_centroids.py /
scripts/train_pq_codebooks.py and rebuild the index when the corpus
distribution shifts — the index layout is versioned by its artifacts,
like any FAISS deployment).

Examples:
  spark-submit --py-files dist/ocr_spark.zip jobs/ann_index.py \\
    --build --input /data/embeddings.parquet --index /out/ivfpq
  spark-submit ... jobs/ann_index.py \\
    --search --index /out/ivfpq --queries /data/queries.parquet \\
    --output /out/hits --nprobe 2 --k 10
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--build", action="store_true")
    mode.add_argument("--search", action="store_true")
    ap.add_argument("--input", help="embeddings parquet (vec_id, embedding) for --build")
    ap.add_argument("--index", required=True, help="index dir (centroid-partitioned)")
    ap.add_argument("--queries", help="query parquet (vec_id, embedding) for --search")
    ap.add_argument("--output", help="search-results output dir for --search")
    ap.add_argument("--nprobe", type=int, default=1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.build and not args.input:
        ap.error("--build requires --input")
    if args.search and not (args.queries and args.output):
        ap.error("--search requires --queries and --output")

    from pyspark.sql import functions as F

    from ocr_spark.functions.ivf_centroids import TRAINED_CENTROIDS_SF001 as CENTS
    from ocr_spark.functions.pq import build_ivfpq_index, search_ivfpq_index
    from ocr_spark.functions.pq_codebooks import PQ_CODEBOOKS_SF001 as CB
    from ocr_spark.pipeline.session import get_spark

    if not 1 <= args.nprobe <= len(CENTS):
        ap.error(f"--nprobe must be in [1, {len(CENTS)}]")

    spark = get_spark(args.master or "local[*]", app_name="ocr_spark_ann_index")

    if args.build:
        idx = build_ivfpq_index(spark.read.parquet(args.input), CENTS, CB)
        idx.write.mode("overwrite").partitionBy("centroid").parquet(args.index)
        stats = (
            spark.read.parquet(args.index)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("centroid").alias("cells"),
            )
            .collect()[0]
        )
        print(
            json.dumps(
                {
                    "mode": "build",
                    "n_vectors": stats.n,
                    "n_cells": stats.cells,
                    "index": args.index,
                }
            )
        )
    else:
        index = spark.read.parquet(args.index)
        queries = spark.read.parquet(args.queries)
        hits = search_ivfpq_index(
            index, queries, CENTS, CB, nprobe=args.nprobe, k=args.k
        )
        hits.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        print(
            json.dumps(
                {
                    "mode": "search",
                    "n_queries": out.select("query_id").distinct().count(),
                    "n_results": out.count(),
                    "nprobe": args.nprobe,
                    "k": args.k,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
