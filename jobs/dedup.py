#!/usr/bin/env python3
"""spark-submit entry: end-to-end corpus deduplication.

The standard training-data pipeline composition:
1. exact pass — hash-groupBy on content, keep the lowest doc_id per
   distinct text (one uniform-key shuffle);
2. near-dup pass — MinHash+LSH candidates over the exact survivors
   (band buckets capped at --max-bucket so boilerplate-identical
   buckets can't emit B^2 pairs), exact n-gram-Jaccard verification of
   ONLY the candidates, connected components, keep each cluster's
   representative;
3. write the keep-list (doc_id) + print a summary JSON line.

No stage scans an all-corpus pair space — this is the composition the
dedup module docstring prescribes for production corpora.

Example:
  spark-submit --py-files dist/ocr_spark.zip jobs/dedup.py \\
    --input /data/documents.parquet --output /out/keep_list \\
    --tau 0.5 --max-bucket 1000
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True, help="keep-list output dir")
    ap.add_argument("--tau", type=float, default=0.5, help="jaccard threshold")
    ap.add_argument(
        "--max-bucket",
        type=int,
        default=1000,
        help="drop LSH band buckets larger than this (boilerplate guard); 0 = no cap",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.functions.dedup import dup_clusters, exact_dedup
    from ocr_spark.pipeline.session import get_spark

    spark = get_spark(args.master, app_name="ocr_spark_dedup")
    # doc_id rides through AS-IS: the operator layer is id-type-agnostic
    # (int or string 'sha1:...' both work). The old cast("long") here
    # NULLed every string id and silently emptied the keep-list.
    docs = spark.read.parquet(args.input).select("doc_id", "text")
    n_in = docs.count()

    # 1. exact: keep rep_doc_id per distinct text. Survivors feed the
    # count, the near-dup pass AND the final anti-join — persist so the
    # exact-dedup shuffle runs once, not three times.
    reps = exact_dedup(docs).select(F.col("rep_doc_id").alias("doc_id"))
    survivors = docs.join(reps, "doc_id").persist()
    n_exact = survivors.count()

    # 2. near-dup: drop cluster members that are not the representative
    clusters = dup_clusters(
        survivors, tau=args.tau, max_bucket=args.max_bucket or None
    )
    losers = clusters.where(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    keep = survivors.join(losers, "doc_id", "left_anti").select("doc_id")
    n_keep = keep.count()

    keep.write.mode("overwrite").parquet(args.output)
    survivors.unpersist()
    print(
        json.dumps(
            {
                "n_input": n_in,
                "n_after_exact": n_exact,
                "n_keep": n_keep,
                "exact_dups_removed": n_in - n_exact,
                "near_dups_removed": n_exact - n_keep,
                "tau": args.tau,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
