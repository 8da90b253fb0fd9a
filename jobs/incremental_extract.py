#!/usr/bin/env python3
"""spark-submit entry: daily INCREMENTAL extraction over a huge
corpus — only new/changed docs reach the kernel; unchanged results
carry forward from the previous published table; deleted docs drop.

The daily-ingest loop at 10^12 docs:

  day 0:  incremental_extract.py --input day0_spans --output out0 \\
            --state state        # no prior state: full extraction
  day N:  incremental_extract.py --input dayN_spans --output outN \\
            --state state --prev out{N-1}

State = one narrow (doc_id, input_hash) parquet (36 B/doc — a
trillion-doc corpus's state is ~40 TB of 100 TB+ span data never
rescanned). The published output always equals a full re-extraction
of today's corpus (the operator-level invariant, oracle-pinned by the
``incremental_extract`` contract query); only the changed fraction
pays kernel compute. State is published atomically AFTER the output
commit succeeds (crash between the two => the next run re-extracts
the delta again — idempotent, never wrong).

Reference analog: none (the reference re-parses every file per run,
/root/reference/pipeline.py:533); this is the beyond-reference daily
production shape (SURVEY.md §7.2).
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="today's span-table parquet")
    ap.add_argument(
        "--synthesize", action="store_true",
        help="input is a flat documents table; synthesize spans (sandbox)",
    )
    ap.add_argument("--output", required=True, help="extraction output dir")
    ap.add_argument(
        "--state", required=True,
        help="hash-state dir; read if present, atomically republished",
    )
    ap.add_argument(
        "--prev", default=None,
        help="previous run's output table (required when state exists)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.pipeline.extract import (
        doc_input_hash,
        extract_main_content,
        incremental_extract,
    )
    from ocr_spark.pipeline.session import get_spark
    from ocr_spark.sources.synth import synthesize_spans

    spark = get_spark(args.master, app_name="ocr_spark_incremental_extract")
    docs = spark.read.parquet(args.input)
    if args.synthesize:
        docs = synthesize_spans(docs)

    hashes_path = args.state.rstrip("/") + "/hashes"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(hashes_path)  # type: ignore[union-attr]
    jold = jvm.org.apache.hadoop.fs.Path(hashes_path + "._old")  # type: ignore[union-attr]
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    has_state = fs.exists(jpath)
    if not has_state and fs.exists(jold):
        # crash landed between the publish renames (live state moved
        # aside, new state not yet renamed in): the aside copy is the
        # complete previous state — recover it so this run stays
        # incremental instead of silently re-extracting the full corpus
        fs.rename(jold, jpath)
        has_state = True

    if has_state:
        if args.prev is None:
            raise SystemExit(
                "--prev is required when state exists: carried-forward "
                "rows come from the previous output table"
            )
        prev_hashes = spark.read.parquet(hashes_path)
        prev_out = spark.read.parquet(args.prev).select(
            "doc_id", "kind", "text", "media_ref", "offset"
        )
        out = incremental_extract(docs, prev_hashes, prev_out)
    else:
        out = extract_main_content(docs).withColumn("recomputed", F.lit(1))
    out.write.mode("overwrite").parquet(args.output)

    # counts from the COMMITTED table (one cheap read-back; counting
    # `out` would re-execute the kernel), then publish today's state
    # atomically: write beside, rename over — a crash before the
    # rename leaves yesterday's state, and the next run re-extracts
    # the same delta (idempotent)
    committed = spark.read.parquet(args.output)
    n_docs = committed.select("doc_id").distinct().count()
    n_recomputed = (
        committed.where("recomputed = 1").select("doc_id").distinct().count()
    )
    tmp_path = hashes_path + "._tmp"
    doc_input_hash(docs).write.mode("overwrite").parquet(tmp_path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp_path)  # type: ignore[union-attr]
    # two-rename publish, never delete-then-rename: the live state is
    # moved ASIDE (not deleted) before the new state renames in, so no
    # crash point loses state entirely — a crash between the renames
    # leaves the complete aside copy, which the read path above
    # recovers. Only after the new state is live is the aside removed.
    if fs.exists(jold):
        fs.delete(jold, True)  # leftover aside from a prior crash
    if fs.exists(jpath):
        fs.rename(jpath, jold)
    fs.rename(jtmp, jpath)
    if fs.exists(jold):
        fs.delete(jold, True)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_recomputed_docs": n_recomputed,
                "n_carried_docs": n_docs - n_recomputed,
                "had_state": bool(has_state),
                "n_span_rows": committed.count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
