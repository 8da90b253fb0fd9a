#!/usr/bin/env python3
"""spark-submit entry: corpus health / drift report.

The monitoring face of the engine: the job a corpus owner schedules
after every crawl or curation run to answer "did the corpus change in
a way I should look at?" — one submission, each table written as
parquet under --output/<name>:

- source_stats   : per-source doc count, token total, distinct langs,
                   null/empty-text count (one partial-agg pass)
- length_sketch  : the mergeable HDR-histogram quantile sketch of doc
                   length (persist it; next run merges or compares
                   without rescanning history — functions/sketches.py)
- length_quantiles: nearest-rank p50/p90/p99 estimates off the sketch
- lang_mix       : per-source x predicted-lang counts (lang_id)
- drift          : per-source L1 distance of the hashed-bigram
                   distribution vs --previous (functions/dsir.py);
                   only with --previous — first runs have no baseline
- quality        : per-source mean quality_score + Gopher keep-rate
- encoding       : per-source encoding-damage totals (mojibake /
                   replacement / control chars) + suspect-doc count
                   (functions/unicode_norm.py)
- scripts        : per-source x dominant-writing-system doc counts
                   (functions/text.py script_profile)
- diversity      : (--diversity) per-source distinct-bigram share of
                   all bigram occurrences in integer ppm
                   (functions/text.py ngram_diversity) — the
                   templatedness monitor; a falling diversity_ppm
                   after a crawl = a template farm or mirror entered
                   the source. Opt-in like --duplication: a full
                   bigram explode + exact distinct aggregate
- duplication    : (--duplication) per-source mean shared-window
                   fraction + windowless count (functions/scrub.py
                   duplication_profile) — the boilerplate/mirror-mass
                   monitor; opt-in, it is the job's heaviest pass
- fertility      : (--bpe-tokens) BPE tokens per whitespace word per
                   detected language (functions/bpe.py) — tokenizer
                   equity under the baked trained merges
- source_overlap : bottom-k-sketch estimated content Jaccard for every
                   source pair (mirror/repackage detection,
                   functions/sketches.py) — one corpus pass, exact
                   integer estimates
- checksum       : per-source order-insensitive content checksum
                   (functions/audit.py modular 60-bit sum) — persist
                   it and the next run byte-audits each source by
                   integer compare; the summary line carries the
                   corpus-level fold
- bpe_token_stats: (--bpe-tokens) per-source token totals under the
                   baked TRAINED tokenizer (functions/bpe.py) — the
                   budget number mixture/packing planning uses, where
                   source_stats.n_tokens is the whitespace heuristic

Every table is a single declarative plan (no collect loops); the job
prints one JSON summary line with row counts, and — when --previous
is given — the max per-source drift so an alerting wrapper can
threshold on it (the l1 scale: 0 identical .. 2,000,000 disjoint;
exact integers, cluster- and engine-independent).

Example:
  spark-submit --py-files dist/ocr_spark.zip jobs/report.py \\
    --docs /data/crawl_2026_08_19.parquet \\
    --previous /data/crawl_2026_08_12.parquet \\
    --output /out/report
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="current snapshot parquet")
    ap.add_argument(
        "--previous",
        default=None,
        help="previous snapshot parquet for the drift table (optional)",
    )
    ap.add_argument("--output", required=True, help="output root dir")
    ap.add_argument("--group-col", default="source")
    ap.add_argument(
        "--diversity",
        action="store_true",
        help="also write the per-source bigram-diversity table (full "
        "bigram explode + exact distinct aggregate — the "
        "templatedness monitor; use the HLL sketch variant at scale)",
    )
    ap.add_argument(
        "--duplication",
        action="store_true",
        help="also write the per-source duplication table (per-char "
        "anchored window hashing — the job's heaviest pass; opt-in "
        "like --bpe-tokens)",
    )
    ap.add_argument(
        "--bpe-tokens",
        action="store_true",
        help="also write bpe_token_stats: per-source token totals "
        "under the baked trained tokenizer (functions/bpe_merges.py)",
    )
    ap.add_argument(
        "--skew-key",
        default=None,
        metavar="SQL",
        help="also write the skew table: top-20 heaviest values of "
        "this key expression with share_ppm and the uniform-mean "
        "multiple (key_skew_stats) — run it on the key of the next "
        "big groupBy/join to size salting BEFORE the shuffle falls "
        "over, not after",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ocr_spark.functions.dsir import corpus_drift
    from ocr_spark.functions.scrub import duplication_profile, gopher_rules
    from ocr_spark.functions.sketches import (
        hist_quantiles,
        hist_sketch_build,
        source_overlap,
    )
    from ocr_spark.functions.text import (
        lang_id,
        ngram_diversity,
        quality_score,
        script_profile,
    )
    from ocr_spark.functions.unicode_norm import encoding_profile
    from ocr_spark.pipeline.session import get_spark
    from ocr_spark.schema import WS

    spark = get_spark(args.master, app_name="ocr_spark_report")
    docs = spark.read.parquet(args.docs)
    g = args.group_col

    n_tokens = F.size(
        F.filter(F.split(F.col("text"), WS + "+"), lambda x: x != "")
    )
    tables = {}
    tables["source_stats"] = docs.groupBy(g).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce(n_tokens, F.lit(0))).alias("n_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            ).otherwise(0)
        ).alias("n_empty"),
    )
    # sketch on the doc-length column the corpus already carries when
    # present; else compute from text (identical binning either way)
    length_col = (
        F.col("n_chars")
        if "n_chars" in docs.columns
        else F.coalesce(F.length("text"), F.lit(0))
    )
    # materialize the ~1.9k-row sketch ONCE: hist_quantiles and the
    # length_sketch parquet write both consume it, and without the
    # checkpoint each would re-run the full corpus scan+bin+aggregate
    sketch = hist_sketch_build(
        docs.select(length_col.alias("v")), "v"
    ).localCheckpoint()
    tables["length_sketch"] = sketch
    tables["length_quantiles"] = hist_quantiles(sketch)
    tables["lang_mix"] = (
        lang_id(docs).join(docs.select("doc_id", g), "doc_id")
        .groupBy(g, "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )
    q = quality_score(docs).select("doc_id", "quality")
    keep = gopher_rules(docs).select("doc_id", "keep")
    tables["quality"] = (
        docs.select("doc_id", g)
        .join(q, "doc_id")
        .join(keep, "doc_id")
        .groupBy(g)
        .agg(
            F.avg("quality").alias("mean_quality"),
            F.avg(F.col("keep").cast("double")).alias("gopher_keep_rate"),
        )
    )
    tables["source_overlap"] = source_overlap(docs, group_col=g)
    # per-source content checksum (functions/audit.py): persist it with
    # the report and the NEXT run answers "did source X's bytes change"
    # by integer comparison — no rescan of history, no sort, no diff.
    # One partial-agg pass over the audited columns.
    from ocr_spark.functions.audit import fold_checksums, table_checksum

    audit_cols = tuple(
        c for c in ("doc_id", "text", "lang", "source") if c in docs.columns
    )
    tables["checksum"] = table_checksum(
        docs, group_cols=(g,), cols=audit_cols
    ).localCheckpoint()
    # corpus templatedness: one bigram explode + a two-stage distinct
    # aggregate on uniform hash keys (far lighter than --duplication's
    # per-char anchors; heavier than the count-only passes — opt-in
    # per the --duplication precedent)
    if args.diversity:
        tables["diversity"] = ngram_diversity(
            docs.select(F.col(g).alias("source"), "text")
        )
    # per-source duplication severity: mean shared-window fraction
    # (docs with windows) + windowless count — rising mean_dup_ppm
    # after a crawl = a boilerplate-heavy or mirrored source. Opt-in:
    # per-char anchored hashing is the job's heaviest pass.
    if args.duplication:
        dup = duplication_profile(docs)
        tables["duplication"] = (
            docs.select("doc_id", g)
            .join(dup, "doc_id")
            .groupBy(g)
            .agg(
                F.sum(
                    F.when(F.col("dup_ppm") >= 0, F.col("dup_ppm")).otherwise(0)
                ).alias("_sum_ppm"),
                F.sum(
                    F.when(F.col("dup_ppm") >= 0, 1).otherwise(0)
                ).alias("_n_measured"),
                F.sum(
                    F.when(F.col("dup_ppm") < 0, 1).otherwise(0)
                ).alias("n_windowless"),
            )
            .selectExpr(
                g,
                "CASE WHEN _n_measured > 0 THEN _sum_ppm div _n_measured"
                " ELSE -1 END AS mean_dup_ppm",
                "_n_measured AS n_measured",
                "n_windowless",
            )
        )
    # encoding damage per source: suspect-doc rate plus the raw signal
    # totals (a jump in any of them after a crawl = decoder bug or a
    # newly-ingested broken mirror — gate before tokenization)
    enc = encoding_profile(docs)
    tables["encoding"] = (
        docs.select("doc_id", g)
        .join(enc, "doc_id")
        .groupBy(g)
        .agg(
            F.sum(F.col("suspect").cast("long")).alias("n_suspect"),
            F.sum("n_replacement").alias("n_replacement"),
            F.sum("n_mojibake").alias("n_mojibake"),
            F.sum("n_ctrl").alias("n_ctrl"),
        )
    )
    # hot-key census under a caller-chosen key expr — the pre-shuffle
    # salting diagnostic, published next to the health tables so a
    # skew regression shows up in the same report as the drift that
    # caused it
    if args.skew_key:
        from ocr_spark.functions.skew import key_skew_stats

        tables["skew"] = key_skew_stats(docs, args.skew_key, top_k=20)
    # writing-system mix per source (the lang_mix analog one level
    # below language: a script shift is a routing/crawl change even
    # when lang_id still reads 'und')
    tables["scripts"] = (
        docs.select("doc_id", g)
        .join(script_profile(docs).select("doc_id", "script"), "doc_id")
        .groupBy(g, "script")
        .agg(F.count("*").alias("n_docs"))
    )
    if args.bpe_tokens:
        # the encode chain (the dominant cost) runs ONCE: a
        # (source x lang) aggregate — tiny — is localCheckpoint'ed and
        # both tables derive from it (the length_sketch discipline).
        # fertility uses the operator's own shared projection, so the
        # ppm definition cannot fork from the contract query's.
        from ocr_spark.functions.bpe import (
            fertility_from_counts,
            lang_token_counts,
        )
        from ocr_spark.functions.bpe_merges import MERGES

        fine = (
            lang_token_counts(docs, MERGES, keep=(g,))
            .groupBy(g, "lang_pred")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_ws").alias("n_ws_tokens"),
                F.sum("n_bpe").alias("n_bpe_tokens"),
            )
            .localCheckpoint()
        )
        tables["bpe_token_stats"] = fine.groupBy(g).agg(
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            F.sum("n_docs").alias("n_docs"),
        )
        tables["fertility"] = fertility_from_counts(
            fine.groupBy("lang_pred").agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_ws_tokens").alias("n_ws_tokens"),
                F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            )
        )
    if args.previous:
        prev = spark.read.parquet(args.previous)
        tables["drift"] = corpus_drift(prev, docs, group_col=g)

    counts = {}
    for name, df in tables.items():
        out = f"{args.output}/{name}"
        df.write.mode("overwrite").parquet(out)
        counts[name] = spark.read.parquet(out).count()

    summary = {"job": "report", "rows": counts}
    if args.previous:
        drift = spark.read.parquet(f"{args.output}/drift")
        top = drift.orderBy(F.col("l1_scaled").desc()).limit(1).collect()
        if top:
            summary["max_drift"] = {
                "group": top[0][g],
                "l1_scaled": top[0]["l1_scaled"],
            }
    # corpus-level roll-up of the per-source checksums (modular fold of
    # the ~n_sources-row checkpointed frame — no second corpus pass):
    # the one integer an alerting wrapper compares across snapshots.
    corpus = fold_checksums(tables["checksum"]).collect()[0]
    summary["corpus_checksum"] = {
        "n_rows": int(corpus.n_rows) if corpus.n_rows is not None else 0,
        "checksum60": int(corpus.checksum60)
        if corpus.checksum60 is not None
        else 0,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
