#!/usr/bin/env python3
"""spark-submit entry: corpus + event-log analytics rollup.

The reporting face of the engine: one submission computes the
dashboard tables a 100 TB corpus owner refreshes daily, each written
as parquet under --output/<name>:

- doc_rollup       : ROLLUP(source, lang) counts/chars (one
                     Expand+agg pass, functions/olap.py)
- doc_cube         : CUBE(source, lang) — adds the per-lang marginal
- lang_by_source   : dense cross-tab, one count column per language
                     (pinned pivot vocabulary)
- doc_percentiles  : per-lang p50/p90/p99 document length
- top_docs         : k largest docs per source (WindowGroupLimit)
- sessions         : gap-based event sessions (session_window)
- attribution      : purchases as-of joined to the latest prior click
- funnel           : ordered-step conversion funnel (chained
                     running minima, no self-join)
- retention        : weekly cohort retention matrix
- distinct_users   : per-event-type distinct users — EXACT with
                     --exact-distinct, else HLL sketch estimates
                     (fixed-size shuffle, functions/sketches.py)
- anomalies        : rolling integer z-score spike flags over the
                     dense hourly per-type series (functions/anomaly)
- session_paths    : top-k ordered event-type journeys per gap
                     session (functions/paths)
- transitions      : first-order Markov transition matrix within
                     sessions, exact integer conditional ppm
- user_status_history : SCD2 validity intervals of the daily
                     per-user status observation (functions/scd)
- vocab            : corpus-wide top --vocab-k whitespace tokens
                     (heavy hitters, TakeOrderedAndProject)
- source_rank      : PageRank over the doc->source reference graph
                     synthesized from (doc_id, source) co-citation —
                     exact integer power iteration (functions/graph.py)

Every table is a single declarative plan (no collect loops); the job
prints one JSON summary line with row counts.

Example:
  spark-submit --py-files dist/ocr_spark.zip jobs/analytics.py \\
    --docs /data/documents.parquet --events /data/events.parquet \\
    --output /out/analytics --top-k 10
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet")
    ap.add_argument("--events", required=True, help="events parquet")
    ap.add_argument("--output", required=True, help="output root dir")
    ap.add_argument("--top-k", type=int, default=5)
    ap.add_argument("--vocab-k", type=int, default=200)
    ap.add_argument("--pagerank-iters", type=int, default=3)
    ap.add_argument("--session-gap", default="8 hours")
    ap.add_argument("--path-gap-s", type=int, default=8 * 3600)
    ap.add_argument("--paths-k", type=int, default=20)
    ap.add_argument("--anomaly-window", type=int, default=24)
    ap.add_argument(
        "--anomaly-tau2",
        type=int,
        default=9,
        help="squared z-score threshold (9 = 3 sigma); integer so the "
        "flag predicate stays in exact arithmetic",
    )
    ap.add_argument(
        "--exact-distinct",
        action="store_true",
        help="exact COUNT(DISTINCT) instead of HLL estimates",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ocr_spark.functions.olap import (
        cube_doc_stats,
        percentile_chars,
        pivot_lang_by_source,
        rollup_doc_stats,
        topk_per_group,
    )
    from ocr_spark.functions.anomaly import anomaly_flags
    from ocr_spark.functions.funnel import funnel_counts, retention_cohorts
    from ocr_spark.functions.paths import session_paths, transition_profile
    from ocr_spark.functions.scd import daily_status_obs, scd2_history
    from ocr_spark.functions.graph import pagerank
    from ocr_spark.functions.text import vocab_topk
    from ocr_spark.functions.sessionize import sessionize
    from ocr_spark.functions.sketches import approx_distinct, exact_distinct
    from ocr_spark.functions.timeseries import asof_join_events
    from ocr_spark.pipeline.session import get_spark

    spark = get_spark(args.master, app_name="ocr_spark_analytics")
    docs = spark.read.parquet(args.docs)
    events = spark.read.parquet(args.events)

    # same output column either way: the published table's schema must
    # not depend on which counting method a given run used
    if args.exact_distinct:
        distinct = exact_distinct(events, ["event_type"], "user_id")
    else:
        distinct = approx_distinct(
            events, ["event_type"], "user_id", out="n_users"
        )

    # formatted=False: published tables carry typed timestamps and
    # real NULLs (the ''/-1 stringified shape exists only for the
    # cross-engine contract compare)
    tables = {
        "doc_rollup": rollup_doc_stats(docs),
        "doc_cube": cube_doc_stats(docs),
        "lang_by_source": pivot_lang_by_source(docs),
        "doc_percentiles": percentile_chars(docs),
        "top_docs": topk_per_group(docs, k=args.top_k),
        "sessions": sessionize(events, gap=args.session_gap, formatted=False),
        "attribution": asof_join_events(events, formatted=False),
        "funnel": funnel_counts(events),
        "retention": retention_cohorts(events),
        "distinct_users": distinct,
        # rolling integer z-score spike flags over the dense hourly
        # per-type series (the ingest-health monitor)
        "anomalies": anomaly_flags(
            events, window=args.anomaly_window, tau2=args.anomaly_tau2
        ),
        # most frequent session journeys (ordered event-type paths)
        "session_paths": session_paths(
            events, gap_s=args.path_gap_s, k=args.paths_k
        ),
        # first-order Markov transition matrix within sessions (same
        # sessionization skeleton as session_paths)
        "transitions": transition_profile(events, gap_s=args.path_gap_s),
        # SCD2 status history over THE shared daily observation
        # definition (scd.daily_status_obs — same frame the contract
        # query oracle-checks)
        "user_status_history": scd2_history(
            daily_status_obs(events),
            key="user_id",
            snap="snap_day",
            attrs=("status",),
        ),
        "vocab": vocab_topk(docs, k=args.vocab_k),
        # source-authority ranking: bipartite doc->source edges give
        # sources rank mass proportional to (damped) document count —
        # the slot a real link graph would plug into
        # coalesce BOTH endpoints: a NULL node (from NULL source or
        # NULL doc_id) can never be matched by the rank joins, so its
        # mass neither delivers nor redistributes — bucket explicitly
        "source_rank": pagerank(
            docs.select(
                F.coalesce(F.col("doc_id").cast("string"), F.lit("")).alias(
                    "src"
                ),
                F.concat(
                    F.lit("source:"), F.coalesce(F.col("source"), F.lit("unknown"))
                ).alias("dst"),
            ),
            iters=args.pagerank_iters,
        ),
    }
    counts = {}
    for name, df in tables.items():
        out = f"{args.output}/{name}"
        df.write.mode("overwrite").parquet(out)
        # count from the written files: no second computation
        counts[name] = spark.read.parquet(out).count()

    print(json.dumps({"job": "analytics", "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
