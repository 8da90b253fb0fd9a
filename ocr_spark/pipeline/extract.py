"""DataFrame-level extraction orchestration.

Thin and declarative: the semantics are in ocr_spark.kernel.extract;
this module owns the *distribution* concerns — partitioning, skew
handling, Arrow batching — per SURVEY.md §4.3.

Skew strategy (docs are atomic; a document may never straddle batches
or the span order invariant dies):
- partition key = pmod(hash(doc_id), P) with P >> cores so giant docs
  (the 1% 2k-20k-span tail, FIXTURES.md) land alone in small partitions
  that AQE won't coalesce into monsters;
- ``weight_partition`` optionally sorts docs by size within partitions
  so the biggest docs start first (shorter straggler tail);
- Arrow batch rows are capped (session.ARROW_MAX_RECORDS) so one batch
  holds a bounded number of docs.

At 100 TB the same plan holds: the scan is parquet/Iceberg with doc_id
bucketing, the repartition is the only shuffle, and the UDF is
embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.kernel import arrow_extract as ak
from ocr_spark.kernel.extract import (
    DEFAULT_CONFIG,
    PARITY_CONFIG,
    ExtractConfig,
    doc_metrics,
    extract_flat,
    extract_nested,
    extract_nested_metrics,
)
from ocr_spark.schema import (
    ANNOTATED_SPAN_SCHEMA,
    DOC_METRICS_SCHEMA,
    DOC_SCHEMA,
    DOC_WITH_METRICS_SCHEMA,
    KIND_ERROR,
)


def _repartition_for_kernel(df: DataFrame, num_partitions: int | None) -> DataFrame:
    """Distribute docs across partitions by doc_id hash.

    Skipped when the input is already partitioned (num_partitions None
    and input partitioning adequate) — callers opt in. The key is a
    plain hash: with P sufficiently large relative to cores, the skew
    tail spreads out and AQE-free static partitioning stays balanced.
    """
    if not num_partitions:
        return df
    return df.repartition(num_partitions, F.pmod(F.hash("doc_id"), F.lit(num_partitions)))


def weight_partition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Size-aware distribution: docs sorted heaviest-first inside hash
    partitions, so stragglers start early (LPT-style heuristic without
    a global sort — no single-task window)."""
    w = df.withColumn("_w", F.size("spans"))
    out = w.repartition(
        num_partitions, F.pmod(F.hash("doc_id"), F.lit(num_partitions))
    ).sortWithinPartitions(F.desc("_w"))
    return out.drop("_w")


# pandas-kernel fn -> arrow-kernel twin (the default execution path;
# the pandas kernel remains the executable spec / test oracle)
_ARROW_TWIN = {
    extract_flat: ak.extract_flat_batch,
    extract_nested: ak.extract_nested_batch,
    doc_metrics: ak.metrics_batch,
    extract_nested_metrics: ak.extract_nested_metrics_batch,
}

# Memory bound for one kernel invocation: Arrow caps batch ROWS
# (maxRecordsPerBatch), but a row is a whole document — a batch of
# 512 giant docs (20k spans each) would still be ~10M spans. Batches
# are re-sliced so one kernel call sees at most this many spans
# (slicing at row boundaries keeps docs atomic; zero-copy).
MAX_SPANS_PER_KERNEL_CALL = 262_144


def _subslice_batches(batches, max_spans: int):
    """Yield zero-copy row-slices of each RecordBatch such that every
    slice holds <= max_spans total spans (single giant docs still go
    through alone — the kernel is linear in spans, so one doc is the
    floor)."""
    import pyarrow.compute as pc

    for b in batches:
        if b.num_rows == 0:
            continue
        lens = pc.fill_null(pc.list_value_length(b.column("spans")), 0).to_numpy(
            zero_copy_only=False
        )
        if lens.sum() <= max_spans:
            yield b
            continue
        start, acc = 0, 0
        for i, n in enumerate(lens):
            if acc + n > max_spans and i > start:
                yield b.slice(start, i - start)
                start, acc = i, 0
            acc += int(n)
        if start < b.num_rows:
            yield b.slice(start, b.num_rows - start)


def _run_kernel(
    df: DataFrame,
    fn,
    schema,
    cfg: ExtractConfig,
    num_partitions: int | None,
    engine: str = "arrow",
):
    df = _repartition_for_kernel(df, num_partitions)

    if engine == "arrow":
        afn = _ARROW_TWIN[fn]

        def apply_arrow(batches):
            for b in _subslice_batches(batches, MAX_SPANS_PER_KERNEL_CALL):
                yield afn(b, cfg)

        return df.mapInArrow(apply_arrow, schema=schema)

    def apply_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield fn(pdf, cfg)

    return df.mapInPandas(apply_batches, schema=schema)


def extract_spans(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Main-content extraction, flat output (doc_id, kind, text,
    media_ref, offset, kept, block_id, link_density).

    Input: (doc_id string, spans array<struct>). Error rows surface as
    kind='__error__' (E1/E2/E4: errors become data).
    """
    return _run_kernel(df, extract_flat, ANNOTATED_SPAN_SCHEMA, cfg, num_partitions, engine)


def extract_main_content(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Boilerplate-stripped span stream, canonical flat shape
    (doc_id, kind, text, media_ref, offset) — error rows excluded."""
    out = extract_spans(df, cfg, num_partitions, engine)
    return out.where(F.col("kind") != KIND_ERROR).select(
        "doc_id", "kind", "text", "media_ref", "offset"
    )


def classify_spans(
    df: DataFrame,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Parity mode: every span kept and annotated; order preserved.

    This is the path the north-rule fixtures check: output
    (kind, text, media_ref, offset) per doc == input sequence.
    """
    return extract_spans(df, PARITY_CONFIG, num_partitions, engine)


def extract_documents(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Nested output matching the input contract:
    (doc_id, spans array<struct<kind,text,media_ref,offset>>)."""
    return _run_kernel(df, extract_nested, DOC_SCHEMA, cfg, num_partitions, engine)


def extract_documents_with_metrics(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Nested output + per-doc metrics from a single kernel execution:
    (doc_id, spans, n_spans_in, n_spans_out, parse_failed). The
    checkpointed runner's commit shape — output and lineage metrics
    cost ONE pass over the corpus."""
    return _run_kernel(
        df, extract_nested_metrics, DOC_WITH_METRICS_SCHEMA, cfg, num_partitions, engine
    )


def extraction_metrics(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Per-doc metrics (A4): n_spans_in/out, parse_failed, warning."""
    return _run_kernel(df, doc_metrics, DOC_METRICS_SCHEMA, cfg, num_partitions, engine)


# ---------------------------------------------------------------------------
# incremental extraction (daily-crawl shape): re-run the kernel ONLY on
# docs whose raw span content changed; carry prior results forward
# ---------------------------------------------------------------------------

# canonical per-span serialization separators (explicit chars, never
# built with Spark SQL chr() — the ascii-modulo-256 gotcha)
_HASH_FS = "\x1e"  # field separator inside one span
_HASH_RS = "\x1f"  # span separator
_HASH_NULL = "\x00"  # NULL sentinel (distinct from empty string)


def doc_input_hash(df: DataFrame) -> DataFrame:
    """(doc_id, input_hash): md5 over the canonical serialization of a
    doc's raw spans in offset order — the change-detection key for
    incremental extraction. Pure scan-stage exprs (array_sort +
    transform + array_join + md5): 36 B/row output, no shuffle, so the
    daily hash pass costs one scan of the span table.

    Canonical form: spans sorted by offset; per span
    ``kind\\x1etext\\x1emedia_ref\\x1eoffset`` (NULL fields -> \\x00,
    distinct from ''), spans joined by \\x1f; a NULL spans array
    hashes as the empty string (error-row docs still get a stable
    key)."""
    # NULL offsets (contract-impossible, but cheap to close): coalesce
    # to -1 BEFORE sorting/serializing — concat_ws drops a trailing
    # NULL while DuckDB's concat keeps its separator, and a NULL in
    # the sort comparator would order unstably vs ORDER BY.
    #
    # Sort key is (offset, full serialized span string), not offset
    # alone: on offset TIES (two -1-coalesced NULLs, duplicate
    # offsets) a single-key sort is stable in Spark's array_sort but
    # unspecified in DuckDB's string_agg ORDER BY, so the twin hashes
    # could diverge. The serialized string is a total secondary key
    # that both engines compare byte-identically (Spark UTF8String and
    # DuckDB default collation are both binary). Built as
    # struct(o, s): array_sort's default struct ordering is
    # field-by-field, so no lambda comparator is needed.
    keyed = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            F.coalesce(s["offset"], F.lit(-1)).alias("o"),
            F.concat_ws(
                _HASH_FS,
                F.coalesce(s["kind"], F.lit(_HASH_NULL)),
                F.coalesce(s["text"], F.lit(_HASH_NULL)),
                F.coalesce(s["media_ref"], F.lit(_HASH_NULL)),
                F.coalesce(s["offset"], F.lit(-1)).cast("string"),
            ).alias("s"),
        ),
    )
    serial = F.array_join(
        F.transform(F.array_sort(keyed), lambda x: x["s"]),
        _HASH_RS,
    )
    return df.select("doc_id", F.md5(F.coalesce(serial, F.lit(""))).alias("input_hash"))


def doc_input_hash_sql(spans_sql: str) -> str:
    """DuckDB twin of :func:`doc_input_hash` over a FLAT span SELECT
    (doc_id, kind, text, media_ref, "offset") — same serialization,
    same order (offset, then the serialized span string as the
    tie-break, matching the Spark side's (o, s) struct sort), same
    sentinels."""
    span_str = (
        "concat(coalesce(kind, chr(0)), chr(30), "
        "coalesce(text, chr(0)), chr(30), "
        "coalesce(media_ref, chr(0)), chr(30), "
        'CAST(coalesce("offset", -1) AS VARCHAR))'
    )
    return f"""
      SELECT doc_id, md5(coalesce(string_agg(
               {span_str},
               chr(31) ORDER BY coalesce("offset", -1), {span_str}), ''))
               AS input_hash
      FROM ({spans_sql}) GROUP BY doc_id
    """


def incremental_extract(
    df: DataFrame,
    prev_hashes: DataFrame,
    prev_extracted: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Daily-ingest extraction over a 10^12-doc corpus: run the kernel
    only on NEW or CHANGED docs (content hash differs from the stored
    ``prev_hashes`` state), carry the stored ``prev_extracted`` span
    rows forward for unchanged docs, and drop docs absent from today's
    corpus. Output = extract_main_content(today's corpus) exactly
    (pinned by the contract twin), plus ``recomputed`` (1 = the kernel
    ran for this doc today) for lineage/cost accounting.

    Scale shape (the incremental-dedup discipline): change detection
    is a narrow (doc_id, 32-char hash) frame — localCheckpoint'ed once
    (it feeds two consumers; recomputing it would re-scan the span
    table) — LEFT-joined against yesterday's equally narrow state;
    the heavy span table is then LEFT SEMI pruned to the changed ids
    before the kernel runs, and yesterday's results are LEFT SEMI
    pruned to the unchanged ids before the union. Only the changed
    fraction of the crawl ever reaches the kernel or the wire; at a
    typical daily change rate that is orders of magnitude less compute
    than a full re-extraction."""
    cur = doc_input_hash(df).localCheckpoint(eager=False)
    status = cur.join(
        prev_hashes.select(
            "doc_id", F.col("input_hash").alias("_prev_hash")
        ),
        "doc_id",
        "left",
    )
    changed_ids = status.where(
        F.col("_prev_hash").isNull()
        | (F.col("_prev_hash") != F.col("input_hash"))
    ).select("doc_id")
    unchanged_ids = status.where(
        F.col("_prev_hash") == F.col("input_hash")
    ).select("doc_id")
    fresh = extract_main_content(
        df.join(changed_ids, "doc_id", "left_semi"), cfg, num_partitions, engine
    ).withColumn("recomputed", F.lit(1))
    carried = prev_extracted.select(
        "doc_id", "kind", "text", "media_ref", "offset"
    ).join(unchanged_ids, "doc_id", "left_semi").withColumn(
        "recomputed", F.lit(0)
    )
    return fresh.unionByName(carried)
