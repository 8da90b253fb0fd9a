"""Training-window document chunking: split each document's text into
fixed-size token windows with overlap — the standard preprocessing
step between a curated corpus and a sequence-packed training set
(every context-window pipeline re-chunks documents this way before
tokenizer-level packing).

Reference analog: the reference slices page text into fixed previews
(`doctags[:1000]`, /root/reference/pipeline.py:408) and processes
documents page-window-at-a-time (webapp/jobs.py cursor); this is the
corpus-scale generalization: deterministic word windows with overlap.

Scale shape: ZERO shuffle. Words come from one whitespace split
(`schema.WS` — the shared three-dialect-safe class), window starts
from an integer `sequence`, and the per-window slice/join runs as
array expressions inside the scan stage; `explode` is a generator in
the same stage, so at 100 TB this is a single codegen pass whose
output is ~(1 + overlap/stride)x the input text.

Determinism: chunk boundaries depend only on the text and the two
knobs — rerun-stable, partition-count-invariant, and engine-portable
(the DuckDB twin reproduces them bit-for-bit; whitespace runs collapse
to single spaces in ``chunk_text``, by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.schema import WS

MAX_TOKENS = 256
OVERLAP = 32


def _validate(max_tokens: int, overlap: int) -> int:
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    return max_tokens - overlap  # stride >= 1


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = MAX_TOKENS,
    overlap: int = OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): whitespace-token
    windows of ``max_tokens`` words advancing by ``max_tokens -
    overlap``; the last window is short iff fewer than ``max_tokens``
    words remain past its start. Empty/whitespace-only/NULL text
    yields NO chunks (the document is absent from the output —
    callers keeping such docs should anti-join, not rely on an empty
    chunk row).

    Window count: 0 for 0 words, else ``1 + ceil((n - max_tokens) /
    stride)`` clamped at 1 — integer arithmetic only, so both engines
    agree exactly.
    """
    stride = _validate(max_tokens, overlap)
    words = f"filter(split(text, '{WS}+'), w -> w <> '')"
    n = f"size({words})"
    n_chunks = (
        f"CASE WHEN {n} <= 0 THEN 0 WHEN {n} <= {max_tokens} THEN 1 "
        f"ELSE CAST(1 + ((({n}) - {max_tokens} + {stride} - 1) DIV {stride}) AS INT) END"
    )
    # sequence(0, -1) throws in Spark — guard the empty case with an
    # empty int array instead.
    chunk = (
        f"CASE WHEN {n_chunks} = 0 THEN array() "
        f"ELSE transform(sequence(0, {n_chunks} - 1), i -> struct("
        f"CAST(i AS INT) AS chunk_id, "
        f"slice({words}, i * {stride} + 1, {max_tokens}) AS w)) END"
    )
    return (
        docs.select("doc_id", F.explode(F.expr(chunk)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size("c.w").alias("n_tokens"),
            F.array_join("c.w", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str = "documents",
    max_tokens: int = MAX_TOKENS,
    overlap: int = OVERLAP,
) -> str:
    """DuckDB twin: same windows via 1-based list slicing and an
    unnested generate_series (empty for 0-word docs, matching the
    Spark explode-drops-empty semantics)."""
    stride = _validate(max_tokens, overlap)
    return f"""
      WITH words AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(coalesce(text, ''), '{WS}+'),
                           w -> w <> '') AS ws
        FROM {table}
      ),
      counted AS (
        SELECT doc_id, ws, len(ws) AS n,
               CASE WHEN len(ws) <= 0 THEN 0
                    WHEN len(ws) <= {max_tokens} THEN 1
                    ELSE 1 + ((len(ws) - {max_tokens} + {stride} - 1) // {stride})
               END AS n_chunks
        FROM words
      )
      SELECT doc_id,
             CAST(u.i AS INT) AS chunk_id,
             CAST(len(ws[u.i * {stride} + 1 : u.i * {stride} + {max_tokens}]) AS INT)
               AS n_tokens,
             array_to_string(ws[u.i * {stride} + 1 : u.i * {stride} + {max_tokens}], ' ')
               AS chunk_text
      FROM counted,
           LATERAL unnest(generate_series(0, CAST(n_chunks AS BIGINT) - 1)) AS u(i)
    """


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------

# boundary = a run of sentence-ending punctuation followed by
# whitespace. RE2 (DuckDB) has no lookbehind, so both twins use the
# sentinel trick instead: rewrite "<punct><ws>" to "<punct><RS>" and
# split on the RS control char (0x1e, the ASCII record separator).
# Any LITERAL 0x1e already present in the text (dirty OCR output) is
# deleted first — otherwise it would silently act as a boundary; both
# twins delete it identically, so the sentinel-uniqueness claim holds
# by construction.
SENT_BOUNDARY_RE = f"([.!?]+)({WS}+)"
SENT_SENTINEL = "\x1e"


def split_sentences(docs: DataFrame) -> DataFrame:
    """(doc_id, sent_idx, sentence): regex sentence segmentation —
    sentence-ending punctuation runs ([.!?]+) followed by whitespace
    close a sentence (the punctuation stays with its sentence; the
    boundary whitespace is consumed); trailing text without a
    terminator is the final sentence. ``sent_idx`` is 1-based and
    contiguous (empty fragments are dropped before indexing).

    The standard regex-segmentation caveat applies: abbreviations
    ("Mr. Smith") split — this is the cheap corpus-scale pass
    (scan-stage, zero shuffle, whole-stage codegen), not a trained
    segmenter. Docs with NULL text produce no rows; literal 0x1e
    bytes in the input are deleted (see the sentinel note above).
    """
    parts = (
        f"filter(split(regexp_replace(replace(text, '{SENT_SENTINEL}', ''),"
        f" '{SENT_BOUNDARY_RE}', '$1{SENT_SENTINEL}'),"
        f" '{SENT_SENTINEL}'), x -> x != '')"
    )
    return (
        docs.where(F.col("text").isNotNull())
        .selectExpr("doc_id", f"posexplode({parts}) AS (i, sentence)")
        .selectExpr(
            "doc_id",
            "CAST(i + 1 AS INT) AS sent_idx",
            "sentence",
        )
    )


def split_sentences_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`split_sentences` (\\1 replacement and an
    explicit 'g' flag where Spark uses $1 and replaces all)."""
    return f"""
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(parts))) AS INT)
               AS sent_idx,
             unnest(parts) AS sentence
      FROM (
        SELECT doc_id,
               list_filter(string_split(regexp_replace(
                 replace(text, '{SENT_SENTINEL}', ''),
                 '{SENT_BOUNDARY_RE}', '\\1{SENT_SENTINEL}', 'g'),
                 '{SENT_SENTINEL}'), x -> x != '') AS parts
        FROM {table} WHERE text IS NOT NULL
      )
    """
