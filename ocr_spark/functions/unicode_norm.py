"""Unicode NFC normalization — the canonical text-cleaning step a
web-scale corpus runs before any content hashing (dedup, novelty,
fingerprints): visually-identical strings with different codepoint
sequences (decomposed accents, reordered combining marks) must hash
equal or every downstream dedup silently under-merges.

Spark has no built-in Unicode normalizer, so this is the repo's one
sanctioned use of the Python path: an Arrow-batched ``pandas_udf``
(the north rule's "vectorized pandas/Arrow UDFs", never per-row
Python) wrapping ``pandas.Series.str.normalize`` — one C-side Arrow
transfer per batch, NULL-safe. The cross-engine twin is DuckDB's
utf8proc-backed ``nfc_normalize``; parity across implementations
(CPython unicodedata vs utf8proc) is itself a meaningful check and is
pinned by hostile-input tests (decomposed Hangul, combining-mark
reordering, ligatures — NFC must preserve ``ﬁ``, only NFKC folds it).

Scale shape: zero shuffle — the UDF runs inside the scan stage over
pruned (doc_id, text) columns; output is the input row count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nfc_udf():
    # created lazily: the pandas_udf decorator needs an active Spark
    # session, and this module must stay importable without one
    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return nfc


def normalize_nfc(docs: DataFrame, col: str = "text") -> DataFrame:
    """Same frame with ``col`` NFC-normalized plus a ``changed`` flag
    (false for NULL input; NULL text stays NULL)."""
    if "_nfc_tmp" in docs.columns:
        raise ValueError("input already has a _nfc_tmp column")
    if "changed" in docs.columns:
        # withColumn would silently overwrite it while the SQL twin
        # emits a duplicate column — refuse instead of diverging
        raise ValueError(
            "input already has a 'changed' column; rename or drop it first"
        )
    # materialize the UDF result under one name so the plan carries a
    # single ArrowEvalPython node (plan-asserted), not one per use
    return (
        docs.withColumn("_nfc_tmp", _nfc_udf()(F.col(col)))
        .withColumn("changed", ~F.col("_nfc_tmp").eqNullSafe(F.col(col)))
        .withColumn(col, F.col("_nfc_tmp"))
        .drop("_nfc_tmp")
    )


def normalize_nfc_sql(table: str = "documents", col: str = "text") -> str:
    """DuckDB twin over the same table: select-star shape with ``col``
    replaced and the same null-safe ``changed`` flag."""
    return f"""
      SELECT * REPLACE (nfc_normalize({col}) AS {col}),
             (nfc_normalize({col}) IS DISTINCT FROM {col}) AS changed
      FROM {table}
    """


# ---------------------------------------------------------------------------
# encoding-noise profile (mojibake / replacement / control chars)
# ---------------------------------------------------------------------------

# UTF-8-read-as-Latin-1 artifact digraphs: the lead bytes of 2-byte
# UTF-8 sequences decode to U+00C2/U+00C3 and the continuation byte to
# U+00A0..U+00BF (punctuation/symbol block) — 'A-tilde + (c)' style
# pairs that essentially never occur in clean text, while legitimate
# accented words ('Sao Paulo' with a tilde) put a LETTER after U+00C3
# and stay uncounted. The 3-byte lead artifact surfaces as U+00E2
# followed by U+20AC (the 'a-circumflex + euro' smart-quote wreck).
# Built with chr() — literal chars parse identically in Java regex
# and RE2 (the session-6 escape-dialect discipline).
MOJIBAKE_RE = (
    f"[{chr(0xC2)}{chr(0xC3)}][{chr(0xA0)}-{chr(0xBF)}]"
    f"|{chr(0xE2)}{chr(0x20AC)}"
)
# C0 controls minus the whitespace class (tab/LF/CR/FF/VT are normal
# text), plus DEL and the C1 block (U+0080-U+009F: bytes that only
# appear in text via encoding damage). Written as \xhh ESCAPES, not
# literal chars — a raw NUL inside a SQL literal is its own trap;
# both Java regex and RE2 read \xhh identically.
CTRL_RE = r"[\x00-\x08\x0E-\x1F\x7F-\x9F]"
REPLACEMENT_CHAR = chr(0xFFFD)


def _damage_counts(t):
    """The three damage-signal count columns over an already
    NULL-coalesced text column — ONE definition shared by
    encoding_profile and encoding_suspect_col."""
    return (
        F.regexp_count(t, F.lit(REPLACEMENT_CHAR)),
        F.regexp_count(t, F.lit(MOJIBAKE_RE)),
        F.regexp_count(t, F.lit(CTRL_RE)),
    )


def encoding_suspect_col(text) -> "F.Column":
    """The boolean ``suspect`` signal as a single column over a text
    column (NULL-safe: NULL text profiles clean) — for consumers that
    fold the gate into their own single scan (the streaming quality
    monitor) instead of joining :func:`encoding_profile` back."""
    t = F.coalesce(text, F.lit(""))
    n_repl, n_moj, n_ctrl = _damage_counts(t)
    return (n_repl + n_moj + n_ctrl) > 0


def encoding_profile(docs: DataFrame) -> DataFrame:
    """(doc_id, n_replacement, n_mojibake, n_ctrl, suspect): per-doc
    encoding-damage signals — U+FFFD replacement characters (a decoder
    already gave up), UTF-8-as-Latin-1 mojibake digraphs, and
    control/C1 characters that only enter text via charset bugs. A
    crawl-ingest gate drops or re-decodes ``suspect`` docs BEFORE
    tokenization: mojibake shreds token statistics and survives every
    length/stopword quality heuristic.

    Pure scan-stage ``regexp_count`` over pruned (doc_id, text) —
    zero shuffle, no UDF. NULL text profiles as the empty string (the
    row is emitted, never dropped)."""
    t = F.coalesce(F.col("text"), F.lit(""))
    n_repl, n_moj, n_ctrl = _damage_counts(t)
    return docs.select(
        "doc_id",
        n_repl.alias("n_replacement"),
        n_moj.alias("n_mojibake"),
        n_ctrl.alias("n_ctrl"),
        ((n_repl + n_moj + n_ctrl) > 0).alias("suspect"),
    )


def encoding_profile_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`encoding_profile` (len(regexp_extract_all)
    counts the same non-overlapping left-to-right matches as
    regexp_count)."""
    def cnt(pat: str) -> str:
        return f"CAST(len(regexp_extract_all(t, '{pat}')) AS INT)"

    return f"""
      SELECT doc_id,
             n_replacement, n_mojibake, n_ctrl,
             (n_replacement + n_mojibake + n_ctrl) > 0 AS suspect
      FROM (
        SELECT doc_id,
               {cnt(REPLACEMENT_CHAR)} AS n_replacement,
               {cnt(MOJIBAKE_RE)} AS n_mojibake,
               {cnt(CTRL_RE)} AS n_ctrl
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     coalesce(text, '') AS t FROM {table})
      )
    """
