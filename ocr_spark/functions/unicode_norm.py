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
