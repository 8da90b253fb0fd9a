"""TF-IDF term weighting and per-document top terms.

The keyword-extraction staple for corpus triage (what is this
document about; which docs over-index on a term) and a building
block for sparse retrieval. Composition, all declarative:

1. explode lower-cased alnum tokens → (doc_id, term)
2. tf: groupBy (doc_id, term) count — map-side partial agg, one
   shuffle on uniform (doc, term) keys
3. df: count(*) OVER (PARTITION BY term) on the tf table — one more
   shuffle (on term), NO join and NO second corpus scan. The naive
   "aggregate df then join back" formulation reads and explodes the
   corpus twice: column pruning rewrites the df branch's aggregate
   subtree, so Spark's ReusedExchange never fires on it.
4. corpus size N joins in as a broadcast single-row aggregate (kept
   lazy — no driver action in the operator)
5. weight + per-doc top-k via a rank window (WindowGroupLimit
   truncates k per doc map-side before the final shuffle)

Scale notes: vocabulary at corpus scale is NOT broadcast-able — df
arrives via shuffle on the term key (uniform by nature; boilerplate
mega-terms are exactly the high-df terms whose weight → 0). The only
broadcast is the 1-row N; the whole operator is one corpus scan plus
three uniform-key shuffles.

Cross-engine exactness: the contract variant uses the RATIONAL idf
(N + 1) / (df + 1) — integer-derived doubles whose quotient is
IEEE-identical in both engines. The conventional ln() idf is offered
too (``idf="log"``), but Java's Math.log and C libm are only
1-ulp-bounded, not identically rounded — that last-ulp dialect trap
is the same family as the printf/regex divergences this repo's fuzz
harnesses exist for, so the oracle-gated shape keeps log out of the
hash-compared path (floor6 guards the ranking only).

Reference analog: none (no term statistics in the reference);
beyond-reference text-analysis surface alongside
``text.py``'s lang-ID/quality/fingerprint (SURVEY.md §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.functions.text import floor6, floor6_sql

# alnum runs extracted from the RAW text, lower-cased AFTERWARDS:
# tokens matched by this class are pure ASCII, and ASCII-only
# lowercase is locale- and engine-independent. lower() BEFORE
# extraction is a dialect trap — Java's full case mapping can create
# or remove ASCII letters ('İ' → 'i'+combining dot splits runs
# differently than DuckDB's simple mapping, and a Turkish-locale JVM
# lowercases 'I' to dotless ı), silently diverging the twins.
TERM_RE = "[a-zA-Z0-9]+"


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    idf: str = "rational",
    min_term_len: int = 2,
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf:
    (doc_id, term, tf, df, score, rank).

    ``idf="rational"``: score = tf * (N + 1) / (df + 1) — exact and
    cross-engine reproducible. ``idf="log"``: the conventional
    tf * ln((N + 1) / (df + 1)) — same ranking (ln is monotone on the
    rational weight for fixed tf... rank-identical per (tf, df) pair
    ordering only when tf ties; use for scoring, not for the
    hash-compared contract). Ties rank by term ascending.
    """
    if idf not in ("rational", "log"):
        raise ValueError(f"unknown idf mode: {idf!r}")
    terms = (
        docs.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(TERM_RE), 0)
            ).alias("term"),
        )
        # generators can't nest inside expressions — lowercase (ASCII-
        # only by construction of TERM_RE) in a follow-up projection
        .select("doc_id", F.lower(F.col("term")).alias("term"))
        .where(F.length("term") >= min_term_len)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # tf rows are distinct per (doc, term), so a per-term window count
    # IS the document frequency — no join, no second corpus scan
    tf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    n_docs = docs.where(F.col("text").isNotNull()).agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    weight = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    if idf == "log":
        weight = F.log(weight)
    scored = tf.crossJoin(F.broadcast(n_docs)).withColumn(
        "score", floor6(F.col("tf") * weight)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def tfidf_top_terms_sql(
    table: str = "documents", k: int = 5, min_term_len: int = 2
) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` (rational idf)."""
    # association must mirror the Spark side exactly: tf * (ratio),
    # not (tf * (n+1)) / (df+1) — the two round differently in IEEE
    score = floor6_sql("tf * ((n_docs + 1.0) / (df + 1.0))")
    return f"""
      WITH terms AS (
        SELECT doc_id, lower(unnest(regexp_extract_all(text, '{TERM_RE}'))) AS term
        FROM {table} WHERE text IS NOT NULL
      ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms
        WHERE length(term) >= {min_term_len}
        GROUP BY doc_id, term
      ), tfdf AS (
        SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf
      ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM {table}
        WHERE text IS NOT NULL
      ), scored AS (
        SELECT tfdf.doc_id, tfdf.term, tfdf.tf, tfdf.df,
               {score} AS score
        FROM tfdf CROSS JOIN n
      )
      SELECT doc_id, term, tf, df, score, rank FROM (
        SELECT *, CAST(row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term ASC
        ) AS INT) AS rank
        FROM scored
      ) WHERE rank <= {k}
    """
