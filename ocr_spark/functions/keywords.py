"""Seeded keyword-taxonomy tagging — the cheap topic classifier a
mixture planner runs before per-topic sampling (RedPajama/Dolma-style
"domain" labels from curated term lists, long before anything
learned). A taxonomy is {topic: [terms]}; a document's score for a
topic is the OCCURRENCE count of that topic's terms in the token
stream; the winning topic (ties: topic name ascending) labels the
doc, with 'none' when nothing matched.

Shape at scale: the token explode is cut to the union of taxonomy
terms BEFORE any shuffle (the BM25 posting discipline — taxonomy
vocabularies are tiny), so the per-doc aggregation moves only
matching-term rows; docs with zero matches never shuffle at all and
re-enter via a left join from the corpus (scan-stage). Scoring is
exact integer counts, so the label is engine- and partition-invariant.

Tokenization is the retrieval family's ONE tokenizer
(tfidf.TERM_RE, extract-then-lower), so "term" means the same thing
here as in BM25/phrase search.

Reference analog: none; beyond-reference training-data surface
(SURVEY.md §2 addenda) alongside lang_id/quality/classifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.tfidf import TERM_RE, _terms, _terms_select_sql


def _validate_taxonomy(taxonomy: dict[str, list[str]]) -> dict[str, list[str]]:
    import re as _re

    if not taxonomy:
        raise ValueError("taxonomy must be non-empty")
    out: dict[str, list[str]] = {}
    for topic in sorted(taxonomy):
        terms = sorted({t.lower() for t in taxonomy[topic]})
        if not terms:
            raise ValueError(f"topic {topic!r} has no terms")
        if not _re.fullmatch("[a-z0-9_]+", topic):
            raise ValueError(
                f"topic name {topic!r} must be [a-z0-9_]+ (it is inlined"
                " as a SQL literal and becomes a label value)"
            )
        if topic == "none":
            raise ValueError(
                "'none' is the reserved no-match label — a topic named"
                " 'none' would be indistinguishable from untagged docs"
            )
        for t in terms:
            if not _re.fullmatch(TERM_RE, t):
                raise ValueError(
                    f"term {t!r} cannot match any token (must be alnum)"
                )
        out[topic] = terms
    return out


def keyword_tag(docs: DataFrame, taxonomy: dict[str, list[str]]) -> DataFrame:
    """(doc_id, topic, score): every input doc labeled with its
    best-scoring topic — 'none' with score 0 when no taxonomy term
    occurs. Ties break topic-ASC so the label is deterministic."""
    tax = _validate_taxonomy(taxonomy)
    all_terms = sorted({t for ts in tax.values() for t in ts})
    # term -> topics (a term may seed several topics; each gets credit)
    pairs = [
        (t, topic) for topic, ts in tax.items() for t in ts
    ]
    tmap = docs.sparkSession.createDataFrame(pairs, "term string, topic string")
    # the retrieval family's ONE tokenizer (min length 1 — the
    # taxonomy decides which terms matter, not a length floor)
    toks = _terms(docs, 1).where(F.col("term").isin(all_terms))
    scores = (
        toks.join(F.broadcast(tmap), "term")
        .groupBy("doc_id", "topic")
        .agg(F.count("*").alias("score"))
    )
    # deterministic winner via an explicit window (score DESC,
    # topic ASC) — identical rule in the twin
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("topic").asc()
    )
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "topic", "score")
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(topic, 'none') AS topic",
            "CAST(coalesce(score, 0) AS BIGINT) AS score",
        )
    )


def keyword_tag_sql(table: str, taxonomy: dict[str, list[str]]) -> str:
    """DuckDB twin of :func:`keyword_tag`."""
    tax = _validate_taxonomy(taxonomy)
    pairs = ", ".join(
        f"('{t}', '{topic}')" for topic, ts in tax.items() for t in ts
    )
    return f"""
      WITH tmap(term, topic) AS (SELECT * FROM (VALUES {pairs})),
      toks AS (
        {_terms_select_sql(table, 1)}
      ),
      scores AS (
        SELECT doc_id, topic, count(*) AS score
        FROM toks JOIN tmap USING (term)
        GROUP BY doc_id, topic
      ),
      best AS (
        SELECT doc_id, topic, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, topic ASC) AS rn
          FROM scores
        ) WHERE rn = 1
      )
      SELECT d.doc_id,
             coalesce(b.topic, 'none') AS topic,
             CAST(coalesce(b.score, 0) AS BIGINT) AS score
      FROM {table} d LEFT JOIN best b USING (doc_id)
    """
