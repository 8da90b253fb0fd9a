"""Hashed linear quality/domain classifier — the fastText-style gate
(CCNet's wiki-vs-crawl filter, LLaMA's "references-like" page
classifier, RedPajama's quality model) re-expressed as scan-stage
relational algebra.

The model is LINEAR over hashed bag-of-bigram features, which is the
entire reason it survives 10^12 documents: scoring is

    margin = w · x̄ + b          (x̄ = averaged feature counts)

and since sign(w · x̄ + b) == sign(Σ_occurrences w[f] + b·n) for n > 0,
the engine never materializes (or divides by) the average — each doc's
margin is the EXACT INT64 sum of fixed-point weights over its bigram
occurrences plus n·bias, so the score is partition-, engine-, and
association-independent (the tf-idf / bigram-LM / DSIR discipline).

Featurization is byte-identical to DSIR's (`dsir._feats_expr` — the
shared WS tokenization, chr(31) pair separator, portable 60-bit md5
fold mod N_BUCKETS): one definition of "feature" across importance
weighting, LM fluency, and classification, so a corpus featurized once
serves all three.

Scale shape: the weight table is a BROADCAST dim (≤ N_BUCKETS rows by
construction — the hashing trick's whole point is a bounded feature
space no matter the corpus); scoring is explode → broadcast-hash-join
→ one uniform groupBy(doc_id) with map-side partial aggregation. No
corpus-sized shuffle carries text or feature strings — only (doc_id,
bucket) pairs.

Training happens OFFLINE (scripts/train_quality_classifier.py bakes
`classifier_weights.py`); on the synthetic contract corpus the demo
labels are lang == 'en', which a linear model can only MEMORIZE (the
generator draws all languages from one vocabulary) — the committed
weights reach 0.990 train accuracy on the 500-doc contract corpus and
chance on unseen docs, stated plainly. With real labels (wiki vs
crawl) the identical machinery is a real quality gate.

Reference analog: none — beyond-reference training-data surface
(SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.classifier_weights import (
    BIAS_SCALED,
    N_BUCKETS,
    WEIGHTS_SCALED,
)
from ocr_spark.functions.dsir import _feats_expr


def _resolve_model(
    weights_scaled: list[int] | None,
    bias_scaled: int | None,
    n_buckets: int | None,
) -> tuple[list[int], int, int]:
    """One (w, b, n_buckets) resolution for BOTH twins, so they cannot
    diverge: default to the baked model, infer n_buckets from an
    explicit weight list, and raise on a length mismatch (a weight
    list shorter than the featurizer modulus silently zeroes the tail
    buckets otherwise)."""
    w = WEIGHTS_SCALED if weights_scaled is None else weights_scaled
    b = BIAS_SCALED if bias_scaled is None else bias_scaled
    nb = (
        (N_BUCKETS if weights_scaled is None else len(w))
        if n_buckets is None
        else n_buckets
    )
    if len(w) != nb:
        raise ValueError(f"expected {nb} weights, got {len(w)}")
    return list(w), int(b), nb


def quality_classifier(
    docs: DataFrame,
    weights_scaled: list[int] | None = None,
    bias_scaled: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """(doc_id, n_feats, margin_scaled, keep): score every document
    with the baked linear model (or an explicit one).

    ``margin_scaled`` = Σ w_scaled[bucket(bigram)] + n_feats·b_scaled
    (fixed-point 2^-20 units); ``keep`` = margin_scaled > 0. Docs with
    no bigrams score margin 0 → keep = false (nothing to judge; gate
    them separately if empty docs should pass)."""
    w, b, nb = _resolve_model(weights_scaled, bias_scaled, n_buckets)
    spark = docs.sparkSession
    wtab = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(w) if v != 0],
        "f long, w long",
    )
    feats = docs.selectExpr(
        "doc_id", f"explode_outer({_feats_expr(nb)}) AS f"
    )
    margin = F.coalesce(F.sum("w"), F.lit(0)) + F.count("f") * F.lit(b)
    return (
        feats.join(F.broadcast(wtab), "f", "left")
        .groupBy("doc_id")
        .agg(
            F.count("f").cast("long").alias("n_feats"),
            margin.cast("long").alias("margin_scaled"),
        )
        .withColumn("keep", F.col("margin_scaled") > 0)
    )


def quality_classifier_sql(
    table: str = "documents",
    weights_scaled: list[int] | None = None,
    bias_scaled: int | None = None,
    n_buckets: int | None = None,
) -> str:
    """DuckDB twin of :func:`quality_classifier` (weights inlined as a
    VALUES dim — same sparsification, same left join + coalesce;
    DISTINCT id list before the join-back, the dsir twin's fan-out
    lesson). An all-zero model sparsifies to an empty dim — a typed
    NULL seed row (filtered out) keeps the VALUES clause parseable."""
    from ocr_spark.functions.dsir import feats_select_sql

    w, b, nb = _resolve_model(weights_scaled, bias_scaled, n_buckets)
    vals = ", ".join(
        ["(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))"]
        + [f"({i}, {int(v)})" for i, v in enumerate(w) if v != 0]
    )
    return f"""
      WITH wtab AS (
        SELECT * FROM (VALUES {vals}) t(f, w) WHERE f IS NOT NULL
      ),
      feats AS (
        SELECT d.doc_id, p.f
        FROM (SELECT DISTINCT doc_id FROM {table}) d
        LEFT JOIN ({feats_select_sql(table, nb)}) p
          ON d.doc_id = p.doc_id
      )
      SELECT feats.doc_id,
             CAST(count(feats.f) AS BIGINT) AS n_feats,
             CAST(coalesce(sum(w), 0)
                  + count(feats.f) * {int(b)} AS BIGINT) AS margin_scaled,
             (coalesce(sum(w), 0) + count(feats.f) * {int(b)}) > 0 AS keep
      FROM feats LEFT JOIN wtab USING (f)
      GROUP BY feats.doc_id
    """
