"""DSIR-style importance weighting for domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al., 2023, public)
scores raw-corpus documents by how much more likely their hashed
n-gram features are under a TARGET domain distribution than under the
RAW corpus distribution, then keeps high-importance documents — the
standard recipe for skewing a 100 TB crawl toward a curated domain
(e.g. "more like Wikipedia") without training a classifier.

This implementation keeps the published shape — hashed bigram
features bucketed into a FIXED feature space, two bag-of-features
count tables, per-document sum of per-feature affinities — but swaps
the log-likelihood ratio for an integer fixed-point difference of
scaled probabilities:

    contribution(f) = (10^6 * c_target(f)) // total_target
                    - (10^6 * c_raw(f))    // total_raw

summed over every bigram occurrence in the document. Like the LM
fluency score (lm.py) and the tf-idf rational idf, the result is an
exact integer — partition-, association-, and engine-independent — so
the artifact survives hash comparison against the DuckDB twin. The
log-ratio and the probability difference agree on sign per feature
(both positive iff p_target > p_raw) and serve the same selection
purpose; this is documented as a deterministic variant, not a claim
of numerical equivalence to the paper.

Scale shape: the feature space is FIXED at ``n_buckets`` (default
8192), so both count tables are bounded, broadcastable artifacts no
matter the corpus size — the same property that makes the count-min
sketch maintainable (sketches.py). Building them is one explode +
map-side partial count each; scoring is two broadcast-or-hash joins
on uniform bucket ids plus one per-doc aggregate. Bigrams are hashed
before any shuffle; text never leaves the scan stage.

Reference analog: none — beyond-reference training-data surface
(SURVEY.md §2 "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.hashing import md5_long_expr, md5_long_sql
from ocr_spark.functions.lm import (
    P_SCALE,
    PAIR_EXPR,
    PAIR_SQL,
    _words_expr,
    _words_sql,
)

N_BUCKETS = 8192


def _feats_expr(n_buckets: int) -> str:
    """Spark SQL expr: text -> array of hashed-bigram feature buckets
    (one element per bigram OCCURRENCE — multiplicity is signal, as in
    the paper's bag-of-ngrams). Word and pair expressions are shared
    with the bigram LM (lm.py) so DSIR features and LM transitions can
    never tokenize differently. LET-binding via single-element
    transform so the text splits once per row."""
    bucket = f"{md5_long_expr(PAIR_EXPR)} % {n_buckets}"
    return (
        f"flatten(transform(array({_words_expr()}), w -> "
        f"CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        f"i -> {bucket}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END))"
    )


def feats_select_sql(src: str, n_buckets: int) -> str:
    """DuckDB twin of ``explode(_feats_expr(n))``: a SELECT yielding
    (doc_id, f) — one row per bigram occurrence. Shared by the DSIR
    twin and the linear-classifier twin so "feature" can never mean
    two different things across the hash-compared contract."""
    w = _words_sql()
    bucket = md5_long_sql(PAIR_SQL) + f" % {n_buckets}"
    return (
        "SELECT doc_id, unnest(fs) AS f FROM ("
        "SELECT doc_id, CASE WHEN len(w) >= 2 THEN "
        f"list_transform(range(1, len(w)), i -> {bucket}) "
        "ELSE [] END AS fs FROM "
        f"(SELECT doc_id, text FROM {src}) "
        f"CROSS JOIN LATERAL (SELECT {w} AS w) lw)"
    )


def _feat_counts(src: DataFrame, n_buckets: int, cname: str) -> DataFrame:
    return (
        src.selectExpr(f"explode({_feats_expr(n_buckets)}) AS f")
        .groupBy("f")
        .agg(F.count("*").alias(cname))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, score_scaled): fixed-point importance score of
    each ``docs`` row toward the ``target`` domain, against the ``raw``
    background distribution (default: ``docs`` itself). Positive means
    the document's hashed-bigram profile is closer to the target than
    to the background; rank or threshold on ``score_scaled`` (or on
    the mean ``score_scaled / n_feats``) to select. Docs with < 2
    words score (0, 0) — no features to judge."""
    raw_src = docs if raw is None else raw
    tc = _feat_counts(target, n_buckets, "c_t")
    rc = _feat_counts(raw_src, n_buckets, "c_r")
    tt = tc.agg(F.sum("c_t").alias("t_tot"))
    rt = rc.agg(F.sum("c_r").alias("r_tot"))

    doc_feats = docs.selectExpr(
        "doc_id", f"explode_outer({_feats_expr(n_buckets)}) AS f"
    )
    contrib = F.expr(
        f"CASE WHEN c_t IS NULL OR t_tot IS NULL THEN 0 "
        f"ELSE ({P_SCALE} * c_t) div t_tot END - "
        f"CASE WHEN c_r IS NULL OR r_tot IS NULL THEN 0 "
        f"ELSE ({P_SCALE} * c_r) div r_tot END"
    )
    return (
        doc_feats.join(tc, "f", "left")
        .join(rc, "f", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .groupBy("doc_id")
        .agg(
            F.count("f").alias("n_feats"),
            F.coalesce(F.sum(contrib), F.lit(0)).cast("long").alias("score_scaled"),
        )
    )


def dsir_weights_sql(
    docs_expr: str = "documents",
    target_expr: str = "documents",
    raw_expr: str | None = None,
    n_buckets: int = N_BUCKETS,
    id_sql: str = "CAST(doc_id AS BIGINT)",
) -> str:
    """DuckDB twin of :func:`dsir_weights` (1-based list indexing;
    range() exclusive stop mirrors sequence()'s inclusive stop)."""
    raw_src = docs_expr if raw_expr is None else raw_expr

    def feats(src: str) -> str:
        return feats_select_sql(src, n_buckets)

    return f"""
      WITH tc AS (SELECT f, count(*) AS c_t FROM ({feats(target_expr)}) GROUP BY f),
      rc AS (SELECT f, count(*) AS c_r FROM ({feats(raw_src)}) GROUP BY f),
      tt AS (SELECT sum(c_t) AS t_tot FROM tc),
      rt AS (SELECT sum(c_r) AS r_tot FROM rc),
      doc_feats AS (
        -- DISTINCT ids: a duplicate doc_id row would otherwise fan
        -- the join out (2 id rows x both rows' features = doubled
        -- scores) where Spark's explode+groupBy counts each feature
        -- occurrence once
        SELECT d.doc_id, p.f
        FROM (SELECT DISTINCT {id_sql} AS doc_id FROM {docs_expr}) d
        LEFT JOIN (
          SELECT {id_sql} AS doc_id, f FROM ({feats(docs_expr)})
        ) p ON d.doc_id = p.doc_id
      )
      SELECT doc_id,
             CAST(count(f) AS BIGINT) AS n_feats,
             CAST(coalesce(sum(
               CASE WHEN c_t IS NULL OR t_tot IS NULL THEN 0
                    ELSE ({P_SCALE} * c_t) // t_tot END -
               CASE WHEN c_r IS NULL OR r_tot IS NULL THEN 0
                    ELSE ({P_SCALE} * c_r) // r_tot END), 0) AS BIGINT)
               AS score_scaled
      FROM doc_feats
      LEFT JOIN tc USING (f)
      LEFT JOIN rc USING (f)
      CROSS JOIN tt CROSS JOIN rt
      GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# corpus drift monitoring (snapshot-vs-snapshot feature distance)
# ---------------------------------------------------------------------------


def corpus_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    group_col: str = "source",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(group, n_feats_a, n_feats_b, l1_scaled): per-group distribution
    drift between two corpus snapshots.

    The monitoring primitive for a continuously-crawled corpus: did
    source X's content distribution move between last week's snapshot
    and this week's (crawler broke, site redesigned, spam flood,
    dedup misfiring)? Drift is the L1 distance between the hashed-
    bigram feature distributions —

        l1_scaled = Σ_f | (10^6·c_A(f)) // tot_A − (10^6·c_B(f)) // tot_B |

    with the SAME fixed feature space, tokenization, and fixed-point
    probability rendering as DSIR and the LM (one definition of
    "feature" across selection, fluency, and monitoring). Bounds:
    0 = identical distributions, ≤ 2·10^6 = disjoint; exact integer,
    so thresholds behave identically on any cluster and engine.
    Groups present in only one snapshot score against an empty (all-
    zero) distribution — full drift, never silently dropped.

    Scale shape: per-(group, bucket) counts are one explode +
    map-side partial count per snapshot — at most |groups|·n_buckets
    rows each, corpus-size-independent; the distance is one full
    outer NULL-SAFE equi-join on (group, f) + a per-group sum (a NULL
    group is a real group — plain equality would split it into two
    never-matching sides and report full drift on identical data).
    Totals per group ride along via a window on the bounded count
    table, not a second corpus scan.
    """

    def counts(src: DataFrame, cname: str) -> DataFrame:
        from pyspark.sql import Window

        return (
            src.selectExpr(
                f"{group_col} AS grp", f"explode({_feats_expr(n_buckets)}) AS f"
            )
            .groupBy("grp", "f")
            .agg(F.count("*").alias(cname))
            .withColumn(
                f"{cname}_tot", F.sum(cname).over(Window.partitionBy("grp"))
            )
        )

    ca = counts(snap_a, "c_a").alias("ca")
    cb = counts(snap_b, "c_b").alias("cb")
    joined = ca.join(
        cb,
        F.col("ca.grp").eqNullSafe(F.col("cb.grp"))
        & (F.col("ca.f") == F.col("cb.f")),
        "full_outer",
    ).select(
        # under the null-safe join a matched row's grp values are
        # null-safe-equal, so coalesce never mixes groups — it only
        # picks whichever side the one-sided row came from
        F.coalesce(F.col("ca.grp"), F.col("cb.grp")).alias("grp"),
        "c_a", "c_a_tot", "c_b", "c_b_tot",
    )
    pa = F.expr(f"CASE WHEN c_a IS NULL THEN CAST(0 AS BIGINT) ELSE ({P_SCALE} * c_a) div c_a_tot END")
    pb = F.expr(f"CASE WHEN c_b IS NULL THEN CAST(0 AS BIGINT) ELSE ({P_SCALE} * c_b) div c_b_tot END")
    return (
        joined.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.coalesce(F.sum("c_a"), F.lit(0)).cast("long").alias("n_feats_a"),
            F.coalesce(F.sum("c_b"), F.lit(0)).cast("long").alias("n_feats_b"),
            F.sum(F.abs(pa - pb)).cast("long").alias("l1_scaled"),
        )
    )


def corpus_drift_sql(
    snap_a_expr: str,
    snap_b_expr: str,
    group_col: str = "source",
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`corpus_drift`. Snapshot expressions must
    project (doc_id, text, <group_col>)."""

    def counts(src: str, cname: str) -> str:
        # route the group THROUGH the featurizer as its doc_id — no
        # join back, so NULL ids can't be dropped and duplicate ids
        # can't fan counts out (the dsir_weights_sql fan-out lesson),
        # exactly mirroring the Spark side's same-row explode
        inner = f"(SELECT {group_col} AS doc_id, text FROM {src})"
        return (
            f"SELECT doc_id AS grp, f, count(*) AS {cname}, "
            f"sum(count(*)) OVER (PARTITION BY doc_id) AS {cname}_tot "
            f"FROM ({feats_select_sql(inner, n_buckets)}) GROUP BY doc_id, f"
        )

    pa = f"CASE WHEN c_a IS NULL THEN CAST(0 AS BIGINT) ELSE ({P_SCALE} * c_a) // c_a_tot END"
    pb = f"CASE WHEN c_b IS NULL THEN CAST(0 AS BIGINT) ELSE ({P_SCALE} * c_b) // c_b_tot END"
    return f"""
      WITH ca AS ({counts(snap_a_expr, "c_a")}),
      cb AS ({counts(snap_b_expr, "c_b")}),
      joined AS (
        SELECT coalesce(ca.grp, cb.grp) AS grp,
               c_a, c_a_tot, c_b, c_b_tot
        FROM ca FULL OUTER JOIN cb
          ON ca.grp IS NOT DISTINCT FROM cb.grp AND ca.f = cb.f
      )
      SELECT grp AS {group_col},
             CAST(coalesce(sum(c_a), 0) AS BIGINT) AS n_feats_a,
             CAST(coalesce(sum(c_b), 0) AS BIGINT) AS n_feats_b,
             CAST(sum(abs(({pa}) - ({pb}))) AS BIGINT) AS l1_scaled
      FROM joined
      GROUP BY grp
    """
