"""Product quantization: the memory-bounded ANN representation
(Jégou et al. 2011, public; the PQ half of the FAISS IVF-PQ standard).
Completes the repo's ANN family: brute cosine -> LSH/multi-probe ->
IVF (coarse cells) -> int8 (scalar quantization) -> PQ (vector
codebooks: 64 float32 dims -> M small codes — the baked books use
M=16 subspaces x 16 codes = sixteen 4-bit codes, a 32x compression —
which is what actually fits 10^12 vectors in cluster RAM).

- ``pq_encode``: per subspace, argmin squared-L2 against the frozen
  literal codebook — a pure scan-stage expression (no join, no
  shuffle), exactly like the trained-IVF assignment. At 100 TB this
  is the one full pass the index build costs.
- ``pq_adc_topk``: asymmetric distance computation — the query stays
  RAW (broadcast, tiny) and the database side is codes-only; the
  distance is the sum over subspaces of squared-L2 between the
  query's subvector and the centroid its neighbor's code names.
  Ranking shuffles only (query_id, neighbor_id, dist) rows.

Codebooks are trained offline on a SAMPLE (scripts/
train_pq_codebooks.py, FAISS practice) and baked as literals —
a frozen input artifact like the IVF centroids, so the Spark
expression and the DuckDB twin share bit-identical tables. All
distance folds are the repo's sequential left-fold convention, so
argmin/rank decisions agree across engines exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.text import floor6, floor6_sql

# the repo's ONE literal-double-array rendering convention (keeps the
# Spark expression and the DuckDB twin bit-identical) lives in
# similarity.py — reuse it, never re-render
from ocr_spark.functions.similarity import (
    _plane_lit_expr as _cent_lit_expr,
    _plane_lit_sql as _cent_lit_sql,
)

N_QUERIES = 5
TOP_K = 10


def _dims(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    m = len(codebooks)
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    if any(len(b) != k for b in codebooks) or any(
        len(c) != ds for b in codebooks for c in b
    ):
        raise ValueError("ragged codebooks")
    return m, k, ds


def _l2_expr(sub: str, cent_lit: str) -> str:
    """Spark: sequential-fold squared L2 between a slice expression
    and a literal centroid array."""
    return (
        f"aggregate(zip_with({sub}, {cent_lit}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _l2_sql(sub: str, cent_lit: str, ds: int) -> str:
    """DuckDB twin: same left fold over the same element order."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {ds + 1}), i -> "
        f"(CAST(({sub})[i] AS DOUBLE) - ({cent_lit})[i]) * "
        f"(CAST(({sub})[i] AS DOUBLE) - ({cent_lit})[i]))), (acc, v) -> acc + v)"
    )


def _codes_expr(codebooks, vec: str = "embedding") -> str:
    """Spark expr: array<int> of per-subspace argmin codes (ties ->
    lowest code, via array_position-of-min)."""
    m, k, ds = _dims(codebooks)
    per_sub = []
    for mi in range(m):
        sub = f"slice({vec}, {mi * ds + 1}, {ds})"
        dists = "array(" + ", ".join(
            _l2_expr(sub, _cent_lit_expr(codebooks[mi][ci])) for ci in range(k)
        ) + ")"
        per_sub.append(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"
        )
    return "array(" + ", ".join(per_sub) + ")"


def _codes_sql(codebooks, vec: str = "embedding") -> str:
    m, k, ds = _dims(codebooks)
    per_sub = []
    for mi in range(m):
        sub = f"{vec}[{mi * ds + 1}:{mi * ds + ds}]"
        dists = "[" + ", ".join(
            _l2_sql(sub, _cent_lit_sql(codebooks[mi][ci]), ds) for ci in range(k)
        ) + "]"
        per_sub.append(
            f"CAST(list_position({dists}, list_min({dists})) - 1 AS INT)"
        )
    return "[" + ", ".join(per_sub) + "]"


def pq_encode(emb: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes): each vector compressed to M per-subspace
    codebook codes — the PQ index build, a scan-stage expression."""
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr(_codes_expr(codebooks)).alias("codes"),
    )


def pq_encode_sql(
    codebooks: list[list[list[float]]], table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`pq_encode`."""
    return (
        f"SELECT CAST(vec_id AS BIGINT) AS vec_id, "
        f"{_codes_sql(codebooks)} AS codes FROM {table}"
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): ADC top-k — raw query vs
    PQ-coded database. dist is the PQ approximation of squared L2
    (sum over subspaces of ||q_sub - centroid[code]||^2); ties rank
    by neighbor_id so both engines agree."""
    m, n_codes, ds = _dims(codebooks)
    coded = pq_encode(emb, codebooks)
    q = emb.select(
        F.col("vec_id").cast("long").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    ).where(F.col("query_id") < n_queries)
    terms = []
    for mi in range(m):
        q_sub = f"slice(q_emb, {mi * ds + 1}, {ds})"
        cb = "array(" + ", ".join(
            _cent_lit_expr(codebooks[mi][ci]) for ci in range(n_codes)
        ) + ")"
        terms.append(_l2_expr(q_sub, f"element_at({cb}, codes[{mi}] + 1)"))
    dist = "(" + " + ".join(terms) + ")"
    pairs = (
        F.broadcast(q)
        .join(coded, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )


def pq_adc_topk_sql(
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> str:
    """DuckDB twin of :func:`pq_adc_topk` — same code argmins, same
    per-subspace fold order, same (dist, neighbor_id) tie-break."""
    m, n_codes, ds = _dims(codebooks)
    terms = []
    for mi in range(m):
        q_sub = f"q.q_emb[{mi * ds + 1}:{mi * ds + ds}]"
        cb = "[" + ", ".join(
            _cent_lit_sql(codebooks[mi][ci]) for ci in range(n_codes)
        ) + "]"
        # DuckDB list indexing is 1-based; codes[] itself is a list
        terms.append(_l2_sql(q_sub, f"({cb})[c.codes[{mi + 1}] + 1]", ds))
    dist = "(" + " + ".join(terms) + ")"
    return f"""
      WITH coded AS ({pq_encode_sql(codebooks, table)}),
      q AS (
        SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS q_emb
        FROM {table} WHERE CAST(vec_id AS BIGINT) < {n_queries}
      ),
      pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {dist} AS dist_raw
        FROM q JOIN coded c ON c.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_raw ASC, neighbor_id ASC) AS rank,
               dist_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             {floor6_sql('dist_raw')} AS dist
      FROM ranked WHERE rank <= {k}
    """


def pq_encode_flat(
    emb: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(vec_id, subspace, code): pq_encode with the codes array
    flattened — the contract-query shape (the driver's value-hash
    compares scalars)."""
    return pq_encode(emb, codebooks).select(
        "vec_id", F.posexplode("codes").alias("subspace", "code")
    )


def pq_encode_flat_sql(
    codebooks: list[list[list[float]]], table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`pq_encode_flat` (unnest WITH ORDINALITY
    is 1-based; subspace matches Spark's 0-based posexplode)."""
    return f"""
      SELECT vec_id, CAST(u.i - 1 AS INT) AS subspace, CAST(codes[u.i] AS INT) AS code
      FROM ({pq_encode_sql(codebooks, table)}),
           LATERAL unnest(generate_series(1, {len(codebooks)})) AS u(i)
    """


def ivfpq_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, neighbor_id, rank, dist): IVF-PQ — the FAISS index
    composition. The coarse quantizer (trained spherical-k-means
    cells, shared with ivf_topk) prunes candidates to the query's own
    cell (nprobe=1); PQ asymmetric distance ranks within it.

    This is the shape that searches 10^12 vectors: candidates per
    query ~ n/cells instead of n, each candidate costing an M-term
    table lookup instead of a 64-dim float scan. One scan computes
    BOTH quantizations (cell argmax + code argmins are expressions
    over the same row — no self-join); the probe join is centroid-equi
    with the tiny query side broadcast.
    """
    from ocr_spark.functions.similarity import _assignments

    m, n_codes, ds = _dims(codebooks)
    coded = _assignments(emb, len(centroids), centroids).select(
        "vec_id",
        "centroid",
        "embedding",
        F.expr(_codes_expr(codebooks)).alias("codes"),
    )
    q = coded.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("centroid").alias("q_centroid"),
    )
    terms = []
    for mi in range(m):
        q_sub = f"slice(q_emb, {mi * ds + 1}, {ds})"
        cb = "array(" + ", ".join(
            _cent_lit_expr(codebooks[mi][ci]) for ci in range(n_codes)
        ) + ")"
        terms.append(_l2_expr(q_sub, f"element_at({cb}, codes[{mi}] + 1)"))
    dist = "(" + " + ".join(terms) + ")"
    pairs = (
        F.broadcast(q)
        .join(
            coded,
            (F.col("centroid") == F.col("q_centroid"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(dist).alias("dist_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", floor6(F.col("dist_raw")).alias("dist")
        )
    )


def ivfpq_topk_sql(
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk` — same literal centroid
    argmax as ivf_topk_trained_sql, same code argmins and ADC folds
    as pq_adc_topk_sql, same (dist, neighbor_id) tie-break."""
    from ocr_spark.functions.similarity import _norm_sql, _dot_sql

    m, n_codes, ds = _dims(codebooks)
    dim = len(centroids[0])
    unit = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST(embedding[i] AS DOUBLE) / {_norm_sql('embedding', dim)})"
    )
    dots = "[" + ", ".join(
        _dot_sql("u", _cent_lit_sql(c), dim) for c in centroids
    ) + "]"
    terms = []
    for mi in range(m):
        q_sub = f"q.q_emb[{mi * ds + 1}:{mi * ds + ds}]"
        cb = "[" + ", ".join(
            _cent_lit_sql(codebooks[mi][ci]) for ci in range(n_codes)
        ) + "]"
        terms.append(_l2_sql(q_sub, f"({cb})[c.codes[{mi + 1}] + 1]", ds))
    dist = "(" + " + ".join(terms) + ")"
    return f"""
      WITH base AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding, {unit} AS u
        FROM {table}
      ),
      coded AS (
        SELECT vec_id, embedding,
               CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid,
               {_codes_sql(codebooks)} AS codes
        FROM (SELECT vec_id, embedding, {dots} AS dots FROM base)
      ),
      q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, centroid AS q_centroid
        FROM coded WHERE vec_id < {n_queries}
      ),
      pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {dist} AS dist_raw
        FROM q JOIN coded c
          ON c.centroid = q.q_centroid AND c.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_raw ASC, neighbor_id ASC) AS rank,
               dist_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             {floor6_sql('dist_raw')} AS dist
      FROM ranked WHERE rank <= {k}
    """
