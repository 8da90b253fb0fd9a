"""int8 embedding quantization — the storage/bandwidth lever for ANN
at corpus scale: a 768-dim float32 vector is 3 KB; max-abs-scaled
int8 is 768 B + one scale, so the same cluster holds 4x the vectors
per byte of shuffle/cache, at a bounded per-component error of
scale/2 (verified by test, along with top-k recall vs exact cosine).

Quantization rule (engine-portable, integer-exact):
  scale = max(|v_i|) / 127     (0 for empty / all-zero vectors)
  q_i   = clamp(floor(v_i / scale + 0.5), -127, 127)
floor(x + 0.5) instead of round() because the two engines' round()
half-case conventions differ; floor is IEEE-identical in both. All
arithmetic in DOUBLE (float inputs widen exactly in both engines).

Scale shape: zero shuffle — pure array expressions in the scan stage;
the output schema is (vec_id, scale, qvec array<int>), one row per
input row. Cast qvec to tinyint at the storage sink; it stays int
here so both engines hash-compare the same logical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.functions.text import floor6

Q_MAX = 127


def _scale_expr(vec: str) -> str:
    return (
        f"coalesce(array_max(transform({vec}, "
        f"x -> abs(CAST(x AS DOUBLE)))), CAST(0 AS DOUBLE)) / {Q_MAX}.0"
    )


def quantize_embeddings(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """(vec_id, scale, qvec): max-abs int8 quantization per vector.
    Empty or all-zero vectors get scale 0 and an all-zero qvec (the
    dequantized vector is the zero vector, cosine-undefined exactly
    like the input)."""
    # scale is materialized as a COLUMN first: inlining its array_max
    # aggregate inside the transform lambda would re-evaluate it per
    # ELEMENT — O(dim^2) per row (measured 3.6 s vs 0.6 s at sf0.1)
    scaled = emb.select(
        "vec_id",
        F.expr(_scale_expr(vec)).alias("scale"),
        F.col(vec).alias("_v"),
    )
    q = (
        f"transform(_v, x -> CASE WHEN scale = 0 THEN 0 ELSE "
        f"CAST(least({Q_MAX}.0, greatest(-{Q_MAX}.0, "
        f"floor(CAST(x AS DOUBLE) / scale + 0.5d))) AS INT) END)"
    )
    return scaled.select("vec_id", "scale", F.expr(q).alias("qvec"))


def dequantize(qemb: DataFrame) -> DataFrame:
    """(vec_id, embedding array<double>): the approximate vector
    q_i * scale; exact round-trip error per component is <= scale/2."""
    return qemb.select(
        "vec_id",
        F.expr("transform(qvec, q -> CAST(q AS DOUBLE) * scale)").alias(
            "embedding"
        ),
    )


def quantize_flat_sql(table: str = "embeddings", vec: str = "embedding") -> str:
    """DuckDB twin in the FLAT contract shape (vec_id, scale, pos,
    qval) — one row per vector component, pos 0-based — mirroring the
    posexplode form the Spark contract query emits (array columns
    don't survive the driver's pandas value compare)."""
    scale = (
        f"coalesce(list_max(list_transform({vec}, "
        f"x -> abs(CAST(x AS DOUBLE)))), 0.0) / {Q_MAX}.0"
    )
    return f"""
      WITH scaled AS (
        SELECT vec_id, {scale} AS scale, {vec} AS v FROM {table}
      )
      SELECT vec_id, scale,
             CAST(u.i - 1 AS INT) AS pos,
             CASE WHEN scale = 0 THEN 0 ELSE
               CAST(least({Q_MAX}.0, greatest(-{Q_MAX}.0,
                 floor(CAST(v[u.i] AS DOUBLE) / scale + 0.5))) AS INT)
             END AS qval
      FROM scaled, LATERAL unnest(generate_series(1, len(v))) AS u(i)
    """


def quantize_flat(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """Spark side of the flat contract shape (see quantize_flat_sql)."""
    q = quantize_embeddings(emb, vec)
    return q.select(
        "vec_id", "scale", F.posexplode("qvec").alias("pos", "qval")
    )


# ---------------------------------------------------------------------------
# int8 ANN search path
# ---------------------------------------------------------------------------

_INT_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def ann_quantized_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10, vec: str = "embedding"
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): exact top-k cosine over the
    INT8-quantized vectors — the search an int8 SIMD ANN kernel runs.
    Scales cancel in cosine, so ranking needs only the integer dot
    products and integer squared norms (exact BIGINT sums — the float
    work is two sqrt + one divide per pair, engine-identical), which
    is why int8 quantization costs recall only through the rounding
    of the components, not through the scoring math.

    Same join/window shape as ``similarity.cosine_topk`` (broadcast
    tiny query side, window top-k, neighbor-asc tie-break); zero-norm
    vectors are excluded from both sides (cosine undefined).

    The quantized index (vec_id, qvec, nsq) is materialized ONCE via
    localCheckpoint before the search: left lazy, Spark collapses the
    quantization projection into the nested-loop join and recomputes
    the per-vector transform for every (query, candidate) PAIR —
    measured 4x slower at sf0.1. Building the int8 index once and
    searching it many times is also the production shape (that is the
    entire point of quantizing).
    """
    nsq = _INT_DOT.format(a="qvec", b="qvec")
    base = (
        quantize_embeddings(emb, vec)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            "qvec",
            F.expr(nsq).alias("nsq"),
        )
        .where(F.col("nsq") > 0)
        .localCheckpoint()
    )
    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("nsq").alias("q_nsq"),
    )
    cos = F.expr(
        "CAST(" + _INT_DOT.format(a="q_qvec", b="qvec") + " AS DOUBLE)"
        " / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(nsq AS DOUBLE)))"
    )
    pairs = (
        F.broadcast(q)
        .join(base, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            floor6(F.col("cos_raw")).alias("cos"),
        )
    )


def ann_quantized_topk_sql(
    table: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    vec: str = "embedding",
) -> str:
    """DuckDB twin: identical quantization, exact integer dots via
    list_dot_product (values < 2^53, so its DOUBLE result is exact),
    and the same cos formula / tie-break."""
    scale = (
        f"coalesce(list_max(list_transform({vec}, "
        f"x -> abs(CAST(x AS DOUBLE)))), 0.0) / {Q_MAX}.0"
    )
    qvec = (
        f"list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE "
        f"CAST(least({Q_MAX}.0, greatest(-{Q_MAX}.0, "
        f"floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT) END)"
    )
    return f"""
      WITH scaled AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, {scale} AS scale,
               {vec} AS v
        FROM {table}
      ),
      q8 AS (
        SELECT vec_id, {qvec} AS qvec FROM scaled
      ),
      base AS (
        SELECT vec_id, qvec,
               CAST(list_dot_product(qvec, qvec) AS BIGINT) AS nsq
        FROM q8
      ),
      pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(CAST(list_dot_product(q.qvec, c.qvec) AS BIGINT) AS DOUBLE)
                 / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))
                 AS cos_raw
        FROM base q JOIN base c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {n_queries} AND q.nsq > 0 AND c.nsq > 0
      ),
      ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_raw DESC, neighbor_id ASC) AS rank,
               cos_raw
        FROM pairs
      )
      SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             floor(cos_raw * 1000000.0) / 1000000.0 AS cos
      FROM ranked WHERE rank <= {k}
    """
