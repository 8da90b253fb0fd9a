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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    scale = _scale_expr(vec)
    q = (
        f"transform({vec}, x -> CASE WHEN ({scale}) = 0 THEN 0 ELSE "
        f"CAST(least({Q_MAX}.0, greatest(-{Q_MAX}.0, "
        f"floor(CAST(x AS DOUBLE) / ({scale}) + 0.5d))) AS INT) END)"
    )
    return emb.select(
        "vec_id",
        F.expr(scale).alias("scale"),
        F.expr(q).alias("qvec"),
    )


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
