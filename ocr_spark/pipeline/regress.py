"""Extraction regression diff: span-sequence equality at corpus scale.

The north-rule invariant — per-document span-sequence equality
(kind, text, media_ref, order) against a reference extraction — is
what the repo's fixture-parity tests check on golden files
(/root/reference parsing fixtures; tests/test_fixture_parity.py).
``span_diff`` turns that check into a distributed operator: run the
NEW pipeline build and the CURRENT production build over the same
corpus (or today's output vs yesterday's stored output) and get a
per-document verdict — the extraction-CI gate a 100 TB pipeline runs
before promoting a kernel change, instead of eyeballing samples.

Scale shape: one equi-join on (doc_id, offset) — the natural uniform
key of flat span tables (AQE handles the residual skew of giant
docs); all comparisons are null-safe scalar equality inside the join
projection, and the per-doc verdict is one partial-aggregated groupBy
on doc_id. Nothing is collected; the "identical corpus" answer is
``WHERE NOT identical LIMIT 1`` on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COLS = ("kind", "text", "media_ref")


def span_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """(doc_id, n_a, n_b, n_equal, first_diff_offset, identical):
    per-document comparison of two flat span tables (doc_id, kind,
    text, media_ref, offset).

    A span position is EQUAL when both sides have a row at that
    (doc_id, offset) and (kind, text, media_ref) agree null-safely;
    a position present on one side only is a diff. ``first_diff_offset``
    is the smallest differing offset, ``-1`` when the document is
    identical (a sentinel, not NULL — the value survives pandas
    round-trips that would float-ify a nullable int column).
    Documents present on one side only appear with ``n_a`` or ``n_b``
    = 0. Precondition (the span-table contract): (doc_id, offset) is
    unique per side; duplicate offsets would fan the join out.
    """

    def tag(df: DataFrame, suf: str) -> DataFrame:
        return df.select(
            "doc_id",
            F.col("offset").cast("int").alias("offset"),
            *[F.col(c).alias(f"{c}_{suf}") for c in _COLS],
            F.lit(1).alias(f"in_{suf}"),
        )

    j = tag(a, "a").join(tag(b, "b"), ["doc_id", "offset"], "full_outer")
    eq = (
        F.col("in_a").isNotNull()
        & F.col("in_b").isNotNull()
        & F.expr(
            " AND ".join(f"{c}_a <=> {c}_b" for c in _COLS)
        )
    ).cast("int")
    per = (
        j.select("doc_id", "offset", eq.alias("eq"),
                 F.coalesce("in_a", F.lit(0)).alias("in_a"),
                 F.coalesce("in_b", F.lit(0)).alias("in_b"))
        .groupBy("doc_id")
        .agg(
            F.sum("in_a").cast("long").alias("n_a"),
            F.sum("in_b").cast("long").alias("n_b"),
            F.sum("eq").cast("long").alias("n_equal"),
            F.coalesce(
                F.min(F.when(F.col("eq") == 0, F.col("offset"))), F.lit(-1)
            ).alias("first_diff_offset"),
        )
    )
    return per.select(
        "doc_id",
        "n_a",
        "n_b",
        "n_equal",
        "first_diff_offset",
        (
            (F.col("n_a") == F.col("n_b"))
            & (F.col("n_equal") == F.col("n_a"))
        ).alias("identical"),
    )


def span_diff_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`span_diff` over two flat span SELECTs."""
    vals = " AND ".join(f"a.{c} IS NOT DISTINCT FROM b.{c}" for c in _COLS)
    return f"""
      WITH a AS (SELECT doc_id, CAST("offset" AS INT) AS o, kind, text,
                        media_ref, 1 AS pa FROM ({a_sql})),
      b AS (SELECT doc_id, CAST("offset" AS INT) AS o, kind, text,
                   media_ref, 1 AS pb FROM ({b_sql})),
      j AS (
        -- presence = the explicit side tag, NOT doc_id nullness: a
        -- legitimate NULL-doc_id row is still a present row
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               coalesce(a.o, b.o) AS o,
               coalesce(pa, 0) AS in_a,
               coalesce(pb, 0) AS in_b,
               CASE WHEN pa = 1 AND pb = 1 AND {vals}
                    THEN 1 ELSE 0 END AS eq
        FROM a FULL OUTER JOIN b
          ON a.doc_id = b.doc_id AND a.o = b.o
      )
      SELECT doc_id,
             CAST(sum(in_a) AS BIGINT) AS n_a,
             CAST(sum(in_b) AS BIGINT) AS n_b,
             CAST(sum(eq) AS BIGINT) AS n_equal,
             CAST(coalesce(min(CASE WHEN eq = 0 THEN o END), -1) AS INT)
               AS first_diff_offset,
             (sum(in_a) = sum(in_b) AND sum(eq) = sum(in_a)) AS identical
      FROM j GROUP BY doc_id
    """
