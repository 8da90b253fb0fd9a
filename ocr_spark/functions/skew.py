"""Skew handling: salted two-phase aggregation (SURVEY.md §4.3; the
north rule's explicit salting requirement).

A hot grouping key sends all its rows to one reducer. Salting splits
each key across ``n_salts`` sub-groups in phase 1 (map-side combine
still applies, and no reducer sees more than ~1/n_salts of a hot
key's rows), then phase 2 merges the tiny per-salt partials — the
classic two-stage rewrite for aggregations whose merge is commutative
and associative (sum/count/min/max, and avg via sum+count).

The doc-skew analog at the kernel layer is
``pipeline.extract.weight_partition`` (heaviest-first hash spread);
join-side skew is AQE's skew-join split. This module covers the third
case: skewed GROUP BY keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phase-1 partial, phase-2 merge per supported aggregate
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with per-key salting.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {sum, count, min, max}. The salt is `rand(seed)`-derived — salt
    ASSIGNMENT does not affect the result for mergeable aggregates
    (any split merges to the same total), and Spark seeds rand per
    partition index so task retries recompute identical salts.

    Result is exactly ``df.groupBy(keys).agg(...)``; only the physical
    shuffle shape changes (two exchanges, the first on keys + salt).
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGEABLE)
    if unknown:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(unknown)}")
    salt = F.floor(F.rand(42) * n_salts).cast("int")
    partials = [
        _MERGEABLE[fn][0](F.col(col)).alias(f"_p_{name}")
        for name, (fn, col) in aggs.items()
    ]
    merged = [
        _MERGEABLE[fn][1](F.col(f"_p_{name}")).alias(name)
        for name, (fn, _col) in aggs.items()
    ]
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*merged)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) left side into
    ``n_salts`` sub-keys, replicate the right side once per salt, and
    join on (keys + salt) — no reducer sees more than ~1/n_salts of a
    hot key's rows. Result is exactly ``left.join(right, on, how)``.

    Use when the right side is too big to broadcast but cheap to
    replicate K times, and the left's key histogram is too skewed for
    a plain shuffle join. (With AQE on, prefer letting
    OptimizeSkewedJoin split at runtime; salting is the static answer
    for AQE-off clusters or pre-committed partitioning.)

    Only inner/left joins: replication would duplicate unmatched
    right rows under right/full semantics."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # a user column named _salt must survive ("result is exactly the
    # plain join"): pick a helper name no input carries
    sc = "_salt"
    while sc in left.columns or sc in right.columns:
        sc += "_"
    salt = F.floor(F.rand(42) * n_salts).cast("int")
    l = left.withColumn(sc, salt)
    r = right.withColumn(
        sc, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [*on, sc], how).drop(sc)


def salted_avg(
    df: DataFrame, keys: list[str], col: str, n_salts: int = 16
) -> Column | DataFrame:
    """Skew-safe average via exact sum+count partials."""
    out = salted_agg(
        df, keys, {"_s": ("sum", col), "_n": ("count", col)}, n_salts
    )
    return out.select(*keys, (F.col("_s") / F.col("_n")).alias(f"avg_{col}"))


def key_skew_stats(
    df: DataFrame, key_sql: str, top_k: int = 20
) -> DataFrame:
    """(key, n_rows, share_ppm, hot_x1000, rank): the ``top_k``
    heaviest grouping keys under ``key_sql`` — the diagnostic to run
    BEFORE sizing a shuffle: ``hot_x1000`` is the key's multiple of
    the uniform per-key mean (x1000 fixed-point), i.e. how many
    reducers' worth of rows land on one reducer if you group by this
    key raw. Read it as the prescription: hot_x1000 ~ 40_000 means
    the key carries 40x its fair share — ``salted_agg`` with
    ``n_salts >= 40`` (or an AQE skew-join) flattens it back to mean.
    ``share_ppm`` is the key's fraction of ALL rows (parts per
    million), the "one key is 30% of the corpus" red flag.

    Overflow discipline: the multiple is computed as
    ``n_rows * 1000 div mean`` (mean = total div n_keys, floored to
    >= 1) — never ``n_rows * n_keys * 1000``, whose product passes
    2^63 at exactly the trillion-row/many-key scale this diagnostic
    targets (Spark would wrap silently, DuckDB would error — a
    cross-engine divergence on top of garbage). ``n_rows * 1000``
    is safe to ~9e15 rows per key. The floored integer mean
    overstates the multiple by < 1 part in mean — noise for a
    diagnostic whose consumers round to a salt count.

    Scale shape: one partial-agg groupBy on the key (the same shuffle
    the diagnosed query would pay, but carrying counts only), a
    distributed TakeOrdered for the top-k (``orderBy().limit()`` —
    the driver sees ``top_k`` rows, never the key census), and the
    corpus totals broadcast from a 1-row aggregate. Deterministic:
    ties order by key ascending NULLS LAST, so the cut at ``top_k``
    is stable across runs and engines. Integer fixed-point
    (non-negative ``div``) keeps both engines bit-equal.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from pyspark.sql import Window

    agg = (
        df.selectExpr(f"({key_sql}) AS key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    totals = agg.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n_keys"),
    )
    top = agg.orderBy(
        F.col("n_rows").desc(), F.col("key").asc_nulls_last()
    ).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.expr("n_rows * 1000000L div _total").alias("share_ppm"),
            F.expr(
                "n_rows * 1000L div greatest(_total div _n_keys, 1L)"
            ).alias("hot_x1000"),
            F.row_number().over(w).alias("rank"),
        )
    )


def key_skew_stats_sql(
    table: str, key_sql: str, top_k: int = 20
) -> str:
    """DuckDB twin — same census, same fixed-point arithmetic
    (``//`` floors, Spark ``div`` truncates; equal on these
    non-negative counts), same (n_rows DESC, key ASC NULLS LAST)
    total order deciding both the top-k cut and ``rank``."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    return f"""
      WITH agg AS (
        SELECT ({key_sql}) AS key, CAST(count(*) AS BIGINT) AS n_rows
        FROM {table} GROUP BY 1
      ),
      tot AS (
        SELECT CAST(sum(n_rows) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM agg
      )
      SELECT key, n_rows,
             n_rows * 1000000 // total AS share_ppm,
             n_rows * 1000 // greatest(total // n_keys, 1) AS hot_x1000,
             CAST(row_number() OVER (
               ORDER BY n_rows DESC, key ASC NULLS LAST) AS INT) AS rank
      FROM agg, tot
      ORDER BY n_rows DESC, key ASC NULLS LAST
      LIMIT {int(top_k)}
    """
