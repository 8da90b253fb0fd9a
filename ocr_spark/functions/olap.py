"""OLAP breadth operators: rollup cubes, exact percentiles, top-k per
group.

The reference surfaces corpus statistics one flat GROUP BY at a time
(run summaries, /root/reference/webapp/results.py:40-60; per-job file
counts, webapp/jobs.py:171-199). At 100 TB an analyst wants the whole
hierarchy in one pass (per-(source,lang), per-source, grand total),
distribution quantiles, and "the k largest documents per source" —
the three staple OLAP shapes this module adds, each as a single
declarative plan Catalyst can optimize end-to-end.

Scale notes:
- ``rollup_doc_stats``: Spark's ``rollup`` expands grouping sets
  inside ONE hash aggregate (Expand + partial agg -> one shuffle on
  the grouping-set key) — not one job per level. Sums are exact
  integers, so parallel order cannot perturb values.
- ``percentile_chars``: exact percentiles need the per-group value
  multiset; Spark's ``percentile`` aggregate does a partial
  (map-side) collect then merges — one shuffle keyed by group. Fine
  when groups are few and values-per-group fit an executor (chars
  histogram per lang); at 100 TB with huge groups switch to
  ``approx_percentile`` (t-digest sketch, bounded memory) — same
  call shape, documented here as the scale valve.
- ``topk_per_group``: rank-truncating window. Spark pushes a
  per-partition top-k (WindowGroupLimit, Spark 3.5+) below the
  shuffle, so each map task ships only k rows per group — the
  100 TB-safe shape for "largest docs per source".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PCTS = (0.5, 0.9, 0.99)
DEFAULT_K = 5


def rollup_doc_stats(docs: DataFrame) -> DataFrame:
    """(source, lang, gid, n_docs, total_chars) over
    ROLLUP(source, lang): per-(source,lang) rows (gid=0), per-source
    subtotals (gid=1), grand total (gid=3). ``gid`` is the grouping-id
    bit vector — it disambiguates rollup NULLs from (hypothetical)
    data NULLs, so the output is unambiguous without string
    sentinels."""
    return (
        docs.rollup("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "total_chars")
    )


def rollup_doc_stats_sql(table: str = "documents") -> str:
    """DuckDB twin: GROUP BY ROLLUP with the same GROUPING() bit
    order (first listed column = most significant bit, both
    engines)."""
    return f"""
      SELECT source, lang,
             CAST(GROUPING(source, lang) AS BIGINT) AS gid,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM {table}
      GROUP BY ROLLUP (source, lang)
    """


def percentile_chars(docs: DataFrame, pcts: tuple = PCTS) -> DataFrame:
    """Per-lang exact nearest-rank percentiles of document length:
    (lang, n_docs, p50_chars, p90_chars, p99_chars).

    Nearest-rank (value at index ceil(p*n) in the sorted multiset) is
    used instead of linear interpolation deliberately: the result is
    an exact BIGINT drawn from the data, so the cross-engine contract
    cannot be perturbed by last-ulp float interpolation differences.
    Spark side: ``percentile_approx`` with accuracy >= group size is
    EXACT and returns this same nearest-rank element — one partial
    aggregate, one shuffle on lang."""
    aggs = [F.count("*").alias("n_docs")]
    for p in pcts:
        aggs.append(
            F.percentile_approx("n_chars", F.lit(p), F.lit(1_000_000))
            .cast("long")
            .alias(f"p{round(p * 100)}_chars")
        )
    return docs.groupBy("lang").agg(*aggs)


def percentile_chars_sql(
    table: str = "documents", pcts: tuple = PCTS
) -> str:
    """DuckDB twin: quantile_disc picks the same nearest-rank element
    (the discrete quantile definition both engines share for exact
    data)."""
    cols = ", ".join(
        f"CAST(quantile_disc(n_chars, {p}) AS BIGINT) AS p{round(p * 100)}_chars"
        for p in pcts
    )
    return f"""
      SELECT lang, count(*) AS n_docs, {cols}
      FROM {table}
      GROUP BY lang
    """


def topk_per_group(docs: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """The k largest documents per source: (source, rnk, doc_id,
    n_chars), ties broken by doc_id ascending so the result is fully
    deterministic. row_number + rank-filter compiles to
    WindowGroupLimit: each map task pre-truncates to its local top-k
    before the shuffle."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("source", F.col("rnk").cast("long").alias("rnk"), "doc_id", "n_chars")
    )


def topk_per_group_sql(table: str = "documents", k: int = DEFAULT_K) -> str:
    return f"""
      SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars
      FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                 PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
               ) AS rnk
        FROM {table}
      )
      WHERE rnk <= {k}
    """


def cube_doc_stats(docs: DataFrame) -> DataFrame:
    """(source, lang, gid, n_docs, total_chars) over CUBE(source,
    lang): all four grouping sets — per-(source,lang), per-source,
    per-lang, grand total — in ONE Expand+aggregate pass (one shuffle
    on the grouping-set key), completing the rollup family. ``gid``
    disambiguates cube NULLs from data NULLs exactly as in
    :func:`rollup_doc_stats`."""
    return (
        docs.cube("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "total_chars")
    )


def cube_doc_stats_sql(table: str = "documents") -> str:
    return f"""
      SELECT source, lang,
             CAST(GROUPING(source, lang) AS BIGINT) AS gid,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM {table}
      GROUP BY CUBE (source, lang)
    """


def pivot_lang_by_source(docs: DataFrame, langs: tuple = ()) -> DataFrame:
    """Cross-tab: one row per source, one count column per language —
    (source, n_<lang>...). The pivot VALUES are pinned explicitly
    (sorted ``langs``): at scale, letting Spark discover them costs an
    extra distinct-collect job AND makes the output schema
    data-dependent — a pinned vocabulary keeps the plan one
    aggregate pass and the schema stable for downstream consumers.
    Unpinned languages land in nothing (standard pivot semantics);
    absent (source, lang) cells are 0, not NULL, so the table is
    dense."""
    langs = _validated_pivot_values(langs)
    out = (
        docs.groupBy("source")
        .pivot("lang", list(langs))
        .agg(F.count(F.lit(1)))  # '*' is not legal inside a pivot agg
    )
    return out.select(
        "source",
        *[F.coalesce(F.col(l), F.lit(0)).cast("long").alias(f"n_{l}") for l in langs],
    )


def _validated_pivot_values(langs: tuple) -> tuple:
    """Pivot values become OUTPUT COLUMN NAMES (n_<value>) on both
    engines — quotes/spaces/hyphens cannot be escaped consistently in
    an identifier, so reject anything outside [A-Za-z0-9_] up front
    instead of silently producing twins that cannot be compared."""
    langs = tuple(langs) or ("de", "en", "es", "fr", "zh")
    for l in langs:
        if not re.fullmatch(r"[A-Za-z0-9_]+", str(l)):
            raise ValueError(
                f"pivot value {l!r} is not identifier-safe ([A-Za-z0-9_]+)"
            )
    return langs


def pivot_lang_by_source_sql(table: str = "documents", langs: tuple = ()) -> str:
    """DuckDB twin: explicit conditional aggregation (the portable
    spelling of PIVOT — identical cells, stable column order)."""
    langs = _validated_pivot_values(langs)
    cells = ", ".join(
        f"CAST(count(*) FILTER (WHERE lang = '{l}') AS BIGINT) AS n_{l}"
        for l in langs
    )
    return f"SELECT source, {cells} FROM {table} GROUP BY source"


def unpivot_lang_counts(docs: DataFrame, langs: tuple = ()) -> DataFrame:
    """Melt the :func:`pivot_lang_by_source` cross-tab back to long
    form — (source, lang, n_docs), dense (zero cells kept). The
    round-trip partner every wide reporting table needs when a
    downstream consumer wants tidy rows; narrow-side name mapping
    (n_<lang> → <lang>) is applied identically in the twin.

    Scale shape: ``unpivot`` is a zero-shuffle Expand over the wide
    table — the only shuffle in this plan is the pivot's own
    aggregate underneath."""
    langs = _validated_pivot_values(langs)
    wide = pivot_lang_by_source(docs, langs)
    return (
        wide.unpivot(
            ["source"],
            [f"n_{l}" for l in langs],
            "lang",
            "n_docs",
        )
        .withColumn("lang", F.expr("substring(lang, 3)"))
        .select("source", "lang", "n_docs")
    )


def unpivot_lang_counts_sql(table: str = "documents", langs: tuple = ()) -> str:
    """DuckDB twin: UNPIVOT ... INCLUDE NULLS over the same pivoted
    subquery (cells are 0-filled, so nothing is actually NULL)."""
    langs = _validated_pivot_values(langs)
    cols = ", ".join(f"n_{l}" for l in langs)
    return f"""
      SELECT source, substring(lang, 3) AS lang, n_docs
      FROM (
        UNPIVOT ({pivot_lang_by_source_sql(table, langs)})
        ON {cols} INTO NAME lang VALUE n_docs
      )
    """


def chars_histogram(
    docs: DataFrame, lo: int = 0, hi: int = 5_000, n_bins: int = 10
) -> DataFrame:
    """Fixed-width histogram of document length: (bin, n_docs,
    min_chars, max_chars), bins 1..n_bins over [lo, hi) plus the
    standard width_bucket overflow bins (0 = below lo, n_bins+1 =
    at/above hi). Explicit bounds are deliberate: data-driven bounds
    cost an extra full pass AND make the bin edges (the published
    schema of the chart) depend on outliers. One partial-aggregated
    shuffle on the bin id; all-integer output, engine-exact.

    The bin arithmetic is spelled out (integer floor form) rather
    than delegated to a width_bucket builtin: DuckDB has none, and
    running the IDENTICAL expression in both engines is the contract
    discipline anyway.
    """
    if n_bins < 1 or hi <= lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    v = F.col("n_chars")
    interior = 1 + F.floor((v - lo) * n_bins / (hi - lo))
    b = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(n_bins + 1))
        .otherwise(interior)
    )
    return (
        docs.where(F.col("n_chars").isNotNull())
        .groupBy(b.cast("long").alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


def chars_histogram_sql(
    table: str = "documents", lo: int = 0, hi: int = 5_000, n_bins: int = 10
) -> str:
    """DuckDB twin — the identical integer floor-bin expression."""
    bin_expr = (
        f"CASE WHEN n_chars < {lo} THEN 0 "
        f"WHEN n_chars >= {hi} THEN {n_bins + 1} "
        f"ELSE 1 + CAST(floor((n_chars - {lo}) * {n_bins} / ({hi} - {lo})) AS BIGINT) END"
    )
    return f"""
      SELECT CAST({bin_expr} AS BIGINT) AS bin,
             count(*) AS n_docs,
             CAST(min(n_chars) AS BIGINT) AS min_chars,
             CAST(max(n_chars) AS BIGINT) AS max_chars
      FROM {table}
      WHERE n_chars IS NOT NULL
      GROUP BY 1
    """
