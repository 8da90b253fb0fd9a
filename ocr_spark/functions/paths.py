"""Session path mining: the ordered event-type journeys users take.

The product-analytics staple the funnel can't answer (funnel_counts
checks ONE prescribed order; this discovers which orders actually
happen): sessionize each user's events, render each session as its
ordered event-type path string ('view>click>purchase'), and rank
paths by frequency. The reference has no event analytics at all —
this extends the engine's event surface the way funnel/retention did.

Engine mapping: gaps-and-islands sessionization (the sessionize.py
twin's formulation, gap compared on exact integer epoch microseconds
— interval literals are a dialect trap, integers aren't), then ONE
per-session aggregate that sorts the session's events inside the
aggregate buffer: Spark ``array_sort(collect_list(struct(ts, _eid,
event_type)))`` — the struct field order IS the sort key, with
``_eid = coalesce(event_id, -1)`` and the type as final tie-break so
tied timestamps and NULL ids stay deterministic in both engines — vs
DuckDB ``list(event_type ORDER BY ts, coalesce(event_id, -1),
event_type)``. Paths cap at
``max_steps`` events with a '>…' overflow marker so one pathological
million-event session cannot build a gigabyte string (slice the
sorted list; both engines).

Scale shape: one shuffle on user_id (the session window), one
shuffle on (user, session) collapsed into the same exchange by the
session id being a function of the user partition, one shuffle on
path for the final count (map-side partials), then a global top-k
(TakeOrdered over |distinct paths| aggregate rows — vocabulary-sized,
never corpus-sized). Per-session state is bounded by max_steps after
the slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP_S = 8 * 3600
DEFAULT_K = 20
DEFAULT_MAX_STEPS = 12
_ELLIPSIS = ">…"


def session_paths(
    events: DataFrame,
    gap_s: int = DEFAULT_GAP_S,
    k: int = DEFAULT_K,
    max_steps: int = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """(path, n_sessions, n_users): the ``k`` most frequent session
    paths — '>'-joined event types in (ts, coalesce(event_id, -1),
    event_type) order per gap-based session, truncated to
    ``max_steps`` steps with a '>…' marker. Ties rank
    deterministically (count DESC, path ASC).

    Gap semantics mirror ``sessionize``: an event landing EXACTLY
    ``gap_s`` after its predecessor still joins the session (the
    twin-pinned inclusive boundary); NULL ts/user_id/event_type rows
    are excluded in-plan (they can neither order nor label a step).

    Step order is (ts, coalesce(event_id, -1), event_type): the
    coalesce dodges the Spark-NULLS-FIRST vs DuckDB-NULLS-LAST ASC
    divergence for NULL event_ids (they sort as -1 — before any real
    non-negative id — in BOTH engines; a corpus with genuine negative
    ids needs a different sentinel), and event_type breaks full
    (ts, id) duplicates deterministically.
    """
    if gap_s < 1:
        raise ValueError("gap_s must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    from pyspark.sql import Window

    # cast: parquet written by pandas arrives as TIMESTAMP_NTZ, which
    # unix_micros rejects (the sessionize.py precedent); the cast is a
    # uniform shift, so gap DIFFERENCES are unchanged
    live = events.where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.coalesce(F.col("event_id"), F.lit(-1)).alias("_eid"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "_eid", "event_type")
    gap_us = gap_s * 1_000_000
    new_sess = (
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > F.lit(gap_us)
        )
    ).cast("int")
    sess = live.select(
        "user_id",
        "ts",
        "_eid",
        "event_type",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_sess"),
    )
    steps = F.expr(
        "transform(array_sort(collect_list(struct(ts, _eid, "
        "event_type))), x -> x.event_type)"
    )
    per_sess = sess.groupBy("user_id", "_sess").agg(steps.alias("_steps"))
    path = F.when(
        F.size("_steps") > max_steps,
        F.concat(
            F.array_join(F.slice("_steps", 1, max_steps), ">"),
            F.lit(_ELLIPSIS),
        ),
    ).otherwise(F.array_join("_steps", ">"))
    return (
        per_sess.select("user_id", path.alias("path"))
        .groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(k)
    )


def session_paths_sql(
    table: str = "events",
    gap_s: int = DEFAULT_GAP_S,
    k: int = DEFAULT_K,
    max_steps: int = DEFAULT_MAX_STEPS,
) -> str:
    """DuckDB twin: identical session flags on epoch_us integers,
    ``list(... ORDER BY ts, coalesce(event_id, -1), event_type)`` for
    the ordered steps, identical truncation and tie-break."""
    if gap_s < 1:
        raise ValueError("gap_s must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_steps < 1:
        raise ValueError("max_steps must be >= 1")
    gap_us = gap_s * 1_000_000
    return f"""
      WITH live AS (
        SELECT user_id, ts, event_id, event_type
        FROM {table}
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL
      ),
      flagged AS (
        SELECT *,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {gap_us}
                    THEN 1 ELSE 0 END AS new_sess
        FROM live
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts, coalesce(event_id, -1), event_type)
      ),
      numbered AS (
        SELECT *, sum(new_sess) OVER (
          PARTITION BY user_id
          ORDER BY ts, coalesce(event_id, -1), event_type
          ROWS UNBOUNDED PRECEDING
        ) AS _sess
        FROM flagged
      ),
      per_sess AS (
        SELECT user_id,
               list(event_type
                    ORDER BY ts, coalesce(event_id, -1), event_type)
                 AS _steps
        FROM numbered
        GROUP BY user_id, _sess
      ),
      pathed AS (
        SELECT user_id,
               CASE WHEN len(_steps) > {max_steps}
                    THEN array_to_string(
                           _steps[1:{max_steps}], '>') || '{_ELLIPSIS}'
                    ELSE array_to_string(_steps, '>')
               END AS path
        FROM per_sess
      )
      SELECT path,
             count(*) AS n_sessions,
             count(DISTINCT user_id) AS n_users
      FROM pathed
      GROUP BY path
      ORDER BY n_sessions DESC, path ASC
      LIMIT {k}
    """
