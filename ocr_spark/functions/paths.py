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


# THE session step order, Spark side (the SQL twin's _SESS_ORDER):
# every window that orders a user's events — sessionization, the
# transition lag — builds from this one tuple so the operators cannot
# pair events in an order sessions were not numbered in
_ORDER_COLS = ("ts", "_eid", "event_type")


def _user_order_window():
    from pyspark.sql import Window

    return Window.partitionBy("user_id").orderBy(*_ORDER_COLS)


def _sessionized(events: DataFrame, gap_s: int):
    """Shared sessionization skeleton: (user_id, ts, _eid, event_type,
    _sess) with the gaps-and-islands session id — ONE definition for
    session_paths and transition_profile so membership and step order
    cannot drift between the operators (the _chunk_assigned
    discipline)."""
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
    w = _user_order_window()
    gap_us = gap_s * 1_000_000
    new_sess = (
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > F.lit(gap_us)
        )
    ).cast("int")
    return live.select(
        "user_id",
        "ts",
        "_eid",
        "event_type",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_sess"),
    )


_SESS_ORDER = "ORDER BY ts, coalesce(event_id, -1), event_type"


def _sessionized_sql(table: str, gap_s: int) -> str:
    """DuckDB twin of :func:`_sessionized` as a WITH-body fragment
    ending in the ``numbered`` CTE (callers append their own)."""
    gap_us = gap_s * 1_000_000
    return f"""
      live AS (
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
        WINDOW w AS (PARTITION BY user_id {_SESS_ORDER})
      ),
      numbered AS (
        SELECT *, sum(new_sess) OVER (
          PARTITION BY user_id {_SESS_ORDER}
          ROWS UNBOUNDED PRECEDING
        ) AS _sess
        FROM flagged
      )"""


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
    sess = _sessionized(events, gap_s)
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
    return f"""
      WITH {_sessionized_sql(table, gap_s)},
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


def transition_profile(
    events: DataFrame, gap_s: int = DEFAULT_GAP_S
) -> DataFrame:
    """(from_type, to_type, n_transitions, p_ppm): the first-order
    Markov transition profile of event types WITHIN sessions — the
    aggregate complement of :func:`session_paths` (paths show whole
    journeys; this shows the per-step conditional, the input to
    next-event prediction and funnel design). p_ppm is the exact
    integer conditional probability floor(1e6 * n / n_from) —
    non-negative operands, so Spark ``div`` and DuckDB ``//`` agree.

    Session membership and step order come from the SHARED
    ``_sessionized`` skeleton (the session_paths definition), so a
    transition can never cross a session boundary the path operator
    would also not cross: consecutive rows of the user's order
    transition only when they carry the same session id.

    Scale shape: everything through the lag pass rides the ONE
    user_id Exchange (the transition lag reuses the sessionization
    sort); then one (from, to) aggregate with map-side partials over
    |types|^2-bounded keys and a vocabulary-sized window for the
    denominator. Event rows shuffle once.
    """
    if gap_s < 1:
        raise ValueError("gap_s must be >= 1")
    from pyspark.sql import Window

    sess = _sessionized(events, gap_s)
    w = _user_order_window()
    pairs = sess.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
        (F.lag("_sess").over(w) == F.col("_sess")).alias("_same"),
    ).where(F.col("_same"))
    agg = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wfrom = Window.partitionBy("from_type")
    return agg.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(wfrom).alias("_den"),
    ).selectExpr(
        "from_type",
        "to_type",
        "n_transitions",
        "(CAST(1000000 AS BIGINT) * n_transitions) div _den AS p_ppm",
    )


def transition_profile_sql(
    table: str = "events", gap_s: int = DEFAULT_GAP_S
) -> str:
    """DuckDB twin: the shared sessionization fragment, the identical
    lag pass, and the same integer ppm division."""
    if gap_s < 1:
        raise ValueError("gap_s must be >= 1")
    return f"""
      WITH {_sessionized_sql(table, gap_s)},
      pairs AS (
        SELECT lag(event_type) OVER w AS from_type,
               event_type AS to_type,
               lag(_sess) OVER w = _sess AS _same
        FROM numbered
        WINDOW w AS (PARTITION BY user_id {_SESS_ORDER})
      ),
      agg AS (
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM pairs WHERE _same
        GROUP BY 1, 2
      )
      SELECT from_type, to_type, n_transitions,
             CAST((CAST(1000000 AS BIGINT) * n_transitions)
               // sum(n_transitions) OVER (PARTITION BY from_type)
               AS BIGINT) AS p_ppm
      FROM agg
    """
