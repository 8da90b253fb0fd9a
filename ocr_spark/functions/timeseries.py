"""Time-series operators: as-of join and running per-key aggregates.

Spark has no native AS-OF join (DuckDB/Pandas do; Spark users
hand-roll it), yet it is the staple "attribute each event to the most
recent prior event of another kind" shape of telemetry and
training-log analytics. The reference's closest concept is the
per-file job cursor replay (/root/reference/webapp/jobs.py:25-51).

Scale design — why union+window, not a range join:
- The naive formulation (equi-join on key + ts inequality + per-left
  max) explodes to |left|x|right| per key before the max prunes it.
- Instead both sides are UNIONed, tagged, and sorted once per key:
  a single shuffle on the key, a single per-partition sort, and a
  running ``last(non-null)`` carry — O(n log n) per key group, no
  pair blowup, AQE-skew-splittable. This is the merge-join shape a
  time-series engine would use, expressed declaratively.
- The carried right-side payload travels as ONE struct column so a
  legitimately-NULL attribute inside a right row cannot splice values
  from two different right rows (``last(ignorenulls)`` skips NULLs
  per-column otherwise).

Tie semantics: a right row at exactly the left row's timestamp
MATCHES (as-of <=), pinned by sorting right rows before left rows at
equal timestamps — identical to DuckDB's ``ASOF JOIN ... ON l.ts >=
r.ts`` inclusive bound, which the oracle twin uses. Among RIGHT rows
sharing a (user, ts), the greatest event_id wins — enforced by the
window sort order here and by a pre-join max-dedup in the SQL twin
(raw ASOF picks an arbitrary tied row), so both engines are
deterministic and identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_events(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    formatted: bool = True,
) -> DataFrame:
    """Attribute each ``left_type`` event to the most recent <=-prior
    ``right_type`` event of the same user: (user_id, event_id, ts,
    matched_event_id, matched_ts, lag_us). Unmatched lefts keep the
    row (LEFT as-of semantics).

    ``formatted=True`` (the contract-query shape) stringifies
    timestamps and replaces NULLs with ''/-1 sentinels so the
    cross-engine text compare is NaN-free; pass ``formatted=False``
    when WRITING the result (jobs/analytics.py does) — consumers get
    typed timestamps (predicate pushdown on time ranges works) and
    real NULLs for unmatched rows."""
    # NULL-ts events have no place on a timeline: excluded in-plan,
    # and identically in the SQL twin (engines otherwise disagree —
    # Spark windows sort NULLs first, DuckDB ASOF matches them)
    ev = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    ).where(F.col("ts").isNotNull())
    left = ev.where(F.col("event_type") == left_type).select(
        "user_id", "event_id", "ts", F.lit(1).alias("is_left"),
        F.lit(None).cast("struct<event_id:long,ts:timestamp>").alias("r"),
    )
    # a NULL-user right row can never equality-match in SQL — drop it
    # here too so the window's NULL-key partition can't carry it to a
    # NULL-user left row (those stay unmatched, like the twin)
    right = ev.where(
        F.col("event_type") == right_type
    ).where(F.col("user_id").isNotNull()).select(
        "user_id", F.lit(None).cast("long").alias("event_id"),
        "ts", F.lit(0).alias("is_left"),
        F.struct("event_id", "ts").alias("r"),
    )
    # right rows sort before left rows at equal ts => inclusive
    # as-of; among tied right rows the greatest event_id sorts last,
    # so last(r) picks it deterministically
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left", F.col("r.event_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = left.unionByName(right).withColumn(
        "m", F.last("r", ignorenulls=True).over(w)
    )
    matched = u.where(F.col("is_left") == 1)
    lag = F.unix_micros("ts") - F.unix_micros("m.ts")
    if not formatted:
        return matched.select(
            "user_id",
            "event_id",
            "ts",
            F.col("m.event_id").alias("matched_event_id"),
            F.col("m.ts").alias("matched_ts"),
            lag.alias("lag_us"),
        )
    return matched.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.coalesce(F.col("m.event_id"), F.lit(-1)).alias("matched_event_id"),
        F.coalesce(
            F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("matched_ts"),
        F.coalesce(lag, F.lit(-1)).alias("lag_us"),
    )


def asof_join_events_sql(
    table: str = "events",
    left_type: str = "purchase",
    right_type: str = "click",
) -> str:
    """DuckDB twin: the native ASOF LEFT JOIN (inclusive >= bound)."""
    return f"""
      SELECT CAST(l.user_id AS BIGINT) AS user_id,
             CAST(l.event_id AS BIGINT) AS event_id,
             strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
             CAST(coalesce(r.event_id, -1) AS BIGINT) AS matched_event_id,
             coalesce(strftime(r.ts, '%Y-%m-%d %H:%M:%S'), '') AS matched_ts,
             CAST(coalesce(epoch_us(l.ts) - epoch_us(r.ts), -1) AS BIGINT)
               AS lag_us
      FROM (SELECT * FROM {table}
            WHERE event_type = '{left_type}' AND ts IS NOT NULL) l
      ASOF LEFT JOIN
           (SELECT user_id, ts, max(event_id) AS event_id
            FROM {table}
            WHERE event_type = '{right_type}' AND ts IS NOT NULL
              AND user_id IS NOT NULL
            GROUP BY user_id, ts) r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running aggregates in event-time order: (user_id,
    event_id, running_n, running_cents, gap_us). One shuffle on
    user_id, one per-partition sort, all exact integers (value sums
    as cents, gaps as microseconds; first event's gap is -1)."""
    # NULL-ts rows excluded (see asof_join_events): engines order
    # NULLs differently inside windows, so a shared timeline rule is
    # the only deterministic contract
    ev = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).where(F.col("ts").isNotNull())
    # event_id tie-break: two events of one user at the same ts must
    # get the same running assignment in both engines
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("running_n"),
        F.sum("cents").over(w).alias("running_cents"),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wl)),
            F.lit(-1),
        ).alias("gap_us"),
    )


def running_user_stats_sql(table: str = "events") -> str:
    return f"""
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(event_id AS BIGINT) AS event_id,
             count(*) OVER w_run AS running_n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w_run
                  AS BIGINT) AS running_cents,
             CAST(coalesce(
               epoch_us(ts) - epoch_us(lag(ts) OVER w_ord), -1
             ) AS BIGINT) AS gap_us
      FROM {table}
      WHERE ts IS NOT NULL
      WINDOW w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING),
             w_ord AS (PARTITION BY user_id ORDER BY ts, event_id)
    """
