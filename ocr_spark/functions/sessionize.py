"""Sessionization: gap-based session windows over an event stream.

The standard telemetry/training-log operator the reference's batch
world has no analog for (its closest concept is the per-file job
cursor, /root/reference/webapp/jobs.py:25-51): group each key's
events into sessions separated by >= ``gap`` of inactivity, then
aggregate per session.

Engine mapping: Spark's native ``session_window`` (Catalyst's
SessionWindow + MergingSessionsExec) — one shuffle on the grouping
key, sessions merged inside the sort-based aggregate, no Python. The
SAME expression works in Structured Streaming with a watermark
(`events.withWatermark("ts", ...).groupBy(session_window(...), ...)`),
so the batch contract query doubles as the streaming operator's spec.

Scale notes: the shuffle keys on (user) — uniform unless one user
dominates the corpus; AQE skew-split covers that. Session merging is
sort-based within partitions, O(n log n) per key group, no state
beyond the sort. A 100 TB event log sessionizes in one pass.

Gap-boundary semantics (both engines, pinned by a crafted-edge
differential test): an event landing EXACTLY ``gap`` after its
predecessor still JOINS the session — Spark's merging iterator treats
the window end inclusively (merge while ts <= last + gap) — so the
DuckDB twin opens a new session only on ``ts - lag(ts) > gap``,
strictly.

Sums are exact-integer cents and durations exact-integer microseconds
so parallel aggregation order cannot perturb values (the established
contract-query discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "8 hours"


def sessionize(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str | None = None,
    formatted: bool = True,
) -> DataFrame:
    """(user_id, session_start, n_events, sum_value_cents,
    duration_us): one row per session — maximal runs of a key's events
    with < ``gap`` between consecutive events.

    ``formatted=True`` stringifies session_start for the cross-engine
    contract compare; pass ``formatted=False`` when writing the table
    so consumers keep the typed timestamp (jobs/analytics.py does).

    With ``watermark`` set the SAME plan runs under Structured
    Streaming (MergingSessionsExec keyed state; append mode emits a
    session once the watermark passes its close) — see
    ocr_spark.streaming.sessions.stream_sessions."""
    # NULL-ts rows are excluded EXPLICITLY (session_window silently
    # drops them; the DuckDB twin's gaps-and-islands form would not —
    # the shared in-plan filter makes the exclusion a contract, not an
    # engine accident)
    ev = events.select(
        F.col(key).alias("user_id"),
        F.col(ts).cast("timestamp").alias("ts"),
        F.col(value).alias("value"),
    ).where(F.col("ts").isNotNull())
    if watermark is not None:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
        .select(
            "user_id",
            (
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                if formatted
                else F.col("w.start")
            ).alias("session_start"),
            "n_events",
            "sum_value_cents",
            "duration_us",
        )
    )


def sessionize_sql(table: str = "events", gap: str = DEFAULT_GAP) -> str:
    """DuckDB twin: lag-gap flagging + running-sum session ids (the
    gaps-and-islands formulation of the same operator)."""
    return f"""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL '{gap}'
                    THEN 1 ELSE 0 END AS new_sess
        FROM {table}
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ),
      numbered AS (
        SELECT *, sum(new_sess) OVER (
          PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
        ) AS sess_id
        FROM flagged
      )
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      FROM numbered
      GROUP BY user_id, sess_id
    """
