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
        "user_id",
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
      SELECT l.user_id AS user_id,
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
        "user_id",
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
      SELECT user_id,
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


# ---------------------------------------------------------------------------
# time-bucket resampling with gap fill
# ---------------------------------------------------------------------------


def bucket_spine(agg: DataFrame, step_s: int) -> DataFrame:
    """THE dense bucket spine: per event_type, every ``step_s`` bucket
    from that type's min to max ``bucket_start`` (tiny — generated
    from the |types|-row bounds table, never from event rows). ONE
    definition shared by :func:`resample_fill` and
    :func:`ocr_spark.functions.anomaly.flags_from_counts` so their
    densification semantics cannot drift (the merged-equals-batch
    invariant of the streaming anomaly monitor rides on it)."""
    bounds = agg.groupBy("event_type").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    )
    return bounds.select(
        "event_type",
        F.explode(F.expr(f"sequence(_lo, _hi, {step_s})")).alias(
            "bucket_start"
        ),
    )


def resample_fill(
    events: DataFrame,
    step_s: int = 3600,
    fill: str = "zero",
) -> DataFrame:
    """(event_type, bucket_start, n_events, sum_value_cents, filled):
    per event type, a DENSE series of ``step_s``-second buckets from
    that type's first to last event — the resample + gap-fill every
    monitoring/feature pipeline needs, because a naive groupBy emits
    NO row for an empty hour and downstream charts/models silently
    interpolate over outages.

    Buckets are integer epoch seconds (``(epoch div step) * step`` as
    BIGINT — timestamps themselves are a cross-engine tz trap; DuckDB
    to_timestamp returns TIMESTAMPTZ). Value sums are integer cents
    (``floor(value*100 + 0.5)`` per row, summed as BIGINT) so the
    aggregate is association-independent and engine-exact (the
    kmeans/tf-idf integer-sum discipline). ``fill``: 'zero' (empty
    buckets report 0/0) or 'ffill' (empty buckets CARRY the last
    non-empty bucket's sum_value_cents — the sensor-reading
    semantics; n_events stays 0 and ``filled`` marks the row either
    way). Rows with NULL ts or NULL event_type carry no bucket/series
    key and are excluded (documented, not silent: they cannot join a
    spine).

    Scale shape: one groupBy (type, bucket) aggregation with map-side
    partials; the spine is generated from the tiny per-type bounds
    table (|types| rows -> sequence explode, buckets only, never
    event rows); one left equi-join spine->agg on (type, bucket); the
    ffill window sorts each type's bucket spine (bounded by time
    range / step, not by event count)."""
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")
    if step_s < 1:
        raise ValueError("step_s must be >= 1")
    from pyspark.sql import Window

    live = events.where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    # floor (not truncate-toward-zero) to mirror DuckDB's
    # floor(epoch/step); positive epochs agree either way, floor is
    # the honest rendering. unix_timestamp drops sub-second fractions
    # — harmless: bucket boundaries are integers, a <1 s fraction
    # cannot move a row across one.
    bucket = (
        F.floor(F.unix_timestamp("ts") / F.lit(float(step_s))) * step_s
    ).cast("long")
    cents = F.expr(
        "CAST(floor(coalesce(value, CAST(0.0 AS DOUBLE)) * 100.0 + 0.5) AS BIGINT)"
    )
    agg = (
        live.select(
            "event_type", bucket.alias("bucket_start"), cents.alias("_c")
        )
        .groupBy("event_type", "bucket_start")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_c").alias("_sum"),
        )
    )
    spine = bucket_spine(agg, step_s)
    j = spine.join(agg, ["event_type", "bucket_start"], "left")
    filled = F.col("_n").isNull()
    if fill == "ffill":
        w = (
            Window.partitionBy("event_type")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        sum_col = F.coalesce(F.last("_sum", ignorenulls=True).over(w), F.lit(0))
    else:
        sum_col = F.coalesce(F.col("_sum"), F.lit(0))
    return j.select(
        "event_type",
        "bucket_start",
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
        sum_col.cast("long").alias("sum_value_cents"),
        filled.alias("filled"),
    )


def resample_fill_sql(
    table: str = "events", step_s: int = 3600, fill: str = "zero"
) -> str:
    """DuckDB twin of :func:`resample_fill` (generate_series is
    inclusive-stop like Spark sequence; epoch() floors to seconds via
    the same integer division)."""
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")
    if step_s < 1:
        raise ValueError("step_s must be >= 1")
    if fill == "ffill":
        sum_col = (
            "coalesce(last_value(_sum IGNORE NULLS) OVER ("
            "PARTITION BY event_type ORDER BY bucket_start "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)"
        )
    else:
        sum_col = "coalesce(_sum, 0)"
    return f"""
      WITH agg AS (
        SELECT event_type,
               CAST(CAST(floor(epoch(ts) / {step_s}) AS BIGINT) * {step_s}
                 AS BIGINT) AS bucket_start,
               count(*) AS _n,
               sum(CAST(floor(coalesce(value, CAST(0.0 AS DOUBLE)) * 100.0
                 + 0.5) AS BIGINT)) AS _sum
        FROM {table}
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
      ),
      bounds AS (
        SELECT event_type, min(bucket_start) AS _lo, max(bucket_start) AS _hi
        FROM agg GROUP BY 1
      ),
      spine AS (
        SELECT event_type,
               unnest(generate_series(_lo, _hi, {step_s})) AS bucket_start
        FROM bounds
      ),
      j AS (
        SELECT s.event_type, s.bucket_start, a._n, a._sum
        FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
      )
      SELECT event_type, bucket_start,
             CAST(coalesce(_n, 0) AS BIGINT) AS n_events,
             CAST({sum_col} AS BIGINT) AS sum_value_cents,
             _n IS NULL AS filled
      FROM j
    """
