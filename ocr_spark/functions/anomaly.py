"""Rolling-window anomaly detection over resampled event series.

The monitoring-side operator every ingest pipeline needs once it runs
continuously (the reference's closest concept is the per-run summary
counts it renders in the UI, /root/reference/webapp/results.py — a
human eyeballs them; at 10^12 docs nobody eyeballs anything): flag
time buckets whose event count deviates from the trailing window by
more than ``tau`` standard deviations.

Engine mapping and the exactness trick: a textbook z-score needs
mean, variance, a square root and a division — four float operations
whose results differ between Spark's and DuckDB's libm/association
and would poison the hash compare. The test

    |x - mean| > tau * stddev

squares to

    (w*x - s)^2 > tau^2 * (w*ssq - s^2)

after multiplying through by w^2 (w = window size, s = trailing sum,
ssq = trailing sum of squares): every term is an INTEGER and ``tau``
enters only as tau^2, so any rational tau keeps the whole predicate
in exact arithmetic — no division, no sqrt, no float anywhere. Both
engines evaluate the identical expression; every squaring casts its
FACTORS to DECIMAL(19,0) first (a BIGINT square like n_events *
n_events overflows int64 at counts ~3.1*10^9 — Spark 4 ANSI kills
the job, DuckDB raises; 19,0 x 19,0 multiplies at full precision in
both engines) so the predicate survives per-bucket counts up to the
remaining BIGINT-linear bound, w*x at ~3.8*10^17 for w=24.

Variance-zero windows (a constant trailing series) flag ANY deviation:
the predicate degenerates to (w*x - s)^2 > 0, which is exactly "x !=
the constant" — the natural limit, documented rather than special-
cased. Buckets whose trailing window is not yet full (the first
``window`` buckets of each series) are never flagged (insufficient
evidence), reported with is_anomaly = false and window_full = false.

Scale shape: one resample aggregation (map-side partials on
(event_type, bucket)), a tiny per-type spine, then ONE window pass
per type ordered by bucket — the spine is dense by construction so
ROWS BETWEEN window preceding AND 1 preceding IS the trailing time
window; state is O(window) per partition. Series count = |event
types| (or any key the caller resamples by), each independent — a
100 TB event log resamples in one shuffle and the window pass never
sees raw events, only buckets (bounded by time range / step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.timeseries import resample_fill, resample_fill_sql

DEFAULT_WINDOW = 24  # trailing buckets (one day of hourly buckets)
DEFAULT_TAU2 = 9  # tau = 3 sigma; the predicate uses tau^2 so any
#                   rational tau^2 stays in exact integer arithmetic

_DEC = "DECIMAL(38,0)"


def anomaly_flags(
    events: DataFrame,
    step_s: int = 3600,
    window: int = DEFAULT_WINDOW,
    tau2: int = DEFAULT_TAU2,
) -> DataFrame:
    """(event_type, bucket_start, n_events, base_n, base_sum,
    is_anomaly, window_full): per event type's dense ``step_s``-second
    series, flag buckets where (w*x - s)^2 > tau2 * (w*ssq - s^2)
    over the trailing ``window`` buckets (current bucket excluded —
    a spike must not suppress its own detection).

    ``base_n``/``base_sum`` expose the trailing-window evidence so a
    consumer can rank flags by deviation without re-running the
    window. Empty trailing buckets count as 0 events (the resample's
    zero-fill IS the right prior for counts: an empty hour is an
    observation, not a gap).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    if tau2 < 0:
        raise ValueError("tau2 must be >= 0")
    dense = resample_fill(events, step_s=step_s, fill="zero").select(
        "event_type", "bucket_start", "n_events"
    )
    return _flags_over_dense(dense, window, tau2)


def flags_from_counts(
    counts: DataFrame,
    step_s: int = 3600,
    window: int = DEFAULT_WINDOW,
    tau2: int = DEFAULT_TAU2,
) -> DataFrame:
    """:func:`anomaly_flags` over PRE-BUCKETED counts (event_type,
    bucket_start, n_events) instead of raw events — the entry point
    for maintained count state (the streaming monitor's merged state,
    a rolled-up warehouse table). Sparse input is densified on THE
    shared spine (:func:`ocr_spark.functions.timeseries.bucket_spine`
    — resample_fill's own definition, so batch and counts paths
    cannot drift), then the SAME window predicate runs — one flag
    definition for batch and streaming (merged-equals-batch is
    test-pinned on it). Duplicate (type, bucket) rows are summed
    (partial counts from different micro-batches), NULL keys dropped
    like the event path drops NULL ts/type rows.

    Grid guard: a bucket_start off the ``step_s`` grid cannot join
    the spine — the spine's LEFT join would silently DROP that count
    and flag garbage — so misaligned input raises instead (one
    limit-1 probe; counts written at a different step than they are
    read is a config bug, not data)."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if tau2 < 0:
        raise ValueError("tau2 must be >= 0")
    if step_s < 1:
        raise ValueError("step_s must be >= 1")
    from ocr_spark.functions.timeseries import bucket_spine

    live = counts.where(
        F.col("event_type").isNotNull() & F.col("bucket_start").isNotNull()
    )
    off_grid = (
        live.where(F.pmod(F.col("bucket_start"), F.lit(step_s)) != 0)
        .limit(1)
        .collect()
    )
    if off_grid:
        r = off_grid[0]
        raise ValueError(
            f"bucket_start {r.bucket_start} (event_type "
            f"{r.event_type!r}) is off the step_s={step_s} grid — "
            "counts were bucketed at a different step than they are "
            "being read at"
        )
    agg = live.groupBy("event_type", "bucket_start").agg(
        F.sum("n_events").cast("long").alias("_n")
    )
    spine = bucket_spine(agg, step_s)
    dense = spine.join(agg, ["event_type", "bucket_start"], "left").select(
        "event_type",
        "bucket_start",
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_events"),
    )
    return _flags_over_dense(dense, window, tau2)


def _flags_over_dense(dense: DataFrame, window: int, tau2: int) -> DataFrame:
    """THE flag predicate over a dense (event_type, bucket_start,
    n_events) series — shared by the raw-event and counts-state entry
    points so the two can never diverge."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-window, -1)
    )
    base_n = F.count("n_events").over(w)
    base_sum = F.sum("n_events").over(w)
    # square in DECIMAL: n_events * n_events in BIGINT overflows at
    # counts ~3.1e9 (ANSI: job killed; non-ANSI: silent wrong flags)
    base_ssq = F.sum(
        F.expr(
            "CAST(n_events AS DECIMAL(19,0))"
            " * CAST(n_events AS DECIMAL(19,0))"
        )
    ).over(w)
    sized = dense.select(
        "event_type",
        "bucket_start",
        "n_events",
        base_n.cast("long").alias("base_n"),
        F.coalesce(base_sum, F.lit(0)).cast("long").alias("base_sum"),
        F.coalesce(base_ssq, F.lit(0)).cast(_DEC).alias("_ssq"),
    )
    # (w*x - s)^2 > tau2 * (w*ssq - s^2), exact in DECIMAL(38,0).
    dev = F.expr(
        f"CAST({window} * n_events - base_sum AS {_DEC})"
        f" * CAST({window} * n_events - base_sum AS {_DEC})"
    )
    spread = F.expr(
        f"CAST({tau2} AS {_DEC}) * ("
        f"CAST({window} AS {_DEC}) * CAST(_ssq AS {_DEC})"
        f" - CAST(base_sum AS {_DEC}) * CAST(base_sum AS {_DEC}))"
    )
    full = F.col("base_n") == window
    return sized.select(
        "event_type",
        "bucket_start",
        "n_events",
        "base_n",
        "base_sum",
        (full & (dev > spread)).alias("is_anomaly"),
        full.alias("window_full"),
    )


def anomaly_flags_sql(
    table: str = "events",
    step_s: int = 3600,
    window: int = DEFAULT_WINDOW,
    tau2: int = DEFAULT_TAU2,
) -> str:
    """DuckDB twin: the resample twin as a CTE, then the identical
    integer predicate (DuckDB multiplies DECIMAL(38,0) at full
    precision like Spark; both sides cast every factor explicitly)."""
    if window < 2:
        raise ValueError("window must be >= 2")
    if tau2 < 0:
        raise ValueError("tau2 must be >= 0")
    dec = _DEC
    return f"""
      WITH dense AS (
        SELECT event_type, bucket_start, n_events
        FROM ({resample_fill_sql(table, step_s=step_s, fill="zero")})
      ),
      sized AS (
        SELECT event_type, bucket_start, n_events,
               CAST(count(n_events) OVER w AS BIGINT) AS base_n,
               CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT)
                 AS base_sum,
               CAST(coalesce(sum(CAST(n_events AS DECIMAL(19,0))
                     * CAST(n_events AS DECIMAL(19,0))) OVER w, 0)
                 AS DECIMAL(38,0)) AS _ssq
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start
                     ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
      )
      SELECT event_type, bucket_start, n_events, base_n, base_sum,
             (base_n = {window}) AND (
               CAST({window} * n_events - base_sum AS {dec})
                 * CAST({window} * n_events - base_sum AS {dec})
               > CAST({tau2} AS {dec}) * (
                   CAST({window} AS {dec}) * CAST(_ssq AS {dec})
                   - CAST(base_sum AS {dec}) * CAST(base_sum AS {dec}))
             ) AS is_anomaly,
             base_n = {window} AS window_full
      FROM sized
    """
