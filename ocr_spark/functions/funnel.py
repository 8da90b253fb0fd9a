"""Ordered-step conversion funnel over an event log.

"How many users signed up, then clicked, then purchased — in that
order, within N days" is the staple product-analytics query, and the
naive spelling is a k-way self-join (|events|^k per user). The
scale-correct plan is GREEDY EARLIEST-COMPLETION via chained running
minima, one window pass per step over the SAME (user, ts) sort:

  r1(t) = min ts of a step-1 event at-or-before t
  q_k   = an event of step k at time ts with ts > r_{k-1}(ts)
  r_k(t)= min qualifying step-k time at-or-before t

Greedy earliest is optimal for reachability: r_k per user is the
earliest possible completion time of steps 1..k, so "converted within
the window" is exactly ``r_k <= r_1 + within``. Every window shares
one partitioning and ordering — Spark plans ONE Exchange + ONE Sort
and stacks k Window operators on top (plan-asserted in the tests);
the final per-user aggregate is the only other shuffle.

Tie discipline: the running min uses the default RANGE frame (all
rows with the SAME ts are in frame), and progression is strict
(ts > r_{k-1}), so simultaneous events can never satisfy two
consecutive steps and the result is independent of tie order —
deterministic in both engines without any tiebreak column.

Reference analog: none (no event analytics in the reference); part
of the beyond-reference analytics surface with the as-of join and
sessionization (SURVEY.md §2 addenda).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_STEPS = ("signup", "click", "purchase")


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str] = DEFAULT_STEPS,
    within_days: int = 7,
) -> DataFrame:
    """(step, step_name, n_users): users whose earliest ordered
    completion of steps 1..k fits within ``within_days`` of step 1.
    ``step`` is 1-based; row k counts users converted through step k
    (monotone non-increasing down the funnel)."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    ).where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isin(steps)
    )
    w = Window.partitionBy("user_id").orderBy("ts")  # default RANGE frame
    cur = ev.withColumn(
        "r1", F.min(F.when(F.col("event_type") == steps[0], F.col("ts"))).over(w)
    )
    for k in range(2, len(steps) + 1):
        q = F.when(
            (F.col("event_type") == steps[k - 1]) & (F.col("ts") > F.col(f"r{k-1}")),
            F.col("ts"),
        )
        cur = cur.withColumn(f"r{k}", F.min(q).over(w))
    per_user = cur.groupBy("user_id").agg(
        *[F.min(f"r{k}").alias(f"t{k}") for k in range(1, len(steps) + 1)]
    )
    bound = F.col("t1") + F.expr(f"INTERVAL {int(within_days)} DAYS")
    counts = per_user.agg(
        F.count(F.when(F.col("t1").isNotNull(), 1)).alias("c1"),
        *[
            F.count(F.when(F.col(f"t{k}") <= bound, 1)).alias(f"c{k}")
            for k in range(2, len(steps) + 1)
        ],
    )
    stack = ", ".join(
        f"{k}L, '{s}', c{k}" for k, s in enumerate(steps, start=1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users)"
    )


def funnel_counts_sql(
    table: str = "events",
    steps: Sequence[str] = DEFAULT_STEPS,
    within_days: int = 7,
) -> str:
    """DuckDB twin: the identical chained-running-min derivation."""
    steps = list(steps)
    lits = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    sql = f"""
      WITH ev AS (
        SELECT user_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts
        FROM {table}
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IN ({lits})
      ), s1 AS (
        SELECT *, min(CASE WHEN event_type = '{steps[0]}' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts) AS r1
        FROM ev
      )"""
    prev = "s1"
    for k in range(2, len(steps) + 1):
        sql += f""", s{k} AS (
        SELECT *, min(CASE WHEN event_type = '{steps[k-1]}' AND ts > r{k-1}
                      THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts) AS r{k}
        FROM {prev}
      )"""
        prev = f"s{k}"
    tcols = ", ".join(
        f"min(r{k}) AS t{k}" for k in range(1, len(steps) + 1)
    )
    sql += f""", per_user AS (
        SELECT user_id, {tcols} FROM {prev} GROUP BY user_id
      ), counts AS (
        SELECT count(CASE WHEN t1 IS NOT NULL THEN 1 END) AS c1"""
    for k in range(2, len(steps) + 1):
        sql += (
            f", count(CASE WHEN t{k} <= t1 + INTERVAL {int(within_days)} DAY"
            f" THEN 1 END) AS c{k}"
        )
    sql += """
        FROM per_user
      )"""
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, '{s}' AS step_name,"
        f" CAST(c{k} AS BIGINT) AS n_users FROM counts"
        for k, s in enumerate(steps, start=1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(selects)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: (cohort, week_offset, n_users) —
    users grouped by the ISO week (Monday-start, rendered as a date
    string so both engines compare identically) of their FIRST event,
    counted distinct in each later week they were active.

    Shape: one full-partition window min per user for the cohort
    anchor (no join back), integer day-diff arithmetic for the
    offset, then one distinct-aggregate shuffle — no self-join, no
    per-cohort jobs. Offsets are floor(days/7) from the anchor DAY,
    so they are exact integers in both engines.
    """
    ev = events.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
    ).where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id")  # whole-partition frame
    anchored = ev.withColumn(
        "cohort_day", F.to_date(F.date_trunc("week", F.min("ts").over(w)))
    )
    return (
        anchored.select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            (
                F.floor(F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7)
            ).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def retention_cohorts_sql(table: str = "events") -> str:
    """DuckDB twin (date_trunc('week') is ISO Monday-start in both
    engines; identical floor(days/7) offset arithmetic)."""
    return f"""
      WITH ev AS (
        SELECT user_id,
               CAST(ts AS TIMESTAMP) AS ts
        FROM {table}
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
      ), anchored AS (
        SELECT user_id, ts,
               CAST(date_trunc('week', min(ts) OVER (PARTITION BY user_id))
                    AS DATE) AS cohort_day
        FROM ev
      )
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
             CAST(floor(date_diff('day', cohort_day, CAST(ts AS DATE)) / 7)
                  AS BIGINT) AS week_offset,
             count(DISTINCT user_id) AS n_users
      FROM anchored
      GROUP BY 1, 2
    """
