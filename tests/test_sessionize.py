"""Gap-based sessionization: boundary semantics, DuckDB twin parity
on crafted edges, and the streaming (watermarked) form."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from ocr_spark.functions.sessionize import sessionize, sessionize_sql

_TS = "2024-03-01 %02d:%02d:%02d"


def _events(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"]).assign(
        ts=lambda d: pd.to_datetime(d["ts"], format="mixed")
    )


def test_gap_boundary_inclusive_end(spark):
    """An event landing EXACTLY gap after its predecessor still JOINS
    the session (Spark merges on ts <= last + gap, inclusive); one
    microsecond later opens a new one. This pins the boundary the
    DuckDB twin's strict '> gap' split mirrors."""
    rows = [
        (1, "2024-03-01 00:00:00", 1.0),
        (1, "2024-03-01 07:59:59.999999", 2.0),  # < gap: merges
        (1, "2024-03-01 15:59:59.999999", 4.0),  # EXACTLY +8h: merges
        (1, "2024-03-02 00:00:00", 8.0),  # +8h + 1us: new session
        # user 2: single event
        (2, "2024-03-01 12:00:00", 10.0),
    ]
    df = spark.createDataFrame(_events(rows))
    got = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value_cents, r.duration_us)
        for r in sessionize(df).collect()
    }
    assert got == {
        (1, "2024-03-01 00:00:00"): (3, 700, 57_599_999_999),
        (1, "2024-03-02 00:00:00"): (1, 800, 0),
        (2, "2024-03-01 12:00:00"): (1, 1000, 0),
    }


def test_sessionize_matches_duckdb_twin_on_crafted_edges(spark, tmp_path):
    """Cross-engine parity on a corpus dense with boundary cases:
    exact-gap steps, sub-microsecond-close events, interleaved users."""
    rows = []
    for u in range(5):
        base = pd.Timestamp("2024-03-01") + pd.Timedelta(minutes=u)
        t = base
        for i in range(40):
            rows.append((u, t, float(i)))
            # alternate: tiny step, just-under-gap, exactly-gap
            step = ["1 us", "7 hours 59 minutes", "8 hours"][i % 3]
            t = t + pd.Timedelta(step)
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"]).astype(
        {"ts": "datetime64[us]"}  # Spark cannot read TIMESTAMP(NANOS) parquet
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    sdf = sessionize(spark.read.parquet(path))
    cols = sorted(sdf.columns)
    got = sorted(tuple(r) for r in sdf.select(*cols).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    odf = con.execute(sessionize_sql()).fetchdf()
    want = sorted(tuple(r) for r in odf[cols].itertuples(index=False))
    assert got == want


def test_sessionize_streaming_form(spark, tmp_path):
    """The identical session_window expression runs under Structured
    Streaming with a watermark: batch result == streamed result once
    the watermark passes the sessions."""
    rows = [
        (1, "2024-03-01 00:00:00", 1.0),
        (1, "2024-03-01 01:00:00", 2.0),
        (2, "2024-03-01 02:00:00", 3.0),
    ]
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    batch = spark.createDataFrame(_events(rows))
    batch.write.parquet(inp, mode="append")

    def drain():
        src = spark.readStream.schema(batch.schema).parquet(inp)
        q = (
            src.withWatermark("ts", "1 minute")
            .groupBy(F.session_window("ts", "8 hours").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                "n_events",
            )
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # append mode only emits sessions the watermark has passed; a
    # later far-future event advances it past everything above
    spark.createDataFrame(
        _events([(9, "2024-03-09 00:00:00", 0.0)])
    ).write.parquet(inp, mode="append")
    drain()

    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.read.parquet(outp).collect()
    }
    assert got[(1, "2024-03-01 00:00:00")] == 2
    assert got[(2, "2024-03-01 02:00:00")] == 1


def test_sessionize_accepts_string_user_ids(spark):
    from ocr_spark.functions.sessionize import sessionize

    rows = [
        ("uuid:x", "2024-01-01 10:00:00", 2.0),
        ("uuid:x", "2024-01-01 10:10:00", 3.0),
        ("uuid:y", "2024-01-01 11:00:00", 1.0),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts string, value double")
    got = {r.user_id: r.n_events for r in sessionize(ev, gap="30 minutes").collect()}
    assert got == {"uuid:x": 2, "uuid:y": 1}
