"""Streaming sessionization: the batch ``sessionize`` plan run under
a watermark.

Same operator, same expression (``session_window`` +
exact-integer aggregates, ocr_spark/functions/sessionize.py) — the
only streaming deltas are the watermark (bounds keyed session state:
a key's open session is held only until the watermark passes its
close + gap) and append output mode (a session row is emitted exactly
once, when it can no longer grow). State lives in the configured
state store (RocksDB provider exposed via
ocr_spark.streaming.state_config), so a 100 TB event firehose holds
state proportional to OPEN sessions only, not history.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ocr_spark.functions.sessionize import DEFAULT_GAP, sessionize
from ocr_spark.streaming.state_config import state_confs


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = DEFAULT_GAP,
    watermark: str = "1 hour",
    available_now: bool = True,
    state_store_provider: str | None = None,
):
    """availableNow (or continuous) gap-sessionization over event
    files; append mode emits only watermark-finalized sessions.
    ``state_store_provider``: "rocksdb" (or a provider class) for
    disk-backed session state. Returns the StreamingQuery."""
    schema = spark.read.parquet(input_dir).schema
    src = spark.readStream.schema(schema).parquet(input_dir)
    sess = sessionize(src, gap=gap, watermark=watermark)
    writer = (
        sess.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    with state_confs(spark, state_store_provider):
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return writer.start()
