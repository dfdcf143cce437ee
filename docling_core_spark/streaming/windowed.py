"""Event-time windowed aggregation with watermark-bounded late data.

The reference has no temporal semantics (SURVEY.md §2.6), but a
training-data ingest pipeline does: click/event feeds arrive late and
out of order, and the state store must not grow forever. This module is
the engine's Structured-Streaming answer:

  - `withWatermark(ts, delay)` bounds how late an event may arrive and
    lets Spark finalize + evict window state older than the watermark;
  - tumbling `window(ts, size)` aggregation per event_type, all JVM
    expressions (no Python in the stream);
  - append output mode: a window row is emitted exactly once, when the
    watermark passes its end — the contract a downstream incremental
    consumer (e.g. a feature store) needs;
  - late events within the watermark are merged into their window
    BEFORE it finalizes; events later than the watermark are dropped by
    construction (tested in tests/test_windowed_stream.py).

At production scale the shuffle key is (window, event_type) — bounded
cardinality per trigger, uniform by construction; state size is
O(active windows x types), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_event_counts(
    src: DataFrame,
    window_size: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts per event_type (int-cents sum
    for cross-engine-stable values, as everywhere in the engine)."""
    return (
        src.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_size).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("total_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value_cents",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_size: str = "30 minutes",
    watermark_delay: str = "1 hour",
):
    """File stream -> watermarked window agg -> append parquet sink.
    AvailableNow: drains the current backlog and stops; re-invoking
    with the same checkpoint continues exactly-once from new files
    (each invocation advances the watermark with the data it reads)."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out = windowed_event_counts(src, window_size, watermark_delay)
    return (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
