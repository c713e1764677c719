"""Structured Streaming surface — the events rollup as a stream.

The reference engine is batch-only (SURVEY §2.10); this module adds the
Spark-native streaming path for the same rollup the batch
``events_window`` query computes: ``readStream`` over an events
directory (file source — the Iceberg-snapshot-tail stand-in), event-time
TUMBLING WINDOWS with a WATERMARK for late data, aggregation output.

Deterministic testing shape: Trigger.AvailableNow drains the directory
as one micro-batch sequence and stops, so the streaming result can be
compared 1:1 against the batch groupBy (tests/test_streaming.py).

Scale notes: the streaming agg shuffles once on (window, event_type)
exactly like the batch plan; state store size is bounded by
(#windows-in-watermark x #types).  Custom stateful operators beyond
windowed aggs would go through applyInPandasWithState on the same
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_rollup(
    spark: SparkSession,
    events_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DataFrame: hourly (window-start, event_type) counts and
    value sums with a late-data watermark.  Caller attaches the sink
    (memory/parquet) and trigger."""
    src = spark.readStream.schema(schema).parquet(events_dir)
    # watermarks need session-tz TIMESTAMP; parquet stores TIMESTAMP_NTZ
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str):
    """Drain the source with Trigger.AvailableNow into a memory sink and
    block until done; returns the started (finished) query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
