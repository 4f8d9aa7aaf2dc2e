"""Structured Streaming operators over the events stream table.

The reference has NO streaming (SURVEY.md §2: the crawler frontier is a
driver-side batch loop), so nothing here mirrors reference semantics —
these are the stream-shaped capabilities a transcript/event pipeline needs,
expressed the Spark-native way: readStream -> event-time windows with
watermarks -> sink. Tested by running the same logic in batch and asserting
parity (availableNow trigger drains the source deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def windowed_counts(events: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling-window counts per event_type with late-data
    watermark. Works on BOTH a stream and a batch frame (same plan), which
    is how the parity test pins semantics."""
    ts = F.col("ts").cast("timestamp")
    src = events.withColumn("ts", ts)
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").cast("long").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).alias("w_start_epoch"),
                    "event_type", "cnt", "total_value"))


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming analogue of `functions.dedup.exact_dedup`."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.dropDuplicates(["event_id"])


def run_available_now(stream_df: DataFrame, query_name: str,
                      mode: str = "append") -> DataFrame:
    """Drain the source with the availableNow trigger into a memory sink and
    return the materialized result (test/bench harness). ``mode``:
    "complete" for streaming aggregations, "append" otherwise."""
    spark = stream_df.sparkSession
    q = (stream_df.writeStream.format("memory").queryName(query_name)
         .outputMode(mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(query_name)
