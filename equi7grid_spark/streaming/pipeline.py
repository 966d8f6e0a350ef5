"""Structured Streaming paths: streaming tile assignment + windowed,
watermarked event aggregation.

The reference is a batch library (SURVEY.md §2.6) and the north rule's
core contract is batch-with-resume, but a continuously landing image
table is the realistic ingest shape at 10^12 scale, so the engine's
hot-path operators are streaming-clean: the zone/projection pandas UDF
and the tile Columns run unchanged on streaming DataFrames; aggregation
uses watermarks for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from equi7grid_spark.operators.assign import assign_tiles


def stream_images(spark: SparkSession, input_dir: str, schema: str) -> DataFrame:
    return spark.readStream.schema(schema).parquet(input_dir)


def streaming_tile_assignment(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    tiling_id: str = "T6",
) -> DataFrame:
    """Streaming flagship: landing images → zone+projection UDF → tile
    Columns. Returns the transformed streaming DataFrame; attach a sink
    with writeStream (append mode — row-wise transform, no state)."""
    stream = stream_images(spark, input_dir, schema)
    return assign_tiles(stream, tiling_id=tiling_id)


def streaming_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts over a landing events table —
    the streaming twin of queries.q_events_windowed. Late rows beyond
    the watermark are dropped by the engine (documented semantics)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("total_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, query_name: str):
    """Drain everything currently available into an in-memory sink and
    stop — the batch-equivalent execution used by tests and backfills."""
    mode = "complete" if stream_df.isStreaming and _has_aggregation(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
