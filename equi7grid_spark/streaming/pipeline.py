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
    engine: str = "jvm",
) -> DataFrame:
    """Streaming flagship: landing images → zone resolve → AEQD forward
    → tile Columns. Returns the transformed streaming DataFrame; attach
    a sink with writeStream (append mode — row-wise transform, no
    state).

    engine="jvm" (default) is the same zero-Python path as the batch
    flagship: the decided-cell map and boundary candidate structures
    join as STATIC broadcast sides of a stream-static join, and the
    projection is the Column Vincenty — per-microbatch cost is pure JVM
    compute, no Python workers spun up per trigger. engine="pandas"
    keeps the round-1 Arrow-UDF path."""
    if engine not in ("jvm", "pandas"):
        raise ValueError(f"engine must be 'jvm' or 'pandas', got {engine!r}")
    stream = stream_images(spark, input_dir, schema)
    if engine == "jvm":
        from equi7grid_spark.operators.assign_jvm import assign_tiles_jvm

        return assign_tiles_jvm(stream, tiling_id=tiling_id)
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


SESSION_GAP_SECONDS = 30 * 60

_SESSION_OUT_SCHEMA = (
    "user_id long, session_start string, session_end string, "
    "n_events long, total_value double"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    applyInPandasWithState (per-user session state, event-time timeout).

    Emits a session row when a gap closes it in-stream or when the
    watermark times it out. The batch twin (queries.q_sessionize, with
    a DuckDB value oracle) computes the same sessions with window
    functions; the streaming test checks closed-session equality.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        user_id = int(key[0])
        rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame()
        out = []

        def emit(start_us: int, last_us: int, n: int, total: float):
            out.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us").strftime("%Y-%m-%d %H:%M:%S"),
                    "session_end": pd.Timestamp(last_us, unit="us").strftime("%Y-%m-%d %H:%M:%S"),
                    "n_events": n,
                    "total_value": round(total, 3),
                }
            )

        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                emit(start, last, n, total)
                state.remove()
        else:
            if len(rows):
                rows = rows.sort_values(["ts", "event_id"])
                ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
                vals = rows["value"].to_numpy()
                if state.exists:
                    start, last, n, total = state.get
                else:
                    start = last = int(ts_us[0])
                    n, total = 0, 0.0
                for t_us, v in zip(ts_us.tolist(), vals.tolist()):
                    if n > 0 and t_us - last > gap_seconds * 1_000_000:
                        emit(start, last, n, total)
                        start, n, total = t_us, 0, 0.0
                    if n == 0:
                        start = t_us
                    last = t_us
                    n += 1
                    total += float(v)
                state.update((int(start), int(last), int(n), float(total)))
                state.setTimeoutTimestamp(int(last // 1000) + gap_seconds * 1000)
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )

    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            _SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    keys: tuple[str, ...] = ("phash",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup of a landing table: keep the first arrival
    per key, with dedup state BOUNDED by the watermark horizon
    (dropDuplicatesWithinWatermark) — the streaming twin of the batch
    dedup_exact query. At 10^12 rows an unbounded dropDuplicates state
    would grow with the full key history; the watermark variant holds
    only keys younger than the horizon, which is the only shape that
    survives a continuously landing image table (duplicate uploads
    cluster in time — retries, crawler re-fetches)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
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
