"""Event-stream relational operators over the `events` table
(event_id, ts, user_id, event_type, value, props-JSON).

The batch faces of the engine's time-series surface: per-user gap
sessionization (the batch twin of streaming.sessionize_stateful),
tumbling-window aggregation, and JSON property extraction — all built-in
expressions, one shuffle each. Float `value` aggregates are carried as
DECIMAL(18,2) sums (order-independent and exact) because a double sum's
value depends on reduction order and could never hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_from_dir(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def user_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user over the event timestamps (same lag +
    running-counter shape as streaming.sessionize_batch). Returns
    (key, session_start, session_end, n_events) with epoch-second longs."""
    from ..streaming.pages_stream import sessionize_batch

    ev = events.select(F.col("user_id").cast("string").alias("key"), F.col("ts"))
    return sessionize_batch(ev, key_col="key", ts_col="ts", gap_seconds=gap_seconds)


def event_type_windows(events: DataFrame, window_seconds: int = 3600) -> DataFrame:
    """Tumbling-window rollup per event type: (window_start epoch seconds,
    event_type, n_events, total_value). The window key is plain integer
    arithmetic on the epoch — equivalent to F.window(ts, '1 hour').start
    but directly comparable across engines."""
    epoch = F.unix_timestamp("ts")
    wstart = (epoch - epoch % window_seconds).alias("window_start")
    return (
        events.select(wstart, "event_type", F.col("value").cast("decimal(18,2)").alias("v"))
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL sum (exact, order-independent) then one deterministic
            # IEEE rounding to DOUBLE so gate harnesses hash a primitive.
            F.sum("v").cast("decimal(38,2)").cast("double").alias("total_value"),
        )
    )


def props_k_stats(events: DataFrame) -> DataFrame:
    """JSON property extraction + rollup: pull `k` out of the props JSON
    string (get_json_object — JVM-side Jackson path, no UDF) and aggregate
    its range per event type."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count_distinct("k").alias("k_distinct"),
        )
    )
