"""Event-time windowed aggregation helpers (beyond-reference: vecgo has no
event-time layer, SURVEY §2.10 — these are the Structured Streaming
operators a training-data pipeline needs for stream tables like `events`).

Every helper works on BOTH batch and streaming DataFrames (the watermark
is a no-op in batch mode), so the same query is oracle-checkable in batch
and deployable as a stream."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if (watermark and df.isStreaming) else df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows + per-window aggregates; late
    rows beyond the watermark are dropped in streaming mode."""
    src = _maybe_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration)
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("ws", F.col("w.start"))
        .withColumn("we", F.col("w.end"))
        .drop("w")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide windows)."""
    src = _maybe_watermark(df, ts_col, watermark)
    win = F.window(F.col(ts_col), duration, slide)
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("ws", F.col("w.start"))
        .withColumn("we", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: a session closes after `gap` of inactivity per key
    (dynamic-length windows — F.session_window)."""
    src = _maybe_watermark(df, ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("ws", F.col("w.start"))
        .withColumn("we", F.col("w.end"))
        .drop("w")
    )
