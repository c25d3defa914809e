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


def anomaly_x_limit(frame: int, z: int) -> int:
    """Largest |x_e2| for which the integer cross-multiplied z-test stays
    inside int64: both dev² ≤ (2·frame·M)² and z²·(n·s2 − s1²) ≤
    z²·frame²·M² must be < 2⁶³, so M ≤ √(2⁶³−1)/(frame·max(2, z))."""
    return int((2**63 - 1) ** 0.5) // (frame * max(2, z))


def rolling_anomaly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    frame: int = 100,
    min_n: int = 20,
    z: int = 2,
) -> DataFrame:
    """Rolling z-score anomaly flags: a value is anomalous iff it sits
    more than `z` standard deviations from the mean of the preceding
    `frame` values of the same key (the classic streaming
    anomaly-detection shape, batch-expressible as a bounded window
    frame; the streaming twin is applyInPandasWithState keeping the same
    (n, Σx, Σx²) triple as its state).

    EXACT arithmetic: values are 2-decimal, so x_e2 = round(100·value)
    is integer and the test (x−μ)² > z²·σ² cross-multiplies to
    (n·x − s1)² > z²·(n·s2 − s1²) over long sums — no float enters the
    flag, so the result is engine-bit-exact. Frames with fewer than
    `min_n` observations never flag (cold start).

    Scale posture: ONE shuffle on the key; the frame is ROWS-bounded so
    state per partition is O(frame). Long-range (ADVICE r6): with SIGNED
    values the binding terms are dev² = (n·x − s1)² ≤ (2·frame·M)² and
    z²·(n·s2 − s1²) ≤ z²·frame²·M², so longs hold only to
    M = max|x_e2| ≤ ⌊√(2⁶³−1)/(frame·max(2, z))⌋ (~1.5·10⁷, i.e.
    |value| ≤ ~150k, at frame 100 and z ≤ 2; z = 4 halves it). Spark
    wraps silently on long overflow, so out-of-range inputs raise loudly
    instead of flipping flags (DuckDB's BIGINT already errors on
    overflow, so the oracle twin needs no guard)."""
    from pyspark.sql.window import Window

    limit = anomaly_x_limit(frame, z)
    raw = F.round(F.col(value_col) * 100).cast("long")
    x = F.when(
        F.abs(raw) > F.lit(limit),
        F.raise_error(F.concat(
            F.lit("rolling_anomaly overflow guard: |x_e2|="),
            F.abs(raw).cast("string"),
            F.lit(f" exceeds {limit} (frame={frame}, z={z}) — the integer "
                  "z-test would wrap; rescale the value column"))
        ).cast("long"),
    ).otherwise(raw)
    w = (Window.partitionBy(key_col).orderBy(ts_col, id_col)
         .rowsBetween(-frame, -1))
    d = (
        df.withColumn("x_e2", x)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.coalesce(F.sum("x_e2").over(w), F.lit(0)))
        .withColumn("s2", F.coalesce(F.sum(F.col("x_e2") * F.col("x_e2")).over(w),
                                     F.lit(0)))
    )
    dev = F.col("n") * F.col("x_e2") - F.col("s1")
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        d.withColumn(
            "is_anomaly",
            (F.col("n") >= min_n) & (dev * dev > F.lit(z * z) * var_n2))
        .select(id_col, key_col, ts_col, value_col, "n", "is_anomaly")
        .orderBy(id_col)
    )


def rolling_anomaly_sql(
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    frame: int = 100,
    min_n: int = 20,
    z: int = 2,
) -> str:
    """DuckDB oracle twin — identical integer cross-multiplied test."""
    return f"""
    WITH d AS (
        SELECT {id_col}, {key_col}, {ts_col}, {value_col},
               CAST(round({value_col} * 100) AS BIGINT) AS x_e2,
               count(*) OVER w AS n,
               COALESCE(CAST(sum(CAST(round({value_col} * 100) AS BIGINT))
                   OVER w AS BIGINT), 0) AS s1,
               COALESCE(CAST(sum(CAST(round({value_col} * 100) AS BIGINT)
                   * CAST(round({value_col} * 100) AS BIGINT))
                   OVER w AS BIGINT), 0) AS s2
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                     ROWS BETWEEN {frame} PRECEDING AND 1 PRECEDING)
    )
    SELECT {id_col}, {key_col}, {ts_col}, {value_col}, n,
           (n >= {min_n}
            AND (n * x_e2 - s1) * (n * x_e2 - s1) > {z * z} * (n * s2 - s1 * s1))
               AS is_anomaly
    FROM d ORDER BY {id_col}
    """
