"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input across the cluster: a small parquet source
    arrives as 1-2 partitions, which would serialize any CPU-heavy
    per-partition stage (signature kernels, graph builds, regex
    tokenizers); one tiny round-robin shuffle buys full parallelism. At
    100 TB the input is already many partitions and this is a no-op.
    inputFiles() approximates scan width without df.rdd, which would
    force a full RDD conversion of the plan just to read a count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_in = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file sources: assume narrow
        n_in = 0
    return df.repartition(target) if n_in < target else df
