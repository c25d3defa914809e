"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def isin_longs(col_name: str, vals) -> Column:
    """`col IN (v1, v2, ...)` over integral values as ONE parsed SQL
    string. Column.isin() ships every element as its own py4j literal
    call (~0.5 ms each — a 160-id rerank list costs ~0.1-0.4 s of pure
    driver chatter per query build); F.expr hands Catalyst one string
    that parses to the identical In(...) predicate JVM-side."""
    vs = [int(v) for v in vals]
    if not vs:
        return F.lit(False)  # isin([]) semantics: nothing matches
    return F.expr(f"`{col_name}` IN ({','.join(map(str, vs))})")


def ensure_parallelism(df: DataFrame, key: str | None = None) -> DataFrame:
    """Spread a narrow input across the cluster: a small parquet source
    arrives as 1-2 partitions, which would serialize any CPU-heavy
    per-partition stage (signature kernels, graph builds, regex
    tokenizers); one tiny round-robin shuffle buys parallelism. At
    100 TB the input is already many partitions and this is a no-op.
    inputFiles() approximates scan width without df.rdd, which would
    force a full RDD conversion of the plan just to read a count.

    Target = cores/4, not all cores (r14, measured): a spread stage
    feeds several downstream stages, and per-stage task scheduling is
    ~5-10 ms/task — shattering a few-MB source into one task per core
    made EVERY downstream stage pay 32 launches for sub-100 ms of work
    each (interleaved A/B across 9 tokenize-heavy queries: cores/4 ≈
    cores/2 < {1 task, 1/core} — e.g. contamination 0.93 s @ cores/4 vs
    1.89 s unspread vs 1.01 s @ 32; perplexity 1.26 vs 1.45 vs 1.63).
    Guide §2.2's "fewer, larger partitions" at bench scale; scales with
    the driver's core-count env, and real multi-split inputs skip it.

    key= (r14): spread by HASH of that column instead of round-robin.
    When every downstream keyed operator (groupBy, window) clusters on
    the same column, the spread exchange satisfies their distributions
    too (HashPartitioning([key]) satisfies ClusteredDistribution of any
    superset, and alias-aware projection/Generate preserve it), so the
    whole per-key pipeline rides ONE exchange instead of spread + agg +
    window each paying their own (guide §2.4 "share one exchange").
    Needs many more distinct keys than partitions to spread evenly
    (guide §2.5) — doc ids over cores/4 qualify everywhere it's used."""
    target = max(2, df.sparkSession.sparkContext.defaultParallelism // 4)
    try:
        n_in = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file sources: assume narrow
        n_in = 0
    if n_in >= target:
        return df
    return df.repartition(target, F.col(key)) if key else df.repartition(target)
