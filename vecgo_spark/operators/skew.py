"""Skew-resilient aggregation / top-k — the zipfian-key defense.

The reference ships adversarial skew fixtures (zipfian, segment-local
skew — testutil/testutil.go:230,359) because hot keys are where engines
fall over. In Spark the failure mode is one straggler task holding the
hot key's entire partition. AQE's skew-join splitting covers *joins*; for
aggregations and window top-k the standard remedy is two-phase salting,
packaged here:

  salted_agg      groupBy(key+salt) partial agg → groupBy(key) merge.
                  Needs algebraic aggregates (sum/count/min/max) — each
                  caller passes the partial exprs and the merge exprs.
  salted_topk     per (key,salt) local top-k (window) → per key global
                  top-k over the ≤ n_salts·k survivors. Identical result
                  to the single-window plan: global top-k ⊆ union of the
                  salted locals (each survivor set keeps every candidate
                  that could rank top-k overall).

Both cap per-task fan-in for a hot key at 1/n_salts of its rows, at the
cost of one extra (tiny) shuffle over the partially-reduced frame.
Spark's hash agg already does map-side partial aggregation, so
salted_agg only pays off when the MERGE side is the bottleneck (very
high-cardinality aggregation state, e.g. collect-style or distinct
aggregates); salted_topk pays off whenever one key dominates the window
sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, deterministic_col: str | None = None) -> DataFrame:
    """Add a salt column in [0, n_salts). If ``deterministic_col`` is given
    the salt is a hash of it (stable across retries/engines); otherwise a
    per-row spray (fine for algebraic aggs, where placement is free)."""
    if deterministic_col is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_col)), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(_SALT, salt)


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
    deterministic_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: partial per (group, salt), merge per group.

    ``partial_aggs`` maps intermediate-column name → agg expr over raw
    rows; ``merge_aggs`` maps final name → agg expr over the intermediate
    columns. E.g. avg = {n: count(*), s: sum(x)} then {avg: sum(s)/sum(n)}.
    """
    salted = with_salt(df, n_salts, deterministic_col)
    partial = salted.groupBy(*group_cols, _SALT).agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def salted_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group, skew-safe: local top-k per (group, salt),
    then final top-k per group over ≤ n_salts·k survivors.

    ``order_by`` must be a total order (include a unique tiebreak column)
    so ranks are deterministic — same contract as the reference's result
    heap (score, segment, row tiebreak — search.go:70-114).
    """
    group_cols = list(group_cols)
    salted = with_salt(df, n_salts)
    local_w = Window.partitionBy(*group_cols, _SALT).orderBy(*order_by)
    survivors = (
        salted.withColumn("__lr", F.row_number().over(local_w))
        .where(F.col("__lr") <= k)
        .drop("__lr", _SALT)
    )
    final_w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final_w))
        .where(F.col(rank_col) <= k)
    )
