"""Manifest-stats segment pruning — the reference's signature planner step.

Port of CanPruneNumeric / CanPruneCategorical / missing-field pruning
(internal/manifest/stats.go:234-287,449-483;
internal/engine/segment_pruning.go:15-121): O(1) per segment against
min/max/null stats collected at commit, running driver-side BEFORE the
file list is handed to spark.read — so pruned segments are never opened
(on 100 TB this is the difference between touching 3 files and 3000).
Catalyst's parquet row-group pruning then handles the intra-file level.

Conservative by construction: prune only when stats PROVE no row can
match; unknown columns/operators → keep.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType, StringType

from vecgo_spark.filters import Filter, FilterSet
from vecgo_spark.plans.manifest import SegmentMeta


def collect_stats(df: DataFrame, exclude: tuple[str, ...] = ()) -> dict[str, Any]:
    """One agg pass per segment at commit time (≙ StatsCollector.Add/
    Finalize, internal/manifest/stats_collector.go:110-615): per-column
    min/max/null_count for pruning-friendly types."""
    cols = [
        f.name for f in df.schema.fields
        if f.name not in exclude
        and isinstance(f.dataType, (NumericType, StringType, BooleanType))
    ]
    if not cols:
        return {}
    aggs = []
    string_cols = [
        f.name for f in df.schema.fields
        if f.name in cols and isinstance(f.dataType, StringType)
    ]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
        ]
        if c in string_cols:
            # categorical purity (CanPruneCategorical, stats.go:449-483):
            # keep the exact distinct-value set while it's small — an eq/in
            # probe against a value outside the set prunes the whole file.
            # collect_set caps driver cost via slice; if truncated (>16
            # distinct) the set is dropped as unusable.
            aggs.append(F.slice(F.sort_array(F.collect_set(c)), 1, 17).alias(f"{c}__vals"))
    row = df.agg(*aggs).first()
    out: dict[str, Any] = {}
    for c in cols:
        cs: dict[str, Any] = {
            "min": row[f"{c}__min"],
            "max": row[f"{c}__max"],
            "null_count": int(row[f"{c}__nulls"] or 0),
        }
        if c in string_cols:
            vals = row[f"{c}__vals"] or []
            if len(vals) <= 16:
                cs["values"] = list(vals)
        out[c] = cs

    # second commit-time pass: compact per-column histograms for numeric
    # cols with a real range (EstimateSelectivity's input, stats.go:340-427,
    # histogram collection stats_collector.go:446-529). Bin counts are
    # integers → cheap to store in the manifest, O(#cols × 8).
    hist_cols = [
        c for c in cols
        if isinstance(df.schema[c].dataType, NumericType)
        and out[c]["min"] is not None
        and out[c]["max"] is not None
        and float(out[c]["max"]) > float(out[c]["min"])
    ]
    if hist_cols:
        bins = 8
        hist_aggs = []
        for c in hist_cols:
            lo, hi = float(out[c]["min"]), float(out[c]["max"])
            pos = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
            idx = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(pos * bins).cast("int")))
            for b in range(bins):
                hist_aggs.append(
                    F.sum(F.when(F.col(c).isNotNull() & (idx == b), 1).otherwise(0))
                    .alias(f"{c}__h{b}")
                )
        hrow = df.agg(*hist_aggs).first()
        for c in hist_cols:
            out[c]["histogram"] = [int(hrow[f"{c}__h{b}"] or 0) for b in range(bins)]
    return out


def estimate_selectivity(stats: dict[str, Any], rows: int, fs: "FilterSet") -> float:
    """Fraction of rows expected to match (EstimateSelectivity,
    stats.go:340-427): histogram mass for ranges (uniform-within-bin
    interpolation), 1/|values| for categorical eq, null-ratio aware;
    ANDed filters multiply (independence). Unknown columns → 1.0
    (conservative: never claims MORE selective than provable)."""
    if rows <= 0:
        return 1.0
    sel = 1.0
    for f in fs.filters:
        cs = stats.get(f.key)
        if cs is None:
            continue
        nulls = cs.get("null_count", 0)
        non_null = max(rows - nulls, 0) / rows
        vals = cs.get("values")
        hist = cs.get("histogram")
        lo, hi = cs.get("min"), cs.get("max")
        s = non_null
        if f.op == "eq" and vals:
            s = non_null / len(vals) if f.value in vals else 0.0
        elif f.op == "in" and vals:
            try:
                present = sum(1 for x in f.value if x in vals)
            except TypeError:
                present = len(vals)
            s = non_null * present / max(len(vals), 1)
        elif f.op in ("gt", "gte", "lt", "lte") and hist and lo is not None and hi is not None:
            lo_f, hi_f = float(lo), float(hi)
            total = sum(hist) or 1
            width = (hi_f - lo_f) / len(hist)
            mass = 0.0
            for b, cnt in enumerate(hist):
                b_lo, b_hi = lo_f + b * width, lo_f + (b + 1) * width
                v = float(f.value)
                if f.op in ("gt", "gte"):
                    if b_lo >= v:
                        frac = 1.0
                    elif b_hi <= v:
                        frac = 0.0
                    else:
                        frac = (b_hi - v) / width
                else:
                    if b_hi <= v:
                        frac = 1.0
                    elif b_lo >= v:
                        frac = 0.0
                    else:
                        frac = (v - b_lo) / width
                mass += cnt * frac
            s = non_null * (mass / total)
        sel *= max(0.0, min(1.0, s))
    return sel


def _can_prune(filter: Filter, stats: dict[str, Any], rows: int) -> bool:
    """True iff NO row in the segment can satisfy `filter`."""
    cs = stats.get(filter.key)
    if cs is None:
        return False  # no stats → conservative keep
    lo, hi, nulls = cs.get("min"), cs.get("max"), cs.get("null_count", 0)
    if lo is None and hi is None:
        # column exists but all values NULL → no filter matches
        # (missing-field semantics, metadata/filter.go:9-13)
        return nulls >= rows and rows > 0
    v = filter.value
    vals = cs.get("values")
    if vals is not None:
        # exact distinct-value set (categorical purity): membership proof
        if filter.op == "eq":
            return v not in vals
        if filter.op == "in":
            try:
                return all(x not in vals for x in v)
            except TypeError:
                return False
    try:
        if filter.op == "eq":
            return v < lo or v > hi
        if filter.op == "gt":
            return hi <= v
        if filter.op == "gte":
            return hi < v
        if filter.op == "lt":
            return lo >= v
        if filter.op == "lte":
            return lo > v
        if filter.op == "in":
            return all(x < lo or x > hi for x in v)
    except TypeError:
        return False  # incomparable types → keep
    return False  # ne / contains: range stats can't prove absence


def prune_segments(segments: list[SegmentMeta], fs: FilterSet) -> list[SegmentMeta]:
    """Drop segments where any ANDed filter is provably unsatisfiable."""
    out = []
    for seg in segments:
        if any(_can_prune(f, seg.stats, seg.rows) for f in fs.filters):
            continue
        out.append(seg)
    return out
