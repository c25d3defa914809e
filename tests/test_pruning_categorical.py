"""Categorical value-set pruning (CanPruneCategorical, stats.go:449-483):
an eq/in probe for a value absent from a segment's exact distinct-value
set skips the file without opening it."""

from __future__ import annotations

from pyspark.sql import functions as F

from vecgo_spark.filters import FilterSet
from vecgo_spark.plans.pruning import prune_segments
from vecgo_spark.plans.table import VectorTable


def _mk(spark, path):
    t = VectorTable.create(spark, str(path), dim=2, metric="l2")
    t.insert(spark.createDataFrame(
        [(1, [0.0, 0.0], "A"), (2, [1.0, 0.0], "B")],
        "id LONG, vector ARRAY<DOUBLE>, category STRING"))
    t.commit()
    t.insert(spark.createDataFrame(
        [(3, [0.0, 1.0], "C"), (4, [1.0, 1.0], "C")],
        "id LONG, vector ARRAY<DOUBLE>, category STRING"))
    t.commit()
    return t


def test_value_set_collected(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    s1, s2 = sorted(t.manifest.segments, key=lambda s: s.lsn)
    assert s1.stats["category"]["values"] == ["A", "B"]
    assert s2.stats["category"]["values"] == ["C"]


def test_eq_prunes_by_value_set(spark, tmp_path):
    t = _mk(spark, tmp_path / "t2")
    segs = t.manifest.segments
    kept = prune_segments(segs, FilterSet().eq("category", "C"))
    assert len(kept) == 1 and kept[0].stats["category"]["values"] == ["C"]
    # a value inside the min/max string range but NOT in the set still
    # prunes — the set is exact where range stats are only a bound
    kept = prune_segments(segs, FilterSet().eq("category", "AB"))
    assert kept == []


def test_in_prunes_by_value_set(spark, tmp_path):
    t = _mk(spark, tmp_path / "t3")
    segs = t.manifest.segments
    assert prune_segments(segs, FilterSet().isin("category", ["X", "Y"])) == []
    assert len(prune_segments(segs, FilterSet().isin("category", ["X", "B"]))) == 1


def test_pruned_read_still_correct(spark, tmp_path):
    t = _mk(spark, tmp_path / "t4")
    got = sorted(r["id"] for r in t.df(FilterSet().eq("category", "C")).collect())
    assert got == [3, 4]
    assert t.df(FilterSet().eq("category", "ZZZ")).count() == 0
