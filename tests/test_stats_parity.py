"""Manifest stats parity with the reference's collector: Bloom filters on
high-cardinality strings (bloom.go), 16-bin log-scale histograms with
per-bin min/max (stats_collector.go:446-529), and vector centroid/radius
stats feeding SegmentPriority probe ordering (stats.go:643-677)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.filters import FilterSet
from vecgo_spark.plans.manifest import SegmentMeta
from vecgo_spark.plans.pruning import (
    bloom_might_contain,
    collect_stats,
    collect_vector_stats,
    prune_segments,
    segment_priority,
)
from vecgo_spark.plans.table import VectorTable


def _seg(stats, rows=100):
    return SegmentMeta(path="s", rows=rows, lsn=1, stats=stats)


def test_bloom_collected_for_high_cardinality_strings(spark):
    df = spark.createDataFrame(
        [(i, f"user-{i:04d}") for i in range(100)], "id long, name string"
    )
    stats = collect_stats(df)
    assert "values" not in stats["name"]  # >16 distinct → set truncated
    bloom = stats["name"]["bloom"]
    # every present value answers "maybe"; absent values answer "no"
    assert all(bloom_might_contain(bloom, f"user-{i:04d}") for i in range(100))
    absent_hits = sum(
        bloom_might_contain(bloom, f"ghost-{i}") for i in range(500)
    )
    assert absent_hits < 25  # <5% fp at 100 values / 2048 bits


def test_bloom_prunes_eq_probe_on_wide_string_column(spark):
    df = spark.createDataFrame(
        [(i, f"user-{i:04d}") for i in range(100)], "id long, name string"
    )
    seg = _seg(collect_stats(df))
    kept = prune_segments([seg], FilterSet().eq("name", "user-0050"))
    assert kept == [seg]
    kept = prune_segments([seg], FilterSet().eq("name", "nobody-here"))
    assert kept == []  # the r1 gap: this used to degrade to "keep"
    kept = prune_segments([seg], FilterSet().isin("name", ["ghost-a", "ghost-b"]))
    assert kept == []


def test_log_histogram_per_bin_bounds_prove_gaps(spark):
    # values cluster at 1..10 and 1e6..1e6+10: a huge empty middle that a
    # linear histogram's global min/max cannot expose
    vals = [float(v) for v in list(range(1, 11)) + [1_000_000 + v for v in range(11)]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    stats = collect_stats(df)
    lh = stats["x"]["log_histogram"]
    assert len(lh["bins"]) == 16
    assert sum(b["n"] for b in lh["bins"]) == len(vals)
    seg = _seg(stats, rows=len(vals))
    # eq probe into the gap → pruned; probes at real values → kept
    assert prune_segments([seg], FilterSet().eq("x", 5000.0)) == []
    assert prune_segments([seg], FilterSet().eq("x", 5.0)) == [seg]
    assert prune_segments([seg], FilterSet().eq("x", 1_000_003.0)) == [seg]


def test_vector_stats_numpy_parity(spark):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((200, 6))
    df = spark.createDataFrame(
        [(i, m[i].tolist()) for i in range(200)], "id long, vector array<double>"
    )
    vs = collect_vector_stats(df, "vector", 6)
    np.testing.assert_allclose(vs["centroid"], m.mean(axis=0), rtol=1e-9)
    cent = m.mean(axis=0)
    np.testing.assert_allclose(
        vs["radius"], np.linalg.norm(m - cent[None, :], axis=1).max(), rtol=1e-9
    )
    np.testing.assert_allclose(
        vs["max_norm"], np.linalg.norm(m, axis=1).max(), rtol=1e-9
    )


def test_segment_priority_orders_by_distance_bound():
    def seg_at(center, radius, path):
        return SegmentMeta(
            path=path, rows=10, lsn=1,
            stats={"vector": {"centroid": center, "radius": radius}},
        )

    a = seg_at([0.0, 0.0], 1.0, "near")
    b = seg_at([10.0, 0.0], 1.0, "far")
    c = seg_at([100.0, 0.0], 1.0, "farther")
    ordered = segment_priority([c, b, a], [0.5, 0.0], "vector")
    assert [s.path for s, _ in ordered] == ["near", "far", "farther"]
    assert ordered[0][1] == 0.0  # query inside the near ball → bound 0
    assert ordered[1][1] == pytest.approx(math.hypot(9.5, 0) - 1.0)


def test_table_priority_search_scans_only_budgeted_segments(spark, tmp_path):
    t = VectorTable.create(spark, str(tmp_path / "t"), dim=4, metric="l2")
    rng = np.random.default_rng(2)
    # three well-separated segments (one insert each → one segment each)
    for base, start in [(0.0, 0), (50.0, 100), (200.0, 200)]:
        rows = [
            (start + i, (base + rng.standard_normal(4) * 0.1).tolist())
            for i in range(30)
        ]
        t.insert(spark.createDataFrame(rows, "id long, vector array<double>"))
    t.commit()
    q = [49.9] * 4
    pr = t.segment_priorities(q)
    assert pr[0][1] == 0.0 or pr[0][1] < pr[1][1]
    budgeted = t.search(q, k=5, segment_budget=1)
    got = {r["id"] for r in budgeted.collect()}
    assert got <= set(range(100, 130))  # only the middle segment's rows
    assert len(set(budgeted.inputFiles())) < len(set(t.df().inputFiles()))


def test_numeric_moments_collected(spark):
    """sum/sumsq running moments (StatsCollector parity) → mean/stddev."""
    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    cs = collect_stats(df)["x"]
    assert cs["sum"] == sum(vals)
    assert cs["sumsq"] == sum(v * v for v in vals)
    assert cs["mean"] == pytest.approx(np.mean(vals))
    assert cs["stddev"] == pytest.approx(np.std(vals))


def test_observed_stats_equal_two_pass_stats(spark, tmp_path):
    """observe_segment_stats (pass 1 riding the write job) must produce
    the SAME manifest stats as the standalone two-pass collector over the
    written files — min/max/nulls/values/moments/histograms/bloom/vector
    profile, everything the pruner reads."""
    import numpy as np

    from vecgo_spark.plans.pruning import (
        collect_segment_stats,
        observe_segment_stats,
    )

    rng = np.random.default_rng(31)
    rows = [
        (i, float(rng.normal(50, 20)), f"cat{i % 5}", f"wide{i}",
         [float(x) for x in rng.standard_normal(4)])
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "id long, price double, category string, tag string, vector array<double>")
    dest = str(tmp_path / "seg")
    obs_df, fin = observe_segment_stats(df, vector_col="vector", dim=4)
    obs_df.write.parquet(dest)
    written = spark.read.parquet(dest)
    got = fin(written)
    want = collect_segment_stats(written, vector_col="vector", dim=4)
    # float sums may differ in accumulation order between the two runs —
    # everything else must be identical, the sums equal to 1e-9 rel
    def norm(d):
        out = {}
        for col, cs in d.items():
            if not isinstance(cs, dict):
                out[col] = cs
                continue
            out[col] = {k: (round(v, 6) if isinstance(v, float) else v)
                        for k, v in cs.items() if k != "bloom"}
            if "bloom" in cs:
                out[col]["bloom"] = cs["bloom"]["bits"]
            if "centroid" in cs:
                out[col]["centroid"] = [round(x, 6) for x in cs["centroid"]]
        return out
    assert norm(got) == norm(want)
