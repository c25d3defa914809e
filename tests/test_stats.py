"""Stats collector parity checks that are not SQL-oracle-expressible:
log-scale histogram (reference scale, stats_collector.go:446-529) and
vector centroid/norm profile (stats_collector.go:554-614) vs numpy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import stats


@pytest.fixture(scope="module")
def seg_df(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, int(i % 3), float(rng.uniform(0, 1000)), rng.standard_normal(8).tolist())
        for i in range(900)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, seg INT, x DOUBLE, vector ARRAY<DOUBLE>").cache()
    df.count()
    return df, rows


def test_log_histogram_matches_numpy(seg_df):
    df, rows = seg_df
    got = stats.histogram(df, "seg", "x", bins=16, scale="log").collect()
    by_seg: dict[int, list[float]] = {}
    for _, seg, x, _v in rows:
        by_seg.setdefault(seg, []).append(x)
    expect: dict[tuple[int, int], int] = {}
    for seg, xs in by_seg.items():
        lo, hi = min(xs), max(xs)
        for x in xs:
            pos = math.log(x - lo + 1.0) / math.log(hi - lo + 1.0)
            b = min(15, max(0, int(math.floor(pos * 16.0))))
            expect[(seg, b)] = expect.get((seg, b), 0) + 1
    got_counts = {(r["seg"], r["bin"]): r["bin_count"] for r in got}
    assert got_counts == expect


def test_histogram_bin_minmax_within_bounds(seg_df):
    df, _ = seg_df
    for r in stats.histogram(df, "seg", "x", bins=16).collect():
        assert r["bin_min"] <= r["bin_max"]
        assert r["bin_count"] > 0


def test_vector_profile_matches_numpy(seg_df):
    df, rows = seg_df
    got = {r["seg"]: r for r in stats.vector_profile(df, "seg", "vector").collect()}
    for seg in (0, 1, 2):
        vs = np.array([v for _, s, _, v in rows if s == seg])
        np.testing.assert_allclose(got[seg]["centroid"], vs.mean(axis=0), rtol=1e-9)
        norms = np.linalg.norm(vs, axis=1)
        assert got[seg]["row_count"] == len(vs)
        np.testing.assert_allclose(got[seg]["mean_norm"], norms.mean(), rtol=1e-9)
        np.testing.assert_allclose(got[seg]["max_norm"], norms.max(), rtol=1e-12)


def test_numeric_profile_values(seg_df):
    df, rows = seg_df
    got = {r["seg"]: r for r in stats.numeric_profile(df, "seg", "x").collect()}
    for seg in (0, 1, 2):
        xs = [x for _, s, x, _ in rows if s == seg]
        assert got[seg]["row_count"] == len(xs)
        assert got[seg]["min"] == min(xs)
        assert got[seg]["max"] == max(xs)
        np.testing.assert_allclose(got[seg]["mean"], float(np.mean(xs)), rtol=1e-12)


def test_categorical_entropy_value(spark):
    df = spark.createDataFrame(
        [(0, "a")] * 50 + [(0, "b")] * 30 + [(0, "c")] * 20,
        "seg INT, val STRING",
    )
    r = stats.categorical_profile(df, "seg", "val").first()
    expect = -(0.5 * math.log(0.5) + 0.3 * math.log(0.3) + 0.2 * math.log(0.2))
    assert abs(r["entropy"] - expect) < 1e-12
    assert r["dominant_value"] == "a"
    assert abs(r["dominant_ratio"] - 0.5) < 1e-12
    assert r["n_distinct"] == 3


def test_grouped_percentiles_vs_numpy_and_partition_independent(spark):
    """Per-group exact quantiles == numpy per group (type-7), identical
    across partition counts, singleton groups degenerate to the value."""
    import numpy as np

    from vecgo_spark.operators.stats import grouped_percentiles, release_caches

    vals = {"a": [float((i * 7919) % 500) for i in range(101)],
            "b": [float(i * i % 97) for i in range(40)],
            "c": [42.0],
            "d": [7.0] * 30 + [9.0] * 3}  # duplicate-heavy: rank ties
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, x double")
    ps = [0.1, 0.5, 0.9, 0.99]
    got = {(r["source"], r["p"]): r["value"]
           for r in grouped_percentiles(df, "source", "x", ps, n_partitions=5).collect()}
    for g, vs in vals.items():
        want = np.percentile(np.array(vs), [p * 100 for p in ps], method="linear")
        for p, w in zip(ps, want):
            assert got[(g, p)] == pytest.approx(float(w), abs=1e-9), (g, p)
    assert all(got[("c", p)] == 42.0 for p in ps)
    got2 = {(r["source"], r["p"]): r["value"]
            for r in grouped_percentiles(
                df.repartition(13), "source", "x", ps, n_partitions=2).collect()}
    assert got2 == got
    release_caches()


def test_grouped_percentiles_no_per_group_window(spark):
    """100-TB pin: every window over the data stream partitions by
    (pid, grp) — a mega-group spreads over the range partitions instead
    of serializing through one window task (the token_budget bug class).
    The grp-only window runs over the tiny per-partition count aggregate
    (ordered by pid)."""
    import re

    from vecgo_spark.operators.stats import grouped_percentiles, release_caches

    df = spark.createDataFrame([("a", float(i)) for i in range(50)],
                               "source string, x double")
    plan = (grouped_percentiles(df, "source", "x", [0.5])
            ._jdf.queryExecution().optimizedPlan().toString())
    release_caches()
    for m in re.finditer(r"Window \[.*\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        parts = [t.split("#")[0].strip() for t in m.group(1).split(",") if t.strip()]
        orders = [t.split("#")[0].strip() for t in m.group(2).split(",")
                  if " ASC" in t or " DESC" in t]
        if "v" in orders:  # the data-stream ranking window
            assert "pid" in parts, f"data window partitioned by {parts}"
        if parts == ["grp"]:  # the offsets window — tiny aggregate only
            assert orders == ["pid"], orders


def test_cluster_label_purity_ground_truth(spark):
    """Planted clusters with known label mixtures: counts, dominant label
    (ties → smallest label) and purity are exact."""
    import numpy as np

    from vecgo_spark.operators import ivf
    from vecgo_spark.operators.stats import cluster_label_purity

    rng = np.random.default_rng(3)
    rows = []
    # cluster around (1,0): labels 7,7,7,2 → dominant 7, purity 0.75
    for j, lab in enumerate([7, 7, 7, 2]):
        v = np.array([1.0, 0.0]) + rng.normal(0, 0.01, 2)
        rows.append((j, [float(x) for x in v], lab))
    # cluster around (0,1): labels 5,9 (tie) → dominant 5 (smallest)
    for j, lab in enumerate([5, 9]):
        v = np.array([0.0, 1.0]) + rng.normal(0, 0.01, 2)
        rows.append((10 + j, [float(x) for x in v], lab))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")
    model = ivf.train_ivf(emb, "embedding", nlist=2, max_iter=10,
                          trainer="driver", order_col="vec_id")
    got = {r["cluster_id"]: r for r in cluster_label_purity(emb, model).collect()}
    assert len(got) == 2
    by_dom = {r["dominant_label"]: r for r in got.values()}
    assert by_dom[7]["n_rows"] == 4 and by_dom[7]["purity"] == 0.75
    assert by_dom[7]["n_labels"] == 2
    assert by_dom[5]["n_rows"] == 2 and by_dom[5]["purity"] == 0.5  # tie → 5


def test_cluster_label_purity_string_labels(spark):
    """String ground-truth labels (the common case) must work and break
    dominant ties lexicographically ASC, matching the SQL twin's ORDER BY
    n DESC, label ASC (ADVICE r8: the old numeric-negation tie-break
    raised AnalysisException on strings)."""
    import numpy as np

    from vecgo_spark.operators import ivf
    from vecgo_spark.operators.stats import cluster_label_purity

    rng = np.random.default_rng(5)
    rows = []
    # cluster around (1,0): news ×3, web ×1 → dominant 'news', purity .75
    for j, lab in enumerate(["news", "news", "news", "web"]):
        v = np.array([1.0, 0.0]) + rng.normal(0, 0.01, 2)
        rows.append((j, [float(x) for x in v], lab))
    # cluster around (0,1): 'web','blog' tie → dominant 'blog' (asc)
    for j, lab in enumerate(["web", "blog"]):
        v = np.array([0.0, 1.0]) + rng.normal(0, 0.01, 2)
        rows.append((10 + j, [float(x) for x in v], lab))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    model = ivf.train_ivf(emb, "embedding", nlist=2, max_iter=10,
                          trainer="driver", order_col="vec_id")
    got = {r["dominant_label"]: r for r in cluster_label_purity(emb, model).collect()}
    assert got["news"]["n_rows"] == 4 and got["news"]["purity"] == 0.75
    assert got["blog"]["n_rows"] == 2 and got["blog"]["purity"] == 0.5
