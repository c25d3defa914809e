"""Histogram selectivity estimation (EstimateSelectivity,
stats.go:340-427) and the adaptive IVF probe-widening it drives
(the 0.30 cutoff of search.go:295-302 + the <2% brute shortcut of
hnsw.go:1701-1725)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.filters import FilterSet
from vecgo_spark.plans.pruning import collect_stats, estimate_selectivity
from vecgo_spark.plans.table import VectorTable


@pytest.fixture(scope="module")
def stats_and_rows(spark):
    rng = np.random.default_rng(3)
    rows = [(i, float(rng.uniform(0, 100)), ["A", "B", "C", "D"][i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "id LONG, price DOUBLE, category STRING")
    return collect_stats(df), rows


def test_histogram_collected(stats_and_rows):
    stats, rows = stats_and_rows
    h = stats["price"]["histogram"]
    assert len(h) == 8 and sum(h) == 2000
    # uniform data → roughly even bins
    assert min(h) > 150


def test_range_estimates_close_to_truth(stats_and_rows):
    stats, rows = stats_and_rows
    prices = [p for _, p, _ in rows]
    for op, v in (("gt", 50), ("lt", 10), ("gt", 90), ("lte", 75)):
        fs = getattr(FilterSet(), op)("price", v)
        est = estimate_selectivity(stats, 2000, fs)
        truth = sum(
            1 for p in prices
            if (p > v if op == "gt" else p < v if op == "lt" else p <= v)
        ) / 2000
        assert abs(est - truth) < 0.05, (op, v, est, truth)


def test_categorical_and_conjunction(stats_and_rows):
    stats, _ = stats_and_rows
    est = estimate_selectivity(stats, 2000, FilterSet().eq("category", "A"))
    assert abs(est - 0.25) < 0.01
    assert estimate_selectivity(stats, 2000, FilterSet().eq("category", "Z")) == 0.0
    both = estimate_selectivity(stats, 2000, FilterSet().eq("category", "A").gt("price", 50))
    assert abs(both - 0.125) < 0.02  # independence product
    # unknown column → conservative 1.0 factor
    assert estimate_selectivity(stats, 2000, FilterSet().gt("nope", 1)) == 1.0


def test_adaptive_probe_widening(spark):
    from vecgo_spark.operators import ivf

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(8).tolist(), int(i % 100)) for i in range(800)]
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>, g INT").cache()
    model = ivf.train_ivf(df, "vector", nlist=8)
    assigned = ivf.assign(df, model, "vector").cache()
    q = rows[0][1]
    filt = FilterSet().eq("g", 7)  # ~1% selectivity
    # selectivity < 2% → full probe → must EQUAL exact filtered search
    from vecgo_spark.operators import knn
    exact = [(r["id"], r["score"]) for r in knn.search(df, q, k=5, metric="l2", filter=filt).collect()]
    got = [(r["id"], r["score"]) for r in
           ivf.search(assigned, model, q, k=5, nprobe=1, filter=filt, selectivity=0.01).collect()]
    assert got == exact
    # high selectivity → no boost: probe set stays nprobe
    wide = ivf.search(assigned, model, q, k=5, nprobe=1, filter=None).inputFiles  # plan builds
    assert ivf.probe_clusters(model, q, 1) == ivf.probe_clusters(model, q, 1)


def test_query_stats_reports_selectivity(spark, tmp_path):
    t = VectorTable.create(spark, str(tmp_path / "t"), dim=2, metric="l2")
    t.insert(spark.createDataFrame(
        [(i, [float(i), 0.0], float(i)) for i in range(100)],
        "id LONG, vector ARRAY<DOUBLE>, price DOUBLE"))
    t.commit()
    _, qs = t.search_with_stats([0.0, 0.0], k=5, filter=FilterSet().gt("price", 49.5))
    assert qs.selectivity_est is not None
    assert abs(qs.selectivity_est - 0.5) < 0.1
    assert "estimated filter selectivity" in qs.explain()


@pytest.mark.parametrize(
    "dist", ["uniform", "zipfian", "seglocal", "correlated", "booladv"])
def test_filtered_boost_never_worse_than_postfilter(spark, tmp_path, dist):
    """Strategy-parity property at the reference's pre/post-filter
    boundary (search.go:295-307): for every adversarial fixture
    distribution and both a common and a rare category filter (straddling
    the 0.30 selectivity cutoff), the selectivity-driven probe strategy
    (ivf.search with estimate) must never return WORSE filtered recall
    than the post-filter baseline (unfiltered top-k, then filter)."""
    from vecgo_spark.operators import ivf
    from vecgo_spark.testing import fixtures

    path = fixtures.make_t1(str(tmp_path / dist), dist=dist, n=1000, dim=8)
    df = spark.read.parquet(path).select("id", "vector", "category")
    model = ivf.train_ivf(df, "vector", nlist=8, max_iter=10,
                          trainer="driver", order_col="id")
    assigned = ivf.assign(df, model, "vector")
    stats = collect_stats(df)
    rows = [(r["id"], np.array(r["vector"], dtype=np.float64), r["category"])
            for r in df.collect()]
    q = np.full(8, 0.5)
    k = 10
    for cat in ("A", "D"):  # common vs rare (zipf/seglocal make D ≪ 30%)
        fs = FilterSet().eq("category", cat)
        est = estimate_selectivity(stats, 1000, fs)
        truth = sorted(
            (float(((v - q) ** 2).sum()), rid)
            for rid, v, c in rows if c == cat)
        truth_ids = {rid for _, rid in truth[:k]}
        if not truth_ids:
            continue
        # post-filter baseline: unfiltered nprobe=1 top-k, filter after
        post = ivf.search(assigned, model, q.tolist(), k=k, nprobe=1).collect()
        cat_of = {rid: c for rid, _, c in rows}
        post_ids = {r["id"] for r in post if cat_of.get(r["id"]) == cat}
        boosted = ivf.search(assigned, model, q.tolist(), k=k, nprobe=1,
                             filter=fs, selectivity=est).collect()
        boost_ids = {r["id"] for r in boosted}
        r_post = len(post_ids & truth_ids) / len(truth_ids)
        r_boost = len(boost_ids & truth_ids) / len(truth_ids)
        assert r_boost >= r_post, (dist, cat, est, r_boost, r_post)


@pytest.mark.parametrize(
    "dist", ["uniform", "zipfian", "seglocal", "correlated", "booladv"])
def test_adaptive_ema_never_lowers_recall(spark, tmp_path, dist):
    """Adaptive selectivity EMA (stats.go:205-224): per-field-set
    observed-selectivity feedback, fed by the query's own action via a
    free-riding Observation, min-blended into the static estimate. The
    property across all five adversarial distributions and three filter
    shapes (common eq, rare eq, ANDed correlated pair): after one
    feedback query, the EMA-adjusted search NEVER returns worse filtered
    recall than the static-0.30-cutoff strategy — min-blend can only
    widen the probe set — and the adjusted estimate is never above the
    static one."""
    from vecgo_spark.operators import ivf
    from vecgo_spark.plans.pruning import AdaptiveSelectivity
    from vecgo_spark.testing import fixtures

    path = fixtures.make_t1(str(tmp_path / dist), dist=dist, n=1000, dim=8)
    df = spark.read.parquet(path).select("id", "vector", "category", "flag")
    model = ivf.train_ivf(df, "vector", nlist=8, max_iter=10,
                          trainer="driver", order_col="id")
    assigned = ivf.assign(df, model, "vector").cache()
    stats = collect_stats(df)
    rows = [(r["id"], np.array(r["vector"], dtype=np.float64),
             r["category"], r["flag"]) for r in df.collect()]
    q = np.full(8, 0.5)
    k = 10

    def matches(fs, c, f):
        ok = True
        for flt in fs.filters:
            v = c if flt.key == "category" else f
            ok = ok and v is not None and v == flt.value
        return ok

    ema = AdaptiveSelectivity()
    shapes = [FilterSet().eq("category", "A"),
              FilterSet().eq("category", "D"),
              FilterSet().eq("category", "A").eq("flag", True)]
    for fs in shapes:
        est = estimate_selectivity(stats, 1000, fs)
        truth = sorted((float(((v - q) ** 2).sum()), rid)
                       for rid, v, c, f in rows if matches(fs, c, f))
        truth_ids = {rid for _, rid in truth[:k]}
        if not truth_ids:
            continue
        static_ids = {r["id"] for r in ivf.search(
            assigned, model, q.tolist(), k=k, nprobe=1,
            filter=fs, selectivity=est).collect()}
        # feedback pass: identical arguments, observation rides the scan
        _ = ivf.search(assigned, model, q.tolist(), k=k, nprobe=1,
                       filter=fs, selectivity=est, ema=ema).collect()
        ema.drain()
        adj = ema.adjust(fs, est)
        assert adj <= est + 1e-12  # min-blend never claims less selective
        adj_ids = {r["id"] for r in ivf.search(
            assigned, model, q.tolist(), k=k, nprobe=1,
            filter=fs, selectivity=est, ema=ema).collect()}
        r_static = len(static_ids & truth_ids) / len(truth_ids)
        r_adj = len(adj_ids & truth_ids) / len(truth_ids)
        assert r_adj >= r_static, (dist, fs.filters, est, adj, r_adj, r_static)
    assigned.unpersist()


def test_adaptive_ema_learns_correlated_and(spark, tmp_path):
    """The payoff direction on the adversarial correlated pair
    (booladv: flag == parity(category bucket)): independence multiplies
    the per-field fractions and lands ABOVE the truth; the EMA observes
    the true joint fraction and pulls the estimate down — and when the
    static estimate sat above a widening tier boundary while the truth
    sits below it, the adjusted probe set is strictly wider."""
    from vecgo_spark.operators import ivf
    from vecgo_spark.plans.pruning import AdaptiveSelectivity
    from vecgo_spark.testing import fixtures

    path = fixtures.make_t1(str(tmp_path / "booladv2"), dist="booladv",
                            n=1000, dim=8)
    df = spark.read.parquet(path).select("id", "vector", "category", "flag")
    model = ivf.train_ivf(df, "vector", nlist=8, max_iter=10,
                          trainer="driver", order_col="id")
    assigned = ivf.assign(df, model, "vector").cache()
    stats = collect_stats(df)
    # pick the (category, flag) pair that is IMPOSSIBLE under the
    # correlation (flag fixed by category parity) — independence says
    # ~sel(cat)·0.5, truth is ~0
    n_true = df.where((F.col("category") == "A") & F.col("flag")).count()
    want_flag = n_true == 0
    fs = FilterSet().eq("category", "A").eq("flag", bool(want_flag))
    truth_frac = df.where(
        (F.col("category") == "A") & (F.col("flag") == bool(want_flag))
    ).count() / 1000.0
    est = estimate_selectivity(stats, 1000, fs)
    assert est > truth_frac + 0.05  # independence really overestimates
    ema = AdaptiveSelectivity()
    _ = ivf.search(assigned, model, [0.5] * 8, k=5, nprobe=1,
                   filter=fs, selectivity=est, ema=ema).collect()
    ema.drain()
    adj = ema.adjust(fs, est)
    assert adj < est  # feedback pulled the estimate toward the truth
    assigned.unpersist()


def test_adaptive_ema_flips_graph_search_to_exact_branch(spark, tmp_path):
    """Graph filtered search (graph_at_rest cutover 0.3, hnsw.go:1118)
    with EMA feedback: a correlated AND pair whose independence estimate
    sits ABOVE the cutover (→ static takes the post-filter branch) but
    whose true joint fraction sits BELOW it. The first query's own
    rerank scan feeds the truth back; the next query flips to the
    exact-scan branch (recall 1.0 by construction) and returns exactly
    the filtered ground truth. min-blend direction: the flip can only go
    TOWARD exact, so recall never drops below the static behavior."""
    from vecgo_spark.plans.pruning import AdaptiveSelectivity
    from vecgo_spark.plans.table import VectorTable

    rng = np.random.default_rng(41)
    rows = []
    for i in range(200):
        cat = "A" if i < 140 else "B"
        flag = bool(110 <= i < 200)  # A∧True = ids 110..139 (0.15)
        rows.append((i, rng.standard_normal(8).tolist(), cat, flag))
    t = VectorTable.create(spark, str(tmp_path / "tg"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(
        rows, "id long, vector array<double>, category string, flag boolean"))
    t.commit()
    t.build_graph_index("hnsw")
    fs = FilterSet().eq("category", "A").eq("flag", True)
    # static estimate from segment stats: independence puts it over 0.3
    from vecgo_spark.plans.pruning import estimate_selectivity
    segs = t.manifest.segments
    total = sum(s.rows for s in segs)
    est = sum(estimate_selectivity(s.stats, s.rows, fs) * s.rows
              for s in segs) / total
    assert est >= 0.3 > 30 / 200  # adversarial: estimate above, truth below

    q = [0.1] * 8
    truth = sorted(
        (sum((a - b) ** 2 for a, b in zip(v, q)), i)
        for i, v, c, f in rows if c == "A" and f)
    truth_ids = [i for _, i in truth[:5]]

    # the table-owned front: enable once, searches consult + feed it
    ema = t.enable_adaptive_selectivity()
    assert isinstance(ema, AdaptiveSelectivity)
    assert t.enable_adaptive_selectivity() is ema  # idempotent
    first = t.graph_search(q, k=5, filter=fs)
    static_ids = [r["id"] for r in first.collect()]  # post-filter branch
    ema.drain()
    adj = ema.adjust(fs, est)
    assert adj < 0.3 <= est  # feedback crossed the cutover boundary
    second = t.graph_search(q, k=5, filter=fs, ema=ema)
    plan = second._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # exact branch: no graph probe
    got = [r["id"] for r in second.collect()]
    assert got == truth_ids  # exact branch == filtered ground truth
    r_static = len(set(static_ids) & set(truth_ids)) / 5
    assert len(set(got) & set(truth_ids)) / 5 >= r_static


def test_prune_accuracy_weighting(spark):
    """PruneAccuracy (stats.go:210-214): decisions scored by whether the
    static estimate and the observed fraction land on the same side of
    the threshold; the blend leans static when static has been accurate
    and observed when it has not — while staying ≤ the static estimate
    (the min-blend recall invariant)."""
    from vecgo_spark.plans.pruning import AdaptiveSelectivity

    def fed(correct: bool) -> AdaptiveSelectivity:
        """EMA fed via its own attach/drain path: static estimate 0.5,
        observed 0.05 — a mis-estimating fixture; `correct` plants the
        estimate on the right/wrong side of the decision threshold."""
        ema = AdaptiveSelectivity(alpha=1.0)
        df = spark.range(100).withColumn("v", F.col("id") % 20)
        fs = FilterSet().eq("v", 3)
        for _ in range(3):
            out = ema.attach(df, fs, F.col("v") == 3,
                             estimate=0.5,
                             threshold=0.3 if correct is False else 0.6)
            out.count()  # execute → observation completes (obs 0.05)
            ema.drain()
        return ema

    fs = FilterSet().eq("v", 3)
    # static WRONG side (est 0.5 ≥ thr 0.3, truth 0.05 < 0.3): acc → 0,
    # full min-blend — the observed correction applies
    wrong = fed(correct=False)
    assert wrong.adjust(fs, 0.5) == pytest.approx(0.05, abs=1e-9)
    # static RIGHT side (both under thr 0.6): acc → 1, blend leans static
    right = fed(correct=True)
    assert right.adjust(fs, 0.5) == pytest.approx(0.5, abs=1e-9)
    # invariant: whatever the accuracy, never above the static estimate
    for ema in (wrong, right):
        for est in (0.01, 0.05, 0.5, 0.9):
            assert ema.adjust(fs, est) <= est + 1e-12


def test_adaptive_ema_pending_cap_and_hot_field(spark):
    """r10 ADVICE: _pending must not grow unbounded when attached frames
    are never executed. HotField (stats.go:216-219): the most frequently
    filtered field surfaces through the table stats as an indexing
    recommendation."""
    from vecgo_spark.plans.pruning import AdaptiveSelectivity

    ema = AdaptiveSelectivity()
    df = spark.range(10)
    fs = FilterSet().eq("id", 1)
    for _ in range(ema.PENDING_CAP + 20):
        ema.attach(df, fs, F.col("id") == 1)  # never executed
    assert len(ema._pending) == ema.PENDING_CAP
    # hot field: 'price' filtered more often than 'category'
    for _ in range(3):
        ema.adjust(FilterSet().gt("price", 1.0), 0.5)
    ema.adjust(FilterSet().eq("category", "A"), 0.5)
    assert ema.hot_field() == "price"


def test_hot_field_recommendation_in_table_stats(spark, tmp_path):
    t = VectorTable.create(spark, str(tmp_path / "hf"), dim=2)
    t.insert(spark.createDataFrame(
        [(i, [float(i), 0.0], float(i)) for i in range(50)],
        "id long, vector array<double>, price double"))
    t.commit()
    assert "hot_field" not in t.stats()  # EMA off → no recommendation
    ema = t.enable_adaptive_selectivity()
    assert "hot_field" not in t.stats()  # no filtered workload yet
    for _ in range(2):
        ema.adjust(FilterSet().gt("price", 10.0), 0.4)
    s = t.stats()
    assert s["hot_field"] == "price"
    assert "cluster/sort" in s["hot_field_hint"]


def test_persisted_ema_lifecycle(spark, tmp_path):
    """Opt-in FeedbackStore analog (stats.go:205-208): persist=True
    snapshots the EMA into manifest meta at commit; a fresh open with
    persist=True warms from it. Default stays session-only."""
    path = str(tmp_path / "pe")
    t = VectorTable.create(spark, path, dim=2)
    t.insert(spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "id long, vector array<double>"))
    t.commit()
    fs = FilterSet().eq("id", 3).gt("id", 1)
    ema = t.enable_adaptive_selectivity(persist=True)
    ema.observe(fs, 0.07)
    t.insert(spark.createDataFrame([(99, [9.0, 9.0])],
                                   "id long, vector array<double>"))
    t.commit()  # snapshot rides this publish
    assert "selectivity_ema" in t.manifest.meta
    # fresh open + persist=True → observed estimate present immediately
    t2 = VectorTable.open(spark, path)
    ema2 = t2.enable_adaptive_selectivity(persist=True)
    assert ema2.adjust(fs, 0.5) == pytest.approx(0.07, abs=1e-9)
    # fresh open WITHOUT persist → session-only state, nothing loaded
    t3 = VectorTable.open(spark, path)
    ema3 = t3.enable_adaptive_selectivity()
    assert ema3.adjust(fs, 0.5) == 0.5
    # and a table that never opted in has no meta entry
    p2 = str(tmp_path / "pe2")
    u = VectorTable.create(spark, p2, dim=2)
    u.enable_adaptive_selectivity().observe(fs, 0.1)
    u.insert(spark.createDataFrame([(1, [0.0, 0.0])],
                                   "id long, vector array<double>"))
    u.commit()
    assert "selectivity_ema" not in u.manifest.meta


def test_enable_persist_upgrades_existing_ema(spark, tmp_path):
    """r11 review: enable_adaptive_selectivity(persist=True) on a table
    whose EMA was already enabled session-only used to be silently
    ignored — no commit snapshot, no warm-start, no error. The call now
    upgrades in place: stored snapshot loaded (live observations win),
    subsequent commits persist."""
    path = str(tmp_path / "pu")
    t = VectorTable.create(spark, path, dim=2)
    t.insert(spark.createDataFrame([(1, [0.0, 0.0])],
                                   "id long, vector array<double>"))
    t.commit()
    fs_live = FilterSet().eq("id", 1)
    fs_stored = FilterSet().gt("id", 5)
    # a previous persist=True session stored estimates for fs_stored
    seed = t.enable_adaptive_selectivity(persist=True)
    seed.observe(fs_stored, 0.02)
    t.insert(spark.createDataFrame([(2, [0.0, 0.0])],
                                   "id long, vector array<double>"))
    t.commit()
    # fresh open, EMA enabled session-only first, then upgraded
    t2 = VectorTable.open(spark, path)
    ema = t2.enable_adaptive_selectivity()
    ema.observe(fs_live, 0.4)
    up = t2.enable_adaptive_selectivity(persist=True)
    assert up.persist is True
    assert up.adjust(fs_live, 0.9) == pytest.approx(0.4)    # live kept
    assert up.adjust(fs_stored, 0.9) == pytest.approx(0.02)  # warmed
    t2.insert(spark.createDataFrame([(3, [0.0, 0.0])],
                                    "id long, vector array<double>"))
    t2.commit()  # upgraded instance now snapshots at commit
    meta = t2.manifest.meta["selectivity_ema"]
    assert any(abs(v - 0.4) < 1e-9 for v in meta["ema"].values())


def test_persisted_ema_key_roundtrip_with_separator_chars():
    """Field names containing '|' or ':' must round-trip through the
    manifest snapshot (r11 review: the old split-based format corrupted
    them, so warmed estimates silently never applied)."""
    from vecgo_spark.plans.pruning import AdaptiveSelectivity

    a = AdaptiveSelectivity(persist=True)
    fs = FilterSet().eq("weird|field:name", 7)
    a.observe(fs, 0.11)
    b = AdaptiveSelectivity(persist=True)
    b.load_meta(a.to_meta())
    assert b.adjust(fs, 0.9) == pytest.approx(0.11)
    # legacy separator strings still best-effort parse
    assert AdaptiveSelectivity._s2k("id:eq|lang:eq") == \
        (("id", "eq"), ("lang", "eq"))
