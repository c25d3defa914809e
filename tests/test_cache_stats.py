"""Engine CacheStats — combined hit/miss counters of the read-path
caches (the reference's Engine.CacheStats, engine.go:2210-2223, over
blockCache + diskCache; per-cache detail mirrors ShardStats,
internal/cache/sharded_lru.go:112). Our caches are the keyed artifact
registries: loaded PK-index frames, trained IVF centroids, PQ/OPQ
codebooks — see vecgo_spark/cache_stats.py."""

import pytest

from vecgo_spark import cache_stats
from vecgo_spark.plans.table import VectorTable


@pytest.fixture(autouse=True)
def _reset_counters():
    cache_stats.reset()
    yield
    cache_stats.reset()


def _rows(spark, ids, tag="a"):
    return spark.createDataFrame(
        [(i, [float(i), 0.0], tag) for i in ids],
        "id long, vector array<float>, tag string")


def test_pk_index_hits_and_misses(spark, tmp_path):
    from vecgo_spark.plans import table as tmod

    tmod.release_vis_caches()
    t = VectorTable.create(spark, str(tmp_path / "t"), dim=2)
    t.insert(_rows(spark, range(10)))
    t.commit()
    t.insert(_rows(spark, [1], tag="b"))  # upsert → churn
    t.commit()
    sub = [s for s in t.manifest.segments if s.lsn == 1]
    assert VectorTable.cache_stats() == (0, 0)
    t.df(segments=sub).count()  # builds the winning-LSN frame → miss
    assert VectorTable.cache_stats() == (0, 1)
    t.df(segments=sub).count()  # same snapshot → hit
    t.df(segments=sub).count()
    assert VectorTable.cache_stats() == (2, 1)
    detail = VectorTable.cache_stats_detail()
    assert detail["pk_index"] == {"hits": 2, "misses": 1}
    # releasing the loaded frames → next consult is a miss again
    tmod.release_vis_caches()
    t.df(segments=sub).count()
    assert VectorTable.cache_stats_detail()["pk_index"]["misses"] == 2


def test_trained_artifact_caches_count(spark):
    from vecgo_spark.operators.ivf import _MODEL_CACHE, train_ivf
    from vecgo_spark.quantization.pq import _PQ_CACHE, train_pq

    _MODEL_CACHE.clear()
    _PQ_CACHE.clear()
    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(64)],
        "id long, vector array<float>")
    train_ivf(df, nlist=2, cache_key="cs", trainer="driver", order_col="id")
    train_ivf(df, nlist=2, cache_key="cs", trainer="driver", order_col="id")
    assert cache_stats.cache_stats_detail()["ivf_model"] == {
        "hits": 1, "misses": 1}
    train_pq(df, "vector", m=2, k=4, cache_key="cs", order_col="id")
    train_pq(df, "vector", m=2, k=4, cache_key="cs", order_col="id")
    assert cache_stats.cache_stats_detail()["pq_codebooks"] == {
        "hits": 1, "misses": 1}
    # no cache_key → the cache is bypassed: counts neither
    before = cache_stats.cache_stats()
    train_ivf(df, nlist=2, trainer="driver", order_col="id")
    assert cache_stats.cache_stats() == before
    # combined = sums across caches (the reference folds block + disk)
    h, m = cache_stats.cache_stats()
    assert (h, m) == (2, 2)


def test_per_table_scoped_counters(spark, tmp_path):
    """r11 verdict #8 — per-engine-instance counters: two churned tables
    served from one session report INDEPENDENT pk_index hit/miss counts
    via table_cache_stats(); the global view still folds both, and a
    table with no consults reports zeros."""
    from vecgo_spark.plans import table as tmod

    tmod.release_vis_caches()
    tables = []
    for name in ("a", "b"):
        t = VectorTable.create(spark, str(tmp_path / name), dim=2)
        t.insert(_rows(spark, range(10)))
        t.commit()
        t.insert(_rows(spark, [1], tag="b"))  # upsert → churn
        t.commit()
        tables.append(t)
    ta, tb = tables
    sub_a = [s for s in ta.manifest.segments if s.lsn == 1]
    sub_b = [s for s in tb.manifest.segments if s.lsn == 1]
    ta.df(segments=sub_a).count()  # miss
    ta.df(segments=sub_a).count()  # hit
    ta.df(segments=sub_a).count()  # hit
    tb.df(segments=sub_b).count()  # miss (b's own frame)
    assert ta.table_cache_stats() == (2, 1)
    assert tb.table_cache_stats() == (0, 1)
    assert ta.table_cache_stats_detail()["pk_index"] == {
        "hits": 2, "misses": 1}
    # global view unchanged: the fold of both tables
    assert VectorTable.cache_stats() == (2, 2)
    assert VectorTable.cache_stats_detail()["pk_index"] == {
        "hits": 2, "misses": 2}
    # a fresh table with no consults reports zeros, not another's counts
    tc = VectorTable.create(spark, str(tmp_path / "c"), dim=2)
    assert tc.table_cache_stats() == (0, 0)
    tmod.release_vis_caches()


def test_table_scoped_model_caches(spark, tmp_path):
    """r12 verdict #6 — table-driven IVF/PQ training (compact with
    cluster_by= / quantize='pq') is snapshot-keyed and scoped to the
    table: a recompaction of the SAME committed snapshot is a model
    cache hit attributed to that table, two tables stay independent,
    and free-standing (string-keyed) training stays global-only."""
    from vecgo_spark.operators.ivf import _MODEL_CACHE, train_ivf
    from vecgo_spark.quantization.pq import _PQ_CACHE

    _MODEL_CACHE.clear()
    _PQ_CACHE.clear()
    tables = []
    for name in ("a", "b"):
        t = VectorTable.create(spark, str(tmp_path / name), dim=8)
        t.insert(spark.createDataFrame(
            [(i, [float(i % 7), float(i % 5), 1.0, 0.0] * 2) for i in range(64)],
            "id long, vector array<float>"))
        t.commit()
        tables.append(t)
    ta, tb = tables
    ta.compact(cluster_by=2)                      # miss (trains)
    assert ta.table_cache_stats_detail()["ivf_model"] == {
        "hits": 0, "misses": 1}
    # a recompaction sees a NEW committed version → new key → retrains
    # (a stale-layout reuse is impossible by construction); the lookup
    # still counts into this table's ledger
    ta.compact(cluster_by=2)
    assert ta.table_cache_stats_detail()["ivf_model"] == {
        "hits": 0, "misses": 2}
    # a second handle at the SAME version reuses the deterministic model
    from vecgo_spark.operators import ivf as ivfmod

    ivfmod.train_ivf(
        ta.df(), ta.vector_col, nlist=2, metric="l2", trainer="driver",
        order_col=ta.id_col,
        cache_key=f"{ta.path}@v{ta.manifest.version}:{ta.vector_col}",
        scope=ta.path)  # the exact key compact() would use at this version
    ivfmod.train_ivf(
        ta.df(), ta.vector_col, nlist=2, metric="l2", trainer="driver",
        order_col=ta.id_col,
        cache_key=f"{ta.path}@v{ta.manifest.version}:{ta.vector_col}",
        scope=ta.path)
    assert ta.table_cache_stats_detail()["ivf_model"]["hits"] == 1
    # table b trains its own model; a's ledger is untouched
    tb.compact(cluster_by=2)
    assert tb.table_cache_stats_detail()["ivf_model"]["misses"] == 1
    a_ivf = ta.table_cache_stats_detail()["ivf_model"]
    # quantize='pq' rides the same scoping through train_pq
    tb.compact(quantize="pq")
    assert tb.table_cache_stats_detail()["pq_codebooks"]["misses"] == 1
    assert "pq_codebooks" not in ta.table_cache_stats_detail()
    assert ta.table_cache_stats_detail()["ivf_model"] == a_ivf
    # free-standing training (string key, no scope) counts global-only
    df = spark.createDataFrame(
        [(i, [float(i % 3), 0.0, 1.0, 0.0] * 2) for i in range(32)],
        "id long, vector array<float>")
    train_ivf(df, nlist=2, cache_key="free", trainer="driver", order_col="id")
    assert "free" not in str(ta.table_cache_stats_detail())
    g = cache_stats.cache_stats_detail()["ivf_model"]
    assert g["misses"] >= 3  # a, b, and the free-standing corpus


def test_cache_stats_persist_across_sessions(spark, tmp_path):
    """r13 verdict #7: the per-table ledger survives the driver process
    — commit() snapshots it into manifest meta, and a reopened table
    warms from the snapshot, so table_cache_stats() reports LIFETIME
    ratios the way Stats() reports lifetime row counts. The warm is a
    no-op when the process already holds in-memory counters (no
    double-count), and further serving accumulates on top."""
    from vecgo_spark.plans import table as tmod

    tmod.release_vis_caches()
    path = str(tmp_path / "t")
    t = VectorTable.create(spark, path, dim=2)
    t.insert(_rows(spark, range(10)))
    t.commit()
    t.insert(_rows(spark, [1], tag="b"))  # upsert → churn
    t.commit()
    sub = [s for s in t.manifest.segments if s.lsn == 1]
    t.df(segments=sub).count()  # miss (builds the winning-LSN frame)
    t.df(segments=sub).count()  # hit
    assert t.table_cache_stats() == (1, 1)
    t.insert(_rows(spark, [20]))
    t.commit()  # persists the (1, 1) ledger into manifest meta
    assert t.manifest.meta["cache_stats"]["pk_index"] == [1, 1]
    # same-process reopen: warm is a no-op (counters already live)
    assert VectorTable.open(spark, path).table_cache_stats() == (1, 1)
    # "new process": counters gone, loaded frames gone
    cache_stats.reset()
    tmod.release_vis_caches()
    t2 = VectorTable.open(spark, path)
    assert t2.table_cache_stats() == (1, 1)  # lifetime view restored
    sub2 = [s for s in t2.manifest.segments if s.lsn == 1]
    t2.df(segments=sub2).count()  # miss on top of the warmed baseline
    assert t2.table_cache_stats() == (1, 2)
    assert t2.table_cache_stats_detail()["pk_index"] == {
        "hits": 1, "misses": 2}
    t2.insert(_rows(spark, [21]))
    t2.commit()
    assert t2.manifest.meta["cache_stats"]["pk_index"] == [1, 2]
    # a pinned (time-travel) open never warms — read-only history
    cache_stats.reset()
    VectorTable.open(spark, path, version=2)
    assert cache_stats.cache_stats(scope=path) == (0, 0)
