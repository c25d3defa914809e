"""Per-segment Vamana / DiskANN-flavored at-rest index
(operators/vamana.py): recall floors vs brute force, degree invariant,
blob roundtrip, delta-leg + tombstone visibility, compact/vacuum artifact
lifecycle. Reference semantics: internal/segment/diskann/writer.go
(medoid entry, random init, two-pass robustPrune α=1.0→1.2, back-edges)."""

import numpy as np
import pytest

from vecgo_spark.operators import vamana


def test_build_recall_degree_and_roundtrip():
    rng = np.random.default_rng(3)
    n = 1200
    X = rng.normal(size=(n, 16))
    g = vamana.VamanaGraph(X, r=24, l=48, alpha=1.2, seed=0)
    g.build()
    assert max(len(x) for x in g.links) <= 24          # ≤R after final sweep
    hits = 0
    Q = rng.normal(size=(25, 16))
    for q in Q:
        bf = np.argsort(((X - q) ** 2).sum(1))[:10]
        got = [m for _, m in g.search(q, 10)]
        hits += len(set(bf) & set(got))
    assert hits / 250 >= 0.9
    blob = vamana.graph_blob(g, list(range(n)))
    g2, ids, pq = vamana.graph_from_blob(blob)
    assert pq is None
    assert ids == list(range(n))
    q = rng.normal(size=16)
    assert g.search(q, 10) == g2.search(q, 10)         # loader is faithful
    # a blob from a future format version is rejected, not mis-read
    import unittest.mock as mock

    with mock.patch.object(vamana, "_GRAPH_FORMAT", 99):
        future = vamana.graph_blob(g, list(range(n)))
    with pytest.raises(ValueError, match="format"):
        vamana.graph_from_blob(future)


def test_pq_blob_roundtrip_and_adc_recall():
    """PQ-coded blobs: codes+codebooks instead of vectors (the DiskANN
    compressed layout) — the blob shrinks by ~d·8/m, the ADC beam finds a
    candidate pool whose 2k oversample contains the true top-k, and the
    loader hands back the codebooks for table construction."""
    from vecgo_spark.quantization.pq import PQCodebooks, adc_table, train_pq_np

    rng = np.random.default_rng(4)
    n = 1200
    X = rng.normal(size=(n, 16))
    g = vamana.VamanaGraph(X, r=24, l=48, alpha=1.2, seed=0)
    g.build()
    books = train_pq_np(X, m=8, k=32, iters=8, seed=0)
    full = vamana.graph_blob(g, list(range(n)))
    small = vamana.graph_blob(g, list(range(n)), pq=books)
    # the vector payload shrinks d·8/m ×; links now dominate the blob,
    # so the whole-blob ratio is ~2× at this (n, d, R)
    assert len(small) < len(full) / 2
    g2, ids, pq2 = vamana.graph_from_blob(small)
    assert pq2 is not None and g2.codes is not None and g2.codes.shape == (n, 8)
    hits = 0
    Q = rng.normal(size=(25, 16))
    for q in Q:
        bf = set(np.argsort(((X - q) ** 2).sum(1))[:10])
        table = np.asarray(adc_table(pq2, list(q)))
        got = {node for _, node in g2.search_adc(table, 40, l=128)}
        hits += len(bf & got)
    assert hits / 250 >= 0.9                   # 4k ADC pool covers true top-k


def test_medoid_entry_is_closest_to_centroid():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 8))
    g = vamana.VamanaGraph(X)
    c = X.mean(axis=0)
    assert g.entry == int(np.argmin(((X - c) ** 2).sum(1)))


@pytest.fixture()
def table(spark, tmp_path):
    from vecgo_spark.plans.table import VectorTable

    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(400)]
    t = VectorTable.create(spark, str(tmp_path / "tvam"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(rows, "id long, vector array<double>"))
    t.commit()
    return t


def test_at_rest_build_search_delta_and_deletes(spark, table):
    v = vamana.build_at_rest(table, r=24, l=48)
    assert table.manifest.version == v
    q = [0.2] * 8
    exact = [r["id"] for r in table.search(q, k=10).collect()]
    got = [r["id"] for r in
           vamana.search_at_rest(table, q, k=10, l_search=96).collect()]
    assert len(set(exact) & set(got)) >= 9             # recall floor
    probe = [5.0] * 8
    table.insert(spark.createDataFrame(
        [(9000, probe)], "id long, vector array<double>"))
    table.commit()
    got = [r["id"] for r in vamana.search_at_rest(table, probe, k=3).collect()]
    assert got[0] == 9000                              # exact delta leg
    table.delete([9000])
    table.commit()
    got = [r["id"] for r in vamana.search_at_rest(table, probe, k=3).collect()]
    assert 9000 not in got                             # rerank visibility


def test_compact_drops_index_and_vacuum_collects_blobs(spark, table):
    import os

    vamana.build_at_rest(table)
    rel = table.manifest.meta["vamana"]["path"]
    table.compact(reindex=False)
    assert "vamana" not in table.manifest.meta
    with pytest.raises(KeyError):
        vamana.search_at_rest(table, [0.0] * 8, k=5)
    table.vacuum(keep_versions=1)
    assert not os.path.isdir(os.path.join(table.path, rel))
    vamana.build_at_rest(table)
    table.vacuum(keep_versions=1)
    assert os.path.isdir(os.path.join(table.path, table.manifest.meta["vamana"]["path"]))
    assert vamana.search_at_rest(table, [0.0] * 8, k=5).count() == 5


def test_at_rest_rejects_non_l2_metric(spark, tmp_path):
    from vecgo_spark.plans.table import VectorTable

    t = VectorTable.create(spark, str(tmp_path / "tdot"), dim=4, metric="dot")
    t.insert(spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])],
                                   "id long, vector array<double>"))
    t.commit()
    with pytest.raises(ValueError, match="metric"):
        vamana.build_at_rest(t)


def test_robust_prune_invariants_hypothesis():
    """robustPrune invariants over random candidate sets: output ⊆
    candidates∪neighbors minus self, ≤ R, the closest candidate is always
    kept first, and every kept c satisfies the α-diversity rule against
    the previously-kept set (writer.go:571-625 — no keepPruned refill)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import numpy as np

    @given(st.integers(0, 2**32 - 1), st.integers(2, 40), st.integers(2, 12))
    @settings(max_examples=60, deadline=None,
              suppress_health_check=list(HealthCheck))
    def run(seed, n_cand, r):
        rng = np.random.default_rng(seed)
        n = n_cand + 5
        X = rng.normal(size=(n, 6))
        g = vamana.VamanaGraph(X, r=r, l=16, alpha=1.2, seed=0)
        node = 0
        cand = set(int(x) for x in rng.choice(
            np.arange(1, n), size=min(n_cand, n - 1), replace=False))
        kept = g._robust_prune(node, cand, 1.2, lambda idx: g._dists_from(node, idx))
        assert len(kept) <= r
        assert set(kept) <= cand
        assert node not in kept
        dn = {c: float(g._dists_from(node, [c])[0]) for c in cand}
        assert kept[0] == min(cand, key=lambda c: (dn[c], c)) or \
            dn[kept[0]] == min(dn.values())
        for i, c in enumerate(kept):
            for s in kept[:i]:
                dcs = float(np.sum((X[c] - X[s]) ** 2))
                assert 1.2 * dcs >= dn[c] - 1e-9
    run()


def test_batch_search_at_rest_matches_single(spark, table):
    """Batch at-rest probing (one blob load per segment for the whole
    query batch) must agree with per-query search_at_rest, and the rerank
    must keep enforcing delta/tombstone visibility."""
    import numpy as np
    from pyspark.sql import functions as F

    vamana.build_at_rest(table, r=24, l=48)
    qs = spark.createDataFrame(
        [(0, [0.2] * 8), (1, [5.0] * 8)], "qid long, qvector array<double>")
    batch = vamana.batch_search_at_rest(table, qs, k=5, l_search=96)
    got = {(r["qid"], r["rank"]): r["id"] for r in batch.collect()}
    for qid, qv in ((0, [0.2] * 8), (1, [5.0] * 8)):
        single = [r["id"] for r in
                  vamana.search_at_rest(table, qv, k=5, l_search=96).collect()]
        assert [got[(qid, rk)] for rk in range(1, 6)] == single
    # a post-build insert must win via the delta leg in batch mode too
    table.insert(spark.createDataFrame(
        [(9000, [5.0] * 8)], "id long, vector array<double>"))
    table.commit()
    batch2 = vamana.batch_search_at_rest(table, qs, k=3, l_search=96)
    top1 = {r["qid"]: r["id"] for r in batch2.where(F.col("rank") == 1).collect()}
    assert top1[1] == 9000


def test_filtered_at_rest_selectivity_strategies(spark, tmp_path):
    """Filtered at-rest search: a selective predicate takes the exact
    brute-force path (results == exact filtered top-k, recall 1.0); a
    broad predicate takes oversampled probe + post-filter (every result
    satisfies the predicate, high overlap with exact)."""
    import numpy as np
    from pyspark.sql import functions as F

    from vecgo_spark.filters import FilterSet
    from vecgo_spark.operators import knn
    from vecgo_spark.plans.table import VectorTable

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(8).tolist(),
             "rare" if i % 40 == 0 else "common") for i in range(400)]
    t = VectorTable.create(spark, str(tmp_path / "tfil"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(rows, "id long, vector array<double>, category string"))
    t.commit()
    vamana.build_at_rest(t, r=24, l=48)
    q = [0.1] * 8

    def exact(fs):
        return [r["id"] for r in knn.search(
            t.df(fs), q, k=5, metric="l2", id_col="id", vector_col="vector"
        ).collect()]

    rare = FilterSet().eq("category", "rare")       # 2.5% → brute-force path
    got = [r["id"] for r in vamana.search_at_rest(t, q, k=5, filter=rare).collect()]
    assert got == exact(rare)
    common = FilterSet().eq("category", "common")   # 97.5% → post-filter path
    got_c = [r["id"] for r in
             vamana.search_at_rest(t, q, k=5, l_search=96, filter=common).collect()]
    assert all(i % 40 != 0 for i in got_c)          # predicate enforced
    assert len(set(got_c) & set(exact(common))) >= 4


def test_pq_at_rest_end_to_end(spark, tmp_path):
    """PQ-coded at-rest serving: build with codebooks, probe via ADC,
    exact rerank recovers the true top-k (recall floor); delta leg and
    tombstone visibility unchanged."""
    import numpy as np
    from pyspark.sql import functions as F

    from vecgo_spark.plans.table import VectorTable
    from vecgo_spark.quantization.pq import train_pq_np

    rng = np.random.default_rng(6)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(400)]
    t = VectorTable.create(spark, str(tmp_path / "tpq"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(rows, "id long, vector array<double>"))
    t.commit()
    X = np.array([r[1] for r in rows])
    books = train_pq_np(X, m=4, k=32, iters=8, seed=0)
    vamana.build_at_rest(t, r=24, l=48, pq=books)
    assert t.manifest.meta["vamana"]["pq"] is True
    q = [0.2] * 8
    exact = [r["id"] for r in t.search(q, k=10).collect()]
    got = [r["id"] for r in
           vamana.search_at_rest(t, q, k=10, l_search=96).collect()]
    assert len(set(exact) & set(got)) >= 8     # ADC pool + exact rerank
    probe = [5.0] * 8
    t.insert(spark.createDataFrame([(9000, probe)], "id long, vector array<double>"))
    t.commit()
    got = [r["id"] for r in vamana.search_at_rest(t, probe, k=3).collect()]
    assert got[0] == 9000
    t.delete([9000])
    t.commit()
    got = [r["id"] for r in vamana.search_at_rest(t, probe, k=3).collect()]
    assert 9000 not in got
    # the batch probe shares _probe_one → ADC path must agree with single
    qs = spark.createDataFrame([(0, q), (1, probe)], "qid long, qvector array<double>")
    batch = vamana.batch_search_at_rest(t, qs, k=5, l_search=96)
    bm = {(r["qid"], r["rank"]): r["id"] for r in batch.collect()}
    single0 = [r["id"] for r in vamana.search_at_rest(t, q, k=5, l_search=96).collect()]
    assert [bm[(0, rk)] for rk in range(1, 6)] == single0
    assert 9000 not in {v for (qid, _), v in bm.items() if qid == 1}


def test_vectortable_graph_index_fronts(spark, table):
    """VectorTable.build_graph_index / graph_search route to the right
    family and default to whichever index the manifest carries."""
    with pytest.raises(KeyError, match="no graph index"):
        table.graph_search([0.2] * 8, k=3)
    v = table.build_graph_index("vamana", r=24, l=48)
    assert table.manifest.version == v
    got = [r["id"] for r in table.graph_search([0.2] * 8, k=5, l_search=96).collect()]
    direct = [r["id"] for r in
              vamana.search_at_rest(table, [0.2] * 8, k=5, l_search=96).collect()]
    assert got == direct
    with pytest.raises(ValueError, match="unknown graph index"):
        table.build_graph_index("diskann2000")


def test_pq_restored_graph_rejects_full_vector_search():
    """ADVICE r5: graph_from_blob restores PQ blobs with a zeros
    placeholder matrix — the public search()/_beam full-vector path must
    fail loudly instead of silently returning placeholder distances."""
    from vecgo_spark.quantization.pq import train_pq_np

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 8))
    g = vamana.VamanaGraph(X, r=12, l=24, alpha=1.2, seed=0)
    g.build()
    books = train_pq_np(X, m=4, k=16, iters=4, seed=0)
    blob = vamana.graph_blob(g, list(range(200)), pq=books)
    g2, _, _ = vamana.graph_from_blob(blob)
    with pytest.raises(RuntimeError, match="PQ blob"):
        g2.search(X[0], 5)


def test_adaptive_block_honors_entry_budget():
    """ADVICE r5: the build-gemm block size must keep block × n near the
    entry budget at ANY graph size — a fixed 64-row floor would allocate
    512 MB per task at n=1M."""
    from vecgo_spark.operators.graph_at_rest import adaptive_block

    assert adaptive_block(100) == 1024          # capped for tiny graphs
    assert adaptive_block(8_000_000) == 1       # floor is 1, not 64
    for n in (10_000, 100_000, 1_000_000, 50_000_000):
        b = adaptive_block(n)
        assert 1 <= b <= 1024
        assert b * n <= 8_000_000 or b == 1     # budget holds once b > 1


def test_refresh_at_rest_pq_layout_guard_and_parity(spark, tmp_path):
    """Vamana refresh: stored r/l/alpha are reused; the PQ layout guard
    rejects a mismatched refresh (mixed codebooks would silently score
    two different quantizers); a matching refresh serves the new segment
    from its blob."""
    import numpy as np

    from vecgo_spark.plans.table import VectorTable

    rng = np.random.default_rng(33)
    t = VectorTable.create(spark, str(tmp_path / "tvref"), dim=8, metric="l2")
    t.insert(spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(200)],
        "id long, vector array<double>"))
    t.commit()
    t.build_graph_index("vamana", r=16, l=32)
    probe = [5.0] * 8
    t.insert(spark.createDataFrame([(9100, probe)], "id long, vector array<double>"))
    t.commit()
    with pytest.raises(ValueError, match="stored layout"):
        from vecgo_spark.quantization import pq as pqz
        books = pqz.train_pq(t.df(), "vector", m=4, k=16, iters=2,
                             max_train_rows=100, order_col="id")
        vamana.refresh_at_rest(t, pq=books)
    v = t.refresh_graph_index("vamana")
    info = t.manifest.meta["vamana"]
    assert t.manifest.version == v and len(info["paths"]) == 2
    got = [r["id"] for r in vamana.search_at_rest(t, probe, k=3).collect()]
    assert got[0] == 9100


def test_compact_reindexes_graph_by_default(spark, table):
    """Default compact() rebuilds the vamana family (recorded r/l/alpha)
    over the rewritten segments; served results are unchanged."""
    vamana.build_at_rest(table, r=16, l=32, alpha=1.1)
    want = [r["id"] for r in vamana.search_at_rest(table, [0.0] * 8, k=5).collect()]
    table.compact()
    info = table.manifest.meta["vamana"]
    assert set(info["segments"]) == {s.path for s in table.manifest.segments}
    assert (info["r"], info["l"], info["alpha"]) == (16, 32, 1.1)
    got = [r["id"] for r in vamana.search_at_rest(table, [0.0] * 8, k=5).collect()]
    assert got == want
