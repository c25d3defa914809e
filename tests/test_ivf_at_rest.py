"""IVF materialized into the table lifecycle: compact(cluster_by=...)
partitions the layout, the manifest records the index, search(nprobe=p)
prunes files, inserts stay index-fresh, vacuum keeps the live index.

Reference contract: internal/engine/compaction.go:102-152 builds IVF
partitions at segment build/compaction (k = rows/8192 at 136-143) and
persists them in the segment; probe-pruned search then touches only the
probed partitions.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import ivf
from vecgo_spark.plans.table import VectorTable

DIM = 8
N = 400


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ivf_table"))


@pytest.fixture(scope="module")
def table(spark, tdir):
    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(DIM).tolist()) for i in range(N)]
    t = VectorTable.create(spark, tdir, dim=DIM, metric="l2")
    t.insert(spark.createDataFrame(rows, "id long, vector array<double>"))
    t.commit()
    t.compact(cluster_by=4)
    return t


def _expected_probe_search(t, q, k, nprobe):
    """Brute-force twin: assign every live row, keep probed clusters,
    exact L2 top-(k) with (score, id) tiebreak."""
    model = t._load_ivf()
    probes = set(ivf.probe_clusters(model, q, nprobe))
    rows = [(r["id"], np.array(r["vector"])) for r in t.df().collect()]
    scored = []
    for rid, v in rows:
        cid = int(np.argmin(((model.centroids - v[None, :]) ** 2).sum(axis=1)))
        if cid in probes:
            scored.append((float(((v - np.array(q)) ** 2).sum()), rid))
    scored.sort()
    return [rid for _, rid in scored[:k]]


def test_index_recorded_and_segments_per_cluster(table):
    info = table.manifest.meta["ivf"]
    assert info["k"] == 4
    assert len(table.manifest.segments) == 4
    for seg in table.manifest.segments:
        cs = seg.stats["_cluster"]
        assert cs["min"] == cs["max"]  # one cluster per segment
    assert sum(s.rows for s in table.manifest.segments) == N


def test_probe_search_matches_bruteforce(table):
    q = [0.3] * DIM
    got = [r["id"] for r in table.search(q, k=10, nprobe=2).collect()]
    assert got == _expected_probe_search(table, q, 10, 2)


def test_probe_search_scans_fewer_files(table):
    q = [0.3] * DIM
    full_files = set(table.df().inputFiles())
    probed_files = set(table.search(q, k=10, nprobe=1).inputFiles())
    assert probed_files < full_files
    # nprobe=1 → exactly one cluster segment's files
    seg_files = {f for f in full_files if "_part=" in f}
    assert len({f.split("_part=")[1].split("/")[0] for f in probed_files}) == 1
    assert seg_files  # layout really is cluster-partitioned


def test_fullprobe_equals_exact(table):
    q = [-0.7] * DIM
    exact = [r["id"] for r in table.search(q, k=10).collect()]
    allprobe = [r["id"] for r in table.search(q, k=10, nprobe=4).collect()]
    assert allprobe == exact


def test_insert_after_index_stays_searchable(spark, tdir, table):
    model = table._load_ivf()
    # craft a row sitting exactly on centroid 0 → assigned cluster 0
    v = model.centroids[0].tolist()
    table.insert(spark.createDataFrame([(9000, v)], "id long, vector array<double>"))
    table.commit()
    got = [r["id"] for r in table.search(v, k=1, nprobe=1).collect()]
    assert got == [9000]
    # the staged segment carries _cluster stats for pruning
    seg = table.manifest.segments[-1]
    assert "_cluster" in seg.stats


def test_batch_search_at_rest_matches_fresh_assign(spark, table):
    """Batch ANN over the stored _cluster column must equal the
    assign-then-batch pipeline (the at-rest layout replaces the
    re-assignment pass, nothing else)."""
    queries = spark.createDataFrame(
        [(0, [0.3] * DIM), (1, [-0.7] * DIM)], "qid long, qvector array<double>"
    )
    got = sorted(
        (r["qid"], r["rank"], r["id"], r["score"])
        for r in table.batch_search(queries, k=5, nprobe=2).collect()
    )
    model = table._load_ivf()
    assigned = ivf.assign(table.df(), model, "vector")
    expect = sorted(
        (r["qid"], r["rank"], r["id"], r["score"])
        for r in ivf.batch_search(assigned, model, queries, k=5, nprobe=2,
                                  id_col="id", vector_col="vector").collect()
    )
    assert got == expect


def test_vacuum_keeps_live_index(table, tdir):
    import os

    table.vacuum(keep_versions=1)
    assert os.path.exists(os.path.join(tdir, table.manifest.meta["ivf"]["path"]))
    # index still functional after GC
    q = [0.0] * DIM
    assert table.search(q, k=3, nprobe=2).count() == 3


def test_plain_compact_drops_index(spark, tmp_path):
    rng = np.random.default_rng(5)
    t = VectorTable.create(spark, str(tmp_path / "t2"), dim=DIM, metric="l2")
    t.insert(spark.createDataFrame(
        [(i, rng.standard_normal(DIM).tolist()) for i in range(50)],
        "id long, vector array<double>"))
    t.commit()
    t.compact(cluster_by=2)
    assert "ivf" in t.manifest.meta
    t.compact()
    assert "ivf" not in t.manifest.meta
    with pytest.raises(ValueError):
        t.search([0.0] * DIM, k=3, nprobe=1)


def test_early_terminate_matches_full_probe_with_fewer_files(spark, tmp_path):
    """SegmentPriority early termination (stats.go:643-677): with four
    well-separated planted clusters and a query buried inside one,
    search_early_terminate(nprobe=4) must return BIT-IDENTICAL rows to
    search(nprobe=4) while skipping at least one probed segment (the
    far clusters' distance lower bound can't beat the in-cluster k-th
    distance)."""
    rng = np.random.default_rng(17)
    centers = np.zeros((4, DIM))
    for c in range(4):
        centers[c, c] = 50.0  # far-separated cluster anchors
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(0, 0.1, DIM)).tolist()))
    t = VectorTable.create(spark, str(tmp_path / "tet"), dim=DIM, metric="l2")
    t.insert(spark.createDataFrame(rows, "id long, vector array<double>"))
    t.commit()
    t.compact(cluster_by=4)
    q = centers[2].tolist()  # deep inside cluster 2
    (_, kept), skipped = t._early_terminate_segments(q, 5, 4)
    assert skipped >= 1, "far probed segments must be skipped"
    full = [(r["id"], r["score"]) for r in t.search(q, k=5, nprobe=4).collect()]
    fast = [(r["id"], r["score"])
            for r in t.search_early_terminate(q, k=5, nprobe=4).collect()]
    assert fast == full  # bit-identical, not merely same recall
    # under-filled nearest probe (k > cluster size) → no skipping, still exact
    (_, kept2), skipped2 = t._early_terminate_segments(q, 60, 4)
    assert skipped2 == 0 and len(kept2) == 4
    full60 = [(r["id"], r["score"]) for r in t.search(q, k=60, nprobe=4).collect()]
    fast60 = [(r["id"], r["score"])
              for r in t.search_early_terminate(q, k=60, nprobe=4).collect()]
    assert fast60 == full60
