"""SemDeDup pair graph at rest (operators/semdedup_at_rest.py):
lifecycle (build → reopen → refresh → fold → vacuum → compact-drop /
compact-reindex), bit-parity of the stored read against fresh recompute
under tombstones / upserts / delta segments / hot-cluster transitions,
and the 100-TB plan guarantee that clean-snapshot reads never touch the
vector column."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import dedup
from vecgo_spark.operators import semdedup_at_rest as sdr
from vecgo_spark.operators.ivf import IVFModel
from vecgo_spark.plans.table import VectorTable

TH = 0.9


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _model():
    return IVFModel(
        centroids=np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]),
        metric="l2")


def _vec(i, flip=False):
    """Cluster = i % 2; same-cluster vectors are near-dups (cos ≈ 1,
    well above TH), cross-cluster cos ≈ 0 (well below). flip=True moves
    the row to the OTHER cluster — the upsert shape."""
    d = (i + (1 if flip else 0)) % 2
    v = [0.0, 0.0, 0.0, 0.0]
    v[d] = 1.0
    v[2] = 0.01 * (i // 2 + 1)  # distinct but high-cosine within cluster
    return v


def _rows(spark, ids, flip=False):
    return spark.createDataFrame(
        [(i, _vec(i, flip)) for i in ids], "id long, vector array<float>")


def _pairset(df):
    return sorted(map(tuple, df.collect()))


def _fresh_pairs(tbl, max_cluster=None):
    return dedup.semantic_dedup_pairs(
        tbl.df(), _model(), id_col="id", vector_col="vector",
        threshold=TH, max_cluster=max_cluster)


def _fresh_clusters(tbl, max_cluster=None):
    return dedup.semantic_dedup(
        tbl.df(), _model(), id_col="id", vector_col="vector",
        threshold=TH, max_cluster=max_cluster)


def test_build_and_parity(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 13)))
    tbl.commit()
    v0 = tbl.manifest.version
    assert tbl.build_semdedup_index(_model(), threshold=TH) == v0 + 1
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert got.columns == ["cluster_id", "id_a", "id_b", "cos_sim", "drop_id"]
    assert _pairset(got) == _pairset(_fresh_pairs(tbl))
    assert len(_pairset(got)) > 0  # the near-dups actually paired
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl))


def test_reopen_serves_stored(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    want = _pairset(sdr.semdedup_pairs_at_rest(tbl))
    re = VectorTable.open(spark, tdir)
    assert _pairset(sdr.semdedup_pairs_at_rest(re)) == want
    assert _pairset(re.semantic_dedup()) == _pairset(_fresh_clusters(re))


def test_delta_tombstone_upsert_parity(spark, tdir):
    """Rows inserted after the build dirty their cluster (recompute leg);
    deletes and upserts drop stale stored pairs through the (id, lsn)
    endpoint-visibility join — including the upsert that MOVES a row to
    the other cluster, where both the old pair set and the old
    assignment must vanish."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 11)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    tbl.insert(_rows(spark, range(11, 15)))          # delta segment
    tbl.insert(_rows(spark, [5], flip=True))          # upsert → other cluster
    tbl.commit()
    tbl.delete([2, 12])
    tbl.commit()
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl))
    got = sdr.semantic_dedup_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_clusters(tbl))
    ids = {r["id"] for r in got.collect()}
    assert 5 in ids and 11 in ids and not {2, 12} & ids


def test_refresh_indexes_only_new_segments(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    v = tbl.manifest.version
    assert tbl.refresh_semdedup_index() == v  # no-op, no manifest bump
    tbl.insert(_rows(spark, range(9, 13)))
    tbl.commit()
    v2 = tbl.refresh_semdedup_index()
    assert v2 > v
    info = tbl.manifest.meta["semdedup"]
    assert len(info["paths"]) == 2  # original dir + refresh dir, both live
    assert set(info["segments"]) == {s.path for s in tbl.manifest.segments}
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl))
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl))


def test_clean_read_never_touches_vectors(spark, tdir):
    """The 100-TB point of the artifact: with every live segment indexed
    and nothing dirty, both query plans read the narrow parquet artifact
    only — no per-cluster gemm (no applyInPandas / python worker) and no
    scan of the segments' vector column."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    for q in (sdr.semdedup_pairs_at_rest(tbl),):
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "vector#" not in plan
        assert "FlatMapGroupsInPandas" not in plan


def test_hot_cluster_transitions(spark, tdir):
    """Hot at build (raw count > max_cluster): no stored pairs, cluster
    recorded; hot now (visible count): dropped from the output exactly
    like dedup._drop_hot; hot-at-build-but-not-now (deletes shrank it):
    the recompute leg restores its pairs — parity with the plain path at
    every step."""
    mc = 5
    tbl = VectorTable.create(spark, tdir, dim=4)
    # cluster 0 gets 8 rows (hot at mc=5), cluster 1 gets 4
    ids = [2 * i for i in range(1, 9)] + [2 * i + 1 for i in range(1, 5)]
    tbl.insert(_rows(spark, ids))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH, max_cluster=mc)
    info = tbl.manifest.meta["semdedup"]
    assert info["hot_clusters"] == [0]
    # hot now too → both paths drop cluster 0's pairs
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_pairs(tbl, max_cluster=mc))
    assert not [r for r in got.collect() if r["cluster_id"] == 0]
    # deletes shrink cluster 0 below the cap → not hot now, recompute leg
    tbl.delete([2 * i for i in range(1, 5)])
    tbl.commit()
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_pairs(tbl, max_cluster=mc))
    assert [r for r in got.collect() if r["cluster_id"] == 0]
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl, max_cluster=mc))


def test_hot_cluster_repair_at_refresh(spark, tdir):
    """r13 verdict nit #1 — hot_clusters must not be a one-way ratchet:
    a cluster hot at build whose visible count later shrinks within the
    cap takes the read-time recompute leg only UNTIL the next refresh,
    which re-gemms exactly that cluster, stores its pairs, and delists
    it — the read is plan-pinned gemm-free again, bit-parity all the
    way."""
    mc = 5
    tbl = VectorTable.create(spark, tdir, dim=4)
    # cluster 0 gets 8 rows (hot at mc=5), cluster 1 gets 4
    ids = [2 * i for i in range(1, 9)] + [2 * i + 1 for i in range(1, 5)]
    tbl.insert(_rows(spark, ids))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH, max_cluster=mc)
    assert tbl.manifest.meta["semdedup"]["hot_clusters"] == [0]
    # deletes shrink cluster 0 below the cap → recompute leg (the
    # pre-repair world: gemm on every read)
    tbl.delete([2 * i for i in range(1, 5)])
    tbl.commit()
    pre = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(pre) == _pairset(_fresh_pairs(tbl, max_cluster=mc))
    plan = pre._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # delisted-hot recompute leg
    # the ingest-loop refresh repairs: new segment indexed AND cluster 0
    # re-gemm'd + delisted
    tbl.insert(_rows(spark, [101]))
    tbl.commit()
    tbl.refresh_semdedup_index()
    assert tbl.manifest.meta["semdedup"]["hot_clusters"] == []
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_pairs(tbl, max_cluster=mc))
    assert [r for r in got.collect() if r["cluster_id"] == 0]  # repaired
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan  # stored serving restored
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl, max_cluster=mc))
    # a still-oversized cluster stays listed: grow cluster 1 past the cap
    tbl.insert(_rows(spark, [2 * i + 1 for i in range(20, 26)]))
    tbl.commit()
    tbl.refresh_semdedup_index()
    assert tbl.manifest.meta["semdedup"]["hot_clusters"] == [1]
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl, max_cluster=mc))


def test_hot_cluster_repair_only_refresh(spark, tdir):
    """Repair fires even when nothing new needs indexing: refresh on a
    fully-indexed table with a repairable cluster publishes a
    repair-only version (empty assigned dir + repaired -pairs sidecar),
    delists the cluster, and restores gemm-free serving; with neither
    new segments nor repairs, refresh stays a no-op."""
    mc = 5
    tbl = VectorTable.create(spark, tdir, dim=4)
    ids = [2 * i for i in range(1, 9)] + [2 * i + 1 for i in range(1, 5)]
    tbl.insert(_rows(spark, ids))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH, max_cluster=mc)
    v = tbl.manifest.version
    assert tbl.refresh_semdedup_index() == v  # hot but NOT repairable
    tbl.delete([2 * i for i in range(1, 5)])
    tbl.commit()
    v2 = tbl.refresh_semdedup_index()  # repair-only publish
    assert v2 > tbl.manifest.version - 1 and tbl.manifest.version == v2
    info = tbl.manifest.meta["semdedup"]
    assert info["hot_clusters"] == []
    assert len(info["paths"]) == 2
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_pairs(tbl, max_cluster=mc))
    assert [r for r in got.collect() if r["cluster_id"] == 0]
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    # nothing left to repair → back to a pure no-op
    assert tbl.refresh_semdedup_index() == v2


def test_vacuum_keeps_live_dirs_drops_stale(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    tbl.insert(_rows(spark, range(9, 13)))
    tbl.commit()
    tbl.refresh_semdedup_index()
    want = _pairset(sdr.semdedup_pairs_at_rest(tbl))
    out = tbl.vacuum(keep_versions=1)
    assert not any("semdedup" in f for f in out["removed_files"])
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == want
    # reindex=False compaction drops the family; vacuum collects dirs
    tbl.compact(reindex=False)
    assert "semdedup" not in tbl.manifest.meta
    with pytest.raises(KeyError, match="semdedup"):
        sdr.semdedup_pairs_at_rest(tbl)
    out = tbl.vacuum(keep_versions=1)
    # two versions × (assigned dir + -pairs sidecar) = 4 dirs collected
    assert sum("semdedup" in f for f in out["removed_files"]) == 4


def test_refresh_folds_dirs_at_cap(spark, tdir):
    """Bounded dir growth under the ingest→refresh loop: with max_dirs=3
    repeated refreshes fold still-live assigned rows (and the pair rows
    verbatim) into the new dir; parity holds across every fold and
    vacuum collects the superseded dirs + sidecars."""
    import os

    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    seen = set(tbl.manifest.meta["semdedup"].get(
        "paths", [tbl.manifest.meta["semdedup"]["path"]]))
    for i in range(5):
        tbl.insert(_rows(spark, range(100 + 4 * i, 104 + 4 * i)))
        tbl.commit()
        tbl.refresh_semdedup_index(max_dirs=3)
        info = tbl.manifest.meta["semdedup"]
        assert len(info["paths"]) <= 3, info["paths"]
        seen.update(info["paths"])
        assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
            _fresh_pairs(tbl))
    assert len(seen) > 3  # folding actually happened
    info = tbl.manifest.meta["semdedup"]
    tbl.vacuum(keep_versions=1)
    live = set(info["paths"])
    for p in seen:
        for d in (p, sdr.pairs_dir(p)):
            assert os.path.isdir(os.path.join(tbl.path, d)) == (p in live), d
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl))


def test_build_requires_segments_and_refresh_requires_build(spark, tdir):
    tbl = VectorTable.create(spark, tdir, dim=4)
    with pytest.raises(ValueError, match="no committed segments"):
        tbl.build_semdedup_index(_model())
    tbl.insert(_rows(spark, [1]))
    tbl.commit()
    with pytest.raises(KeyError, match="build it first"):
        tbl.refresh_semdedup_index()


def test_upsert_both_versions_indexed(spark, tdir):
    """Both row versions of an upserted id live in INDEXED segments (the
    build ran after the upsert): the artifact stores assignment + pairs
    per RAW row version and the winning-LSN filter must keep exactly the
    new version's pairs — including the cluster move."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.insert(_rows(spark, [3], flip=True))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl))
    got = sdr.semantic_dedup_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_clusters(tbl))


def test_compact_reindexes_semdedup_by_default(spark, tdir):
    """compact() rebuilds the artifact against the rewritten segments
    with the recorded params (centroids ride the manifest meta) — no
    manual build call, stored reads stay bit-identical."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 13)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH, max_cluster=7)
    tbl.delete([4, 6])
    tbl.commit()
    tbl.compact()
    info = tbl.manifest.meta["semdedup"]
    assert set(info["segments"]) == {s.path for s in tbl.manifest.segments}
    assert (info["threshold"], info["max_cluster"]) == (TH, 7)
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl, max_cluster=7))
    ids = {r["id"] for r in sdr.semantic_dedup_at_rest(tbl).collect()}
    assert not {4, 6} & ids


def test_no_pairs_artifact_roundtrips(spark, tdir):
    """A corpus with zero above-threshold pairs writes an EMPTY pair
    sidecar — it must read back (build, refresh, and both queries) with
    every row its own singleton group."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.8, 0.0, 0.6, 0.0]),
         (3, [0.0, 1.0, 0.0, 0.0]), (4, [0.0, 0.8, 0.0, 0.6])],
        "id long, vector array<float>"))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=0.999)
    assert sdr.semdedup_pairs_at_rest(tbl).count() == 0
    got = sdr.semantic_dedup_at_rest(tbl).collect()
    assert len(got) == 4 and all(r["keep"] for r in got)
    tbl.insert(spark.createDataFrame(
        [(5, [0.6, 0.0, 0.0, 0.8])], "id long, vector array<float>"))
    tbl.commit()
    tbl.refresh_semdedup_index()
    assert sdr.semdedup_pairs_at_rest(tbl).count() == 0
    assert sdr.semantic_dedup_at_rest(tbl).count() == 5


def test_refresh_after_upsert_parity(spark, tdir):
    """Refresh indexes the upsert's segment: the new version's pairs are
    gemm'd against every live indexed row (never against its own older
    version — strict id ordering), the stale version's stored pairs drop
    out through (id, lsn) visibility, and the clean post-refresh read
    recomputes nothing."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 11)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    tbl.insert(_rows(spark, [4]))              # same-cluster rewrite
    tbl.insert(_rows(spark, [5], flip=True))   # cluster move
    tbl.commit()
    tbl.refresh_semdedup_index()
    assert set(tbl.manifest.meta["semdedup"]["segments"]) == {
        s.path for s in tbl.manifest.segments}
    got = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(got) == _pairset(_fresh_pairs(tbl))
    # fully indexed + clean → the read is stored-only (no gemm worker)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl))


def test_manifest_cluster_counts_cover_segments(spark, tdir):
    """Per-(segment, cluster) counts ride the manifest (the lexical
    seg_counts stance): build and refresh keep them covering exactly the
    indexed segments, so clean-snapshot reads derive hot/dirty clusters
    with zero jobs — and the counts agree with the artifact rows."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    info = tbl.manifest.meta["semdedup"]
    assert set(info["cluster_counts"]) == {s.path for s in tbl.manifest.segments}
    assert sum(sum(c.values()) for c in info["cluster_counts"].values()) == 8
    tbl.insert(_rows(spark, range(9, 13)))
    tbl.commit()
    tbl.refresh_semdedup_index()
    info = tbl.manifest.meta["semdedup"]
    assert set(info["cluster_counts"]) == {s.path for s in tbl.manifest.segments}
    assert sum(sum(c.values()) for c in info["cluster_counts"].values()) == 12
    # clean read (manifest-counter branch) still bit-matches recompute
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
        _fresh_pairs(tbl))


@pytest.mark.parametrize("seed", [7, 23])
def test_random_lifecycle_parity(spark, tdir, seed):
    """Randomized model check (the MVCC-model-check pattern applied to
    this family): a random interleaving of inserts, cluster-moving
    upserts, deletes, refreshes, vacuums and full compact-reindexes must
    keep BOTH stored reads bit-identical to fresh recompute at every
    committed state — including hot-cluster transitions (max_cluster is
    set low enough for the random mix to cross it both ways)."""
    import random

    rng = random.Random(seed)
    mc = 7
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 9)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH, max_cluster=mc)
    live = set(range(1, 9))
    next_id = 9
    ops = []
    for _ in range(9):
        op = rng.choice(["ins", "ups", "del", "refresh", "vacuum", "compact",
                         "pcompact"])
        ops.append(op)
        if op == "ins":
            ids = list(range(next_id, next_id + 3))
            next_id += 3
            tbl.insert(_rows(spark, ids))
            tbl.commit()
            live |= set(ids)
        elif op == "ups" and live:
            i = rng.choice(sorted(live))
            tbl.insert(_rows(spark, [i], flip=rng.random() < 0.5))
            tbl.commit()
        elif op == "del" and len(live) > 2:
            victims = rng.sample(sorted(live), 2)
            tbl.delete(victims)
            tbl.commit()
            live -= set(victims)
        elif op == "refresh":
            tbl.refresh_semdedup_index(max_dirs=3)
        elif op == "vacuum":
            tbl.vacuum(keep_versions=1)
        elif op == "compact":
            tbl.compact()  # reindex=True rebuilds from recorded params
        elif op == "pcompact":
            # partial compaction preserves (id, _lsn) — the refresh-time
            # pair dedupe (r13 self-found) is exactly what keeps the
            # next refresh from double-storing the tier rows' pairs
            from vecgo_spark.plans.policy import TieredPolicy

            tbl.maybe_compact(TieredPolicy(min_segments=2, max_merge=4))
        assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == _pairset(
            _fresh_pairs(tbl, max_cluster=mc)), (seed, ops)
        assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
            _fresh_clusters(tbl, max_cluster=mc)), (seed, ops)


def test_read_your_writes_pending_parity(spark, tdir):
    """r13 verdict #3 — the include_pending option its sibling families
    gained in r13, applied to semdedup: staged inserts (dirtying their
    clusters through the delta leg), a staged cluster-moving upsert, and
    a staged delete must make BOTH queries bit-identical to fresh
    recompute over df(include_pending=True), while the committed-view
    default stays untouched — and after commit the views converge."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    tbl.insert(_rows(spark, range(1, 11)))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    committed = _pairset(sdr.semdedup_pairs_at_rest(tbl))

    def _fresh_pending(fn):
        return fn(tbl.df(include_pending=True), _model(), id_col="id",
                  vector_col="vector", threshold=TH)

    # stage (NO commit): new near-dups, a cluster-moving upsert, a delete
    tbl.insert(_rows(spark, range(11, 15)))
    tbl.insert(_rows(spark, [5], flip=True))
    tbl.delete([2])
    got = sdr.semdedup_pairs_at_rest(tbl, include_pending=True)
    assert _pairset(got) == _pairset(_fresh_pending(dedup.semantic_dedup_pairs))
    gotc = sdr.semantic_dedup_at_rest(tbl, include_pending=True)
    assert _pairset(gotc) == _pairset(_fresh_pending(dedup.semantic_dedup))
    ids = {r["id"] for r in gotc.collect()}
    assert {11, 12} <= ids and 2 not in ids      # staged rows in, delete out
    # committed-view default unchanged by the staged batch
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == committed
    # table fronts expose the same flag
    assert _pairset(tbl.semantic_dedup_pairs(include_pending=True)) == \
        _pairset(got)
    assert _pairset(tbl.semantic_dedup(include_pending=True)) == _pairset(gotc)
    # post-commit: both views converge and stay bit-identical to fresh
    tbl.commit()
    want = _pairset(_fresh_pairs(tbl))
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == want
    assert _pairset(sdr.semdedup_pairs_at_rest(
        tbl, include_pending=True)) == want


def test_dup_id_batch_parity(spark, tdir):
    """r14 self-found: a batch carrying an id twice used to leave TWO
    same-LSN raw rows, and the artifact's winning-LSN equality join
    kept both — semantic_dedup_at_rest emitted 9 rows for an 8-id
    corpus and TRIPLED the pair list (33 vs 12 on the probe). The
    write-time collapse (one stored row per (id, lsn)) makes every
    path agree by construction — pinned here at the site the bug was
    found."""
    tbl = VectorTable.create(spark, tdir, dim=4)
    rows = [(i, _vec(i)) for i in range(1, 9)] + [(3, _vec(3))]  # 3 twice
    tbl.insert(spark.createDataFrame(rows, "id long, vector array<float>"))
    tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    got = sdr.semantic_dedup_at_rest(tbl)
    assert got.count() == 8  # not 9: one assigned row per id
    assert _pairset(got) == _pairset(_fresh_clusters(tbl))
    gp = sdr.semdedup_pairs_at_rest(tbl)
    assert _pairset(gp) == _pairset(_fresh_pairs(tbl))
    assert gp.count() == gp.distinct().count()  # no duplicated pair rows


def test_partial_compaction_parity_and_refresh_reindexes(spark, tdir):
    """maybe_compact replaces the picked segments with one tier segment:
    their stored assignment/pair rows drop out (dead _seg / dead row
    versions), the tier segment dirties its clusters (recompute leg)
    until the next refresh re-indexes it — parity with fresh recompute
    at every step (the minhash partial-compaction contract)."""
    from vecgo_spark.plans.policy import TieredPolicy

    tbl = VectorTable.create(spark, tdir, dim=4)
    for lo in (1, 7, 13):  # three small segments
        tbl.insert(_rows(spark, range(lo, lo + 6)))
        tbl.commit()
    tbl.build_semdedup_index(_model(), threshold=TH)
    before = _pairset(sdr.semdedup_pairs_at_rest(tbl))

    v = tbl.maybe_compact(TieredPolicy(min_segments=3, max_merge=3))
    assert v is not None  # a partial compaction actually ran
    info = tbl.manifest.meta["semdedup"]
    live = {s.path for s in tbl.manifest.segments}
    assert not set(info["segments"]) & live  # every indexed segment died
    # tier segment takes the recompute leg — parity
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == before
    assert _pairset(sdr.semantic_dedup_at_rest(tbl)) == _pairset(
        _fresh_clusters(tbl))
    # refresh re-indexes the tier segment; read returns to stored-only
    tbl.refresh_semdedup_index()
    info = tbl.manifest.meta["semdedup"]
    assert live <= set(info["segments"])
    assert _pairset(sdr.semdedup_pairs_at_rest(tbl)) == before
    plan = (sdr.semdedup_pairs_at_rest(tbl)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "FlatMapGroupsInPandas" not in plan  # no recompute leg left
