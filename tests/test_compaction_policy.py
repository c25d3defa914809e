"""Policy-driven partial compaction (policy.go:25-230) + the MVCC
delete-then-reinsert visibility rule the LSN-aware tombstone join gives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vecgo_spark.plans.policy import CompactionTask, SizeTieredPolicy, TieredPolicy
from vecgo_spark.plans.table import VectorTable


def _insert_batch(spark, t, ids):
    t.insert(spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in ids], "id LONG, vector ARRAY<DOUBLE>"))
    t.commit()


def test_tiered_policy_triggers_at_threshold(spark, tmp_path):
    t = VectorTable.create(spark, str(tmp_path / "t"), dim=2, metric="l2")
    for b in range(3):
        _insert_batch(spark, t, range(b * 10, b * 10 + 10))
    assert t.maybe_compact(TieredPolicy(min_segments=4)) is None  # below threshold
    _insert_batch(spark, t, range(30, 40))
    v = t.maybe_compact(TieredPolicy(min_segments=4))
    assert v is not None
    assert len(t.manifest.segments) == 1  # 4 small segments merged
    assert t.count() == 40


def test_partial_compaction_preserves_visibility(spark, tmp_path):
    """Merge only 2 of 3 segments while deletes + upserts are in flight;
    the global read must be identical before and after."""
    t = VectorTable.create(spark, str(tmp_path / "t2"), dim=2, metric="l2")
    _insert_batch(spark, t, range(10))
    _insert_batch(spark, t, range(10, 20))
    t.delete([3, 13])
    # upsert id 5 (new vector, higher LSN, lands in segment 3)
    t.insert(spark.createDataFrame([(5, [99.0, 0.0])], "id LONG, vector ARRAY<DOUBLE>"))
    t.commit()
    before = sorted((r["id"], r["vector"][0]) for r in t.df().collect())

    class PickFirstTwo:
        def pick(self, segments):
            return CompactionTask(segments=sorted(segments, key=lambda s: s.lsn)[:2])

    v = t.maybe_compact(PickFirstTwo())
    assert v is not None
    assert len(t.manifest.segments) == 2  # merged + untouched third
    after = sorted((r["id"], r["vector"][0]) for r in t.df().collect())
    assert after == before
    ids = {i for i, _ in after}
    assert 3 not in ids and 13 not in ids
    assert dict(after)[5] == 99.0  # upsert survived partial compaction


def test_reinsert_after_delete_is_visible(spark, tmp_path):
    """MVCC rule: tombstone kills LSN <= T only; a later re-insert
    surfaces again (pk/mvcc.go:258 + engine re-insert path)."""
    t = VectorTable.create(spark, str(tmp_path / "t3"), dim=2, metric="l2")
    _insert_batch(spark, t, [1, 2, 3])
    t.delete([2])
    t.commit()
    assert sorted(r["id"] for r in t.df().collect()) == [1, 3]
    t.insert(spark.createDataFrame([(2, [7.0, 7.0])], "id LONG, vector ARRAY<DOUBLE>"))
    t.commit()
    rows = {r["id"]: r["vector"] for r in t.df().collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[2][0] == 7.0


def test_size_tiered_policy_buckets():
    def seg(path, size, lsn=1):
        from vecgo_spark.plans.manifest import SegmentMeta
        return SegmentMeta(path=path, rows=1, lsn=lsn, bytes=size)

    pol = SizeTieredPolicy(min_tier=3, base_bytes=1024)
    small = [seg(f"s{i}", 500, i) for i in range(3)]
    big = [seg("b0", 1 << 30)]
    task = pol.pick(small + big)
    assert task is not None
    assert {s.path for s in task.segments} == {"s0", "s1", "s2"}
    assert pol.pick(small[:2] + big) is None  # tier below min_tier


def test_partial_compaction_gcs_fully_applied_tombstones(spark, tmp_path):
    """A tombstone whose every surviving segment either post-dates it or
    was merged after it was applied must be GC'd from the manifest by
    maybe_compact (the reference's consolidation drops tombstones); a
    tombstone newer than a surviving segment must stay, and reads must be
    identical either way."""
    t = VectorTable.create(spark, str(tmp_path / "tgc"), dim=2, metric="l2")
    _insert_batch(spark, t, range(10))        # seg lsn 1
    _insert_batch(spark, t, range(10, 20))    # seg lsn 2
    t.delete([3, 13])                         # tombstone lsn 3
    t.commit()
    assert len(t.manifest.tombstone_files) == 1

    class PickAll:
        def pick(self, segments):
            return CompactionTask(segments=list(segments))

    t.maybe_compact(PickAll())
    # every segment was merged with the tombstone applied → dropped
    assert t.manifest.tombstone_files == []
    assert t.manifest.tombstone_stats == {}
    assert sorted(r["id"] for r in t.df().collect()) == [i for i in range(20)
                                                         if i not in (3, 13)]
    assert t.count() == 18
    # a tombstone NEWER than the merged segment must survive the next merge
    _insert_batch(spark, t, range(20, 30))
    t.delete([0, 21])
    t.commit()
    t.maybe_compact(PickAll())
    # the new merge applied it → second pass may drop it again
    assert t.manifest.tombstone_files == []
    assert sorted(r["id"] for r in t.df().collect()) == sorted(
        i for i in range(30) if i not in (0, 3, 13, 21))


def test_tombstone_kept_when_partial_merge_misses_a_segment(spark, tmp_path):
    """If an original segment older than the tombstone survives the merge
    untouched, the tombstone must be KEPT (it still hides rows there)."""
    t = VectorTable.create(spark, str(tmp_path / "tkeep"), dim=2, metric="l2")
    _insert_batch(spark, t, range(10))        # seg lsn 1  (has id 3)
    _insert_batch(spark, t, range(10, 20))    # seg lsn 2
    _insert_batch(spark, t, range(20, 30))    # seg lsn 3
    t.delete([3, 13])                         # tombstone lsn 4
    t.commit()

    class PickNewestTwo:
        def pick(self, segments):
            return CompactionTask(segments=sorted(segments, key=lambda s: s.lsn)[-2:])

    t.maybe_compact(PickNewestTwo())
    assert len(t.manifest.tombstone_files) == 1   # seg lsn 1 still needs it
    ids = sorted(r["id"] for r in t.df().collect())
    assert 3 not in ids and 13 not in ids and len(ids) == 28


def test_tombstone_gc_by_id_interval_disjointness(spark, tmp_path):
    """A tombstone whose id interval provably misses every surviving
    segment must be GC'd even when an OLDER segment survives the merge —
    manifest id stats prove it hides nothing there (r9: interval
    disjointness strengthens the LSN-only droppable test)."""
    t = VectorTable.create(spark, str(tmp_path / "tint"), dim=2, metric="l2")
    _insert_batch(spark, t, range(10))        # seg lsn 1, ids 0..9
    _insert_batch(spark, t, range(15, 20))    # seg lsn 2, ids 15..19
    t.delete([16, 17])                        # tombstone lsn 3 ⊂ seg 2
    t.commit()

    class PickNewest:
        def pick(self, segments):
            return CompactionTask(segments=[max(segments, key=lambda s: s.lsn)])

    t.maybe_compact(PickNewest())
    # seg 1 (lsn 1 < tomb lsn) survives, but its id interval [0,9] is
    # disjoint from the tombstone's [16,17] → droppable
    assert t.manifest.tombstone_files == []
    assert sorted(r["id"] for r in t.df().collect()) == sorted(
        list(range(10)) + [15, 18, 19])


def test_partial_compaction_folds_many_tombstones(spark, tmp_path):
    """Past TOMB_FOLD_MAX_FILES surviving tombstone files, maybe_compact
    folds them into ONE per-id max-LSN file (tombstone migration,
    engine.go:1890-1907): visibility bit-identical, re-insert-after-
    delete still wins by LSN, manifest stats mark the fold mixed so the
    zero-job count declines it."""
    from vecgo_spark.plans import table as tbl_mod

    t = VectorTable.create(spark, str(tmp_path / "tfold"), dim=2, metric="l2")
    _insert_batch(spark, t, range(40))            # seg lsn 1, ids 0..39
    for i in range(10):                           # 10 tombstone files
        t.delete([2 * i])                         # even ids 0,2,..,18
        t.commit()
    # re-insert id 4 AFTER its delete → visible again (max-LSN rule)
    _insert_batch(spark, t, [4])
    t.delete([4])                                 # ...then delete again
    t.commit()
    t.delete([4])                                 # idempotent re-delete
    t.commit()
    _insert_batch(spark, t, [4])                  # final re-insert → live
    before = sorted(r["id"] for r in t.df().collect())
    assert 4 in before and 2 not in before
    n_tombs = len(t.manifest.tombstone_files)
    assert n_tombs > tbl_mod.TOMB_FOLD_MAX_FILES

    class PickNewest:
        def pick(self, segments):
            return CompactionTask(segments=[max(segments, key=lambda s: s.lsn)])

    t.maybe_compact(PickNewest())
    assert len(t.manifest.tombstone_files) == 1
    rel = t.manifest.tombstone_files[0]
    st = t.manifest.tombstone_stats[rel]
    assert st["mixed"] is True and st["lsn"] >= 1
    assert t._manifest_count(t.manifest) is None  # declines mixed stats
    after = sorted(r["id"] for r in t.df().collect())
    assert after == before
    assert t.count() == len(before)               # scan fallback is right
    # reopening serves the folded file identically
    re = VectorTable.open(spark, t.path)
    assert sorted(r["id"] for r in re.df().collect()) == before


def test_leveled_policy_mirrors_reference_behavior():
    """LeveledPolicy unit semantics, mirroring the reference's own test
    (/root/reference/internal/engine/leveled_policy_test.go): L0 fan-in
    at the threshold (all of L0 → target level 1, oldest first), per-
    level size budgets Target(L_i)=base·ratio^(i-1) promoting the OLDEST
    over-budget level's victim one level up, level clamping at
    max_levels, and the top level never promoting."""
    from vecgo_spark.plans.manifest import SegmentMeta
    from vecgo_spark.plans.policy import LeveledPolicy

    def seg(path, size, lsn=1, level=0):
        return SegmentMeta(path=path, rows=1, lsn=lsn, bytes=size,
                           level=level)

    mb = 1024 * 1024
    pol = LeveledPolicy(l0_threshold=2)  # low threshold, as the ref test
    # 1. no compaction needed
    assert pol.pick([seg("a", 100)]) is None
    # 2. L0 triggered: ALL of L0, oldest (lowest lsn) first, target L1
    task = pol.pick([seg("s2", 100, lsn=2), seg("s1", 100, lsn=1)])
    assert task is not None and task.target_level == 1
    assert [s.path for s in task.segments] == ["s1", "s2"]
    # 3. L1 over budget (150MB > 100MB base) → its oldest victim to L2
    task = pol.pick([seg("l1", 150 * mb, lsn=3, level=1)])
    assert task is not None and task.target_level == 2
    assert [s.path for s in task.segments] == ["l1"]
    # 4. L2 over budget (1.2GB > 1000MB) → to L3
    task = pol.pick([seg("l2", 1200 * mb, lsn=4, level=2)])
    assert task is not None and task.target_level == 3
    # under-budget levels never trigger
    assert pol.pick([seg("ok", 50 * mb, level=1),
                     seg("ok2", 900 * mb, level=2)]) is None
    # level >= max_levels clamps to the top level, which never promotes
    assert pol.pick([seg("huge", 1 << 62, level=99)]) is None
    # victim selection is oldest-first within the over-budget level
    task = pol.pick([seg("new", 80 * mb, lsn=9, level=1),
                     seg("old", 80 * mb, lsn=2, level=1)])
    assert task is not None and [s.path for s in task.segments] == ["old"]
    assert task.target_level == 2


def test_leveled_policy_end_to_end_promotes_levels(spark, tmp_path):
    """Leveled compaction through maybe_compact: four L0 commits merge
    into one L1 segment (level stamped in the manifest and surviving a
    reopen); visibility identical before/after; an L1 over its budget
    promotes to L2 on the next pick."""
    from vecgo_spark.plans.policy import LeveledPolicy

    t = VectorTable.create(spark, str(tmp_path / "lv"), dim=2, metric="l2")
    for b in range(4):
        _insert_batch(spark, t, range(b * 10, b * 10 + 10))
    t.delete([3])
    t.commit()
    before = sorted(r["id"] for r in t.df().collect())
    pol = LeveledPolicy(l0_threshold=4, base_bytes=1)  # tiny budget: any
    v = t.maybe_compact(pol)                           # L1 is over budget
    assert v is not None
    assert [s.level for s in t.manifest.segments] == [1]
    assert sorted(r["id"] for r in t.df().collect()) == before
    t2 = VectorTable.open(spark, str(tmp_path / "lv"))
    assert [s.level for s in t2.manifest.segments] == [1]  # persisted
    # next pick: the single L1 segment exceeds base_bytes=1 → promote
    v2 = t.maybe_compact(pol)
    assert v2 is not None and v2 > v
    assert [s.level for s in t.manifest.segments] == [2]
    assert sorted(r["id"] for r in t.df().collect()) == before
    # below both thresholds → policy passes
    assert t.maybe_compact(LeveledPolicy()) is None


def test_leveled_policy_converges_and_respects_invariants():
    """Property (hypothesis): for ANY segment population, the leveled
    compaction loop — pick, merge the picked set into one segment at
    target_level, repeat — terminates (no infinite background-loop
    churn, the reference's loop calls Pick until nil), and every task
    satisfies the level invariants: picked segments are a non-empty
    subset of the live set, the target is one level up (or the L0
    fan-in to L1), and the top level never promotes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vecgo_spark.plans.manifest import SegmentMeta
    from vecgo_spark.plans.policy import LeveledPolicy

    seg_st = st.tuples(
        st.integers(min_value=0, max_value=1 << 40),  # bytes
        st.integers(min_value=0, max_value=9),        # level (incl. >max)
        st.integers(min_value=1, max_value=1000),     # lsn
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(seg_st, min_size=0, max_size=24))
    def run(raw):
        pol = LeveledPolicy(l0_threshold=3, level_ratio=4,
                            base_bytes=1024, max_levels=5)
        segs = [SegmentMeta(path=f"s{i}", rows=1, lsn=lsn, bytes=b, level=lv)
                for i, (b, lv, lsn) in enumerate(raw)]
        for step in range(len(segs) * pol.max_levels + 5):
            task = pol.pick(segs)
            if task is None:
                return
            assert 1 <= task.target_level < pol.max_levels
            picked = {s.path for s in task.segments}
            live = {s.path for s in segs}
            assert picked and picked <= live
            by_path = {s.path: s for s in segs}
            lvls = {min(by_path[p].level, pol.max_levels - 1) for p in picked}
            if task.target_level == 1:
                assert lvls == {0} and len(picked) >= pol.l0_threshold
            else:
                assert lvls == {task.target_level - 1} and len(picked) == 1
            merged = SegmentMeta(
                path=f"m{step}", rows=1,
                lsn=max(s.lsn for s in task.segments),
                bytes=sum(s.bytes for s in task.segments),
                level=task.target_level)
            segs = [s for s in segs if s.path not in picked] + [merged]
        raise AssertionError("leveled compaction loop did not converge")

    run()
