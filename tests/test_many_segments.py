"""Many-segment scale pin (r9 verdict #5): a table with 600 small
segments — the shape a 100 TB table reaches under micro-batch ingest
before compaction — must keep every manifest-path operation O(#segments)
and every plan O(1) in segment count:

  * open / count / prune run in bounded time with ZERO data jobs
  * spark.read.parquet(*600 dirs) file-listing doesn't degrade
  * the visibility join is unaffected by segment count (size-gated
    broadcast from manifest stats alone)
  * seg_tag_expr stays ONE regexp (plan size flat vs a 50-segment table)

Segments are written driver-side with pyarrow (the write path's
segment-per-commit behavior is pinned elsewhere; 600 real insert+commit
cycles would spend the suite's whole budget on Spark job overhead) and
registered through the real Manifest/SegmentMeta structures, so every
READ path under test is the production one. Measured numbers are
documented in COVERAGE.md."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vecgo_spark.filters import FilterSet
from vecgo_spark.plans.manifest import Manifest, SegmentMeta, save_manifest
from vecgo_spark.plans.pruning import prune_segments
from vecgo_spark.plans.table import PK_DIR, SEG_DIR, TOMB_DIR, VectorTable

N_SEGS = 600
ROWS_PER_SEG = 20


def _build_many_segment_table(spark, path, n_segs=N_SEGS, with_pk=False):
    tbl = VectorTable.create(spark, path, dim=None)
    man0 = tbl.manifest
    segs = []
    for i in range(n_segs):
        rel = os.path.join(SEG_DIR, f"seg-00000001-stress{i:05d}")
        d = os.path.join(path, rel)
        os.makedirs(d)
        lo = i * ROWS_PER_SEG
        ids = list(range(lo, lo + ROWS_PER_SEG))
        t = pa.table({
            "id": pa.array(ids, pa.int64()),
            "text": pa.array([f"alpha beta tok{j % 5}" for j in ids]),
            "_lsn": pa.array([1] * ROWS_PER_SEG, pa.int64()),
        })
        f = os.path.join(d, "part-00000.parquet")
        pq.write_table(t, f)
        pk_rel = None
        if with_pk:
            # driver-written sidecar, same (id, _lsn) shape the write
            # path persists — keeps the fixture fast while every READ
            # path under test stays the production one
            pk_rel = os.path.join(PK_DIR, f"pk-seg-00000001-stress{i:05d}")
            pd = os.path.join(path, pk_rel)
            os.makedirs(pd)
            pq.write_table(t.select(["id", "_lsn"]),
                           os.path.join(pd, "part-00000.parquet"))
        segs.append(SegmentMeta(
            path=rel, rows=ROWS_PER_SEG, lsn=1, bytes=os.path.getsize(f),
            stats={"id": {"min": lo, "max": lo + ROWS_PER_SEG - 1,
                          "null_count": 0, "ndv": ROWS_PER_SEG}},
            pk=pk_rel))
    man = Manifest(
        version=man0.version + 1, lsn=1, next_id=n_segs * ROWS_PER_SEG,
        created_at=time.time(), segments=segs, meta=dict(man0.meta))
    save_manifest(path, man)
    return VectorTable.open(spark, path)


@pytest.fixture(scope="module")
def big(spark, tmp_path_factory):
    return _build_many_segment_table(
        spark, str(tmp_path_factory.mktemp("many") / "tbl"))


def test_manifest_ops_stay_o_segments(spark, tmp_path_factory, big):
    timings = {}
    t0 = time.perf_counter()
    t = VectorTable.open(spark, big.path)
    timings["open"] = time.perf_counter() - t0
    assert len(t.manifest.segments) == N_SEGS

    t0 = time.perf_counter()
    n = t.count()  # clean snapshot → manifest sum, zero jobs
    timings["count_zero_job"] = time.perf_counter() - t0
    assert n == N_SEGS * ROWS_PER_SEG
    assert timings["count_zero_job"] < 0.5

    t0 = time.perf_counter()
    kept = prune_segments(t.manifest.segments, FilterSet().eq("id", 4242))
    timings["prune"] = time.perf_counter() - t0
    assert len(kept) == 1 and kept[0].stats["id"]["min"] <= 4242
    assert timings["prune"] < 2.0

    # stats() is manifest-only too
    t0 = time.perf_counter()
    s = t.stats()
    timings["stats"] = time.perf_counter() - t0
    assert s["segments"] == N_SEGS and timings["stats"] < 0.5
    assert timings["open"] < 10.0
    print("MANY-SEG timings:", {k: round(v, 3) for k, v in timings.items()})


def test_point_get_reads_one_segment(big):
    got = big.df(FilterSet().eq("id", 4242))
    files = set(got.inputFiles())
    assert len(files) == 1  # manifest pruning beat the file listing
    assert [r["id"] for r in got.where(F.col("id") == 4242).collect()] == [4242]


def test_full_scan_600_dirs_bounded(big):
    t0 = time.perf_counter()
    assert big.df().count() == N_SEGS * ROWS_PER_SEG
    dt = time.perf_counter() - t0
    print(f"MANY-SEG full-scan: {dt:.2f}s over {N_SEGS} dirs")
    assert dt < 120.0  # file listing + scan must not degrade


def test_plan_size_flat_in_segment_count(spark, tmp_path_factory, big):
    """seg_tag_expr's O(1) claim, generalized: the physical plan of a
    600-segment scan must not grow ~linearly vs a 50-segment one (the
    r8 advice killed a per-segment F.when chain; this pins the class)."""
    small = _build_many_segment_table(
        spark, str(tmp_path_factory.mktemp("small") / "tbl"), n_segs=50)
    p_small = small.df()._jdf.queryExecution().executedPlan().toString()
    p_big = big.df()._jdf.queryExecution().executedPlan().toString()
    assert len(p_big) < 3 * len(p_small) + 10_000
    # and the segment tag really is one regexp over input_file_name
    from vecgo_spark.operators.graph_at_rest import seg_tag_expr
    tags = (big._segment_df(big.manifest.segments[:5])
            .select(seg_tag_expr().alias("s")).distinct().collect())
    assert {r["s"] for r in tags} == {s.path for s in big.manifest.segments[:5]}


def test_visibility_join_unaffected_by_segment_count(spark, big):
    """A tombstone file over a dense id interval: the manifest gives the
    exact id count (→ size-gated broadcast, zero probing jobs), count()
    still answers manifest-only, and the anti-join result is exact."""
    path = big.path
    rel = os.path.join(TOMB_DIR, "tomb-00000002-stress")
    d = os.path.join(path, rel)
    os.makedirs(d)
    dead = list(range(100, 150))
    pq.write_table(pa.table({
        "id": pa.array(dead, pa.int64()),
        "_lsn": pa.array([2] * len(dead), pa.int64()),
    }), os.path.join(d, "part-00000.parquet"))
    m = big.manifest
    man = Manifest(
        version=m.version + 1, lsn=2, next_id=m.next_id,
        created_at=time.time(), segments=list(m.segments),
        tombstone_files=[rel], meta=dict(m.meta),
        tombstone_stats={rel: {"ids": len(dead), "min": 100, "max": 149,
                               "lsn": 2, "dense": True}})
    save_manifest(path, man)
    t = VectorTable.open(spark, path)
    assert t.tomb_broadcastable()  # decided from manifest stats alone
    t0 = time.perf_counter()
    n = t.count()  # dense interval → still zero-job
    dt = time.perf_counter() - t0
    assert n == N_SEGS * ROWS_PER_SEG - len(dead) and dt < 0.5
    assert t.df().where(F.col("id").isin([99, 100, 149, 150])).count() == 2


def test_churned_600_segments_subset_reads_only_sidecars(
        spark, tmp_path_factory):
    """The churned twin of the 600-segment pin (r10 verdict #8): with
    upserts + tombstones across a 600-segment snapshot, a subset scan's
    visibility pass must (a) stay bounded-time and (b) read ONLY the PK
    sidecar family — never a segment file outside the subset (the
    O(corpus) narrow projection the sidecars replaced)."""
    path = str(tmp_path_factory.mktemp("churn") / "tbl")
    t = _build_many_segment_table(spark, path, with_pk=True)
    # churn through the real write path: overwrite 10 ids spread across
    # the id space, delete 5 more
    t.insert(spark.createDataFrame(
        [(i * 1000 + 7, f"new tok{i}") for i in range(10)],
        "id long, text string"))
    t.commit()
    t.delete([11_003, 11_004, 11_005, 11_006, 11_007])
    t.commit()
    assert t.manifest.meta.get("has_upserts") is True
    assert all(s.pk for s in t.manifest.segments if s.rows)
    # subset = one original segment holding an overwritten id (1007) and
    # a deleted one would be elsewhere; segment 50 holds ids 1000-1019
    sub_seg = [s for s in t.manifest.segments
               if s.stats["id"]["min"] <= 1007 <= s.stats["id"]["max"]
               and s.lsn == 1]
    assert len(sub_seg) == 1
    t0 = time.perf_counter()
    sub = t.df(segments=sub_seg)
    files = set(sub.inputFiles())
    got = {r["id"] for r in sub.collect()}
    dt = time.perf_counter() - t0
    # correctness: 1007's winner lives in the churn segment → dropped
    assert got == set(range(1000, 1020)) - {1007}
    # plan: inputs are the subset segment + sidecars + tombstones only
    other = [os.path.join(path, s.path) for s in t.manifest.segments
             if s.path != sub_seg[0].path]
    for f in files:
        assert not any(f.startswith(p) for p in other), \
            f"corpus segment leaked into the visibility plan: {f}"
    # the visibility leg (cached winning-LSN frame) reads sidecars only
    # (persisted → inputFiles() is empty; the registry records sources)
    from vecgo_spark.plans import table as tmod

    mine = [v for key, v in tmod._VIS_CACHE.items() if key[0] == path]
    assert mine
    for _fr, pk_files, uncovered in mine:
        assert pk_files and all(f"/{PK_DIR}/" in f for f in pk_files)
        assert uncovered == []
    print(f"MANY-SEG churned subset scan: {dt:.2f}s over {N_SEGS} segments")
    assert dt < 60.0  # bounded: 601 tiny sidecars + 1 segment, not 600 segments
