"""Robustness + property tests, mirroring the reference's fuzz intent
(internal/engine/fuzz_test.go:45 — corrupt inputs must ERROR, never crash
or silently succeed) and its property/equivalence style with hypothesis:
filter semantics vs an independent Python reference model."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vecgo_spark.filters import Filter, FilterSet
from vecgo_spark.operators import knn
from vecgo_spark.plans.manifest import load_manifest, manifest_path
from vecgo_spark.plans.table import VectorTable


# ----------------------------------------------------------- fuzz-style

def _mk_table(spark, path):
    t = VectorTable.create(spark, str(path), dim=2, metric="l2")
    t.insert(spark.createDataFrame([(1, [0.0, 1.0]), (2, [1.0, 0.0])],
                                   "id LONG, vector ARRAY<DOUBLE>"))
    t.commit()
    return t


def test_corrupt_manifest_errors_cleanly(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    p = manifest_path(t.path, t.manifest.version)
    with open(p, "w") as f:
        f.write("{not valid json!!")
    with pytest.raises((json.JSONDecodeError, ValueError)):
        load_manifest(t.path)


def test_truncated_manifest_errors_cleanly(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t2")
    p = manifest_path(t.path, t.manifest.version)
    raw = open(p).read()
    with open(p, "w") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises((json.JSONDecodeError, ValueError, KeyError)):
        load_manifest(t.path)


def test_manifest_referencing_missing_segment_errors(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t3")
    seg = os.path.join(t.path, t.manifest.segments[0].path)
    for dp, _, fs in os.walk(seg):
        for f in fs:
            os.remove(os.path.join(dp, f))
    os.rmdir(seg) if not os.listdir(seg) else None
    reopened = VectorTable.open(spark, t.path)
    # count() is metadata-only on a tombstone-free snapshot (answers from
    # SegmentMeta.rows, like an Iceberg/Delta manifest count) — it still
    # reports the committed number without touching files...
    assert reopened.count() == 2
    # ...but any DATA read must surface the missing segment
    with pytest.raises(Exception):  # AnalysisException: path does not exist
        reopened.df().count()


def test_open_missing_table_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        VectorTable.open(spark, str(tmp_path / "nope"))


def test_dimension_mismatch_rejected(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t4")
    bad = spark.createDataFrame([(9, [1.0, 2.0, 3.0])], "id LONG, vector ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="dimension"):
        t.insert(bad)


def test_unknown_metric_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="metric"):
        VectorTable.create(spark, str(tmp_path / "t5"), dim=2, metric="manhattan")
    with pytest.raises(ValueError, match="unknown metric"):
        knn.score_expr("manhattan", "v", [1.0])


def test_custom_metric_registration(spark):
    """The distance.Provider extension point (distance/distance.go:97-106)."""
    from vecgo_spark.functions.vector import sq_l2

    def l1(vector_col, query):
        from pyspark.sql import functions as F
        a = (F.col(vector_col) if isinstance(vector_col, str) else vector_col).cast("array<double>")
        b = F.array(*[F.lit(float(x)) for x in query])
        return F.aggregate(F.zip_with(a, b, lambda x, y: F.abs(x - y)),
                           F.lit(0.0), lambda acc, x: acc + x)

    knn.register_metric("l1", l1, ascending=True)
    try:
        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [3.0, 4.0]), (3, [1.0, 1.0])],
            "id LONG, vector ARRAY<DOUBLE>")
        got = knn.search(df, [0.0, 0.0], k=3, metric="l1").collect()
        assert [r["id"] for r in got] == [1, 3, 2]
        assert got[2]["score"] == 7.0
    finally:
        del knn.METRICS["l1"]


def test_manifest_io_over_uri(spark, tmp_path):
    """Manifest IO goes through pyarrow.fs — a file:// URI exercises the
    same code path an s3:// table root would (BlobStore analog)."""
    import json as _json

    from vecgo_spark.plans.manifest import Manifest, list_versions, save_manifest

    uri = f"file://{tmp_path}/remote_tbl"
    m = Manifest(version=1, lsn=0, next_id=1, created_at=1.0, meta={"metric": "l2"})
    save_manifest(uri, m)
    assert list_versions(uri) == [1]
    got = load_manifest(uri)
    assert got.version == 1 and got.meta["metric"] == "l2"
    with pytest.raises(FileExistsError):
        save_manifest(uri, m)  # concurrent-commit guard on the URI path


# ------------------------------------------------- property-based filters

_VALUES = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.floats(min_value=-5, max_value=5, allow_nan=False, width=64),
    st.none(),
)


def _py_filter_model(row: dict, f: Filter) -> bool:
    """Independent Python model of metadata/filter.go semantics:
    missing/None field ⇒ no match, even for ne (filter.go:9-19);
    numeric comparisons numeric-only."""
    v = row.get(f.key)
    if v is None:
        return False
    if f.op == "eq":
        return v == f.value
    if f.op == "ne":
        return v != f.value
    if f.op == "gt":
        return v > f.value
    if f.op == "gte":
        return v >= f.value
    if f.op == "lt":
        return v < f.value
    if f.op == "lte":
        return v <= f.value
    raise AssertionError(f.op)


@given(
    data=st.lists(
        st.tuples(st.integers(0, 10 ** 6), _VALUES), min_size=1, max_size=25, unique_by=lambda t: t[0]
    ),
    op=st.sampled_from(["eq", "ne", "gt", "gte", "lt", "lte"]),
    value=st.one_of(st.integers(-5, 5), st.floats(-5, 5, allow_nan=False)),
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_filter_semantics_match_python_model(spark, data, op, value):
    f = Filter(key="x", op=op, value=value)
    expect = sorted(i for i, v in data if _py_filter_model({"x": v}, f))
    df = spark.createDataFrame([(i, float(v) if v is not None else None) for i, v in data],
                               "id LONG, x DOUBLE")
    got = sorted(r["id"] for r in df.where(FilterSet([f]).to_column()).collect())
    assert got == expect


def test_hamming_registered_metric(spark):
    """Hamming is a first-class distance provider (distance.go:97-106):
    knn.search over integer code arrays, ascending, id tiebreak."""
    from vecgo_spark.operators import knn

    rows = [
        (1, [0b1111, 0b0000]),
        (2, [0b1110, 0b0000]),   # 1 bit from query
        (3, [0b0000, 0b1111]),   # 8 bits
        (4, [0b1111, 0b0001]),   # 1 bit
    ]
    df = spark.createDataFrame(rows, "id long, vector array<int>")
    got = [(r["id"], r["score"]) for r in
           knn.search(df, [0b1111, 0b0000], k=4, metric="hamming").collect()]
    assert got == [(1, 0), (2, 1), (4, 1), (3, 8)]


@given(st.data())
@settings(max_examples=200, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_manifest_count_interval_arithmetic_matches_set_model(data):
    """_manifest_count (zero-job tombstoned live count) vs a brute-force
    id-set model, over random segment layouts and tombstone batches —
    whenever the interval fast path claims an answer, it must equal the
    exact per-row visibility count (row hidden iff some tombstone holds
    its id with tombstone lsn >= the segment's lsn). Pure driver logic:
    no SparkSession in the loop."""
    from vecgo_spark.plans.manifest import Manifest, SegmentMeta
    from vecgo_spark.plans.table import VectorTable

    lsn = 0
    segs, seg_ids = [], []
    base = 0
    for _ in range(data.draw(st.integers(1, 4))):
        lsn += 1
        width = data.draw(st.integers(1, 30))
        if data.draw(st.booleans()):
            ids = set(range(base, base + width))          # dense
        else:
            ids = set(data.draw(st.sets(
                st.integers(base, base + width * 2), min_size=1, max_size=width)))
        stats = {"id": {"min": min(ids), "max": max(ids), "null_count": 0,
                        **({"ndv": len(ids)} if len(ids) > 1 else {})}}
        segs.append(SegmentMeta(path=f"s{lsn}", rows=len(ids), lsn=lsn, stats=stats))
        seg_ids.append((lsn, ids))
        base = max(ids) + 1 + data.draw(st.integers(0, 5))
    tombs, tomb_stats = [], {}
    tomb_sets = []
    for _ in range(data.draw(st.integers(0, 3))):
        lsn += 1
        tids = set(data.draw(st.sets(st.integers(0, base), min_size=1, max_size=15)))
        rel = f"t{lsn}"
        tombs.append(rel)
        tomb_stats[rel] = {"ids": len(tids), "min": min(tids), "max": max(tids),
                           "lsn": lsn, "dense": max(tids) - min(tids) + 1 == len(tids)}
        tomb_sets.append((lsn, tids))
    m = Manifest(version=1, lsn=lsn, next_id=base, created_at=0.0,
                 segments=segs, tombstone_files=tombs,
                 meta={"id_col": "id"}, tombstone_stats=tomb_stats)
    tbl = VectorTable.__new__(VectorTable)   # logic-only instance
    tbl.manifest = m
    # exact model: segment id sets are disjoint (has_upserts False), every
    # row's lsn == its segment's lsn
    live = 0
    for seg_lsn, ids in seg_ids:
        for i in ids:
            if not any(i in tids and t_lsn >= seg_lsn for t_lsn, tids in tomb_sets):
                live += 1
    fast = tbl._manifest_count(m)
    if fast is not None:
        assert fast == live
    all_dense = all(ts["dense"] for ts in tomb_stats.values())
    segs_dense = all(max(ids) - min(ids) + 1 == len(ids) for _, ids in seg_ids)
    sorted_t = sorted(tomb_stats.values(), key=lambda t: t["min"])
    disjoint = all(b["min"] > a["max"] for a, b in zip(sorted_t, sorted_t[1:]))
    if all_dense and segs_dense and disjoint:
        assert fast is not None, "fast path must fire on provably-dense layouts"


def test_legacy_manifest_without_new_fields_loads(spark, tmp_path):
    """Manifests written before tombstone_stats / tomb_lsn_applied existed
    must load with safe defaults (empty stats → count() takes the scan
    path; segments treated as original appends)."""
    import json

    from vecgo_spark.plans.manifest import load_manifest, manifest_path
    from vecgo_spark.plans.table import VectorTable

    tdir = str(tmp_path / "tlegacy")
    t = VectorTable.create(spark, tdir, dim=2)
    t.insert(spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(8)], "id long, vector array<float>"))
    t.commit()
    t.delete([2, 3])
    t.commit()
    # strip the new fields from the latest manifest on disk
    p = manifest_path(tdir, t.manifest.version)
    d = json.loads(open(p).read())
    d.pop("tombstone_stats", None)
    for s in d["segments"]:
        s.pop("tomb_lsn_applied", None)
    open(p, "w").write(json.dumps(d))
    reopened = VectorTable.open(spark, tdir)
    assert reopened.manifest.tombstone_stats == {}
    assert all(s.tomb_lsn_applied == 0 for s in reopened.manifest.segments)
    assert reopened.count() == 6          # falls back to the exact scan
    assert reopened._manifest_count(reopened.manifest) is None


@given(
    corpus=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12),
                    min_size=1, max_size=8),
    bench=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12),
                   min_size=1, max_size=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_bloom_decontaminate_superset_property(spark, corpus, bench):
    """For ANY corpus/benchmark (random token sequences): per-doc bloom
    flags ≥ exact shared-shingle count (no false negatives), flags ≤
    total shingles, and an exact-copy doc flags everything — the
    engine-parity hash math can't silently drop true overlap."""
    from vecgo_spark.operators import pipeline

    cdocs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    bdocs = [(1000 + i, " ".join(toks)) for i, toks in enumerate(bench)]
    cdf = spark.createDataFrame(cdocs, "doc_id long, text string")
    bdf = spark.createDataFrame(bdocs, "doc_id long, text string")
    flags = {r["doc_id"]: r for r in
             pipeline.bloom_decontaminate(cdf, bdf, n=3).collect()}
    exact = {r["doc_id"]: r["n_shared_shingles"] for r in
             pipeline.contamination_overlap(cdf, bdf, n=3).collect()}
    for d, row in flags.items():
        assert 0 <= row["n_flagged"] <= row["n_shingles"]
        assert row["n_flagged"] >= exact.get(d, 0)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=24),
    min_size=1, max_size=10,
), st.integers(min_value=2, max_value=5))
def test_exact_substring_spans_hypothesis(spark, token_docs, L):
    """Property: exact_substring_spans == the brute-force python model
    (count every L-window corpus-wide, run-merge per doc) for arbitrary
    small-vocab corpora — the tiny alphabet maximizes repeats, hot
    windows, adjacent-run and whole-doc-duplicated edge cases."""
    from collections import Counter

    from vecgo_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_docs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    wins = []
    for i, toks in enumerate(token_docs):
        wins += [(i, p + 1, " ".join(toks[p:p + L]))
                 for p in range(len(toks) - L + 1)]
    counts = Counter(sh for _, _, sh in wins)
    want = set()
    for i, _ in enumerate(token_docs):
        run = []
        for p in sorted(p for d, p, sh in wins if d == i and counts[sh] >= 2):
            if run and p - run[-1] <= L:  # coverage overlaps or touches
                run.append(p)
            else:
                if run:
                    want.add((i, run[0], run[-1] + L - 1,
                              run[-1] + L - run[0], len(run)))
                run = [p]
        if run:
            want.add((i, run[0], run[-1] + L - 1, run[-1] + L - run[0], len(run)))

    got = {tuple(r) for r in
           dedup.exact_substring_spans(docs, min_len=L).collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                       st.integers(min_value=0, max_value=9)),
             min_size=1, max_size=60),
    st.dictionaries(st.sampled_from(["a", "b", "c"]),
                    st.integers(min_value=1, max_value=40),
                    min_size=1, max_size=3),
    st.integers(min_value=2, max_value=8),
)
def test_token_budget_two_phase_hypothesis(spark, docs_spec, budgets, bucket_bits):
    """Property: the two-phase prefix sum == the brute-force greedy model
    (hash-ordered per source, crossing doc included) for arbitrary
    source mixes, budgets and bucket counts — the bucket decomposition
    must never change a single admitted doc or running total."""
    from vecgo_spark.functions.hashing import stable_hash64_py
    from vecgo_spark.operators import pipeline

    rows = [(i, src, "w " * ntok) for i, (src, ntok) in enumerate(docs_spec)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    want = {}
    for src, budget in budgets.items():
        cum = 0
        for _pri, i, n in sorted(
                (stable_hash64_py(str(i)), i, len(t.split()))
                for i, s, t in rows if s == src):
            if cum < budget:
                cum += n
                want[i] = (src, n, cum)
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
           for r in pipeline.token_budget_mixture(
               df, budgets, bucket_bits=bucket_bits).collect()}
    assert got == want


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_mvcc_lifecycle_random_model(spark, tmp_path, seed, monkeypatch):
    """Randomized MVCC model check: a seeded sequence of insert / delete /
    STAGE-insert / STAGE-delete (no commit) / explicit commit /
    partial-compact / full-compact (possibly WHILE STAGED) / vacuum /
    PK-cache-release / PK-sidecar-backfill must keep the live snapshot
    identical to a python model of the visibility algebra (a tombstone at
    LSN T kills versions with lsn <= T; latest surviving insert wins).
    TOMB_FOLD_MAX_FILES is forced to 2 so tombstone folding, interval GC,
    and the mixed-stats count fallback all fire repeatedly — the r9
    compaction-migration surface under churn. The winning VERSION is
    checked too (vector[0] encodes the insert sequence number), not just
    the visible id set.

    Staged-state ops (r11 verdict #5): the round's self-found
    compact()-while-staged MVCC bug (staged colliding insert + compact
    published has_upserts=False and restarted the LSN cursor into a
    same-LSN tie) was caught by review, not by this check, because every
    op committed immediately. 'sins'/'sdel' stage without committing —
    the committed view must NOT see them, the include_pending
    read-your-writes view MUST — and 'fc'/'pc'/'vac' now run against a
    possibly-staged table. Sanity-run note: with the table.py
    flush-before-compact guard reverted, seeds 1 and 42 fail this test
    at the first fc-while-staged step (recorded in COVERAGE.md r12)."""
    import random

    from vecgo_spark.plans import table as tbl_mod
    from vecgo_spark.plans.policy import CompactionTask

    monkeypatch.setattr(tbl_mod, "TOMB_FOLD_MAX_FILES", 2)
    rng = random.Random(seed)
    t = VectorTable.create(spark, str(tmp_path / f"t{seed}"), dim=2, metric="l2")
    inserts: dict[int, int] = {}   # id -> latest COMMITTED insert seq
    tombs: dict[int, int] = {}     # id -> latest COMMITTED delete seq
    st_ins: dict[int, int] = {}    # staged (uncommitted) layer — LSNs are
    st_tombs: dict[int, int] = {}  # assigned at STAGE time (_next_lsn), so
    seq = 0                        # global seq order == LSN order

    class PickRandom:
        def pick(self, segments):
            if len(segments) < 2:
                return None
            n = rng.randint(2, len(segments))
            return CompactionTask(segments=rng.sample(list(segments), n))

    def flush_model():
        # commit() publishes every pending batch in stage order; per-id
        # latest-seq-wins matches the LSN order they were staged in
        inserts.update(st_ins)
        tombs.update(st_tombs)
        st_ins.clear()
        st_tombs.clear()

    def visible():
        return {i: s for i, s in inserts.items() if s > tombs.get(i, -1)}

    def visible_pending():
        ins = {**inserts, **st_ins}
        tmb = {**tombs, **st_tombs}
        return {i: s for i, s in ins.items() if s > tmb.get(i, -1)}

    def check(op):
        got = {r["id"]: int(r["vector"][0]) for r in t.df().collect()}
        assert got == visible(), (seed, seq, op)
        assert t.count() == len(got), (seed, seq, op)
        # read-your-writes: the include_pending view sees the staged
        # layer exactly (insert-immediately-searchable, engine.go:833)
        got_p = {r["id"]: int(r["vector"][0])
                 for r in t.df(include_pending=True).collect()}
        assert got_p == visible_pending(), (seed, seq, op)
        # subset-scan visibility (r10 fix): a stats-pruned point filter
        # must return exactly the live version — never a stale one from
        # a kept segment when the winner's segment was pruned
        for probe_id in rng.sample(range(30), 3):
            rows = t.df(FilterSet().eq("id", probe_id)).collect()
            want = visible().get(probe_id)
            assert [int(r["vector"][0]) for r in rows] == \
                ([want] if want is not None else []), (seed, seq, op, probe_id)
        # explicit-subset visibility (r11, the PK-sidecar read path —
        # cache hit or rebuild depending on the op mix): rows from ONE
        # random segment must be exactly the live versions stored there
        if t.manifest.segments:
            seg = rng.choice(t.manifest.segments)
            sub = {r["id"]: int(r["vector"][0])
                   for r in t.df(segments=[seg]).collect()}
            assert all(visible().get(i) == s for i, s in sub.items()), \
                (seed, seq, op, seg.path)

    for _ in range(14):
        seq += 1
        op = rng.choices(
            ["ins", "del", "sins", "sdel", "cmt", "pc", "fc", "vac",
             "rel", "bpk"],
            weights=[28, 22, 12, 8, 8, 12, 8, 4, 4, 3])[0]
        if op == "ins":
            ids = rng.sample(range(30), rng.randint(1, 6))
            t.insert(spark.createDataFrame(
                [(i, [float(seq), float(i)]) for i in ids],
                "id long, vector array<float>"))
            for i in ids:
                st_ins[i] = seq
            t.commit()
            flush_model()
        elif op == "del":
            ids = rng.sample(range(30), rng.randint(1, 6))
            t.delete(ids)
            for i in ids:
                st_tombs[i] = seq
            t.commit()
            flush_model()
        elif op == "sins":  # stage WITHOUT commit
            ids = rng.sample(range(30), rng.randint(1, 6))
            t.insert(spark.createDataFrame(
                [(i, [float(seq), float(i)]) for i in ids],
                "id long, vector array<float>"))
            for i in ids:
                st_ins[i] = seq
        elif op == "sdel":  # stage a delete WITHOUT commit
            ids = rng.sample(range(30), rng.randint(1, 6))
            t.delete(ids)
            for i in ids:
                st_tombs[i] = seq
        elif op == "cmt":
            t.commit()
            flush_model()
        elif op == "pc":
            # partial compaction leaves staged batches pending;
            # alternate between a random picker and the LeveledPolicy
            # (r12) so level-stamped rewrites interleave with churn too
            if rng.random() < 0.5:
                from vecgo_spark.plans.policy import LeveledPolicy
                t.maybe_compact(LeveledPolicy(l0_threshold=2, base_bytes=1))
            else:
                t.maybe_compact(PickRandom())
        elif op == "fc":
            # compact-while-staged: flushes staged state FIRST (the r11
            # self-found fix) — the model flushes with it
            t.compact()
            flush_model()
        elif op == "vac":
            t.vacuum(keep_versions=1)
        elif op == "rel":
            # loaded-PK-index cache release mid-serving (r11): the next
            # subset read rebuilds the frame from sidecars — results
            # must be identical either way
            tbl_mod.release_vis_caches(t.path)
        else:  # bpk — the sidecar backfill must be a correctness no-op
            t.build_pk_index()
        check(op)

    # FORCED staged-compact epilogue: the random mix above may or may not
    # hit the compact-while-staged interleaving for a given seed (a
    # seed-search showed ~2 of the 3 pinned seeds don't), so every seed
    # ends with the exact r11 self-found shape — a staged COLLIDING
    # insert plus a staged delete, then compact(). Pre-fix code fails
    # here deterministically: it published has_upserts=False with the
    # staged collision still pending and restarted the LSN cursor into a
    # same-LSN tie with the staged batch.
    seq += 1
    pool = sorted(inserts)
    ids = rng.sample(pool if len(pool) >= 3 else list(range(5)), 3)
    t.insert(spark.createDataFrame(
        [(i, [float(seq), float(i)]) for i in ids],
        "id long, vector array<float>"))
    for i in ids:
        st_ins[i] = seq
    check("epilogue-staged-collide")
    seq += 1
    del_ids = rng.sample(range(30), 3)
    t.delete(del_ids)
    for i in del_ids:
        st_tombs[i] = seq
    check("epilogue-staged-delete")
    seq += 1
    t.compact()  # flush-before-compact (r11 fix) folds both staged batches
    flush_model()
    check("epilogue-compact-while-staged")


def test_artifact_families_random_churn_parity(spark, tmp_path):
    """Cross-family integration under churn: a table carrying minhash +
    simhash + lexical artifacts goes through a seeded insert / delete /
    upsert / refresh / partial-compact sequence; after EVERY op the
    stored-serving reads (signatures, BM25) must stay bit-identical to
    fresh recomputation over df() — the visibility algebra replayed on
    index rows can never drift from the table's own."""
    import random

    from vecgo_spark.operators import bm25, dedup
    from vecgo_spark.operators import lexical_at_rest as lex
    from vecgo_spark.operators import minhash_at_rest as mar
    from vecgo_spark.operators import simhash_at_rest as sar
    from vecgo_spark.plans.policy import CompactionTask

    rng = random.Random(13)

    def docs(ids, text=None):
        return spark.createDataFrame(
            [(i, text if text is not None
              else f"alpha beta tok{i % 7} mid{i % 5} end{i % 11} w{i}")
             for i in ids], "id long, text string")

    t = VectorTable.create(spark, str(tmp_path / "fam"), dim=None)
    t.insert(docs(range(1, 31)))
    t.commit()
    mar.build_minhash_index(t)
    sar.build_simhash_index(t)
    t.build_lexical_index()

    class PickRandom:
        def pick(self, segments):
            if len(segments) < 2:
                return None
            return CompactionTask(
                segments=rng.sample(list(segments), 2))

    def check(step):
        assert sorted(map(tuple, mar.stored_minhash_signatures(t).collect())) \
            == sorted(map(tuple, dedup.minhash_signatures(t.df(), "id", "text").collect())), step
        assert sorted(map(tuple, sar.stored_simhash_signatures(t).collect())) \
            == sorted(map(tuple, dedup.simhash(t.df(), "id", "text").collect())), step
        got = [(r["id"], r["score"]) for r in
               lex.bm25_search_at_rest(t, "beta tok3", k=40).collect()]
        want = [(r["id"], r["score"]) for r in
                bm25.bm25_search(t.df(), "beta tok3", k=40,
                                 id_col="id", text_col="text").collect()]
        assert got == want, step

    nxt = 100
    for step in range(11):
        op = rng.choices(["ins", "del", "ups", "refresh", "pc", "fc", "vac",
                          "sups"],
                         weights=[24, 16, 16, 16, 10, 6, 4, 8])[0]
        if op == "ins":
            t.insert(docs(range(nxt, nxt + 5)))
            t.commit()
            nxt += 5
        elif op == "sups":
            # STAGED colliding upsert, NOT committed (r12): staging flips
            # has_upserts in the in-memory manifest before any commit —
            # the stored-serving reads (committed view) must be
            # unaffected until the batch actually publishes (a later
            # ins/del/ups commit or the compact flush folds it in; the
            # fresh-recompute side of check() sees the same committed
            # view, so parity pins the class)
            pool = [r["id"] for r in t.df().select("id").collect()]
            if pool:
                i = rng.choice(pool)
                t.insert(docs([i], text=f"staged rewrite s{step} of {i}"))
        elif op == "del":
            pool = [r["id"] for r in t.df().select("id").collect()]
            if pool:
                t.delete(rng.sample(pool, min(3, len(pool))))
                t.commit()
        elif op == "ups":
            pool = [r["id"] for r in t.df().select("id").collect()]
            if pool:
                i = rng.choice(pool)
                t.insert(docs([i], text=f"rewritten version v{step} of {i}"))
                t.commit()
        elif op == "refresh":
            mar.refresh_minhash_index(t)
            sar.refresh_simhash_index(t)
            t.refresh_lexical_index()
        elif op == "pc":
            t.maybe_compact(PickRandom())
        elif op == "fc":
            # full compaction reindexes every family (fresh df sidecars,
            # clean visibility) — the stored reads must stay identical
            # right through the rebuild
            t.compact(reindex=True)
        else:
            # vacuum collects superseded dirs AND their df sidecars; the
            # live families must keep serving
            t.vacuum(keep_versions=1)
        check((step, op))
    # publish anything still staged and re-check — the staged upserts
    # must surface through every family once committed
    t.commit()
    check("final-commit")
