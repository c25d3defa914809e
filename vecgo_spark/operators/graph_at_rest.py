"""Shared scaffolding for persisted per-segment graph indexes.

Two graph families use it: per-segment HNSW (operators/hnsw.py — the
reference's in-memory index, internal/index/hnsw) and per-segment Vamana
(operators/vamana.py — the reference's DiskANN at-rest index,
internal/segment/diskann/writer.go). Both follow the same Spark-first
shape the reference's segment builder follows natively:

  build:  one applyInPandas group per committed segment (parallel executor
          tasks, rows sorted by id for a deterministic build) → one
          versioned .npz blob per segment under _index/<family>-v*/;
          the NEXT manifest version records the artifact dir, the build
          params and the EXACT segment list indexed.
  search: probed segments load their stored graph (small blob scan, one
          mapInPandas), beam search emits k candidates per graph; segments
          committed AFTER the build take an exact-scan delta leg; the
          union exact-reranks against the live snapshot — which also
          enforces tombstone/upsert visibility for rows deleted or
          rewritten since the graphs were built.

Scale posture: blobs are per-segment (bounded by segment size), the probe
is a narrow scan of only the indexed segments' blobs, and candidate
volume is bounded by segments × k before the rerank.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adaptive_block(n: int, budget: int = 8_000_000, cap: int = 1024) -> int:
    """Block row-count for the build-time distance precompute gemm: bounds
    block × n to ~`budget` matrix entries (~64 MB float64 at the default)
    regardless of graph size. Floor is 1, NOT a fixed row count — a
    64-row floor at n=1M nodes would allocate a 512 MB matrix per task
    (ADVICE r5); huge segments get tiny blocks instead."""
    return int(min(cap, max(1, budget // max(n, 1))))


def build_graphs_at_rest(
    tbl,
    family: str,
    params: dict,
    build_blob: Callable[[list[int], np.ndarray], bytes],
) -> int:
    """Build one graph blob per committed segment and publish a manifest
    version whose meta[family] records {path, segments, **params}.
    build_blob(ids, block) runs inside the executor task."""
    from vecgo_spark.plans.manifest import Manifest, save_manifest

    tbl._check_writable()
    if tbl.metric != "l2":
        # the stored graphs beam-search squared-L2 geometry; serving a
        # dot/cosine table from them would pool the WRONG candidates
        # (rerank cannot repair a candidate set that never contained the
        # high-similarity rows) — fail loudly instead
        raise ValueError(
            f"{family} at-rest index supports metric='l2' tables, got {tbl.metric!r}")
    man = tbl.manifest
    segs = man.segments
    if not segs:
        raise ValueError("nothing to index: table has no committed segments")
    version = man.version + 1
    rel = _write_blob_dir(tbl, segs, family, version, build_blob)
    info = {"path": rel, "segments": [s.path for s in segs], **params}
    record_dir_bytes(tbl, info)
    new = Manifest(
        version=version, lsn=man.lsn, next_id=man.next_id,
        created_at=time.time(), segments=list(segs),
        tombstone_files=list(man.tombstone_files),
        meta={**man.meta, family: info},
        tombstone_stats=dict(man.tombstone_stats),
    )
    save_manifest(tbl.path, new)
    tbl.manifest = new
    return version


def seg_tag_expr():
    """Table-relative segment dir of the row's input file — ONE regexp
    per row, O(1) plan size at any segment count (r8 advice: the
    previous per-segment F.when chain grew the plan linearly with
    #segments at build time). The tag is everything from the LAST
    `_segments/` component to the file's parent dir, which is exactly
    SegmentMeta.path for both layouts: plain segments
    (`_segments/seg-x`) and clustered ones, where each `_part=N` subdir
    is its own segment (`_segments/seg-x/_part=0` — input_file_name
    carries the `=` unencoded). The greedy `.*/` prefix makes a table
    rooted under a directory that itself contains `_segments` tag
    correctly. Sound only over `_segment_df(segs)` scans, where every
    file lives under exactly one segment dir."""
    from vecgo_spark.plans.table import SEG_DIR

    return F.regexp_extract(
        F.input_file_name(), ".*/(" + SEG_DIR + "/.+)/[^/]*$", 1)


def _write_blob_dir(tbl, segs, family: str, version: int, build_blob,
                    extra=None) -> str:
    """One graph blob per segment in `segs` → a versioned parquet dir
    under _index/; returns the table-relative path.  `extra` is an
    optional (seg, blob) DataFrame unioned into the write — the fold path
    copies still-live blobs from superseded dirs through it.

    An existing target dir is an ORPHAN from a failed earlier attempt
    (the dir name carries version = manifest.version + 1, which no saved
    manifest can reference yet) — it is removed and rewritten, so a
    crash between the blob write and save_manifest never wedges the next
    build/refresh on mode('error')."""
    from vecgo_spark.plans.manifest import fs_exists, fs_rmtree
    from vecgo_spark.plans.table import INDEX_DIR

    id_col, vector_col = tbl.id_col, tbl.vector_col
    raw = (
        tbl._segment_df(segs)
        .where(F.col(vector_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
        .withColumn("_seg", seg_tag_expr())
    )

    def build(key, pdf):
        pdf = pdf.sort_values("id")
        blob = b""
        if len(pdf):
            block = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            blob = build_blob([int(r) for r in pdf["id"]], block)
        return pd.DataFrame({"seg": [key[0]], "blob": [blob]})

    rel = os.path.join(INDEX_DIR, f"{family}-v{version:08d}")
    full = os.path.join(tbl.path, rel)
    if fs_exists(full):
        fs_rmtree(full)  # orphan of a failed attempt — see docstring
    out = raw.groupBy("_seg").applyInPandas(build, "seg string, blob binary")
    if extra is not None:
        out = out.unionByName(extra.select("seg", "blob"))
    out.write.mode("error").parquet(full)
    return rel


def blob_paths(info: dict) -> list[str]:
    """Every live blob dir of an index family — refresh appends dirs
    instead of rewriting the original (paths[0] == the full-build dir)."""
    return list(info.get("paths", [info["path"]]))


def record_dir_bytes(tbl, info: dict) -> None:
    """Maintain info["bytes"] = {dir: on-disk bytes} over the family's
    live blob dirs (+ any `<dir>-df` / `<dir>-pairs` sidecar) — the
    manifest-level size accounting the reference keeps per segment/index
    for GC reporting; index footprint becomes an O(#dirs) manifest read
    instead of a store walk."""
    from vecgo_spark.plans.manifest import fs_du, fs_exists

    sizes: dict[str, int] = {}
    for p in blob_paths(info):
        b = fs_du(os.path.join(tbl.path, p))
        for suffix in ("-df", "-pairs"):
            side = os.path.join(tbl.path, p + suffix)
            if fs_exists(side):
                b += fs_du(side)
        sizes[p] = b
    info["bytes"] = sizes


def refresh_graphs_at_rest(tbl, family: str, build_blob, max_dirs: int = 8) -> int:
    """Incremental index maintenance — the Spark-side answer to
    FreshVamana's insert path (fresh_vamana.go): segments committed AFTER
    the last build/refresh get their own blobs in a NEW versioned dir
    (existing blobs are immutable and stay where they are — no rewrite of
    already-indexed data), and the manifest's meta[family] grows its
    `paths`/`segments` lists. Readers union every listed dir, so after a
    refresh the exact-scan delta leg disappears for those segments.
    No-op (returns the current version, no manifest bump) when every
    committed segment is already indexed. Deletes still ride the
    rerank-enforced visibility pass — graph blobs never need eager
    repair, which is why compaction (not in-graph surgery) remains the
    consolidation story (SURVEY §2.9).

    Dir growth is BOUNDED (r7 verdict #5): once the family would exceed
    `max_dirs` blob dirs, the refresh FOLDS — the new dir gets the new
    segments' blobs plus a copy of every still-live stored blob (a
    parquet row copy, no graph rebuild), and `paths` collapses to the one
    folded dir; the orphaned dirs are collected by the next vacuum.  A
    tight ingest→refresh loop therefore converges to one copy-amortized
    dir instead of accumulating thousands of tiny ones."""
    return refresh_family_dirs(
        tbl, family,
        lambda new_segs, version, extra: _write_blob_dir(
            tbl, new_segs, family, version, build_blob, extra=extra),
        seg_col="seg", max_dirs=max_dirs)


def refresh_family_dirs(tbl, family: str, write_dir, seg_col: str,
                        max_dirs: int, info_update=None) -> int:
    """Shared refresh/fold core for every per-segment artifact family
    (graph blobs AND minhash signatures — refresh_graphs_at_rest's
    docstring describes the semantics): index segments missing from
    meta[family]["segments"] into a new versioned dir via
    `write_dir(new_segs, version, extra)`, folding still-live stored rows
    (filtered on `seg_col`) into it once `max_dirs` would be exceeded,
    then publish the updated manifest.  No-op when everything is
    indexed."""
    from vecgo_spark.plans.manifest import Manifest, save_manifest

    tbl._check_writable()
    info = tbl.manifest.meta.get(family)
    if info is None:
        raise KeyError(f"table has no {family} index; build it first "
                       "(refresh reuses the stored build params)")
    man = tbl.manifest
    indexed = set(info["segments"])
    new_segs = [s for s in man.segments if s.path not in indexed]
    if not new_segs:
        return man.version
    version = man.version + 1
    live = {s.path for s in man.segments}
    old_paths = blob_paths(info)
    fold = len(old_paths) + 1 > max_dirs
    extra = None
    if fold:
        live_indexed = sorted(set(info["segments"]) & live)
        stored = tbl.spark.read.parquet(
            *[os.path.join(tbl.path, p) for p in old_paths])
        extra = stored.where(F.col(seg_col).isin(live_indexed))
    rel = write_dir(new_segs, version, extra)
    new_info = dict(info)
    new_info["paths"] = [rel] if fold else old_paths + [rel]
    if fold:
        # keep "path" == paths[0] so vacuum doesn't pin the superseded
        # build dir through the legacy single-path key
        new_info["path"] = rel
    # prune segment paths that partial compaction has since replaced —
    # every consumer already intersects with the current segment set, so
    # dropping dead entries is safe, and without it the list (and every
    # manifest JSON) grows without bound under the ingest/compact/refresh
    # loop. Blob DIRS are kept even when all their segments die (a dir
    # may mix live and dead segments; full compaction drops the family
    # and resets the list anyway).
    new_info["segments"] = (
        [p for p in info["segments"] if p in live] + [s.path for s in new_segs])
    if info_update is not None:
        # family-specific meta maintenance (e.g. lexical per-segment
        # doc/length counters) — applied before the publish so it rides
        # the same manifest version
        info_update(new_info, new_segs)
    record_dir_bytes(tbl, new_info)
    new = Manifest(
        version=version, lsn=man.lsn, next_id=man.next_id,
        created_at=time.time(), segments=list(man.segments),
        tombstone_files=list(man.tombstone_files),
        meta={**man.meta, family: new_info},
        tombstone_stats=dict(man.tombstone_stats),
    )
    save_manifest(tbl.path, new)
    tbl.manifest = new
    return version


def batch_search_graphs_at_rest(
    tbl,
    family: str,
    queries: DataFrame,
    k: int,
    probe_batch_blob,
    qid_col: str = "qid",
    qvec_col: str = "qvector",
    include_pending: bool = False,
) -> DataFrame:
    """Many queries against the stored graphs in ONE blob scan — each
    stored graph is loaded once and probed for the whole broadcast query
    batch (the QPS-serving amortization: blob deserialization is per
    segment, not per query). Segments committed after the build take the
    exact broadcast-theta-join delta leg; a per-query exact rerank against
    the live snapshot enforces tombstone/upsert visibility.
    include_pending=True adds staged segments to the delta leg and
    reranks against the read-your-writes view (r12 verdict #2).
    probe_batch_blob(blob, qids, qmat, k) → [(qid, row_id, score)].
    Returns (qid, id, score, rank) with rank ≤ k per query."""
    import numpy as np
    from pyspark.sql.window import Window

    from vecgo_spark.operators import knn

    info = tbl.manifest.meta.get(family)
    if info is None:
        raise KeyError(f"table has no {family} index; build it first")
    spark = tbl.spark
    qrows = queries.select(qid_col, qvec_col).collect()
    qids = [int(r[0]) for r in qrows]
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    bq = spark.sparkContext.broadcast((qids, qmat))
    current = {s.path for s in tbl.manifest.segments}
    live_indexed = sorted(set(info["segments"]) & current)
    legs = []
    if live_indexed:
        blobs = tbl._read_parquet_cached(
            [os.path.join(tbl.path, p) for p in blob_paths(info)]
        ).where(F.col("seg").isin(live_indexed) & (F.length("blob") > 0))

        def probe(batches):
            q_ids, q_mat = bq.value
            for pdf in batches:
                rows = []
                for blob in pdf["blob"]:
                    rows.extend(probe_batch_blob(bytes(blob), q_ids, q_mat, k))
                yield pd.DataFrame(rows, columns=["qid", "id", "score"])

        legs.append(blobs.mapInPandas(probe, "qid long, id long, score double"))
    delta = [s for s in tbl.manifest.segments if s.path not in set(info["segments"])]
    if include_pending:
        delta = delta + list(tbl._pending)
    if delta:
        legs.append(
            knn.batch_search(
                tbl.df(segments=delta, include_pending=include_pending),
                queries, k=k, metric="l2",
                id_col=tbl.id_col, vector_col=tbl.vector_col,
                qid_col=qid_col, qvector_col=qvec_col,
            ).select(F.col(qid_col).alias("qid"),
                     F.col(tbl.id_col).alias("id"), "score")
        )
    if not legs:
        return spark.createDataFrame([], f"qid long, {tbl.id_col} long, score double, rank int")
    coarse = legs[0]
    for leg in legs[1:]:
        coarse = coarse.unionByName(leg)
    # exact per-query rerank against the LIVE snapshot: inner join drops
    # tombstoned rows, latest-LSN rows rescore upserts
    cand = coarse.select("qid", "id").distinct()
    qdf = queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qv"))
    exact = (
        cand.join(tbl.df(include_pending=include_pending)
                  .select(F.col(tbl.id_col).alias("id"), tbl.vector_col), "id")
        .join(F.broadcast(qdf), "qid")
        .select("qid", "id",
                knn.score_expr("l2", tbl.vector_col, F.col("_qv")).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").asc(), F.col("id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("qid", F.col("id").alias(tbl.id_col), "score", "rank")
    )


# below this estimated match fraction a filtered graph search degrades into
# post-filtering a candidate pool that mostly fails the predicate — brute
# force the (small) filtered subset instead. The reference's HNSW filtered
# search uses the same cutover (hnsw.go:1118, threshold 0.3).
FILTER_SELECTIVITY_CUTOVER = 0.3


def search_graphs_at_rest(
    tbl,
    family: str,
    query,
    k: int,
    probe_blob: Callable[[bytes, np.ndarray, int], list[tuple[int, float]]],
    filter=None,
    oversample: int = 4,
    ema=None,
    include_pending: bool = False,
) -> DataFrame:
    """Serve approximate top-k from the stored graphs + exact delta leg +
    live-snapshot rerank. probe_blob(blob, q, k) → [(row_id, score)] runs
    inside the executor task for each stored graph.

    include_pending=True is the writer's read-your-writes view (r12
    verdict #2 — the reference inserts straight into the memtable HNSW,
    engine.go:833-921): staged segments join the exact delta leg and the
    rerank resolves visibility against df(include_pending=True), so a
    staged row is findable immediately and a staged delete/upsert
    shadows its committed predecessor.

    With `filter` (a FilterSet), the strategy is selectivity-driven like
    the reference's filtered HNSW search (hnsw.go:1118): when manifest
    stats estimate fewer than FILTER_SELECTIVITY_CUTOVER of rows match,
    the filtered subset is small → exact-scan it (recall 1.0, and the
    predicate pushes down to the parquet scan); otherwise probe the graphs
    for k·oversample candidates and apply the predicate at the exact
    rerank (post-filter — most candidates survive, so recall holds).

    ema (pruning.AdaptiveSelectivity): observed-selectivity feedback
    (stats.go:205-224) min-blended into the static estimate before the
    cutover comparison — only ever LOWER, so the adaptive path can only
    FLIP toward the exact-scan branch (recall 1.0), never away from it:
    recall never drops below the static-cutover behavior. The exact
    branch feeds its own true (scanned, matched) back through a
    free-riding Observation."""
    from vecgo_spark.filters import FilterSet, to_condition
    from vecgo_spark.operators import knn
    from vecgo_spark.plans.pruning import estimate_selectivity, prune_segments

    info = tbl.manifest.meta.get(family)
    if info is None:
        raise KeyError(f"table has no {family} index; build it first")
    q = np.asarray(list(query), dtype=np.float64)
    probe_k = k
    cond = None
    if filter is not None:
        cond = to_condition(filter)
        if isinstance(filter, FilterSet):
            segs = tbl.manifest.segments
            total = sum(s.rows for s in segs) or 1
            matched = sum(estimate_selectivity(s.stats, s.rows, filter) * s.rows
                          for s in segs)
            static_sel = matched / total
            sel = static_sel
            if ema is not None:
                sel = ema.adjust(filter, sel)
            if sel < FILTER_SELECTIVITY_CUTOVER:
                # brute-force the filtered subset (predicate-aware path)
                if ema is not None:
                    # same visibility algebra as df(filter): manifest
                    # pruning first, predicate after — split so the
                    # observation sees (scanned, matched); the static
                    # estimate + cutover ride along so drain can score
                    # the pruning DECISION (PruneAccuracy weighting)
                    scan_segs = prune_segments(segs, filter)
                    if include_pending:
                        scan_segs = scan_segs + prune_segments(
                            list(tbl._pending), filter)
                    pre = tbl.df(segments=scan_segs,
                                 include_pending=include_pending)
                    base = ema.attach(pre, filter, cond,
                                      estimate=static_sel,
                                      threshold=FILTER_SELECTIVITY_CUTOVER)
                else:
                    base = tbl.df(filter, include_pending=include_pending)
                exact = base.select(
                    tbl.id_col,
                    knn.score_expr(tbl.metric, tbl.vector_col, list(q)).alias("score"))
                return (exact.orderBy(F.col("score").asc()
                                      if knn.metric_ascending(tbl.metric)
                                      else F.col("score").desc(),
                                      F.col(tbl.id_col).asc())
                        .limit(k))
        probe_k = k * max(1, oversample)
    spark = tbl.spark
    current = {s.path for s in tbl.manifest.segments}
    live_indexed = sorted(set(info["segments"]) & current)
    bq = spark.sparkContext.broadcast(q)
    legs = []
    if live_indexed:
        blobs = tbl._read_parquet_cached(
            [os.path.join(tbl.path, p) for p in blob_paths(info)]
        ).where(F.col("seg").isin(live_indexed) & (F.length("blob") > 0))

        def probe(batches):
            qv = bq.value
            for pdf in batches:
                rows = []
                for blob in pdf["blob"]:
                    rows.extend(probe_blob(bytes(blob), qv, probe_k))
                yield pd.DataFrame(rows, columns=["id", "score"])

        legs.append(blobs.mapInPandas(probe, "id long, score double")
                    .withColumnRenamed("id", tbl.id_col))
    delta = [s for s in tbl.manifest.segments if s.path not in set(info["segments"])]
    if include_pending:
        delta = delta + list(tbl._pending)
    if delta:
        ddf = tbl.df(segments=delta, include_pending=include_pending)
        if cond is not None:
            ddf = ddf.where(cond)
        legs.append(
            ddf.select(tbl.id_col,
                       knn.score_expr("l2", tbl.vector_col, list(q)).alias("score"))
            .orderBy(F.col("score").asc(), F.col(tbl.id_col).asc())
            .limit(probe_k)
        )
    if not legs:
        return tbl.spark.createDataFrame([], f"{tbl.id_col} long, score double")
    coarse = legs[0]
    for leg in legs[1:]:
        coarse = coarse.unionByName(leg)
    base = tbl.df(include_pending=include_pending)
    if cond is not None:
        if ema is not None and isinstance(filter, FilterSet):
            # post-filter branch feedback: the rerank's visibility scan
            # sees every live row anyway, so its (scanned, matched)
            # IS the true global selectivity — free-riding Observation,
            # no extra job (filters don't push through CollectMetrics)
            base = ema.attach(base, filter, cond)
        else:
            base = base.where(cond)  # post-filter at the exact rerank
    return knn.rerank(coarse, base, list(q), k=k, metric=tbl.metric,
                      id_col=tbl.id_col, vector_col=tbl.vector_col)
