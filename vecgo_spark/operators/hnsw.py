"""Per-partition HNSW — the SURVEY §7.3 stretch item.

The reference's primary in-memory ANN structure is an HNSW graph
(internal/index/hnsw/hnsw.go: hierarchical layers, M bidirectional
links, efConstruction/efSearch beam search). A literal port is the
wrong shape for Spark — one global mutable graph cannot live across
executors — so this module re-expresses it the Spark-first way:

  * the CORPUS stays distributed; each partition builds its OWN small
    HNSW over its rows inside one `mapInPandas` pass (numpy kernels,
    Arrow-batched — no row-at-a-time Python),
  * the QUERY BATCH is broadcast (bounded, like knn.batch_search),
    searched against every partition graph, and each partition emits at
    most k candidates per query,
  * a per-query top-k window merges the bounded candidate stream —
    the same global-merge shape as ivf.batch_search.

Because every partition is searched (with an approximate beam), recall
loss comes only from the graph search itself, not from routing — the
complementary trade to IVF (exact scoring, approximate routing). Build
cost is amortized over the whole query batch, which is where the graph
wins: Q queries pay ONE build per partition. A one-off single query
should use knn.search (exact) or the IVF at-rest layout instead.

Scale posture: no driver collect of corpus data; partition graphs are
built and dropped inside the task (nothing persisted — the at-rest
serving path remains IVF + quantized codes); candidate volume is
bounded by partitions × queries × k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class HNSWGraph:
    """Minimal, honest HNSW (hnsw.go semantics): geometric level
    assignment, greedy descent through upper layers, ef beam search at
    each level, bidirectional links pruned to M (2M at level 0)."""

    def __init__(self, dim: int, m: int = 8, ef_construction: int = 64,
                 seed: int = 0):
        self.dim = dim
        self.m = m
        self.ef_construction = ef_construction
        self._ml = 1.0 / np.log(m)
        self._rng = np.random.default_rng(seed)
        # vectors live in one growing matrix: _dist fancy-indexes rows
        # instead of stacking python lists per beam expansion
        self._mat = np.empty((0, dim), dtype=np.float64)
        self._n = 0
        self.levels: list[int] = []
        # links[node][level] -> list[int]
        self.links: list[list[list[int]]] = []
        self.entry: int | None = None

    @property
    def vecs(self):
        return self._mat[: self._n]

    def _append_vec(self, vec: np.ndarray) -> None:
        if self._n == self._mat.shape[0]:
            grown = np.empty((max(64, self._mat.shape[0] * 2), self.dim))
            grown[: self._n] = self._mat[: self._n]
            self._mat = grown
        self._mat[self._n] = vec
        self._n += 1

    # ---------------------------------------------------------- internals
    def _dist(self, q: np.ndarray, idx: list[int]) -> np.ndarray:
        d = self._mat[idx] - q
        return np.einsum("ij,ij->i", d, d)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int
                      ) -> list[tuple[float, int]]:
        """Classic ef beam: returns up to ef (dist, node) sorted asc.
        cand is a min-heap, best a negated max-heap capped at ef —
        O(log ef) per admitted candidate, not a re-sort per pop."""
        import heapq

        visited = {entry}
        d0 = float(self._dist(q, [entry])[0])
        cand = [(d0, entry)]           # min-heap on distance
        best = [(-d0, entry)]          # max-heap (negated): worst of the ef best
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbrs = [n for n in self.links[c][level] if n not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            dists = self._dist(q, nbrs)
            for dn, n in zip(dists, nbrs):
                dn = float(dn)
                if len(best) < ef:
                    heapq.heappush(cand, (dn, n))
                    heapq.heappush(best, (-dn, n))
                elif dn < -best[0][0]:
                    heapq.heappush(cand, (dn, n))
                    heapq.heapreplace(best, (-dn, n))
        return sorted((-nd, n) for nd, n in best)

    def _select_neighbors(self, q: np.ndarray, cand: list[tuple[float, int]],
                          cap: int) -> list[int]:
        """selectNeighborsHeuristic (hnsw.go): closest-first, keep e only
        when e is closer to q than to every already-kept neighbor — the
        diversity rule that keeps the graph navigable (naive closest-prune
        disconnects clusters); remaining slots refill with the closest
        rejected candidates (keepPruned)."""
        out: list[tuple[float, int]] = []
        for d, e in sorted(cand):
            if out:
                # one vectorized distance call against ALL kept neighbors
                sel = [s for _, s in out]
                if float(self._dist(self._mat[e], sel).min()) < d:
                    continue
            out.append((d, e))
            if len(out) >= cap:
                break
        if len(out) < cap:
            chosen = {s for _, s in out}
            for d, e in sorted(cand):
                if e not in chosen:
                    out.append((d, e))
                    chosen.add(e)
                    if len(out) >= cap:
                        break
        return [e for _, e in out]

    def add(self, vec: np.ndarray) -> None:
        node = self._n
        lvl = int(-np.log(self._rng.uniform(1e-12, 1.0)) * self._ml)
        self._append_vec(vec)
        self.levels.append(lvl)
        self.links.append([[] for _ in range(lvl + 1)])
        if self.entry is None:
            self.entry = node
            return
        ep = self.entry
        top = self.levels[self.entry]
        # greedy descent above the insertion level
        for level in range(top, lvl, -1):
            if level <= self.levels[ep]:
                ep = self._search_layer(vec, ep, 1, level)[0][1]
        # beam-connect at each level from min(top, lvl) down to 0
        for level in range(min(top, lvl), -1, -1):
            found = self._search_layer(vec, ep, self.ef_construction, level)
            ep = found[0][1]
            cap = self.m * 2 if level == 0 else self.m
            chosen = self._select_neighbors(vec, found, self.m)
            self.links[node][level] = list(chosen)
            for n in chosen:
                nl = self.links[n][level]
                nl.append(node)
                if len(nl) > cap:
                    dd = self._dist(self.vecs[n], nl)
                    self.links[n][level] = self._select_neighbors(
                        self.vecs[n], list(zip(map(float, dd), nl)), cap)
        if lvl > self.levels[self.entry]:
            self.entry = node

    def search(self, q: np.ndarray, k: int, ef_search: int = 64
               ) -> list[tuple[float, int]]:
        if self.entry is None:
            return []
        ep = self.entry
        for level in range(self.levels[self.entry], 0, -1):
            ep = self._search_layer(q, ep, 1, level)[0][1]
        best = self._search_layer(q, ep, max(ef_search, k), 0)
        return best[:k]


def batch_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvector",
) -> DataFrame:
    """(qid, vec_id, score, rank): approximate squared-L2 top-k per query
    via per-partition HNSW graphs. The query batch is collected and
    broadcast (bounded — same stance as knn.batch_search); corpus rows
    never leave their partitions until the k-candidate emit."""
    qrows = queries.select(qid_col, qvec_col).collect()
    qids = [int(r[0]) for r in qrows]
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((qids, qmat))
    # graph construction is the serial per-partition cost — spread a
    # narrow input so builds run in parallel (util.ensure_parallelism)
    from vecgo_spark.operators.util import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    out_schema = "qid long, " + f"{id_col} long, score double"

    def part(batches):
        ids: list[int] = []
        graph: HNSWGraph | None = None
        for pdf in batches:
            for rid, vec in zip(pdf[id_col], pdf[vector_col]):
                v = np.asarray(vec, dtype=np.float64)
                if graph is None:
                    graph = HNSWGraph(v.shape[0], m=m,
                                      ef_construction=ef_construction)
                graph.add(v)
                ids.append(int(rid))
        if graph is None:
            return
        q_ids, q_mat = bq.value
        rows = []
        for qid, q in zip(q_ids, q_mat):
            for d, node in graph.search(q, k, ef_search=ef_search):
                rows.append((qid, ids[node], float(d)))
        yield pd.DataFrame(rows, columns=["qid", id_col, "score"])

    cand = corpus.select(id_col, vector_col).mapInPandas(part, out_schema)
    w = Window.partitionBy("qid").orderBy(F.col("score").asc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "score", "rank")
    )


# ------------------------------------------------------------- at rest

_GRAPH_FORMAT = 1  # bump on any layout change; loaders reject unknown versions


def _graph_blob(graph: HNSWGraph, ids: list[int]) -> bytes:
    """Explicit versioned snapshot encoding (the reference snapshots its
    graph with a versioned binary format rather than language-native
    serialization): numpy .npz of flat arrays — vectors, per-node levels,
    and the adjacency lists flattened CSR-style (node-major, level-minor).
    No pickle: the blob is data, never code, so a tampered table layout
    cannot execute anything at load, and the format survives Python/numpy
    upgrades."""
    import io

    n = len(graph.levels)
    flat: list[int] = []
    offsets = [0]
    for node in range(n):
        for level in range(graph.levels[node] + 1):
            flat.extend(graph.links[node][level])
            offsets.append(len(flat))
    buf = io.BytesIO()
    np.savez(
        buf,
        format=np.int64(_GRAPH_FORMAT),
        ids=np.asarray(ids, dtype=np.int64),
        mat=np.ascontiguousarray(graph.vecs, dtype=np.float64),
        levels=np.asarray(graph.levels, dtype=np.int32),
        link_offsets=np.asarray(offsets, dtype=np.int64),
        link_data=np.asarray(flat, dtype=np.int32),
        entry=np.int64(-1 if graph.entry is None else graph.entry),
    )
    return buf.getvalue()


def _graph_from_blob(blob: bytes) -> tuple["HNSWGraph", list[int]]:
    import io

    with np.load(io.BytesIO(blob), allow_pickle=False) as d:
        fmt = int(d["format"])
        if fmt != _GRAPH_FORMAT:
            raise ValueError(f"unsupported hnsw graph format v{fmt} "
                             f"(reader supports v{_GRAPH_FORMAT})")
        mat = np.asarray(d["mat"], dtype=np.float64)
        levels = [int(x) for x in d["levels"]]
        offsets = d["link_offsets"]
        flat = d["link_data"]
        entry = int(d["entry"])
        ids = [int(x) for x in d["ids"]]
    links: list[list[list[int]]] = []
    li = 0
    for node in range(len(levels)):
        per_node = []
        for _level in range(levels[node] + 1):
            lo, hi = int(offsets[li]), int(offsets[li + 1])
            per_node.append([int(x) for x in flat[lo:hi]])
            li += 1
        links.append(per_node)
    g = HNSWGraph(mat.shape[1] if mat.size else 1)
    g._mat = mat
    g._n = mat.shape[0]
    g.levels = levels
    g.links = links
    g.entry = None if entry < 0 else entry
    return g, ids


def build_at_rest(tbl, m: int = 8, ef_construction: int = 64) -> int:
    """Persist per-SEGMENT HNSW graphs into the table layout — the
    reference snapshots its HNSW graph to disk and reloads it
    (internal/index/hnsw + the engine's snapshot persistence); here each
    committed segment gets its own graph, built in parallel executor
    tasks (one applyInPandas group per segment, rows sorted by id for a
    deterministic build) and stored as a versioned .npz blob under
    _index/hnsw-v*/. The manifest's next version records the artifact
    dir, the graph params and the EXACT segment list indexed — so
    search_at_rest() can serve indexed segments from their graphs and
    fall back to an exact scan for segments committed after the build
    (the delta leg). Returns the new manifest version."""
    import os as _os
    import time as _time

    from vecgo_spark.plans.manifest import Manifest, save_manifest
    from vecgo_spark.plans.table import INDEX_DIR

    tbl._check_writable()
    if tbl.metric != "l2":
        # the stored graphs beam-search squared-L2 geometry; serving a
        # dot/cosine table from them would pool the WRONG candidates
        # (rerank cannot repair a candidate set that never contained the
        # high-similarity rows) — fail loudly instead
        raise ValueError(
            f"HNSW at-rest index supports metric='l2' tables, got {tbl.metric!r}")
    man = tbl.manifest
    segs = man.segments
    if not segs:
        raise ValueError("nothing to index: table has no committed segments")
    id_col, vector_col = tbl.id_col, tbl.vector_col
    seg_expr = None
    for s in segs:
        # the trailing "/" anchors the match at a path-component boundary:
        # cluster dirs _part=1 and _part=10 are substring-ambiguous without it
        cond = F.input_file_name().contains(s.path.rstrip("/") + "/")
        seg_expr = (F.when(cond, F.lit(s.path)) if seg_expr is None
                    else seg_expr.when(cond, F.lit(s.path)))
    raw = (
        tbl._segment_df(segs)
        .where(F.col(vector_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
        .withColumn("_seg", seg_expr)
    )

    def build(key, pdf):
        pdf = pdf.sort_values("id")
        graph: HNSWGraph | None = None
        ids: list[int] = []
        for rid, vec in zip(pdf["id"], pdf["v"]):
            vv = np.asarray(vec, dtype=np.float64)
            if graph is None:
                graph = HNSWGraph(vv.shape[0], m=m,
                                  ef_construction=ef_construction)
            graph.add(vv)
            ids.append(int(rid))
        blob = _graph_blob(graph, ids) if graph is not None else b""
        return pd.DataFrame({"seg": [key[0]], "blob": [blob]})

    version = man.version + 1
    rel = _os.path.join(INDEX_DIR, f"hnsw-v{version:08d}")
    (
        raw.groupBy("_seg").applyInPandas(build, "seg string, blob binary")
        .write.mode("error").parquet(_os.path.join(tbl.path, rel))
    )
    new = Manifest(
        version=version, lsn=man.lsn, next_id=man.next_id,
        created_at=_time.time(), segments=list(segs),
        tombstone_files=list(man.tombstone_files),
        meta={**man.meta,
              "hnsw": {"path": rel, "m": m, "ef_construction": ef_construction,
                       "segments": [s.path for s in segs]}},
    )
    save_manifest(tbl.path, new)
    tbl.manifest = new
    return version


def search_at_rest(tbl, query, k: int = 10, ef_search: int = 64) -> DataFrame:
    """Approximate top-k served from the STORED graphs: probed segments
    load their stored graph (small blob scan, one mapInPandas), beam
    search emits k candidates per graph; segments committed AFTER the
    build take the exact-scan delta leg; the union exact-reranks against
    the live snapshot — which also enforces tombstone/upsert visibility
    for rows deleted or rewritten since the graphs were built."""
    import os as _os

    from vecgo_spark.operators import knn

    info = tbl.manifest.meta.get("hnsw")
    if info is None:
        raise KeyError("table has no HNSW index; run hnsw.build_at_rest first")
    q = np.asarray(list(query), dtype=np.float64)
    spark = tbl.spark
    current = {s.path for s in tbl.manifest.segments}
    live_indexed = sorted(set(info["segments"]) & current)
    bq = spark.sparkContext.broadcast(q)
    legs = []
    if live_indexed:
        blobs = spark.read.parquet(_os.path.join(tbl.path, info["path"])).where(
            F.col("seg").isin(live_indexed) & (F.length("blob") > 0)
        )

        def probe(batches):
            qv = bq.value
            for pdf in batches:
                rows = []
                for blob in pdf["blob"]:
                    g, ids = _graph_from_blob(bytes(blob))
                    for d, node in g.search(qv, k, ef_search=ef_search):
                        rows.append((ids[node], float(d)))
                yield pd.DataFrame(rows, columns=["id", "score"])

        legs.append(blobs.mapInPandas(probe, f"id long, score double")
                    .withColumnRenamed("id", tbl.id_col))
    delta = [s for s in tbl.manifest.segments if s.path not in set(info["segments"])]
    if delta:
        ddf = tbl.df(segments=delta)
        legs.append(
            ddf.select(tbl.id_col,
                       knn.score_expr("l2", tbl.vector_col, list(q)).alias("score"))
            .orderBy(F.col("score").asc(), F.col(tbl.id_col).asc())
            .limit(k)
        )
    if not legs:
        return tbl.spark.createDataFrame([], f"{tbl.id_col} long, score double")
    coarse = legs[0]
    for leg in legs[1:]:
        coarse = coarse.unionByName(leg)
    return knn.rerank(coarse, tbl.df(), list(q), k=k, metric=tbl.metric,
                      id_col=tbl.id_col, vector_col=tbl.vector_col)
