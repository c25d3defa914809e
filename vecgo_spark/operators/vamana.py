"""Per-segment Vamana (DiskANN-flavored) at-rest graph index.

The reference's disk-resident ANN segment builds a single-layer Vamana
graph (internal/segment/diskann/writer.go:390-460 buildGraph): medoid
entry point (closest row to the centroid, writer.go:395-406), random
R-regular initialization (writer.go:416-429), then TWO passes — α=1.0
first, α=1.2 second (writer.go:431-436) — where each node greedy-searches
from the medoid with beam L (writer.go:447 greedySearch), replaces its
out-edges via robustPrune (writer.go:450, 571-625: closest-first, keep c
only while α·d(c, kept) ≥ d(c, node)), and pushes back-edges that
re-prune on overflow (writer.go:452-455, 627-643 addBackEdge). Search
greedy-beams from the medoid (segment.go:487-560).

That ALGORITHM is re-expressed here in numpy with original structure —
nothing is translated from the Go — and packaged the Spark-first way
shared with the HNSW family (operators/graph_at_rest.py): one graph per
committed segment built inside applyInPandas, persisted as a versioned
.npz blob under _index/vamana-v*/, served with a small blob scan +
mapInPandas beam, an exact delta leg for post-build segments, and a
live-snapshot rerank that enforces tombstone/upsert visibility.

Build vectorization: node→corpus distances come from block gemms (the
whole segment matrix is known up front, so each block of nodes gets its
distance rows in one matmul — the same trick as HNSWGraph.add_batch);
the greedy beam then reads distances by fancy index, and robustPrune
computes its candidate-pairwise matrix with a single gemm per call.
"""

from __future__ import annotations

import io

import numpy as np
from pyspark.sql import DataFrame

from vecgo_spark.operators.graph_at_rest import adaptive_block

_GRAPH_FORMAT = 1  # bump on any layout change; loaders reject unknown versions


class VamanaGraph:
    """Single-layer Vamana graph over a FIXED vector set (the per-segment
    build knows every row up front — mirroring the reference's segment
    writer, which also builds over a complete batch)."""

    def __init__(self, vecs: np.ndarray, r: int = 32, l: int = 64,
                 alpha: float = 1.2, seed: int = 0):
        self.mat = np.ascontiguousarray(vecs, dtype=np.float64)
        self.n = self.mat.shape[0]
        self.r = r
        self.l = l
        self.alpha = alpha
        self._rng = np.random.default_rng(seed)
        self.links: list[list[int]] = [[] for _ in range(self.n)]
        # medoid entry point: row closest to the centroid (writer.go:395)
        if self.n:
            c = self.mat.mean(axis=0)
            d = self.mat - c
            self.entry = int(np.argmin(np.einsum("ij,ij->i", d, d)))
        else:
            self.entry = -1
        self._sq = np.einsum("ij,ij->i", self.mat, self.mat) if self.n else None
        # stamped visited scratch (one allocation per graph)
        self._stamps = np.zeros(max(1, self.n), dtype=np.int64)
        self._stamp = 0
        self._drow: np.ndarray | None = None  # build-time distance row
        # set by the PQ-blob loader: n×m uint8 codes (serve via search_adc)
        self.codes: np.ndarray | None = None

    # ------------------------------------------------------------ distances

    def _dists_from(self, i: int, idx) -> np.ndarray:
        """Squared L2 from node i to the given node indexes (gram form —
        one gemv against precomputed norms)."""
        idx = np.asarray(idx, dtype=np.int64)
        d = self._sq[idx] + self._sq[i] - 2.0 * (self.mat[idx] @ self.mat[i])
        return np.maximum(d, 0.0)

    # ------------------------------------------------------------- search

    def search_adc(self, table: np.ndarray, k: int, l: int | None = None
                   ) -> list[tuple[float, int]]:
        """Beam search with PQ asymmetric distances — the reference
        DiskANN's serving mode (quantized in-memory distance, exact
        rerank downstream; compression.go + segment.go:487-560). `table`
        is the per-query m×k ADC lookup (quantization.pq.adc_table);
        node distances gather from self.codes, so the probe never needs
        the full vectors."""
        assert self.codes is not None, "graph carries no PQ codes"
        cols = np.arange(table.shape[0])
        codes = self.codes

        def dfn(idx):
            return table[cols, codes[np.asarray(idx, dtype=np.int64)]].sum(axis=1)

        return self._beam(None, max(l or self.l, k), dists_fn=dfn)[:k]

    def _beam(self, q: np.ndarray | None, ef: int, dists_fn=None
              ) -> list[tuple[float, int]]:
        """Greedy beam from the medoid: expand the closest unexpanded of
        the ef best until none remains (greedySearch semantics,
        writer.go:330-389) — implemented with the min-heap/max-heap pair
        rather than the reference's sort-per-iteration."""
        import heapq

        if self.codes is not None and dists_fn is None:
            # PQ-restored graph: self.mat is a zeros placeholder, so the
            # full-vector distance path would return meaningless scores.
            # Miswired callers must fail loudly — route through
            # search_adc (which supplies dists_fn) instead.
            raise RuntimeError(
                "graph was restored from a PQ blob (no full vectors); "
                "use search_adc with an ADC table, not search()")
        if self.entry < 0:
            return []
        self._stamp += 1
        stamp = self._stamp
        stamps = self._stamps
        drow = self._drow
        mat = self.mat
        e = self.entry
        stamps[e] = stamp
        if dists_fn is not None:
            d0 = float(dists_fn([e])[0])
        elif drow is not None:
            d0 = float(drow[e])
        else:
            diff = mat[e] - q
            d0 = float(diff @ diff)
        cand = [(d0, e)]
        best = [(-d0, e)]
        links = self.links
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbrs = [n for n in links[c] if stamps[n] != stamp]
            if not nbrs:
                continue
            for n in nbrs:
                stamps[n] = stamp
            if dists_fn is not None:
                dists = dists_fn(nbrs)
            elif drow is not None:
                dists = drow[nbrs]
            else:
                d2 = mat[nbrs] - q
                dists = np.einsum("ij,ij->i", d2, d2)
            for dn, n in zip(dists, nbrs):
                dn = float(dn)
                if len(best) < ef:
                    heapq.heappush(cand, (dn, n))
                    heapq.heappush(best, (-dn, n))
                elif dn < -best[0][0]:
                    heapq.heappush(cand, (dn, n))
                    heapq.heapreplace(best, (-dn, n))
        return sorted((-nd, n) for nd, n in best)

    def search(self, q: np.ndarray, k: int, l: int | None = None
               ) -> list[tuple[float, int]]:
        q = np.asarray(q, dtype=np.float64)
        return self._beam(q, max(l or self.l, k))[:k]

    # -------------------------------------------------------------- build

    def _robust_prune(self, node: int, cand_ids: set[int], alpha: float,
                      d_node) -> list[int]:
        """robustPrune (writer.go:571-625): candidates ∪ current neighbors
        minus self, closest-first; keep c only while α·d(c, kept) ≥
        d(c, node) for every kept neighbor; stop at R. d_node(idx) returns
        node→idx distances (the build passes the precomputed row).
        Vectorized: one candidate-pairwise gemm + a running min that
        tracks min over kept of d(c, kept)·α vs d(c, node)."""
        ids = sorted((cand_ids | set(self.links[node])) - {node})
        if not ids:
            return []
        idx = np.asarray(ids, dtype=np.int64)
        dn = d_node(idx)
        order = np.argsort(dn, kind="stable")
        P = self.mat[idx]
        sq = self._sq[idx]
        D = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (P @ P.T), 0.0)
        kept: list[int] = []
        amin = None  # running min over kept of α·D[:, kept_pos]
        for pos in order:
            if kept and amin[pos] < dn[pos]:
                continue
            kept.append(int(pos))
            if len(kept) >= self.r:
                break
            col = alpha * D[:, pos]
            amin = col if amin is None else np.minimum(amin, col)
        return [ids[p] for p in kept]

    def _add_back_edge(self, src: int, dst: int, alpha: float) -> None:
        """addBackEdge (writer.go:627-643): append, re-prune on overflow
        treating the current adjacency as the candidate set. The overflow
        slack (prune only past r + r/2, down to r) batches ~3× fewer
        prune calls than the reference's prune-at-r+1 without changing
        the invariant — adjacency never exceeds 1.5R during build and
        ends ≤ R after each node's own robustPrune pass."""
        if dst in self.links[src]:
            return
        self.links[src].append(dst)
        if len(self.links[src]) > self.r + self.r // 2:
            self.links[src] = self._robust_prune(
                src, set(self.links[src]), alpha,
                lambda idx: self._dists_from(src, idx))

    def build(self, block: int | None = None) -> None:
        """Random R-regular init, then two robustPrune passes (α=1.0 then
        α=self.alpha — writer.go:416-457). Per block of nodes, ONE gemm
        yields every node→corpus distance row, so the beam and the prune
        read distances by index."""
        n = self.n
        if n == 0:
            return
        for i in range(n):
            if n > 1:
                others = self._rng.permutation(n - 1)[: self.r]
                self.links[i] = [int(o) if o < i else int(o) + 1 for o in others]
        for alpha in (1.0, self.alpha):
            s = 0
            while s < n:
                b = block or adaptive_block(n)
                hi = min(s + b, n)
                blk = self.mat[s:hi]
                bsq = self._sq[s:hi]
                D = np.maximum(
                    self._sq[None, :] + bsq[:, None] - 2.0 * (blk @ self.mat.T), 0.0)
                for i in range(s, hi):
                    row = D[i - s]
                    self._drow = row
                    try:
                        found = self._beam(self.mat[i], self.l)
                    finally:
                        self._drow = None
                    cand = {node for _, node in found}
                    self.links[i] = self._robust_prune(
                        i, cand, alpha, lambda idx: row[idx])
                    for nb in self.links[i]:
                        self._add_back_edge(nb, i, alpha)
                s = hi
        # the back-edge slack can leave up to 1.5R links on nodes whose
        # last event was an overflow-free append; restore the reference's
        # ≤R degree invariant with one final prune sweep
        for i in range(n):
            if len(self.links[i]) > self.r:
                self.links[i] = self._robust_prune(
                    i, set(self.links[i]), self.alpha,
                    lambda idx: self._dists_from(i, idx))


# --------------------------------------------------------------- blobs

def graph_blob(graph: VamanaGraph, ids: list[int], pq=None) -> bytes:
    """Explicit versioned compressed .npz snapshot (flat arrays, CSR
    adjacency; deflate — the reference LZ4-compresses its graph blobs,
    compression.go, and np.load reads plain npz from older dirs too) —
    the same no-pickle stance as the HNSW family. With `pq` (PQCodebooks) the
    blob stores m uint8 codes per node PLUS the codebooks INSTEAD of the
    full vectors — the reference DiskANN's compressed-in-memory layout
    (compression.go): ~d·8/m × smaller, served via ADC + exact rerank."""
    flat: list[int] = []
    offsets = [0]
    for node in range(graph.n):
        flat.extend(graph.links[node])
        offsets.append(len(flat))
    payload: dict[str, np.ndarray] = {}
    if pq is not None:
        from vecgo_spark.quantization.pq import _encode_np, _rotate_np

        x = graph.mat
        if pq.rotation is not None:
            x = _rotate_np(x, pq.rotation)
        payload["codes"] = _encode_np(x, pq.codebooks).astype(np.uint8)
        payload["books"] = np.ascontiguousarray(pq.codebooks, dtype=np.float64)
        if pq.rotation is not None:
            payload["rotation"] = np.ascontiguousarray(pq.rotation, dtype=np.float64)
    else:
        payload["mat"] = graph.mat
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        format=np.int64(_GRAPH_FORMAT),
        ids=np.asarray(ids, dtype=np.int64),
        link_offsets=np.asarray(offsets, dtype=np.int64),
        link_data=np.asarray(flat, dtype=np.int32),
        entry=np.int64(graph.entry),
        r=np.int64(graph.r),
        l=np.int64(graph.l),
        **payload,
    )
    return buf.getvalue()


def graph_from_blob(blob: bytes):
    """→ (graph, ids, pq | None). A full-vector blob restores the exact
    geometry; a PQ blob restores a codes-only graph (serve with
    search_adc) plus its PQCodebooks."""
    from vecgo_spark.quantization.pq import PQCodebooks

    if not blob.startswith(b"PK"):
        raise ValueError("unrecognized vamana graph blob (legacy format?) — "
                         "rebuild the index with vamana.build_at_rest")
    with np.load(io.BytesIO(blob), allow_pickle=False) as d:
        fmt = int(d["format"])
        if fmt != _GRAPH_FORMAT:
            raise ValueError(f"unsupported vamana graph format v{fmt} "
                             f"(reader supports v{_GRAPH_FORMAT})")
        offsets = d["link_offsets"]
        flat = d["link_data"]
        entry = int(d["entry"])
        r, l = int(d["r"]), int(d["l"])
        ids = [int(x) for x in d["ids"]]
        pq = None
        if "codes" in d.files:
            codes = np.asarray(d["codes"], dtype=np.int64)
            pq = PQCodebooks(
                codebooks=np.asarray(d["books"], dtype=np.float64),
                rotation=(np.asarray(d["rotation"], dtype=np.float64)
                          if "rotation" in d.files else None),
            )
            mat = np.zeros((codes.shape[0], 1))  # placeholder; never scored
        else:
            codes = None
            mat = np.asarray(d["mat"], dtype=np.float64)
    g = VamanaGraph(mat, r=r, l=l)
    g.links = [[int(x) for x in flat[int(offsets[i]):int(offsets[i + 1])]]
               for i in range(mat.shape[0])]
    g.entry = entry
    g.codes = codes
    return g, ids, pq


# -------------------------------------------------------------- at rest

def _probe_one(g: VamanaGraph, pq, qv, k: int, l_search: int):
    """One query against one stored graph: exact beam on full-vector
    blobs, ADC beam with 4× candidate oversampling on PQ blobs (the
    reference's RefineFactor stance — quantized coarse scores need a
    wider pool for the exact rerank to recover recall)."""
    if pq is None:
        return g.search(qv, k, l=l_search)
    from vecgo_spark.quantization.pq import adc_table

    table = np.asarray(adc_table(pq, list(qv)), dtype=np.float64)
    return g.search_adc(table, 4 * k, l=max(l_search, 4 * k))

def build_at_rest(tbl, r: int = 32, l: int = 64, alpha: float = 1.2,
                  pq=None) -> int:
    """Persist per-SEGMENT Vamana graphs into the table layout (the
    reference writes one DiskANN graph per segment file — writer.go
    Flush); build / delta-leg / rerank mechanics in graph_at_rest.py.
    With `pq` (PQCodebooks, broadcast to the builders) the stored blobs
    carry PQ codes instead of full vectors — the reference DiskANN's
    compressed serving layout; probes score ADC and the exact rerank
    recovers precision. Graph CONSTRUCTION always uses full vectors (the
    reference also builds on full precision). Returns the new manifest
    version."""
    from vecgo_spark.operators.graph_at_rest import build_graphs_at_rest

    return build_graphs_at_rest(
        tbl, "vamana",
        {"r": r, "l": l, "alpha": alpha, "pq": pq is not None},
        _make_build_blob(tbl, r, l, alpha, pq))


def _make_build_blob(tbl, r: int, l: int, alpha: float, pq):
    """One blob-builder shared by build and refresh — a drifted copy
    would make refreshed blobs silently diverge from built ones."""
    bpq = tbl.spark.sparkContext.broadcast(pq) if pq is not None else None

    def build_blob(ids, block):
        g = VamanaGraph(block, r=r, l=l, alpha=alpha)
        g.build()
        return graph_blob(g, ids, pq=bpq.value if bpq is not None else None)

    return build_blob


def refresh_at_rest(tbl, pq=None, max_dirs: int = 8) -> int:
    """Incremental Vamana maintenance — the Spark mapping of FreshVamana's
    insert path (fresh_vamana.go): new segments get their own graphs,
    existing blobs are immutable, deletes ride the rerank visibility pass
    (no in-graph consolidation — compaction rewrites instead). Reuses the
    STORED r/l/alpha; a PQ-coded index must be refreshed with the SAME
    codebooks it was built with (pass pq=) or the new blobs would score
    a different codebook than the old ones."""
    from vecgo_spark.operators.graph_at_rest import refresh_graphs_at_rest

    info = tbl.manifest.meta.get("vamana")
    if info is None:
        raise KeyError("table has no vamana index; build it first")
    if bool(info.get("pq")) != (pq is not None):
        raise ValueError("refresh must match the stored layout: pass pq= "
                         "iff the index was built with PQ codes")
    return refresh_graphs_at_rest(
        tbl, "vamana",
        _make_build_blob(tbl, int(info["r"]), int(info["l"]),
                         float(info["alpha"]), pq),
        max_dirs=max_dirs)


def batch_search_at_rest(tbl, queries: DataFrame, k: int = 10,
                         l_search: int = 64, qid_col: str = "qid",
                         qvec_col: str = "qvector",
                         include_pending: bool = False) -> DataFrame:
    """Batch QPS serving from the stored Vamana graphs — one blob load
    per segment for the whole broadcast query batch."""
    from vecgo_spark.operators.graph_at_rest import batch_search_graphs_at_rest

    def probe_batch(blob, qids, qmat, kk):
        g, ids, pq = graph_from_blob(blob)
        out = []
        for qid, qv in zip(qids, qmat):
            for d, node in _probe_one(g, pq, qv, kk, l_search):
                out.append((qid, ids[node], float(d)))
        return out

    return batch_search_graphs_at_rest(tbl, "vamana", queries, k, probe_batch,
                                       qid_col=qid_col, qvec_col=qvec_col,
                                       include_pending=include_pending)


def search_at_rest(tbl, query, k: int = 10, l_search: int = 64,
                   filter=None, ema=None,
                   include_pending: bool = False) -> DataFrame:
    """Approximate top-k from the stored Vamana graphs + exact delta leg +
    live-snapshot rerank (graph_at_rest.py; search semantics
    segment.go:487-560). `filter` takes the selectivity-driven
    predicate-aware vs post-filter strategy shared with the HNSW
    family."""
    from vecgo_spark.operators.graph_at_rest import search_graphs_at_rest

    def probe_blob(blob, qv, kk):
        g, ids, pq = graph_from_blob(blob)
        return [(ids[node], float(d))
                for d, node in _probe_one(g, pq, qv, kk, l_search)]

    return search_graphs_at_rest(tbl, "vamana", query, k, probe_blob,
                                 filter=filter, ema=ema,
                                 include_pending=include_pending)
