"""IVF (inverted-file) approximate nearest neighbor — the scale path.

Reference: flat segments optionally carry k-means partitions; search probes
the NProbes nearest centroids instead of scanning everything
(/root/reference/internal/segment/flat/segment.go:447-753, probe selection
at 727-745; k = rows/8192 heuristic internal/engine/compaction.go:136-143;
WithNProbes internal/engine/options.go:30-35).

Spark design:
  * TRAIN with MLlib KMeans (distributed — survives 100 TB; the model is
    k×d doubles on the driver).
  * ASSIGN with a pure Column expression: argmin over the centroid literal
    array (k·d fused multiply-adds per row inside codegen — no UDT
    round-trip, no Python). Materialize `cluster_id` once, ideally
    partitionBy(cluster_id) at rest so probing prunes parquet files.
  * SEARCH: nearest-nprobe centroids picked driver-side (numpy over k×d),
    then `WHERE cluster_id IN probes` — partition pruning — and the exact
    top-k machinery from operators.knn on the survivors.
  * Filtered queries probe MORE clusters (boost), replacing the
    reference's 0.30 selectivity-cutoff pre/post-filter switch
    (internal/engine/search.go:295-302) — in an exact-scoring engine a
    filter only *shrinks* candidates, so recall protection = wider probe.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vecgo_spark import cache_stats
from vecgo_spark.filters import FilterSet
from vecgo_spark.functions.vector import double_matrix_expr
from vecgo_spark.operators import knn


@dataclass
class IVFModel:
    centroids: np.ndarray  # k × d (float64)
    metric: str = "l2"

    @property
    def k(self) -> int:
        return self.centroids.shape[0]


def default_nlist(n_rows: int) -> int:
    """k = rows/8192, min 2 (compaction.go:136-143)."""
    return max(2, n_rows // 8192)


# trained-index artifact cache: the reference trains IVF partitions at
# segment build (compaction.go:102-152), NOT per query — a cache_key gives
# query paths the same amortization (one model per corpus per session)
_MODEL_CACHE: dict[str, "IVFModel"] = {}
MODEL_CACHE_CAP = 128  # oldest-first eviction; see train_ivf


def train_ivf(
    df: DataFrame,
    vector_col: str = "vector",
    nlist: int | None = None,
    metric: str = "l2",
    seed: int = 42,
    max_iter: int = 20,
    cache_key: str | None = None,
    trainer: str = "mllib",
    max_train_rows: int = 100_000,
    order_col: str | None = None,
    scope: str | None = None,
) -> IVFModel:
    """trainer="mllib": distributed KMeans over the full corpus (the
    100 TB path). trainer="driver": numpy Lloyd's on a bounded sample in
    the driver — the reference's own stance (kmeans.go runs in-process on
    the segment being built); one collect job instead of ~max_iter
    distributed rounds, right when the corpus or sample is small.

    `scope` (a table path) attributes the cache lookup to that table's
    CacheStats ledger (r12 verdict #6) — table-driven callers
    (compact(cluster_by=), quantize paths) pass their path so
    table_cache_stats() covers this cache too; free-standing corpora
    keep the global-only accounting."""
    if cache_key is not None:
        # hyperparameters ride the key — a reused key with different
        # settings must never serve the first call's centroids
        cache_key = (f"{cache_key}|ivf:k{nlist}:m{metric}:s{seed}:i{max_iter}"
                     f":t{trainer}:n{max_train_rows}:o{order_col}")
        cache_stats.record("ivf_model", cache_key in _MODEL_CACHE,
                           scope=scope)
        if cache_key in _MODEL_CACHE:
            return _MODEL_CACHE[cache_key]
    if nlist is None:
        nlist = default_nlist(df.count())
    if trainer == "driver":
        from vecgo_spark.quantization.pq import _lloyd, _sample_vectors

        x = _sample_vectors(df, vector_col, max_train_rows, order_col=order_col)
        cents = _lloyd(x, nlist, iters=max_iter, rng=np.random.default_rng(seed))
        out = IVFModel(centroids=cents, metric=metric)
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.select(array_to_vector(F.col(vector_col).cast("array<double>")).alias("features"))
        model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(feats)
        out = IVFModel(centroids=np.array(model.clusterCenters(), dtype=np.float64), metric=metric)
    if cache_key is not None:
        # bounded: snapshot-keyed table entries (compact retrains per
        # committed version) would otherwise accumulate one model per
        # compaction across a long ingest loop; centroids are small but
        # the registry itself must not grow without bound
        while len(_MODEL_CACHE) >= MODEL_CACHE_CAP:
            _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
        _MODEL_CACHE[cache_key] = out
    return out


def _cents_sql(model: IVFModel) -> str:
    """The k×d centroid table as ONE SQL ARRAY<ARRAY<DOUBLE>> literal
    (IEEE shortest-round-trip doubles — parses bit-identical to the
    F.lit form; see functions.vector.double_array_expr)."""
    from vecgo_spark.functions.vector import _dmatrix_sql

    return _dmatrix_sql(model.centroids)


def _plain_ident(name: str) -> bool:
    """True when `name` is a plain identifier the single-parse SQL fast
    path can backtick-quote safely. A name with a dot would change
    meaning (F.col("a.b") resolves a nested field; `a.b` a literal
    top-level column) and an embedded backtick breaks the parse — those
    fall through to the Column-tree form (r14 ADVICE)."""
    return name.isidentifier()


def assign_expr(model: IVFModel, vector_col: Column | str) -> Column:
    """cluster_id = argmin_c ||v - centroid_c||² as a native expression.

    Ties break to the lowest cluster id (array_position finds the first
    match) — deterministic, mirroring the reference's sequential argmin.

    r14: for a plain column NAME the whole argmin is ONE parsed SQL
    string (sameSemantics-proven equal to the Column-HOF form, pinned in
    test_ivf) — the HOF/lambda Column construction cost ~15 py4j round
    trips plus a schema re-analysis of the k×d literal per build
    (cProfile: 0.25-0.31 s of every IVF-family query build). Column
    inputs — and names that are not plain identifiers (dots resolve
    differently under backticks, embedded backticks break the parse) —
    keep the tree form."""
    if isinstance(vector_col, str) and not _plain_ident(vector_col):
        vector_col = F.col(vector_col)
    if isinstance(vector_col, str):
        cents = _cents_sql(model)
        v = f"CAST(`{vector_col}` AS ARRAY<DOUBLE>)"
        dists = (f"transform({cents}, c -> aggregate("
                 f"zip_with({v}, c, (x, y) -> (x - y) * (x - y)), "
                 f"0.0D, (acc, x) -> acc + x))")
        return F.expr(
            f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)")
    v = vector_col.cast("array<double>")
    cents = double_matrix_expr(model.centroids)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def assign(df: DataFrame, model: IVFModel, vector_col: str = "vector",
           cluster_col: str = "cluster_id") -> DataFrame:
    return df.withColumn(cluster_col, assign_expr(model, vector_col))


def probe_clusters(model: IVFModel, query: Sequence[float], nprobe: int) -> list[int]:
    """nprobe nearest centroids to the query (driver-side numpy; the probe
    list is O(k) — flat/segment.go:727-745). Ordered nearest-first, the
    reference's early-termination segment ordering (stats.go:643-677)."""
    q = np.asarray(query, dtype=np.float64)
    d2 = ((model.centroids - q[None, :]) ** 2).sum(axis=1)
    order = np.argsort(d2, kind="stable")
    return [int(c) for c in order[: max(1, nprobe)]]


def probe_expr(model: IVFModel, qvector_col: Column | str, nprobe: int) -> Column:
    """ARRAY<INT> of the nprobe nearest cluster ids for a query VECTOR
    COLUMN — fully native (distances to centroid literals → array_sort of
    (dist, cid) structs → slice). Lets probe selection run for millions of
    queries without a driver round-trip.

    r14: plain column names take the single-parse SQL path like
    assign_expr (sameSemantics-proven, pinned in test_ivf); non-plain
    names (dots/backticks) fall through to the Column form."""
    if isinstance(qvector_col, str) and not _plain_ident(qvector_col):
        qvector_col = F.col(qvector_col)
    if isinstance(qvector_col, str):
        cents = _cents_sql(model)
        v = f"CAST(`{qvector_col}` AS ARRAY<DOUBLE>)"
        scored = (f"transform({cents}, (c, i) -> named_struct("
                  f"'d', aggregate(zip_with({v}, c, (x, y) -> (x - y) * (x - y)), "
                  f"0.0D, (acc, x) -> acc + x), "
                  f"'cid', CAST(i AS INT)))")
        return F.expr(
            f"transform(slice(array_sort({scored}), 1, {max(1, int(nprobe))}), "
            f"s -> s.cid)")
    v = qvector_col.cast("array<double>")
    cents = double_matrix_expr(model.centroids)
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.cast("int").alias("cid"),
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, max(1, nprobe)), lambda s: s["cid"]
    )


# ---------------------------------------------------------------- oracles


def centroids_literal_sql(model: IVFModel) -> str:
    """k×d nested DOUBLE literal (e-notation — parses as DOUBLE, exact)."""
    from vecgo_spark.oracles import double_list2_sql

    return double_list2_sql(model.centroids)


def assign_sql(model: IVFModel, vcol: str, cents_ref: str | None = None) -> str:
    """DuckDB mirror of assign_expr: argmin over centroid literals with the
    identical sequential (x−y)² fold, first-min tiebreak — bit-exact, so
    Spark and the oracle put every row in the same cluster."""
    cl = cents_ref or centroids_literal_sql(model)
    dists = (
        f"list_transform({cl}, c -> "
        f"list_sum(list_transform(list_zip({vcol}::DOUBLE[], c), "
        f"x -> (x[1]-x[2])*(x[1]-x[2]))))"
    )
    return f"(list_position({dists}, list_min({dists})) - 1)"


def probe_list_sql(model: IVFModel, qcol: str, nprobe: int, cents_ref: str | None = None) -> str:
    """DuckDB mirror of probe_expr: per-centroid distance structs (same
    fold), list_sort (lexicographic (d, cid) — Spark array_sort semantics),
    slice nprobe, project cid."""
    cl = cents_ref or centroids_literal_sql(model)
    scored = (
        f"list_transform(range(1, {model.k + 1}), i -> "
        f"{{'d': list_sum(list_transform(list_zip({qcol}::DOUBLE[], {cl}[i]), "
        f"x -> (x[1]-x[2])*(x[1]-x[2]))), 'cid': i-1}})"
    )
    return (
        f"list_transform(list_slice(list_sort({scored}), 1, {max(1, nprobe)}), "
        f"s -> s.cid)"
    )


def batch_search(
    df_assigned: DataFrame,
    model: IVFModel,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "id",
    vector_col: str = "vector",
    cluster_col: str = "cluster_id",
    qid_col: str = "qid",
    qvector_col: str = "qvector",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Many-query IVF: probe clusters per query natively, explode to
    (qid, cluster_id), EQUI-join the assigned corpus on cluster_id, exact
    score, per-query top-k window.

    Scale shape: the corpus side never materializes a cross product — the
    join key is cluster_id, so a small query set broadcasts (corpus never
    shuffles) and a huge one co-partitions both sides by cluster. This is
    the distributed analog of BatchSearch (engine.go:1305-1376) fused with
    the flat-segment probe (flat/segment.go:727-745)."""
    from vecgo_spark.operators.knn import score_expr, metric_ascending

    probed = queries.select(
        F.col(qid_col),
        F.col(qvector_col),
        F.explode(probe_expr(model, qvector_col, nprobe)).alias(cluster_col),
    )
    if broadcast_queries:
        probed = F.broadcast(probed)
    joined = df_assigned.join(probed, cluster_col)
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col),
        score_expr(model.metric, vector_col, F.col(qvector_col)).alias("score"),
    )
    asc = metric_ascending(model.metric)
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    w = Window.partitionBy(qid_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def search(
    df_assigned: DataFrame,
    model: IVFModel,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 1,
    filter: FilterSet | None = None,
    filtered_probe_boost: int = 2,
    selectivity: float | None = None,
    ema=None,
    id_col: str = "id",
    vector_col: str = "vector",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Probe-then-exact-score top-k. With a filter the probe set widens to
    protect recall — the translation of the reference's pre/post-filter
    strategy (selectivity cutoff 0.30, search.go:295-302) plus its
    sparse-filter brute-force shortcut (hnsw.go:1701-1725):

      selectivity < 2%   → probe EVERY cluster (the pushed filter leaves
                           so few rows that exact scan of survivors is
                           cheapest — recall 1.0, like the bitmap shortcut)
      selectivity ≤ 30%  → widen probes ×filtered_probe_boost
      selectivity > 30%  → no boost (enough matches inside nearest probes)

    Pass `selectivity` from plans.pruning.estimate_selectivity (manifest
    histograms); None falls back to the static boost.

    ema (pruning.AdaptiveSelectivity): the reference's observed-
    selectivity feedback (stats.go:205-224) — the static estimate is
    min-blended with the per-field-set EMA (only ever MORE selective ⇒
    the probe set only ever WIDENS vs the static tiers, so recall never
    drops below the static-cutoff behavior), and this query's own action
    reports its true (scanned, matched) back through a free-riding
    Observation. ANDed correlated predicates are the payoff: histogram
    independence OVERestimates their match fraction, the EMA observes
    the truth and widens what static would have kept narrow."""
    static_sel = selectivity
    if filter is not None and ema is not None and selectivity is not None:
        selectivity = ema.adjust(filter, selectivity)
    if filter is None:
        effective = nprobe
    elif selectivity is None:
        effective = nprobe * filtered_probe_boost
    elif selectivity < 0.02:
        effective = model.k
    elif selectivity <= 0.30:
        effective = nprobe * filtered_probe_boost
    else:
        effective = nprobe
    probes = probe_clusters(model, query, effective)
    pruned = df_assigned.where(F.col(cluster_col).isin(probes))
    if filter is not None and ema is not None:
        from vecgo_spark.filters import to_condition

        # observation rides the probed pre-filter scan; rows reach
        # knn.search already filtered, so the predicate is not re-applied.
        # PruneAccuracy scoring (estimate/threshold) is passed ONLY when
        # the scan is global (effective == model.k, the full-probe tier):
        # a probe-restricted observation measures P(filter | probed
        # clusters), and scoring a GLOBAL static estimate against a
        # CONDITIONED fraction would systematically penalize an accurate
        # estimator whenever the filter correlates with the clustering
        # (r11 review; the reference scores like-for-like,
        # stats.go:210-214). The EMA itself still drains either way —
        # min-blending a conditioned fraction only ever widens probes.
        global_scan = effective >= model.k
        pruned = ema.attach(
            pruned, filter, to_condition(filter),
            estimate=static_sel if global_scan else None,
            threshold=0.02 if global_scan else None)
        filter = None
    return knn.search(
        pruned, list(query), k=k, metric=model.metric, filter=filter,
        id_col=id_col, vector_col=vector_col,
    )
