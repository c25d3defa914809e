"""LSH-bucketed approximate nearest neighbor — the data-independent
alternative to IVF (random-hyperplane signed projections; the brief's
"IVF or LSH-bucketed variant" scale path).

Bucket id = the packed sign bits of ⟨r_i, v⟩ over L random hyperplanes —
cosine-similar vectors collide with probability 1 − θ/π per bit. Search
probes the query's bucket plus all buckets within Hamming distance
`multiprobe` (compensates boundary effects), then scores exactly.

Scale shape: assignment is a pure Column expression (L·d fused ops/row,
no training pass at all — unlike IVF there is no k-means job); the bucket
column is a perfect partitioning/clustering key at rest, so a probe is a
partition-pruned scan. State is an L×d float matrix from a seeded RNG —
reproducible anywhere, nothing to persist."""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from itertools import combinations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vecgo_spark.functions import vector as vfn

from vecgo_spark.operators import knn


@dataclass
class LSHPlanes:
    planes: np.ndarray  # L × d
    metric: str = "cosine"

    @property
    def n_planes(self) -> int:
        return self.planes.shape[0]


def make_planes(dim: int, n_planes: int = 12, seed: int = 42, metric: str = "cosine") -> LSHPlanes:
    if n_planes > 30:
        raise ValueError("n_planes must fit an INT bucket id (<= 30)")
    rng = np.random.default_rng(seed)
    return LSHPlanes(planes=rng.standard_normal((n_planes, dim)), metric=metric)


def bucket_expr(model: LSHPlanes, vector_col: Column | str) -> Column:
    """INT bucket id: bit i (MSB-first) set iff ⟨plane_i, v⟩ > 0.

    Built as ONE parsed SQL string when the input is a column name
    (r14, `sameSemantics`-proven vs the Column-op loop it replaces):
    the per-plane zip_with/aggregate Column construction cost ~10 py4j
    round-trips per plane per query build."""
    if isinstance(vector_col, str):
        from vecgo_spark.functions.vector import _dlit_sql

        v = f"CAST(`{vector_col}` AS ARRAY<DOUBLE>)"
        parts = ["0"]
        for i, plane in enumerate(model.planes):
            arr = "array(" + ",".join(_dlit_sql(float(x)) for x in plane) + ")"
            d = (f"aggregate(zip_with({v}, {arr}, (x, y) -> x * y), "
                 f"0.0D, (acc, x) -> acc + x)")
            w = 1 << (model.n_planes - 1 - i)
            parts.append(f"CASE WHEN {d} > 0.0D THEN {w} ELSE 0 END")
        return F.expr("CAST((" + " + ".join(parts) + ") AS INT)")
    v = vector_col.cast("array<double>")
    out = F.lit(0)
    for i, plane in enumerate(model.planes):
        lit_p = vfn.double_array_expr(plane)
        d = F.aggregate(
            F.zip_with(v, lit_p, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        weight = 1 << (model.n_planes - 1 - i)
        out = out + F.when(d > 0.0, F.lit(weight)).otherwise(F.lit(0))
    return out.cast("int")


def assign(df: DataFrame, model: LSHPlanes, vector_col: str = "vector",
           bucket_col: str = "lsh_bucket") -> DataFrame:
    return df.withColumn(bucket_col, bucket_expr(model, vector_col))


def query_bucket(model: LSHPlanes, query: Sequence[float]) -> int:
    q = np.asarray(query, dtype=np.float64)
    bits = (model.planes @ q) > 0.0
    return int(sum(1 << (model.n_planes - 1 - i) for i, b in enumerate(bits) if b))


def probe_buckets(model: LSHPlanes, query: Sequence[float], multiprobe: int = 1) -> list[int]:
    """The query's bucket plus every bucket within Hamming distance
    `multiprobe` (Σ C(L,i) buckets — enumerated driver-side, tiny)."""
    base = query_bucket(model, query)
    out = [base]
    for dist in range(1, max(0, multiprobe) + 1):
        for flips in combinations(range(model.n_planes), dist):
            m = 0
            for i in flips:
                m |= 1 << (model.n_planes - 1 - i)
            out.append(base ^ m)
    return out


def bucket_sql(model: LSHPlanes, vcol: str) -> str:
    """DuckDB mirror of bucket_expr: per-plane signed projection with the
    identical sequential x·y fold; same MSB-first bit weights. The planes
    come from a seeded RNG, so the oracle generator reconstructs them
    bit-identically with make_planes(same seed)."""
    from vecgo_spark.oracles import double_list_sql

    terms = []
    for i, plane in enumerate(model.planes):
        d = (
            f"list_sum(list_transform(list_zip({vcol}::DOUBLE[], "
            f"{double_list_sql(plane)}), x -> x[1]*x[2]))"
        )
        weight = 1 << (model.n_planes - 1 - i)
        terms.append(f"CASE WHEN {d} > 0.0 THEN {weight} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def search(
    df_assigned: DataFrame,
    model: LSHPlanes,
    query: Sequence[float],
    k: int = 10,
    multiprobe: int = 1,
    filter=None,
    id_col: str = "id",
    vector_col: str = "vector",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    probes = probe_buckets(model, query, multiprobe)
    # one parsed IN list (r14): multiprobe=2 over 10 planes is 56
    # bucket ids — per-element isin literals cost ~0.5 ms each
    from vecgo_spark.operators.util import isin_longs

    pruned = df_assigned.where(isin_longs(bucket_col, probes))
    return knn.search(pruned, list(query), k=k, metric=model.metric, filter=filter,
                      id_col=id_col, vector_col=vector_col)
