"""Deterministic trained-index artifacts for oracle-checked ANN queries.

The driver compares every Spark query against DuckDB SQL. For trained
indexes (IVF centroids, PQ/OPQ codebooks) the oracle SQL must embed the
SAME model the Spark query used — so training must be a pure function of
(table, params):

  * the training sample is the first `max_rows` rows ORDER BY id — the
    Spark path collects it with orderBy(id).limit(n) (a
    TakeOrderedAndProject), this module reads the same parquet with
    pyarrow sorted by the same column; both widen float32→float64 exactly,
    so the two sample matrices are bit-identical (asserted in
    tests/test_oracle_parity.py);
  * the trainers (quantization.pq.train_pq_np / train_opq_np,
    operators.ivf via the same Lloyd's) are seeded numpy — identical
    input ⇒ identical model.

oracle_sql() receives no sf_dir from the driver contract; the driver runs
the comparison at sf=0.01 (TESTDATA.md), so the default points there.
Harnesses that verify other scale factors set $SPARK_GRAFT_ORACLE_SF_DIR.

Reference parity: the reference trains its quantizers/partitions on the
segment being built, in-process (internal/engine/compaction.go:102-152,
internal/quantization/pq.go:68-145) — bounded-sample driver-side training
is the same stance; the distributed MLlib trainer in operators.ivf remains
the 100 TB path.
"""

from __future__ import annotations

import os

import numpy as np

ORACLE_SF_ENV = "SPARK_GRAFT_ORACLE_SF_DIR"
DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    return os.environ.get(ORACLE_SF_ENV, DEFAULT_SF_DIR)


_SAMPLE_CACHE: dict[tuple, np.ndarray] = {}
_MODEL_CACHE: dict[tuple, object] = {}


def training_sample(
    sf_dir: str,
    table: str = "embeddings",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 20_000,
) -> np.ndarray:
    """First max_rows vectors ORDER BY id, float64 — the oracle-side twin
    of pq._sample_vectors(df, col, n, order_col=id)."""
    key = (sf_dir, table, vector_col, max_rows)
    if key not in _SAMPLE_CACHE:
        import pyarrow.parquet as papq

        t = papq.read_table(
            os.path.join(sf_dir, f"{table}.parquet"), columns=[id_col, vector_col]
        ).sort_by(id_col)
        vecs = t.column(vector_col).to_pylist()[:max_rows]
        _SAMPLE_CACHE[key] = np.array(vecs, dtype=np.float64)
    return _SAMPLE_CACHE[key]


def query_vector(sf_dir: str, vec_id: int = 0, table: str = "embeddings",
                 vector_col: str = "embedding", id_col: str = "vec_id") -> list[float]:
    """The query vector as the oracle generator sees it (same float32→
    float64 widening as a Spark collect of the row). The predicate is
    passed to the parquet reader (row-group statistics pruning), so a
    1-row lookup reads one row group, not the table."""
    import pyarrow.parquet as papq

    t = papq.read_table(
        os.path.join(sf_dir, f"{table}.parquet"), columns=[vector_col],
        filters=[(id_col, "==", vec_id)],
    )
    return [float(x) for x in t.column(vector_col).to_pylist()[0]]


def ivf_model(sf_dir: str, nlist: int = 8, max_iter: int = 10, seed: int = 42,
              max_rows: int = 20_000):
    """IVFModel trained on the deterministic sample (same Lloyd's the Spark
    trainer runs with trainer="driver", order_col=id)."""
    key = ("ivf", sf_dir, nlist, max_iter, seed, max_rows)
    if key not in _MODEL_CACHE:
        from vecgo_spark.operators.ivf import IVFModel
        from vecgo_spark.quantization.pq import _lloyd

        x = training_sample(sf_dir, max_rows=max_rows)
        cents = _lloyd(x, nlist, iters=max_iter, rng=np.random.default_rng(seed))
        _MODEL_CACHE[key] = IVFModel(centroids=cents, metric="l2")
    return _MODEL_CACHE[key]


def pq_books(sf_dir: str, m: int = 8, k: int = 256, iters: int = 8, seed: int = 42,
             max_rows: int = 20_000):
    key = ("pq", sf_dir, m, k, iters, seed, max_rows)
    if key not in _MODEL_CACHE:
        from vecgo_spark.quantization.pq import train_pq_np

        x = training_sample(sf_dir, max_rows=max_rows)
        _MODEL_CACHE[key] = train_pq_np(x, m=m, k=k, iters=iters, seed=seed)
    return _MODEL_CACHE[key]


def opq_books(sf_dir: str, m: int = 8, k: int = 256, iters: int = 6, opq_iters: int = 3,
              seed: int = 42, max_rows: int = 20_000):
    key = ("opq", sf_dir, m, k, iters, opq_iters, seed, max_rows)
    if key not in _MODEL_CACHE:
        from vecgo_spark.quantization.pq import train_opq_np

        x = training_sample(sf_dir, max_rows=max_rows)
        _MODEL_CACHE[key] = train_opq_np(x, m=m, k=k, iters=iters,
                                         opq_iters=opq_iters, seed=seed)
    return _MODEL_CACHE[key]
