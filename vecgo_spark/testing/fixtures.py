"""Deterministic synthetic fixtures per FIXTURES.md — the reference's test
corpus shapes (testutil/testutil.go generators, benchmark_test/README.md
distributions), seed=42 (testutil.NewRNG(42)).

T1 `vectors_<dist>_<dim>d_<n>`: the canonical record
(id, vector, category, price, score_i, tags, flag, ts, payload, text,
missing_field) with the reference's edge-case rows injected
(integration_test/edge_case_test.go:14-64): the zero vector, duplicate
vectors with distinct ids, an all-null-metadata row.

Distributions (benchmark_test/README.md:31-39):
  uniform    iid U[0,1) dims, uniform categories
  zipfian    Zipf(s=1.2) category buckets, vectors clustered per bucket
  seglocal   a globally-rare category dominant within one file
  correlated filter bucket correlated with vector cluster
  booladv    adversarial boolean/bucket combinations

Written with pyarrow (vectors as float32 lists) so Spark and DuckDB read
identical bits.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = [f"w{i:03d}" for i in range(1000)]
TAG_POOL = [f"tag{i}" for i in range(20)]
CATEGORIES = ["A", "B", "C", "D"]


def _zipf_probs(n: int, s: float = 1.2) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


def _vectors(rng: np.random.Generator, dist: str, n: int, dim: int, buckets: np.ndarray):
    if dist == "uniform":
        return rng.random((n, dim), dtype=np.float64).astype(np.float32)
    # clustered per bucket (ClusteredVectorsWithBuckets, testutil.go:281-306)
    k = int(buckets.max()) + 1
    centers = rng.random((k, dim)) * 2.0
    v = centers[buckets] + rng.normal(0, 0.1, (n, dim))
    return v.astype(np.float32)


def _buckets(rng: np.random.Generator, dist: str, n: int) -> np.ndarray:
    if dist == "uniform":
        return rng.integers(0, 4, n)
    if dist == "zipfian":
        return rng.choice(4, size=n, p=_zipf_probs(4))
    if dist == "seglocal":
        # rare category (D overall ~1%) dominant in the last quarter of rows
        b = rng.choice(4, size=n, p=[0.40, 0.39, 0.20, 0.01])
        tail = slice(3 * n // 4, None)
        mask = rng.random(n - 3 * n // 4) < 0.8
        seg = b[tail].copy()
        seg[mask] = 3
        b[tail] = seg
        return b
    if dist == "correlated":
        return rng.integers(0, 4, n)  # bucket == vector cluster by construction
    if dist == "booladv":
        return rng.integers(0, 4, n)
    raise ValueError(dist)


def make_t1(
    out_path: str, dist: str = "uniform", n: int = 1000, dim: int = 8, n_files: int = 1
) -> str:
    rng = np.random.default_rng(SEED)
    buckets = _buckets(rng, dist, n)
    vec = _vectors(rng, dist, n, dim, buckets)
    ids = np.arange(1, n + 1, dtype=np.int64)
    category = np.array(CATEGORIES, dtype=object)[buckets]
    price = rng.random(n) * 100.0
    score_i = rng.integers(0, 1000, n)
    flag = rng.random(n) < 0.5
    if dist == "booladv":
        # adversarial: flag perfectly correlated with bucket parity
        flag = buckets % 2 == 0
    ts = 1_700_000_000_000 + np.arange(n, dtype=np.int64) * 1000
    n_tags = rng.integers(0, 4, n)
    tags = [list(rng.choice(TAG_POOL, size=int(t), replace=False)) for t in n_tags]
    zipf_p = _zipf_probs(len(VOCAB))
    n_words = rng.integers(5, 16, n)
    text = [" ".join(rng.choice(VOCAB, size=int(w), p=zipf_p)) for w in n_words]
    missing = rng.random(n) * 10.0
    miss_mask = rng.random(n) < 0.3
    payload = [json.dumps({"desc": f"{c}-{i}"}).encode() for c, i in zip(category, ids)]

    # edge-case rows (edge_case_test.go:14-64): zero vector, duplicate
    # vectors with distinct ids, all-null metadata row
    vec[0] = 0.0
    if n >= 3:
        vec[2] = vec[1]
    null_md_row = 3 if n >= 4 else None

    cols = {
        "id": pa.array(ids),
        "vector": pa.array([v.tolist() for v in vec], type=pa.list_(pa.float32())),
        "category": pa.array(
            [None if i == null_md_row else c for i, c in enumerate(category)]
        ),
        "price": pa.array(
            [None if i == null_md_row else float(p) for i, p in enumerate(price)]
        ),
        "score_i": pa.array(
            [None if i == null_md_row else int(s) for i, s in enumerate(score_i)]
        ),
        "tags": pa.array(
            [None if i == null_md_row else t for i, t in enumerate(tags)],
            type=pa.list_(pa.string()),
        ),
        "flag": pa.array(
            [None if i == null_md_row else bool(f) for i, f in enumerate(flag)]
        ),
        "ts": pa.array(ts),
        "payload": pa.array(payload, type=pa.binary()),
        "text": pa.array(text),
        "missing_field": pa.array(
            [None if (m or i == null_md_row) else float(x)
             for i, (m, x) in enumerate(zip(miss_mask, missing))]
        ),
    }
    table = pa.table(cols)
    os.makedirs(out_path, exist_ok=True)
    if n_files == 1:
        pq.write_table(table, os.path.join(out_path, "part-000.parquet"))
    else:
        # seglocal needs file-local skew → slice into row-order files
        step = (n + n_files - 1) // n_files
        for f in range(n_files):
            pq.write_table(
                table.slice(f * step, step), os.path.join(out_path, f"part-{f:03d}.parquet")
            )
    return out_path


def make_t2(out_path: str, dim: int = 8, n_queries: int = 100) -> str:
    """Query workload (T2): qid, qvector, qtext, k, sel_filter."""
    rng = np.random.default_rng(SEED + 1)
    filters = [
        "none",
        "category='A'",
        "price>50",
        "price<1",
        "category='B' AND price<20",
        "score_i IN (1,2,3,500,999)",
    ]
    qv = rng.random((n_queries, dim)).astype(np.float32)
    # 20 unit-norm queries for recall tests (quantization_recall_test.go:93-96)
    qv[:20] /= np.linalg.norm(qv[:20], axis=1, keepdims=True)
    zipf_p = _zipf_probs(len(VOCAB))
    qtext = [" ".join(rng.choice(VOCAB, size=int(rng.integers(2, 6)), p=zipf_p))
             for _ in range(n_queries)]
    table = pa.table(
        {
            "qid": pa.array(np.arange(1, n_queries + 1, dtype=np.int64)),
            "qvector": pa.array([v.tolist() for v in qv], type=pa.list_(pa.float32())),
            "qtext": pa.array(qtext),
            "k": pa.array(np.full(n_queries, 10, dtype=np.int32)),
            "sel_filter": pa.array([filters[i % len(filters)] for i in range(n_queries)]),
        }
    )
    os.makedirs(out_path, exist_ok=True)
    pq.write_table(table, os.path.join(out_path, "part-000.parquet"))
    return out_path


def make_t3(out_path: str, n: int = 1000, frac: float = 0.1) -> str:
    """Tombstones (T3): 10% random sample of T1 ids, lsn in assignment order."""
    rng = np.random.default_rng(SEED + 2)
    ids = rng.choice(np.arange(1, n + 1), size=int(n * frac), replace=False)
    table = pa.table(
        {
            "id": pa.array(ids.astype(np.int64)),
            "lsn": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64)),
        }
    )
    os.makedirs(out_path, exist_ok=True)
    pq.write_table(table, os.path.join(out_path, "part-000.parquet"))
    return out_path
