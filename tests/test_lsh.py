"""Random-hyperplane LSH ANN: bucket assignment parity with numpy,
multiprobe recall on clustered data, monotone recall in probe radius."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import knn, lsh

N, DIM, K = 600, 16, 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((5, DIM)) * 3.0
    x = np.stack([centers[i % 5] + rng.standard_normal(DIM) * 0.4 for i in range(N)])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(N)], "id BIGINT, vector ARRAY<DOUBLE>"
    )
    model = lsh.make_planes(DIM, n_planes=10, metric="cosine")
    assigned = lsh.assign(df, model, "vector").cache()
    assigned.count()
    return df, assigned, model, x


def test_bucket_assignment_matches_numpy(corpus):
    df, assigned, model, x = corpus
    got = {r["id"]: r["lsh_bucket"] for r in assigned.collect()}
    for i in (0, 99, 599):
        assert got[i] == lsh.query_bucket(model, x[i])


def test_probe_buckets_hamming_ring(corpus):
    _, _, model, x = corpus
    p0 = lsh.probe_buckets(model, x[0], multiprobe=0)
    p1 = lsh.probe_buckets(model, x[0], multiprobe=1)
    assert len(p0) == 1
    assert len(p1) == 1 + model.n_planes
    base = p0[0]
    for b in p1[1:]:
        assert bin(base ^ b).count("1") == 1


def test_multiprobe_recall(corpus):
    df, assigned, model, x = corpus
    recalls = {0: [], 2: []}
    for qi in range(12):
        q = x[qi].tolist()
        truth = {r["id"] for r in knn.search(df, q, k=K, metric="cosine").collect()}
        for mp in recalls:
            got = {r["id"] for r in lsh.search(assigned, model, q, k=K, multiprobe=mp).collect()}
            recalls[mp].append(len(got & truth) / K)
    assert np.mean(recalls[2]) >= np.mean(recalls[0]) - 1e-9  # monotone in radius
    assert np.mean(recalls[2]) >= 0.7, recalls


def test_same_seed_same_planes():
    a = lsh.make_planes(8, 6, seed=7)
    b = lsh.make_planes(8, 6, seed=7)
    np.testing.assert_array_equal(a.planes, b.planes)
