"""IVF acceptance.

Strategy-equivalence (the reference's filtering_equivalence_test.go
pattern): a full-probe IVF search must return EXACTLY the brute-force
result; partial probe must clear a recall floor; filtered searches widen
the probe set and must stay consistent with exact filtered search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.filters import FilterSet
from vecgo_spark.operators import ivf, knn

N, DIM, K = 600, 32, 10


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, DIM)) * 5.0
    x = np.concatenate([centers[i % 6] + rng.standard_normal(DIM) * 0.5 for i in range(N)]).reshape(N, DIM)
    rows = [(i, x[i].astype(float).tolist(), int(i % 3)) for i in range(N)]
    df = spark.createDataFrame(rows, "id BIGINT, vector ARRAY<DOUBLE>, label INT").cache()
    df.count()
    model = ivf.train_ivf(df, "vector", nlist=6)
    assigned = ivf.assign(df, model, "vector").cache()
    assigned.count()
    return df, assigned, model, x


def test_default_nlist_heuristic():
    assert ivf.default_nlist(8192 * 4) == 4
    assert ivf.default_nlist(100) == 2  # clamp (compaction.go:136-143)


def test_fullprobe_equals_exact(clustered):
    df, assigned, model, x = clustered
    q = x[0].tolist()
    exact = knn.search(df, q, k=K, metric="l2").collect()
    got = ivf.search(assigned, model, q, k=K, nprobe=model.k).collect()
    assert [(r["id"], r["score"]) for r in got] == [(r["id"], r["score"]) for r in exact]


def test_partial_probe_recall(clustered):
    df, assigned, model, x = clustered
    recalls = []
    for qi in range(15):
        q = x[qi].tolist()
        truth = {r["id"] for r in knn.search(df, q, k=K, metric="l2").collect()}
        got = {r["id"] for r in ivf.search(assigned, model, q, k=K, nprobe=2).collect()}
        recalls.append(len(got & truth) / K)
    assert np.mean(recalls) >= 0.9, recalls


def test_filtered_probe_boost(clustered):
    df, assigned, model, x = clustered
    q = x[3].tolist()
    filt = FilterSet().eq("label", 1)
    exact = {r["id"] for r in knn.search(df, q, k=K, metric="l2", filter=filt).collect()}
    got = {r["id"] for r in ivf.search(assigned, model, q, k=K, nprobe=2, filter=filt).collect()}
    assert len(got & exact) / K >= 0.9
    labels = {
        r["label"]
        for r in ivf.search(assigned, model, q, k=K, nprobe=model.k, filter=filt)
        .join(df.select("id", "label"), "id")
        .collect()
    }
    assert labels == {1}


def test_batch_search_fullprobe_equals_exact_batch(clustered):
    df, assigned, model, x = clustered
    queries = assigned.where(F.col("id") < 4).select(
        F.col("id").alias("qid"), F.col("vector").alias("qvector")
    )
    got = {
        (r["qid"], r["rank"]): r["id"]
        for r in ivf.batch_search(assigned, model, queries, k=K, nprobe=model.k).collect()
    }
    exact = {
        (r["qid"], r["rank"]): r["id"]
        for r in knn.batch_search(df, queries, k=K, metric="l2").collect()
    }
    assert got == exact


def test_batch_search_partial_probe_recall(clustered):
    df, assigned, model, x = clustered
    queries = assigned.where(F.col("id") < 20).select(
        F.col("id").alias("qid"), F.col("vector").alias("qvector")
    )
    exact = knn.batch_search(df, queries, k=K, metric="l2").collect()
    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["id"])
    got: dict[int, set[int]] = {}
    for r in ivf.batch_search(assigned, model, queries, k=K, nprobe=2).collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    recalls = [len(got.get(q, set()) & t) / K for q, t in truth.items()]
    assert sum(recalls) / len(recalls) >= 0.9


def test_probe_expr_matches_driver_probes(clustered):
    df, assigned, model, x = clustered
    row = (
        assigned.where(F.col("id") == 5)
        .select(ivf.probe_expr(model, "vector", 3).alias("p"))
        .first()
    )
    assert row["p"] == ivf.probe_clusters(model, x[5].tolist(), 3)


def test_single_parse_exprs_same_semantics(clustered):
    """The r14 single-parse SQL fast paths of assign_expr/probe_expr
    (string column name) must be plan-identical to the Column-HOF form
    (Column input) — sameSemantics, not just value parity."""
    df, assigned, model, x = clustered
    a = df.select(ivf.assign_expr(model, "vector").alias("c"))
    b = df.select(ivf.assign_expr(model, F.col("vector")).alias("c"))
    assert a.sameSemantics(b)
    pa = df.select(ivf.probe_expr(model, "vector", 3).alias("p"))
    pb = df.select(ivf.probe_expr(model, F.col("vector"), 3).alias("p"))
    assert pa.sameSemantics(pb)


def test_assignment_is_argmin(clustered):
    df, assigned, model, x = clustered
    got = {r["id"]: r["cluster_id"] for r in assigned.select("id", "cluster_id").collect()}
    d2 = ((x[:, None, :] - model.centroids[None, :, :]) ** 2).sum(axis=2)
    expect = d2.argmin(axis=1)
    mismatch = sum(1 for i in range(N) if got[i] != expect[i])
    assert mismatch == 0


def test_ivf_pq_rerank_recall(clustered):
    """Composed IVF-PQ pipeline (probe prune -> PQ ADC coarse -> exact
    rerank) must clear a recall floor vs brute force, and the reported
    scores must be the exact rerank distances."""
    from vecgo_spark.quantization import pq as pqz

    df, assigned, model, x = clustered
    pq = pqz.train_pq(df, "vector", m=4, k=16, iters=5, max_train_rows=600)
    recalls = []
    for qi in range(5):
        q = x[qi].tolist()
        truth = knn.search(df, q, k=K, metric="l2").collect()
        truth_ids = {r["id"] for r in truth}
        pruned = assigned.where(
            F.col("cluster_id").isin(ivf.probe_clusters(model, q, 3))
        )
        enc = pqz.encode(pq, pruned, "vector")
        coarse = (
            enc.select("id", pqz.adc_score(pq, q, "pq_codes").alias("score"))
            .orderBy(F.col("score").asc(), F.col("id").asc())
            .limit(K * 5)
        )
        got = knn.rerank(coarse, df, q, k=K, metric="l2").collect()
        recalls.append(len({r["id"] for r in got} & truth_ids) / K)
        exact_by_id = {r["id"]: r["score"] for r in truth}
        for r in got:
            if r["id"] in exact_by_id:
                assert r["score"] == exact_by_id[r["id"]]
    assert np.mean(recalls) >= 0.7, recalls
