"""Quantization acceptance: the reference's recall contract
(integration_test/quantization_recall_test.go:17-100 — k=10, 500 unit
vectors ×128d, rerank on): SQ8 ≥ 0.90, INT4 ≥ 0.85, PQ ≥ 0.80,
RaBitQ ≥ 0.75. Plus encode/pack correctness vs numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vecgo_spark.functions import vector as vfn
from vecgo_spark.operators import knn
from vecgo_spark.quantization import binary as bq
from vecgo_spark.quantization import pq as pqm
from vecgo_spark.quantization import scalar as sq

N, DIM, K = 500, 128, 10


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((N, DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [(i, x[i].astype(float).tolist()) for i in range(N)]
    df = spark.createDataFrame(rows, "id BIGINT, vector ARRAY<DOUBLE>").cache()
    df.count()
    return df, x


def _exact_topk(x: np.ndarray, q: np.ndarray, k: int = K) -> set[int]:
    d = ((x - q[None, :]) ** 2).sum(axis=1)
    return set(np.argsort(d, kind="stable")[:k].tolist())


def _recall(found: list[int], truth: set[int]) -> float:
    return len(set(found) & truth) / len(truth)


def _rerank_ids(df, approx_scored, query, refine_k=K + 100):
    """Approx top-(k+100) candidates → exact rerank → final k ids — the
    reference's quantized search shape (DiskANN search list L = k+100,
    diskann/segment.go:487-560, + exact rerank search.go:913-965)."""
    cands = approx_scored.orderBy(F.col("score").asc(), F.col("id").asc()).limit(refine_k)
    return [
        r["id"]
        for r in knn.rerank(cands, df, query, K, metric="l2").collect()
    ]


def test_sq8_recall_floor(corpus):
    df, x = corpus
    params = sq.train_scalar(df, "vector", levels=255)
    enc = df.withColumn("codes", sq.encode(params, "vector")).cache()
    recalls = []
    for qi in range(20):
        q = x[qi]
        scored = enc.select("id", sq.adc_sq_l2(params, q.tolist(), "codes").alias("score"))
        ids = _rerank_ids(df, scored, q.tolist())
        recalls.append(_recall(ids, _exact_topk(x, q)))
    assert np.mean(recalls) >= 0.90, recalls


def test_int4_recall_floor(corpus):
    df, x = corpus
    params = sq.train_scalar(df, "vector", levels=15)
    enc = df.withColumn("codes", sq.encode(params, "vector")).cache()
    recalls = []
    for qi in range(20):
        q = x[qi]
        scored = enc.select("id", sq.adc_sq_l2(params, q.tolist(), "codes").alias("score"))
        ids = _rerank_ids(df, scored, q.tolist())
        recalls.append(_recall(ids, _exact_topk(x, q)))
    assert np.mean(recalls) >= 0.85, recalls


def test_pq_recall_floor(corpus):
    df, x = corpus
    pq = pqm.train_pq(df, "vector", m=16, k=256, iters=8)
    enc = pqm.encode(pq, df, "vector").cache()
    recalls = []
    for qi in range(20):
        q = x[qi]
        scored = enc.select("id", pqm.adc_score(pq, q.tolist(), "pq_codes").alias("score"))
        ids = _rerank_ids(df, scored, q.tolist())
        recalls.append(_recall(ids, _exact_topk(x, q)))
    assert np.mean(recalls) >= 0.80, recalls


def test_rabitq_recall_floor(corpus):
    df, x = corpus
    enc = df.withColumn("code", bq.pack_bits("vector", DIM)).withColumn(
        "norm", vfn.l2_norm("vector")
    ).cache()
    recalls = []
    for qi in range(20):
        q = x[qi]
        q_words = bq.pack_bits(F.array(*[F.lit(float(v)) for v in q]), DIM)
        q_norm = float(np.sqrt((q * q).sum()))
        h = bq.hamming_words("code", q_words)
        scored = enc.select(
            "id",
            bq.rabitq_l2_estimate(h, F.col("norm"), F.lit(q_norm), DIM).alias("score"),
        )
        ids = _rerank_ids(df, scored, q.tolist())
        recalls.append(_recall(ids, _exact_topk(x, q)))
    assert np.mean(recalls) >= 0.75, recalls


def test_pq_adc_udf_matches_expr(corpus):
    """The Arrow-batched ADC UDF and the pure-Column inlined-table form
    must score identically (same table, same gather)."""
    df, x = corpus
    pq = pqm.train_pq(df, "vector", m=16, k=256, iters=4)
    enc = pqm.encode(pq, df, "vector")
    q = x[3].tolist()
    rows = enc.select(
        "id",
        pqm.adc_score(pq, q, "pq_codes").alias("udf"),
        pqm.adc_score_expr(pq, q, "pq_codes").alias("expr"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["udf"] - r["expr"]) < 1e-9


def test_sq8_encode_matches_numpy(corpus):
    df, x = corpus
    params = sq.train_scalar(df, "vector", levels=255)
    got = {
        r["id"]: r["codes"]
        for r in df.withColumn("codes", sq.encode(params, "vector")).collect()
    }
    mins = np.array(params.mins)
    maxs = np.array(params.maxs)
    scale = 255.0 / (maxs - mins)
    for i in (0, 7, 499):
        expect = np.clip(np.floor((x[i] - mins) * scale + 0.5), 0, 255).astype(int)
        assert got[i] == expect.tolist()


def test_pack_bits_matches_numpy(corpus):
    df, x = corpus
    got = {r["id"]: r["w"] for r in df.select("id", bq.pack_bits("vector", DIM).alias("w")).collect()}
    for i in (0, 123):
        bits = (x[i] >= 0.0).astype(np.uint64)
        words = []
        for w in range(bq.n_words(DIM)):
            chunk = bits[w * 32 : (w + 1) * 32]
            val = 0
            for j, b in enumerate(chunk):
                val += int(b) << (31 - j)
            words.append(val)
        assert got[i] == words


def test_bq_mean_threshold_train(corpus):
    df, x = corpus
    thr = bq.train_threshold(df, "vector")
    assert abs(thr - x.mean()) < 1e-9


def test_opq_beats_or_matches_pq_distortion(corpus):
    """OPQ's learned rotation must not hurt reconstruction error
    (opq.go's whole purpose)."""
    df, x = corpus
    pq = pqm.train_pq(df, "vector", m=16, k=32, iters=6)
    opq = pqm.train_opq(df, "vector", m=16, k=32, iters=6, opq_iters=3)
    codes_pq = pqm._encode_np(x, pq.codebooks)
    err_pq = ((x - pqm._decode_np(codes_pq, pq.codebooks)) ** 2).sum()
    xr = x @ opq.rotation
    codes_opq = pqm._encode_np(xr, opq.codebooks)
    err_opq = ((xr - pqm._decode_np(codes_opq, opq.codebooks)) ** 2).sum()
    assert err_opq <= err_pq * 1.05
