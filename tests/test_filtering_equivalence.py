"""The reference's signature correctness suite
(internal/engine/filtering_equivalence_test.go): filtered kNN must return
EXACTLY the brute-force result — here across every fixture distribution
(FIXTURES.md T1), every T2 filter shape, and all three metrics, compared
against a DuckDB oracle over the same parquet bits. Edge-case rows (zero
vector, duplicate vectors, all-null metadata) ride in every corpus."""

from __future__ import annotations

import duckdb
import pytest

from vecgo_spark.filters import FilterSet
from vecgo_spark.operators import knn
from vecgo_spark.oracles import cosine_sql, dot_sql, sq_l2_sql
from vecgo_spark.testing import fixtures
from tests.oracle_harness import compare

DISTS = ["uniform", "zipfian", "seglocal", "correlated", "booladv"]

FILTERS: dict[str, tuple[FilterSet | None, str]] = {
    "none": (None, "TRUE"),
    "cat_a": (FilterSet().eq("category", "A"),
              "category IS NOT NULL AND category = 'A'"),
    "price_gt50": (FilterSet().gt("price", 50),
                   "price IS NOT NULL AND price > 50"),
    "price_lt1": (FilterSet().lt("price", 1),
                  "price IS NOT NULL AND price < 1"),
    "cat_b_and_price_lt20": (FilterSet().eq("category", "B").lt("price", 20),
                             "category IS NOT NULL AND category = 'B' "
                             "AND price IS NOT NULL AND price < 20"),
    "score_in": (FilterSet().isin("score_i", [1, 2, 3, 500, 999]),
                 "score_i IS NOT NULL AND score_i IN (1,2,3,500,999)"),
    "missing_gt": (FilterSet().gt("missing_field", 5),
                   "missing_field IS NOT NULL AND missing_field > 5"),
    # ne on a missing field must NOT match (metadata/filter.go:9-19)
    "missing_ne": (FilterSet().ne("missing_field", 1.5),
                   "missing_field IS NOT NULL AND missing_field != 1.5"),
    # Int(5)==Float(5.0) cross-type equality (metadata/filter.go:141-147)
    "int_float_eq": (FilterSet().eq("score_i", 500.0),
                     "score_i IS NOT NULL AND score_i = 500.0"),
}

METRICS = {
    "l2": ("ASC", sq_l2_sql),
    "dot": ("DESC", dot_sql),
    "cosine": ("DESC", cosine_sql),
}


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_corpora")
    out = {}
    for dist in DISTS:
        path = fixtures.make_t1(
            str(root / dist), dist=dist, n=1000, dim=8,
            n_files=4 if dist == "seglocal" else 1,
        )
        df = spark.read.parquet(path).cache()
        df.count()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t1 AS SELECT * FROM '{path}/*.parquet'")
        out[dist] = (df, con)
    return out


@pytest.mark.parametrize("dist", DISTS)
@pytest.mark.parametrize("fname", list(FILTERS))
def test_filtered_knn_matches_oracle(corpora, dist, fname):
    df, con = corpora[dist]
    fs, where = FILTERS[fname]
    q = [0.5] * 8
    got = knn.search(df, q, k=10, metric="l2", filter=fs)
    qlit = "[" + ",".join(repr(float(x)) for x in q) + "]::DOUBLE[]"
    score = sq_l2_sql("t1.vector", qlit)
    sql = f"""
        SELECT id, {score} AS score FROM t1
        WHERE {where}
        ORDER BY score ASC, id ASC LIMIT 10
    """
    ok, msg = compare(got, sql, con)
    assert ok, f"{dist}/{fname}: {msg}"


@pytest.mark.parametrize("metric", list(METRICS))
def test_metric_polarity_and_tiebreak(corpora, metric):
    """Duplicate vectors (ids 2,3 share one vector) force the (score,id)
    tiebreak; the zero vector exercises cosine NULL handling."""
    df, con = corpora["uniform"]
    order, score_fn = METRICS[metric]
    q = [0.5] * 8
    got = knn.search(df, q, k=10, metric=metric)
    qlit = "[" + ",".join(repr(float(x)) for x in q) + "]::DOUBLE[]"
    score = score_fn("t1.vector", qlit)
    sql = f"""
        SELECT id, {score} AS score FROM t1
        ORDER BY score {order}, id ASC LIMIT 10
    """
    ok, msg = compare(got, sql, con)
    assert ok, f"{metric}: {msg}"


def test_duplicate_vectors_adjacent_ranks(corpora):
    df, _ = corpora["uniform"]
    dup = df.where(df.id.isin([2, 3])).select("vector").collect()
    assert dup[0]["vector"] == dup[1]["vector"]
    q = dup[0]["vector"]
    top = knn.search(df, [float(x) for x in q], k=3, metric="l2").collect()
    assert [r["id"] for r in top[:2]] == [2, 3]  # equal score → id tiebreak
    assert top[0]["score"] == top[1]["score"] == 0.0


def test_t2_t3_fixture_shapes(spark, tmp_path):
    qp = fixtures.make_t2(str(tmp_path / "t2"), dim=8)
    tp = fixtures.make_t3(str(tmp_path / "t3"), n=1000)
    t2 = spark.read.parquet(qp)
    assert t2.count() == 100
    assert set(t2.columns) == {"qid", "qvector", "qtext", "k", "sel_filter"}
    t3 = spark.read.parquet(tp)
    assert t3.count() == 100
    assert t3.select("id").distinct().count() == 100
