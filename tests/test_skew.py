"""Salted (skew-resilient) aggregation and top-k must return exactly the
same rows as their single-phase plans, on a zipfian-style key
distribution (one key holding ~half the rows — the reference's
adversarial shape, testutil/testutil.go:230)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vecgo_spark.operators.skew import salted_agg, salted_topk


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 gets 500 rows; keys 1..50 get ~10 each
    rows = [(0, i, float((i * 37) % 1000)) for i in range(500)]
    rows += [(1 + (i % 50), 1000 + i, float((i * 91) % 1000)) for i in range(500)]
    return spark.createDataFrame(rows, "key long, id long, x double")


def test_salted_agg_matches_plain(skewed):
    got = salted_agg(
        skewed,
        ["key"],
        partial_aggs={"n": F.count(F.lit(1)), "s": F.sum(F.round(F.col("x") * 100).cast("long"))},
        merge_aggs={
            "n": F.sum("n"),
            "sum_x": (F.sum("s").cast("double") / 100.0),
            "avg_x": (F.sum("s").cast("double") / 100.0) / F.sum("n"),
        },
        n_salts=8,
    )
    plain = skewed.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("x") * 100).cast("long")).cast("double") / 100.0).alias("sum_x"),
    )
    g = {r["key"]: (r["n"], r["sum_x"], r["avg_x"]) for r in got.collect()}
    p = {r["key"]: (r["n"], r["sum_x"]) for r in plain.collect()}
    assert set(g) == set(p)
    for k in p:
        assert g[k][0] == p[k][0]
        assert abs(g[k][1] - p[k][1]) < 1e-9
        assert abs(g[k][2] - p[k][1] / p[k][0]) < 1e-9


def test_salted_agg_deterministic_salt(skewed):
    got = salted_agg(
        skewed, ["key"],
        partial_aggs={"n": F.count(F.lit(1))},
        merge_aggs={"n": F.sum("n")},
        n_salts=8, deterministic_col="id",
    )
    assert {r["key"]: r["n"] for r in got.collect()}[0] == 500


@pytest.mark.parametrize("k", [1, 3, 10])
def test_salted_topk_matches_window(skewed, k):
    order = [F.col("x").desc(), F.col("id").asc()]
    got = salted_topk(skewed, ["key"], order, k=k, n_salts=8).select(
        "key", "id", "rank"
    )
    w = Window.partitionBy("key").orderBy(*order)
    plain = (
        skewed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("key", "id", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_topk_no_single_partition_window(skewed):
    """The local window partitions by (key, salt) — the hot key never
    lands in one task's sort in phase 1."""
    order = [F.col("x").desc(), F.col("id").asc()]
    plan = salted_topk(skewed, ["key"], order, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
