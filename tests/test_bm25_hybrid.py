import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import bm25, hybrid


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick quick dog"),
        (3, "lazy dog sleeps"),
        (4, ""),
        (5, "THE Quick\tFOX\njumps"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenizer_whitespace_and_case(spark, docs):
    toks = docs.where("doc_id = 5").select(bm25.tokenize_expr("text").alias("t")).first()["t"]
    assert toks == ["the", "quick", "fox", "jumps"]
    assert bm25.tokenize_py("THE Quick\tFOX\njumps") == ["the", "quick", "fox", "jumps"]


def test_empty_doc_counts_toward_corpus(spark, docs):
    _, _, n, total = bm25.corpus_stats(docs, "doc_id", "text")
    assert n == 5  # doc 4 (empty) still counts — bm25.go Add()
    assert total == 4 + 4 + 3 + 0 + 4


def test_repeated_query_term_scores_double(spark, docs):
    s1 = {r["id"]: r["score"] for r in bm25.bm25_score(docs, "quick", "doc_id", "text").collect()}
    s2 = {r["id"]: r["score"] for r in bm25.bm25_score(docs, "quick quick", "doc_id", "text").collect()}
    for k in s1:
        assert s2[k] == 2 * s1[k]  # qtf multiplier == repeated iterators


def test_no_matching_terms_empty(spark, docs):
    assert bm25.bm25_search(docs, "zebra", 10, "doc_id", "text").count() == 0
    assert bm25.bm25_search(docs, "", 10, "doc_id", "text").count() == 0


def test_rrf_fuse_known_values(spark):
    vec = spark.createDataFrame([(1, 0.1), (2, 0.2), (3, 0.3)], "id long, score double")
    lex = spark.createDataFrame([(2, 9.0), (4, 8.0)], "id long, score double")
    out = {r["id"]: r["rrf_score"] for r in hybrid.rrf_fuse(vec, lex, k=10).collect()}
    # vec ranks (asc): 1→0, 2→1, 3→2 ; lex ranks (desc): 2→0, 4→1
    assert out[1] == 1.0 / 61.0
    assert out[2] == 1.0 / 62.0 + 1.0 / 61.0
    assert out[3] == 1.0 / 63.0
    assert out[4] == 1.0 / 62.0


def test_all_empty_docs_returns_empty_not_div_zero(spark):
    """avg_dl == 0 (every doc tokenizes to nothing): the reference yields
    no postings and returns empty; the K1·B/avgDL factor must not raise."""
    docs = spark.createDataFrame([(1, ""), (2, "   "), (3, None)],
                                 "id long, text string")
    assert bm25.bm25_search(docs, "anything", k=5).count() == 0
