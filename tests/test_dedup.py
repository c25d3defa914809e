import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    rows = [
        (1, base),
        (2, base),            # exact dup of 1
        (3, near),            # near dup of 1 (one token differs)
        (4, "completely different text about spark query engines and shuffles"),
        (5, "xy"),            # < 3 tokens → no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    out = {r["id"]: r for r in dedup.exact_dedup(docs).collect()}
    assert out[1]["keep"] and not out[2]["keep"]
    assert out[1]["group_size"] == 2 and out[2]["group_size"] == 2
    assert out[3]["keep"] and out[3]["group_size"] == 1


def test_minhash_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["match_count"]
             for r in dedup.minhash_lsh_pairs(docs, min_matches=8).collect()}
    assert pairs[(1, 2)] == 16  # identical → all positions match
    assert (1, 3) in pairs and pairs[(1, 3)] >= 8
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(1, 2)] == 1.0
    # base/near: 14 tokens → 12 shingles each; only the final shingle
    # ("river bank today/tonight") differs → inter=11, union=13
    assert abs(pairs[(1, 3)] - 11.0 / 13.0) < 1e-12


def test_simhash_near_dup_closer_than_unrelated(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")
    assert ham(1, 2) == 0
    assert ham(1, 3) < ham(1, 4)


def test_embedding_neardup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.14, 0.0]),   # cos ≈ 0.99
        (3, [0.0, 1.0, 0.0]),     # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.embedding_neardup_pairs(emb, threshold=0.9).collect()}
    assert pairs == {(1, 2)}


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def test_connected_components_chain(spark):
    # chain 1-2-3-4-5 plus pair 10-11 plus singleton-free grid: worst case
    # for plain propagation (diameter 4) — pointer jumping must converge.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (7, 6), (8, 6)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    nodes = sorted({x for e in edges for x in e})
    want = _union_find_components(edges, nodes)
    assert got == want


def test_dedup_clusters_matches_union_find(spark, docs):
    out = {r["doc_id"]: r["canonical_id"]
           for r in dedup.dedup_clusters(docs, threshold=0.5).collect()}
    pairs = [(r["id_a"], r["id_b"]) for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()]
    nodes = [r["doc_id"] for r in docs.collect()]
    uf = _union_find_components(pairs, nodes)
    assert out == uf
    # 1,2,3 cluster together under canonical 1; 4 and 5 are singletons
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4 and out[5] == 5
