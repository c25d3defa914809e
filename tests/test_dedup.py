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


def test_ngram_jaccard_length_prefilter_is_exact(spark):
    """The r15 length prefilter (drop join rows whose size ratio already
    fails the threshold) must be invisible in the result: pairs from the
    filtered plan equal brute-force Jaccard over the same shingle sets —
    including boundary pairs whose ratio lands exactly ON the threshold."""
    # doc sizes engineered around threshold 0.5: (10, 20) shingles is the
    # exact ratio boundary (min/max == 0.5), (4, 20) far below, (18, 20)
    # well above; texts share a long common prefix so intersections vary
    common = " ".join(f"w{i}" for i in range(22))       # 20 shingles (n=3)
    rows = [
        (1, common),                                     # 20 shingles
        (2, " ".join(f"w{i}" for i in range(20))),       # 18 — ratio 0.9
        (3, " ".join(f"w{i}" for i in range(12))),       # 10 — ratio 0.5
        (4, " ".join(f"w{i}" for i in range(6))),        # 4  — ratio 0.2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    # brute force over the same distinct-shingle sets
    import itertools
    sets = {}
    for i, text in rows:
        toks = text.split()
        sets[i] = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.5:
                want[(a, b)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
    # the boundary pair (doc 3 vs doc 1: sizes 10/20, subset) must survive
    assert (1, 3) in got and abs(got[(1, 3)] - 10.0 / 20.0) < 1e-12


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


def test_hot_shingle_cap_bounds_join(spark, caplog):
    """Pathological boilerplate: every doc shares one identical shingle.
    Uncapped, that one shingle alone contributes C(60,2)=1770 join rows;
    with the DF cutoff it is dropped (and logged), candidates stay bounded,
    and genuine near-dups below the cutoff are still found."""
    import logging

    boiler = "all rights reserved worldwide"
    rows = [(i, f"{boiler} unique tail number {i} content") for i in range(60)]
    # one genuine near-dup pair sharing a long non-boilerplate body
    rows += [(100, "spark shuffles partition data across the cluster stage"),
             (101, "spark shuffles partition data across the cluster boundary")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup._doc_shingles(docs, "doc_id", "text", 3).persist()
    capped = dedup._drop_hot(sh, ["shingle"], 10, "shingle")
    inter_rows = (
        capped.alias("a")
        .join(capped.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .count()
    )
    assert inter_rows < 100  # uncapped: >= 2*1770 (boiler spans 2 shingles)

    with caplog.at_level(logging.INFO, logger="vecgo_spark.operators.dedup"):
        pairs = {(r["id_a"], r["id_b"]) for r in
                 dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=10).collect()}
    assert (100, 101) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs)  # boilerplate family gone
    assert any("hot shingle" in m for m in caplog.messages)


def test_hot_cap_oracle_parity(spark, tmp_path):
    """The DF cutoff is mirrored in the SQL oracle: with a cap low enough
    to trigger, Spark and DuckDB still agree exactly (ngram + minhash +
    simhash)."""
    import duckdb

    from tests.oracle_harness import compare

    boiler = "generated by the standard pipeline template"
    rows = [(i, f"{boiler} doc body variant {i} alpha beta") for i in range(30)]
    rows += [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "the quick brown fox jumps over the lazy dog tonight")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pq_path = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(pq_path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq_path}'")

    ok, msg = compare(
        dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_df=5),
        dedup.ngram_jaccard_pairs_sql(threshold=0.3, max_shingle_df=5), con)
    assert ok, msg
    ok, msg = compare(
        dedup.minhash_lsh_pairs(docs, min_matches=8, max_bucket=5),
        dedup.minhash_lsh_pairs_sql(min_matches=8, max_bucket=5), con)
    assert ok, msg
    ok, msg = compare(
        dedup.simhash_pairs(docs, max_hamming=3, max_bucket=5),
        dedup.simhash_pairs_sql(max_hamming=3, max_bucket=5), con)
    assert ok, msg


def _random_embeddings(spark, n=120, dim=16, n_dups=25, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)]
    # planted near-dups: tiny perturbations of existing vectors
    for j in range(n_dups):
        src = base[j] + 0.02 * rng.standard_normal(dim)
        rows.append((n + j, src.tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exact_pairs(df, threshold):
    import numpy as np

    rows = sorted((r["vec_id"], r["embedding"]) for r in df.collect())
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1)[:, None]
    sims = m @ m.T
    out = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if sims[a, b] >= threshold:
                out.add((int(ids[a]), int(ids[b])))
    return out


def test_embedding_neardup_block_matches_bruteforce(spark):
    emb = _random_embeddings(spark)
    want = _exact_pairs(emb, 0.95)
    assert want  # fixture must actually contain near-dups
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.embedding_neardup_pairs(emb, threshold=0.95, n_blocks=5).collect()}
    assert got == want


def test_embedding_neardup_builds_without_driver_collect(spark, monkeypatch):
    """The block-candidate plan must be constructible with DataFrame.collect
    disabled — proving no corpus rows reach the driver at plan-build time
    (the scale-killer the r1 verdict flagged)."""
    from pyspark.sql import DataFrame as SparkDF

    emb = _random_embeddings(spark, n=20, n_dups=2)

    def _boom(self, *a, **k):
        raise AssertionError("driver-side collect in embedding_neardup path")

    monkeypatch.setattr(SparkDF, "collect", _boom)
    monkeypatch.setattr(SparkDF, "toPandas", _boom)
    df = dedup.embedding_neardup_pairs(emb, threshold=0.9)  # must not raise
    monkeypatch.undo()
    assert df.count() >= 0


def test_embedding_neardup_lsh_recall(spark):
    emb = _random_embeddings(spark, n=300, dim=16, n_dups=40)
    want = _exact_pairs(emb, 0.95)
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.embedding_neardup_pairs(emb, threshold=0.95, candidates="lsh").collect()}
    assert got <= want  # verify phase guarantees precision = 1
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"LSH candidate recall {recall:.2f} < 0.8"


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


def test_minhash_candidate_recall_vs_bruteforce(spark):
    """ADVICE r1: minhash banding with the defaults is approximate — a
    pair can agree in 8-12 of 16 positions spread across all 4 bands and
    share no band. Measure candidate recall against the exact Jaccard
    pairs (deterministic: seeded perms + fixed fixture)."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(40):
        toks = rng.sample(vocab, 30)
        rows.append((i, " ".join(toks)))
        # near-dup: replace 2 of 30 tokens -> each kills <=3 shingles,
        # shingle jaccard lands ~0.55-0.75 (straddling the 0.5 threshold)
        mut = list(toks)
        for j in rng.sample(range(30), 2):
            mut[j] = rng.choice(vocab)
        rows.append((100 + i, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {(r["id_a"], r["id_b"])
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    approx = {(r["id_a"], r["id_b"])
              for r in dedup.minhash_lsh_pairs(docs, min_matches=8).collect()}
    assert exact  # fixture yields real near-dup pairs
    recall = len(approx & exact) / len(exact)
    # measured ~0.57 on pairs straddling the threshold — the documented
    # approximation of min_matches=8 with 4 bands (NOT pigeonhole-sound)
    assert recall >= 0.5, f"minhash candidate recall {recall:.2f}"

    # pigeonhole-sound regime: min_matches=13 >= 16-4+1, so EVERY pair
    # whose signatures agree in >=13 positions shares a band — banding
    # recall is exactly 1.0 there
    sigs = {r["id"]: [r[f"m{i}"] for i in range(16)]
            for r in dedup.minhash_signatures(docs).collect()}
    want13 = set()
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if sum(u == v for u, v in zip(sigs[a], sigs[b])) >= 13:
                want13.add((a, b))
    got13 = {(r["id_a"], r["id_b"])
             for r in dedup.minhash_lsh_pairs(docs, min_matches=13).collect()}
    assert got13 == want13


def test_hot_bucket_fallback_matches_literal_path(spark, monkeypatch):
    """When the hot-bucket key count exceeds MAX_HOT_LITERALS, the pair
    pipelines must switch to the plan-bounded broadcast-anti-join +
    pair-distinct fallback and return the SAME pair set as the literal
    path (and the collect stays LIMIT-bounded either way)."""
    boiler = "copyright footer text appended to every generated document"
    rows = [(i, f"{boiler}") for i in range(30)]           # one giant bucket
    rows += [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "the quick brown fox jumps over the lazy dog tonight"),
             (200, "completely unrelated text about spark shuffle behavior")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    lit_mh = {tuple(r) for r in dedup.minhash_lsh_pairs(
        docs, min_matches=8, max_bucket=5).collect()}
    lit_sh = {tuple(r) for r in dedup.simhash_pairs(
        docs, max_hamming=3, max_bucket=5).collect()}

    monkeypatch.setattr(dedup, "MAX_HOT_LITERALS", 0)      # force fallback
    fb_mh = {tuple(r) for r in dedup.minhash_lsh_pairs(
        docs, min_matches=8, max_bucket=5).collect()}
    fb_sh = {tuple(r) for r in dedup.simhash_pairs(
        docs, max_hamming=3, max_bucket=5).collect()}

    assert fb_mh == lit_mh
    assert fb_sh == lit_sh
    assert (100, 101) in {(a, b) for a, b, _ in fb_mh}


def test_simhash_swar_overflow_is_loud(spark, monkeypatch):
    """ADVICE r5: the 20-bit SWAR vote lanes carry at 2^20 token instances
    per doc — such a doc must raise, never return a corrupted signature.
    The guard wiring is exercised with the threshold patched down (the
    lane-carry arithmetic itself is what the real 2^20 bound proves)."""
    monkeypatch.setattr(dedup, "SWAR_MAX_TOKENS", 8)
    big = spark.createDataFrame([(1, "tok " * 8)], "doc_id long, text string")
    with pytest.raises(Exception, match="lane overflow"):
        dedup.simhash(big).collect()
    # one instance below the boundary still computes a signature
    ok = spark.createDataFrame([(2, "tok " * 7)], "doc_id long, text string")
    [row] = dedup.simhash(ok).collect()
    assert row["simhash"] is not None


def test_embedding_neardup_auto_strategy(spark):
    """candidates='auto' picks the exact block matmul under the row
    threshold and the linear LSH path above it (VERDICT r6: O(n²) must
    never be the silent default on a large corpus)."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, (rng.standard_normal(8) / 10 + 1).tolist()) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # small corpus → block (exact): equals an explicit block run
    a = sorted((r["id_a"], r["id_b"]) for r in
               dedup.embedding_neardup_pairs(emb, threshold=0.9, n_blocks=3).collect())
    b = sorted((r["id_a"], r["id_b"]) for r in
               dedup.embedding_neardup_pairs(
                   emb, threshold=0.9, candidates="block", n_blocks=3).collect())
    assert a == b
    # forced-low threshold → auto takes the LSH path; emitted pairs are a
    # subset of the exact set and every emitted cosine is exact
    lsh_pairs = dedup.embedding_neardup_pairs(
        emb, threshold=0.9, auto_lsh_rows=10).collect()
    exact = {(r["id_a"], r["id_b"]): r["cos"] for r in
             dedup.embedding_neardup_pairs(
                 emb, threshold=0.9, candidates="block", n_blocks=3).collect()}
    for r in lsh_pairs:
        assert exact[(r["id_a"], r["id_b"])] == r["cos"]


def test_minhash_incremental_equals_cross_slice_of_full_pairing(spark):
    """Incremental ingest dedup: batch×corpus matching must find EXACTLY
    the cross-slice pairs the full self-join pairing finds on the union
    (signatures are per-doc, so the band criterion is identical), and it
    must NOT pair batch docs with each other or corpus docs with each
    other."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, base), (2, base + " extra"), (3, "totally different text here x y z w"),
        (10, base + " tail"),          # batch near-dup of 1/2
        (11, base + " tail"),          # batch-internal dup of 10 (must NOT pair)
        (12, "unrelated batch document with its own words q r s t u v"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    inc = {(r["batch_id"], r["corpus_id"]): r["match_count"] for r in
           dedup.minhash_dedup_incremental(
               corpus, batch, min_matches=8, max_bucket=None).collect()}
    full = dedup.minhash_lsh_pairs(docs, min_matches=8, max_bucket=None).collect()
    cross = {}
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if (a < 10) != (b < 10):  # one side in each slice
            bid, cid = (a, b) if a >= 10 else (b, a)
            cross[(bid, cid)] = r["match_count"]
    assert inc == cross and len(inc) >= 1
    assert all(cid < 10 <= bid for bid, cid in inc)  # never intra-slice


def test_exact_substring_spans_python_model(spark):
    """Exact parity with a brute-force python model of ExactSubstr
    run-merging (Lee et al. 2021): every position whose L-window occurs
    >= 2 times anywhere in the corpus, merged into maximal runs."""
    from collections import Counter

    L = 4
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x y a b c d e q r s"),      # shares the 4-window "a b c d"… run
        (3, "p q r s t u v w"),
        (4, "m m m m m m"),              # internal repeat: "m m m m" occurs 3x
        (5, "one two three"),            # shorter than L: no windows
        # gap-2 coverage overlap (r8 review): dup windows at pos 1 and 3
        # of doc 6 (unique token at pos 2 kills the pos-2 window) must
        # merge into ONE maximal span [1..6], not two overlapping spans
        (6, "q r s t u v zz"),
        (7, "q r s t xx s t u v yy"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    wins = []
    for i, t in rows:
        toks = t.split()
        wins += [(i, p + 1, " ".join(toks[p:p + L]))
                 for p in range(len(toks) - L + 1)]
    counts = Counter(sh for _, _, sh in wins)
    want = set()
    for i, _ in rows:
        dup = sorted(p for d, p, sh in wins if d == i and counts[sh] >= 2)
        run = []
        for p in dup:
            if run and p - run[-1] <= L:  # coverage overlaps or touches
                run.append(p)
            else:
                if run:
                    want.add((i, run[0], run[-1] + L - 1, run[-1] + L - run[0], len(run)))
                run = [p]
        if run:
            want.add((i, run[0], run[-1] + L - 1, run[-1] + L - run[0], len(run)))

    got = {tuple(r) for r in
           dedup.exact_substring_spans(docs, min_len=L).collect()}
    assert got == want
    assert any(r[0] == 4 for r in got)      # self-repeat found
    assert all(r[3] >= L for r in got)      # every span >= min_len tokens


def test_exact_substring_spans_plan_no_position_self_join(spark):
    """100-TB audit: the only join is the duplicated-hash semi-join —
    never a pos x pos self-join of the token stream, and no cartesian /
    nested-loop anywhere."""
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = (dedup.exact_substring_spans(docs, min_len=3)
            ._jdf.queryExecution().optimizedPlan().toString())
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(join_lines) == 1, join_lines
    assert "LeftSemi" in join_lines[0] and "(h#" in join_lines[0]
    assert "pos#" not in join_lines[0]
    assert "Cartesian" not in plan and "Cross" not in plan


def test_semantic_dedup_embedded_ground_truth(spark):
    """SemDeDup on a corpus with planted semantics: two tight clusters of
    near-identical vectors plus a far-out singleton. Within-cluster
    near-dups are found with the right drop choice (the member CLOSER to
    the centroid is dropped — the paper keeps the cluster's edge), and
    vectors in different clusters are never paired even when similar."""
    import numpy as np

    from vecgo_spark.operators import ivf

    rng = np.random.default_rng(7)
    rows = []
    # cluster A around (1,0,...), cluster B around (0,1,...); ids 1..12
    for i in range(6):
        v = np.zeros(8); v[0] = 1.0; v += rng.normal(0, 0.01, 8)
        rows.append((i + 1, [float(x) for x in v]))
    for i in range(6):
        v = np.zeros(8); v[1] = 1.0; v += rng.normal(0, 0.01, 8)
        rows.append((i + 7, [float(x) for x in v]))
    rows.append((99, [float(x) for x in rng.normal(5, 0.1, 8)]))  # far singleton
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = ivf.train_ivf(emb, "embedding", nlist=3, max_iter=10,
                          trainer="driver", order_col="vec_id")
    got = dedup.semantic_dedup_pairs(emb, model, threshold=0.95).collect()
    assert got, "planted near-identical vectors must pair"
    a_ids, b_ids = set(range(1, 7)), set(range(7, 13))
    for r in got:
        pair = {r["id_a"], r["id_b"]}
        assert pair <= a_ids or pair <= b_ids, f"cross-cluster pair {pair}"
        assert r["drop_id"] in pair
        assert r["cos_sim"] >= 0.95
    # every within-cluster pair of the planted groups is ~identical → all found
    assert len(got) == 2 * (6 * 5 // 2)
    # drop choice: recompute centroid cosines and check argmax is dropped
    import math
    cents = model.centroids
    by_id = {i: v for i, v in rows}
    for r in got:
        def cc(i):
            v = by_id[i]; c = cents[r["cluster_id"]]
            dot = sum(x * y for x, y in zip(v, c))
            return dot / (math.sqrt(sum(x * x for x in v)) * math.sqrt(sum(y * y for y in c)))
        ca, cb = cc(r["id_a"]), cc(r["id_b"])
        want_drop = r["id_a"] if ca > cb else r["id_b"]
        assert r["drop_id"] == want_drop


def test_semantic_dedup_plan_never_crosses_clusters(spark):
    """100-TB audit: candidate pairs are generated INSIDE a
    per-cluster-grouped applyInPandas gemm (cross-cluster pairs never
    exist), no cartesian / nested-loop anywhere, and the verify joins
    are equi-joins keyed on the candidate ids."""
    from vecgo_spark.operators import ivf

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(1, 20)],
        "vec_id long, embedding array<float>")
    model = ivf.train_ivf(emb, "embedding", nlist=2, max_iter=5,
                          trainer="driver", order_col="vec_id")
    plan = (dedup.semantic_dedup_pairs(emb, model, threshold=0.5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan  # per-cluster gemm
    # the pair generator is grouped by cluster_id — the ONLY place pairs
    # are born, so cross-cluster pairs are structurally impossible
    import re as _re
    assert _re.search(r"FlatMapGroupsInPandas \[cluster_id", plan), plan[:2000]


def test_exact_substring_dedup_removal_model(spark):
    """The removal action drops exactly the span-covered tokens (all
    occurrences — the conservative ExactSubstr variant), passes clean
    docs through untouched, and reports token-domain counts."""
    L = 4
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e z"),          # "a b c d e" duplicated
        (3, "p q r s t u"),              # clean
        (4, "one two"),                  # shorter than L
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {r["doc_id"]: [] for r in docs.collect()}
    for r in dedup.exact_substring_spans(docs, min_len=L).collect():
        spans[r["doc_id"]].append((r["span_start"], r["span_end"]))
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in dedup.exact_substring_dedup(docs, min_len=L).collect()}
    for i, t in rows:
        toks = t.split()
        kept = [tok for p, tok in enumerate(toks, start=1)
                if not any(s <= p <= e for s, e in spans[i])]
        assert got[i] == (len(toks), len(toks) - len(kept), " ".join(kept)), i
    assert got[3] == (6, 0, "p q r s t u")          # untouched
    assert got[1][1] >= 5 and got[2][1] >= 5        # both copies cut


def test_semantic_dedup_hot_cluster_cap_and_oracle_parity(spark, tmp_path):
    """A cluster above max_cluster is dropped from pairing entirely (the
    quadratic bound), mirrored exactly by the SQL twin's hot CTE."""
    import duckdb
    import numpy as np

    from tests.oracle_harness import compare
    from vecgo_spark.operators import ivf

    rng = np.random.default_rng(5)
    rows = []
    for i in range(30):   # hot cluster around (1,0): 30 > cap of 10
        rows.append((i, [float(x) for x in
                         np.array([1.0, 0.0]) + rng.normal(0, 0.01, 2)]))
    for i in range(4):    # small cluster around (0,1)
        rows.append((100 + i, [float(x) for x in
                               np.array([0.0, 1.0]) + rng.normal(0, 0.01, 2)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = ivf.train_ivf(emb, "embedding", nlist=2, max_iter=10,
                          trainer="driver", order_col="vec_id")
    got = dedup.semantic_dedup_pairs(emb, model, threshold=0.99,
                                     max_cluster=10).collect()
    ids = {x for r in got for x in (r["id_a"], r["id_b"])}
    assert ids and ids <= set(range(100, 104)), ids  # hot cluster gone
    emb.toPandas().to_parquet(str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path / 'embeddings.parquet'}'")
    ok, msg = compare(
        dedup.semantic_dedup_pairs(emb, model, threshold=0.99, max_cluster=10)
        .orderBy("cluster_id", "id_a", "id_b"),
        dedup.semantic_dedup_pairs_sql(model, threshold=0.99, max_cluster=10)
        + " ORDER BY cluster_id, id_a, id_b", con)
    assert ok, msg


def test_semantic_dedup_one_survivor_per_planted_group(spark):
    """The removal action: two planted semantic groups + a far singleton
    → exactly ONE keep per group, and the keeper is the group's LOWEST
    centroid-cosine member (the paper keeps the cluster edge); the
    singleton keeps itself; group_id is the min member id."""
    import math

    import numpy as np

    from vecgo_spark.operators import ivf

    rng = np.random.default_rng(11)
    rows = []
    for i in range(5):
        v = np.zeros(8); v[0] = 1.0; v += rng.normal(0, 0.01, 8)
        rows.append((i + 1, [float(x) for x in v]))
    for i in range(4):
        v = np.zeros(8); v[1] = 1.0; v += rng.normal(0, 0.01, 8)
        rows.append((i + 10, [float(x) for x in v]))
    rows.append((99, [float(x) for x in rng.normal(5, 0.1, 8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = ivf.train_ivf(emb, "embedding", nlist=3, max_iter=10,
                          trainer="driver", order_col="vec_id")
    out = dedup.semantic_dedup(emb, model, threshold=0.95).collect()
    assert len(out) == len(rows)  # one row per input
    by_group = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    groups = {g: sorted(r["vec_id"] for r in m) for g, m in by_group.items()}
    assert groups == {1: [1, 2, 3, 4, 5], 10: [10, 11, 12, 13], 99: [99]}
    cents = model.centroids
    by_id = {i: v for i, v in rows}

    def cc(i):
        v = by_id[i]
        best = max(range(len(cents)), key=lambda c: -sum(
            (x - y) ** 2 for x, y in zip(v, cents[c])))
        c = cents[best]
        dot = sum(x * y for x, y in zip(v, c))
        return dot / (math.sqrt(sum(x * x for x in v)) * math.sqrt(sum(y * y for y in c)))

    for g, members in by_group.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1, f"group {g}: {members}"
        if len(members) > 1:
            want = min(members, key=lambda r: (cc(r["vec_id"]), r["vec_id"]))
            assert keeps[0]["vec_id"] == want["vec_id"]


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed pointer-
    jumping loop must label identically (comp = min member id), and the
    gate must pick the loop when edges exceed driver_cap."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (7, 6), (8, 6),
             (20, 25), (25, 21), (30, 31)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r["id"]: r["comp"]
            for r in dedup.connected_components(pairs).collect()}
    loop = {r["id"]: r["comp"]
            for r in dedup.connected_components(pairs, driver_cap=0).collect()}
    assert fast == loop
    nodes = sorted({x for e in edges for x in e})
    assert fast == _union_find_components(edges, nodes)
    # empty pair graph → empty labeling on both paths
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(empty).count() == 0
    assert dedup.connected_components(empty, driver_cap=0).count() == 0


def test_connected_components_string_ids(spark):
    """Both paths are id-type-agnostic: string doc ids (the common shape
    for document corpora) must label identically on the driver fast path
    and the distributed loop, with a STRING-typed output schema — the
    fast path must not hardcode long (r9 ADVICE), and the empty graph
    must return the input's id type too."""
    edges = [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y"), ("z", "z")]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    fast = dedup.connected_components(pairs)
    loop = dedup.connected_components(pairs, driver_cap=0)
    assert dict(fast.dtypes) == {"id": "string", "comp": "string"}
    assert dict(loop.dtypes) == {"id": "string", "comp": "string"}
    f = {r["id"]: r["comp"] for r in fast.collect()}
    assert f == {r["id"]: r["comp"] for r in loop.collect()}
    assert f == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                 "x": "x", "y": "x", "z": "z"}
    empty = spark.createDataFrame([], "id_a string, id_b string")
    out = dedup.connected_components(empty)
    assert dict(out.dtypes) == {"id": "string", "comp": "string"}
    assert out.count() == 0


def test_semantic_pairs_persist_assigned_parity(spark):
    """persist_assigned=True must register exactly one cache and return
    the identical pair set (it only changes how many times the assigned
    frame is evaluated, never what it holds)."""
    import numpy as np

    from vecgo_spark.operators import ivf

    rng = np.random.default_rng(23)
    rows = [(i, (np.eye(8)[i % 2] + rng.normal(0, 0.01, 8)).tolist())
            for i in range(1, 13)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = ivf.train_ivf(emb, "embedding", nlist=2, max_iter=10,
                          trainer="driver", order_col="vec_id")
    dedup.release_caches()
    plain = sorted(map(tuple, dedup.semantic_dedup_pairs(
        emb, model, threshold=0.95).collect()))
    before = len(dedup._CACHED)
    cached = sorted(map(tuple, dedup.semantic_dedup_pairs(
        emb, model, threshold=0.95, persist_assigned=True).collect()))
    assert len(dedup._CACHED) == before + 1
    assert cached == plain and plain
    dedup.release_caches()
