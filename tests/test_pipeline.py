"""Training-pipeline operators (operators/pipeline.py) + exact
percentiles + range search: brute-force / numpy oracles on small
fixtures, plus the properties that matter at scale (partitioning
independence, per-shard packing invariants)."""

import math

import pytest
from pyspark.sql import functions as F

from vecgo_spark.operators import knn, pipeline
from vecgo_spark.operators.stats import exact_percentiles


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # shares 3-grams with 1
        (3, "completely different words appear only here once"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "short text"),  # < 3 tokens produces no shingles? (2 tokens)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingle_set(text, n=3):
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_overlap_counts(docs):
    corpus = docs.where(F.col("doc_id") != 1)
    bench = docs.where(F.col("doc_id") == 1)
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_bench_docs"])
        for r in pipeline.contamination_overlap(corpus, bench, n=3).collect()
    }
    b = _shingle_set("the quick brown fox jumps over the lazy dog")
    expect = {}
    for did, text in [(2, "the quick brown fox jumps over the lazy cat"),
                      (4, "the quick brown fox jumps over the lazy dog")]:
        inter = _shingle_set(text) & b
        if inter:
            expect[did] = (len(inter), 1)
    assert got == expect


def test_hash_sample_deterministic_and_partition_independent(docs, spark):
    a = sorted(r["doc_id"] for r in pipeline.hash_sample(docs, 0.5, seed=1).collect())
    b = sorted(
        r["doc_id"]
        for r in pipeline.hash_sample(docs.repartition(7), 0.5, seed=1).collect()
    )
    assert a == b  # partitioning must not change membership
    c = sorted(r["doc_id"] for r in pipeline.hash_sample(docs, 0.5, seed=2).collect())
    assert a != c or len(a) <= 1  # different seed → different slice (tiny-N tolerant)
    # fraction sanity on a larger id range
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    n = pipeline.hash_sample(big, 0.25, seed=0).count()
    assert 0.18 < n / 2000 < 0.32


def test_pack_sequences_invariants(docs):
    out = pipeline.pack_sequences(docs, budget=5, n_shards=2).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:  # offsets are the running token sum within the shard
            assert r["offset"] == cum
            assert r["seq_id"] == r["offset"] // 5
            assert r["n_tokens"] == len(r["text"].split()) if "text" in r else True
            cum += r["n_tokens"]


def test_doc_novelty_dup_vs_unique(docs):
    got = {r["doc_id"]: r for r in pipeline.doc_novelty(docs, n=3).collect()}
    # doc 3's shingles appear nowhere else → novelty 1.0
    assert got[3]["novelty"] == 1.0
    # docs 1 and 4 are identical → every shingle has df>=2 → novelty 0.0
    assert got[1]["novelty"] == 0.0 and got[4]["novelty"] == 0.0
    # doc 5 has <3 tokens → no shingles → absent from the result
    assert 5 not in got
    # doc 2 shares all but the last shingle with 1/4
    assert 0.0 < got[2]["novelty"] < 1.0


def test_exact_percentiles_vs_numpy(spark):
    import numpy as np

    vals = [float((i * 7919) % 1000) / 3.0 for i in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = {r["p"]: r["value"] for r in exact_percentiles(df, "x", ps, n_partitions=4).collect()}
    want = np.percentile(np.array(vals), [p * 100 for p in ps], method="linear")
    for p, w in zip(ps, want):
        assert got[p] == pytest.approx(float(w), abs=1e-9), p
    cached = getattr(exact_percentiles, "last_cached", None)
    if cached is not None:
        cached.unpersist()


def test_exact_percentiles_empty(spark):
    df = spark.createDataFrame([], "x double")
    assert exact_percentiles(df, "x", [0.5]).count() == 0
    assert exact_percentiles(df, "x", [0.5], bounds=(0.0, 1.0)).count() == 0


def test_exact_percentiles_bounds_path(spark):
    """r14 bounds= path: a known (lo, hi) swaps the range shuffle for a
    deterministic equi-width bucket key — results must be IDENTICAL to
    the sampling path for exact, loose, and flat-out WRONG bounds (the
    bucket id is weakly monotone in v, so bounds affect only balance),
    and the plan must contain neither rangepartitioning nor a persisted
    InMemoryTableScan."""
    import numpy as np

    vals = [float(v) for v in ([5.0] * 40 + list(range(60)) + [42.0] * 17)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.01, 0.25, 0.5, 0.75, 0.999]
    want = np.percentile(np.array(vals), [p * 100 for p in ps], method="linear")
    for bounds in [(0.0, 59.0), (-100.0, 1000.0), (20.0, 30.0), (59.0, 59.0)]:
        out = exact_percentiles(df, "x", ps, n_partitions=4, bounds=bounds)
        got = {r["p"]: r["value"] for r in out.collect()}
        for p, w in zip(ps, want):
            assert got[p] == pytest.approx(float(w), abs=1e-9), (bounds, p)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert "InMemoryTableScan" not in plan


def test_grouped_percentiles_bounds_path(spark):
    """Grouped twin of the bounds-path invariant: global bounds, per-group
    exactness, identical to the sampling path even with wrong bounds."""
    from vecgo_spark.operators.stats import grouped_percentiles, release_caches

    rows = [("a", float(i % 37)) for i in range(300)] + \
           [("b", float(i)) for i in range(50)] + [("c", 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    ps = [0.25, 0.5, 0.9]
    ref = sorted(map(tuple, grouped_percentiles(df, "g", "x", ps, n_partitions=4).collect()))
    release_caches()
    for bounds in [(0.0, 49.0), (5.0, 12.0)]:
        got = sorted(map(tuple, grouped_percentiles(
            df, "g", "x", ps, n_partitions=4, bounds=bounds).collect()))
        assert got == ref, bounds


def test_exact_percentiles_partition_count_sweep_exact(spark):
    """r14: results must stay exact across partition counts from few to
    far-more-than-needed, including duplicate-heavy data and lo/hi ranks
    that straddle a partition boundary (many tiny range partitions make
    boundary straddles near-certain) — the invariant any future
    selection-plan change (e.g. a needed-pid filter) must preserve."""
    import numpy as np

    vals = [float(v) for v in ([5.0] * 40 + list(range(60)) + [42.0] * 17)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.01, 0.25, 0.5, 0.75, 0.999]
    want = np.percentile(np.array(vals), [p * 100 for p in ps], method="linear")
    for np_parts in (3, 16, 64):  # 64 partitions >> ~10 needed pids
        got = {r["p"]: r["value"] for r in
               exact_percentiles(df, "x", ps, n_partitions=np_parts).collect()}
        for p, w in zip(ps, want):
            assert got[p] == pytest.approx(float(w), abs=1e-9), (np_parts, p)
        cached = getattr(exact_percentiles, "last_cached", None)
        if cached is not None:
            cached.unpersist()


def test_range_search_matches_bruteforce(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, vector array<double>")
    q = [3.0, 2.0]
    got = [(r["id"], r["score"]) for r in knn.range_search(df, q, radius=4.0).collect()]
    brute = sorted(
        (
            ((v[0] - q[0]) ** 2 + (v[1] - q[1]) ** 2, i)
            for i, v in rows
            if (v[0] - q[0]) ** 2 + (v[1] - q[1]) ** 2 <= 4.0
        ),
    )
    assert got == [(i, s) for s, i in brute]
    # similarity polarity: dot keeps score >= radius
    dots = [(r["id"], r["score"]) for r in knn.range_search(df, q, radius=20.0, metric="dot").collect()]
    assert all(s >= 20.0 for _, s in dots)
    assert dots == sorted(dots, key=lambda t: (-t[1], t[0]))


def test_pack_sequences_long_doc_spans_sequences(spark):
    # one doc longer than the budget still gets a single start offset;
    # the next doc in the shard starts after it
    rows = [(1, " ".join(["w"] * 12)), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pipeline.pack_sequences(df, budget=5, n_shards=1).collect()}
    assert out[1]["offset"] == 0 and out[1]["seq_id"] == 0
    assert out[2]["offset"] == 12 and out[2]["seq_id"] == 12 // 5


def test_stratified_sample_properties(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = pipeline.stratified_sample(df, "source", k=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 10 for v in per.values()) and len(per) == 3
    # deterministic + partition-independent
    out2 = pipeline.stratified_sample(df.repartition(13), "source", k=10).collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}
    # group smaller than k keeps all rows
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert pipeline.stratified_sample(small, "source", k=10).count() == 2


def test_vocab_top_terms_counts(spark):
    rows = [
        (1, "alpha beta beta"),      # df(alpha)=1? appears docs 1,2,3 ...
        (2, "alpha gamma"),
        (3, "alpha beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["term"], r["doc_freq"]) for r in pipeline.vocab_top_terms(df, k=2).collect()]
    # document frequency (distinct per doc): alpha=3, beta=2, gamma=1
    assert got == [("alpha", 3), ("beta", 2)]


def test_langid_ngram_known_languages(spark):
    """The trigram-profile heuristic must identify clearly-marked en/de/
    fr/es text, fall back to 'unk' when nothing matches, and be a pure
    no-shuffle Column plan."""
    from pyspark.sql import functions as F

    from vecgo_spark.functions import text as textfn

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and the cat"),
        (2, "der hund und die katze gehen in den garten und singen"),
        (3, "le chat est sur la table et il est tres content de la maison"),
        (4, "el perro y el gato que estan en la casa quieren comer"),
        (5, ""),
        (6, None),
        (7, "zzzz qqqq xxxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = textfn.langid_ngram_scores(F.col("text"))
    out = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", textfn.langid_ngram_pick(scores).alias("lang")
        ).collect()
    }
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unk", 6: "unk", 7: "unk"}
    plan = df.select("doc_id", textfn.langid_ngram_pick(scores).alias("lang"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_profile_planted(spark):
    """Hand-computable fixtures: a template-spam doc, a clean doc, a
    doc with repeated lines, and a too-short doc."""
    rows = [
        # 6 tokens: grams = [a b a, b a b, a b a, b a b] → t=4, d=2,
        # mode=2 → dup=0.5, top=0.5
        (1, "a b a b a b"),
        # all-distinct grams, one line
        (2, "one two three four five"),
        # 4 non-empty lines, 2 distinct → dup_line_frac=0.5
        (3, "x x x\ny y y\nx x x\ny y y"),
        (4, "too short"),  # < 3 tokens → no grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pipeline.repetition_profile(docs, n=3).collect()}
    assert out[1]["n_ngrams"] == 4
    assert out[1]["dup_ngram_frac"] == 0.5
    assert out[1]["top_ngram_frac"] == 0.5
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == pytest.approx(1 / 3)
    assert out[3]["n_lines"] == 4 and out[3]["dup_line_frac"] == 0.5
    assert out[4]["n_ngrams"] == 0
    assert out[4]["dup_ngram_frac"] == 0.0 and out[4]["top_ngram_frac"] == 0.0


def test_repetition_profile_plan_stays_jvm_and_shuffle_free(spark):
    """The profile must stay a pure per-row projection: no Python nodes,
    and no data-dependent Exchange (embarrassingly parallel at 100 TB).
    r14: the conditional narrow-source spread (util.ensure_parallelism)
    may add ONE RoundRobin repartition on single-split inputs — a no-op
    on real multi-split scans — so only that exchange kind is allowed."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = (pipeline.repetition_profile(docs)
            ._jdf.queryExecution().executedPlan().toString())
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_repetition_profile_matches_python_model(spark):
    """Property: for arbitrary small docs the in-row fold profile equals
    an independent Python reference (collections.Counter model)."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["a", "b", "cc", "ddd", "e"])
    docs_strategy = st.lists(
        st.lists(words, min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=6,
    )

    @given(texts=docs_strategy)
    @settings(max_examples=20, deadline=None,
              suppress_health_check=list(HealthCheck))
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               pipeline.repetition_profile(df, n=2).collect()}
        for i, t in enumerate(texts):
            toks = [w for w in t.lower().split() if w]
            grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
            r = got[i]
            assert r["n_ngrams"] == len(grams)
            if grams:
                c = Counter(grams)
                assert r["dup_ngram_frac"] == 1.0 - len(c) / len(grams)
                assert r["top_ngram_frac"] == max(c.values()) / len(grams)
            else:
                assert r["dup_ngram_frac"] == 0.0 == r["top_ngram_frac"]

    check()


def test_balance_sources_downsamples_to_smallest(spark):
    """Skewed sources → every source lands within hash noise of the
    smallest source's size; the smallest source is kept whole; output is
    partitioning-independent (pure deterministic-hash filter)."""
    rows = [(i, "big") for i in range(2000)] + \
           [(10_000 + i, "mid") for i in range(600)] + \
           [(20_000 + i, "small") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = pipeline.balance_sources(docs)
    counts = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    assert counts["small"] == 200                 # kept whole
    for s in ("big", "mid"):
        assert 150 <= counts[s] <= 250            # ≈200 within hash noise
    # repartitioning must not change the surviving id set
    again = {r["doc_id"] for r in
             pipeline.balance_sources(docs.repartition(13)).collect()}
    assert again == {r["doc_id"] for r in out.collect()}


def test_chunk_dedup_planted_duplicates(spark):
    """Chunk-level dedup: a chunk appearing in two docs counts as a dup in
    the LATER (doc_id, chunk_idx) holder only; per-doc fractions follow."""
    A = " ".join(f"a{i}" for i in range(4))       # 4-token chunk body
    B = " ".join(f"b{i}" for i in range(4))
    C = " ".join(f"c{i}" for i in range(4))
    rows = [
        (1, f"{A} {B}"),      # chunks: A, B — both canonical
        (2, f"{A} {C}"),      # A is a dup of doc1's, C canonical
        (3, B),               # dup of doc1 chunk 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in pipeline.chunk_dedup(docs, chunk=4).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 0
    assert out[2]["n_chunks"] == 2 and out[2]["n_dup_chunks"] == 1
    assert out[2]["dup_chunk_frac"] == 0.5
    assert out[3]["n_chunks"] == 1 and out[3]["n_dup_chunks"] == 1
    assert out[3]["dup_chunk_frac"] == 1.0


def test_bigram_lm_score_matches_python_model(spark):
    """Exact bits-per-token vs an independent Python add-one bigram LM."""
    import collections

    rows = [(1, "a b a b a"), (2, "a b c"), (3, "c c c c"), (4, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    texts = {i: t.split() for i, t in rows}
    bigrams = [(w1, w2) for t in texts.values() for w1, w2 in zip(t, t[1:])]
    c12 = collections.Counter(bigrams)
    c1 = collections.Counter(w1 for w1, _ in bigrams)
    vocab = len({w for t in texts.values() for w in t})
    out = {r["id"]: r for r in pipeline.bigram_lm_score(docs).collect()}
    assert 4 not in out  # single-token doc has no bigrams
    for i, toks in texts.items():
        if len(toks) < 2:
            continue
        logs = [math.log2((c12[(w1, w2)] + 1) / (c1[w1] + vocab))
                for w1, w2 in zip(toks, toks[1:])]
        expect = round(-sum(logs) / len(logs), 8)
        assert out[i]["n_bigrams"] == len(logs)
        assert abs(out[i]["bits_per_token"] - expect) < 1e-9


def test_bigram_lm_join_modes(spark):
    """The count-table joins must be strategy-selectable: the bigram
    table is corpus-vocab-sized (unbounded at web scale), so a hardcoded
    broadcast hint would OOM the driver there.  True forces broadcast,
    False pins shuffle joins, None (default) leaves it to Catalyst/AQE."""
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def physical(mode):
        df = pipeline.bigram_lm_score(docs, broadcast_counts=mode)
        return df._jdf.queryExecution().executedPlan().toString()

    p_bcast = physical(True)
    assert "BroadcastHashJoin" in p_bcast
    p_shuffle = physical(False)
    assert "SortMergeJoin" in p_shuffle or "ShuffledHashJoin" in p_shuffle
    # default: results identical across modes (strategy, not semantics)
    base = {r["id"]: r["bits_per_token"]
            for r in pipeline.bigram_lm_score(docs).collect()}
    forced = {r["id"]: r["bits_per_token"]
              for r in pipeline.bigram_lm_score(docs, broadcast_counts=False).collect()}
    assert base == forced
    pipeline.release_caches()


def test_bigram_lm_cache_released_between_calls(spark):
    """Each bigram_lm_score call releases the previous call's persisted
    token stream (ADVICE r6: the old code leaked one cache per call)."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    pipeline.bigram_lm_score(docs).collect()
    assert len(pipeline._CACHED) == 1
    pipeline.bigram_lm_score(docs).collect()
    assert len(pipeline._CACHED) == 1  # previous cache evicted, not stacked
    pipeline.release_caches()
    assert not pipeline._CACHED


def test_rolling_anomaly_flags_planted_outlier(spark):
    """A stable stream with one huge spike: the spike flags, its
    neighbours don't, and the cold-start window (n < min_n) never flags."""
    from vecgo_spark.streaming.windows import rolling_anomaly
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        v = 100.0 + (i % 5)          # tight band
        if i == 50:
            v = 5000.0               # planted anomaly
        rows.append((i, base + datetime.timedelta(minutes=i), 1, "tick", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    out = {r["event_id"]: r for r in
           rolling_anomaly(ev, frame=30, min_n=10).collect()}
    assert out[50]["is_anomaly"]
    assert not any(out[i]["is_anomaly"] for i in range(60) if i not in (50, 51))
    # cold start: first min_n rows can never flag
    assert not any(out[i]["is_anomaly"] for i in range(10))


def test_rolling_anomaly_overflow_guard(spark):
    """ADVICE r6: with signed values the cross-multiplied z-test wraps
    int64 at |x_e2| > √(2⁶³−1)/(2·frame) — Spark wraps SILENTLY, so such
    inputs must raise, never flip a flag.  In-range magnitudes still
    compute (boundary exercised just below the limit)."""
    import datetime

    from vecgo_spark.streaming.windows import rolling_anomaly

    base = datetime.datetime(2024, 1, 1)
    limit = int((2**63 - 1) ** 0.5) // (2 * 100)  # frame=100 default

    def ev(val):
        rows = [(i, base + datetime.timedelta(minutes=i), 1, "t",
                 float(v), "{}")
                for i, v in enumerate([1.0] * 5 + [val])]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")

    with pytest.raises(Exception, match="overflow guard"):
        rolling_anomaly(ev(-(limit + 1))).collect()  # x_e2 = -100·(limit+1)… far past
    ok = rolling_anomaly(ev((limit - 1) / 100.0)).collect()
    assert len(ok) == 6  # boundary magnitude computes normally


def test_pattern_scrub_pii_defaults(spark):
    """The default PII patterns hit literal emails / IPv4s / phones / SSNs,
    counts are computed on the ORIGINAL text, and every match is replaced
    by its class token in the scrubbed output."""
    rows = [
        (1, "mail bob@example.com and alice@sub.example.org twice"),
        (2, "server at 10.0.0.1 and 192.168.1.255 responded"),
        (3, "call 555-123-4567 or fax 555-987-6543"),
        (4, "ssn 123-45-6789 on file"),
        (5, "nothing sensitive here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pipeline.pattern_scrub(docs).collect()}
    assert (out[1]["n_email"], out[2]["n_ipv4"], out[3]["n_phone"],
            out[4]["n_ssn"]) == (2, 2, 2, 1)
    assert all(out[5][f"n_{p}"] == 0 for p in pipeline.PII_PATTERNS)
    # scrubbed text carries the class token, not the PII
    scrubbed = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", pipeline.PII_PATTERNS["email"], "<EMAIL>"),
            pipeline.PII_PATTERNS["ipv4"], "<IPV4>").alias("s"),
    )
    joined = {r["doc_id"]: r["s"] for r in scrubbed.collect()}
    assert "bob@example.com" not in joined[1] and "<EMAIL>" in joined[1]
    assert "10.0.0.1" not in joined[2] and "<IPV4>" in joined[2]
    # an untouched doc hashes to the md5 of its original text
    import hashlib
    assert out[5]["scrubbed_md5"] == hashlib.md5(rows[4][1].encode()).hexdigest()


def test_rule_funnel_each_rule_fires(spark):
    """One constructed doc per rule; the funnel attributes each failure to
    exactly the intended rule and passes the one clean doc."""
    ok = "the cat and dog ran off to the old red barn in town " * 3  # 36 toks
    rows = [
        (1, "s", ok),
        (2, "s", "the and of to in just six little words"),     # < 30 tokens
        (3, "s", " ".join(["a an it to of in be"] * 10)),        # mean len < 3
        (4, "s", ("the extraordinarily magnificent incomprehensibilities "
                  "of unquestionably characteristic internationalization "
                  "and straightforwardly uncharacteristically " * 8)),  # mean > 10? no-stop? 
        (5, "s", " ".join(["word"] * 40)),                       # no stopwords
        (6, "s", "### $$$ %%% " * 20 + "the cat and dog " * 10), # symbol heavy
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pipeline.rule_funnel(docs, min_tokens=30).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 6
    assert r["f_low_tokens"] >= 1          # doc 2
    assert r["f_short_words"] >= 1         # doc 3
    assert r["f_low_stopword"] >= 1        # doc 5
    assert r["f_symbol_heavy"] >= 1        # doc 6
    # the clean doc passes every rule
    assert r["n_pass"] >= 1


def test_rule_funnel_matches_python_model(spark):
    """Exact-integer parity with a python re-implementation on the module
    docs fixture (arbitrary real-ish text)."""
    rows = [(i, f"src{i % 2}", t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog and runs to town",
        "a b c d e",
        "symbols !!! ??? *** and the usual words of a line in the text",
        "word " * 50,
    ])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in pipeline.rule_funnel(docs, min_tokens=5).collect()}

    import collections
    model = collections.defaultdict(lambda: collections.Counter())
    for _i, src, text in rows:
        toks = [t for t in text.lower().split() if t]
        n, total = len(toks), sum(len(t) for t in toks)
        nstop = sum(1 for s in ("the", "a", "of", "and", "to", "in") if s in toks)
        nonws = len("".join(text.split()))
        alnum = sum(1 for c in text.lower() if c.isalnum() and c.isascii())
        f = {
            "f_low_tokens": n < 5, "f_high_tokens": n > 10_000,
            "f_short_words": total < 3 * n, "f_long_words": total > 10 * n,
            "f_low_stopword": nstop < 2,
            "f_symbol_heavy": 10 * (nonws - alnum) > 3 * nonws,
        }
        m = model[src]
        m["n_docs"] += 1
        for k, v in f.items():
            m[k] += int(v)
        m["n_pass"] += int(not any(f.values()))
    for src, m in model.items():
        for k in m:
            assert got[src][k] == m[k], (src, k, got[src][k], m[k])


def test_kmv_estimate_accuracy_and_exact_path(spark):
    """A 3000-distinct group estimates within ±25% (k=64 ⇒ ~12% rel.
    error); a group under k distinct returns the exact count; the
    prefilter and partitioning change nothing."""
    rows = [("big", f"v{i % 3000}") for i in range(9000)]
    rows += [("small", f"w{i}") for i in range(40)] * 2
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {r["grp"]: r for r in
           pipeline.kmv_distinct(df, "grp", "val", k=64).collect()}
    assert out["small"]["est_distinct"] == 40.0 and out["small"]["n_min"] == 40
    assert abs(out["big"]["est_distinct"] - 3000) / 3000 < 0.25
    # prefilter keeps the k-min prefix ⇒ identical output
    pre = {r["grp"]: r for r in
           pipeline.kmv_distinct(df, "grp", "val", k=64, prefilter_bits=3).collect()}
    assert pre["big"]["est_distinct"] == out["big"]["est_distinct"]
    # partitioning invariance (sketch is a function of the value SET)
    rep = {r["grp"]: r for r in
           pipeline.kmv_distinct(df.repartition(7), "grp", "val", k=64).collect()}
    assert rep["big"]["est_distinct"] == out["big"]["est_distinct"]
    # ADVICE r6: a prefiltered group with < k survivors is a 1/2^s census
    # of its value set — the estimate must scale by 2^s, not report the
    # raw survivor count (which undercounted ~2^s×)
    from vecgo_spark.functions.hashing import stable_hash64_py

    survivors = sum(
        1 for i in range(40) if stable_hash64_py(f"w{i}") < (1 << 57)
    )
    assert pre["small"]["n_min"] == survivors
    assert pre["small"]["est_distinct"] == survivors * 8.0
    assert 40 * 0.25 <= pre["small"]["est_distinct"] <= 40 * 4  # sane scale


def test_weighted_sample_matches_python_model(spark):
    """Global and grouped top-k match the exact python priority model,
    independent of input partitioning."""
    from vecgo_spark.functions.hashing import stable_hash64_py

    rows = [(i, "g%d" % (i % 3), (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")

    pri = {i: stable_hash64_py(str(i)) / w for i, _g, w in rows}
    want = sorted(pri, key=lambda i: (pri[i], i))[:10]
    got = [r["doc_id"] for r in
           pipeline.weighted_sample(df.repartition(5), "w", 10, id_col="doc_id").collect()]
    assert got == want

    by_g = {}
    for i, g, w in rows:
        by_g.setdefault(g, []).append(i)
    want_g = {
        g: sorted(ids, key=lambda i: (pri[i], i))[:4] for g, ids in by_g.items()
    }
    out = pipeline.weighted_sample(df, "w", 4, id_col="doc_id", group_col="src")
    got_g = {}
    for r in out.collect():
        got_g.setdefault(r["src"], []).append(r["doc_id"])
    assert got_g == want_g


def test_weighted_sample_favors_heavy_items(spark):
    """With 10 heavy (w=1000) and 990 light (w=1) items, most heavy items
    make a k=50 sample — the monotone-in-weight inclusion property."""
    rows = [(i, 1000 if i < 10 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {r["doc_id"] for r in
              pipeline.weighted_sample(df, "w", 50, id_col="doc_id").collect()}
    assert len(picked & set(range(10))) >= 8


def test_bloom_decontaminate_superset_and_exact_copy(spark):
    """Bloom prescreen: no false negatives (flags ⊇ true overlap), an
    exact benchmark copy flags 100%, and the corpus-side plan carries NO
    join — the benchmark rides as a plan literal."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text),                                   # exact copy
        (2, "alpha beta gamma completely different tail"),  # partial
        (3, "totally unrelated words nowhere in benchmark x y z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           pipeline.bloom_decontaminate(docs, bench, n=3).collect()}
    assert out[1]["flag_frac"] == 1.0
    assert out[2]["n_flagged"] >= 1          # shares 'alpha beta gamma'
    assert out[3]["n_flagged"] <= out[3]["n_shingles"]  # fp allowed, bounded
    # exact-join truth is a subset of the bloom flags per doc
    truth = {r["doc_id"]: r["n_shared_shingles"] for r in
             pipeline.contamination_overlap(docs, bench, n=3).collect()}
    for d, n_shared in truth.items():
        assert out[d]["n_flagged"] >= n_shared
    # corpus side must not join anything: benchmark is a literal bitset
    # (built via ONE parsed F.expr — per-element F.lit chatter cost
    # seconds of plan construction per query, r11 profiling)
    plan = pipeline.bloom_decontaminate(docs, bench, n=3)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_dsir_importance_matches_python_model(spark):
    """Exact log-weight parity vs an independent Python add-one model
    over hashed distinct bigrams, and the directional property: a doc
    made of target-domain text outweighs an off-domain doc."""
    import math

    from vecgo_spark.functions.hashing import stable_hash64_py

    B = 64  # small bucket space to force collisions through the model
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "der schnelle braune fuchs springt ueber den faulen hund"),
        (3, "the quick brown fox naps under the shady tree"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where(F.col("doc_id") == 1)

    def doc_buckets(text):
        toks = text.lower().split()
        grams = sorted({" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)})
        return [stable_hash64_py(g) % B for g in grams]

    c_r, c_t = {}, {}
    for i, t in rows:
        for b in doc_buckets(t):
            c_r[b] = c_r.get(b, 0) + 1
            if i == 1:
                c_t[b] = c_t.get(b, 0) + 1
    n_r, n_t = sum(c_r.values()), sum(c_t.values())
    want = {}
    for i, t in rows:
        bs = doc_buckets(t)
        w = sum(math.log((c_t.get(b, 0) + 1) / (n_t + B))
                - math.log((c_r.get(b, 0) + 1) / (n_r + B)) for b in bs)
        want[i] = (len(bs), round(w, 6))
    got = {r["doc_id"]: (r["n_grams"], r["log_weight"]) for r in
           pipeline.dsir_importance(docs, target, n=2, buckets=B).collect()}
    assert got == want
    assert got[3][1] > got[2][1]  # shares target bigrams > off-domain


def test_token_budget_mixture_model_and_invariance(spark):
    """Exact python-model parity (hash-ordered greedy prefix per source,
    crossing doc included), partition independence, and budgetless
    sources dropped."""
    from vecgo_spark.functions.hashing import stable_hash64_py

    rows = [(i, ["a", "b", "c"][i % 3], "w " * ((i % 9) + 1)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"a": 40, "b": 7}

    want = {}
    for src, budget in budgets.items():
        docs = [(stable_hash64_py(str(i)), i, len(t.split()))
                for i, s, t in rows if s == src]
        cum = 0
        for _pri, i, n in sorted(docs):
            if cum < budget:
                cum += n
                want[i] = (src, n, cum)
    got = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
           for r in pipeline.token_budget_mixture(df, budgets).collect()}
    assert got == want
    assert all(src != "c" for src, _, _ in got.values())
    # budget reached: final cum per source >= budget (crossing doc kept)
    for src, budget in budgets.items():
        assert max(c for s, _, c in got.values() if s == src) >= budget
    # partition-count AND bucket-count independence: full tuples, not
    # just the selected id set (cum_tokens must be the identical prefix
    # sum no matter how the two-phase buckets slice the stream)
    got2 = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
            for r in pipeline.token_budget_mixture(
                df.repartition(11), budgets).collect()}
    assert got2 == got
    got3 = {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"])
            for r in pipeline.token_budget_mixture(
                df.coalesce(1), budgets, bucket_bits=2).collect()}
    assert got3 == got
    with pytest.raises(ValueError, match="bucket_bits"):
        pipeline.token_budget_mixture(df, budgets, bucket_bits=0)


def test_rolling_anomaly_limit_scales_with_z(spark):
    """Review r7: the overflow limit must tighten with z — z²·var_n2 is
    the binding term for z ≥ 3, so a magnitude that passes at z=2 raises
    at z=4 instead of silently wrapping the RHS."""
    import datetime

    from vecgo_spark.streaming.windows import anomaly_x_limit, rolling_anomaly

    assert anomaly_x_limit(100, 2) == 2 * anomaly_x_limit(100, 4)
    base = datetime.datetime(2024, 1, 1)
    lim4 = anomaly_x_limit(100, 4)
    val = (lim4 + 50) / 100.0  # passes z=2's limit, exceeds z=4's
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "t", val, "{}")
            for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    assert len(rolling_anomaly(ev, z=2).collect()) == 5
    with pytest.raises(Exception, match="overflow guard"):
        rolling_anomaly(ev, z=4).collect()


def test_token_budget_mixture_edge_inputs(spark):
    """Review r7: empty budgets raise instead of crashing/emitting broken
    SQL, and quoted source names survive the SQL twin."""
    df = spark.createDataFrame([(1, "a", "x y z")],
                               "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="at least one source"):
        pipeline.token_budget_mixture(df, {})
    with pytest.raises(ValueError, match="at least one source"):
        pipeline.token_budget_mixture_sql({})
    sql = pipeline.token_budget_mixture_sql({"o'reilly": 10})
    assert "'o''reilly'" in sql


def test_dsir_persist_grams_identical_and_released(spark):
    """r7 verdict stretch: persist_grams=True must not change a single
    value (it only dedups the two corpus scans) and must register its
    cache for release_caches()."""
    rows = [(i, f"tok{i % 5} tok{i % 3} tok{i % 7} common words here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where(F.col("doc_id") % 4 == 0)
    base = sorted(map(tuple, pipeline.dsir_importance(docs, target, n=2, buckets=64).collect()))
    pipeline.release_caches()
    assert not pipeline._CACHED
    got = sorted(map(tuple, pipeline.dsir_importance(
        docs, target, n=2, buckets=64, persist_grams=True).collect()))
    assert got == base
    assert pipeline._CACHED  # gram stream registered
    pipeline.release_caches()
    assert not pipeline._CACHED


def test_dsir_target_pred_identical_single_stream(spark):
    """r14: the predicate-target form (one flagged gram stream, no second
    tokenize of the slice) must produce value-identical results to the
    DataFrame-target form, with and without persist_grams, and reject
    ambiguous target arguments."""
    rows = [(i, f"tok{i % 5} tok{i % 3} tok{i % 7} common words here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pred = F.col("doc_id") % 4 == 0
    base = sorted(map(tuple, pipeline.dsir_importance(
        docs, docs.where(pred), n=2, buckets=64).collect()))
    got = sorted(map(tuple, pipeline.dsir_importance(
        docs, None, n=2, buckets=64, target_pred=pred).collect()))
    assert got == base
    pipeline.release_caches()
    got_p = sorted(map(tuple, pipeline.dsir_importance(
        docs, None, n=2, buckets=64, persist_grams=True,
        target_pred=pred).collect()))
    assert got_p == base
    pipeline.release_caches()
    with pytest.raises(ValueError, match="exactly one"):
        pipeline.dsir_importance(docs, docs.where(pred), target_pred=pred)
    with pytest.raises(ValueError, match="exactly one"):
        pipeline.dsir_importance(docs, None)


def test_tfidf_keywords_python_model(spark):
    """Exact parity with the brute-force model: score = tf·ln(N/df)
    rounded to 6 BEFORE ranking, ties on term asc, k per doc; a term in
    every doc scores 0."""
    import math
    from collections import Counter

    rows = [
        (1, "apple banana apple cherry common"),
        (2, "banana banana durian common"),
        (3, "cherry elderberry common apple common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n = len(rows)
    tfs = {i: Counter(t.split()) for i, t in rows}
    df_ = Counter(term for c in tfs.values() for term in c)
    want = {}
    for i, c in tfs.items():
        scored = sorted(
            ((round(math.log(n / df_[t]) * tf, 6), t, tf) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]))
        want[i] = [(r + 1, t, tf, df_[t], sc)
                   for r, (sc, t, tf) in enumerate(scored[:3])]
    got = {}
    for r in pipeline.tfidf_keywords(docs, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["doc_freq"], r["tfidf"]))
    assert got == want
    # 'common' is in every doc → idf 0 → never a top keyword over others
    assert all(t != "common" or sc == 0.0
               for kws in got.values() for _, t, _, _, sc in kws)
