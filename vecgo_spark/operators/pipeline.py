"""Training-data pipeline operators beyond the reference surface:
benchmark-contamination n-gram overlap, deterministic hash sampling,
sequence packing by token budget, and within-corpus n-gram novelty.

Each operator is a pure DataFrame plan (no driver collects, no Python
UDFs) with a DuckDB oracle twin so the driver can bit-check it.

Scale posture (100 TB):
- contamination_overlap streams corpus shingles through a broadcast
  hash join against the (small, by construction) benchmark shingle set —
  one narrow scan + one groupBy(id) shuffle.
- hash_sample is a pure filter on a deterministic 60-bit hash: fully
  pushable, no shuffle, reproducible across runs/engines (unlike
  df.sample, whose output depends on partitioning).
- pack_sequences shards by hash first, then packs each shard with one
  bounded window — no global sort, shards pack independently exactly the
  way a 1000-executor writer would emit independent output files.
- doc_novelty is two groupBys over the shingle stream (df stats + per-doc
  fold) — no self-join, so no quadratic hot-shingle risk at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from vecgo_spark.functions.hashing import stable_hash64, stable_hash64_sql
from vecgo_spark.functions.vector import long_array_expr
from vecgo_spark.operators.dedup import _doc_shingles

_TOKS_SQL = "list_filter(string_split_regex(lower({c}), '[\\x00-\\x20]+'), t -> t != '')"

# Persisted intermediates owned by operators in this module (currently the
# bigram-LM tokenized stream).  Same stance as bm25._CACHED: persists live
# until the caller releases them, so repeated invocations in one session
# don't leak storage without bound.
_CACHED: list = []


def release_caches() -> None:
    """Unpersist every DataFrame cached by this module's operators
    (callers scoring many corpora should call this between corpora)."""
    while _CACHED:
        _CACHED.pop().unpersist()

_HASH_BUCKETS = 1_000_000


def _shingle_cte(table: str, id_col: str, text_col: str, n: int) -> str:
    """DuckDB (id, shingle) DISTINCT twin of dedup._doc_shingles."""
    from vecgo_spark.functions.hashing import shingles_sql

    toks = _TOKS_SQL.format(c=text_col)
    return (
        f"SELECT DISTINCT {id_col} AS id, unnest({shingles_sql(f'({toks})', n)}) AS shingle "
        f"FROM {table}"
    )


# ------------------------------------------------------- contamination

def contamination_overlap(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, count
    distinct n-gram shingles it shares with any benchmark document, and
    how many benchmark documents it touches.

    The standard decontamination primitive for LLM training corpora
    (n-gram overlap against eval sets). The benchmark side is broadcast:
    eval suites are ≤ millions of shingles even when the corpus is 100 TB.
    """
    c = _doc_shingles(docs, id_col, text_col, n)
    b = _doc_shingles(bench, id_col, text_col, n).withColumnRenamed("id", "bench_id")
    ch = c.select("id", stable_hash64("shingle").alias("h"))
    bh = b.select("bench_id", stable_hash64("shingle").alias("h"))
    return (
        ch.join(F.broadcast(bh), "h")
        .groupBy("id")
        .agg(
            F.countDistinct("h").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .withColumnRenamed("id", id_col)
        .orderBy(id_col)
    )


def contamination_overlap_sql(
    docs_pred: str,
    bench_pred: str,
    docs_table: str = "documents",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    h = stable_hash64_sql("shingle")
    return f"""
    WITH corpus AS ({_shingle_cte(f"(SELECT * FROM {docs_table} WHERE {docs_pred})", id_col, text_col, n)}),
    bench AS ({_shingle_cte(f"(SELECT * FROM {docs_table} WHERE {bench_pred})", id_col, text_col, n)}),
    ch AS (SELECT id, {h} AS h FROM corpus),
    bh AS (SELECT id AS bench_id, {h} AS h FROM bench)
    SELECT ch.id AS {id_col},
           count(DISTINCT ch.h) AS n_shared_shingles,
           count(DISTINCT bh.bench_id) AS n_bench_docs
    FROM ch JOIN bh USING (h)
    GROUP BY ch.id
    ORDER BY {id_col}
    """


# ---------------------------------------------- bloom decontamination

BLOOM_DECON_M = 1 << 17  # bits (16 KB) — plan-literal sized
BLOOM_DECON_K = 4


def _bloom_positions_sql(expr: str, m: int, k: int) -> list[str]:
    """k Kirsch-Mitzenmacher positions pos_s = (h1 + s·h2) mod m from ONE
    md5 (hex chars 1-15 and 16-30) — identical in Spark / DuckDB /
    Python. h1 + (k−1)·h2 < k·2^60 < 2^63: no BIGINT overflow."""
    h1 = f"('0x' || substr(md5('0:' || {expr}), 1, 15))::BIGINT"
    h2 = f"('0x' || substr(md5('0:' || {expr}), 16, 15))::BIGINT"
    return [f"(({h1} + {s} * {h2}) % {m})" for s in range(k)]


def _bloom_positions(c, m: int, k: int) -> list:
    """Spark twin of _bloom_positions_sql."""
    md5 = F.md5(F.concat(F.lit("0:"), c))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 16, 15), 16, 10).cast("long")
    return [F.pmod(h1 + F.lit(s) * h2, F.lit(m)) for s in range(k)]


def bloom_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_DECON_M,
    k: int = BLOOM_DECON_K,
) -> DataFrame:
    """Bloom-filter benchmark-overlap prescreen — the 100 TB shape of
    contamination_overlap: per corpus document, how many of its distinct
    n-gram shingles MIGHT appear in the benchmark (bloom hit) vs its
    total distinct shingles.

    Scale posture: the benchmark folds into an m-bit bloom (16 KB at the
    default) embedded as a PLAN LITERAL — the corpus side is a map-only
    scan + one groupBy(id); no join against benchmark shingles at all,
    and the probe costs ONE md5 per shingle (k positions derive from one
    hash, Kirsch-Mitzenmacher (h1 + s·h2) mod m). contamination_overlap
    remains the exact-join verifier for flagged docs.

    False positives are ~(1−e^{−kn/m})^k (≈0.4% at 5k bench shingles,
    m=2^17, k=4) and DETERMINISTIC — both engines compute the identical
    bit vector and probes, so the oracle matches bit-for-bit including
    every false positive. Misses never happen (a bloom has no false
    negatives): n_flagged is a guaranteed superset count of true overlap.
    """

    # build: benchmark shingles → k positions each → ONE distinct on the
    # positions (deduping shingles first would only add an exchange — the
    # position set is what the bit vector needs). The collect is bounded
    # by min(k·#bench_shingles, m) ≤ m ints — eval suites are small by
    # construction; the corpus never flows here.
    bsh = _doc_shingles(bench, id_col, text_col, n)
    pos_rows = (
        bsh.select(F.explode(F.array(*_bloom_positions(F.col("shingle"), m, k))).alias("p"))
        .distinct().collect()
    )
    bits = bytearray(m // 8)
    for r in pos_rows:
        p = int(r["p"])
        bits[p >> 3] |= 1 << (p & 7)
    words = [int.from_bytes(bits[i:i + 8], "little", signed=True)
             for i in range(0, len(bits), 8)]
    # the m/64-word bit vector stays a PLAN LITERAL (codegen-friendly,
    # join-free) but is built as ONE parsed SQL expression: F.lit() on a
    # 2048-element array costs ~1-2.5s of per-element py4j chatter PER
    # QUERY BUILD (measured r11 — it had become the query's single
    # biggest cost and the source of its r10 bench drift), while
    # F.expr("array(...)") hands Catalyst one ~20 KB string to parse
    # JVM-side in ~20 ms. Same literal in the optimized plan either way.
    words_lit = long_array_expr(words)
    pow2 = long_array_expr([1 << b if b < 63 else -(1 << 63)
                            for b in range(64)])

    # r15 measured-and-REJECTED (VERDICT r14 Next #6): riding the two
    # arrays on a one-row BROADCAST relation (crossJoin(F.broadcast(
    # createDataFrame([...])))) shrinks the executed plan 46->12 KB and
    # the oracle stays MATCH, but the interleaved A/B showed +33%
    # (0.839->1.119 s best-of): the broadcast build job + BNLJ column
    # reads cost more than the literal's analysis/codegen, which codegen
    # treats as constants (plans/r15/docs_bloom_decontam_rejected_
    # broadcast.txt is the rejected plan). Same lesson as the bm25
    # in-plan-stats rejection: at per-query serve latency, a bounded
    # plan literal beats an extra broadcast exchange.
    # r14: bind both literal arrays behind eval_once barrier columns so
    # the plan references each ONCE — the 4 probes each inlined both
    # arrays (CollapseProject), a 285 KB executed plan whose analysis/
    # codegen cost ~0.4 s of build and ~0.3 s of exec per call at sf0.1
    # (47 KB / both roughly halved with the barrier; bit-identical flags)
    from vecgo_spark.functions.hashing import eval_once

    csh = _doc_shingles(docs, id_col, text_col, n).select(
        "id", "shingle",
        eval_once(words_lit).alias("_bloom_w"),
        eval_once(pow2).alias("_pow2"),
    )
    probes = _bloom_positions(F.col("shingle"), m, k)
    hit = None
    for pos in probes:
        word = F.get(F.col("_bloom_w"), F.shiftright(pos, 6).cast("int"))
        mask = F.get(F.col("_pow2"), F.pmod(pos, F.lit(64)).cast("int"))
        one = word.bitwiseAND(mask) != F.lit(0).cast("bigint")
        hit = one if hit is None else (hit & one)
    return (
        csh.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("n_flagged"),
        )
        .select(
            F.col("id").alias(id_col), "n_shingles", "n_flagged",
            F.round(F.col("n_flagged").cast("double")
                    / F.col("n_shingles").cast("double"), 8).alias("flag_frac"),
        )
        .orderBy(id_col)
    )


def bloom_decontaminate_sql(
    docs_pred: str,
    bench_pred: str,
    docs_table: str = "documents",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = BLOOM_DECON_M,
    k: int = BLOOM_DECON_K,
) -> str:
    """DuckDB twin: a bit set in the bloom ⇔ SOME benchmark shingle
    hashes to that position, so the bit test replays as set membership —
    a corpus shingle is flagged iff ALL k of its positions appear in the
    benchmark position set (identical bits ⇒ identical flags, false
    positives included)."""
    bpos_sel = " UNION ".join(
        f"SELECT {p} AS p FROM bench" for p in _bloom_positions_sql("shingle", m, k))
    cpos = ", ".join(f"{p} AS p{s}" for s, p in
                     enumerate(_bloom_positions_sql("shingle", m, k)))
    all_in = " AND ".join(f"p{s} IN (SELECT p FROM bpos)" for s in range(k))
    return f"""
    WITH corpus AS ({_shingle_cte(f"(SELECT * FROM {docs_table} WHERE {docs_pred})", id_col, text_col, n)}),
    bench AS ({_shingle_cte(f"(SELECT * FROM {docs_table} WHERE {bench_pred})", id_col, text_col, n)}),
    bpos AS ({bpos_sel}),
    cpos AS (SELECT id, {cpos} FROM corpus),
    flagged AS (
        SELECT id, CASE WHEN {all_in} THEN 1 ELSE 0 END AS hit FROM cpos
    )
    SELECT id AS {id_col},
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(hit) AS BIGINT) AS n_flagged,
           round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8)
               AS flag_frac
    FROM flagged GROUP BY id ORDER BY {id_col}
    """


# ------------------------------------------- token-budget mixture cuts


def token_budget_mixture(
    docs: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    bucket_bits: int = 12,
) -> DataFrame:
    """Deterministic per-source TOKEN-budget selection — the mixture cut
    a pretraining run makes when its recipe says "this many tokens from
    each source" (corpus_balance counts DOCS; token budgets are what the
    trainer actually consumes).

    Per source, documents are ordered by (stable hash of id, id) — an
    unbiased, partition-independent shuffle — and the running token sum
    greedily admits documents while the PRECEDING total is under the
    source's budget, so the selection always reaches the budget (the
    crossing document is included; sources absent from `budgets` are
    dropped). Output: one row per selected doc with its running total.

    Scale posture: the running sum is a TWO-PHASE prefix sum, never a
    single window partition per source.  The priority hash's top
    `bucket_bits` bits (arithmetic shift, monotone in the signed hash)
    split each source into 2^bucket_bits deterministic range buckets
    whose concatenation in bucket order IS the global (_pri, id) order.
    Phase 1: a plain groupBy(source, bucket) token subtotal (map-side
    combined, 2^bucket_bits x #sources rows); a tiny window over that
    aggregate yields each bucket's exclusive prefix offset, broadcast
    back.  Phase 2: the running sum within each (source, bucket) — a
    window group holding ~1/4096 of a source, so a billion-doc
    mega-source spreads over thousands of tasks instead of one.
    n_tokens stays a scan-fused projection and the budgets ride as a
    literal CASE (O(#sources) plan size).  The corpus is scanned twice
    (subtotals + main leg), the same documented posture as
    dsir_importance; both scans push the budget-source filter down."""
    from vecgo_spark.operators.bm25 import tokenize_expr

    if not budgets:
        raise ValueError("token_budget_mixture: budgets must name at least one source")
    if not 1 <= bucket_bits <= 20:
        raise ValueError("token_budget_mixture: bucket_bits must be in [1, 20]")
    budget_expr = None
    for s, b in sorted(budgets.items()):
        if budget_expr is None:
            budget_expr = F.when(F.col(source_col) == s, F.lit(int(b)).cast("long"))
        else:
            budget_expr = budget_expr.when(
                F.col(source_col) == s, F.lit(int(b)).cast("long"))
    d = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens"),
        stable_hash64(F.col(id_col).cast("string"), seed=seed).alias("_pri"),
        budget_expr.alias("_budget"),
    ).where(F.col("_budget").isNotNull())
    # Deterministic range bucket: the top bucket_bits of the 60-bit
    # non-negative hash (shiftright is monotone), so bucket asc, then
    # (_pri, id) asc within bucket == global (_pri, id) asc within the
    # source.  Ties in _pri share a bucket.  60, not 64: stable_hash64
    # is 15 hex chars — a 64-bit shift would leave the top 4 bucket
    # bits always zero (2^bucket_bits/16 effective buckets).
    d = d.withColumn("_bk", F.shiftright(F.col("_pri"), 60 - bucket_bits))
    sub = d.groupBy("source", "_bk").agg(F.sum("n_tokens").alias("_sub"))
    w0 = (
        Window.partitionBy("source").orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sub.select(
        "source", "_bk",
        F.coalesce(F.sum("_sub").over(w0), F.lit(0)).cast("long").alias("_off"),
    )
    wl = (
        Window.partitionBy("source", "_bk").orderBy("_pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.col("_off") + F.sum("n_tokens").over(wl)).alias("cum_tokens")
    return (
        d.join(F.broadcast(offs), ["source", "_bk"])
        .select(id_col, "source", "n_tokens", cum, "_budget")
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("_budget"))
        .drop("_budget")
        .orderBy("source", id_col)
    )


def token_budget_mixture_sql(
    budgets: dict[str, int],
    docs_table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> str:
    if not budgets:
        raise ValueError("token_budget_mixture: budgets must name at least one source")
    toks = _TOKS_SQL.format(c=text_col)
    h = stable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    case = "CASE " + " ".join(
        "WHEN {c} = '{s}' THEN {b}".format(
            c=source_col, s=str(s).replace("'", "''"), b=int(b))
        for s, b in sorted(budgets.items())
    ) + " END"
    return f"""
    WITH d AS (
        SELECT {id_col}, {source_col} AS source,
               CAST(len({toks}) AS BIGINT) AS n_tokens,
               {h} AS pri, {case} AS budget
        FROM {docs_table}
        WHERE {case} IS NOT NULL
    ),
    c AS (
        SELECT {id_col}, source, n_tokens, budget,
               CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
        FROM d
    )
    SELECT {id_col}, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens - n_tokens < budget
    ORDER BY source, {id_col}
    """


# --------------------------------------------- DSIR importance weights

DSIR_BUCKETS = 4096


def dsir_importance(
    docs: DataFrame,
    target: DataFrame | None,
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_grams: bool = False,
    target_pred: Column | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023) over
    hashed n-gram features: per document, the log importance weight
    Σ_g log(p_target(b(g)) / p_raw(b(g))) with b(g) = hash(gram) mod B
    and add-one-smoothed bucket unigram models. High weight ⇒ the doc
    looks like the target domain; the standard pretraining-mixture
    selection signal (select top-N by weight, or sample ∝ weight).

    Scale posture: both bucket-count tables are B-row aggregates
    (B=4096 — bounded BY CONSTRUCTION, so the broadcast hint is sound at
    any corpus size, unlike a vocab-sized table); the raw side is one
    explode → broadcast-join → groupBy(id). The per-bucket log-ratio is
    computed once in the weight table, so the per-gram work is a hash,
    a join probe, and an add. The corpus is scanned twice (the c_raw
    count pass and the probe pass) — both map-only before their
    exchanges, and the count pass's shuffle carries only B-row partials
    (map-side combine).  persist_grams=True trades executor storage for
    the second scan: the hashed-gram stream (two longs per gram) is
    persisted and both legs read it, so the corpus text is tokenized
    ONCE; the cache is registered in _CACHED and released by the next
    release_caches() (r7 verdict stretch item).

    Exactness: counts are exact integers, each bucket's log-ratio is a
    deterministic double, and the per-doc cross-row sum is round(·, 6) —
    reassociation error ~1e-12, far inside the rounding absorption (the
    bigram-LM stance).

    ``target_pred`` (r14, mutually exclusive with ``target``): when the
    target domain is a predicate SLICE of ``docs`` — the common DSIR
    deployment (select raw web docs that look like the curated slice) —
    pass the predicate Column instead of a second DataFrame. The target
    leg then filters a per-gram flag carried through the ONE gram stream
    rather than tokenizing the slice a second time: c_t is bit-identical
    (per-row gram sets don't depend on other rows) and a full
    tokenize+shingle+hash pass over the slice disappears at any scale."""

    def grams(df: DataFrame) -> DataFrame:
        # distinct grams per doc (the _doc_shingles unit) — a presence
        # variant of DSIR's frequency features; repeated boilerplate
        # grams inside one doc count once
        sh = _doc_shingles(df, id_col, text_col, n)
        return sh.select("id", F.pmod(stable_hash64("shingle"), F.lit(buckets)).alias("b"))

    if (target is None) == (target_pred is None):
        raise ValueError(
            "dsir_importance: pass exactly one of target / target_pred")
    if target_pred is not None:
        flagged = _doc_shingles(docs, id_col, text_col, n, flag=target_pred).select(
            "id", F.pmod(stable_hash64("shingle"), F.lit(buckets)).alias("b"), "_t")
        if persist_grams:
            flagged = flagged.persist()
            _CACHED.append(flagged)
        raw = flagged.select("id", "b")
        c_r = raw.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
        c_t = (flagged.where(F.col("_t"))
               .groupBy("b").agg(F.count(F.lit(1)).alias("c_t")))
    else:
        raw = grams(docs)
        if persist_grams:
            raw = raw.persist()
            _CACHED.append(raw)
        c_r = raw.groupBy("b").agg(F.count(F.lit(1)).alias("c_r"))
        c_t = grams(target).groupBy("b").agg(F.count(F.lit(1)).alias("c_t"))
    n_r = c_r.agg(F.sum("c_r").alias("n_r"))
    n_t = c_t.agg(F.sum("c_t").alias("n_t"))
    # dense B-row weight table: log p_t(b) − log p_r(b), add-one smoothed
    dense = docs.sparkSession.range(buckets).select(F.col("id").cast("long").alias("b"))
    w = (
        dense.join(c_t, "b", "left").join(c_r, "b", "left")
        .crossJoin(F.broadcast(n_t)).crossJoin(F.broadcast(n_r))
        .select(
            "b",
            (F.log((F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1)).cast("double")
                   / (F.col("n_t") + F.lit(buckets)).cast("double"))
             - F.log((F.coalesce(F.col("c_r"), F.lit(0)) + F.lit(1)).cast("double")
                     / (F.col("n_r") + F.lit(buckets)).cast("double"))).alias("lw"),
        )
    )
    return (
        raw.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.round(F.sum("lw"), 6).alias("log_weight"))
        .select(F.col("id").alias(id_col), "n_grams", "log_weight")
        .orderBy(id_col)
    )


def dsir_importance_sql(
    target_pred: str,
    docs_table: str = "documents",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    h = stable_hash64_sql("shingle")
    grams = _shingle_cte(docs_table, id_col, text_col, n)
    tgt = _shingle_cte(f"(SELECT * FROM {docs_table} WHERE {target_pred})",
                       id_col, text_col, n)
    return f"""
    WITH raw0 AS ({grams}),
    raw AS (SELECT id, {h} % {buckets} AS b FROM raw0),
    tgt0 AS ({tgt}),
    tgt AS (SELECT id, {h} % {buckets} AS b FROM tgt0),
    c_r AS (SELECT b, count(*) AS c_r FROM raw GROUP BY b),
    c_t AS (SELECT b, count(*) AS c_t FROM tgt GROUP BY b),
    n_r AS (SELECT CAST(sum(c_r) AS BIGINT) AS n_r FROM c_r),
    n_t AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_t FROM c_t),
    w AS (
        SELECT d.b,
               ln(CAST(COALESCE(c_t.c_t, 0) + 1 AS DOUBLE)
                  / CAST(n_t.n_t + {buckets} AS DOUBLE))
               - ln(CAST(COALESCE(c_r.c_r, 0) + 1 AS DOUBLE)
                    / CAST(n_r.n_r + {buckets} AS DOUBLE)) AS lw
        FROM (SELECT unnest(range(0, {buckets})) AS b) d
        LEFT JOIN c_t ON c_t.b = d.b
        LEFT JOIN c_r ON c_r.b = d.b, n_t, n_r
    )
    SELECT raw.id AS {id_col},
           CAST(count(*) AS BIGINT) AS n_grams,
           round(sum(w.lw), 6) AS log_weight
    FROM raw JOIN w ON w.b = raw.b
    GROUP BY raw.id ORDER BY {id_col}
    """


# ------------------------------------------------------- hash sampling

def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    stable_hash64(str(id), seed) % 1e6 < fraction·1e6.

    Engine- and partitioning-independent (same ids survive in Spark,
    DuckDB, or a resumed job at any parallelism) — the property
    df.sample() lacks and reproducible corpus construction needs."""
    thresh = int(fraction * _HASH_BUCKETS)
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    return df.where((h % _HASH_BUCKETS) < thresh)


def hash_sample_pred_sql(fraction: float, id_col: str = "doc_id", seed: int = 0) -> str:
    thresh = int(fraction * _HASH_BUCKETS)
    return f"({stable_hash64_sql(f'CAST({id_col} AS VARCHAR)', seed=seed)} % {_HASH_BUCKETS}) < {thresh}"


# ------------------------------------------------------ sequence packing

def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_seed: int = 7,
) -> DataFrame:
    """Concat-and-chunk sequence packing: shard documents by hash, order
    each shard by id, lay token streams head-to-tail, and record where
    each document starts (shard, offset, seq_id = offset // budget).

    This is the packing layout an LLM pretraining writer emits: each
    shard is an independent token stream cut into budget-sized training
    sequences. Sharding first keeps the window bounded per shard — no
    global sort, and 1000 executors pack 1000 shards concurrently."""
    from vecgo_spark.operators.bm25 import tokenize_expr

    d = docs.select(
        F.col(id_col),
        F.size(tokenize_expr(text_col)).cast("long").alias("n_tokens"),
        (stable_hash64(F.col(id_col).cast("string"), seed=shard_seed) % n_shards).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("offset"),
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("seq_id"),
    ).orderBy(id_col)


def pack_sequences_sql(
    budget: int,
    n_shards: int = 32,
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_seed: int = 7,
) -> str:
    toks = _TOKS_SQL.format(c=text_col)
    h = stable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed=shard_seed)
    return f"""
    WITH d AS (
        SELECT {id_col}, len({toks}) AS n_tokens, {h} % {n_shards} AS shard
        FROM {docs_table}
    ),
    c AS (
        SELECT {id_col}, shard, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS "offset"
        FROM d
    )
    SELECT {id_col}, shard, n_tokens, "offset",
           CAST(floor("offset" / {budget}) AS BIGINT) AS seq_id
    FROM c
    ORDER BY {id_col}
    """


# ------------------------------------------------------- n-gram novelty

def doc_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-corpus novelty score: per document, the fraction of its
    distinct n-gram shingles that appear in no other document
    (boilerplate detector — low novelty ⇒ template/duplicated text).

    Two groupBys over the shingle stream (document frequency, then a
    per-doc fold); never a self-join, so no hot-shingle quadratic risk."""
    sh = _doc_shingles(docs, id_col, text_col, n).select(
        "id", stable_hash64("shingle").alias("h")
    )
    df_stats = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_stats, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_shingles"), 10).alias("novelty"),
        )
        .orderBy(id_col)
    )


def doc_novelty_sql(
    docs_table: str = "documents",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    h = stable_hash64_sql("shingle")
    return f"""
    WITH sh AS (SELECT id, {h} AS h FROM ({_shingle_cte(docs_table, id_col, text_col, n)})),
    dfs AS (SELECT h, count(*) AS df FROM sh GROUP BY h)
    SELECT sh.id AS {id_col},
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           round(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 10) AS novelty
    FROM sh JOIN dfs USING (h)
    GROUP BY sh.id
    ORDER BY {id_col}
    """


# --------------------------------------------------- stratified sampling

def stratified_sample(
    df: DataFrame, group_col: str, k: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic per-group sample: the k rows of each group that sort
    first by (stable_hash64(id), id) — balanced corpus mixing (equal
    representation per source/language) that is reproducible across
    engines, runs, and partitionings.

    One hash-partitioned window per group; a zipfian-hot group still
    bounds its window state to k survivors after the filter."""
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample_pred_sql(
    group_col: str, k: int, table: str = "documents",
    id_col: str = "doc_id", seed: int = 0,
) -> str:
    """DuckDB twin as a FROM-able subquery (select * of surviving rows)."""
    h = stable_hash64_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    return f"""
    SELECT * EXCLUDE (_rn) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {group_col} ORDER BY {h} ASC, {id_col} ASC) AS _rn
        FROM {table}
    ) WHERE _rn <= {k}
    """


# ------------------------------------------------------ vocabulary stats

def vocab_top_terms(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Top-k vocabulary terms by document frequency (ties → term asc) —
    the corpus profile that feeds stopword lists and tokenizer audits.
    Map-side partial agg + TakeOrdered; never a global sort of the
    vocabulary."""
    from vecgo_spark.operators.bm25 import tokenize_expr
    from vecgo_spark.operators.util import ensure_parallelism

    return (
        ensure_parallelism(docs.select(text_col))
        .select(F.explode(F.array_distinct(tokenize_expr(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(k)
    )


def vocab_top_terms_sql(
    k: int = 50, docs_table: str = "documents", text_col: str = "text"
) -> str:
    toks = _TOKS_SQL.format(c=text_col)
    return f"""
    SELECT term, count(*) AS doc_freq FROM (
        SELECT unnest(list_distinct({toks})) AS term FROM {docs_table}
    ) GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT {k}
    """


# ------------------------------------------------- repetition profiling


def repetition_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
) -> DataFrame:
    """Per-document repetition profile — the Gopher-style quality signals
    (duplicate-line fraction, duplicate n-gram fraction, top-n-gram mass)
    used to drop template/boilerplate-heavy documents from pretraining
    corpora. Beyond the reference surface (its quality layer stops at
    metadata filters).

    Columns: n_lines, dup_line_frac (1 − distinct/total over non-empty
    raw lines), n_ngrams, dup_ngram_frac (1 − distinct/total over word
    n-gram INSTANCES), top_ngram_frac (most frequent n-gram's share of
    all instances). Zero-denominator cases are 0.0 by definition.

    Scale posture: the whole profile is in-row Column HOFs — ZERO
    shuffles, embarrassingly parallel over a 100 TB scan. Distinct
    counts are linear (array_distinct); the n-gram mode (a per-key count
    elsewhere) is a linear run-length fold over the SORTED gram array
    (array_sort + F.aggregate with a struct accumulator), so no per-row
    quadratic scan and no explode/groupBy chain either.  The token and
    gram arrays sit behind eval_once barriers: without them
    CollapseProject duplicates the gram tree into every consumer
    expression (25 tokenizer copies in the old optimized plan, 7 inside
    transform lambdas — quadratic on engines without lambda-invariant
    hoisting; see hashing.eval_once + tests/test_perf_plans.py)."""
    from vecgo_spark.functions.hashing import eval_once
    from vecgo_spark.operators.bm25 import tokenize_expr

    from vecgo_spark.operators.util import ensure_parallelism

    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: l != F.lit(""))
    stage1 = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.size(lines).alias("_nl"),
        F.size(F.array_distinct(lines)).alias("_dl"),
        eval_once(tokenize_expr(F.col(text_col))).alias("_toks"),
    )
    toks = F.col("_toks")
    win = F.size(toks) - (n - 1)
    gram_tree = F.when(
        win >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(win, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stage2 = stage1.select(
        F.col(id_col), "_nl", "_dl", eval_once(gram_tree).alias("_grams")
    )
    grams = F.col("_grams")
    # max multiplicity = longest equal-run in the sorted array: one linear
    # fold. prev='' is safe — grams are non-empty by construction.
    zero = F.lit(0).cast("int")
    mode_count = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    t = F.size(grams)
    d = F.size(F.array_distinct(grams))
    nl = F.col("_nl")
    return stage2.select(
        F.col(id_col),
        nl.alias("n_lines"),
        F.when(
            nl > 0,
            F.lit(1.0) - F.col("_dl").cast("double") / nl.cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        t.alias("n_ngrams"),
        F.when(t > 0, F.lit(1.0) - d.cast("double") / t.cast("double"))
        .otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
        F.when(t > 0, mode_count.cast("double") / t.cast("double"))
        .otherwise(F.lit(0.0)).alias("top_ngram_frac"),
    )


def repetition_profile_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB twin: in-row list ops (the oracle runs at small SF, so the
    quadratic in-row mode count is fine there; the Spark plan uses the
    distributed count chain). Identical integer counts → identical double
    divisions on both sides."""
    from vecgo_spark.functions.hashing import shingles_sql

    toks = _TOKS_SQL.format(c=text_col)
    lines = f"list_filter(string_split({text_col}, chr(10)), l -> l != '')"
    grams = shingles_sql(f"({toks})", n)
    return f"""
    WITH base AS (
        SELECT {id_col}, {lines} AS lines, {grams} AS grams FROM {docs_table}
    )
    SELECT {id_col},
           CAST(len(lines) AS INT) AS n_lines,
           CASE WHEN len(lines) > 0
                THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                           / CAST(len(lines) AS DOUBLE)
                ELSE 0.0 END AS dup_line_frac,
           CAST(len(grams) AS INT) AS n_ngrams,
           CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / CAST(len(grams) AS DOUBLE)
                ELSE 0.0 END AS dup_ngram_frac,
           CASE WHEN len(grams) > 0
                THEN CAST(list_max(list_transform(list_distinct(grams),
                          g -> len(list_filter(grams, x -> x = g)))) AS DOUBLE)
                     / CAST(len(grams) AS DOUBLE)
                ELSE 0.0 END AS top_ngram_frac
    FROM base
    """


# ---------------------------------------------------- corpus mixing


def balance_sources(
    df: DataFrame, source_col: str = "source", id_col: str = "doc_id", seed: int = 0,
) -> DataFrame:
    """Uniform corpus mixing: downsample every source to ≈ the smallest
    source's size via the deterministic hash rule, yielding a balanced,
    engine-/partitioning-independent mix (no upsampling — the smallest
    source is kept whole). The standard rebalancing step when one crawl
    dominates a pretraining corpus.

    Per-source keep thresholds derive from ONE tiny groupBy(source)
    count (collected driver-side — O(#sources), the same boundedness a
    broadcast join would assume) and apply as a literal map over the same
    60-bit hash hash_sample uses, so the SQL oracle reproduces the exact
    surviving id set. At 100 TB: scan + filter, zero wide shuffles."""
    # NULL sources drop out (Spark map keys cannot be null; the SQL twin's
    # JOIN USING(source) drops them identically)
    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()
              if r[0] is not None}
    if not counts:
        return df.where(F.lit(False))
    m = min(counts.values())
    thr = {s: (m * _HASH_BUCKETS) // n for s, n in counts.items()}
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed) % _HASH_BUCKETS
    tmap = F.create_map(*[F.lit(x) for kv in thr.items() for x in kv])
    return df.where(h < tmap[F.col(source_col)])


def balance_sources_pred_cte_sql(
    docs_table: str = "documents", source_col: str = "source",
    id_col: str = "doc_id", seed: int = 0,
) -> str:
    """CTE + join predicate twin: thresholds re-derived IN SQL from the
    same counts with exact integer arithmetic ((m*B)//n), so both engines
    keep the identical id set."""
    h = stable_hash64_sql(f"CAST(d.{id_col} AS VARCHAR)", seed=seed)
    return f"""
    WITH cnt AS (SELECT {source_col}, count(*) AS n FROM {docs_table}
                 WHERE {source_col} IS NOT NULL GROUP BY {source_col}),
    mn AS (SELECT min(n) AS m FROM cnt),
    thr AS (SELECT {source_col}, (mn.m * {_HASH_BUCKETS}) // n AS t FROM cnt, mn)
    SELECT d.* FROM {docs_table} d JOIN thr USING ({source_col})
    WHERE ({h} % {_HASH_BUCKETS}) < thr.t
    """


# ------------------------------------------------- chunk-level dedup


def chunk_dedup(
    docs: DataFrame, chunk: int = 64,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Paragraph/chunk-granular exact dedup — the CCNet-style step that
    removes boilerplate shared ACROSS documents that whole-doc dedup
    cannot see. Each doc splits into non-overlapping `chunk`-token
    windows; a chunk is a duplicate iff an identical chunk text exists
    with a smaller (doc_id, chunk_idx) anywhere in the corpus (the
    canonical copy is the smallest key — deterministic, engine-free).

    Columns: id, n_chunks, n_dup_chunks, dup_chunk_frac.

    Scale posture: chunks group on md5(chunk_text) (fixed-width shuffle
    key, same collision stance as exact_dedup); rank-1-keeps is a window
    over that hash + one groupBy(id) — two narrow shuffles, no
    self-join. A mass-repeated boilerplate chunk is ONE hot hash key
    whose window only ranks (no pair blowup)."""
    from vecgo_spark.functions.hashing import eval_once
    from vecgo_spark.operators.bm25 import tokenize_expr

    # eval_once: keep the token array an attribute so CollapseProject
    # can't inline the tokenizer into the per-chunk slice() (one
    # tokenizer copy per consumer otherwise; see hashing.eval_once)
    from vecgo_spark.operators.util import ensure_parallelism

    toks = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        eval_once(tokenize_expr(F.col(text_col))).alias("toks"),
    ).withColumn("n_tokens", F.size("toks")).where(F.col("n_tokens") > 0)
    starts = F.sequence(F.lit(0), F.greatest(F.col("n_tokens") - 1, F.lit(0)),
                        F.lit(chunk))
    chunks = toks.select(
        "id", F.posexplode(starts).alias("chunk_idx", "start"), "toks"
    ).select(
        "id", "chunk_idx",
        F.md5(F.array_join(F.slice("toks", F.col("start") + 1, F.lit(chunk)), " "))
        .alias("h"),
    )
    w = Window.partitionBy("h").orderBy("id", "chunk_idx")
    ranked = chunks.withColumn(
        "is_dup", F.row_number().over(w) > 1)
    return (
        ranked.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_chunks"))
        .withColumn("dup_chunk_frac",
                    F.col("n_dup_chunks").cast("double")
                    / F.col("n_chunks").cast("double"))
        .orderBy("id")
    )


def chunk_dedup_sql(
    chunk: int = 64, docs_table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    toks = _TOKS_SQL.format(c=text_col)
    return f"""
    WITH sized AS (
        SELECT {id_col} AS id, toks, len(toks) AS n_tokens
        FROM (SELECT {id_col}, {toks} AS toks FROM {docs_table})
        WHERE len(toks) > 0
    ),
    chunks AS (
        SELECT id, CAST(start // {chunk} AS INT) AS chunk_idx,
               md5(array_to_string(list_slice(toks, CAST(start AS BIGINT) + 1,
                   CAST(start AS BIGINT) + {chunk}), ' ')) AS h
        FROM sized, unnest(range(0, CAST(n_tokens AS BIGINT), {chunk})) AS t(start)
    ),
    ranked AS (
        SELECT id,
               row_number() OVER (PARTITION BY h ORDER BY id, chunk_idx) > 1
                   AS is_dup
        FROM chunks
    )
    SELECT id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS dup_chunk_frac
    FROM ranked GROUP BY id ORDER BY id
    """


# ------------------------------------------------- bigram LM scoring


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    broadcast_counts: bool | None = None,
) -> DataFrame:
    """Language-model quality scoring (the CCNet/KenLM perplexity-filter
    step, here with an add-one-smoothed bigram model trained ON the
    corpus itself): per doc, bits-per-token = −Σ log2 P(w2|w1) / n with
    P(w2|w1) = (C(w1 w2)+1) / (C(w1 ·)+V). High bits = improbable word
    sequences → drop candidates.

    Exactness stance: counts and V are exact integers; the per-bigram
    log2 and the cross-row sum are double, so the published score is
    round(·, 8) — reassociation error at this magnitude is ~1e-13,
    far inside the rounding absorption (same stance as the multimodal
    entropy oracle).

    Scale posture: one groupBy over bigram instances for C12 (map-side
    combine); C1 and the vocab size are attached at COUNT-TABLE scale
    (a window over the c12 aggregate + a one-row broadcast) to form a
    single (w1, w2, lw) weight table, so the instance stream pays ONE
    join, then one groupBy(id). Docs with <2 tokens have no bigrams
    and drop out.  The weight-table join is NOT a hint-forced broadcast:
    the bigram table grows with corpus vocabulary (unbounded at web
    scale — a hardcoded broadcast OOMs the driver there), so the default
    `broadcast_counts=None` leaves the strategy to Catalyst/AQE, which
    picks a runtime broadcast when the measured table is small and a
    shuffle join otherwise.  Pass True to force the broadcast hint (known
    tiny vocab) or False to pin shuffle joins (known huge vocab); plan
    test: tests/test_pipeline.py::test_bigram_lm_join_modes.

    The tokenized stream is persisted for the job's lifetime and
    unpersisted by the next call to `release_caches()` (the bm25 _CACHED
    pattern — callers that score many corpora in one session should call
    it between runs).  NOTE (ADVICE r7): each invocation ALSO calls
    release_caches() at entry, unpersisting the stream behind any
    previously returned DataFrame — materialize (collect/write) one
    call's result before making the next call, or the first result
    silently recomputes its 4-way scan when re-used."""
    from vecgo_spark.operators.bm25 import tokenize_expr

    # persisted: FOUR subtrees consume the tokenized stream (instances,
    # C12, C1, vocab) and Spark does not CSE across join legs — without
    # this the corpus parquet is scanned and re-tokenized 4× (same stance
    # as simhash_pairs' persisted signatures).  Each call releases the
    # previous call's cache (bm25 stance), so a session scoring many
    # corpora holds at most one tokenized stream.
    from vecgo_spark.operators.util import ensure_parallelism

    release_caches()
    toks = ensure_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), tokenize_expr(F.col(text_col)).alias("toks")
    ).persist()
    _CACHED.append(toks)
    bi = toks.where(F.size("toks") >= 2).select(
        "id",
        F.explode(F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab = toks.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").alias("v"))
    # r14: pre-combine the counts into ONE (w1, w2, lw) weight table so
    # the bigram-INSTANCE stream is joined once, not twice. C1 = Σ c12
    # per w1 comes from a window over the c12 aggregate (one
    # count-table-sized exchange, replacing the groupBy + second
    # instance join); per-instance lw is the identical double (same
    # exact integer counts, same log2 expression), and the per-doc sum
    # is round(·, 8) — the documented reassociation absorption.
    c1 = F.sum("c12").over(Window.partitionBy("w1"))
    logp = F.log2((F.col("c12") + F.lit(1)).cast("double")
                  / (c1 + F.col("v")).cast("double"))
    # vocab stays a hinted broadcast: it is ONE row by construction
    w = (c12.crossJoin(F.broadcast(vocab))
         .select("w1", "w2", logp.alias("lw")))
    if broadcast_counts is True:
        w = F.broadcast(w)
    elif broadcast_counts is False:
        w = w.hint("shuffle_merge")
    return (
        bi.join(w, ["w1", "w2"])
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum("lw").alias("s"))
        .select("id", "n_bigrams",
                F.round(-F.col("s") / F.col("n_bigrams").cast("double"), 8)
                .alias("bits_per_token"))
        .orderBy("id")
    )


def bigram_lm_score_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    toks = _TOKS_SQL.format(c=text_col)
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, {toks} AS toks FROM {docs_table}
    ),
    bi AS (
        SELECT id, toks[i] AS w1, toks[i + 1] AS w2
        FROM toks, unnest(range(1, CAST(len(toks) AS BIGINT))) AS t(i)
        WHERE len(toks) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    v AS (
        SELECT count(DISTINCT t) AS v
        FROM (SELECT unnest(toks) AS t FROM toks)
    )
    SELECT bi.id, count(*) AS n_bigrams,
           round(-sum(log2(CAST(c12.c12 + 1 AS DOUBLE)
                           / CAST(c1.c1 + v.v AS DOUBLE)))
                 / CAST(count(*) AS DOUBLE), 8) AS bits_per_token
    FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    GROUP BY bi.id ORDER BY bi.id
    """


# ------------------------------------------------------- pattern scrubbing

# Default patterns: the PII classes a pretraining pipeline redacts before
# the data reaches a trainer. Every regex uses only syntax with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): literal classes,
# bounded repetition, \b word boundaries — no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b",
    "phone": "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "ssn": "\\b\\d{3}-\\d{2}-\\d{4}\\b",
}


def pattern_scrub(
    docs: DataFrame, patterns: dict[str, str] | None = None,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-document pattern redaction: count matches of each named pattern
    (on the ORIGINAL text, so counts are order-independent) and emit the
    scrubbed text's md5 + length after replacing each match with the
    uppercased pattern name token, applied in dict order (order matters
    only when patterns overlap; the SQL twin nests replaces identically).

    Scale posture: zero shuffles — regexp_count / regexp_replace are JVM
    codegen expressions, so this is embarrassingly parallel map work the
    scan absorbs; the output is one row per doc with the text itself
    dropped (only hash + length survive), so the scrub can run as a pure
    audit without rewriting 100 TB."""
    pats = PII_PATTERNS if patterns is None else patterns
    c = F.col(text_col)
    scrubbed = c
    for name, pat in pats.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.regexp_count(c, F.lit(p)).alias(f"n_{name}") for name, p in pats.items()],
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


def pattern_scrub_sql(
    docs_table: str = "documents", patterns: dict[str, str] | None = None,
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    pats = PII_PATTERNS if patterns is None else patterns
    scrub = text_col
    for name, pat in pats.items():
        scrub = f"regexp_replace({scrub}, '{pat}', '<{name.upper()}>', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{p}')) AS INT) AS n_{name}"
        for name, p in pats.items()
    )
    return f"""
    SELECT {id_col} AS doc_id, {counts},
           md5({scrub}) AS scrubbed_md5,
           CAST(length({scrub}) AS INT) AS scrubbed_len
    FROM {docs_table} ORDER BY doc_id
    """


# ----------------------------------------------------- quality rule funnel

# Gopher-style repetition/quality gates (Rae et al. 2021 §A1.1), expressed
# as pure-integer predicates so pass/fail bits are engine-bit-exact: the
# mean-word-length band [3, 10] becomes 3·n ≤ Σlen ≤ 10·n, the ≥30%-symbol
# gate becomes 10·n_symbol > 3·n_nonws.
_FUNNEL_STOPS = ("the", "a", "of", "and", "to", "in")


def rule_funnel(
    docs: DataFrame, text_col: str = "text", source_col: str = "source",
    min_tokens: int = 30, max_tokens: int = 10_000,
) -> DataFrame:
    """Per-source quality-rule attrition report: how many documents each
    Gopher-style rule would remove, and how many pass every rule — the
    filter-funnel observability a pipeline needs BEFORE committing to a
    destructive filter pass.

    Rules (fail ⇒ filtered): too few / too many whitespace tokens; mean
    token length outside [3, 10]; fewer than 2 distinct stopwords from a
    fixed 6-word set; >30% non-alphanumeric characters among non-space.

    Scale posture: all six signals are codegen Column expressions fused
    into ONE scan projection; the only exchange is the tiny
    groupBy(source) partial-agg rollup. No Python, no joins, no windows.
    The token array is bound once behind an eval_once barrier —
    CollapseProject otherwise duplicates the tokenizer tree into every
    signal (12 regex splits per row in the old optimized plan)."""
    from vecgo_spark.functions.hashing import eval_once

    c = F.col(text_col)
    tok_tree = F.filter(
        F.split(F.lower(c), "[\\x00-\\x20]+"), lambda t: t != ""
    )
    non_ws = F.length(F.regexp_replace(c, "[\\x00-\\x20]+", ""))
    n_alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    bound = docs.select(
        F.col(source_col).alias("source"),
        eval_once(tok_tree).alias("_toks"),
        non_ws.alias("_non_ws"),
        n_alnum.alias("_n_alnum"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_stop = sum(
        F.array_contains(toks, F.lit(s)).cast("int") for s in _FUNNEL_STOPS
    )
    non_ws = F.col("_non_ws")
    n_symbol = non_ws - F.col("_n_alnum")
    flagged = bound.select(
        "source",
        (n < min_tokens).cast("int").alias("f_low_tokens"),
        (n > max_tokens).cast("int").alias("f_high_tokens"),
        (total_len < 3 * n).cast("int").alias("f_short_words"),
        (total_len > 10 * n).cast("int").alias("f_long_words"),
        (n_stop < 2).cast("int").alias("f_low_stopword"),
        (10 * n_symbol > 3 * non_ws).cast("int").alias("f_symbol_heavy"),
    )
    fail_cols = [f.name for f in flagged.schema.fields if f.name.startswith("f_")]
    any_fail = sum(F.col(f) for f in fail_cols)
    return (
        flagged.withColumn("pass", (any_fail == 0).cast("int"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum(f).alias(f) for f in fail_cols],
            F.sum("pass").alias("n_pass"),
        )
        .orderBy("source")
    )


def rule_funnel_sql(
    docs_table: str = "documents", text_col: str = "text", source_col: str = "source",
    min_tokens: int = 30, max_tokens: int = 10_000,
) -> str:
    toks = _TOKS_SQL.format(c=text_col)
    n = f"len({toks})"
    total_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    n_stop = " + ".join(
        f"(CASE WHEN list_contains({toks}, '{s}') THEN 1 ELSE 0 END)"
        for s in _FUNNEL_STOPS
    )
    non_ws = f"length(regexp_replace({text_col}, '[\\x00-\\x20]+', '', 'g'))"
    n_alnum = f"length(regexp_replace(lower({text_col}), '[^a-z0-9]', '', 'g'))"
    return f"""
    WITH flagged AS (
        SELECT {source_col} AS source,
               (CASE WHEN {n} < {min_tokens} THEN 1 ELSE 0 END) AS f_low_tokens,
               (CASE WHEN {n} > {max_tokens} THEN 1 ELSE 0 END) AS f_high_tokens,
               (CASE WHEN COALESCE({total_len}, 0) < 3 * {n} THEN 1 ELSE 0 END) AS f_short_words,
               (CASE WHEN COALESCE({total_len}, 0) > 10 * {n} THEN 1 ELSE 0 END) AS f_long_words,
               (CASE WHEN ({n_stop}) < 2 THEN 1 ELSE 0 END) AS f_low_stopword,
               (CASE WHEN 10 * ({non_ws} - {n_alnum}) > 3 * {non_ws} THEN 1 ELSE 0 END) AS f_symbol_heavy
        FROM {docs_table}
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_low_tokens) AS BIGINT) AS f_low_tokens,
           CAST(sum(f_high_tokens) AS BIGINT) AS f_high_tokens,
           CAST(sum(f_short_words) AS BIGINT) AS f_short_words,
           CAST(sum(f_long_words) AS BIGINT) AS f_long_words,
           CAST(sum(f_low_stopword) AS BIGINT) AS f_low_stopword,
           CAST(sum(f_symbol_heavy) AS BIGINT) AS f_symbol_heavy,
           CAST(sum(CASE WHEN f_low_tokens + f_high_tokens + f_short_words
                         + f_long_words + f_low_stopword + f_symbol_heavy = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flagged GROUP BY source ORDER BY source
    """


# ------------------------------------------------------ KMV distinct sketch

_H60_MAX = float(1 << 60)  # stable_hash64 domain (15 hex chars)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64,
    prefilter_bits: int = 0,
) -> DataFrame:
    """Per-group distinct-count estimate from a K-Minimum-Values sketch
    (Bar-Yossef et al. 2002): dedupe (group, h) pairs, keep the k smallest
    distinct hashes per group, estimate (k−1)/normalized kth-min. Exact
    (= the distinct count) whenever a group holds fewer than k distinct
    values. Deterministic — the sketch is a pure function of the value
    SET, independent of partitioning and row order, so the DuckDB twin is
    bit-identical (the estimate is two IEEE divisions, both exact).

    Scale posture: the (group, h) dedupe gets map-side partial
    aggregation (the wide exchange carries distinct pairs only); the
    per-group k-smallest is a bounded window. For groups with billions of
    distinct values the window's sort dominates — set prefilter_bits=s to
    drop hashes ≥ 2^60/2^s BEFORE the shuffle (the kth-min is unchanged
    while every group keeps ≥ k surviving hashes, because only large
    hashes are discarded).

    Prefiltered groups with FEWER than k survivors (ADVICE r6): the
    survivors are a complete census of hashes below the threshold — a
    uniform 1/2^s sample of the value set — so the estimate is
    n_min·2^s (a standard threshold-sketch estimate), NOT the raw n_min
    the old code reported (which silently undercounted ~2^s×).  Without
    a prefilter, n_min<k remains exact.

    Small-group variance caveat (ADVICE r7): the ×2^s scaling removes
    the old "exact when distinct < k" guarantee FOR PREFILTERED
    sketches — a low-cardinality group whose few hashes all happen to
    fall under the threshold reports up to 2^s× its true count (e.g. 3
    distinct → 12 at prefilter_bits=2).  Don't prefilter when small
    groups matter; the threshold estimator's relative error only
    concentrates for groups with ≫ 2^s distinct values."""
    h = stable_hash64(F.col(value_col))
    pairs = df.select(F.col(group_col).alias("grp"), h.alias("h"))
    if prefilter_bits:
        pairs = pairs.where(F.col("h") < F.lit((1 << 60) >> prefilter_bits))
    dedup = pairs.groupBy("grp", "h").agg(F.lit(1).alias("_one")).drop("_one")
    w = Window.partitionBy("grp").orderBy("h")
    topk = dedup.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    underfull = F.col("n_min").cast("double") * F.lit(float(1 << prefilter_bits))
    return (
        topk.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_min"), F.max("h").alias("kth"))
        .select(
            F.col("grp").alias(group_col),
            "n_min",
            F.when(F.col("n_min") < k, underfull)
            .otherwise(
                F.lit(float(k - 1))
                / (F.col("kth").cast("double") / F.lit(_H60_MAX))
            )
            .alias("est_distinct"),
        )
        .orderBy(group_col)
    )


def kmv_distinct_sql(
    table: str, group_col: str, value_col: str, k: int = 64,
    prefilter_bits: int = 0,
) -> str:
    h = stable_hash64_sql(value_col)
    pre = f"WHERE {h} < {(1 << 60) >> prefilter_bits}" if prefilter_bits else ""
    return f"""
    WITH dedup AS (
        SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {table} {pre}
    ),
    topk AS (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM dedup
    ),
    agg AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n_min, max(h) AS kth
        FROM topk WHERE rn <= {k} GROUP BY grp
    )
    SELECT grp AS {group_col}, n_min,
           CASE WHEN n_min < {k}
                THEN CAST(n_min AS DOUBLE) * {float(1 << prefilter_bits)!r}
                ELSE {float(k - 1)!r} / (CAST(kth AS DOUBLE) / {_H60_MAX!r})
           END AS est_distinct
    FROM agg ORDER BY {group_col}
    """


# ------------------------------------------------------- weighted sampling

def weighted_sample(
    df: DataFrame, weight_col: str, k: int, id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling: priority = stable_hash(id) / w,
    keep the k smallest priorities (per group when group_col is given).
    Higher weight ⇒ stochastically smaller priority ⇒ higher inclusion
    odds; the mixture-sampling step of corpus construction, reproducible
    across runs, engines and partitionings. The priority is ONE IEEE
    division of a 60-bit-hash double by the weight — bit-exact in the
    DuckDB twin (u^(1/w) Efraimidis–Spirakis keys would need pow(),
    which is not bit-portable across engines; the uniform/weight rank
    keeps the same monotone-in-weight inclusion property).

    Scale posture: global top-k is TakeOrderedAndProject (per-partition
    heaps + driver merge of k·P rows, no global sort); grouped top-k is
    one hashpartitioning window. Weights ≤ 0 are excluded (they cannot
    be sampled)."""
    wgt = F.col(weight_col).cast("double")
    pri = stable_hash64(F.col(id_col).cast("string")).cast("double") / wgt
    base = df.where(wgt > 0).withColumn("priority", pri)
    if group_col is None:
        return (
            base.select(id_col, weight_col, "priority")
            .orderBy(F.col("priority").asc(), F.col(id_col).asc())
            .limit(k)
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col("priority").asc(), F.col(id_col).asc())
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(group_col, id_col, weight_col, "priority")
        .orderBy(group_col, "priority", id_col)
    )


def weighted_sample_sql(
    table: str, weight_col: str, k: int, id_col: str = "doc_id",
    group_col: str | None = None,
) -> str:
    h = stable_hash64_sql(f"CAST({id_col} AS VARCHAR)")
    pri = f"CAST({h} AS DOUBLE) / CAST({weight_col} AS DOUBLE)"
    if group_col is None:
        return f"""
        SELECT {id_col}, {weight_col}, {pri} AS priority
        FROM {table} WHERE CAST({weight_col} AS DOUBLE) > 0
        ORDER BY priority ASC, {id_col} ASC LIMIT {k}
        """
    return f"""
    SELECT {group_col}, {id_col}, {weight_col}, priority FROM (
        SELECT {group_col}, {id_col}, {weight_col}, {pri} AS priority,
               row_number() OVER (PARTITION BY {group_col}
                                  ORDER BY {pri} ASC, {id_col} ASC) AS rn
        FROM {table} WHERE CAST({weight_col} AS DOUBLE) > 0
    ) WHERE rn <= {k} ORDER BY {group_col}, priority, {id_col}
    """


# -------------------------------------------------- TF-IDF keywords

# Source-size gate for the vocabulary broadcast hint (see tfidf_keywords
# docstring): the vocab (distinct terms + two longs each) is strictly
# smaller than the tokenized corpus text, so a source estimated under
# this cap keeps the hint; larger sources leave the join AQE-decided.
_TFIDF_BCAST_SRC_CAP = 2 * 1024**3


def tfidf_keywords(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text",
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the per-doc topical signature
    a pipeline uses for topic balancing, near-dup triage and index
    faceting.  score = tf · ln(N/df), rounded to 6 decimals BEFORE
    ranking so the ordering is identical across engines (ln() last-ulp
    differs between libm implementations — the bigram-LM absorption
    stance applied to the sort key); ties break on term asc.

    Scale posture: one (doc, term) groupBy for tf (map-side combine), a
    df aggregate joined back on term (a stopword's join fan-out is
    linear in its occurrences), and a per-doc rank window bounded by the
    doc's distinct-term count — WindowGroupLimit keeps it map-side.  N
    rides the plan as a one-row count aggregate of the source crossed
    onto the vocabulary-sized df table (r14: it was a separate
    driver-side docs.count() — an extra serialized job at bench SF and
    an extra full pass at any scale; count→double is exact, ln() sees
    the identical operand, and the rounded score is bit-unchanged — the
    stats_percentiles in-plan-targets recipe).

    broadcast_vocab (r15, closes the r14 ADVICE medium): the df table's
    cardinality is the corpus VOCABULARY — unbounded at 100 TB (typos,
    ids, multilingual tokens grow with corpus size), so an unconditional
    broadcast hint risks the 8 GB relation cap / a driver OOM where an
    AQE-decided join degrades gracefully to SMJ. None (default) gates
    the hint on the optimizer's size estimate for the SOURCE: a corpus
    under _TFIDF_BCAST_SRC_CAP bytes cannot produce an oversized vocab
    (the vocab is strictly smaller than its corpus text), so the hint —
    which fixes the planner's build-side mistake at small estimates,
    measured r14: BuildLeft corpus broadcast → BuildRight vocab, 1.44 →
    0.79 s — stays; above the cap the join is left AQE-decided.
    True/False force the hint on/off."""
    from vecgo_spark.operators.bm25 import tokenize_expr

    from vecgo_spark.operators.util import ensure_parallelism

    n_tbl = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # r14: the spread is keyed by doc id, so the tf groupBy AND the rank
    # window below both ride the ONE spread exchange (HashPartitioning(id)
    # satisfies both clusterings) — the stream previously paid three
    # exchanges: round-robin spread, (id,term) agg, window-by-id. The df
    # table is broadcast under the source-size gate below (guide §3.1:
    # vocabulary-sized, orders of magnitude below the doc-term stream the
    # planner was picking as the build side at small estimates), so the
    # joined stream keeps its id partitioning into the window.
    terms = (
        ensure_parallelism(docs.select(id_col, text_col), key=id_col)
        .select(F.col(id_col).alias("id"),
                F.explode(tokenize_expr(text_col)).alias("term"))
        .groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        terms.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
        .crossJoin(F.broadcast(n_tbl)))
    if broadcast_vocab is None:
        try:
            src_bytes = int(docs._jdf.queryExecution()
                            .optimizedPlan().stats().sizeInBytes())
        except Exception:  # noqa: BLE001 — no estimate: assume unbounded
            src_bytes = _TFIDF_BCAST_SRC_CAP + 1
        broadcast_vocab = src_bytes <= _TFIDF_BCAST_SRC_CAP
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    score = F.round(
        F.ln(F.col("_n") / F.col("doc_freq").cast("double"))
        * F.col("tf").cast("double"), 6)
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        terms.join(dfreq, "term")
        .select("id", "term", "tf", "doc_freq", score.alias("tfidf"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), F.col("rank").cast("long").alias("rank"),
                "term", "tf", "doc_freq", "tfidf")
        .orderBy(id_col, "rank")
    )


def tfidf_keywords_sql(
    n_docs: int, k: int = 3, docs_table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB twin — identical op order: ln(N/df) * tf, round 6, rank by
    (rounded score desc, term asc).  n_docs passes as a literal (the
    driver computes it the same way the operator does)."""
    toks = _TOKS_SQL.format(c=text_col)
    return f"""
    WITH t0 AS (SELECT {id_col} AS id, unnest({toks}) AS term FROM {docs_table}),
    tf AS (SELECT id, term, count(*) AS tf FROM t0 GROUP BY id, term),
    df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
    s AS (
        SELECT id, tf.term, tf, doc_freq,
               round(ln(CAST({float(n_docs)!r} AS DOUBLE) / CAST(doc_freq AS DOUBLE))
                     * CAST(tf AS DOUBLE), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY id
                    ORDER BY tfidf DESC, term ASC) AS rank FROM s)
    SELECT id AS {id_col}, CAST(rank AS BIGINT) AS rank, term, tf, doc_freq, tfidf
    FROM r WHERE rank <= {k} ORDER BY {id_col}, rank
    """
