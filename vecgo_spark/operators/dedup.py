"""Deduplication operators for large-scale training-data pipelines.

Five dedup families (BASELINE.json north star; beyond the reference's own
surface, which only has PK upsert dedup — internal/engine/engine.go:993):

  exact         md5 content hash → canonical-per-group     (hash groupBy)
  minhash-LSH   shingle → 16 minhashes → 4 bands → bucket join
  simhash       60-bit sign-of-weighted-token-bits, banded Hamming join
  ngram-jaccard exact Jaccard over 3-token shingle sets (shingle equi-join)
  embedding     cosine-similarity pairs over the vector column

Scale design: every operator is a groupBy/equi-join plan — no O(n²) step
except the final verify on *candidate pairs* (already cut down by LSH
bands / shared shingles). Banding is pigeonhole-sound: with b bands a pair
whose signature disagrees in < b positions shares ≥1 band, so
band-join + exact verify ≡ brute force for the thresholds used here.
All hashes are engine-portable (functions/hashing.py) and all verify
arithmetic is integer or single-division double → DuckDB-oracle-exact.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)

# Persisted intermediates owned by this module (minhash signature
# DataFrames that several plan legs consume).  Same stance as
# pipeline._CACHED / bm25._CACHED: persists live until the caller
# releases them so repeated invocations don't leak storage unbounded.
_CACHED: list = []


def release_caches() -> None:
    """Unpersist every DataFrame cached by this module's operators.
    Results returned before the release must be materialized first or
    they recompute their signature pipeline."""
    while _CACHED:
        _CACHED.pop().unpersist()

from vecgo_spark.functions.hashing import (
    shingles_sql,
    stable_hash64,
    stable_hash64_expr_sql,
    stable_hash64_sql,
)
from vecgo_spark.functions.vector import cosine_similarity, double_matrix_expr
from vecgo_spark.oracles import cosine_sql


def _spread(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) spread across the cluster before the signature stages
    (see util.ensure_parallelism).

    r15: spread by HASH OF id, not round-robin — every consumer that
    groups or windows by doc id downstream (simhash's groupBy, the
    exact-substring per-doc windows, minhash signature aggregation) then
    rides THIS exchange instead of paying its own (guide §2.4; the r14
    tfidf keyed-spread recipe), and a keyed repartition skips the local
    sort round-robin pays (sortBeforeRepartition, guide §2.5). Doc ids
    ≫ partitions, so the spread stays even; per-doc results are
    partition-independent, so declared outputs are bit-unchanged."""
    from vecgo_spark.operators.util import ensure_parallelism

    return ensure_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        key="id")


def _drop_hot(
    df: DataFrame, keys: list[str], cap: int | None, what: str
) -> DataFrame:
    """Anti-join away groups with > cap rows (boilerplate shingles, giant
    LSH buckets): one hot key with df docs yields C(df,2) join rows, so an
    uncapped join is quadratic in the hottest key. The hot-key set itself
    is tiny (only keys above cap) → broadcast anti-join, no extra shuffle
    of df. No silent caps: the dropped-group count is logged when INFO is
    enabled (the count is only computed then — the hot path stays
    action-free)."""
    if cap is None:
        return df
    hot = (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > cap)
        .select(*keys)
    )
    if _log.isEnabledFor(logging.INFO):
        n_hot = hot.count()
        if n_hot:
            _log.info("dropping %d hot %s groups (> %d rows each)", n_hot, what, cap)
    return df.join(F.broadcast(hot), keys, "left_anti")

# ------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, content_hash, group_size, keep): keep marks the lowest id per
    identical-content group — the upsert-dedup winner rule."""
    hashed = docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash"))
    groups = hashed.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("group_size"), F.min("id").alias("canonical_id")
    )
    return (
        hashed.join(groups, "content_hash")
        .select("id", "content_hash", "group_size", (F.col("id") == F.col("canonical_id")).alias("keep"))
    )


def exact_dedup_sql(docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
    WITH hashed AS (SELECT {id_col} AS id, md5({text_col}) AS content_hash FROM {docs_table}),
    groups AS (SELECT content_hash, count(*) AS group_size, min(id) AS canonical_id
               FROM hashed GROUP BY content_hash)
    SELECT h.id, h.content_hash, g.group_size, h.id = g.canonical_id AS keep
    FROM hashed h JOIN groups g USING (content_hash)
    """


# ------------------------------------------------------------- minhash

NUM_HASHES = 16
NUM_BANDS = 4  # 4 rows per band


def _doc_shingles(
    docs: DataFrame, id_col: str, text_col: str, n: int,
    flag: Column | None = None,
) -> DataFrame:
    """(id, shingle) distinct — pure Column HOFs (split → sliding
    concat_ws windows → array_distinct → explode). JVM-side whole-stage
    codegen: ~5× the warm throughput of the Arrow/Python loop this
    replaces, no Python workers, no repartition needed. Semantics ==
    tokenize_py (split on [\\x00-\\x20]+, drop empties, lowercase); docs
    with < n tokens produce no shingles (sequence(1, w<1) would generate a
    DESCENDING range in Spark — the when() guard prevents that).

    The token array sits behind an eval_once barrier: without it
    CollapseProject inlines the tokenizer into the transform lambda —
    O(tokens²) on engines without lambda-invariant hoisting, and a
    many-copies-bigger expression tree on Spark 4.1 (which hoists; see
    hashing.eval_once for the round-7 measurement record).

    r14: the (id, text) projection is spread first (ensure_parallelism —
    a no-op when the scan already has enough splits): a single-file
    source arrives as ONE partition, so the tokenize+shingle+hash stage
    AND the first partial aggregation above it ran on one core.

    ``flag`` (optional) is a per-row predicate Column over ``docs``
    carried through as boolean ``_t`` — it lets a caller that needs both
    an all-docs gram stream AND a filtered-subset stream (DSIR's raw vs
    target legs) tokenize ONCE and filter the flag afterwards, instead
    of paying a second tokenize pass over the subset. Per-row semantics
    are unchanged: filtering ``_t`` after the explode yields exactly the
    grams of ``docs.where(flag)``.

    r14 (2nd batch): both projections are single-parse selectExpr
    strings — proven `sameSemantics` with the Column-HOF form they
    replace (the CASE WHEN spark_partition_id() ≥ 0 text IS the
    eval_once barrier) — because the Column form cost ~30 py4j
    round-trips per call and this runs 1-2× in every shingle-family
    query build."""
    if flag is None:
        d = _spread(docs, id_col, text_col)
        carry: list[str] = []
    else:
        from vecgo_spark.operators.util import ensure_parallelism

        d = ensure_parallelism(docs.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text"),
            flag.alias("_t")))
        carry = ["_t"]
    d = d.selectExpr(
        "id", *carry,
        "CASE WHEN (spark_partition_id() >= 0) THEN "
        "filter(split(lower(text), '[\\\\x00-\\\\x20]+'), t -> t != '') "
        "END AS toks")
    w = f"(size(toks) - {n - 1})"
    sh = (f"CASE WHEN {w} >= 1 THEN "
          f"transform(sequence(1, greatest({w}, 1)), "
          f"i -> concat_ws(' ', slice(toks, i, {n}))) "
          f"ELSE CAST(array() AS ARRAY<STRING>) END")
    return d.selectExpr(
        "id", *carry, f"explode(array_distinct({sh})) AS shingle")


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(id, m0..m{H-1}): per-doc minimum of H permuted hashes over its
    shingle set. Docs with no shingles (< n tokens) are dropped.

    Hash family: ONE base md5 per shingle, then H universal-hash
    permutations perm_i(h) = (A_i·(h mod P) + B_i) mod P. Entirely
    JVM-side Column expressions: shingles from codegen HOFs
    (_doc_shingles), the base hash via stable_hash64 (Spark md5 — the
    same md5 DuckDB and Python compute), the H permutations as H min()
    aggregates over one (id, hash) shuffle. Integer-exact → identical in
    the DuckDB oracle; no Python workers anywhere (~3× the warm
    throughput of the Arrow/numpy kernel this replaces).
    a·h < P² < 2^62 so the BIGINT arithmetic never overflows."""
    from vecgo_spark.functions.hashing import MINHASH_P, minhash_perm_params

    a_params, b_params = minhash_perm_params(num_hashes)
    base = _doc_shingles(docs, id_col, text_col, n).select(
        "id", F.pmod(stable_hash64(F.col("shingle")), F.lit(MINHASH_P)).alias("h")
    )
    # one-parse expr per permutation: the Column form costs ~6 py4j
    # round trips per aggregate (~0.25 s of driver chatter per build for
    # 16 hashes); the parsed tree is identical (L-suffixed BIGINT
    # literals match F.lit's LongType)
    return base.groupBy("id").agg(*[
        F.expr(f"min(({a_params[i]}L * h + {b_params[i]}L) % {MINHASH_P}L)")
        .alias(f"m{i}")
        for i in range(num_hashes)
    ])


MAX_BUCKET = 1024  # band-bucket / chunk-bucket size cap (see _drop_hot)

# cap on hot-bucket keys embedded as plan literals: the hot-key COUNT is
# bounded only by rows/max_bucket (linear in corpus size on a
# boilerplate-heavy corpus), so above this the literal-isin plan and the
# driver collect both stop being "tiny by construction" and the pair
# pipeline falls back to an (unhinted) anti-join + pair-distinct, which
# stays plan-bounded at any hot-key count — AQE picks broadcast vs
# shuffle from the hot set's actual size
MAX_HOT_LITERALS = 2048


def _collect_hot(grouped: DataFrame, group_cols: list[str], max_bucket: int):
    """(hot_rows | None, hot_df): hot (group, key) rows as driver-side
    literals when there are at most MAX_HOT_LITERALS of them, else None —
    the collect itself is LIMIT-bounded, never corpus-proportional."""
    hot_df = (
        grouped.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_bucket).select(*group_cols)
    )
    rows = hot_df.limit(MAX_HOT_LITERALS + 1).collect()
    if len(rows) > MAX_HOT_LITERALS:
        return None, hot_df
    return rows, hot_df


def minhash_lsh_pairs(
    docs: DataFrame | None, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8, max_bucket: int | None = MAX_BUCKET,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, match_count) for candidate pairs that share ≥1 LSH band,
    keeping pairs whose signatures agree in ≥ min_matches of num_hashes
    positions (≈ Jaccard ≥ min_matches/num_hashes).

    sigs: precomputed (id, m0..m{num_hashes-1}) signatures — typically
    minhash_at_rest.stored_minhash_signatures(table), so the text column
    is never re-shingled; `docs` may be None then.  Signatures are
    deterministic, so stored and recomputed results are bit-identical.

    Recall: banding is approximate — a pair can agree in min_matches..
    num_hashes−1 positions with its disagreements spread across every band
    and share no band (guaranteed-candidate only when min_matches ≥
    num_hashes − num_bands + 1 by pigeonhole). With the defaults the
    candidate recall is high but < 1 (measured vs brute force in
    tests/test_dedup.py). Buckets larger than max_bucket (near-identical
    boilerplate floods) are dropped from candidate generation — mirrored
    in the SQL oracle so parity holds by construction."""
    if sigs is None:
        # persisted: consumed by the num_bands band projections
        sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes).persist()
        _CACHED.append(sigs)
    else:
        _check_sigs(sigs, num_hashes, "minhash_lsh_pairs")
    rows_per_band = num_hashes // num_bands
    # candidates: same band content in some band. The band key is the
    # 60-bit stable hash of the joined signature row — an 8-byte join key
    # instead of a variable-length string. A hash collision can only ADD a
    # candidate pair (identically in the SQL twin, which uses the same
    # md5-derived hash), and the verify phase filters it out unless the
    # signatures genuinely agree — recall can only go up.
    #
    # Band rows CARRY the full signature (num_hashes longs — a bounded,
    # fixed-width payload), which buys two whole stages back: every band
    # key is recomputable in-row from the joined signatures, so (a) a pair
    # sharing several bands is emitted exactly once, at its MINIMAL
    # surviving band — no pair-sized .distinct() exchange — and (b) the
    # match-count verification runs in-row — no back-joins against sigs.
    # One union, one self-join shuffle, nothing else. The hot-bucket set
    # (tiny by construction — only buckets above cap, the same bound
    # _drop_hot's broadcast relies on) is collected once and pushed back
    # as per-band literal key sets; dropped-group counts are logged.
    mcols = [f"m{i}" for i in range(num_hashes)]

    def key_at(prefix: str, bidx: int):
        # one-parse expr — the Column form costs ~12 py4j calls per site
        return F.expr(_band_key_sql(prefix, bidx, rows_per_band))

    # one explode pass instead of a num_bands-way union: every consumer
    # of `banded` (hot-bucket agg + both self-join legs) re-evaluates it,
    # and the union form re-scanned the persisted signatures num_bands
    # times per evaluation — the explode form scans them once
    banded = (
        sigs.select("id", *mcols,
                    F.explode(F.expr(_band_structs_sql(
                        num_hashes, num_bands))).alias("_bk"))
        .select("id", *mcols, F.col("_bk.band").alias("band"),
                F.col("_bk.key").alias("key"))
    )
    hot_keys: dict[int, list[int]] = {}
    literal_path = True
    if max_bucket is not None:
        hot_rows, hot_df = _collect_hot(banded, ["band", "key"], max_bucket)
        if hot_rows is None:
            # boilerplate-heavy corpus: too many hot buckets for plan
            # literals → broadcast anti-join + pair-distinct fallback
            _log.info("more than %d hot LSH band buckets — taking the "
                      "broadcast anti-join fallback", MAX_HOT_LITERALS)
            literal_path = False
            # NO broadcast hint: this branch fires precisely when the hot
            # set is big (> MAX_HOT_LITERALS, linear in corpus size) — let
            # AQE pick broadcast vs shuffle by its actual size
            banded = banded.join(hot_df, ["band", "key"], "left_anti")
        else:
            if hot_rows:
                _log.info("dropping %d hot LSH band buckets (> %d rows each)",
                          len(hot_rows), max_bucket)
            for r in hot_rows:
                hot_keys.setdefault(r["band"], []).append(r["key"])
            drop = None
            for bidx, keys in hot_keys.items():
                cond = (F.col("band") == bidx) & F.col("key").isin(keys)
                drop = cond if drop is None else drop | cond
            if drop is not None:
                banded = banded.where(~drop)

    def alive_match(bidx: int):
        """Band keys equal at bidx AND that bucket survived the cap — the
        two rows share the bucket, so one membership test suffices."""
        m = key_at("a.", bidx) == key_at("b.", bidx)
        keys = hot_keys.get(bidx)
        if keys:
            m = m & ~key_at("a.", bidx).isin(keys)
        return m

    # emitted at band b ⇔ no earlier surviving band also matches
    # (with a single band there is no earlier band — nothing to dedup)
    earlier = F.lit(False)
    for bidx in range(num_bands - 1):
        earlier = earlier | ((F.col("a.band") > bidx) & alive_match(bidx))
    match_count = _match_count_expr("a.", "b.", num_hashes)
    joined = (
        banded.alias("a")
        .join(banded.alias("b"),
              (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
    )
    if literal_path:
        joined = joined.where(~earlier)
    pairs = (
        joined.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      match_count.alias("match_count"))
        .where(F.col("match_count") >= min_matches)
    )
    if not literal_path:
        # in-row minimal-band dedup needs the hot-key sets in the plan;
        # without them a pair surfaces once per shared band → one
        # pair-sized distinct (identical rows: match_count is band-free)
        pairs = pairs.distinct()
    return pairs


def minhash_lsh_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8, max_bucket: int | None = MAX_BUCKET,
) -> str:
    from vecgo_spark.functions.hashing import MINHASH_P, minhash_perm_params

    a_params, b_params = minhash_perm_params(num_hashes)
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    sh_list = shingles_sql(f"({toks})", n)
    mins = ",\n           ".join(
        f"min(({a_params[i]} * h + {b_params[i]}) % {MINHASH_P}) AS m{i}"
        for i in range(num_hashes)
    )
    rows_per_band = num_hashes // num_bands
    band_selects = []
    for bidx in range(num_bands):
        cols = [f"m{bidx * rows_per_band + r}" for r in range(rows_per_band)]
        joined = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        key = stable_hash64_sql(f"({joined})")
        band_selects.append(f"SELECT id, {bidx} AS band, {key} AS key FROM sigs")
    banded = " UNION ALL ".join(band_selects)
    match_count = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
    WITH sh0 AS (
        SELECT DISTINCT {id_col} AS id, unnest({sh_list}) AS shingle FROM {docs_table}
    ),
    sh AS (
        SELECT id, {stable_hash64_sql('shingle')} % {MINHASH_P} AS h FROM sh0
    ),
    sigs AS (SELECT id, {mins} FROM sh GROUP BY id),
    banded0 AS ({banded}),
    hot AS (SELECT band, key FROM banded0 GROUP BY band, key
            HAVING count(*) > {max_bucket or 'NULL'}),
    banded AS (
        SELECT * FROM banded0 t WHERE NOT EXISTS (
            SELECT 1 FROM hot h WHERE h.band = t.band AND h.key = t.key)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )
    SELECT c.id_a, c.id_b, {match_count} AS match_count
    FROM cand c JOIN sigs sa ON c.id_a = sa.id JOIN sigs sb ON c.id_b = sb.id
    WHERE {match_count} >= {min_matches}
    """


def _check_sigs(sigs: DataFrame, num_hashes: int, what: str) -> None:
    """Fail loudly when a stored-signature frame doesn't carry the
    expected layout — a num_hashes mismatch between the artifact and the
    operator call would otherwise surface as an AnalysisException deep in
    the band projections."""
    want = ["id"] + [f"m{i}" for i in range(num_hashes)]
    missing = [c for c in want if c not in sigs.columns]
    if missing:
        raise ValueError(
            f"{what}: signature frame is missing columns {missing} — "
            f"expected (id, m0..m{num_hashes - 1}); was the artifact built "
            f"with a different num_hashes?")


def _match_count_expr(pa: str, pb: str, num_hashes: int):
    """Signature agreement count as ONE parsed expr (Column-form builds
    ~5 py4j calls per position). `0 +` head keeps the Python-sum() tree
    shape; integer addition, value-identical."""
    return F.expr("0 + " + " + ".join(
        f"(CASE WHEN {pa}m{i} = {pb}m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)))


def _band_key_sql(prefix: str, bidx: int, rows_per_band: int) -> str:
    """Spark-SQL text of one band key: stable_hash64 of the comma-joined
    signature slice — parses to the tree the Column form built."""
    cols = [f"{prefix}m{bidx * rows_per_band + r}" for r in range(rows_per_band)]
    joined = ", ".join(f"CAST({c} AS STRING)" for c in cols)
    return stable_hash64_expr_sql(f"concat_ws(',', {joined})")


def _band_structs_sql(num_hashes: int, num_bands: int, prefix: str = "") -> str:
    """array(named_struct('band', b, 'key', hash), ...) as ONE parsed
    expr string (bare band literal parses as INT == F.lit's type)."""
    rows_per_band = num_hashes // num_bands
    return "array(" + ",".join(
        f"named_struct('band', {bidx}, 'key', "
        f"{_band_key_sql(prefix, bidx, rows_per_band)})"
        for bidx in range(num_bands)) + ")"


def _minhash_band_rows(sigs: DataFrame, num_hashes: int, num_bands: int,
                       id_alias: str) -> DataFrame:
    """(id_alias, m0..m{H-1}, band, key) — one explode pass over the
    signatures (the minhash_lsh_pairs construction, shared with the
    incremental variant)."""
    rows_per_band = num_hashes // num_bands
    mcols = [f"m{i}" for i in range(num_hashes)]
    # whole band array as ONE parsed expr string (the Column form costs
    # ~60 py4j round trips per call — ~0.25 s of driver chatter)
    return (
        sigs.select(F.col("id").alias(id_alias), *mcols,
                    F.explode(F.expr(_band_structs_sql(
                        num_hashes, num_bands))).alias("_bk"))
        .select(id_alias, *mcols, F.col("_bk.band").alias("band"),
                F.col("_bk.key").alias("key"))
    )


def minhash_dedup_incremental(
    corpus: DataFrame | None, batch: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8, max_bucket: int | None = MAX_BUCKET,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """(batch_id, corpus_id, match_count): for every document of a NEW
    ingestion batch, its MinHash near-duplicates in the EXISTING corpus —
    the incremental-dedup shape an ingest pipeline runs per batch.

    corpus_sigs: stored (id, m0..m{num_hashes-1}) corpus signatures —
    minhash_at_rest.stored_minhash_signatures(table) — so per-batch cost
    is batch-sized: the corpus text is never re-shingled, only its H
    fixed-width signature columns are re-read.  `corpus` may be None
    then.  Without it the signatures are computed from text and
    persisted (they feed the hot-bucket aggregate AND the join leg;
    release via release_caches()).

    Scale posture: the candidate join is batch-bands × corpus-bands on
    the 60-bit band keys — the corpus is NEVER self-joined, so the
    per-batch cost is one batch signature pass plus a stored-signature
    scan, and a candidate set sized by the batch's true near-dups.  Hot
    corpus buckets (> max_bucket rows — mass boilerplate) are dropped
    from candidate generation via an unhinted anti-join, mirrored by the
    oracle; the pair stream is deduped across bands with one
    pair-distinct (bounded by candidates, not the corpus), and the
    ≥ min_matches verification is in-row over the two carried
    signatures — no back-joins."""
    if corpus_sigs is None:
        # persisted: consumed by the hot-bucket aggregate and the band
        # join leg (ADVICE r7 — without this both legs re-ran the
        # shingle explode + 16 min-aggregates)
        c_sigs = minhash_signatures(corpus, id_col, text_col, n, num_hashes).persist()
        _CACHED.append(c_sigs)
    else:
        _check_sigs(corpus_sigs, num_hashes, "minhash_dedup_incremental")
        c_sigs = corpus_sigs
    b_sigs = minhash_signatures(batch, id_col, text_col, n, num_hashes)
    cb = _minhash_band_rows(c_sigs, num_hashes, num_bands, "corpus_id")
    bb = _minhash_band_rows(b_sigs, num_hashes, num_bands, "batch_id")
    if max_bucket is not None:
        hot = (
            cb.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket).select("band", "key")
        )
        # unhinted: the hot set is tiny on a clean corpus and linear in a
        # boilerplate-heavy one — AQE picks broadcast vs shuffle
        cb = cb.join(hot, ["band", "key"], "left_anti")
    match_count = _match_count_expr("b.", "c.", num_hashes)
    cand = (
        bb.alias("b")
        .join(cb.alias("c"),
              (F.col("b.band") == F.col("c.band")) & (F.col("b.key") == F.col("c.key")))
        .select(F.col("b.batch_id").alias("batch_id"),
                F.col("c.corpus_id").alias("corpus_id"),
                match_count.alias("match_count"))
        .where(F.col("match_count") >= min_matches)
        .distinct()  # a pair may share several bands; match_count is band-free
    )
    return cand


def minhash_dedup_incremental_sql(
    corpus_pred: str, batch_pred: str,
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8, max_bucket: int | None = MAX_BUCKET,
) -> str:
    from vecgo_spark.functions.hashing import MINHASH_P, minhash_perm_params

    a_params, b_params = minhash_perm_params(num_hashes)
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    sh_list = shingles_sql(f"({toks})", n)
    mins = ",\n           ".join(
        f"min(({a_params[i]} * h + {b_params[i]}) % {MINHASH_P}) AS m{i}"
        for i in range(num_hashes)
    )
    rows_per_band = num_hashes // num_bands

    def bands_sql(src: str) -> str:
        selects = []
        for bidx in range(num_bands):
            cols = [f"m{bidx * rows_per_band + r}" for r in range(rows_per_band)]
            joined = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
            key = stable_hash64_sql(f"({joined})")
            selects.append(f"SELECT id, {bidx} AS band, {key} AS key FROM {src}")
        return " UNION ALL ".join(selects)

    def sig_ctes(pred: str, tag: str) -> str:
        return f"""
    sh0_{tag} AS (
        SELECT DISTINCT {id_col} AS id, unnest({sh_list}) AS shingle
        FROM {docs_table} WHERE {pred}
    ),
    sh_{tag} AS (SELECT id, {stable_hash64_sql('shingle')} % {MINHASH_P} AS h FROM sh0_{tag}),
    sigs_{tag} AS (SELECT id, {mins} FROM sh_{tag} GROUP BY id),
    bands_{tag} AS ({bands_sql(f'sigs_{tag}')})"""

    match_count = " + ".join(
        f"(CASE WHEN sb.m{i} = sc.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    hot_filter = ""
    if max_bucket is not None:
        hot_filter = f"""
    hot AS (SELECT band, key FROM bands_c GROUP BY band, key
            HAVING count(*) > {max_bucket}),
    bands_c2 AS (
        SELECT * FROM bands_c t WHERE NOT EXISTS (
            SELECT 1 FROM hot h WHERE h.band = t.band AND h.key = t.key)
    ),"""
    corpus_bands = "bands_c2" if max_bucket is not None else "bands_c"
    return f"""
    WITH {sig_ctes(corpus_pred, 'c')},
    {sig_ctes(batch_pred, 'b')},{hot_filter}
    cand AS (
        SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
        FROM bands_b b JOIN {corpus_bands} c
          ON b.band = c.band AND b.key = c.key
    )
    SELECT cand.batch_id, cand.corpus_id, {match_count} AS match_count
    FROM cand
    JOIN sigs_b sb ON cand.batch_id = sb.id
    JOIN sigs_c sc ON cand.corpus_id = sc.id
    WHERE {match_count} >= {min_matches}
    ORDER BY batch_id, corpus_id
    """


# ----------------------------------------------- exact-substring spans


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) — the lowercased whitespace token array that defines
    ExactSubstr positions AND the rewrite (one tokenizer, one frame, so
    persisting it makes the whole spans+removal pipeline single-scan).
    Spread first (see _doc_shingles) so the tokenizer and the window
    hashing above it aren't serialized through a one-split source."""
    from vecgo_spark.functions.hashing import eval_once

    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[\x00-\x20]+"), lambda t: t != F.lit("")
    )
    return _spread(docs, id_col, text_col).select(
        "id", eval_once(toks).alias("toks"))


def _doc_shingle_positions(tok_frame: DataFrame, n: int) -> DataFrame:
    """(id, pos, shingle) — every n-token window WITH its 1-based start
    position, in document order (the positional, non-distinct sibling of
    _doc_shingles; same tokenizer, same eval_once barrier). Input is a
    `_doc_tokens` frame."""
    d = tok_frame
    win = F.size("toks") - (n - 1)
    sh = F.when(
        win >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(win, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "id", F.posexplode(sh).alias("pos0", "shingle")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "shingle")


def exact_substring_spans(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_len: int = 50, persist_windows: bool = False,
) -> DataFrame:
    """Maximal duplicated spans of ≥ min_len tokens — the Spark shape of
    Lee et al. 2021's ExactSubstr dedup (suffix-array method; the
    reference pipeline this family's chunk_dedup only approximates at
    64-token chunk granularity).

    Equivalence: a token belongs to some duplicated substring of
    ≥ min_len tokens ⇔ it is covered by a duplicated min_len-token
    window, so the maximal removal spans ExactSubstr deletes are the
    maximal CONTIGUOUS token intervals covered by duplicated windows —
    two duplicated positions p, q (p < q) belong to one span iff
    q − p ≤ min_len (their [p, p+L−1], [q, q+L−1] coverage overlaps or
    touches), NOT only when consecutive (an r8 review fix: consecutive-
    only merging emitted overlapping, token-double-counting spans for
    position gaps of 2..L−1).  No suffix array needed.  Windows are
    compared by their 60-bit stable hash (one md5 per window, identical
    in the oracle), so a collision can only ADD a duplicated window —
    deterministic and mirrored bit-for-bit in the SQL twin.

    Plan (100 TB): positions stream once into a groupBy(hash) count
    (map-side partial, skew-safe) whose ≥2 keys semi-join back on the
    hash — never a pos×pos self-join of the token stream; the
    run-merging window is per-document (bounded by doc length).  The
    window stream feeds both legs — persist_windows=True persists it
    (registered in _CACHED, released by release_caches(), the
    dsir_importance persist_grams posture) so the corpus is tokenized
    and hashed ONCE; False re-evaluates it per leg (two corpus scans).

    Output: (id_col, span_start, span_end, span_tokens, n_windows), one
    row per maximal duplicated span; positions are 1-based token
    indexes, span_tokens = span_end − span_start + 1 ≥ min_len."""
    return _spans_from_tokens(
        _doc_tokens(docs, id_col, text_col), id_col, min_len,
        persist_windows)


def _spans_from_tokens(
    tok_frame: DataFrame, id_col: str, min_len: int, persist_windows: bool,
) -> DataFrame:
    from pyspark.sql.window import Window

    w = _doc_shingle_positions(tok_frame, min_len).select(
        "id", "pos", stable_hash64(F.col("shingle")).alias("h"))
    if persist_windows:
        w = w.persist()
        _CACHED.append(w)
    dup = (
        w.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2).select("h")
    )
    dw = w.join(dup, "h", "semi")
    wd = Window.partitionBy("id").orderBy("pos")
    # coverage-aware gaps-and-islands: a new span starts when the gap to
    # the previous duplicated position exceeds min_len (coverage would
    # neither overlap nor touch); the island id is the running count of
    # span starts — both windows are per-document (bounded by doc length)
    new_span = F.when(
        F.coalesce(F.col("pos") - F.lag("pos").over(wd), F.lit(min_len + 1))
        > min_len, 1).otherwise(0)
    islands = dw.withColumn("_ns", new_span).withColumn(
        "_isl",
        F.sum("_ns").over(wd.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)),
    )
    return (
        islands.groupBy("id", "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(min_len - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
        .orderBy(id_col, "span_start")
    )


def exact_substring_spans_sql(
    docs_table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", min_len: int = 50,
) -> str:
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    sh_list = shingles_sql(f"({toks})", min_len)
    h = stable_hash64_sql("u.sh")
    return f"""
    WITH t AS (SELECT {id_col} AS id, {sh_list} AS shl FROM {docs_table}),
    w0 AS (SELECT id, unnest(list_transform(shl, (s, i) -> {{'pos': i, 'sh': s}})) AS u FROM t),
    w AS (SELECT id, u.pos AS pos, {h} AS h FROM w0),
    dup AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
    dw AS (SELECT id, pos FROM w WHERE h IN (SELECT h FROM dup)),
    ns AS (SELECT id, pos,
                  CASE WHEN COALESCE(pos - lag(pos) OVER (PARTITION BY id ORDER BY pos),
                                     {min_len + 1}) > {min_len} THEN 1 ELSE 0 END AS f
           FROM dw),
    isl AS (SELECT id, pos,
                   sum(f) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM ns)
    SELECT id AS {id_col},
           min(pos) AS span_start,
           max(pos) + {min_len - 1} AS span_end,
           max(pos) + {min_len - 1} - min(pos) + 1 AS span_tokens,
           count(*) AS n_windows
    FROM isl GROUP BY id, g
    ORDER BY {id_col}, span_start
    """


def exact_substring_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_len: int = 50, persist_windows: bool = False,
) -> DataFrame:
    """The ExactSubstr REMOVAL action: rewrite every document with its
    duplicated spans (exact_substring_spans semantics) deleted — the
    conservative all-occurrences variant of Lee et al. 2021's cut (the
    spans report feeds keep-one policies; this operator applies the
    drop).

    Output: (id_col, n_tokens, n_removed, clean_text), one row per input
    doc — docs without duplicated spans pass through with n_removed=0.
    clean_text is in TOKEN domain (lowercased, single-space joined): the
    tokenizer that defines span positions also defines the rewrite.

    Plan: the span list per doc is a groupBy(id) collect over the span
    rows (bounded by spans-per-doc), broadcast-friendly relative to the
    corpus but joined as a plain LEFT equi-join on id (span volume is
    corpus-proportional at 100 TB — never hinted broadcast); the token
    drop is a codegen filter-with-index over the token array testing
    coverage against the in-row span list — per-token cost O(spans in
    doc), no shuffle beyond the span aggregation.

    persist_windows=True persists BOTH the shared token frame (the
    rewrite leg + the window stream read it) and the window stream (the
    two span legs read it), so the corpus text is scanned and tokenized
    exactly ONCE for the whole spans+removal pipeline (three scans when
    False); caches land in _CACHED, released by release_caches()."""
    d = _doc_tokens(docs, id_col, text_col)
    if persist_windows:
        d = d.persist()
        _CACHED.append(d)
    spans = _spans_from_tokens(d, id_col, min_len,
                               persist_windows=persist_windows).select(
        F.col(id_col).alias("id"),
        F.struct(F.col("span_start").alias("s"),
                 F.col("span_end").alias("e")).alias("sp"),
    ).groupBy("id").agg(F.collect_list("sp").alias("spans"))
    covered = lambda i: F.exists(  # noqa: E731
        F.col("spans"), lambda s: (i >= s["s"]) & (i <= s["e"]))
    kept = F.when(
        F.col("spans").isNull(), F.col("toks")
    ).otherwise(
        # filter's index is 0-based; span positions are 1-based
        F.filter(F.col("toks"), lambda t, i: ~covered(i + 1))
    )
    return (
        d.join(spans, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
        .orderBy(id_col)
    )


def exact_substring_dedup_sql(
    docs_table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", min_len: int = 50,
) -> str:
    spans_sql = exact_substring_spans_sql(docs_table, id_col, text_col, min_len)
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    return f"""
    WITH span_rows AS ({spans_sql}),
    spans AS (
        SELECT {id_col} AS id,
               list({{'s': span_start, 'e': span_end}}) AS spans
        FROM span_rows GROUP BY {id_col}
    ),
    d AS (SELECT {id_col} AS id, {toks} AS toks FROM {docs_table})
    SELECT d.id AS {id_col},
           CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(len(d.toks) - len(kept) AS BIGINT) AS n_removed,
           -- array_to_string([]) is NULL in DuckDB; Spark concat_ws is ''
           COALESCE(array_to_string(kept, ' '), '') AS clean_text
    FROM (
        SELECT d.id, d.toks,
               CASE WHEN s.spans IS NULL THEN d.toks
                    -- DuckDB lambda index i is 1-based (= span positions)
                    ELSE list_filter(d.toks, (t, i) ->
                        len(list_filter(s.spans,
                            sp -> i >= sp.s AND i <= sp.e)) = 0)
               END AS kept
        FROM d LEFT JOIN spans s ON d.id = s.id
    ) d
    ORDER BY {id_col}
    """


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # stable_hash64 yields 60 usable bits
# SWAR vote lanes are 20-bit; lane counts are bounded by the per-doc token
# instance count, so n < 2^20 proves no lane carry (tests patch this down
# to exercise the guard cheaply)
SWAR_MAX_TOKENS = 1 << 20


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): sign-of-weighted-bit-votes over token hashes, weight
    = term frequency. Pure integer arithmetic → order-independent and
    oracle-exact.

    Entirely JVM Column expressions (no Python kernel): the per-bit vote is
    linear in term frequency — Σ_term tf·sign_j(term) == Σ_instance
    sign_j(term) — so exploding token INSTANCES and taking 60 conditional
    sums in one groupBy(id) gives the identical signature with a single
    shuffle, whole-stage codegen end-to-end, and map-side partial
    aggregation collapsing each partition to one 60-int row per doc."""
    from vecgo_spark.operators.bm25 import tokenize_expr

    inst = _spread(docs, id_col, text_col).select(
        "id", F.explode(tokenize_expr(F.col("text"))).alias("term")
    )
    # hash once per instance; the 60 bit probes below read this column.
    # vote_j = (#ones − #zeros) > 0 ⇔ 2·Σbit_j > n. The 60 per-bit sums
    # are packed 3-per-long into 20-bit lanes (SWAR): one agg buffer long
    # carries bits 3g, 3g+1, 3g+2, so the hash aggregate keeps 21 columns
    # instead of 61 — ~20% faster and 3× less signature shuffle width —
    # while the unpacked lane values are the IDENTICAL integers the plain
    # sums produce (lanes can't carry into each other below 2^20 = 1M
    # token instances per doc, far above any real document).
    hashed = inst.select("id", stable_hash64("term", seed=0).alias("h"))
    lanes = SIMHASH_BITS // 3
    packed = []
    for g in range(lanes):
        bit = F.shiftright(F.col("h"), 3 * g).bitwiseAND(F.lit(1))
        e = (bit
             + F.shiftleft(F.shiftright(F.col("h"), 3 * g + 1).bitwiseAND(F.lit(1)), 20)
             + F.shiftleft(F.shiftright(F.col("h"), 3 * g + 2).bitwiseAND(F.lit(1)), 40))
        packed.append(F.sum(e).alias(f"p{g}"))
    votes = hashed.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *packed)
    lane_mask = F.lit((1 << 20) - 1)

    def s(j):  # unpacked per-bit vote count, == the plain F.sum of bit j
        return F.shiftright(F.col(f"p{j // 3}"), 20 * (j % 3)).bitwiseAND(lane_mask)

    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(
            s(j) * 2 > F.col("n"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    # SWAR soundness guard: a lane holds a 20-bit count, and every lane
    # count is <= n, so n < 2^20 proves no lane carry. A >=1M-token doc
    # would corrupt its signature SILENTLY — fail loudly instead (JVM-side
    # branch, evaluated once per doc row; zero cost on the sane path).
    sim = F.when(
        F.col("n") >= F.lit(SWAR_MAX_TOKENS),
        F.raise_error(F.concat(
            F.lit("simhash SWAR lane overflow: doc id="), F.col("id").cast("string"),
            F.lit(" has "), F.col("n").cast("string"),
            F.lit(f" token instances (>= {SWAR_MAX_TOKENS}); "
                  "pre-truncate the document"))
        ).cast("long"),
    ).otherwise(sim)
    return votes.select("id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
    max_bucket: int | None = MAX_BUCKET, sigs: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Banded join: split the 60-bit hash into max_hamming+1 chunks; by
    pigeonhole any pair within max_hamming shares ≥1 exact chunk, so the
    join only compares within chunk buckets (no O(n²) at scale). Chunk
    buckets above max_bucket (mass-identical boilerplate) are dropped —
    mirrored in the SQL oracle, which uses the same banded plan.

    A pair sharing several chunks would surface once per shared bucket;
    instead of a pair-sized `.distinct()` exchange, each pair is emitted
    only at its MINIMAL surviving matching chunk — an in-row predicate
    over the two signatures (both present in the joined row), since the
    hot-bucket set is collected once and pushed back as per-chunk literal
    key sets. Same output set, one less shuffle over the candidate pairs.
    The hot set is tiny by construction (only buckets above cap — the same
    boundedness _drop_hot's broadcast relies on), and the dropped-group
    count is logged, never silent.

    `sigs` bypasses signature computation with a precomputed (id,
    simhash) frame — e.g. simhash_at_rest.stored_simhash_signatures;
    `docs` may be None then. Signatures are deterministic, so stored and
    recomputed results are bit-identical."""
    if sigs is None:
        # persisted: consumed by every chunk projection of the banded
        # join; registered for release_caches (the minhash stance)
        sigs = simhash(docs, id_col, text_col).persist()
        _CACHED.append(sigs)
    elif set(sigs.columns) != {"id", "simhash"}:
        raise ValueError(
            f"sigs must carry exactly (id, simhash); got {sigs.columns}")
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1

    def key_at(col, cidx):
        return F.shiftright(col, cidx * chunk_bits).bitwiseAND(F.lit(mask))

    # one explode pass instead of an n_chunks-way union (see the matching
    # comment in minhash_lsh_pairs — every consumer re-evaluates this)
    chunk_structs = F.array(*[
        F.struct(F.lit(cidx).alias("chunk"),
                 key_at(F.col("simhash"), cidx).alias("key"))
        for cidx in range(n_chunks)
    ])
    chunks = (
        sigs.select("id", "simhash", F.explode(chunk_structs).alias("_ck"))
        .select("id", "simhash", F.col("_ck.chunk").alias("chunk"),
                F.col("_ck.key").alias("key"))
    )
    hot_keys: dict[int, list[int]] = {}
    literal_path = True
    if max_bucket is not None:
        hot_rows, hot_df = _collect_hot(chunks, ["chunk", "key"], max_bucket)
        if hot_rows is None:
            _log.info("more than %d hot SimHash chunk buckets — taking the "
                      "broadcast anti-join fallback", MAX_HOT_LITERALS)
            literal_path = False
            # unhinted for the same reason as the minhash fallback above
            chunks = chunks.join(hot_df, ["chunk", "key"], "left_anti")
        else:
            if hot_rows:
                _log.info("dropping %d hot SimHash chunk buckets (> %d rows each)",
                          len(hot_rows), max_bucket)
            for r in hot_rows:
                hot_keys.setdefault(r["chunk"], []).append(r["key"])
            drop = None
            for cidx, keys in hot_keys.items():
                cond = (F.col("chunk") == cidx) & F.col("key").isin(keys)
                drop = cond if drop is None else drop | cond
            if drop is not None:
                chunks = chunks.where(~drop)

    def alive_match(cidx):
        """Keys equal at chunk cidx AND that bucket survived the cap —
        the two rows share the bucket, so one membership test suffices."""
        m = key_at(F.col("a.simhash"), cidx) == key_at(F.col("b.simhash"), cidx)
        keys = hot_keys.get(cidx)
        if keys:
            m = m & ~key_at(F.col("a.simhash"), cidx).isin(keys)
        return m

    # emitted at chunk c ⇔ no earlier surviving chunk also matches
    # (with a single chunk there is no earlier chunk — nothing to dedup)
    earlier = F.lit(False)
    for cidx in range(n_chunks - 1):
        earlier = earlier | ((F.col("a.chunk") > cidx) & alive_match(cidx))
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"),
              (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
    )
    if literal_path:
        cand = cand.where(~earlier)
    cand = cand.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                       F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = cand.select("id_a", "id_b", ham.alias("hamming")).where(F.col("hamming") <= max_hamming)
    if not literal_path:
        # without the hot sets in the plan a pair surfaces once per shared
        # surviving chunk → pair-distinct fallback (hamming is chunk-free)
        out = out.distinct()
    return out


def simhash_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, max_bucket: int | None = MAX_BUCKET,
) -> str:
    """Oracle: the same banded chunk join as the Spark plan (pigeonhole-
    complete below the bucket cap, and the cap is applied identically on
    both sides; integer-exact)."""
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    h = stable_hash64_sql("term", seed=0)
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1
    chunk_selects = " UNION ALL ".join(
        f"SELECT id, simhash, {cidx} AS chunk, "
        f"(simhash >> {cidx * chunk_bits}) & {mask} AS key FROM sigs"
        for cidx in range(n_chunks)
    )
    return f"""
    WITH tf AS (
        SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM (
            SELECT {id_col} AS id, unnest({toks}) AS term FROM {docs_table}
        ) GROUP BY id, term
    ),
    th AS (SELECT id, term, tf, {h} AS h FROM tf),
    bitvotes AS (
        SELECT id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS vote
        FROM th, range({SIMHASH_BITS}) r(j)
        GROUP BY id, j
    ),
    sigs AS (
        SELECT id, sum(CASE WHEN vote > 0 THEN (1::BIGINT << j) ELSE 0 END) AS simhash
        FROM bitvotes GROUP BY id
    ),
    chunks0 AS ({chunk_selects}),
    hot AS (SELECT chunk, key FROM chunks0 GROUP BY chunk, key
            HAVING count(*) > {max_bucket or 'NULL'}),
    chunks AS (
        SELECT * FROM chunks0 t WHERE NOT EXISTS (
            SELECT 1 FROM hot h WHERE h.chunk = t.chunk AND h.key = t.key)
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM chunks a JOIN chunks b
          ON a.chunk = b.chunk AND a.key = b.key AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


# --------------------------------------------------------- ngram jaccard


MAX_SHINGLE_DF = 1024  # document-frequency cutoff for shingles (see _drop_hot)


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5, max_shingle_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """(id_a, id_b, jaccard): exact Jaccard over n-token shingle sets for
    every pair sharing ≥1 shingle. jaccard = |∩| / (|A|+|B|-|∩|) — one
    integer division pair → oracle-exact.

    Shingles appearing in more than max_shingle_df documents (boilerplate:
    one such shingle shared by d docs alone generates C(d,2) join rows) are
    excluded from BOTH the intersection and the set sizes — i.e. Jaccard
    over the non-boilerplate shingle sets, the standard MinHash-practice
    cutoff. The SQL oracle applies the identical cutoff.

    The self-join carries the 60-bit stable hash of each shingle, not the
    string — an 8-byte shuffle key (the standard hashed-shingle practice;
    a collision merges two shingles identically on both engines, so the
    oracle stays exact and the Jaccard perturbation is ~n²/2^60).

    r15 — LENGTH PREFILTER on the pair stream (the AllPairs/PPJoin size
    bound, guide §2.3 "shuffle fewer bytes"): jaccard ≤ min(|A|,|B|) /
    max(|A|,|B|) (attained when the smaller set is contained in the
    larger), and the division below is the IDENTICAL double op the final
    predicate computes over a numerator that can only be smaller — so a
    join row whose size ratio already fails the threshold can never
    survive, and dropping it at the join condition is exact, not
    approximate. Set sizes ride the stream via one join against the
    doc-count-sized sizes table (broadcast at bench scale; AQE degrades
    it gracefully at 100 TB, where the quadratic pair-stream reduction
    is worth a keyed stream pass) and are carried THROUGH the pair
    aggregate (max of a per-id constant), which also retires the two
    sizes joins the aggregated pair table used to pay."""
    # persisted: both sides of the shingle self-join + the sizes agg
    sh = (
        _doc_shingles(docs, id_col, text_col, n)
        .select("id", stable_hash64(F.col("shingle")).alias("shingle"))
        .persist()
    )
    sh = _drop_hot(sh, ["shingle"], max_shingle_df, "shingle")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # persisted too: both self-join sides read the size-attached stream
    # from cache, so the hot-shingle anti-join and the sizes aggregate
    # evaluate ONCE instead of once per side
    shz = sh.join(sizes, "id").persist()
    ratio = (
        F.least(F.col("a.sz"), F.col("b.sz")).cast("double")
        / F.greatest(F.col("a.sz"), F.col("b.sz")).cast("double")
    )
    inter = (
        shz.alias("a")
        .join(shz.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.id") < F.col("b.id"))
              & (ratio >= F.lit(float(threshold))))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"),
             F.max(F.col("a.sz")).alias("sza"),
             F.max(F.col("b.sz")).alias("szb"))
    )
    jac = F.col("inter").cast("double") / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double")
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5, max_shingle_df: int | None = MAX_SHINGLE_DF,
) -> str:
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    sh_list = shingles_sql(f"({toks})", n)
    return f"""
    WITH shs AS (
        SELECT DISTINCT {id_col} AS id, unnest({sh_list}) AS shingle_s FROM {docs_table}
    ),
    sh0 AS (SELECT id, {stable_hash64_sql('shingle_s')} AS shingle FROM shs),
    hotsh AS (SELECT shingle FROM sh0 GROUP BY shingle
              HAVING count(*) > {max_shingle_df or 'NULL'}),
    sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hotsh)),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b,
           CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
    FROM inter i JOIN sizes sa ON i.id_a = sa.id JOIN sizes sb ON i.id_b = sb.id
    WHERE CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= {threshold!r}
    """


# ------------------------------------------------------- embedding cosine


def _block_pair_candidates(
    emb: DataFrame, id_col: str, vector_col: str, cutoff: float, n_blocks: int,
) -> DataFrame:
    """Exact candidate superset, fully distributed: hash vectors into
    n_blocks blocks, co-group every block pair (i ≤ j), and run one numpy
    matmul per pair inside applyInPandas. No corpus rows ever touch the
    driver. Shuffle volume = n_blocks× the table; per-task memory =
    2·n/n_blocks rows; total compute O(n²) split over B(B+1)/2 tasks —
    the inherent cost of *exact* all-pairs (the approximate scale path is
    candidates="lsh")."""
    import numpy as np
    import pandas as pd

    # r14: block-pair membership is computed IN-PLAN (one transform +
    # explode over sequence(0, B-1)) instead of two broadcast joins
    # against a (blk_a, blk_b) pairs table unioned together — one scan
    # of the corpus instead of two, zero broadcast exchanges, and B
    # (not B+1) shuffled copies per row: row blk meets block k in pair
    # (min(blk,k), max(blk,k)) as side 0 when k ≥ blk else side 1, so
    # the diagonal group carries ONE copy and emit mirrors it (the pair
    # set is unchanged — pinned by the sweep test).
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vector_col).alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    ks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    memb = F.transform(ks, lambda k: F.struct(
        F.least(F.col("blk"), k).cast("int").alias("blk_a"),
        F.greatest(F.col("blk"), k).cast("int").alias("blk_b"),
        F.when(k >= F.col("blk"), F.lit(0)).otherwise(F.lit(1)).cast("int").alias("side"),
    ))
    flat = v.select("id", "v", F.explode(memb).alias("m")).select(
        F.col("m.blk_a").alias("blk_a"), F.col("m.blk_b").alias("blk_b"),
        F.col("m.side").alias("side"), "id", "v",
    )

    def emit(key, pdf):
        blk_a, blk_b = key
        xa = pdf[pdf["side"] == 0]
        xb = xa if blk_a == blk_b else pdf[pdf["side"] == 1]
        if len(xa) == 0 or len(xb) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})

        def norm(rows):
            m = np.stack(rows["v"].values).astype(np.float64)
            nz = np.linalg.norm(m, axis=1)
            nz[nz == 0.0] = np.nan  # zero vectors never match (NULL cosine)
            return m / nz[:, None]

        sims = norm(xa) @ norm(xb).T
        ai, bi = np.where(sims >= cutoff)
        ia = xa["id"].values[ai].astype(np.int64)
        ib = xb["id"].values[bi].astype(np.int64)
        if blk_a == blk_b:
            keep = ia < ib  # same set on both sides: upper triangle only
            ia, ib = ia[keep], ib[keep]
        else:
            ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": ia, "id_b": ib})

    return (
        flat.groupBy("blk_a", "blk_b")
        .applyInPandas(emit, "id_a long, id_b long")
    )


def _lsh_candidates(
    emb: DataFrame, id_col: str, vector_col: str,
    n_tables: int = 8, n_planes: int = 12, seed: int = 42,
) -> DataFrame:
    """Approximate candidate generation — the 100 TB path: T independent
    hyperplane-LSH tables, candidates = pairs colliding in ≥1 table. For
    cos ≥ 0.95 each plane agrees w.p. 1−θ/π ≈ 0.90, so a 12-plane bucket
    collides w.p. ≈ 0.28 and 8 tables give recall ≈ 1−(1−0.28)⁸ ≈ 0.93
    (measured in tests/test_dedup.py). Pure equi-joins, no matmul, no
    O(n²) term anywhere."""
    from vecgo_spark.operators import lsh as lshmod

    dim = emb.select(F.size(F.col(vector_col)).alias("d")).first()["d"]
    v = emb.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    tabs = None
    for t in range(n_tables):
        planes = lshmod.make_planes(dim, n_planes=n_planes, seed=seed + t)
        one = v.select(
            "id", F.lit(t).alias("tbl"), lshmod.bucket_expr(planes, "v").alias("key")
        )
        tabs = one if tabs is None else tabs.unionByName(one)
    return (
        tabs.alias("a")
        .join(tabs.alias("b"),
              (F.col("a.tbl") == F.col("b.tbl")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


AUTO_LSH_ROWS = 10_000_000  # above this the O(n²) block matmul is refused


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vector_col: str = "embedding",
    threshold: float = 0.95, candidates: str = "auto", n_blocks: int | None = None,
    auto_lsh_rows: int = AUTO_LSH_ROWS, n_rows: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold.

    Two-phase plan (the pattern every quantized path uses too):
      1. PRUNE: generate candidate pairs with cos ≥ threshold − 1e-9
         (BLAS reorders the sum, so its float64 result can differ from the
         sequential fold in the last ulps — the epsilon makes the
         candidate set a strict superset).
           candidates="auto"   (default) pick by corpus size: "block"
                               up to auto_lsh_rows rows, "lsh" above —
                               so the O(n²) matmul can never be the
                               silent default on a web-scale corpus
                               (VERDICT r6). The count is metadata-cheap
                               on a raw parquet scan but EXECUTES the
                               upstream plan when `emb` is derived
                               (filtered/joined) — pass n_rows (exact or
                               estimated) to skip the count job, or pick
                               the strategy explicitly.
           candidates="block"  exact block-pair matmul join —
                               distributed, no driver collect, O(n²)
                               compute split across B(B+1)/2 tasks;
           candidates="lsh"    hyperplane-LSH collision join — linear
                               scale. RECALL NOTE: ~0.93 at threshold
                               0.95 (measured, tests/test_dedup.py) —
                               pairs it does emit are still exact, it
                               may only MISS some.
      2. VERIFY with the exact sequential-fold cosine expression — the
         reported value is bit-identical to the DuckDB oracle.
    The naive theta-join × interpreted-HOF cosine took 114 s at sf0.1;
    this runs the same logical op in ~3 s.
    """
    cutoff = threshold - 1e-9
    n = None
    if candidates == "auto":
        n = emb.count() if n_rows is None else int(n_rows)
        candidates = "lsh" if n > auto_lsh_rows else "block"
        if candidates == "lsh":
            # ADVICE r7: make the silent recall change visible — LSH
            # candidate recall is ~0.93 at the default planes, not 1.0
            _log.warning(
                "embedding_neardup auto strategy: %d rows > %d — switching "
                "to LSH candidates (approximate: candidate recall < 1)",
                n, auto_lsh_rows)
        else:
            _log.info("embedding_neardup auto strategy: %d rows -> block", n)
    if candidates == "block":
        if n_blocks is None:
            # scale-adaptive block count: target ~64k rows per block so
            # per-task matrices stay bounded (2·rows·dim·8 B) while a
            # small corpus doesn't shatter into B(B+1)/2 near-empty
            # Python tasks (the fixed B=16 default cost 136 worker round
            # trips for a 2k-row corpus — measured 2× the whole query's
            # useful work). The pair SET is independent of blocking
            # (upper-triangle / min-max normalization), so B is purely a
            # scheduling choice. Unknown n (explicit "block", no count):
            # keep the old default.
            n_blocks = (max(1, min(64, -(-n // 65536))) if n is not None
                        else 16)
        cand = _block_pair_candidates(emb, id_col, vector_col, cutoff, n_blocks)
    elif candidates == "lsh":
        cand = _lsh_candidates(emb, id_col, vector_col)
    else:
        raise ValueError(f"unknown candidates strategy {candidates!r}")
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("vb"))
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs_sql(
    emb_table: str = "embeddings", id_col: str = "vec_id", vector_col: str = "embedding",
    threshold: float = 0.95,
) -> str:
    cos = cosine_sql(f"a.{vector_col}", f"b.{vector_col}")
    return f"""
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {cos} AS cos
    FROM {emb_table} a JOIN {emb_table} b ON a.{id_col} < b.{id_col}
    WHERE {cos} >= {threshold!r}
    """


# --------------------------------------------------- semantic (SemDeDup)


def semantic_dedup_pairs(
    emb: DataFrame, model, id_col: str = "vec_id", vector_col: str = "embedding",
    threshold: float = 0.95, max_cluster: int | None = MAX_BUCKET,
    persist_assigned: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): dedup at the
    MEANING level — k-means-cluster the embedding space, compare cosine
    similarity only WITHIN each cluster, and for every pair above the
    threshold mark the member closer to the centroid for removal (the
    paper keeps the LOW centroid-similarity example: prefer the cluster's
    edge, prune its dense core).

    Output: (cluster_id, id_a, id_b, cos_sim, drop_id) per within-cluster
    pair with cos_sim ≥ threshold; drop_id is the higher-centroid-cosine
    member (tie → the larger id).

    Scale posture: pairs are NEVER computed across clusters — candidate
    generation is one numpy gemm per cluster inside applyInPandas (the
    embedding_neardup block pattern: per-task memory = one cluster, the
    quadratic term bounded by the largest cluster, which nlist controls —
    SemDeDup's own design, cost ~ Σ|c_i|²).  Clusters above max_cluster
    rows are dropped from pairing entirely (broadcast anti-join, logged).
    The surviving candidates (true near-dups only, cutoff − 1e-9 margin)
    are VERIFIED with the exact sequential-fold cosine and the
    drop-choice centroid cosines — plan-literal centroids, per-row
    folds — so the reported values are bit-exact in the DuckDB oracle;
    the verify joins are keyed on the candidate ids, sized by real dups,
    not by Σ|c_i|².

    persist_assigned=True persists the assigned frame (id, v, cluster,
    cent_cos) — the gemm input and BOTH verify legs read it, so the
    9-fold assignment+cosine projection runs once instead of three
    times (cache in _CACHED, released by release_caches(); False keeps
    the zero-storage three-scan shape)."""
    import numpy as np
    import pandas as pd

    from vecgo_spark.operators import ivf as ivfmod

    cents = double_matrix_expr(model.centroids)
    v = F.col(vector_col).cast("array<double>")
    d = emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        ivfmod.assign_expr(model, vector_col).alias("cluster_id"),
    ).withColumn(
        "cent_cos",
        cosine_similarity(F.col("v"), F.element_at(cents, F.col("cluster_id") + 1)),
    )
    d = _drop_hot(d, ["cluster_id"], max_cluster, "semantic clusters")
    if persist_assigned:
        d = d.persist()
        _CACHED.append(d)
    cutoff = threshold - 1e-9

    def emit(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        m = np.stack(pdf["v"].values).astype(np.float64)
        nz = np.linalg.norm(m, axis=1)
        nz[nz == 0.0] = np.nan  # zero vectors never match (NULL cosine)
        m = m / nz[:, None]
        sims = m @ m.T
        ai, bi = np.where(sims >= cutoff)
        ids = pdf["id"].values.astype(np.int64)
        ia, ib = ids[ai], ids[bi]
        keep = ia < ib  # same set both sides: upper triangle only
        return pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep]})

    cand = d.select("cluster_id", "id", "v").groupBy("cluster_id").applyInPandas(
        emit, "id_a long, id_b long")
    a = d.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("cluster_id").cast("int").alias("cluster_id"),
                 F.col("cent_cos").alias("ca"))
    b = d.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("cent_cos").alias("cb"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select(
            "cluster_id", "id_a", "id_b", sim.alias("cos_sim"),
            F.when(F.col("ca") > F.col("cb"), F.col("id_a"))
            .when(F.col("cb") > F.col("ca"), F.col("id_b"))
            .otherwise(F.col("id_b")).alias("drop_id"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup_pairs_sql(
    model, emb_table: str = "embeddings", id_col: str = "vec_id",
    vector_col: str = "embedding", threshold: float = 0.95,
    max_cluster: int | None = MAX_BUCKET,
) -> str:
    from vecgo_spark.operators.ivf import assign_sql

    cents = "[" + ", ".join(
        "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in model.centroids
    ) + "]"
    cent_cos = cosine_sql(vector_col, f"({cents})[cluster_id + 1]")
    hot = ""
    src = "a0"
    if max_cluster is not None:
        hot = f"""
    hot AS (SELECT cluster_id FROM a0 GROUP BY cluster_id
            HAVING count(*) > {max_cluster}),
    a1 AS (SELECT * FROM a0 t WHERE NOT EXISTS (
        SELECT 1 FROM hot h WHERE h.cluster_id = t.cluster_id)),"""
        src = "a1"
    cos = cosine_sql("a.v", "b.v")
    return f"""
    WITH a0 AS (
        SELECT {id_col} AS id, {vector_col} AS v,
               CAST({assign_sql(model, vector_col)} AS INT) AS cluster_id,
               {cent_cos} AS cent_cos
        FROM {emb_table}
    ),{hot}
    p AS (
        SELECT a.cluster_id, a.id AS id_a, b.id AS id_b,
               {cos} AS cos_sim,
               CASE WHEN a.cent_cos > b.cent_cos THEN a.id
                    WHEN b.cent_cos > a.cent_cos THEN b.id
                    ELSE b.id END AS drop_id
        FROM {src} a JOIN {src} b
          ON a.cluster_id = b.cluster_id AND a.id < b.id
    )
    SELECT cluster_id, id_a, id_b, cos_sim, drop_id
    FROM p WHERE cos_sim >= {threshold!r}
    """


def semantic_dedup(
    emb: DataFrame, model, id_col: str = "vec_id", vector_col: str = "embedding",
    threshold: float = 0.95, max_cluster: int | None = MAX_BUCKET,
    persist_assigned: bool = False,
) -> DataFrame:
    """SemDeDup's actual OUTPUT (Abbas et al. 2023 §3: the paper prunes
    the corpus, the pair list is its intermediate): group semantic
    duplicates and keep exactly ONE per group — the member with the
    LOWEST centroid cosine (keep the cluster's edge example, prune its
    dense core, the paper's keep policy); ties break to the smaller id.

    Output: (id_col, group_id, cent_cos, keep) — one row per input
    embedding. group_id = min member id of the duplicate group (the
    connected component of the ≥ threshold within-cluster pair graph);
    singletons are their own group and always keep=true.

    Plan: pairs from semantic_dedup_pairs (per-cluster gemm, never
    cross-cluster), components via connected_components (driver
    union-find under the cap, pointer jumping above), then ONE
    row_number window partitioned by group_id — duplicate-group sizes
    bound the window, the corpus streams through exactly once, nothing
    is quadratic. NULL cent_cos (zero vectors / zero centroids) sorts
    LAST via a 2.0 sentinel — identical in the SQL twin, and such rows
    are singletons anyway (NaN cosine never pairs). cent_cos is emitted
    AND compared at round(·, 9): the centroid-literal cosine can drift
    by 1 ulp across engines (the tfidf rounded-rank-key pattern), and
    rounding both the output and the keep ordering keeps the survivor
    choice engine-independent."""
    from pyspark.sql.window import Window

    from vecgo_spark.operators import ivf as ivfmod

    cents = double_matrix_expr(model.centroids)
    v = F.col(vector_col).cast("array<double>")
    d = emb.select(
        F.col(id_col).alias("id"),
        F.round(cosine_similarity(
            v, F.element_at(cents, ivfmod.assign_expr(model, vector_col) + 1)
        ), 9).alias("cent_cos"),
    )
    pairs = semantic_dedup_pairs(emb, model, id_col, vector_col,
                                 threshold, max_cluster,
                                 persist_assigned=persist_assigned)
    comp = connected_components(pairs)
    g = (
        d.join(comp, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("group_id"),
                "cent_cos")
    )
    w = Window.partitionBy("group_id").orderBy(
        F.coalesce("cent_cos", F.lit(2.0)).asc(), F.col("id").asc())
    return (
        g.withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col), "group_id", "cent_cos",
            (F.col("_rn") == 1).alias("keep"),
        )
        .orderBy(id_col)
    )


def semantic_dedup_sql(
    model, emb_table: str = "embeddings", id_col: str = "vec_id",
    vector_col: str = "embedding", threshold: float = 0.95,
    max_cluster: int | None = MAX_BUCKET,
) -> str:
    from vecgo_spark.operators.ivf import assign_sql

    pairs_sql = semantic_dedup_pairs_sql(model, emb_table, id_col,
                                         vector_col, threshold, max_cluster)
    cents = "[" + ", ".join(
        "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in model.centroids
    ) + "]"
    cent_cos = cosine_sql(vector_col, f"({cents})[cluster_id + 1]")
    return f"""
    WITH RECURSIVE p AS (SELECT id_a, id_b FROM ({pairs_sql})),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION ALL
        SELECT id_b, id_a FROM p
    ),
    walk (id, reach) AS (
        SELECT src, src FROM edges
        UNION
        SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ),
    comps AS (SELECT id, MIN(reach) AS comp FROM walk GROUP BY id),
    a0 AS (
        SELECT {id_col} AS id,
               CAST({assign_sql(model, vector_col)} AS INT) AS cluster_id,
               {vector_col} AS {vector_col}
        FROM {emb_table}
    ),
    d AS (SELECT id, round({cent_cos}, 9) AS cent_cos FROM a0),
    g AS (
        SELECT d.id, COALESCE(c.comp, d.id) AS group_id, d.cent_cos
        FROM d LEFT JOIN comps c ON c.id = d.id
    ),
    k AS (
        SELECT group_id, id AS keep_id,
               row_number() OVER (PARTITION BY group_id
                                  ORDER BY COALESCE(cent_cos, 2.0) ASC,
                                           id ASC) AS rn
        FROM g
    )
    SELECT g.id AS {id_col}, g.group_id, g.cent_cos,
           g.id = k.keep_id AS keep
    FROM g JOIN k ON k.group_id = g.group_id AND k.rn = 1
    ORDER BY {id_col}
    """


# --------------------------------------------- connected-component clusters


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_rounds: int = 25, driver_cap: int = 1_000_000,
) -> DataFrame:
    """(id, comp): comp = MIN node id in the node's connected component.

    Size-gated fast path: the edge list is sized by TRUE near-duplicate
    pairs, not the corpus, so it usually fits on the driver — the edge
    frame is persisted once, a limit(driver_cap+1).count() bounds its
    size EXECUTOR-side (no driver materialization of an over-cap graph),
    and only an under-cap list is collected: classic union-find with
    min-root, label map back as a createDataFrame (a single collect
    instead of 2 shuffles + a count per propagation round). Graphs past
    the cap fall back to the distributed loop below, reusing the same
    persisted edges; both paths produce the identical (id, min-id)
    labeling, in the ID TYPE OF THE INPUT (string doc ids round-trip —
    the output schema is derived from pairs, never hardcoded).

    Min-label propagation with pointer jumping, pure DataFrame ops:
    each round (a) takes the min label over direct neighbors, then
    (b) path-halves by re-resolving each label through the label of the
    label. Pointer jumping makes convergence O(log diameter) rounds, not
    O(diameter) — the near-dup graphs this feeds on are chain-y (A~B~C
    where A!~C), which is the worst case for plain propagation.

    Scale posture: the working set is (node, label) pairs — O(V) rows, two
    shuffles per round, never the O(V²) transitive closure. Each round
    `localCheckpoint`s to truncate lineage (iterative plans otherwise grow
    an exponential optimizer tree) and the loop exits on a fixpoint count
    of 0 changed labels, itself a cheap agg on the already-materialized
    checkpoint.
    """
    from pyspark.sql.types import StructField, StructType

    id_type = pairs.schema[id_a].dataType
    out_schema = StructType([StructField("id", id_type), StructField("comp", id_type)])
    directed = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if driver_cap is not None:
        directed = directed.persist()
        n_edges = directed.limit(driver_cap + 1).count()
        if n_edges <= driver_cap:
            head = directed.collect()
            directed.unpersist()
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for r in head:
                a, b = r["src"], r["dst"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:  # min id becomes the root → comp = min member
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            rows = [(n, find(n)) for n in parent]
            # BROADCAST hint (r11 verdict #3): this label map is a
            # driver-built relation bounded by driver_cap edges (≤ 2·cap
            # nodes of (id, comp)) — without the hint the callers'
            # corpus-side join-back planned as a SortMergeJoin, riding
            # two full exchanges of a corpus-sized projection on the
            # suite's slowest query. The hint survives the callers'
            # renames/projections into the join. The distributed
            # fallback below stays unhinted: past the cap the map is no
            # longer provably executor-sized.
            return F.broadcast(
                pairs.sparkSession.createDataFrame(rows, out_schema))
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    if driver_cap is not None:
        # the checkpoint above materialized from the cache; the iterative
        # loop below only reads the checkpoint, so release the cache now
        directed.unpersist()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # carry the round's starting label as `old` so the fixpoint test
        # below is a plain filter+count over the materialized checkpoint —
        # no join back against the previous labels
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.col("comp").alias("old"),
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
        )
        parent = labels.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        jumped = (
            stepped.join(parent, stepped["comp"] == parent["pid"], "left")
            .select("id", "old",
                    F.least(F.col("comp"), F.coalesce("pcomp", F.col("comp"))).alias("comp"))
            .localCheckpoint()
        )
        changed = jumped.where(F.col("comp") != F.col("old")).count()
        labels = jumped.select("id", "comp")
        if changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, canonical_id): every document mapped to the canonical
    (minimum) doc id of its near-duplicate cluster; singletons map to
    themselves. Clusters = connected components of the exact n-gram
    Jaccard graph at `threshold` — the standard "keep one per cluster"
    step after pair finding in a training-data dedup pipeline."""
    pairs = ngram_jaccard_pairs(docs, id_col, text_col, n=n, threshold=threshold)
    comp = connected_components(pairs).withColumnRenamed("id", "doc_id")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("canonical_id"))
    )


def dedup_clusters_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
) -> str:
    """DuckDB oracle: recursive-CTE reachability (exact transitive closure —
    fine at oracle scale, the Spark side uses log-round propagation)."""
    pairs_sql = ngram_jaccard_pairs_sql(docs_table, id_col, text_col, n, threshold)
    return f"""
    WITH RECURSIVE pairs AS (
        SELECT id_a, id_b FROM ({pairs_sql})
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    walk (id, reach) AS (
        SELECT src, src FROM edges
        UNION
        SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ),
    comps AS (SELECT id, MIN(reach) AS comp FROM walk GROUP BY id)
    SELECT d.{id_col} AS doc_id, COALESCE(c.comp, d.{id_col}) AS canonical_id
    FROM {docs_table} d LEFT JOIN comps c ON d.{id_col} = c.id
    """
