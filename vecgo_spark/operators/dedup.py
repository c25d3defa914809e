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

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vecgo_spark.functions.hashing import shingles_sql, stable_hash64_sql
from vecgo_spark.functions.vector import cosine_similarity
from vecgo_spark.operators.bm25 import tokenize_py
from vecgo_spark.oracles import cosine_sql


def _py_hash64(s: str, seed: int = 0) -> int:
    """Python twin of functions.hashing.stable_hash64 (and its SQL twin):
    identical md5 → identical 60-bit int across Spark/DuckDB/Python."""
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _py_shingles(text: str, n: int) -> set[str]:
    toks = tokenize_py(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _spread(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) spread across the cluster: a small parquet file arrives
    as 1-2 partitions, which would serialize the Arrow/Python signature
    stages; a round-robin repartition costs one tiny shuffle and buys full
    parallelism. At 100 TB the input is already many partitions and AQE
    coalesces as needed."""
    sdf = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    target = sdf.sparkSession.sparkContext.defaultParallelism
    if sdf.rdd.getNumPartitions() < target:
        sdf = sdf.repartition(target)
    return sdf

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


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct — Arrow-batched Python (tokenize + slice per
    doc): the equivalent interpreted-HOF expression chain was ~10× slower
    (Spark evaluates array lambdas row-at-a-time with boxing)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, shs = [], []
            for i, t in zip(pdf["id"].values, pdf["text"].values):
                for s in _py_shingles(t or "", n):
                    ids.append(i)
                    shs.append(s)
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"), "shingle": shs})

    return _spread(docs, id_col, text_col).mapInPandas(gen, "id long, shingle string")


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(id, m0..m{H-1}): per-doc minimum of H permuted hashes over its
    shingle set. Docs with no shingles (< n tokens) are dropped.

    Hash family: ONE base md5 per shingle, then H universal-hash
    permutations perm_i(h) = (A_i·(h mod P) + B_i) mod P — H× less
    hashing than seeded-md5-per-permutation, vectorized with numpy across
    a doc's shingle set. Integer-exact → identical in the DuckDB oracle.

    One mapInPandas pass, no shuffle: each doc's signature only needs its
    own text (embarrassingly parallel — scales linearly with executors)."""
    import numpy as np
    import pandas as pd

    from vecgo_spark.functions.hashing import MINHASH_P, minhash_perm_params

    a_params, b_params = minhash_perm_params(num_hashes)
    a_np = np.array(a_params, dtype=np.int64)[:, None]
    b_np = np.array(b_params, dtype=np.int64)[:, None]

    def sig(batches):
        for pdf in batches:
            out = {"id": []}
            for h in range(num_hashes):
                out[f"m{h}"] = []
            for i, t in zip(pdf["id"].values, pdf["text"].values):
                sh = _py_shingles(t or "", n)
                if not sh:
                    continue
                base = np.array([_py_hash64(s) % MINHASH_P for s in sh], dtype=np.int64)
                mins = ((a_np * base[None, :] + b_np) % MINHASH_P).min(axis=1)
                out["id"].append(i)
                for h in range(num_hashes):
                    out[f"m{h}"].append(int(mins[h]))
            yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})

    schema = "id long, " + ", ".join(f"m{i} long" for i in range(num_hashes))
    return _spread(docs, id_col, text_col).mapInPandas(sig, schema)


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8,
) -> DataFrame:
    """(id_a, id_b, match_count) for candidate pairs that share ≥1 LSH band,
    keeping pairs whose signatures agree in ≥ min_matches of num_hashes
    positions (≈ Jaccard ≥ min_matches/num_hashes)."""
    # persisted: consumed by 4 band projections + both verify joins
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes).persist()
    rows_per_band = num_hashes // num_bands
    # candidates: same band content in some band
    bands = []
    for bidx in range(num_bands):
        cols = [f"m{bidx * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            sigs.select("id", F.lit(bidx).alias("band"),
                        F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("key"))
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"),
              (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify: count matching signature positions
    a = sigs.alias("sa")
    b = sigs.alias("sb")
    match_count = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cand.join(a, cand["id_a"] == F.col("sa.id"))
        .join(b, cand["id_b"] == F.col("sb.id"))
        .select("id_a", "id_b", match_count.alias("match_count"))
        .where(F.col("match_count") >= min_matches)
    )


def minhash_lsh_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_hashes: int = NUM_HASHES, num_bands: int = NUM_BANDS,
    min_matches: int = 8,
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
        key = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
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
    banded AS ({banded}),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )
    SELECT c.id_a, c.id_b, {match_count} AS match_count
    FROM cand c JOIN sigs sa ON c.id_a = sa.id JOIN sigs sb ON c.id_b = sb.id
    WHERE {match_count} >= {min_matches}
    """


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # stable_hash64 yields 60 usable bits


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): sign-of-weighted-bit-votes over token hashes, weight
    = term frequency. Pure integer arithmetic → order-independent and
    oracle-exact."""
    import numpy as np
    import pandas as pd

    def sig(batches):
        js = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            ids, sims = [], []
            for i, t in zip(pdf["id"].values, pdf["text"].values):
                toks = tokenize_py(t or "")
                if not toks:
                    continue
                tf: dict[str, int] = {}
                for tok in toks:
                    tf[tok] = tf.get(tok, 0) + 1
                terms = list(tf.keys())
                h = np.array([_py_hash64(term, seed=0) for term in terms], dtype=np.uint64)
                w = np.array([tf[term] for term in terms], dtype=np.int64)
                bits = ((h[:, None] >> js) & np.uint64(1)).astype(np.int64)
                votes = np.where(bits == 1, w[:, None], -w[:, None]).sum(axis=0)
                sims.append(int(((votes > 0).astype(np.uint64) << js).sum()))
                ids.append(i)
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(sims, dtype="int64")})

    return _spread(docs, id_col, text_col).mapInPandas(sig, "id long, simhash long")


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Banded join: split the 60-bit hash into max_hamming+1 chunks; by
    pigeonhole any pair within max_hamming shares ≥1 exact chunk, so the
    join only compares within chunk buckets (no O(n²) at scale)."""
    # persisted: consumed by every chunk projection of the banded join
    sigs = simhash(docs, id_col, text_col).persist()
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = None
    for cidx in range(n_chunks):
        c = sigs.select(
            "id", "simhash", F.lit(cidx).alias("chunk"),
            F.shiftright("simhash", cidx * chunk_bits).bitwiseAND(F.lit(mask)).alias("key"),
        )
        chunks = c if chunks is None else chunks.unionByName(c)
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"),
              (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(F.col("hamming") <= max_hamming)


def simhash_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> str:
    """Oracle: brute-force pairwise Hamming (equivalent to the banded join
    by the pigeonhole argument; integer-exact)."""
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    h = stable_hash64_sql("term", seed=0)
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
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# --------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard): exact Jaccard over n-token shingle sets for
    every pair sharing ≥1 shingle. jaccard = |∩| / (|A|+|B|-|∩|) — one
    integer division pair → oracle-exact."""
    # persisted: both sides of the shingle self-join + the sizes agg
    sh = _doc_shingles(docs, id_col, text_col, n).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("sza") + F.col("szb") - F.col("inter")).cast("double")
    return (
        inter.join(sizes.withColumnRenamed("sz", "sza").withColumnRenamed("id", "id_a"), "id_a")
        .join(sizes.withColumnRenamed("sz", "szb").withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    docs_table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
) -> str:
    toks = f"list_filter(string_split_regex(lower({text_col}), '[\\x00-\\x20]+'), t -> t != '')"
    sh_list = shingles_sql(f"({toks})", n)
    return f"""
    WITH sh AS (
        SELECT DISTINCT {id_col} AS id, unnest({sh_list}) AS shingle FROM {docs_table}
    ),
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


def embedding_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vector_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold.

    Two-phase plan (the pattern every quantized path uses too):
      1. PRUNE with numpy: broadcast the normalized matrix, mapInPandas
         computes batch @ M.T per partition and emits candidate pairs with
         cos ≥ threshold - 1e-9 (BLAS reorders the sum, so its float64
         result can differ from the sequential fold in the last ulps — the
         epsilon makes the candidate set a strict superset).
      2. VERIFY with the exact sequential-fold cosine expression — the
         reported value is bit-identical to the DuckDB oracle.
    The naive theta-join × interpreted-HOF cosine took 114 s at sf0.1;
    this runs the same logical op in ~2 s.

    Scale path: the broadcast matrix bounds phase 1 at ~10M×small-dim rows;
    past that, candidates come from IVF cluster buckets (operators/ivf.py)
    or MinHash-style hyperplane LSH — phase 2 is unchanged.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    rows = emb.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v")).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = np.nan  # zero vectors never match (NULL cosine)
    matn = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(matn)
    cutoff = threshold - 1e-9

    def find_candidates(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["v"].values).astype(np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0.0] = np.nan
            sims = (q / qn[:, None]) @ all_mat.T
            qi, ci = np.where(sims >= cutoff)
            qa = pdf["id"].values[qi]
            cb = all_ids[ci]
            keep = qa < cb
            yield pd.DataFrame({"id_a": qa[keep], "id_b": cb[keep]})

    cand = (
        emb.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
        .mapInPandas(find_candidates, "id_a long, id_b long")
    )
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


# --------------------------------------------- connected-component clusters


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, comp): comp = MIN node id in the node's connected component.

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
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
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
        stepped = labels.join(nbr, "id", "left").select(
            "id", F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp")
        )
        parent = labels.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        jumped = (
            stepped.join(parent, stepped["comp"] == parent["pid"], "left")
            .select("id", F.least(F.col("comp"), F.coalesce("pcomp", F.col("comp"))).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            jumped.withColumnRenamed("comp", "new_comp")
            .join(labels, "id")
            .where(F.col("new_comp") != F.col("comp"))
            .count()
        )
        labels = jumped
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
