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


def stable_hash64(col: Column | str, seed: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def stable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB twin of stable_hash64."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def shingles(tokens: Column | str, n: int = 3) -> Column:
    """ARRAY<STRING> of n-token shingles; empty when fewer than n tokens."""
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
