"""DuckDB oracle SQL fragments shared by __spark_entry__.oracle_sql().

Each builder returns ANSI-ish SQL runnable by DuckDB over the driver's
pre-registered views. The float formulations are chosen to be BIT-EXACT
with the Spark expressions in vecgo_spark.functions.vector (both engines
widen float32→double, then accumulate sequentially):

  Spark  F.aggregate(F.zip_with(a,b,(x,y)->(x-y)*(x-y)), 0.0, +)
  DuckDB list_sum(list_transform(list_zip(a::DOUBLE[], b::DOUBLE[]),
                                 x -> (x[1]-x[2])*(x[1]-x[2])))

verified exact-equal on all sf0.01 embedding rows (tests/test_oracle_parity.py).
"""

from __future__ import annotations


def fmt_double(v: float) -> str:
    """A double literal DuckDB parses as DOUBLE (not DECIMAL) and
    round-trips bit-exactly. Plain decimal literals become DECIMAL whose
    conversion to double is NOT correctly rounded (verified: 24/205 random
    doubles off by 1 ulp); e-notation parses straight to DOUBLE."""
    return f"{float(v):.17e}"


def double_list_sql(vals) -> str:
    return "[" + ", ".join(fmt_double(v) for v in vals) + "]"


def double_list2_sql(rows) -> str:
    return "[" + ", ".join(double_list_sql(r) for r in rows) + "]"


def sq_l2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), "
        f"x -> (x[1]-x[2])*(x[1]-x[2])))"
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), "
        f"x -> x[1]*x[2]))"
    )


def normalize_sql(a: str) -> str:
    """Mirror l2_normalize: transform(a, x -> x / sqrt(dot(a,a)))."""
    norm = f"sqrt({dot_sql(a, a)})"
    return f"list_transform({a}::DOUBLE[], x -> x / {norm})"


def cosine_sql(a: str, b: str) -> str:
    """Mirror cosine_similarity: dot(a,b) / (sqrt(dot(a,a))*sqrt(dot(b,b)))
    — same per-row double ops as the Spark expression, hence bit-exact."""
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
