"""Native (JVM-side, codegen-friendly) vector distance expressions.

Reference semantics (all citations into /root/reference/):
  - SquaredL2: sum((a_i-b_i)^2), NOT rooted — distance/distance.go:20-22.
  - Dot: inner product — distance/distance.go:13-15.
  - Cosine: dot over L2-normalized vectors; the engine normalizes at
    insert/query time and stores *similarity* (higher=better) —
    internal/engine/search.go:171-185.
  - NormalizeL2: v/||v||, rejected on zero norm — distance/distance.go:42-63.
  - Hamming: popcount(xor) over bytes — distance/distance.go:36-38.

Score polarity (internal/engine/search.go:188): L2 ascending
(lower=better); dot/cosine descending (higher=better).

These are pure Column expressions (``aggregate``/``zip_with``) so they run
JVM-side with no Python boundary (higher-order functions evaluate
interpreted inside the JVM, not whole-stage-codegen'd, but never
serialize to Python) — on a 100 TB scan this is the difference between a
JVM pipeline and an Arrow/pickle serialization bottleneck. All arithmetic is carried out in DOUBLE (arrays are cast first)
with strictly sequential accumulation, which makes results bit-reproducible
and oracle-comparable against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dlit_sql(x: float) -> str:
    """One double literal as SQL text. repr() is the IEEE-754 shortest
    round-trip form — Java's Double.parseDouble returns the identical
    bit pattern, so the parsed literal equals F.lit(x) exactly."""
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def double_array_expr(vals: Sequence[float]) -> Column:
    """An ARRAY<DOUBLE> literal via ONE parsed SQL string. Every F.lit()
    element is a py4j roundtrip (~0.5 ms each — a 2048-element table
    costs 1-2.5 s of pure driver chatter PER QUERY BUILD, measured r11
    on the bloom bit vector); F.expr hands Catalyst one string to parse
    JVM-side in ~20 ms. Identical literal in the optimized plan."""
    return F.expr("array(" + ",".join(_dlit_sql(float(x)) for x in vals) + ")")


def _dmatrix_sql(rows) -> str:
    """The ARRAY<ARRAY<DOUBLE>> literal as raw SQL text — shared by
    double_matrix_expr and callers that splice the matrix into a larger
    single-parse SQL string (ivf._cents_sql)."""
    return ("array(" + ",".join(
        "array(" + ",".join(_dlit_sql(float(x)) for x in row) + ")"
        for row in rows) + ")")


def double_matrix_expr(rows) -> Column:
    """An ARRAY<ARRAY<DOUBLE>> literal (centroid tables, ADC lookup
    tables) via ONE parsed SQL string — see double_array_expr."""
    return F.expr(_dmatrix_sql(rows))


def long_array_expr(vals) -> Column:
    """An ARRAY<BIGINT> literal via ONE parsed SQL string — see
    double_array_expr."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def _as_double_array(v: Column | str | Sequence[float]) -> Column:
    """Normalize input to an ARRAY<DOUBLE> column (literals allowed)."""
    if isinstance(v, (list, tuple)):
        return double_array_expr(v)
    col = F.col(v) if isinstance(v, str) else v
    return col.cast("array<double>")


def sq_l2(a: Column | str | Sequence[float], b: Column | str | Sequence[float]) -> Column:
    """Squared Euclidean distance (NOT rooted — distance/distance.go:20)."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot(a: Column | str | Sequence[float], b: Column | str | Sequence[float]) -> Column:
    """Inner product (distance/distance.go:13-15)."""
    a, b = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str | Sequence[float]) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str | Sequence[float]) -> Column:
    """v / ||v||; NULL for the zero vector (reference rejects it,
    distance/distance.go:42-53)."""
    a = _as_double_array(a)
    norm = l2_norm(a)
    return F.when(norm > 0.0, F.transform(a, lambda x: x / norm))


def cosine_similarity(
    a: Column | str | Sequence[float], b: Column | str | Sequence[float]
) -> Column:
    """Cosine similarity = dot(a,b) / (||a||·||b||).

    Semantically the reference's normalize-at-ingest + dot scoring
    (internal/engine/search.go:171-185). Formulated with ONE aggregate per
    norm instead of dot(normalize(a), normalize(b)) — inlining the norm
    into every element's division made Catalyst re-evaluate the aggregate
    per element (O(d²) per row; 4× slower in bench). Zero vectors → NULL
    (reference rejects them, distance/distance.go:42-53).
    """
    a, b = _as_double_array(a), _as_double_array(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot(a, b) / denom)


def hamming(a: Column | str, b: Column | str) -> Column:
    """Popcount of XOR over two equal-length ARRAY<TINYINT>/ARRAY<INT>
    code columns (distance/distance.go:36-38). Used by BQ/RaBitQ paths;
    codes are stored as int arrays (parquet has no u8)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
