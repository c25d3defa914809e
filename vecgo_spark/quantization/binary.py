"""Binary quantization (BQ) and RaBitQ — 1 bit/dimension codes.

Reference semantics (/root/reference/internal/quantization/):
  BQ     — bit_i = (v_i >= threshold); threshold defaults to 0.0
           (sign-based) or the global mean after Train (binary.go:34-82);
           distance = Hamming = popcount(xor) (binary.go:90+).
  RaBitQ — sign bits + stored L2 norm; inner product estimated as
           <x,y> ≈ (||x||·||y||/D)·(D − 2·Hamming(Bx,By)) and
           L2² ≈ ||x||² + ||y||² − 2·<x,y>  (rabitq.go:13-28).

Spark design: bits are packed 32-per-word into ARRAY<BIGINT> with pure
Column expressions (shift-and-sum — integer-exact, so the DuckDB oracle
matches regardless of summation order). Hamming runs as
bit_count(xor) over the word arrays inside codegen — the Spark analog of
the reference's POPCNT loop. 32-bit words (not 64) keep every
intermediate below 2^63 so BIGINT arithmetic is overflow-free in both
engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


@dataclass(frozen=True)
class BinaryParams:
    """Trained(-or-default) binary quantizer spec, persisted inline in the
    table manifest (unlike SQ bounds / PQ codebooks there is no matrix
    artifact — just the kind and the sign threshold, binary.go:34-40).
    kind="bq" stores packed sign words; kind="rabitq" additionally stores
    the per-row L2 norm the estimator needs (rabitq.go:13-28)."""

    kind: str  # "bq" | "rabitq"
    threshold: float = 0.0

    def __post_init__(self):
        if self.kind not in ("bq", "rabitq"):
            raise ValueError(f"BinaryParams.kind must be 'bq' or 'rabitq', got {self.kind!r}")


def n_words(dim: int) -> int:
    return (dim + WORD_BITS - 1) // WORD_BITS


def train_threshold(df: DataFrame, vector_col: str) -> float:
    """Global-mean threshold (Train, binary.go:59-82). NOTE: a distributed
    float mean is not bit-reproducible across engines; oracle-checked
    queries use the default threshold 0.0 (sign quantization,
    binary.go:36-40), this helper feeds the recall tests."""
    row = (
        df.select(F.explode(F.col(vector_col).cast("array<double>")).alias("x"))
        .agg(F.avg("x"))
        .first()
    )
    return float(row[0])


def pack_bits(vector_col: Column | str, dim: int, threshold: float = 0.0) -> Column:
    """ARRAY<BIGINT> of ceil(dim/32) words; bit j (MSB-first) of word w is
    set iff v[w*32+j] >= threshold. Tail bits beyond dim are zero."""
    v = (F.col(vector_col) if isinstance(vector_col, str) else vector_col).cast("array<double>")
    thr = F.lit(float(threshold))
    # MSB-first weights 2^31..2^0 as a literal array (shiftleft takes only
    # int literals, not Columns); ONE parsed SQL string (r14) — the
    # per-element F.lit form cost ~64 py4j round-trips per query build
    from vecgo_spark.functions.vector import long_array_expr

    weights = long_array_expr([1 << (WORD_BITS - 1 - j) for j in range(WORD_BITS)])

    def word(w: Column) -> Column:
        def term(acc: Column, j: Column) -> Column:
            bit = F.when(F.get(v, w * WORD_BITS + j) >= thr, F.lit(1)).otherwise(F.lit(0))
            return acc + bit.cast("bigint") * F.get(weights, j)

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(WORD_BITS - 1)), F.lit(0).cast("bigint"), term
        )

    return F.transform(F.sequence(F.lit(0), F.lit(n_words(dim) - 1)), word)


def hamming_words(a: Column | str, b: Column | str) -> Column:
    """Popcount of XOR over packed word arrays (distance/distance.go:36-38,
    binary.go Hamming path)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def rabitq_l2_estimate(
    hamming: Column, norm_a: Column, norm_b: Column, dim: int
) -> Column:
    """||a||² + ||b||² − 2·(||a||·||b||/D)·(D − 2·H)  (rabitq.go:19-28).
    Fixed double op order — mirrored by rabitq_l2_estimate_sql."""
    d = F.lit(float(dim))
    est_ip = (norm_a * norm_b / d) * (d - F.lit(2.0) * hamming.cast("double"))
    return norm_a * norm_a + norm_b * norm_b - F.lit(2.0) * est_ip


def pack_bits_py(vec, threshold: float = 0.0) -> list[int]:
    """Driver-side mirror of pack_bits for query vectors (integer-exact,
    so it matches both the Spark expression and the SQL oracle)."""
    words = []
    for w in range(n_words(len(vec))):
        val = 0
        for j in range(WORD_BITS):
            i = w * WORD_BITS + j
            if i < len(vec) and float(vec[i]) >= threshold:
                val += 1 << (WORD_BITS - 1 - j)
        words.append(val)
    return words


# ---------------------------------------------------------------- oracles


def pack_bits_sql(vcol: str, dim: int, threshold: float = 0.0) -> str:
    """DuckDB mirror of pack_bits: same MSB-first shift weights; integer
    sums are order-independent so list_sum == sequential aggregate."""
    nw = n_words(dim)
    bit = (
        f"CASE WHEN w * {WORD_BITS} + j + 1 <= {dim} "
        f"AND {vcol}[w * {WORD_BITS} + j + 1]::DOUBLE >= {threshold!r} "
        f"THEN (1::BIGINT << ({WORD_BITS - 1} - j)) ELSE 0::BIGINT END"
    )
    # CAST: DuckDB's list_sum widens to HUGEINT; the Spark side is BIGINT and
    # the driver's value hash is type-sensitive, so pin the word type.
    return (
        f"list_transform(range(0, {nw}), w -> "
        f"CAST(list_sum(list_transform(range(0, {WORD_BITS}), j -> {bit})) AS BIGINT))"
    )


def hamming_words_sql(a: str, b: str) -> str:
    # CAST: list_sum returns HUGEINT in DuckDB; Spark's score is BIGINT.
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> bit_count(xor(x[1], x[2]))::BIGINT)) AS BIGINT)"
    )


def rabitq_l2_estimate_sql(hamming: str, norm_a: str, norm_b: str, dim: int) -> str:
    d = float(dim)
    est_ip = f"(({norm_a}) * ({norm_b}) / {d}) * ({d} - 2.0 * ({hamming})::DOUBLE)"
    return f"(({norm_a}) * ({norm_a}) + ({norm_b}) * ({norm_b}) - 2.0 * {est_ip})"
