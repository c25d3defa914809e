"""Parsed-expr array literals must equal F.lit element-for-element at the
BIT level — double_array_expr/double_matrix_expr/long_array_expr replace
per-element py4j literal construction in every plan-literal site (bloom
bit vector, centroid tables, ADC tables, query vectors), so any parse
round-trip drift would silently poison oracle bit-identity everywhere."""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vecgo_spark.functions.vector import (
    double_array_expr,
    double_matrix_expr,
    long_array_expr,
)


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


@settings(max_examples=8, deadline=None)
@given(st.lists(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    min_size=1, max_size=24))
def test_double_array_expr_bit_equals_f_lit(spark, vals):
    row = spark.range(1).select(
        double_array_expr(vals).alias("e"),
        F.array(*[F.lit(float(x)) for x in vals]).alias("l"),
    ).collect()[0]
    assert len(row["e"]) == len(row["l"]) == len(vals)
    for got, ref, src in zip(row["e"], row["l"], vals):
        if math.isnan(src):
            assert math.isnan(got) and math.isnan(ref)
        else:
            assert _bits(got) == _bits(ref) == _bits(float(src))


def test_matrix_and_long_exprs_roundtrip(spark):
    rows = [[0.1, -0.0, 1e-310], [float("inf"), 2.5, -1e300]]
    got = spark.range(1).select(
        double_matrix_expr(rows).alias("m")).collect()[0]["m"]
    assert [[_bits(v) for v in r] for r in got] == \
        [[_bits(v) for v in r] for r in rows]
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 42]
    got_l = spark.range(1).select(
        long_array_expr(longs).alias("a")).collect()[0]["a"]
    assert got_l == longs
