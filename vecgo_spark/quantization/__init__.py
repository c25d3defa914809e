"""Quantization family — Spark-native re-expression of the reference's six
schemes (/root/reference/internal/quantization/):

  SQ8    per-dim min/max → uint8 codes            quantizer.go:26-160
  INT4   per-dim min/diff → 4-bit codes           int4.go:11-120
  BQ     threshold sign bits, Hamming distance    binary.go:11-130
  RaBitQ sign bits + stored norm, corrected L2    rabitq.go:13-190
  PQ     m sub-codebooks × 256 centroids, ADC     pq.go:20-500
  OPQ    PQ + learned rotation                    opq.go:15-305

Design: *training* reduces the corpus to O(d) or O(m·256·d/m) parameters
(distributed agg or driver-side numpy on a bounded sample — same posture
as the reference, which trains on the segment being built). *Encode* and
*ADC scoring* are pure Column expressions (or one Arrow-batched pandas UDF
for PQ encode) so the 100 TB scan stays JVM-side / vectorized.
"""

from vecgo_spark.quantization.scalar import ScalarParams, train_scalar  # noqa: F401
from vecgo_spark.quantization.binary import (  # noqa: F401
    pack_bits,
    hamming_words,
    rabitq_l2_estimate,
)
from vecgo_spark.quantization.pq import PQCodebooks, train_pq, train_opq  # noqa: F401
